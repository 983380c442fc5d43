"""Debug/sanitizer plumbing (pyrayt_tpu.debug; SURVEY.md section 5.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyrayt_tpu import debug


def test_debug_nans_raises_at_the_source():
    with pytest.raises(FloatingPointError):
        with debug.debug_nans():
            jnp.log(jnp.asarray(-1.0)) + 1.0
    # flag restored: NaN flows silently again
    assert np.isnan(float(jnp.log(jnp.asarray(-1.0))))


def test_eager_mode_disables_jit():
    calls = []

    @jax.jit
    def f(x):
        calls.append(1)  # traced once under jit; every call when disabled
        return x * 2

    f(jnp.asarray(1.0))
    f(jnp.asarray(2.0))
    n_jitted = len(calls)
    with debug.eager_mode():
        f(jnp.asarray(3.0))
        f(jnp.asarray(4.0))
    assert len(calls) == n_jitted + 2


def test_sanitized_trace_is_nan_free():
    """A full trace under the sanitizer: the engine's guarded math must not
    trip the NaN detector even with dead rays and TIR present."""
    import pyrayt_tpu as pyrayt
    from pyrayt_tpu import components, materials

    prism = components.equilateral_prism(1.0, 1.0, material=materials.glass["BK7"]).rotate_y(-30)
    det = components.baffle((20.0, 20.0)).move_x(5.0)
    with debug.debug_nans():
        frame = pyrayt.RayTracer(
            components.LineOfRays(0.3).move_x(-2.0),
            [prism, det],
            rays_per_source=8,
            generation_limit=6,
        ).trace()
    assert len(frame) > 0
