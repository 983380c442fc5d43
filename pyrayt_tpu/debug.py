"""Debug / sanitizer plumbing (SURVEY.md section 5.2).

The reference has no sanitizers (single-threaded NumPy; its hazard class
was in-place aliasing, quirk Q7, which the functional design removes).
The JAX-native equivalents are runtime flags, wrapped here so user code
and tests do not reach into jax.config directly:

* :func:`debug_nans` — raise at the first NaN/Inf any primitive produces
  (catches physics bugs like unguarded sqrt/div the moment they happen,
  at the offending op, instead of as a NaN loss 100 steps later);
* :func:`eager_mode` — disable jit so Python debuggers/print statements
  see every intermediate (the reference's "just step through it" workflow);
* :func:`sanitize` — both.

All are context managers and restore the previous flag state on exit:

    with pyrayt_tpu.debug.sanitize():
        tracer.trace()
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["debug_nans", "eager_mode", "sanitize"]


@contextlib.contextmanager
def _flag(name: str, value):
    previous = getattr(jax.config, name)
    jax.config.update(name, value)
    try:
        yield
    finally:
        jax.config.update(name, previous)


def debug_nans(enable: bool = True):
    """Raise FloatingPointError at the first NaN/Inf produced on device."""
    return _flag("jax_debug_nans", enable)


def eager_mode(enable: bool = True):
    """Run op by op without jit (slow; for stepping through physics)."""
    return _flag("jax_disable_jit", enable)


@contextlib.contextmanager
def sanitize():
    """NaN checking + eager execution together."""
    with debug_nans(), eager_mode():
        yield
