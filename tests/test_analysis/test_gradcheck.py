"""FD-validated physical gradients through the full trace (north star).

BASELINE.md requires spot-size gradients validated against finite
differences.  These tests run ``analysis.gradcheck.check_gradients`` on
curvature, thickness, position, and Sellmeier-coefficient parameters of a
thick-lens system — the differentiable-design path end to end
(reference counterpart: the scipy FD optimization in
examples/lens_design.ipynb, which never had analytic gradients at all).
"""

import jax
import jax.numpy as jnp
import pytest

from pyrayt_tpu import components as comp
from pyrayt_tpu import materials as matl
from pyrayt_tpu.analysis import metrics
from pyrayt_tpu.analysis.gradcheck import check_gradients, finite_difference_grad
from pyrayt_tpu.analysis.optimize import build_objective
from pyrayt_tpu.config import TraceConfig
from pyrayt_tpu.scene.compile import compile_scene
from pyrayt_tpu.tracer import engine

CONFIG = TraceConfig(generation_limit=4, fixed_loop=True)


def _cone_rays(n=32):
    return comp.ConeOfRays(cone_angle=10.0).move_x(-0.5).generate_rays(n)


class TestThickLensGradients:
    """grad of RMS spot size wrt every physical degree of freedom of a
    biconvex thick lens + detector, validated against central FD."""

    def _objective(self):
        def build(theta):
            lens = comp.thick_lens(
                r1=theta["r1"],
                r2=theta["r2"],
                thickness=theta["t"],
                aperture=0.5,
                material=matl.glass["BK7"],
                r1_sign=1,
                r2_sign=-1,
            )
            det = comp.baffle((1.0, 1.0)).move_x(theta["det_x"])
            return [lens, det]

        return build_objective(build, _cone_rays(), metrics.rms_spot_radius, CONFIG)

    def test_curvature_thickness_position_gradients(self):
        obj = self._objective()
        theta = {
            "r1": jnp.asarray(1.0),
            "r2": jnp.asarray(-1.0),
            "t": jnp.asarray(0.25),
            "det_x": jnp.asarray(1.0),
        }
        max_abs, max_rel = check_gradients(obj, theta, eps=1e-6, rtol=1e-4)
        assert max_rel < 1e-4

    def test_gradients_are_nonzero(self):
        obj = self._objective()
        theta = {
            "r1": jnp.asarray(1.0),
            "r2": jnp.asarray(-1.0),
            "t": jnp.asarray(0.25),
            "det_x": jnp.asarray(1.0),
        }
        grads = jax.grad(obj)(theta)
        for name, g in grads.items():
            assert jnp.isfinite(g), name
            assert jnp.abs(g) > 1e-8, f"zero gradient for {name}"


def test_traced_radius_without_sign_raises():
    """The CSG structure needs a static sign: a traced radius without
    r1_sign/r2_sign must fail loudly, not with a tracer leak."""

    def f(r1):
        comp.thick_lens(r1, -1.0, 0.25, aperture=0.5)
        return r1

    with pytest.raises(ValueError, match="r1_sign"):
        jax.jit(f)(jnp.asarray(1.0))


def test_sellmeier_coefficient_gradient():
    """Dispersion coefficients live in the params pytree: differentiate the
    trace wrt BK7's b1 and FD-validate (no scene rebuild involved)."""
    lens = comp.thick_lens(
        1.0, -1.0, 0.25, aperture=0.5, material=matl.glass["BK7"]
    )
    det = comp.baffle((1.0, 1.0)).move_x(1.0)
    scene = compile_scene([lens, det])
    trace = engine.build_trace_fn(scene.spec, scene.materials, CONFIG)
    rays = _cone_rays()
    base = scene.params
    slot = scene.materials.index(matl.glass["BK7"])

    def obj(b1):
        params = dict(base)
        params["glass"] = base["glass"].at[slot, 1].set(b1)
        return metrics.rms_spot_radius(trace(params, rays))

    b1 = jnp.asarray(1.03961212)
    max_abs, max_rel = check_gradients(obj, b1, eps=1e-6, rtol=1e-4)
    assert max_rel < 1e-4
    assert jnp.abs(jax.grad(obj)(b1)) > 1e-8


def test_world_transform_gradient():
    """Positions (world-transform translations) are differentiable scene
    parameters: moving the detector changes the recorded spot."""
    lens = comp.thick_lens(
        1.0, -1.0, 0.25, aperture=0.5, material=matl.glass["BK7"]
    )
    det = comp.baffle((1.0, 1.0)).move_x(1.0)
    scene = compile_scene([lens, det])
    trace = engine.build_trace_fn(scene.spec, scene.materials, CONFIG)
    rays = _cone_rays()
    base = scene.params

    def obj(dx):
        # shift the detector leaf (the last one in compile order) along x
        params = dict(base)
        params["world"] = base["world"].at[-1, 0, 3].add(dx)
        return metrics.rms_spot_radius(trace(params, rays))

    dx = jnp.asarray(0.0)
    numeric = finite_difference_grad(obj, dx, eps=1e-6)
    analytic = jax.grad(obj)(dx)
    assert jnp.allclose(analytic, jnp.asarray(numeric), rtol=1e-4, atol=1e-9)


class TestMirrorAndPrismGradients:
    """Every factory family is differentiable: spherical mirror radius,
    parabolic mirror focus, and prism side length flow FD-validated
    gradients through full traces."""

    def test_spherical_mirror_radius_gradient(self):
        def build(r):
            m = comp.spherical_mirror(
                r, 0.1, aperture=0.5, radius_sign=1
            ).rotate_z(180).move_x(2.0)
            ret = comp.baffle((2.0, 2.0))
            return [ret, m]

        rays = comp.LineOfRays(0.3).move_x(0.2).generate_rays(16)
        obj = build_objective(
            build, rays, metrics.rms_spot_radius,
            TraceConfig(generation_limit=4, fixed_loop=True),
        )
        r0 = jnp.asarray(2.0)
        max_abs, max_rel = check_gradients(obj, r0, eps=1e-6, rtol=1e-4)
        assert max_rel < 1e-4
        assert jnp.abs(jax.grad(obj)(r0)) > 1e-8

    def test_parabolic_mirror_focus_gradient(self):
        def build(f):
            m = comp.parabolic_mirror(f, 0.1, aperture=1.0).rotate_z(180).move_x(2.0)
            ret = comp.baffle((4.0, 4.0))
            return [ret, m]

        rays = comp.LineOfRays(0.5).move_x(0.2).generate_rays(16)
        obj = build_objective(
            build, rays, metrics.rms_spot_radius,
            TraceConfig(generation_limit=4, fixed_loop=True),
        )
        f0 = jnp.asarray(0.6)
        max_abs, max_rel = check_gradients(obj, f0, eps=1e-6, rtol=1e-4)
        assert max_rel < 1e-4
        assert jnp.abs(jax.grad(obj)(f0)) > 1e-8

    def test_prism_side_length_gradient(self):
        def build(s):
            prism = comp.equilateral_prism(s, 1.0, material=matl.glass["BK7"])
            det = comp.baffle((6.0, 6.0)).move_x(2.0)
            return [prism.move_x(0.25), det]

        rays = comp.LineOfRays(0.1).move_x(-1.0).rotate_y(-3).generate_rays(8)
        obj = build_objective(
            build, rays, metrics.rms_spot_radius,
            TraceConfig(generation_limit=5, fixed_loop=True),
        )
        s0 = jnp.asarray(1.0)
        max_abs, max_rel = check_gradients(obj, s0, eps=1e-6, rtol=1e-4)
        assert max_rel < 1e-4
