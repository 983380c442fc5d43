"""Gradient parity: the Pallas backward kernel (ops/fused_grad.py) vs
jax.grad of the XLA scan engine, interpret mode on CPU f64.

The two paths must produce the same parameter gradients: the backward
kernel reconstructs each generation's input state from the saved records,
which is exact for recorded rays up to one ulp of tilt renormalization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyrayt_tpu import components as comp
from pyrayt_tpu import materials as matl
from pyrayt_tpu.analysis.metrics import rms_spot_radius
from pyrayt_tpu.config import TraceConfig
from pyrayt_tpu.ops import fused_grad, fused_trace
from pyrayt_tpu.scene.compile import compile_scene
from pyrayt_tpu.tracer import engine


def _condenser():
    lens = comp.thick_lens(
        1.0, -1.0, 0.25, aperture=0.5, material=matl.glass["BK7"]
    )
    det = comp.baffle((1.0, 1.0)).move_x(1.0)
    scene = compile_scene([lens, det])
    rays = comp.ConeOfRays(cone_angle=10.0).move_x(-0.5).generate_rays(64)
    return scene, rays


def _grads(scene, rays, config, loss_of_result, fused: bool):
    if fused:
        trace = fused_grad.build_fused_vjp_trace_fn(
            scene.spec, scene.materials, config, interpret=True
        )
    else:
        trace = engine.build_trace_fn(scene.spec, scene.materials, config)

    def loss(params, rays):
        return loss_of_result(trace(params, rays))

    value, grads = jax.value_and_grad(loss)(scene.params, rays)
    return float(value), grads


def assert_grads_match(scene, rays, config, loss_of_result, rtol=1e-8, atol=1e-10):
    v_x, g_x = _grads(scene, rays, config, loss_of_result, fused=False)
    v_f, g_f = _grads(scene, rays, config, loss_of_result, fused=True)
    assert np.isclose(v_f, v_x, rtol=1e-12), (v_f, v_x)
    for key in ("world", "prim", "glass"):
        np.testing.assert_allclose(
            np.asarray(g_f[key]),
            np.asarray(g_x[key]),
            rtol=rtol,
            atol=atol,
            err_msg=f"params[{key!r}] gradient differs",
        )
    return g_x, g_f


class TestSpotSizeGradientParity:
    def test_condenser_param_grads(self):
        scene, rays = _condenser()
        config = TraceConfig(generation_limit=6, fixed_loop=True)
        g_x, _ = assert_grads_match(scene, rays, config, rms_spot_radius)
        # the gradient is real (lens geometry moves the spot)
        assert float(jnp.abs(jnp.asarray(g_x["world"])).max()) > 1e-6

    def test_mirror_scene_grads(self):
        m = comp.spherical_mirror(radius=2.0, thickness=0.2, aperture=1.0)
        det = comp.baffle((4.0, 4.0)).move_x(3.0)
        scene = compile_scene([m, det])
        rays = comp.LineOfRays(0.6).rotate_z(180).move_x(1.5).generate_rays(32)
        config = TraceConfig(generation_limit=4, fixed_loop=True)
        assert_grads_match(scene, rays, config, rms_spot_radius)

    def test_glass_coefficient_grads(self):
        """Dispersion coefficients get gradients (chromatic design)."""
        scene, rays = _condenser()
        rays = rays.replace(
            wavelength=jnp.linspace(0.45, 0.65, rays.n_rays)
        )
        config = TraceConfig(generation_limit=6, fixed_loop=True)
        g_x, g_f = assert_grads_match(scene, rays, config, rms_spot_radius)
        assert float(jnp.abs(jnp.asarray(g_x["glass"])).max()) > 1e-10


class TestGeneralCSGGradients:
    def test_union_blob_grads(self):
        """Union trees run the comparator-network CSG inside the kernel
        (not the interval fast path); its min/max vjp must match too."""
        import pyrayt_tpu.scene.csg as scsg
        from pyrayt_tpu.scene.surfaces import Sphere

        left = Sphere(1.0, material=matl.glass["ideal"])
        right = Sphere(1.0, material=matl.glass["ideal"]).move_x(0.8)
        blob = scsg.union(left, right)
        det = comp.baffle((6.0, 6.0)).move_x(4.0)
        scene = compile_scene([blob, det])
        rays = comp.LineOfRays(1.2).move_x(-2.0).generate_rays(32)
        config = TraceConfig(generation_limit=5, fixed_loop=True)
        assert_grads_match(scene, rays, config, rms_spot_radius)

    def test_imager_many_leaf_grads(self):
        """The notebook imager's 9-leaf system (lens CSG + aperture stop +
        baffle): parameter gradients through a deeper scene."""
        glass = matl.glass["BK7"]
        lens_radius = 2 * (float(glass.index_at(0.532)) - 1) * 50.0
        lens = comp.thick_lens(
            lens_radius, -lens_radius, 5.0, aperture=25.4, material=glass
        )
        stop = comp.aperture(size=(25.4, 25.4), aperture_size=3.0).move_x(25.0)
        imager = comp.baffle((25.4, 25.4)).move_x(50.0)
        scene = compile_scene([lens, stop, imager])
        rays = comp.CircleOfRays(5.0).move_x(-10).generate_rays(24)
        config = TraceConfig(generation_limit=6, fixed_loop=True)
        assert_grads_match(scene, rays, config, rms_spot_radius)


class TestTIRGradients:
    def test_prism_tir_grads(self):
        """Total internal reflection is the sharpest physics branch (the
        radicand where-switch in refract); its vjp must match through a
        trace that actually TIRs."""
        prism = comp.equilateral_prism(
            1.0, 1.0, material=matl.glass["BK7"]
        ).rotate_y(-30)
        det = comp.baffle((20.0, 20.0)).move_x(5.0)
        scene = compile_scene([prism, det])
        rays = comp.LineOfRays(0.3).move_x(-2.0).generate_rays(32)
        config = TraceConfig(generation_limit=8, fixed_loop=True)
        assert_grads_match(scene, rays, config, rms_spot_radius)


class TestFinalRayCotangents:
    def test_loss_on_final_rays(self):
        """Cotangents entering through final_rays flow back through the
        frozen-state identity for dead rays and exactly for living ones."""
        scene, rays = _condenser()
        config = TraceConfig(generation_limit=6, fixed_loop=True)

        def loss(result):
            return jnp.sum(result.final_rays.positions[1] ** 2) / 1e3

        assert_grads_match(scene, rays, config, loss)


class TestRayCotangents:
    def test_grad_wrt_initial_rays(self):
        scene, rays = _condenser()
        config = TraceConfig(generation_limit=6, fixed_loop=True)

        def build(fused):
            if fused:
                trace = fused_grad.build_fused_vjp_trace_fn(
                    scene.spec, scene.materials, config, interpret=True
                )
            else:
                trace = engine.build_trace_fn(scene.spec, scene.materials, config)

            def loss(positions):
                r = rays.replace(positions=positions)
                return rms_spot_radius(trace(scene.params, r))

            return jax.grad(loss)(rays.positions)

        g_x = build(False)
        g_f = build(True)
        # physical xyz rows match; the homogeneous w row differs by design:
        # the XLA engine differentiates through w = 1 as if it were a free
        # variable (cotangent = sum of translation-column terms), while the
        # fused path treats the constant w as a constant (cotangent 0).
        # Neither is physically meaningful; the fused convention is cleaner.
        np.testing.assert_allclose(
            np.asarray(g_f)[:3], np.asarray(g_x)[:3], rtol=1e-8, atol=1e-10
        )
        np.testing.assert_array_equal(np.asarray(g_f)[3], 0.0)
        assert float(jnp.abs(jnp.asarray(g_x)[:3]).max()) > 1e-6


def test_grad_wrt_non_unit_initial_directions():
    """The backward reconstructs generation 0 from the TRUE initial state
    (not the record's renormalized tilt rows), so callers passing non-unit
    directions get the same gradients as the XLA engine (scaled by the
    norm, exactly as forward physics sees them)."""
    scene, rays = _condenser()
    rays = rays.replace(directions=rays.directions * 2.5)  # non-unit
    config = TraceConfig(generation_limit=6, fixed_loop=True)

    def build(fused):
        if fused:
            trace = fused_grad.build_fused_vjp_trace_fn(
                scene.spec, scene.materials, config, interpret=True
            )
        else:
            trace = engine.build_trace_fn(scene.spec, scene.materials, config)

        def loss(directions):
            r = rays.replace(directions=directions)
            return rms_spot_radius(trace(scene.params, r))

        return jax.grad(loss)(rays.directions)

    g_x = build(False)
    g_f = build(True)
    np.testing.assert_allclose(
        np.asarray(g_f)[:3], np.asarray(g_x)[:3], rtol=1e-8, atol=1e-10
    )
    assert float(jnp.abs(jnp.asarray(g_x)[:3]).max()) > 1e-8


def test_forward_values_unchanged():
    """The custom_vjp wrapper's primal output is the fused kernel's."""
    scene, rays = _condenser()
    config = TraceConfig(generation_limit=6, fixed_loop=True)
    fn_v = fused_grad.build_fused_vjp_trace_fn(
        scene.spec, scene.materials, config, interpret=True
    )
    fn_f = fused_trace.build_fused_trace_fn(
        scene.spec, scene.materials, config, interpret=True
    )
    rv = fn_v(scene.params, rays)
    rf = fn_f(scene.params, rays)
    np.testing.assert_array_equal(np.asarray(rv.records), np.asarray(rf.records))
    np.testing.assert_array_equal(
        np.asarray(rv.record_mask), np.asarray(rf.record_mask)
    )


def test_bwd_block_budget():
    assert fused_grad.bwd_block_rays(TraceConfig(generation_limit=6), 4) is not None
    assert fused_grad.bwd_block_rays(TraceConfig(generation_limit=4000), 4) is None
