"""WIDE backward-kernel gradient parity (interpret mode, f64).

The wide backward differentiates the wide step by hand — jax.vjp of the
pure tail plus a winner-masked per-tree vjp of the pure eval
(ops/fused_grad._make_bwd_kernel_wide) — so these tests pin it against
jax.grad of the XLA engine at tight f64 tolerances, for both the generic
custom_vjp contract and the loss-fused plan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyrayt_tpu as pyrayt
from pyrayt_tpu import components as comp
from pyrayt_tpu import materials as matl
from pyrayt_tpu.analysis.metrics import FocusError, RmsSpotRadius
from pyrayt_tpu.config import TraceConfig
from pyrayt_tpu.ops import fused_grad, fused_trace as ft
from pyrayt_tpu.scene.compile import compile_scene
from pyrayt_tpu.scene.objects import fresh_ids
from pyrayt_tpu.tracer import engine

RTOL = 1e-8
ATOL = 1e-12


def _scene(n=5):
    with fresh_ids():
        lenslets = comp.microlens_array(2.0, 0.25, n, n, 1.0)
        focus = pyrayt.lensmakers_equation(2.0, np.inf, 1.5, 0.25)
        detector = comp.baffle((2.0 * n, 2.0 * n)).move_x(focus)
        det_id = float(detector.get_id())
        scene = compile_scene(lenslets + [detector])
    src = comp.GridOfRays(n * 0.9, n * 0.9).move_x(-1.0)
    rays = src.generate_rays(256)
    rays = rays.replace(id=jnp.arange(256, dtype=rays.positions.dtype))
    return scene, rays, det_id


def _assert_grads_close(got, want):
    for k in ("world", "prim", "glass"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=RTOL, atol=ATOL,
            err_msg=k,
        )


@pytest.fixture(scope="module")
def mla():
    scene, rays, det_id = _scene(5)
    assert ft.supports_fused_wide(scene.spec)
    # pin the MONOLITHIC wide backward kernel explicitly: auto dispatch
    # picks the staged backward for every wide scene since round 5
    # (tests/test_ops/test_fused_staged_grad.py covers that path)
    config = TraceConfig(
        generation_limit=4, fixed_loop=True, wide_grad="fused"
    )
    return scene, rays, det_id, config


@pytest.fixture(scope="module")
def xla_reference(mla):
    scene, rays, det_id, config = mla
    loss = RmsSpotRadius(surface_id=det_id)
    xla_fn = engine.build_trace_fn(scene.spec, scene.materials, config)
    val, (dp, dr) = jax.value_and_grad(
        lambda p, r: loss(xla_fn(p, r)), argnums=(0, 1)
    )(scene.params, rays)
    return loss, val, dp, dr


def test_wide_generic_vjp_matches_xla_grad(mla, xla_reference):
    scene, rays, det_id, config = mla
    loss, ref_val, ref_dp, ref_dr = xla_reference
    fn = fused_grad.build_fused_vjp_trace_fn(
        scene.spec, scene.materials, config, interpret=True
    )
    val, (dp, dr) = jax.value_and_grad(
        lambda p, r: loss(fn(p, r)), argnums=(0, 1)
    )(scene.params, rays)
    assert float(val) == pytest.approx(float(ref_val), rel=1e-12)
    _assert_grads_close(dp, ref_dp)
    np.testing.assert_allclose(
        np.asarray(dr.positions[:3]), np.asarray(ref_dr.positions[:3]),
        rtol=RTOL, atol=ATOL,
    )
    np.testing.assert_allclose(
        np.asarray(dr.directions[:3]), np.asarray(ref_dr.directions[:3]),
        rtol=RTOL, atol=ATOL,
    )


def test_wide_loss_fused_plan_matches_xla_grad(mla, xla_reference):
    scene, rays, det_id, config = mla
    loss, ref_val, ref_dp, ref_dr = xla_reference
    vg = fused_grad.build_fused_value_and_grad_fn(
        scene.spec, scene.materials, config, loss, interpret=True
    )
    val, (dp, dr) = jax.value_and_grad(vg, argnums=(0, 1))(scene.params, rays)
    assert float(val) == pytest.approx(float(ref_val), rel=1e-12)
    _assert_grads_close(dp, ref_dp)
    np.testing.assert_allclose(
        np.asarray(dr.positions[:3]), np.asarray(ref_dr.positions[:3]),
        rtol=RTOL, atol=ATOL,
    )


def test_wide_focus_error_loss_plan(mla):
    """A second loss descriptor through the wide loss-fused backward."""
    scene, rays, det_id, config = mla
    loss = FocusError(surface_id=det_id, target_focus=4.0)
    xla_fn = engine.build_trace_fn(scene.spec, scene.materials, config)
    ref_val, ref_dp = jax.value_and_grad(lambda p: loss(xla_fn(p, rays)))(
        scene.params
    )
    vg = fused_grad.build_fused_value_and_grad_fn(
        scene.spec, scene.materials, config, loss, interpret=True
    )
    val, dp = jax.value_and_grad(lambda p: vg(p, rays))(scene.params)
    assert float(val) == pytest.approx(float(ref_val), rel=1e-12)
    _assert_grads_close(dp, ref_dp)


def test_wide_grad_dispatch_enabled():
    scene, rays, det_id = _scene(5)
    assert ft.pick_fused(
        scene.spec, TraceConfig(use_fused=True), need_grad=True
    )


def test_wide_grad_leaf_cap_routes_to_staged():
    """Past the MONOLITHIC backward's leaf cap (Mosaic compile-helper
    crash boundary, fused_trace._FUSED_WIDE_GRAD_MAX_LEAVES) gradients
    now route to the STAGED backward (fused_grad._run_bwd_staged) instead
    of falling back to the XLA engine; forcing the monolithic kernel past
    its cap raises."""
    scene, rays, det_id = _scene(16)  # 513 leaves
    assert scene.spec.n_leaves > ft._FUSED_WIDE_GRAD_MAX_LEAVES
    assert ft.supports_fused_wide(scene.spec)
    assert fused_grad.wide_grad_mode(scene.spec, TraceConfig()) == "staged"
    assert ft.pick_fused(
        scene.spec, TraceConfig(use_fused=True), need_grad=True
    )
    with pytest.raises(ValueError):
        fused_grad.wide_grad_mode(
            scene.spec, TraceConfig(wide_grad="fused")
        )


def test_wide_traced_lenslet_radius_matches_fd():
    """End-to-end differentiable MLA design through build_objective: the
    shared lenslet radius drives the fused wide path on TPU and the XLA
    engine elsewhere; here (CPU) FD-check the XLA route but force the
    fused interpret route through the same objective value."""
    from pyrayt_tpu.analysis import build_objective
    from pyrayt_tpu.analysis.metrics import rms_spot_radius

    def build(r):
        lenslets = comp.microlens_array(r, 0.25, 5, 5, 1.0)
        detector = comp.baffle((10.0, 10.0)).move_x(4.0)
        return lenslets + [detector]

    with fresh_ids():
        det_id = float(build(jnp.asarray(2.0))[-1].get_id())

    src = comp.GridOfRays(4.5, 4.5).move_x(-1.0)
    rays = src.generate_rays(144)
    config = TraceConfig(generation_limit=4, fixed_loop=True)
    objective = build_objective(
        build, rays, lambda res: rms_spot_radius(res, det_id), config
    )
    r0 = jnp.asarray(2.0)
    value, grad = jax.value_and_grad(objective)(r0)
    eps = 1e-5
    fd = (float(objective(r0 + eps)) - float(objective(r0 - eps))) / (2 * eps)
    assert abs(float(grad) - fd) < 1e-4 * max(1.0, abs(fd))
