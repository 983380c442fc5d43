"""Heterogeneous wide scenes: distinct elements batch as one group.

Round-4's wide path only batched IDENTICAL-signature trees (microlens
arrays); a zoom-style assembly of distinct lenses (different radii,
thicknesses, apertures, GLASSES) fell back to the XLA engine's per-leaf
unrolling.  Since round 5 the shape signature is structure+types only
(engine._tree_sig) and materials / normal scales / public ids are
runtime meta-table data in the fused kernels, so the same assembly runs
the wide fused kernel.  These tests pin forward records and both
backward paths (monolithic wide kernel and staged) against the XLA
engine at f64 on a 61-leaf, 4-glass-slot assembly of 20 distinct elements.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyrayt_tpu import components as comp
from pyrayt_tpu import materials as matl
from pyrayt_tpu.analysis.metrics import RmsSpotRadius
from pyrayt_tpu.config import TraceConfig
from pyrayt_tpu.ops import fused_grad, fused_trace as ft
from pyrayt_tpu.scene.compile import compile_scene
from pyrayt_tpu.scene.objects import fresh_ids
from pyrayt_tpu.tracer import engine

RTOL = 1e-8
ATOL = 1e-12


def build_hetero_wall(n_elements=20, seed=0, pitch=2.6):
    """``n_elements`` DISTINCT biconvex elements (random radii/thickness/
    aperture, cycling through three glasses) side by side along Y, plus a
    detector — a heterogeneous "lens wall".  Every tree shares the
    thick-lens CSG shape, so the whole assembly batches as one
    heterogeneous group, and a wide beam crosses every element (unlike a
    sequential stack, whose depth would exceed the generation budget and
    starve the detector)."""
    glasses = [matl.glass["BK7"], matl.glass["SF5"], matl.glass["SF2"]]
    rng = np.random.default_rng(seed)
    elements = []
    for i in range(n_elements):
        r1 = 3.0 + 4.0 * rng.random()
        r2 = -(3.0 + 4.0 * rng.random())
        y = (i - (n_elements - 1) / 2.0) * pitch
        el = comp.thick_lens(
            r1, r2, 0.3 + 0.2 * rng.random(),
            aperture=1.5 + rng.random(), material=glasses[i % 3],
        ).move_y(y)
        elements.append(el)
    span = n_elements * pitch
    det = comp.baffle((span, span)).move_x(6.0)
    return elements + [det], det


@pytest.fixture(scope="module")
def hetero_wall():
    with fresh_ids():
        comps, det = build_hetero_wall()
        det_id = float(det.get_id())
        scene = compile_scene(comps)
    assert scene.spec.n_leaves == 61
    order, groups = engine._wide_plan(scene.spec)
    assert len(groups) == 1 and len(groups[0][2]) == 20
    assert len(set(scene.spec.leaf_mat_slot)) >= 4
    assert ft.supports_fused_wide(scene.spec)
    # width spans Y (the lens-wall axis), height stays within one aperture
    src = comp.GridOfRays(20 * 2.6 * 0.95, 1.0).move_x(-1.5)
    rays = src.generate_rays(512)
    rays = rays.replace(id=jnp.arange(512, dtype=rays.positions.dtype))
    config = TraceConfig(generation_limit=4, fixed_loop=True)
    return scene, rays, det_id, config


def test_hetero_forward_matches_xla(hetero_wall):
    scene, rays, det_id, config = hetero_wall
    fused = ft.build_fused_trace_fn(
        scene.spec, scene.materials, config, interpret=True
    )
    xla = engine.build_trace_fn(scene.spec, scene.materials, config)
    rf = fused(scene.params, rays)
    rx = xla(scene.params, rays)
    np.testing.assert_array_equal(
        np.asarray(rf.record_mask), np.asarray(rx.record_mask)
    )
    sel = np.asarray(rx.record_mask)[:, None, :]
    diff = np.where(
        sel, np.abs(np.asarray(rf.records) - np.asarray(rx.records)), 0.0
    )
    assert diff.max() < 1e-9, diff.max()
    # physics crossed the material boundaries: many distinct elements hit
    surf = np.asarray(rx.records[:, 5, :])[np.asarray(rx.record_mask)]
    assert len(np.unique(surf)) > 15


@pytest.mark.parametrize("mode", ["fused", "staged"])
def test_hetero_gradients_match_xla(hetero_wall, mode):
    scene, rays, det_id, config = hetero_wall
    gconfig = TraceConfig(
        generation_limit=4, fixed_loop=True, wide_grad=mode
    )
    loss = RmsSpotRadius(surface_id=det_id)
    xla = engine.build_trace_fn(scene.spec, scene.materials, config)
    ref_val, ref_dp = jax.value_and_grad(lambda p: loss(xla(p, rays)))(
        scene.params
    )
    vg = fused_grad.build_fused_value_and_grad_fn(
        scene.spec, scene.materials, gconfig, loss, interpret=True
    )
    val, dp = jax.value_and_grad(lambda p: vg(p, rays))(scene.params)
    assert float(val) == pytest.approx(float(ref_val), rel=1e-12)
    for k in ("world", "prim", "glass"):
        np.testing.assert_allclose(
            np.asarray(dp[k]), np.asarray(ref_dp[k]), rtol=RTOL, atol=ATOL,
            err_msg=k,
        )
    # gradients reach every glass slot (dispersion rows of all 3 glasses)
    g = np.asarray(dp["glass"])
    assert (np.abs(g).sum(axis=1) > 0).sum() >= 3
