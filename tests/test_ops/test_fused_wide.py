"""WIDE fused-kernel parity: the in-VMEM tree-axis loop must reproduce the
XLA engine's wide-scene path (itself parity-tested against the unrolled
engine in tests/test_tracer/test_wide_scenes.py).

All runs use the Pallas interpreter (CPU, f64); hardware agreement is
measured by ``bench.py --verify`` / ``--wide`` on the chip.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pyrayt_tpu as pyrayt
from pyrayt_tpu import components as comp
from pyrayt_tpu import materials as matl
from pyrayt_tpu.config import TraceConfig
from pyrayt_tpu.ops import fused_trace as ft
from pyrayt_tpu.scene.compile import compile_scene
from pyrayt_tpu.tracer import engine


def _rays(n_rays, span, x=-1.0):
    src = comp.GridOfRays(span, span).move_x(x)
    rays = src.generate_rays(n_rays)
    return rays.replace(id=jnp.arange(n_rays, dtype=rays.positions.dtype))


def _mla(n, extra=()):
    lenslets = comp.microlens_array(2.0, 0.25, n, n, 1.0)
    focus = pyrayt.lensmakers_equation(2.0, np.inf, 1.5, 0.25)
    detector = comp.baffle((2.0 * n, 2.0 * n)).move_x(focus)
    return lenslets + list(extra) + [detector]


def _assert_matches_xla(comps, rays, config):
    scene = compile_scene(comps)
    assert ft.supports_fused_wide(scene.spec), "scene must take the wide kernel"
    ref = engine.build_trace_fn(scene.spec, scene.materials, config)(
        scene.params, rays
    )
    out = ft.build_fused_trace_fn(
        scene.spec, scene.materials, config, interpret=True
    )(scene.params, rays)

    np.testing.assert_array_equal(
        np.asarray(out.record_mask), np.asarray(ref.record_mask)
    )
    sel = np.asarray(ref.record_mask)[:, None, :]
    diff = np.where(sel, np.abs(np.asarray(out.records) - np.asarray(ref.records)), 0.0)
    np.testing.assert_array_less(diff, 1e-12)
    for field in ("positions", "directions", "intensity", "index", "generation"):
        np.testing.assert_allclose(
            np.asarray(getattr(out.final_rays, field)),
            np.asarray(getattr(ref.final_rays, field)),
            atol=1e-12,
            err_msg=field,
        )
    assert int(out.generations_run) == int(ref.generations_run)
    return out


def test_wide_kernel_matches_xla_on_microlens_array():
    comps = _mla(5)  # 51 leaves: one 25-tree group + a single detector
    out = _assert_matches_xla(comps, _rays(512, 4.2), TraceConfig(generation_limit=4))
    assert int(np.asarray(out.record_mask).sum()) > 500  # real physics ran


def test_wide_kernel_mixed_group_and_csg_singles():
    """Group + an interval-CSG single (thick lens) + a network-path single
    (union compound mirror) in one scene."""
    lens = comp.thick_lens(5.0, -5.0, 0.5, aperture=2.0, material=matl.glass["BK7"])
    lens = lens.move_x(-0.6)
    # union trees take the comparator-network path inside the kernel
    from pyrayt_tpu.scene.csg import CSGSurface
    from pyrayt_tpu.core.csg import Operation
    from pyrayt_tpu.scene.surfaces import Sphere

    s1 = Sphere(0.5, material=matl.mirror).move_y(4.0)
    s2 = Sphere(0.5, material=matl.mirror).move_y(4.3)
    blob = CSGSurface(s1, s2, Operation.UNION)
    comps = _mla(5, extra=(lens, blob))
    scene = compile_scene(comps)
    order, groups = engine._wide_plan(scene.spec)
    kinds = [k for k, _ in order]
    assert kinds.count("group") == 1 and kinds.count("single") == 3
    _assert_matches_xla(comps, _rays(512, 4.2, x=-2.0), TraceConfig(generation_limit=5))


def test_wide_kernel_heterogeneous_group_merges():
    """Two lenslet arrays of DIFFERENT glass merge into ONE batched group:
    since round 5 the shape signature excludes materials/normal scales
    (engine._tree_sig) — the kernel reads them per tree from the runtime
    meta table — so heterogeneous assemblies (mixed glasses, radii,
    thicknesses) batch exactly like uniform arrays.  Bit-parity with the
    XLA engine across the material boundary is the point of this test."""
    a = comp.microlens_array(2.0, 0.25, 3, 3, 1.0)
    b = [
        lens.move_x(0.8)
        for lens in comp.microlens_array(
            3.0, 0.4, 3, 3, 1.0, material=matl.glass["BK7"]
        )
    ]
    detector = comp.baffle((8.0, 8.0)).move_x(6.0)
    comps = a + b + [detector]  # (9 + 9) trees x 2 leaves + 1 = 37 leaves
    scene = compile_scene(comps)
    order, groups = engine._wide_plan(scene.spec)
    assert len(groups) == 1
    assert len(groups[0][2]) == 18  # one 18-tree mixed-material group
    _assert_matches_xla(comps, _rays(512, 3.2, x=-1.0), TraceConfig(generation_limit=4))


def test_wide_kernel_vmem_budget_counts_the_tree_fold():
    assert ft.fused_block_rays(TraceConfig(), wide=True) <= ft.fused_block_rays(
        TraceConfig()
    )


def test_wide_kernel_rejects_ungrouped_wide_scene(monkeypatch):
    """A wide scene with no batchable group stays on the XLA engine."""
    comps = [comp.baffle((1.0, 1.0)).move_x(1.0 + 0.5 * i) for i in range(33)]
    scene = compile_scene(comps)
    assert scene.spec.n_leaves > ft._FUSED_MAX_LEAVES
    # the 33 baffles share one signature, so they group...
    assert ft.supports_fused_wide(scene.spec)
    # ...but with grouping suppressed the scene has no wide plan and the
    # fused kernels must decline it
    monkeypatch.setattr(engine, "_WIDE_GROUP_MIN", 10**9)
    engine._wide_plan.cache_clear()
    try:
        assert not ft.supports_fused_wide(scene.spec)
        with pytest.raises(ValueError):
            ft.pick_fused(scene.spec, TraceConfig(use_fused=True))
    finally:
        monkeypatch.undo()
        engine._wide_plan.cache_clear()
