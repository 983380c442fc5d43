"""Parity: fused Pallas trace kernel vs the XLA engine.

Runs the Pallas kernel in interpreter mode (CPU, same numerics as the jnp
engine) and asserts the full TraceResult contract matches
engine.build_trace_fn across every primitive type, CSG operation, packed
material, TIR, unaligned ray counts, and generation-limit exhaustion.
On TPU hardware the kernel is Mosaic-compiled; ``bench.py --verify``
measures the on-chip fused-vs-XLA disagreement (last measured 0.0% of the
1M-ray condenser at atol 1e-4) and asserts a 2% bound.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pyrayt_tpu.scene.csg as csg
from pyrayt_tpu import components as comp
from pyrayt_tpu import materials as matl
from pyrayt_tpu.config import TraceConfig
from pyrayt_tpu.ops import fused_trace
from pyrayt_tpu.scene.compile import compile_scene
from pyrayt_tpu.scene.surfaces import Sphere
from pyrayt_tpu.tracer import engine


def assert_result_parity(scene, rays, config, rtol=1e-9, atol=1e-9):
    fn_x = engine.build_trace_fn(scene.spec, scene.materials, config)
    fn_f = fused_trace.build_fused_trace_fn(
        scene.spec, scene.materials, config, interpret=True
    )
    rx = fn_x(scene.params, rays)
    rf = fn_f(scene.params, rays)

    mask_x = np.asarray(rx.record_mask)
    mask_f = np.asarray(rf.record_mask)
    assert np.array_equal(mask_x, mask_f), "record masks differ"
    assert int(rx.generations_run) == int(rf.generations_run)

    recs_x = np.asarray(rx.records) * mask_x[:, None, :]
    recs_f = np.asarray(rf.records) * mask_f[:, None, :]
    np.testing.assert_allclose(recs_f, recs_x, rtol=rtol, atol=atol)

    for field in ("positions", "directions", "generation", "intensity", "index"):
        np.testing.assert_allclose(
            np.asarray(getattr(rf.final_rays, field)),
            np.asarray(getattr(rx.final_rays, field)),
            rtol=rtol,
            atol=atol,
            err_msg=f"final_rays.{field} differs",
        )
    return rx, rf


class TestFlagshipParity:
    """Condenser scene: cylinder + 2 spheres (intersect/difference CSG),
    BK7 glass + absorbing baffle (plane)."""

    def _scene(self):
        lens = comp.thick_lens(
            1.0, -1.0, 0.25, aperture=0.5, material=matl.glass["BK7"]
        )
        det = comp.baffle((1.0, 1.0)).move_x(1.0)
        return compile_scene([lens, det])

    def test_parity_with_early_death(self):
        # rays die at generation ~3 of 6: the fused kernel's early-exit
        # while_loop must leave identical masks and masked records
        scene = self._scene()
        rays = comp.ConeOfRays(cone_angle=10.0).move_x(-0.5).generate_rays(256)
        rx, rf = assert_result_parity(
            scene, rays, TraceConfig(generation_limit=6, fixed_loop=True)
        )
        masks = np.asarray(rf.record_mask)
        assert masks[:3].any() and not masks[4:].any()

    def test_unaligned_ray_count(self):
        # 50 rays force padding to the (R x 128) block; padded rays must not
        # leak into records or masks
        scene = self._scene()
        rays = comp.ConeOfRays(cone_angle=10.0).move_x(-0.5).generate_rays(50)
        assert_result_parity(
            scene, rays, TraceConfig(generation_limit=6, fixed_loop=True)
        )


def test_all_five_primitives_and_mirror():
    """Sphere, paraboloid, plane, cube, cylinder in one scene; mirror +
    absorber + glass materials."""
    mirror_p = comp.parabolic_mirror(focus=0.5, thickness=0.1, aperture=1.0)
    mirror_s = comp.spherical_mirror(radius=2.0, thickness=0.1, aperture=0.5).move_x(
        2.0
    )
    prism = comp.equilateral_prism(0.5, 0.5, material=matl.glass["BK7"]).move_y(1.5)
    det = comp.baffle((3.0, 3.0)).move_x(3.0)
    scene = compile_scene([mirror_p, mirror_s, prism, det])
    types = set(scene.spec.leaf_types)
    assert types == {0, 1, 2, 3, 4}, types  # all five primitive codes
    kinds = set(scene.spec.mat_kinds)
    assert kinds == {matl.KIND_ABSORB, matl.KIND_MIRROR, matl.KIND_GLASS}

    rays = comp.LineOfRays(0.4).move_x(-1.0).generate_rays(64)
    assert_result_parity(
        scene, rays, TraceConfig(generation_limit=5, fixed_loop=True)
    )


def test_union_csg_parity():
    left = Sphere(1.0, material=matl.mirror)
    right = Sphere(1.0, material=matl.mirror).move_x(1.2)
    blob = csg.union(left, right)
    det = comp.baffle((6.0, 6.0)).move_x(-2.0)
    scene = compile_scene([blob, det])
    rays = comp.WedgeOfRays(40.0).move_x(-3.0).generate_rays(64)
    assert_result_parity(scene, rays, TraceConfig(generation_limit=4, fixed_loop=True))


def test_total_internal_reflection_parity():
    # rays entering a BK7 equilateral prism rotated -30 deg hit the second
    # face beyond the ~41 deg critical angle and TIR internally: the
    # generation >= 2 segments still carry the in-glass index
    prism = comp.equilateral_prism(1.0, 1.0, material=matl.glass["BK7"]).rotate_y(
        -30
    )
    det = comp.baffle((20.0, 20.0)).move_x(5.0)
    scene = compile_scene([prism, det])
    rays = comp.LineOfRays(0.3).move_x(-2.0).generate_rays(64)
    rx, _ = assert_result_parity(
        scene, rays, TraceConfig(generation_limit=8, fixed_loop=True)
    )
    recs = np.asarray(rx.records)
    mask = np.asarray(rx.record_mask)
    glassy = (recs[2:, 3, :] > 1.4) & mask[2:]
    assert glassy.any(), "no TIR bounce kept rays inside the glass"


def test_generation_limit_exhaustion():
    # two facing mirrors: rays never die; while_loop must run to the limit
    m1 = comp.plane_mirror(0.1, aperture=4.0)
    m2 = comp.plane_mirror(0.1, aperture=4.0).move_x(2.0)
    scene = compile_scene([m1, m2])
    rays = comp.LineOfRays(1.0).move_x(1.0).generate_rays(32)
    config = TraceConfig(generation_limit=5, fixed_loop=True)
    rx, rf = assert_result_parity(scene, rays, config)
    assert int(rf.generations_run) == 5
    assert np.asarray(rf.record_mask).all()


def test_generations_run_consistent_across_engines():
    """All three dispatch paths (scan, while-loop, fused) must report the
    same generations_run: the number of generations that recorded at least
    one living ray — NOT the raw while-loop iteration count, which includes
    the trailing all-dead pass (advisor round 2, medium)."""
    det = comp.baffle((4.0, 4.0)).move_x(1.0)
    scene = compile_scene([det])
    rays = comp.LineOfRays(1.0).move_x(-1.0).generate_rays(32)

    cfg_scan = TraceConfig(generation_limit=4, fixed_loop=True)
    cfg_while = TraceConfig(generation_limit=4, fixed_loop=False)
    r_scan = engine.build_trace_fn(scene.spec, scene.materials, cfg_scan)(
        scene.params, rays
    )
    r_while = engine.build_trace_fn(scene.spec, scene.materials, cfg_while)(
        scene.params, rays
    )
    r_fused = fused_trace.build_fused_trace_fn(
        scene.spec, scene.materials, cfg_scan, interpret=True
    )(scene.params, rays)
    assert int(r_scan.generations_run) == 1
    assert int(r_while.generations_run) == 1
    assert int(r_fused.generations_run) == 1


def test_while_loop_engine_parity():
    """assert_result_parity with the while-loop (fixed_loop=False) engine:
    masks, records, and generations_run must match the fused kernel."""
    lens = comp.thick_lens(1.0, -1.0, 0.25, aperture=0.5, material=matl.glass["BK7"])
    det = comp.baffle((1.0, 1.0)).move_x(1.0)
    scene = compile_scene([lens, det])
    rays = comp.ConeOfRays(cone_angle=10.0).move_x(-0.5).generate_rays(64)
    assert_result_parity(
        scene, rays, TraceConfig(generation_limit=6, fixed_loop=False)
    )


def test_supports_fused_rejects_custom_material():
    class Weird(matl.TracableMaterial):
        kind = matl.KIND_GLASS

        def trace(self, surface, ray_set):
            return ray_set

        def pure_trace(self, directions, normals, wavelength, index, intensity):
            return directions, index, intensity

    lens = comp.thick_lens(1.0, -1.0, 0.25, aperture=0.5, material=Weird())
    scene = compile_scene([lens])
    assert not fused_trace.supports_fused(scene.spec)
    with pytest.raises(ValueError, match="non-packed"):
        fused_trace.build_fused_trace_fn(
            scene.spec, scene.materials, TraceConfig(), interpret=True
        )


def test_vmem_budget_fallback():
    cfg_small = TraceConfig(generation_limit=6)
    cfg_huge = TraceConfig(generation_limit=4000)
    assert fused_trace.fused_block_rays(cfg_small, 4) is not None
    assert fused_trace.fused_block_rays(cfg_huge, 4) is None
    # f64 halves the block relative to f32
    r32 = fused_trace.fused_block_rays(cfg_small, 4)
    r64 = fused_trace.fused_block_rays(cfg_small, 8)
    assert r64 <= r32


def test_trace_rays_dispatch_respects_config():
    """use_fused=False must route to the XLA engine even where fused is
    feasible; use_fused=True off-TPU still runs (interpreted) — and raises
    for unsupported scenes."""
    lens = comp.thick_lens(1.0, -1.0, 0.25, aperture=0.5, material=matl.glass["BK7"])
    det = comp.baffle((1.0, 1.0)).move_x(1.0)
    scene = compile_scene([lens, det])
    rays = comp.ConeOfRays(cone_angle=10.0).move_x(-0.5).generate_rays(16)

    cfg = TraceConfig(generation_limit=3, fixed_loop=True, use_fused=False)
    r = engine.trace_rays(scene, rays, cfg)
    assert np.asarray(r.record_mask).any()

    cfg_bad = TraceConfig(generation_limit=4000, use_fused=True)
    with pytest.raises(ValueError, match="use_fused=True"):
        engine.trace_rays(scene, rays, cfg_bad)


def test_predicated_loop_driver_parity():
    """The predicated-static loop driver (round-4 #8 experiment: static
    record stores + pl.when-skipped generations, carry in VMEM scratch)
    is output-identical to the production while-loop driver."""
    lens = comp.thick_lens(1.0, -1.0, 0.25, aperture=0.5, material=matl.glass["BK7"])
    det = comp.baffle((1.0, 1.0)).move_x(1.0)
    scene = compile_scene([lens, det])
    rays = comp.ConeOfRays(cone_angle=10.0).move_x(-0.5).generate_rays(200)
    cfg = TraceConfig(generation_limit=6, fixed_loop=True)
    a = fused_trace.build_fused_trace_fn(
        scene.spec, scene.materials, cfg, interpret=True
    )(scene.params, rays)
    b = fused_trace.build_fused_trace_fn(
        scene.spec, scene.materials, cfg, interpret=True,
        static_loop="predicated",
    )(scene.params, rays)
    np.testing.assert_array_equal(np.asarray(a.record_mask), np.asarray(b.record_mask))
    np.testing.assert_array_equal(np.asarray(a.records), np.asarray(b.records))
    np.testing.assert_array_equal(
        np.asarray(a.final_rays.positions), np.asarray(b.final_rays.positions)
    )
    assert int(a.generations_run) == int(b.generations_run)


def test_block_rows_are_powers_of_two():
    """Non-pow2 blocks measured 2x slower (round-4 sweep); sizing clamps."""
    from pyrayt_tpu.ops import fused_grad

    for g in (3, 4, 6, 8, 10, 16):
        cfg = TraceConfig(generation_limit=g)
        for r in (
            fused_trace.fused_block_rays(cfg, 4),
            fused_grad.bwd_block_rays(cfg, 4),
            fused_grad.bwd_block_rays(cfg, 4, loss_mode=True),
        ):
            if r is not None:
                assert r & (r - 1) == 0, (g, r)
