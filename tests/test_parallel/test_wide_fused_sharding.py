"""WIDE fused kernel under shard_map: lens arrays trace (and train) with
the ray axis sharded over the 8-virtual-device mesh, matching the
unsharded XLA engine exactly.  The per-shard program is the wide kernel
(interpret mode on CPU); only generations_run is collectively reduced —
and in the train step, the shard_map transpose psums the per-shard
parameter cotangents of the wide backward.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pyrayt_tpu as pyrayt
from pyrayt_tpu import components as comp
from pyrayt_tpu.config import TraceConfig
from pyrayt_tpu.ops import fused_trace as ft
from pyrayt_tpu.parallel import default_mesh, pad_rayset, shard_rayset
from pyrayt_tpu.parallel.trace import build_sharded_trace_fn, build_train_step
from pyrayt_tpu.scene.compile import compile_scene
from pyrayt_tpu.scene.objects import fresh_ids
from pyrayt_tpu.tracer import engine


def _mla_system(n=5):
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


def test_wide_fused_sharded_trace_matches_unsharded():
    scene, rays, det_id = _mla_system(5)
    assert ft.supports_fused_wide(scene.spec)
    config = TraceConfig(generation_limit=4, fixed_loop=True)
    mesh = default_mesh(n_devices=8)
    # f64 rays under the test conftest: pass the itemsize so the VMEM
    # feasibility check matches what the kernel sees
    fn = build_sharded_trace_fn(scene, config, mesh, use_fused=True, itemsize=8)
    padded, n_valid = pad_rayset(rays, mesh.size)
    placed = shard_rayset(padded, mesh)
    sharded = fn(scene.params, placed)
    jax.block_until_ready(sharded)

    reference = engine.build_trace_fn(scene.spec, scene.materials, config)(
        scene.params, rays
    )
    mask_s = np.asarray(sharded.record_mask)[:, :n_valid]
    mask_r = np.asarray(reference.record_mask)
    assert np.array_equal(mask_s, mask_r)
    recs_s = np.asarray(sharded.records)[:, :, :n_valid] * mask_s[:, None, :]
    recs_r = np.asarray(reference.records) * mask_r[:, None, :]
    np.testing.assert_allclose(recs_s, recs_r, rtol=1e-12, atol=1e-12)
    assert int(sharded.generations_run) == int(reference.generations_run)


def test_wide_fused_train_step_matches_xla():
    from pyrayt_tpu.analysis.metrics import rms_spot_radius

    scene, rays, det_id = _mla_system(5)
    config = TraceConfig(generation_limit=4, fixed_loop=True)
    mesh = default_mesh(n_devices=8)
    loss = lambda res: rms_spot_radius(res, det_id)  # noqa: E731

    step_xla = build_train_step(
        scene, config, mesh, loss, learning_rate=1e-2, use_fused=False,
    )
    step_fused = build_train_step(
        scene, config, mesh, loss, learning_rate=1e-2, use_fused=True,
        itemsize=8,
    )
    padded, _ = pad_rayset(rays, mesh.size)
    placed = shard_rayset(padded, mesh)
    px, lx = step_xla(scene.params, placed)
    pf, lf = step_fused(scene.params, placed)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-10)
    for key in px:
        np.testing.assert_allclose(
            np.asarray(pf[key]), np.asarray(px[key]), rtol=1e-8, atol=1e-12,
            err_msg=key,
        )
