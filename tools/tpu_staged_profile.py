"""TPU campaign phase 3: staged-backward phase table (VERDICT r4 #2).

Decomposes the staged wide gradient step at 8x8 (129 leaves) and 16x16
(513 leaves), 2^20 rays, G=4, RMS-spot loss:

* ``fwd``      — the fold-saving forward alone;
* ``no_sweep`` — full staged step with the chunk kernels' tree sweeps
  STUBBED to zero-writes (same refs, same HBM traffic and dispatch
  count, no per-tree vjp compute) — isolates tail vjps + orchestration
  glue + buffer traffic;
* ``full``     — the real step.

sweep_compute = full - no_sweep;  tail+glue = no_sweep - fwd.

Exits on its own deadline; run alone.
"""

import json
import os
import time

t_start = time.time()
DEADLINE_S = float(os.environ.get("PROFILE_DEADLINE_S", 2400))


def left():
    return DEADLINE_S - (time.time() - t_start)


def emit(**kw):
    print(json.dumps(kw), flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

emit(stage="boot", platform=jax.devices()[0].platform)

import pyrayt_tpu as pyrayt  # noqa: E402
from pyrayt_tpu import components as comp  # noqa: E402
from pyrayt_tpu.analysis.metrics import RmsSpotRadius  # noqa: E402
from pyrayt_tpu.config import TraceConfig  # noqa: E402
from pyrayt_tpu.ops import fused_grad, fused_trace as ft  # noqa: E402
from pyrayt_tpu.scene.compile import compile_scene  # noqa: E402
from pyrayt_tpu.scene.objects import fresh_ids  # noqa: E402

N_RAYS = 1 << 20


def mla(n):
    with fresh_ids():
        lenslets = comp.microlens_array(2.0, 0.25, n, n, 1.0)
        focus = pyrayt.lensmakers_equation(2.0, np.inf, 1.5, 0.25)
        det = comp.baffle((2.0 * n, 2.0 * n)).move_x(focus)
        det_id = float(det.get_id())
        scene = compile_scene(lenslets + [det])
    src = comp.GridOfRays(n * 1.05, n * 1.05).move_x(-1.0)
    rays = src.generate_rays(N_RAYS)
    rays = rays.replace(id=jnp.arange(N_RAYS, dtype=rays.positions.dtype))
    return scene, rays, det_id


def timeit(fn, args, k, label):
    @jax.jit
    def chained(*a):
        def body(i, acc):
            return acc + fn(*a, i)

        return lax.fori_loop(0, k, body, jnp.asarray(0.0, jnp.float32))

    t0 = time.time()
    jax.block_until_ready(chained(*args))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(chained(*args)))
        best = min(best, time.time() - t0)
    emit(stage=label, compile_s=round(compile_s, 1),
         ms=round(best / k * 1e3, 2))
    return best / k


STUB = {"on": False}

_real_group = fused_grad._make_staged_group_kernel.__wrapped__
_real_singles = fused_grad._make_staged_singles_kernel


def _stub_group(template, fast, types_pos, needs_pos, n_trees, n_prim_cols):
    if not STUB["on"]:
        return _real_group(
            template, fast, types_pos, needs_pos, n_trees, n_prim_cols
        )
    L = len(types_pos)

    def kernel(objtx_ref, prim_ref, scale_ref, code_ref, buf_ref, win_ref,
               dobj_ref, dprim_ref, dpv_ref):
        dtype = buf_ref.dtype
        first = pl.program_id(0) == 0

        @pl.when(first)
        def _init():
            def zrow(r, c):
                for i in range(16):
                    dobj_ref[r, i] = jnp.zeros((), dtype)
                for i in range(n_prim_cols):
                    dprim_ref[r, i] = jnp.zeros((), dtype)
                return c

            lax.fori_loop(0, n_trees * L, zrow, 0)

        dpv_ref[:] = jnp.zeros_like(dpv_ref) + buf_ref[6][None] * 0.0

    return kernel


def _stub_singles(singles_infos, n_prim_cols):
    if not STUB["on"]:
        return _real_singles(singles_infos, n_prim_cols)
    rows = sum(len(i["slots"]) for i in singles_infos)

    def kernel(objtx_ref, prim_ref, scale_ref, code_ref, buf_ref, win_ref,
               dobj_ref, dprim_ref, dpv_ref):
        dtype = buf_ref.dtype
        first = pl.program_id(0) == 0

        @pl.when(first)
        def _init():
            def zrow(r, c):
                for i in range(16):
                    dobj_ref[r, i] = jnp.zeros((), dtype)
                for i in range(n_prim_cols):
                    dprim_ref[r, i] = jnp.zeros((), dtype)
                return c

            lax.fori_loop(0, rows, zrow, 0)

        dpv_ref[:] = jnp.zeros_like(dpv_ref) + buf_ref[6][None] * 0.0

    return kernel


fused_grad._make_staged_group_kernel = _stub_group
fused_grad._make_staged_singles_kernel = _stub_singles

for n in (8, 16):
    if left() < 600:
        emit(stage="exit_early", n=n)
        break
    scene, rays, det_id = mla(n)
    loss = RmsSpotRadius(surface_id=det_id)
    config = TraceConfig(generation_limit=4, fixed_loop=True,
                         wide_grad="staged")

    # fwd (fold-saving) alone
    fwd_fold = ft.build_fused_trace_fn(
        scene.spec, scene.materials, config, save_fold=True
    )
    timeit(
        lambda p, r, i: fwd_fold(
            p, r.replace(positions=r.positions + i * 1e-30)
        )[0].records[0, 0, 0].astype(jnp.float32),
        (scene.params, rays), 4, f"fwd_{n}x{n}",
    )

    # no_sweep: stubbed chunk kernels (build fns are lru_cached on specs —
    # the stub flag changes which kernel body gets built, so clear caches)
    for stub in (True, False):
        STUB["on"] = stub
        # the builder is lru_cached on (spec, materials, config, loss) —
        # identical across stub modes — so clear it to force a rebuild
        fused_grad.build_fused_value_and_grad_fn.cache_clear()
        vg = fused_grad.build_fused_value_and_grad_fn(
            scene.spec, scene.materials, config, loss
        )
        grad_fn = jax.value_and_grad(vg)
        timeit(
            lambda p, r, i, grad_fn=grad_fn: (
                lambda vg_out: vg_out[0] + vg_out[1]["prim"][0, 0]
            )(grad_fn(p, r.replace(positions=r.positions + i * 1e-30))).astype(
                jnp.float32
            ),
            (scene.params, rays), 2,
            f"{'no_sweep' if stub else 'full'}_{n}x{n}",
        )

emit(stage="done", total_s=round(time.time() - t_start, 1))
