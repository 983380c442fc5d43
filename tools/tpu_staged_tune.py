"""TPU campaign phase 4: staged-backward tuning + mode comparison.

* subchunk sweep (winner-skip granularity) at 8x8 and 16x16;
* monolithic wide kernel vs staged at 8x8, same process, same inputs —
  the wide_grad auto-dispatch decision data.

Exits on its own deadline; run alone.
"""

import json
import os
import time

t_start = time.time()
DEADLINE_S = float(os.environ.get("TUNE_DEADLINE_S", 2700))


def left():
    return DEADLINE_S - (time.time() - t_start)


def emit(**kw):
    print(json.dumps(kw), flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

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


def grad_ms(scene, rays, det_id, mode, k=2):
    cfg = TraceConfig(generation_limit=4, fixed_loop=True, wide_grad=mode)
    loss = RmsSpotRadius(surface_id=det_id)
    fused_grad.build_fused_value_and_grad_fn.cache_clear()
    vg = fused_grad.build_fused_value_and_grad_fn(
        scene.spec, scene.materials, cfg, loss
    )
    grad_fn = jax.value_and_grad(vg)

    @jax.jit
    def chained(p, r):
        def body(i, acc):
            v, g = grad_fn(p, r.replace(positions=r.positions + i * 1e-30))
            return acc + v + g["prim"][0, 0]

        return lax.fori_loop(0, k, body, jnp.asarray(0.0, jnp.float32))

    t0 = time.time()
    jax.block_until_ready(chained(scene.params, rays))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(chained(scene.params, rays)))
        best = min(best, time.time() - t0)
    return best / k * 1e3, compile_s


for n in (8, 16):
    scene, rays, det_id = mla(n)
    # monolithic (8x8 only — 16x16 exceeds its compile cap)
    if n == 8:
        ms, cs = grad_ms(scene, rays, det_id, "fused")
        emit(stage="monolithic", n=n, ms=round(ms, 2), compile_s=round(cs, 1))
    for sub in (8, 16, 32):
        if left() < 420:
            emit(stage="exit_early")
            raise SystemExit(0)
        fused_grad._STAGED_SUBCHUNK_TREES = sub
        ms, cs = grad_ms(scene, rays, det_id, "staged")
        emit(stage="staged", n=n, subchunk=sub, ms=round(ms, 2),
             compile_s=round(cs, 1),
             rays_per_s=round(N_RAYS / (ms / 1e3)))

emit(stage="done", total_s=round(time.time() - t_start, 1))
