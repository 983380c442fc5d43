"""TPU campaign phase 1: staged wide backward at 513 leaves on the chip.

Round-5 gate: the 16x16 microlens array (513 leaves) must compile and run
`value_and_grad` on the TPU through the STAGED backward — the capability
the monolithic kernel's Mosaic compile cap excluded.  Prints JSON lines;
exits cleanly on its own deadline (never kill it externally: a killed TPU
process wedges the axon relay for ~30 min).

Run:  python tools/tpu_staged_smoke.py  (alone — one JAX process at a time)
"""

import json
import os
import sys
import time

t_start = time.time()
DEADLINE_S = float(os.environ.get("SMOKE_DEADLINE_S", 2100))


def left():
    return DEADLINE_S - (time.time() - t_start)


def emit(**kw):
    print(json.dumps(kw), flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

emit(stage="boot", platform=jax.devices()[0].platform,
     device=str(jax.devices()[0]))

import pyrayt_tpu as pyrayt  # noqa: E402
from pyrayt_tpu import components as comp  # noqa: E402
from pyrayt_tpu.analysis import build_objective  # noqa: E402
from pyrayt_tpu.analysis.metrics import RmsSpotRadius  # noqa: E402
from pyrayt_tpu.config import TraceConfig  # noqa: E402
from pyrayt_tpu.ops import fused_grad, fused_trace as ft  # noqa: E402
from pyrayt_tpu.scene.objects import fresh_ids  # noqa: E402

N = 16
N_RAYS_SMALL = 1 << 17
N_RAYS_FULL = 1 << 20
R0 = 2.0


def build(r):
    lenslets = comp.microlens_array(r, 0.25, N, N, 1.0)
    focus = pyrayt.lensmakers_equation(R0, np.inf, 1.5, 0.25)
    det = comp.baffle((2.0 * N, 2.0 * N)).move_x(focus)
    return lenslets + [det]


with fresh_ids():
    det_id = float(build(jnp.asarray(R0))[-1].get_id())

src = comp.GridOfRays(N * 0.95, N * 0.95).move_x(-1.0)
config = TraceConfig(generation_limit=4, fixed_loop=True, wide_grad="staged")


def rays_of(n):
    r = src.generate_rays(n)
    return r.replace(id=jnp.arange(n, dtype=r.positions.dtype))


objective = build_objective(build, rays_of(N_RAYS_SMALL),
                            RmsSpotRadius(surface_id=det_id), config)
vg = jax.jit(jax.value_and_grad(objective))

emit(stage="compile_start", n_rays=N_RAYS_SMALL, deadline_left_s=round(left()))
t0 = time.time()
try:
    v, g = vg(jnp.asarray(R0, jnp.float32))
    v, g = float(v), float(g)
except Exception as exc:
    emit(stage="compile_FAILED", error=f"{type(exc).__name__}: {exc}"[:500])
    sys.exit(0)
emit(stage="compile_done", seconds=round(time.time() - t0, 1),
     loss=v, grad=g, finite=bool(np.isfinite(v) and np.isfinite(g)))

if left() < 300:
    emit(stage="exit_early", reason="deadline")
    sys.exit(0)

# FD spot check on-chip (f32, loose)
eps = 1e-3
obj_j = jax.jit(objective)
p = float(obj_j(jnp.asarray(R0 + eps, jnp.float32)))
m = float(obj_j(jnp.asarray(R0 - eps, jnp.float32)))
fd = (p - m) / (2 * eps)
rel = abs(g - fd) / max(abs(fd), abs(g), 1e-9)
emit(stage="fd_check", analytic=g, fd_central=fd, rel_err=round(rel, 4),
     ok=bool(rel < 0.05))

# timing at 2^17 then 2^20 (chained data-dependent steps / one dispatch)
for n_rays, k in ((N_RAYS_SMALL, 4), (N_RAYS_FULL, 3)):
    if left() < 420:
        emit(stage="exit_early", reason="deadline before timing", n_rays=n_rays)
        sys.exit(0)
    rr = rays_of(n_rays)
    obj_n = build_objective(build, rr, RmsSpotRadius(surface_id=det_id), config)
    vg_n = jax.jit(jax.value_and_grad(obj_n))

    @jax.jit
    def chained(r0, rr=rr, vg_n=vg_n, k=k):
        def body(i, acc):
            v, g = vg_n(r0 + i * jnp.asarray(1e-30, r0.dtype))
            return acc + v + g

        return lax.fori_loop(0, k, body, jnp.asarray(0.0, r0.dtype))

    t0 = time.time()
    jax.block_until_ready(chained(jnp.asarray(R0, jnp.float32)))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(chained(jnp.asarray(R0, jnp.float32))))
        best = min(best, time.time() - t0)
    ms = best / k * 1e3
    emit(stage="timing", n_rays=n_rays, chain=k,
         compile_s=round(compile_s, 1),
         ms_per_grad_step=round(ms, 2),
         grad_rays_per_second=round(n_rays / (ms / 1e3)))

emit(stage="done", total_s=round(time.time() - t_start, 1))
