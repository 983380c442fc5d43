"""TPU campaign: forward-headline variance (VERDICT r4 #8).

BENCH_r03 measured 310M rays/s, BENCH_r04 297M (-4.2%) on the unchanged
condenser forward.  This script measures the same chained-dispatch
forward REPEATEDLY in one process (6 independent best-of-3 measurements,
a fresh chained program each time) to put a spread on the number, so the
delta can be attributed (or not) to run-to-run variance with data rather
than a shrug.  Exits on its own deadline; run alone.
"""

import json
import os
import time

t_start = time.time()
DEADLINE_S = float(os.environ.get("FWD_DEADLINE_S", 1500))


def emit(**kw):
    print(json.dumps(kw), flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

emit(stage="boot", platform=jax.devices()[0].platform)

from pyrayt_tpu import components as comp  # noqa: E402
from pyrayt_tpu import materials as matl  # noqa: E402
from pyrayt_tpu.config import TraceConfig  # noqa: E402
from pyrayt_tpu.ops import fused_trace as ft  # noqa: E402
from pyrayt_tpu.scene.compile import compile_scene  # noqa: E402
from pyrayt_tpu.scene.objects import fresh_ids  # noqa: E402

N_RAYS = 1 << 20
GENERATIONS = 6
# MUST match bench.py's CHAIN: the ~20-30 ms relay dispatch latency is
# amortized over the chain, so per-trace numbers at different K are not
# comparable (K=10 inflates ms/trace by ~1.3 ms vs K=20)
CHAIN = 20

with fresh_ids():
    lens = comp.thick_lens(
        r1=1.0, r2=-1.0, thickness=0.25, aperture=0.5,
        material=matl.glass["BK7"],
    )
    detector = comp.baffle((1.0, 1.0)).move_x(1.0)
    scene = compile_scene([lens, detector])
source = comp.ConeOfRays(cone_angle=10.0).move_x(-0.5)
rays = source.generate_rays(N_RAYS)
config = TraceConfig(generation_limit=GENERATIONS, fixed_loop=True)
fn = ft.build_fused_trace_fn(scene.spec, scene.materials, config)

samples = []
for rep in range(6):
    if time.time() - t_start > DEADLINE_S - 120:
        break

    @jax.jit
    def chained(params, rays0, _rep=rep):
        def body(i, acc):
            r = fn(
                params,
                rays0.replace(
                    positions=rays0.positions + (i + _rep * 0) * 1e-30
                ),
            )
            return acc + r.records[0, 0, 0] + r.final_rays.positions[0, 0]

        return lax.fori_loop(
            0, CHAIN, body, jnp.asarray(0.0, rays0.positions.dtype)
        )

    jax.block_until_ready(chained(scene.params, rays))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(chained(scene.params, rays)))
        best = min(best, time.perf_counter() - t0)
    ms = best / CHAIN * 1e3
    samples.append(ms)
    emit(stage="sample", rep=rep, ms=round(ms, 3),
         mrays_per_s=round(N_RAYS / best * CHAIN / 1e6, 1))

arr = np.asarray(samples)
emit(stage="summary", n=len(samples),
     ms_min=round(float(arr.min()), 3), ms_max=round(float(arr.max()), 3),
     ms_mean=round(float(arr.mean()), 3),
     spread_pct=round(float((arr.max() - arr.min()) / arr.mean() * 100), 1),
     mrays_best=round(N_RAYS / arr.min() / 1e3, 1),
     mrays_worst=round(N_RAYS / arr.max() / 1e3, 1))
emit(stage="done", total_s=round(time.time() - t_start, 1))
