"""TPU campaign: root-cause the 15x computed-array fetch penalty.

Round 4 measured: fetching the committed (G, 15, n) record buffer takes
0.4-0.9 s, but fetching any COMPUTED array (eager slice + cast) takes
6-8 s.  Hypothesis: the penalty attaches to EAGER op results, not to
computed arrays per se — a jit-compiled function's output is a committed
buffer like a kernel output.  Arms (interleaved, best-of-2 each):

  naive      — np.asarray(records)                  (committed, baseline)
  eager      — np.asarray(records[:g].astype(f32))  (eager slice+cast)
  jitted     — np.asarray(jit(slice+cast)(records)) (jit output buffer)
  eager_copy — np.asarray(jnp.copy(records))        (eager, full size)

Exits on its own deadline; run alone.
"""

import json
import os
import time

t_start = time.time()
DEADLINE_S = float(os.environ.get("HOSTEDGE_DEADLINE_S", 1500))


def emit(**kw):
    print(json.dumps(kw), flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

emit(stage="boot", platform=jax.devices()[0].platform)

from pyrayt_tpu import components as comp  # noqa: E402
from pyrayt_tpu import materials as matl  # noqa: E402
from pyrayt_tpu.config import TraceConfig  # noqa: E402
from pyrayt_tpu.ops import fused_trace as ft  # noqa: E402
from pyrayt_tpu.scene.compile import compile_scene  # noqa: E402
from pyrayt_tpu.scene.objects import fresh_ids  # noqa: E402

N_RAYS = 1 << 20
G = 6

with fresh_ids():
    lens = comp.thick_lens(
        r1=1.0, r2=-1.0, thickness=0.25, aperture=0.5,
        material=matl.glass["BK7"],
    )
    det = comp.baffle((1.0, 1.0)).move_x(1.0)
    scene = compile_scene([lens, det])
src = comp.ConeOfRays(cone_angle=10.0).move_x(-0.5)
rays = src.generate_rays(N_RAYS)
config = TraceConfig(generation_limit=G, fixed_loop=True)
fn = ft.build_fused_trace_fn(scene.spec, scene.materials, config)
result = fn(scene.params, rays)
records = result.records
jax.block_until_ready(records)
g_live = 3  # condenser: 3 live generations

slice_cast = jax.jit(lambda r: r[:g_live].astype(jnp.float32))
warm = slice_cast(records)
jax.block_until_ready(warm)
del warm

arms = {
    "naive_committed": lambda: np.asarray(records),
    "eager_slice_cast": lambda: np.asarray(
        records[:g_live].astype(jnp.float32)
    ),
    "jitted_slice_cast": lambda: np.asarray(slice_cast(records)),
    "eager_copy": lambda: np.asarray(jnp.copy(records)),
}

times = {k: [] for k in arms}
for rep in range(2):
    for name, f in arms.items():
        if time.time() - t_start > DEADLINE_S - 120:
            break
        t0 = time.perf_counter()
        out = f()
        dt = time.perf_counter() - t0
        times[name].append(dt)
        emit(stage="arm", name=name, rep=rep, seconds=round(dt, 2),
             mb=round(out.nbytes / 1e6, 1))
        del out

summary = {
    k: round(min(v), 2) for k, v in times.items() if v
}
emit(stage="summary", best_seconds=summary)
emit(stage="done", total_s=round(time.time() - t_start, 1))
