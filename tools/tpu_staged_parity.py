"""TPU campaign phase 2: on-chip ANALYTIC gradient parity + phase profile.

The f32 FD check at the 16x16 MLA is noise-limited (boundary rays flip
discretely under an eps step), so correctness on chip is pinned the same
way the CPU tier pins it: against analytic gradients —

* staged vs jax.grad of the XLA engine at 16x16 (513 leaves, 2^17 rays);
* staged vs the MONOLITHIC wide backward kernel at 12x12 (289 leaves —
  the largest scene where both compile), elementwise.

Also times the fold-saving forward alone at 16x16/2^20 — the staged
backward's phase table needs it (design notes).

Exits on its own deadline; run alone (one JAX process at a time).
"""

import json
import os
import sys
import time

t_start = time.time()
DEADLINE_S = float(os.environ.get("PARITY_DEADLINE_S", 2700))


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
from pyrayt_tpu.tracer import engine  # noqa: E402


def mla(n, n_rays):
    with fresh_ids():
        lenslets = comp.microlens_array(2.0, 0.25, n, n, 1.0)
        focus = pyrayt.lensmakers_equation(2.0, np.inf, 1.5, 0.25)
        det = comp.baffle((2.0 * n, 2.0 * n)).move_x(focus)
        det_id = float(det.get_id())
        scene = compile_scene(lenslets + [det])
    src = comp.GridOfRays(n * 0.95, n * 0.95).move_x(-1.0)
    rays = src.generate_rays(n_rays)
    rays = rays.replace(id=jnp.arange(n_rays, dtype=rays.positions.dtype))
    return scene, rays, det_id


def rel_table(dp, ref):
    out = {}
    for k in ("world", "prim", "glass"):
        a, b = np.asarray(dp[k], np.float64), np.asarray(ref[k], np.float64)
        denom = max(np.abs(b).max(), 1e-30)
        out[k] = float(np.abs(a - b).max() / denom)
    return out


# --- A: staged vs XLA-engine autodiff at 513 leaves, on chip ------------
# NOTE: jax.grad of the XLA engine at 513 leaves x 2^17 rays needs 36 GB
# of HBM for saved residuals (measured: OOM) — remat + a 2^14-ray probe
# is the only way the REFERENCE itself fits on the chip.  The staged
# path has no such limit (the record buffer IS its residual).
config = TraceConfig(generation_limit=4, fixed_loop=True)
try:
    scene, rays, det_id = mla(16, 1 << 14)
    loss = RmsSpotRadius(surface_id=det_id)
    emit(stage="xla_grad_compile_start", leaves=scene.spec.n_leaves,
         left_s=round(left()))
    t0 = time.time()
    remat_cfg = TraceConfig(generation_limit=4, fixed_loop=True, remat=True)
    xla_fn = engine.build_trace_fn(scene.spec, scene.materials, remat_cfg)
    ref_val, ref_dp = jax.jit(
        jax.value_and_grad(lambda p: loss(xla_fn(p, rays)))
    )(scene.params)
    jax.block_until_ready(ref_dp)
    emit(stage="xla_grad_done", seconds=round(time.time() - t0, 1),
         loss=float(ref_val))

    t0 = time.time()
    staged_cfg = TraceConfig(generation_limit=4, fixed_loop=True,
                             wide_grad="staged")
    vg = fused_grad.build_fused_value_and_grad_fn(
        scene.spec, scene.materials, staged_cfg, loss
    )
    val, dp = jax.jit(jax.value_and_grad(lambda p: vg(p, rays)))(scene.params)
    jax.block_until_ready(dp)
    emit(stage="staged_16x16_parity", seconds=round(time.time() - t0, 1),
         loss_staged=float(val), loss_xla=float(ref_val),
         loss_rel=abs(float(val) - float(ref_val))
         / max(abs(float(ref_val)), 1e-30),
         max_rel=rel_table(dp, ref_dp))
except Exception as exc:
    emit(stage="part_A_failed", error=f"{type(exc).__name__}: {exc}"[:300])

# --- B: staged vs monolithic at 289 leaves, elementwise ------------------
if left() < 900:
    emit(stage="exit_early", reason="deadline before 12x12")
    sys.exit(0)
scene2, rays2, det2 = mla(12, 1 << 17)
loss2 = RmsSpotRadius(surface_id=det2)
res = {}
for mode in ("fused", "staged"):
    t0 = time.time()
    cfg = TraceConfig(generation_limit=4, fixed_loop=True, wide_grad=mode)
    vg2 = fused_grad.build_fused_value_and_grad_fn(
        scene2.spec, scene2.materials, cfg, loss2
    )
    v2, d2 = jax.jit(jax.value_and_grad(lambda p: vg2(p, rays2)))(scene2.params)
    jax.block_until_ready(d2)
    res[mode] = (float(v2), d2)
    emit(stage=f"mode_{mode}_done", seconds=round(time.time() - t0, 1),
         loss=float(v2))
vf, df = res["fused"]
vs, ds = res["staged"]
emit(stage="staged_vs_monolithic_289",
     loss_fused=vf, loss_staged=vs, loss_equal=bool(vf == vs),
     max_rel=rel_table(ds, df))

# --- C: fold-saving forward alone at 16x16 / 2^20 (phase table) ----------
if left() < 600:
    emit(stage="exit_early", reason="deadline before fold fwd")
    sys.exit(0)
scene3, rays3, det3 = mla(16, 1 << 20)
fwd_plain = ft.build_fused_trace_fn(
    scene3.spec, scene3.materials, config
)
fwd_fold = ft.build_fused_trace_fn(
    scene3.spec, scene3.materials, config, save_fold=True
)
for name, fn, pick in (
    ("wide_forward_plain", fwd_plain, lambda r: r.records[0, 0, 0]),
    ("wide_forward_fold", fwd_fold, lambda r: r[0].records[0, 0, 0] + r[2][0, 0]),
):
    @jax.jit
    def chained(params, rays0, fn=fn, pick=pick):
        def body(i, acc):
            r = fn(params, rays0.replace(positions=rays0.positions + i * 1e-30))
            return acc + pick(r).astype(rays0.positions.dtype)

        return lax.fori_loop(0, 4, body, jnp.asarray(0.0, rays0.positions.dtype))

    t0 = time.time()
    jax.block_until_ready(chained(scene3.params, rays3))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(chained(scene3.params, rays3)))
        best = min(best, time.time() - t0)
    emit(stage=name, compile_s=round(compile_s, 1),
         ms_per_trace=round(best / 4 * 1e3, 2))

emit(stage="done", total_s=round(time.time() - t_start, 1))
