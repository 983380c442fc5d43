"""Headline benchmark: rays/s on a 1M-ray condenser trace (BASELINE.md).

Runs the flagship condenser scene (cone source -> BK7 biconvex lens ->
detector baffle, the reference tutorial's system) with 2**20 rays for a
6-bounce budget on whatever accelerator JAX finds (TPU under the driver;
CPU works for smoke tests with PYRAYT_BENCH_RAYS set lower).

Measurement methodology: the TPU here sits behind a relay with ~30 ms
dispatch latency, so wall-clock around one call mostly measures the
network.  The benchmark therefore chains K data-dependent traces inside a
single dispatch (lax.fori_loop) and divides — that is device compute time.
The end-to-end single-dispatch time is reported alongside.

Prints ONE JSON line:
    {"metric": "rays_per_second", "value": N, "unit": "rays/s", ...}

Units (VERDICT round 1 asked for both, explicitly named):
  * value / rays_per_second      — full traces completed x rays per trace
                                   per second of device time (honest unit:
                                   one 2**20-ray trace / device seconds)
  * ray_generations_per_second   — rays x generation_limit per second (the
                                   engine's unit of masked work; the round-1
                                   headline unit)

The reference publishes no numbers (SURVEY.md section 6), so
``vs_baseline`` is measured against PyRayT itself on this machine's CPU
(cached in .baseline_cpu.json), else against the BASELINE.md north-star
floor of 100M rays/s/chip.  Both sides use full-trace rays/s.
"""

from __future__ import annotations

import json
import os
import time

import jax

# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it via the
# config API (effective because no backend is initialized at import)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
from jax import lax

N_RAYS = int(os.environ.get("PYRAYT_BENCH_RAYS", 1 << 20))
GENERATIONS = int(os.environ.get("PYRAYT_BENCH_GENERATIONS", 6))
REPEATS = int(os.environ.get("PYRAYT_BENCH_REPEATS", 4))
CHAIN = int(os.environ.get("PYRAYT_BENCH_CHAIN", 20))
_BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".baseline_cpu.json")


def build():
    from pyrayt_tpu import components as comp
    from pyrayt_tpu import materials as matl
    from pyrayt_tpu.config import TraceConfig
    from pyrayt_tpu.scene.compile import compile_scene
    from pyrayt_tpu.ops import fused_trace as ft
    from pyrayt_tpu.tracer import engine

    lens = comp.thick_lens(
        r1=1.0, r2=-1.0, thickness=0.25, aperture=0.5, material=matl.glass["BK7"]
    )
    detector = comp.baffle((1.0, 1.0)).move_x(1.0)
    source = comp.ConeOfRays(cone_angle=10.0).move_x(-0.5)

    scene = compile_scene([lens, detector])
    config = TraceConfig(generation_limit=GENERATIONS, fixed_loop=True)
    # same dispatch rule as engine.trace_rays: fused on TPU, XLA elsewhere
    if ft.supports_fused(scene.spec) and ft.on_tpu():
        fn = ft.build_fused_trace_fn(scene.spec, scene.materials, config)
        engine_name = "fused-pallas"
    else:
        fn = engine.build_trace_fn(scene.spec, scene.materials, config)
        engine_name = "xla"
    rays = source.generate_rays(N_RAYS)
    return fn, scene.params, rays, engine_name


def measure_reference_baseline() -> float:
    """Reference PyRayT full-trace rays/s on this host's CPU (cached)."""
    if os.path.exists(_BASELINE_CACHE):
        with open(_BASELINE_CACHE) as f:
            cached = json.load(f)
            if "full_trace_rays_per_second" in cached:
                return cached["full_trace_rays_per_second"]
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        # the reference pins pandas<2 and uses the removed DataFrame.append
        # (SURVEY.md quirk Q6); shim it so it runs under modern pandas
        import pandas as pd

        if not hasattr(pd.DataFrame, "append"):
            pd.DataFrame.append = lambda self, other, ignore_index=False: pd.concat(
                [self, other], ignore_index=ignore_index
            )
        import pyrayt  # noqa: F401  (reference, run-only: no code is copied)
        from pyrayt import components as rcomp
        from pyrayt import materials as rmatl

        lens = rcomp.thick_lens(
            r1=1.0, r2=-1.0, thickness=0.25, aperture=0.5,
            material=rmatl.glass["BK7"],
        )
        detector = rcomp.baffle((1.0, 1.0)).move_x(1.0)
        source = rcomp.ConeOfRays(cone_angle=10.0).move_x(-0.5)
        n_ref = min(N_RAYS, 1 << 15)  # the reference cannot do 1M in sane time
        tracer = pyrayt.RayTracer(
            source, [lens, detector], rays_per_source=n_ref,
            generation_limit=GENERATIONS,
        )
        t0 = time.perf_counter()
        tracer.trace()
        dt = time.perf_counter() - t0
        # full-trace basis: traces/s x rays per trace (one trace measured)
        rps = n_ref / dt
        with open(_BASELINE_CACHE, "w") as f:
            json.dump(
                {
                    "full_trace_rays_per_second": rps,
                    "n_rays": n_ref,
                    "generations": GENERATIONS,
                    "seconds": dt,
                },
                f,
            )
        return rps
    except Exception:
        return float("nan")
    finally:
        sys.path.remove("/root/reference")


def main():
    import numpy as np

    fn, params, rays, engine_name = build()

    # single-dispatch end-to-end (includes relay latency + one-element fetch)
    result = fn(params, rays)  # compile + warm
    jax.block_until_ready(result)
    float(np.asarray(result.records[0, 0, 0]))
    e2e = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        result = fn(params, rays)
        float(np.asarray(result.records[0, 0, 0]))
        e2e = min(e2e, time.perf_counter() - t0)

    # device time: CHAIN data-dependent traces inside one dispatch
    @jax.jit
    def chained(params, rays0):
        def body(i, acc):
            r = fn(params, rays0.replace(positions=rays0.positions + i * 1e-30))
            return acc + r.records[0, 0, 0] + r.final_rays.positions[0, 0]

        return lax.fori_loop(0, CHAIN, body, jnp.asarray(0.0, rays0.positions.dtype))

    out = chained(params, rays)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(np.asarray(chained(params, rays)))
        best = min(best, time.perf_counter() - t0)
    device_per_trace = best / CHAIN

    rays_per_second = N_RAYS / device_per_trace
    ray_generations_per_second = N_RAYS * GENERATIONS / device_per_trace

    # compute-efficiency from MEASURED constants (bench.py --profile derives
    # them from XLA cost analysis + the actual trace's liveness; last run:
    # 211.3 flops+transcendentals per ray-generation, 3 live generations on
    # this scene) — against a nominal ~4 Tops/s f32 VPU on v5e.  Run
    # --profile to re-measure; see docs/design_notes.md.
    LIVE_GENERATIONS = 3
    OPS_PER_RAY_GEN = 211.3
    effective_tops = OPS_PER_RAY_GEN * LIVE_GENERATIONS * N_RAYS / device_per_trace / 1e12
    vpu_utilization = effective_tops / 4.0

    # gradient path (fwd+bwd rays/s) — the north star is gradient-driven
    # design, so the headline artifact carries both numbers.  Guarded: a
    # failure here must never sink the forward headline.
    gradient_fields = {}
    if os.environ.get("PYRAYT_BENCH_SKIP_GRADIENT", "0") != "1":
        try:
            gradient_fields = _measure_gradient_fields()
        except Exception as exc:  # pragma: no cover - defensive
            gradient_fields = {"gradient_error": f"{type(exc).__name__}: {exc}"}

    # trace()->DataFrame host edge (VERDICT round 3, next #3): naive
    # full-buffer fetch vs device-side compaction (tracer/frame.py)
    hostedge_fields = {}
    if os.environ.get("PYRAYT_BENCH_SKIP_HOSTEDGE", "0") != "1":
        try:
            hostedge_fields = _measure_hostedge_fields(fn, params, rays)
        except Exception as exc:  # pragma: no cover - defensive
            hostedge_fields = {"frame_error": f"{type(exc).__name__}: {exc}"}

    # wide-scene headline (VERDICT round 4, next #6): the 16x16 microlens
    # array (513 leaves) — fused wide forward AND the staged wide gradient
    # — so the driver artifact carries the array story, not just design
    # notes.  Guarded like the gradient fields.
    wide_fields = {}
    if os.environ.get("PYRAYT_BENCH_SKIP_WIDE", "0") != "1":
        try:
            wide_fields = _measure_wide_fields()
        except Exception as exc:  # pragma: no cover - defensive
            wide_fields = {"wide_error": f"{type(exc).__name__}: {exc}"}

    baseline = measure_reference_baseline()
    if baseline == baseline:  # not NaN
        vs = rays_per_second / baseline
    else:
        vs = rays_per_second / 100e6  # north-star floor

    print(
        json.dumps(
            {
                "metric": "rays_per_second",
                "value": round(rays_per_second),
                "unit": "rays/s (full 2**20-ray condenser trace / device time)",
                "vs_baseline": round(vs, 3),
                "ray_generations_per_second": round(ray_generations_per_second),
                "device_ms_per_trace": round(device_per_trace * 1e3, 3),
                "end_to_end_ms_single_dispatch": round(e2e * 1e3, 3),
                "effective_tops_measured_flops_basis": round(effective_tops, 4),
                "vpu_utilization_measured_flops_basis": round(vpu_utilization, 4),
                "engine": engine_name,
                "n_rays": N_RAYS,
                "generation_limit": GENERATIONS,
                **gradient_fields,
                **hostedge_fields,
                **wide_fields,
            }
        )
    )


def _measure_wide_fields(n: int = 16, chain_fwd: int = 4, chain_grad: int = 2):
    """Compact wide-scene fields for the default artifact: the 16x16 MLA
    (513 leaves) through the WIDE fused forward kernel and the STAGED wide
    backward — the scene size the monolithic backward's compile cap
    excluded until round 5.  Full sweeps live in ``--wide``."""
    import numpy as np

    import pyrayt_tpu as pyrayt
    from pyrayt_tpu import components as comp
    from pyrayt_tpu.analysis.metrics import RmsSpotRadius
    from pyrayt_tpu.config import TraceConfig
    from pyrayt_tpu.ops import fused_grad, fused_trace as ft
    from pyrayt_tpu.scene.compile import compile_scene
    from pyrayt_tpu.scene.objects import fresh_ids

    config = TraceConfig(generation_limit=4, fixed_loop=True)
    with fresh_ids():
        lenslets = comp.microlens_array(2.0, 0.25, n, n, 1.0)
        focus = pyrayt.lensmakers_equation(2.0, np.inf, 1.5, 0.25)
        detector = comp.baffle((2.0 * n, 2.0 * n)).move_x(focus)
        det_id = float(detector.get_id())
        scene = compile_scene(lenslets + [detector])
    src = comp.GridOfRays(n * 0.95, n * 0.95).move_x(-1.0)
    rays = src.generate_rays(N_RAYS)
    rays = rays.replace(id=jnp.arange(N_RAYS, dtype=rays.positions.dtype))
    interpret = not ft.on_tpu()

    out = {"wide_n_leaves": scene.spec.n_leaves}

    # forward: fused wide kernel
    fwd = ft.build_fused_trace_fn(
        scene.spec, scene.materials, config, interpret=interpret
    )

    @jax.jit
    def chained_f(params, rays0):
        def body(i, acc):
            r = fwd(params, rays0.replace(positions=rays0.positions + i * 1e-30))
            return acc + r.records[0, 0, 0] + r.final_rays.positions[0, 0]

        return lax.fori_loop(
            0, chain_fwd, body, jnp.asarray(0.0, rays0.positions.dtype)
        )

    jax.block_until_ready(chained_f(scene.params, rays))
    best = float("inf")
    for _ in range(max(2, REPEATS // 2)):
        t0 = time.perf_counter()
        float(np.asarray(chained_f(scene.params, rays)))
        best = min(best, time.perf_counter() - t0)
    t_f = best / chain_fwd
    out["wide_device_ms_per_trace"] = round(t_f * 1e3, 2)
    out["wide_rays_per_second"] = round(N_RAYS / t_f)

    # gradient: STAGED wide backward (513 leaves > the monolithic cap)
    loss = RmsSpotRadius(surface_id=det_id)
    vg = fused_grad.build_fused_value_and_grad_fn(
        scene.spec, scene.materials, config, loss, interpret=interpret
    )
    grad_fn = jax.jit(jax.value_and_grad(vg))

    @jax.jit
    def chained_g(params, rays0):
        def body(i, acc):
            v, g = grad_fn(
                params, rays0.replace(positions=rays0.positions + i * 1e-30)
            )
            return acc + v + g["prim"][0, 0]

        return lax.fori_loop(
            0, chain_grad, body, jnp.asarray(0.0, rays0.positions.dtype)
        )

    jax.block_until_ready(chained_g(scene.params, rays))
    best = float("inf")
    for _ in range(max(2, REPEATS // 2)):
        t0 = time.perf_counter()
        float(np.asarray(chained_g(scene.params, rays)))
        best = min(best, time.perf_counter() - t0)
    t_g = best / chain_grad
    out["wide_gradient_device_ms_per_step"] = round(t_g * 1e3, 2)
    out["wide_gradient_rays_per_second"] = round(N_RAYS / t_g)
    out["wide_gradient_engine"] = (
        f"fused-pallas-{fused_grad.wide_grad_mode(scene.spec, config)}"
    )
    return out


def _measure_hostedge_fields(fn, params, rays):
    """Frame-materialization cost at production scale: device->host fetch
    + pandas build, naive vs the sliced dtype-tight variant
    (pyrayt_tpu/tracer/frame.py), on a FRESH buffer per measurement.

    Round-4's version of this measurement re-fetched the SAME committed
    buffer, whose host copy jax caches after the first transfer — the
    "naive 0.4-0.9 s" headline was host-side memcpy of that cache, not a
    transfer, while every compact call computed a fresh array and paid
    the real relay cost.  Production ``trace()`` always fetches fresh
    buffers, so each arm here re-traces with perturbed inputs first
    (design notes, round-5 correction).
    """
    from pyrayt_tpu.tracer.frame import records_to_dataframe

    def fresh(i):
        r = fn(
            params,
            rays.replace(positions=rays.positions + i * 1e-30),
        )
        jax.block_until_ready(r)
        return r

    result = fresh(0)
    rows = len(
        records_to_dataframe(result.records, result.record_mask, compact=True)
    )
    g, c, n = result.records.shape
    itemsize = jnp.dtype(result.records.dtype).itemsize

    naive_s = compact_s = float("inf")
    for i in range(2):
        r1 = fresh(2 * i + 1)
        t0 = time.perf_counter()
        records_to_dataframe(r1.records, r1.record_mask, compact=True)
        compact_s = min(compact_s, time.perf_counter() - t0)
        r2 = fresh(2 * i + 2)
        t0 = time.perf_counter()
        records_to_dataframe(r2.records, r2.record_mask, compact=False)
        naive_s = min(naive_s, time.perf_counter() - t0)
    return {
        "frame_rows": rows,
        "frame_ms_naive_fetch": round(naive_s * 1e3, 1),
        "frame_ms_compacted_fetch": round(compact_s * 1e3, 1),
        "frame_fetch_speedup": round(naive_s / compact_s, 2),
        "frame_mb_device_buffer": round(g * c * n * itemsize / 1e6, 1),
        "frame_note": (
            "fresh-buffer fetches (the production case): the compact "
            "jitted slice+cast is the default; re-reads of one cached "
            "buffer favor naive (see design notes round-5 correction)"
        ),
    }


def _pick_gradient_path(scene, config, detector):
    """(loss_name, value_and_grad fn, engine label) for the condenser
    gradient benchmarks.  Fastest first:

    * loss-fused Pallas backward (ops/fused_grad.build_fused_value_and_grad_fn):
      the RMS-spot cotangent is synthesized in-kernel from scalars — no
      (G, 15, n) cotangent buffer.  Loss = RMS spot on the DETECTOR (the
      recommended objective).  PYRAYT_BENCH_FUSED_LOSS=0 disables;
    * generic fused Pallas forward+backward (PYRAYT_BENCH_FUSED_GRAD=0
      disables) with the same detector-restricted loss;
    * XLA scan engine (+ remat per config).
    """
    from pyrayt_tpu.analysis.metrics import RmsSpotRadius, rms_spot_radius
    from pyrayt_tpu.ops import fused_grad, fused_trace as ft
    from pyrayt_tpu.tracer import engine

    det_id = float(detector.get_id())
    loss = RmsSpotRadius(surface_id=det_id)
    fused_ok = (
        ft.supports_fused(scene.spec)
        and ft.on_tpu()
        and fused_grad.bwd_block_rays(config) is not None
    )
    if fused_ok and os.environ.get("PYRAYT_BENCH_FUSED_LOSS", "1") != "0":
        fn = fused_grad.build_fused_value_and_grad_fn(
            scene.spec, scene.materials, config, loss
        )
        return loss, jax.value_and_grad(fn), "fused-pallas-loss-vjp"
    if fused_ok and os.environ.get("PYRAYT_BENCH_FUSED_GRAD", "1") != "0":
        trace = fused_grad.build_fused_vjp_trace_fn(
            scene.spec, scene.materials, config
        )
        return loss, jax.value_and_grad(lambda p, r: loss(trace(p, r))), "fused-pallas-vjp"
    trace = engine.build_trace_fn(scene.spec, scene.materials, config)
    return loss, jax.value_and_grad(lambda p, r: loss(trace(p, r))), "xla-scan"


def _measure_gradient_fields(chain: int = CHAIN, repeats: int = REPEATS):
    """Fwd+bwd measurement for the headline artifact.  Same methodology as
    gradient_main / --gradient (VERDICT r3 #1: one number, not two): chain
    CHAIN data-dependent value_and_grad evaluations per dispatch, best of
    REPEATS."""
    import numpy as np

    from pyrayt_tpu import components as comp
    from pyrayt_tpu import materials as matl
    from pyrayt_tpu.analysis.metrics import rms_spot_radius
    from pyrayt_tpu.config import TraceConfig
    from pyrayt_tpu.ops import fused_grad, fused_trace as ft
    from pyrayt_tpu.scene.compile import compile_scene
    from pyrayt_tpu.tracer import engine

    lens = comp.thick_lens(
        r1=1.0, r2=-1.0, thickness=0.25, aperture=0.5, material=matl.glass["BK7"]
    )
    detector = comp.baffle((1.0, 1.0)).move_x(1.0)
    source = comp.ConeOfRays(cone_angle=10.0).move_x(-0.5)
    scene = compile_scene([lens, detector])
    config = TraceConfig(generation_limit=GENERATIONS, fixed_loop=True, remat=True)
    loss_fn, grad_fn, engine_name = _pick_gradient_path(scene, config, detector)
    rays = source.generate_rays(N_RAYS)

    @jax.jit
    def chained(params, rays0):
        def body(i, acc):
            r = rays0.replace(positions=rays0.positions + i * 1e-30)
            value, grads = grad_fn(params, r)
            flat = jax.tree_util.tree_leaves(grads)
            return acc + value + sum(jnp.sum(g) * 1e-30 for g in flat)

        return lax.fori_loop(0, chain, body, jnp.asarray(0.0, rays0.positions.dtype))

    jax.block_until_ready(chained(scene.params, rays))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(chained(scene.params, rays)))
        best = min(best, time.perf_counter() - t0)
    per_step = best / chain
    return {
        "gradient_rays_per_second": round(N_RAYS / per_step),
        "gradient_device_ms_per_step": round(per_step * 1e3, 3),
        "gradient_engine": engine_name,
        "gradient_loss": "rms_spot_radius(detector)",
    }


def gradient_main():
    """Gradient-path benchmark (PYRAYT_BENCH_MODE=gradient or --gradient).

    The north star is *gradient-driven* lens design: this measures
    ``value_and_grad`` of RMS spot size through the full trace in rays/s
    of device time, fwd+bwd.  Chains K data-dependent evaluations in one
    dispatch, same methodology as the forward bench.

    Engine selection (fastest first):
    * fused Pallas forward + Pallas backward kernel (ops/fused_grad.py) —
      default on TPU for supported scenes; PYRAYT_BENCH_FUSED_GRAD=0
      disables;
    * XLA scan engine with remat (PYRAYT_BENCH_REMAT=0 for the
      non-rematerialized baseline).
    """
    import numpy as np

    from pyrayt_tpu import components as comp
    from pyrayt_tpu import materials as matl
    from pyrayt_tpu.analysis.metrics import rms_spot_radius
    from pyrayt_tpu.config import TraceConfig
    from pyrayt_tpu.ops import fused_grad, fused_trace as ft
    from pyrayt_tpu.scene.compile import compile_scene
    from pyrayt_tpu.tracer import engine

    remat = os.environ.get("PYRAYT_BENCH_REMAT", "1") != "0"

    lens = comp.thick_lens(
        r1=1.0, r2=-1.0, thickness=0.25, aperture=0.5, material=matl.glass["BK7"]
    )
    detector = comp.baffle((1.0, 1.0)).move_x(1.0)
    source = comp.ConeOfRays(cone_angle=10.0).move_x(-0.5)
    scene = compile_scene([lens, detector])
    config = TraceConfig(generation_limit=GENERATIONS, fixed_loop=True, remat=remat)
    _, grad_fn, engine_name = _pick_gradient_path(scene, config, detector)
    rays = source.generate_rays(N_RAYS)

    @jax.jit
    def chained(params, rays0):
        def body(i, acc):
            r = rays0.replace(positions=rays0.positions + i * 1e-30)
            value, grads = grad_fn(params, r)
            flat = jax.tree_util.tree_leaves(grads)
            return acc + value + sum(jnp.sum(g) * 1e-30 for g in flat)

        return lax.fori_loop(0, CHAIN, body, jnp.asarray(0.0, rays0.positions.dtype))

    out = chained(scene.params, rays)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(np.asarray(chained(scene.params, rays)))
        best = min(best, time.perf_counter() - t0)
    device_per_step = best / CHAIN
    grad_rays_per_second = N_RAYS / device_per_step

    print(
        json.dumps(
            {
                "metric": "gradient_rays_per_second",
                "value": round(grad_rays_per_second),
                "unit": "rays/s fwd+bwd (value_and_grad of RMS spot size, device time)",
                # reference counterpart is the scipy FD loop in
                # lens_design.ipynb cells 28-33: one FD gradient of P params
                # costs (P+1) traces; vs_baseline is vs our own forward
                # north-star floor for lack of any reference number
                "vs_baseline": round(grad_rays_per_second / 100e6, 4),
                "device_ms_per_grad_step": round(device_per_step * 1e3, 3),
                "remat": remat,
                "n_rays": N_RAYS,
                "generation_limit": GENERATIONS,
                "engine": engine_name,
            }
        )
    )


def verify_main():
    """Fused-vs-XLA disagreement measurement on real hardware
    (PYRAYT_BENCH_MODE=verify or --verify; VERDICT round 2, next #5).

    The interpret-mode unit tests prove the kernel computes the same math
    as the XLA engine bit-for-bit under the same compiler.  On TPU the two
    paths are compiled by different stacks (Mosaic vs XLA) whose f32
    contraction differs, so edge-grazing rays can pick different branches.
    This mode traces the 1M-ray condenser through BOTH engines on the
    attached chip, computes the per-ray disagreement rate ON DEVICE (one
    scalar fetch — the relay's 40 MB/s fetch path never sees the frames),
    and asserts the documented bound.  Cited by ops/fused_trace.py.
    """
    import numpy as np

    from pyrayt_tpu import components as comp
    from pyrayt_tpu import materials as matl
    from pyrayt_tpu.config import TraceConfig
    from pyrayt_tpu.ops import fused_trace as ft
    from pyrayt_tpu.scene.compile import compile_scene
    from pyrayt_tpu.tracer import engine

    lens = comp.thick_lens(
        r1=1.0, r2=-1.0, thickness=0.25, aperture=0.5, material=matl.glass["BK7"]
    )
    detector = comp.baffle((1.0, 1.0)).move_x(1.0)
    source = comp.ConeOfRays(cone_angle=10.0).move_x(-0.5)
    scene = compile_scene([lens, detector])
    config = TraceConfig(generation_limit=GENERATIONS, fixed_loop=True)
    rays = source.generate_rays(N_RAYS)

    fn_x = engine.build_trace_fn(scene.spec, scene.materials, config)
    fn_f = ft.build_fused_trace_fn(
        scene.spec, scene.materials, config, interpret=not ft.on_tpu()
    )

    ATOL = 1e-4  # f32 trace columns at coordinates ~1

    @jax.jit
    def disagreement(params, rays):
        rx = fn_x(params, rays)
        rf = fn_f(params, rays)
        mask_differs = jnp.any(rx.record_mask != rf.record_mask, axis=0)
        both = rx.record_mask & rf.record_mask
        col_differs = jnp.any(
            jnp.abs(rx.records - rf.records) > ATOL, axis=1
        )  # (G, n)
        value_differs = jnp.any(col_differs & both, axis=0)
        differs = mask_differs | value_differs
        return (
            jnp.mean(differs.astype(jnp.float32)),
            jnp.mean(mask_differs.astype(jnp.float32)),
        )

    rate, mask_rate = disagreement(scene.params, rays)
    rate = float(np.asarray(rate))
    mask_rate = float(np.asarray(mask_rate))

    BOUND = 0.02  # documented: ~1% of rays, all at geometric boundaries
    print(
        json.dumps(
            {
                "metric": "fused_vs_xla_disagreement_rate",
                "value": round(rate, 6),
                "unit": (
                    f"fraction of {N_RAYS} condenser rays with any "
                    f"differing record (atol {ATOL})"
                ),
                "vs_baseline": round(rate / BOUND, 4),
                "mask_disagreement_rate": round(mask_rate, 6),
                "bound": BOUND,
                "within_bound": rate <= BOUND,
                "platform": jax.devices()[0].platform,
                "interpret_mode": not ft.on_tpu(),
                "n_rays": N_RAYS,
                "generation_limit": GENERATIONS,
            }
        )
    )
    if rate > BOUND:
        raise SystemExit(f"disagreement rate {rate} exceeds bound {BOUND}")


def profile_main():
    """Profiling mode (PYRAYT_BENCH_MODE=profile or --profile).

    Replaces the hand-counted OPS_PER_RAY_GEN constant with *measured*
    quantities (VERDICT round 2, next #3):

    * work: FLOPs + transcendentals from XLA's own cost analysis of the
      compiled XLA-engine trace program (the fused Pallas kernel computes
      the same physics per generation, minus dead generations);
    * time: the chained device-time measurement from the headline bench;
    * live work fraction: generations_run and per-generation living-ray
      counts from the actual trace (not an assumed constant);
    * artifact: a jax.profiler trace (XProf .xplane.pb) under
      bench_profiles/ when the backend supports capture.

    Prints one JSON line with measured VPU utilization for both engines.
    """
    import numpy as np

    from pyrayt_tpu import components as comp
    from pyrayt_tpu import materials as matl
    from pyrayt_tpu.config import TraceConfig
    from pyrayt_tpu.ops import fused_trace as ft
    from pyrayt_tpu.scene.compile import compile_scene
    from pyrayt_tpu.tracer import engine

    lens = comp.thick_lens(
        r1=1.0, r2=-1.0, thickness=0.25, aperture=0.5, material=matl.glass["BK7"]
    )
    detector = comp.baffle((1.0, 1.0)).move_x(1.0)
    source = comp.ConeOfRays(cone_angle=10.0).move_x(-0.5)
    scene = compile_scene([lens, detector])
    config = TraceConfig(generation_limit=GENERATIONS, fixed_loop=True)
    rays = source.generate_rays(N_RAYS)

    # --- measured work: XLA cost analysis of the scan-engine program ---
    xla_fn = engine.build_trace_fn(scene.spec, scene.materials, config)
    compiled = jax.jit(xla_fn).lower(scene.params, rays).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops_total = float(cost.get("flops", float("nan")))
    transcendentals = float(cost.get("transcendentals", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", float("nan")))
    ops_per_ray_gen = (flops_total + transcendentals) / (N_RAYS * GENERATIONS)

    # --- measured liveness: how much of the padded work is real ---
    result = xla_fn(scene.params, rays)
    live_per_gen = np.asarray(jnp.sum(result.record_mask, axis=1))
    gens_run = int(result.generations_run)
    live_fraction = float(live_per_gen.sum()) / (N_RAYS * GENERATIONS)

    # --- measured time: same chained-dispatch methodology as main() ---
    def device_time(fn):
        @jax.jit
        def chained(params, rays0):
            def body(i, acc):
                r = fn(params, rays0.replace(positions=rays0.positions + i * 1e-30))
                return acc + r.records[0, 0, 0] + r.final_rays.positions[0, 0]

            return lax.fori_loop(
                0, CHAIN, body, jnp.asarray(0.0, rays0.positions.dtype)
            )

        out = chained(scene.params, rays)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            float(np.asarray(chained(scene.params, rays)))
            best = min(best, time.perf_counter() - t0)
        return best / CHAIN

    xla_s = device_time(xla_fn)
    fused_s = None
    if ft.supports_fused(scene.spec) and ft.on_tpu():
        fused_s = device_time(
            ft.build_fused_trace_fn(scene.spec, scene.materials, config)
        )

    # --- optional XProf artifact ---
    profile_dir = os.path.join(os.path.dirname(__file__), "bench_profiles")
    artifact = None
    try:
        os.makedirs(profile_dir, exist_ok=True)
        with jax.profiler.trace(profile_dir):
            jax.block_until_ready(xla_fn(scene.params, rays))
        produced = []
        for root, _, files in os.walk(profile_dir):
            produced += [os.path.join(root, f) for f in files if "xplane" in f]
        artifact = max(produced, key=os.path.getmtime) if produced else None
    except Exception as exc:  # relay backends may refuse capture
        artifact = f"capture-failed: {type(exc).__name__}"

    # nominal v5e VPU: 4 MACs/ALU-lane-cycle x 8 sublanes x 128 lanes x
    # ~940 MHz ~= 3.9e12 f32 element-ops/s; we report against 4e12
    PEAK_OPS = 4.0e12
    out = {
        "metric": "measured_vpu_utilization",
        "value": round((flops_total + transcendentals) / xla_s / PEAK_OPS, 4),
        "unit": "fraction of 4 Tops/s f32 VPU (XLA engine, cost-analysis FLOPs)",
        "vs_baseline": None,
        "ops_per_ray_generation_measured": round(ops_per_ray_gen, 1),
        "transcendentals_per_ray_generation": round(
            transcendentals / (N_RAYS * GENERATIONS), 2
        ),
        "bytes_accessed_per_ray_generation": round(
            bytes_accessed / (N_RAYS * GENERATIONS), 1
        ),
        "generations_run": gens_run,
        "live_work_fraction": round(live_fraction, 4),
        "xla_engine_ms": round(xla_s * 1e3, 3),
        "platform": jax.devices()[0].platform,
        "profile_artifact": artifact,
    }
    if fused_s is not None:
        # the fused kernel does the same per-generation math but exits
        # after the last living generation: utilization counts only the
        # generations it actually ran
        fused_ops = ops_per_ray_gen * N_RAYS * gens_run
        out["fused_kernel_ms"] = round(fused_s * 1e3, 3)
        out["fused_vpu_utilization"] = round(fused_ops / fused_s / PEAK_OPS, 4)
    print(json.dumps(out))


def gradcheck_main():
    """On-hardware finite-difference validation of the doublet objective
    (PYRAYT_BENCH_MODE=gradcheck or --gradcheck; VERDICT round 3, next #5).

    tests/test_analysis/test_gradcheck.py validates gradients on CPU f64;
    this mode validates them where the optimizer actually walks: the
    production dtype (f32) on the attached accelerator, at three points
    along a real optimization trajectory (start / mid / end of a short
    cosine-decayed adam run), central-differencing 2 of the 4 log-radius
    parameters per point.  Tolerances are f32-loose by necessity: the
    objective is a full trace, so FD at eps ~1e-4 carries ~1e-3 relative
    noise.  Writes the checked-in artifact bench_profiles/fd_check.json.

    Reference counterpart: the scipy FD loop at
    /root/reference/examples/lens_design.ipynb cells 28-33 — there FD *is*
    the optimizer; here it is the audit of the analytic gradient.
    """
    import numpy as np
    import optax

    from pyrayt_tpu import components as comp
    from pyrayt_tpu import materials as matl
    from pyrayt_tpu.analysis import SoftFocusError, build_objective, optimize
    from pyrayt_tpu.config import TraceConfig
    from pyrayt_tpu.scene.objects import fresh_ids
    from pyrayt_tpu.tracer.rayset import concatenate

    # --- the doublet system (example-parity constants, mm) ---
    DIAM, F_SYS = 25.4, 50.0
    M1, M2 = matl.glass["BK7"], matl.glass["SF2"]
    T1, T2 = 8.0, 2.0
    v1, v2 = M1.abbe(), M2.abbe()
    p1 = (1 / F_SYS) * v1 / (v1 - v2)
    p2 = (1 / F_SYS) * v2 / (v2 - v1)
    n1 = float(M1.index_at(0.633))
    n2 = float(M2.index_at(0.633))
    r1 = (n1 - 1) * (1 + np.sqrt(1 - p1 * T1 / n1)) / p1
    r4 = 1.0 / (1.0 / -r1 - p2 / (n2 - 1))
    r0 = np.array([r1, -r1, -r1, r4])
    signs = np.sign(r0)

    def build(log_mags):
        radii = jnp.asarray(signs, jnp.float32) * jnp.exp(log_mags)
        l1 = comp.thick_lens(radii[0], radii[1], T1, aperture=DIAM,
                             material=M1, r1_sign=1, r2_sign=-1)
        l2 = comp.thick_lens(radii[2], radii[3], T2, aperture=DIAM,
                             material=M2, r1_sign=-1, r2_sign=-1
                             ).move_x(1.01 * (T1 + T2) / 2)
        det = comp.baffle((DIAM, DIAM)).move_x(F_SYS)
        return [l1, l2, det]

    sets = []
    for wl in (0.45, 0.5, 0.55, 0.6, 0.65, 0.7):
        src = (comp.LineOfRays(0.45 * DIAM / 2, wavelength=wl)
               .move_x(-10.0).move_y(DIAM / 8))
        sets.append(src.generate_rays(10))
    rays = concatenate(sets)
    rays = rays.replace(id=jnp.arange(rays.n_rays, dtype=rays.positions.dtype))

    theta0 = jnp.log(jnp.abs(jnp.asarray(r0, jnp.float32)))
    with fresh_ids():
        det_id = float(build(theta0)[-1].get_id())
    # the SOFT objective (C1 vignetting weights) is what the audit
    # differentiates: central differences of the HARD focus_error are
    # meaningless at boundary-heavy trajectory points — measured on the
    # chip at the detuned start design (loss ~1300, most rays vignetting),
    # an eps step flips marginal rays discretely and FD disagrees by >100%
    # while the converged points agree to <8%.  The soft loss is also the
    # production recommendation (docs/design_notes.md "f32 optimization
    # dynamics"); the same fused loss-plan machinery differentiates both.
    objective = build_objective(
        build, rays, SoftFocusError(
            F_SYS, det_id, half_widths=(DIAM / 2, DIAM / 2), ramp=DIAM / 8,
        ),
        TraceConfig(generation_limit=8, fixed_loop=True),
    )

    steps = int(os.environ.get("PYRAYT_BENCH_GRADCHECK_STEPS", 40))
    schedule = optax.cosine_decay_schedule(5e-3, steps)
    # audit points: three snapshots along the optimizer's WORKING regime
    # (steps ~10/20/40).  The detuned step-0 design is branch-unstable at
    # f32 — its f32 loss (1312) disagrees with the f64 loss (38.2) by 34x
    # because marginal rays TIR/vignette on different branches, and the
    # f32 pointwise derivative (+169) follows the f32 branch while the
    # secant (-555) recovers the f64 slope (-555.65, cross-checked at
    # f64 with FD eps 1e-7..3e-4 all agreeing to 4 digits).  No f32
    # pointwise-vs-secant comparison is meaningful there; the point is
    # recorded (ungated) as `step0_branch_pathology` for the artifact.
    quarter, _ = optimize(objective, theta0, steps=steps // 4,
                          optimizer=optax.adam(schedule))
    half, _ = optimize(objective, quarter, steps=steps // 2 - steps // 4,
                       optimizer=optax.adam(schedule))
    final, _ = optimize(objective, half, steps=steps - steps // 2,
                        optimizer=optax.adam(schedule))
    points = {"early": quarter, "mid": half, "end": final}

    # The AUDIT objective evaluates the same gradient machinery with a
    # DENSE beam: the design beam has 60 rays, so every TIR/vignetting
    # branch flip inside the eps window moves the loss by ~1.7% — with
    # 2^16 rays a flip contributes ~1.5e-5 and central differences become
    # well-conditioned.  (Measured with the 60-ray beam: eps-CONSISTENT
    # secants disagreeing with the pointwise derivative by 29-130% at
    # flip-dense points; see docs/design_notes.md "pointwise vs secant".)
    dense_src = comp.GridOfRays(0.45 * DIAM, 0.45 * DIAM).move_x(-10.0)
    dense_rays = dense_src.generate_rays(1 << 16)
    # de-lattice the grid: rows share exact heights, so a marginal-ray
    # branch flip takes a whole 256-ray row with it (measured: 0.2-0.5%
    # loss jitter across a 3e-7 parameter step).  A fixed per-ray jitter
    # of half a grid spacing makes flips independent (~1/65536 each).
    _rng = np.random.default_rng(0)
    _jit = jnp.asarray(
        _rng.uniform(-0.022, 0.022, size=(2, dense_rays.n_rays)),
        dense_rays.positions.dtype,
    )
    dense_rays = dense_rays.replace(
        positions=dense_rays.positions.at[1:3].add(_jit),
        id=jnp.arange(dense_rays.n_rays, dtype=dense_rays.positions.dtype),
    )
    # tilt_ramp excludes the axial band: a ray's intercept divides by its
    # tilt (~height/F), and f32 cancellation in x0 - xt*y0/yt amplifies
    # ~1e7x below tilt ~1e-5 — measured as a 12% loss jitter across a
    # 3e-7 parameter step when axial rays carried weight.  (4e-3, 2e-2)
    # smoothly zeroes rays below ~1 mm beam height on the 50 mm doublet.
    audit_objective = build_objective(
        build, dense_rays, SoftFocusError(
            F_SYS, det_id, half_widths=(DIAM / 2, DIAM / 2), ramp=DIAM / 8,
            tilt_ramp=(4e-3, 2e-2),
        ),
        TraceConfig(generation_limit=8, fixed_loop=True),
    )
    grad_fn = jax.jit(jax.value_and_grad(audit_objective))
    EPS = float(os.environ.get("PYRAYT_BENCH_GRADCHECK_EPS", 3e-4))
    # FD probes call the objective UNJITTED: wrapping the whole objective
    # in one jit produces a different (equally valid) f32 compilation
    # whose marginal-ray branches sit elsewhere — measured: jitted FD
    # disagrees with both analytic and unjitted FD by ~9x at converged
    # points while being eps-consistent (a genuinely different local
    # surface).  The analytic gradient is compared against the same
    # compilation family the optimizer's value path uses.
    obj_j = audit_objective
    checks = []
    for name, theta in points.items():
        value, grads = grad_fn(theta)
        grads = np.asarray(grads)
        # empirical FD noise floor at this point: the loss difference
        # across a near-zero step (1e-3 * eps) measures the f32 trace
        # jitter that central differences divide by 2*eps
        base = float(obj_j(theta))
        e_probe = np.zeros_like(grads)
        e_probe[0] = EPS * 1e-3
        noise = abs(float(obj_j(theta + e_probe)) - base)
        for k in (0, 3):  # crown front radius, flint rear radius
            e = np.zeros_like(grads)
            e[k] = EPS

            def fd_at(eps_k):
                plus = float(obj_j(theta + e * (eps_k / EPS)))
                minus = float(obj_j(theta - e * (eps_k / EPS)))
                return (plus - minus) / (2 * eps_k)

            fd = fd_at(EPS)
            fd_half = fd_at(EPS / 2)
            # two validity gates, both recorded:
            # * POWERED — the expected loss delta across the eps window
            #   must clear the measured noise floor by 20x (a converged
            #   design's gradients shrink below what f32 FD can resolve);
            # * CONSISTENT (Richardson) — FD at eps and eps/2 must agree:
            #   trace-derived losses have genuine branch discontinuities
            #   (TIR/vignetting flips) where no secant is meaningful.
            powered = 2 * EPS * abs(float(grads[k])) > 20 * max(noise, 1e-7)
            consistent = abs(fd - fd_half) <= 0.25 * max(
                abs(fd), abs(fd_half), 1e-6
            )
            denom = max(abs(fd), abs(float(grads[k])), 1e-6)
            checks.append({
                "point": name,
                "param": k,
                "loss": float(value),
                "analytic": float(grads[k]),
                "fd_central": fd,
                "fd_central_half_eps": fd_half,
                "fd_noise_floor": noise,
                "fd_powered": powered,
                "fd_consistent": consistent,
                "rel_err": abs(float(grads[k]) - fd) / denom,
            })

    # ungated step-0 record: the branch-unstable regime, for the artifact
    design_grad_fn = jax.jit(jax.value_and_grad(objective))
    v0, g0 = design_grad_fn(theta0)
    e0 = np.zeros(4, np.float32)
    e0[0] = EPS
    fd0 = (
        float(objective(theta0 + e0)) - float(objective(theta0 - e0))
    ) / (2 * EPS)
    step0 = {
        "loss_f32": float(v0),
        "analytic_param0_f32": float(np.asarray(g0)[0]),
        "fd_central_param0_f32": fd0,
        "note": (
            "f32 branch-unstable detuned design: f64 loss is 38.21 and "
            "f64 analytic == f64 FD == -555.65; the f32 secant recovers "
            "that slope while the f32 pointwise derivative follows the "
            "f32 branch — see docs/design_notes.md"
        ),
    }

    usable = [c for c in checks if c["fd_consistent"] and c["fd_powered"]]
    worst = max(c["rel_err"] for c in usable) if usable else float("inf")
    BOUND = 0.05  # f32 full-trace FD noise floor; documented loose
    platform = jax.devices()[0].platform
    # round-4 lesson: the committed "on-device" artifact had silently run
    # on CPU (a script import re-applied JAX_PLATFORMS).  The campaign
    # sets this env so a CPU capture fails loudly instead of lying.
    if os.environ.get("PYRAYT_BENCH_REQUIRE_ACCELERATOR") == "1" and (
        platform == "cpu"
    ):
        raise SystemExit(
            "gradcheck: PYRAYT_BENCH_REQUIRE_ACCELERATOR=1 but the attached "
            "platform is cpu — refusing to write a misleading artifact"
        )
    artifact = {
        "platform": platform,
        "dtype": "float32",
        "eps": EPS,
        "bound": BOUND,
        "worst_rel_err": worst,
        "within_bound": worst <= BOUND,
        "n_probes": len(checks),
        "n_smooth_branch": len(usable),
        "checks": checks,
        "step0_branch_pathology": step0,
    }
    profile_dir = os.path.join(os.path.dirname(__file__), "bench_profiles")
    os.makedirs(profile_dir, exist_ok=True)
    with open(os.path.join(profile_dir, "fd_check.json"), "w") as f:
        json.dump(artifact, f, indent=1)

    if len(usable) < 3:
        print(json.dumps({"metric": "fd_gradient_worst_rel_err",
                          "value": None, "vs_baseline": None,
                          "error": f"only {len(usable)}/{len(checks)} probes "
                                   "powered and smooth-branch",
                          "artifact": "bench_profiles/fd_check.json"}))
        raise SystemExit("FD check: too few valid probes")
    print(json.dumps({
        "metric": "fd_gradient_worst_rel_err",
        "value": round(worst, 6),
        "unit": (
            "max relative |analytic - central FD| over 2 params x 3 "
            "trajectory points, doublet objective, f32 on-device"
        ),
        "vs_baseline": round(worst / BOUND, 4),
        "within_bound": worst <= BOUND,
        "platform": artifact["platform"],
        "artifact": "bench_profiles/fd_check.json",
    }))
    if worst > BOUND:
        raise SystemExit(f"FD check failed: {worst} > {BOUND}")


def scaling_main():
    """Scaling-efficiency mode (PYRAYT_BENCH_MODE=scaling or --scaling).

    Measures device-time rays/s of the sharded trace at 1..D devices and
    reports efficiency = rps(D) / (D * rps(1)).  Rays never interact, so
    the partitioned program has zero collectives and the ceiling is pure
    DP.  Runs on real chips when a slice is attached; on this one-chip host
    set JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
    to validate the path (numbers then measure the CPU, not TPU).
    """
    import numpy as np

    from pyrayt_tpu import components as comp
    from pyrayt_tpu import materials as matl
    from pyrayt_tpu.config import TraceConfig
    from pyrayt_tpu.parallel import (
        build_sharded_trace_fn,
        default_mesh,
        initialize_distributed,
        pad_rayset,
        shard_rayset,
    )
    from pyrayt_tpu.scene.compile import compile_scene

    initialize_distributed()  # no-op single-process; joins a pod if launched as one

    lens = comp.thick_lens(
        r1=1.0, r2=-1.0, thickness=0.25, aperture=0.5, material=matl.glass["BK7"]
    )
    detector = comp.baffle((1.0, 1.0)).move_x(1.0)
    source = comp.ConeOfRays(cone_angle=10.0).move_x(-0.5)
    scene = compile_scene([lens, detector])
    config = TraceConfig(generation_limit=GENERATIONS, fixed_loop=True)
    n_rays = int(os.environ.get("PYRAYT_BENCH_RAYS", 1 << 18))
    rays = source.generate_rays(n_rays)

    n_devices = len(jax.devices())
    counts = sorted({1, 2, n_devices} & set(range(1, n_devices + 1)))
    rps = {}
    for n in counts:
        mesh = default_mesh(n_devices=n, n_hosts=1)
        fn = build_sharded_trace_fn(scene, config, mesh)
        padded, _ = pad_rayset(rays, mesh.size)
        placed = shard_rayset(padded, mesh)
        result = fn(scene.params, placed)
        jax.block_until_ready(result)
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            result = fn(scene.params, placed)
            jax.block_until_ready(result)
            best = min(best, time.perf_counter() - t0)
        rps[n] = n_rays / best

    efficiency = rps[n_devices] / (n_devices * rps[1]) if n_devices > 1 else 1.0
    platform = jax.devices()[0].platform
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(efficiency, 4),
                "unit": f"fraction of linear at {n_devices} {platform} devices",
                "vs_baseline": round(efficiency / 0.85, 3),  # BASELINE.md >= 85%
                "rays_per_second_by_devices": {
                    str(n): round(v) for n, v in rps.items()
                },
                "platform": platform,
                # unmissable provenance: virtual CPU devices validate the
                # sharded program's structure, not TPU ICI bandwidth
                "hardware_note": (
                    "REAL TPU SLICE"
                    if platform == "tpu"
                    else f"VIRTUAL {platform.upper()} DEVICES - path validation "
                    "only, not accelerator scaling"
                ),
            }
        )
    )


def wide_main():
    """Wide-scene benchmark (--wide): microlens arrays through BOTH wide
    paths — the XLA batched-group engine and the WIDE fused Pallas kernel
    (ops/fused_trace._make_step_wide) — with an on-chip record-agreement
    probe, a HETEROGENEOUS 20-distinct-element assembly, and the wide
    gradient modes (monolithic kernel vs the staged backward).  Measured
    numbers live in docs/design_notes.md; last run: 22.6x at 73 leaves,
    35.6x at 513 (0.0 record difference), 16.4x heterogeneous at 61
    leaves; gradients 34.3 ms (8x8 staged) / 48-54 ms (16x16 staged).
    """
    import numpy as np

    import pyrayt_tpu as pyrayt
    from pyrayt_tpu import components as comp
    from pyrayt_tpu.config import TraceConfig
    from pyrayt_tpu.ops import fused_trace as ft
    from pyrayt_tpu.scene.compile import compile_scene
    from pyrayt_tpu.tracer import engine

    def build_mla(n):
        lenslets = comp.microlens_array(2.0, 0.25, n, n, 1.0)
        focus = pyrayt.lensmakers_equation(2.0, np.inf, 1.5, 0.25)
        detector = comp.baffle((2.0 * n, 2.0 * n)).move_x(focus)
        scene = compile_scene(lenslets + [detector])
        src = comp.GridOfRays(n * 1.05, n * 1.05).move_x(-1.0)
        rays = src.generate_rays(N_RAYS)
        return scene, rays.replace(
            id=jnp.arange(N_RAYS, dtype=rays.positions.dtype)
        )

    def device_time(fn, params, rays, k):
        @jax.jit
        def chained(params, rays0):
            def body(i, acc):
                r = fn(params, rays0.replace(positions=rays0.positions + i * 1e-30))
                return acc + r.records[0, 0, 0] + r.final_rays.positions[0, 0]

            return lax.fori_loop(0, k, body, jnp.asarray(0.0, rays0.positions.dtype))

        jax.block_until_ready(chained(params, rays))
        best = float("inf")
        for _ in range(max(2, REPEATS // 2)):
            t0 = time.perf_counter()
            float(np.asarray(chained(params, rays)))
            best = min(best, time.perf_counter() - t0)
        return best / k

    config = TraceConfig(generation_limit=4, fixed_loop=True)
    out = {
        "metric": "wide_scene_fused_speedup",
        "unit": "xla_wide_ms / fused_wide_ms at 2**20 rays, G=4",
        "n_rays": N_RAYS,
    }
    for n, k_fused, k_xla in ((6, 8, 4), (16, 4, 2)):
        scene, rays = build_mla(n)
        if not ft.supports_fused_wide(scene.spec):
            out[f"mla_{n}x{n}"] = "wide kernel unsupported"
            continue
        fused_fn = ft.build_fused_trace_fn(
            scene.spec, scene.materials, config, interpret=not ft.on_tpu()
        )
        xla_fn = engine.build_trace_fn(scene.spec, scene.materials, config)
        # agreement probe at 2**17 rays
        small = rays.replace(
            **{
                f: getattr(rays, f)[..., : 1 << 17]
                for f in (
                    "positions", "directions", "generation", "intensity",
                    "wavelength", "index", "id",
                )
            }
        )
        rf = fused_fn(scene.params, small)
        rx = xla_fn(scene.params, small)
        mf, mx = np.asarray(rf.record_mask), np.asarray(rx.record_mask)
        sel = (mf & mx)[:, None, :]
        diff = float(
            np.where(
                sel, np.abs(np.asarray(rf.records) - np.asarray(rx.records)), 0.0
            ).max()
        )
        assert (mf == mx).all(), "wide fused kernel record masks diverge"
        assert diff < 1e-3, f"wide fused kernel record diff {diff}"
        t_f = device_time(fused_fn, scene.params, rays, k_fused)
        t_x = device_time(xla_fn, scene.params, rays, k_xla)
        out[f"mla_{n}x{n}"] = {
            "leaves": scene.spec.n_leaves,
            "fused_ms": round(t_f * 1e3, 2),
            "xla_ms": round(t_x * 1e3, 2),
            "speedup": round(t_x / t_f, 2),
            "max_masked_record_diff": diff,
        }
    # heterogeneous wide scene (VERDICT r4 missing #2): 20 DISTINCT
    # biconvex elements (random radii/thickness/aperture, three glasses)
    # + detector = 61 leaves, batched as ONE shape-only group since round
    # 5 (engine._tree_sig).  Measures compile time and ms/trace for the
    # XLA engine vs the wide fused kernel on a scene where round 4 had
    # only per-leaf unrolling.
    try:
        from pyrayt_tpu import materials as matl
        from pyrayt_tpu.scene.objects import fresh_ids as _fresh

        glasses = [matl.glass["BK7"], matl.glass["SF5"], matl.glass["SF2"]]
        rng = np.random.default_rng(0)
        with _fresh():
            els = []
            for i in range(20):
                r1 = 3.0 + 4.0 * rng.random()
                r2 = -(3.0 + 4.0 * rng.random())
                y = (i - 9.5) * 2.6
                els.append(
                    comp.thick_lens(
                        r1, r2, 0.3 + 0.2 * rng.random(),
                        aperture=1.5 + rng.random(), material=glasses[i % 3],
                    ).move_y(y)
                )
            det = comp.baffle((52.0, 52.0)).move_x(6.0)
            hscene = compile_scene(els + [det])
        hsrc = comp.GridOfRays(20 * 2.6 * 0.95, 1.0).move_x(-1.5)
        hrays = hsrc.generate_rays(N_RAYS)
        hrays = hrays.replace(id=jnp.arange(N_RAYS, dtype=hrays.positions.dtype))
        entry = {"leaves": hscene.spec.n_leaves, "distinct_elements": 20,
                 "glass_slots": len(set(hscene.spec.leaf_mat_slot))}
        assert ft.supports_fused_wide(hscene.spec)

        t0 = time.perf_counter()
        h_fused = ft.build_fused_trace_fn(
            hscene.spec, hscene.materials, config, interpret=not ft.on_tpu()
        )
        jax.block_until_ready(h_fused(hscene.params, hrays).records)
        entry["fused_compile_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        h_xla = engine.build_trace_fn(hscene.spec, hscene.materials, config)
        jax.block_until_ready(h_xla(hscene.params, hrays).records)
        entry["xla_compile_s"] = round(time.perf_counter() - t0, 1)
        t_f = device_time(h_fused, hscene.params, hrays, 8)
        t_x = device_time(h_xla, hscene.params, hrays, 4)
        entry["fused_ms"] = round(t_f * 1e3, 2)
        entry["xla_ms"] = round(t_x * 1e3, 2)
        entry["speedup"] = round(t_x / t_f, 2)
        out["hetero_20_distinct"] = entry
    except Exception as exc:  # pragma: no cover - defensive
        out["hetero_error"] = f"{type(exc).__name__}: {exc}"

    # wide gradients: differentiable lens-array design — the monolithic
    # wide backward vs the STAGED multi-dispatch backward at 8x8/12x12
    # (both compile), and staged alone at 16x16 (past the monolithic
    # kernel's compile cap; design notes "Wide gradients")
    from pyrayt_tpu.analysis.metrics import RmsSpotRadius
    from pyrayt_tpu.ops import fused_grad
    from pyrayt_tpu.scene.objects import fresh_ids

    def grad_time(n, mode, k=2):
        with fresh_ids():
            lenslets = comp.microlens_array(2.0, 0.25, n, n, 1.0)
            focus = pyrayt.lensmakers_equation(2.0, np.inf, 1.5, 0.25)
            detector = comp.baffle((2.0 * n, 2.0 * n)).move_x(focus)
            det_id = float(detector.get_id())
            scene = compile_scene(lenslets + [detector])
        src = comp.GridOfRays(n * 1.05, n * 1.05).move_x(-1.0)
        rays = src.generate_rays(N_RAYS)
        rays = rays.replace(id=jnp.arange(N_RAYS, dtype=rays.positions.dtype))
        loss = RmsSpotRadius(surface_id=det_id)
        gconfig = TraceConfig(
            generation_limit=4, fixed_loop=True, wide_grad=mode
        )
        vg = fused_grad.build_fused_value_and_grad_fn(
            scene.spec, scene.materials, gconfig, loss,
            interpret=not ft.on_tpu(),
        )
        grad_fn = jax.jit(jax.value_and_grad(vg))

        @jax.jit
        def chained_g(params, rays0):
            def body(i, acc):
                v, g = grad_fn(
                    params, rays0.replace(positions=rays0.positions + i * 1e-30)
                )
                return acc + v + g["prim"][0, 0]

            return lax.fori_loop(
                0, k, body, jnp.asarray(0.0, rays0.positions.dtype)
            )

        jax.block_until_ready(chained_g(scene.params, rays))
        best = float("inf")
        for _ in range(max(2, REPEATS // 2)):
            t0 = time.perf_counter()
            float(np.asarray(chained_g(scene.params, rays)))
            best = min(best, time.perf_counter() - t0)
        return best / k

    grad_cases = os.environ.get(
        "PYRAYT_BENCH_WIDE_GRADS", "8:fused,8:staged,16:staged"
    )
    for case in grad_cases.split(","):
        n_s, mode = case.strip().split(":")
        n = int(n_s)
        try:
            t_g = grad_time(n, mode)
            out[f"wide_gradient_ms_per_step_{n}x{n}_{mode}"] = round(
                t_g * 1e3, 2
            )
            out[f"wide_gradient_rays_per_second_{n}x{n}_{mode}"] = round(
                N_RAYS / t_g
            )
        except Exception as exc:  # pragma: no cover - defensive
            out[f"wide_gradient_error_{n}x{n}_{mode}"] = (
                f"{type(exc).__name__}: {exc}"
            )

    last = [v for v in out.values() if isinstance(v, dict)]
    out["value"] = last[-1]["speedup"] if last else None
    out["vs_baseline"] = None
    print(json.dumps(out))


if __name__ == "__main__":
    import sys

    mode = os.environ.get("PYRAYT_BENCH_MODE", "")
    if mode == "scaling" or "--scaling" in sys.argv:
        scaling_main()
    elif mode == "gradient" or "--gradient" in sys.argv:
        gradient_main()
    elif mode == "profile" or "--profile" in sys.argv:
        profile_main()
    elif mode == "verify" or "--verify" in sys.argv:
        verify_main()
    elif mode == "gradcheck" or "--gradcheck" in sys.argv:
        gradcheck_main()
    elif mode == "wide" or "--wide" in sys.argv:
        wide_main()
    else:
        main()
