"""Headline benchmark: rays/s on a 1M-ray condenser trace (BASELINE.md).

Runs the flagship condenser scene (cone source -> BK7 biconvex lens ->
detector baffle, the reference tutorial's system) with 2**20 rays for a
full bounce budget on whatever accelerator JAX finds (TPU under the
driver; CPU works for smoke tests with PYRAYT_BENCH_RAYS set lower).

Prints ONE JSON line:
    {"metric": "rays_per_second", "value": N, "unit": "rays/s",
     "vs_baseline": ratio}

The reference publishes no numbers (SURVEY.md §6), so ``vs_baseline`` is
measured against PyRayT itself on this machine when available (cached in
.baseline_cpu.json), else against the BASELINE.md north-star floor of
100M rays/s/chip.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

N_RAYS = int(os.environ.get("PYRAYT_BENCH_RAYS", 1 << 20))
GENERATIONS = int(os.environ.get("PYRAYT_BENCH_GENERATIONS", 6))
REPEATS = int(os.environ.get("PYRAYT_BENCH_REPEATS", 5))
_BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".baseline_cpu.json")


def build():
    from pyrayt_tpu import components as comp
    from pyrayt_tpu import materials as matl
    from pyrayt_tpu.config import TraceConfig
    from pyrayt_tpu.scene.compile import compile_scene
    from pyrayt_tpu.tracer import engine

    lens = comp.thick_lens(
        r1=1.0, r2=-1.0, thickness=0.25, aperture=0.5, material=matl.glass["BK7"]
    )
    detector = comp.baffle((1.0, 1.0)).move_x(1.0)
    source = comp.ConeOfRays(cone_angle=10.0).move_x(-0.5)

    scene = compile_scene([lens, detector])
    config = TraceConfig(generation_limit=GENERATIONS, fixed_loop=True)
    fn = engine.build_trace_fn(scene.spec, scene.materials, config)
    rays = source.generate_rays(N_RAYS)
    return fn, scene.params, rays


def measure_reference_baseline() -> float:
    """Reference PyRayT rays/s on this host's CPU (measured once, cached)."""
    if os.path.exists(_BASELINE_CACHE):
        with open(_BASELINE_CACHE) as f:
            return json.load(f)["rays_per_second"]
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
        rps = n_ref * GENERATIONS / dt
        with open(_BASELINE_CACHE, "w") as f:
            json.dump({"rays_per_second": rps, "n_rays": n_ref}, f)
        return rps
    except Exception:
        return float("nan")
    finally:
        sys.path.remove("/root/reference")


def main():
    fn, params, rays = build()

    import numpy as np

    result = fn(params, rays)  # compile + warm
    jax.block_until_ready(result)
    float(np.asarray(result.records[0, 0, 0]))  # drain the dispatch pipe

    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        result = fn(params, rays)
        # a host fetch of one element forces true completion — on the axon
        # relay block_until_ready can return before the step has executed
        float(np.asarray(result.records[0, 0, 0]))
        best = min(best, time.perf_counter() - t0)

    # throughput counts ray-generations processed (the engine's unit of work)
    rays_per_second = N_RAYS * GENERATIONS / best

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
                "unit": "rays/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
