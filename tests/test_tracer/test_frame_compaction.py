"""Sliced dtype-tight fetch for the trace()->DataFrame host edge
(VERDICT round 3, next #3).

The sliced path (fetch only the live generations, float32-cast on device)
must produce a frame identical (values, dtypes, row order) to the naive
full-buffer fetch — the reference DataFrame contract at
/root/reference/pyrayt/_pyrayt.py:147-186.  A row-packing device scatter
was measured net slower on TPU and deliberately does not exist.
"""

import jax.numpy as jnp
import numpy as np
import pandas as pd

import pyrayt_tpu as pyrayt
from pyrayt_tpu import components as comp
from pyrayt_tpu import materials as matl
from pyrayt_tpu.tracer.frame import live_generations, records_to_dataframe


def _condenser_result(n_rays=64):
    lens = comp.thick_lens(
        r1=1.0, r2=-1.0, thickness=0.25, aperture=0.5, material=matl.glass["BK7"]
    )
    detector = comp.baffle((1.0, 1.0)).move_x(1.0)
    # wide cone: a good fraction of rays miss the lens and die early, so
    # the record buffer has both dead generations and dead rows
    source = comp.ConeOfRays(cone_angle=25.0).move_x(-0.5)
    tracer = pyrayt.RayTracer(
        source, [lens, detector], rays_per_source=n_rays, generation_limit=6
    )
    tracer.trace_device()
    return tracer._result


def test_sliced_frame_identical_to_naive():
    result = _condenser_result()
    naive = records_to_dataframe(result.records, result.record_mask, compact=False)
    sliced = records_to_dataframe(result.records, result.record_mask, compact=True)
    assert len(naive) > 0
    pd.testing.assert_frame_equal(naive, sliced)


def test_live_generations_counts_dead_tail():
    result = _condenser_result()
    g = live_generations(result.record_mask)
    assert g == int(result.generations_run)
    assert g < result.record_mask.shape[0]  # the dead tail is real


def test_sliced_empty_trace():
    records = jnp.zeros((3, 15, 8))
    mask = jnp.zeros((3, 8), dtype=bool)
    frame = records_to_dataframe(records, mask, compact=True)
    assert len(frame) == 0
    assert list(frame.columns) == list(
        records_to_dataframe(records, mask, compact=False).columns
    )


def test_float64_records_fetch_as_float32():
    result = _condenser_result()
    frame = records_to_dataframe(result.records, result.record_mask, compact=True)
    assert all(dt == np.float32 for dt in frame.dtypes)
