"""Unit tests for the on-device trace metrics (analysis/metrics.py).

Hand-built TraceResults with known record contents, asserted against
NumPy-computed expectations.
"""

import jax.numpy as jnp
import numpy as np

from pyrayt_tpu.analysis import metrics
from pyrayt_tpu.tracer.engine import N_RECORD_COLS, TraceResult
from pyrayt_tpu.tracer.rayset import RaySet


def make_result(records, mask):
    records = jnp.asarray(records, dtype=float)
    mask = jnp.asarray(mask, dtype=bool)
    n = records.shape[-1]
    return TraceResult(
        records=records,
        record_mask=mask,
        final_rays=RaySet.create(n),
        generations_run=jnp.sum(jnp.any(mask, axis=1)),
    )


def blank_records(generations, n):
    return np.zeros((generations, N_RECORD_COLS, n))


class TestMaskedMean:
    def test_matches_numpy_masked_mean(self, rng):
        values = rng.normal(size=(3, 8))
        mask = rng.random((3, 8)) > 0.4
        expected = values[mask].mean()
        got = metrics.masked_mean(jnp.asarray(values), jnp.asarray(mask))
        assert np.allclose(got, expected)

    def test_empty_mask_is_safe(self):
        values = jnp.ones((2, 4))
        mask = jnp.zeros((2, 4), dtype=bool)
        assert np.isfinite(float(metrics.masked_mean(values, mask)))


class TestSurfaceAndGenerationMasks:
    def test_surface_mask_selects_matching_rows(self):
        records = blank_records(2, 3)
        records[0, metrics.COL["surface"], :] = [5, 7, 5]
        records[1, metrics.COL["surface"], :] = [7, 7, 5]
        mask = np.array([[True, True, True], [True, False, True]])
        result = make_result(records, mask)
        got = metrics.surface_mask(result, 5)
        assert np.array_equal(
            np.asarray(got), [[True, False, True], [False, False, True]]
        )

    def test_last_generation_mask_picks_final_segment_per_ray(self):
        # ray 0 lives 1 generation, ray 1 lives 3, ray 2 lives 2
        mask = np.array(
            [[True, True, True], [False, True, True], [False, True, False]]
        )
        result = make_result(blank_records(3, 3), mask)
        got = np.asarray(metrics.last_generation_mask(result))
        assert np.array_equal(
            got, [[True, False, False], [False, False, True], [False, True, False]]
        )


class TestRmsSpotRadius:
    def test_matches_numpy(self, rng):
        records = blank_records(1, 16)
        y = rng.normal(size=16)
        z = rng.normal(size=16)
        records[0, metrics.COL["y1"], :] = y
        records[0, metrics.COL["z1"], :] = z
        records[0, metrics.COL["surface"], :] = 3
        mask = np.ones((1, 16), dtype=bool)
        result = make_result(records, mask)
        expected = np.sqrt(
            np.mean((y - y.mean()) ** 2 + (z - z.mean()) ** 2)
        )
        got = metrics.rms_spot_radius(result, surface_id=3)
        assert np.allclose(got, expected)

    def test_single_point_spot_is_zero(self):
        records = blank_records(1, 4)
        records[0, metrics.COL["y1"], :] = 0.7
        records[0, metrics.COL["z1"], :] = -0.2
        result = make_result(records, np.ones((1, 4), dtype=bool))
        assert np.allclose(metrics.rms_spot_radius(result), 0.0)


class TestAxisIntercepts:
    def test_formula(self):
        # ray at (x0=2, y0=1) with tilt (xt, yt) crosses y=0 at
        # x = x0 - xt * y0 / yt
        records = blank_records(1, 2)
        records[0, metrics.COL["x0"], :] = [2.0, 0.0]
        records[0, metrics.COL["y0"], :] = [1.0, 2.0]
        records[0, metrics.COL["x_tilt"], :] = [1.0, 1.0]
        records[0, metrics.COL["y_tilt"], :] = [-0.5, -1.0]
        result = make_result(records, np.ones((1, 2), dtype=bool))
        vals, mask = metrics.axis_intercepts(result)
        assert np.array_equal(np.asarray(mask), [[True, True]])
        assert np.allclose(np.asarray(vals)[0], [4.0, 2.0])

    def test_horizontal_rays_masked_out(self):
        records = blank_records(1, 1)
        records[0, metrics.COL["x_tilt"], :] = 1.0
        records[0, metrics.COL["y_tilt"], :] = 0.0
        result = make_result(records, np.ones((1, 1), dtype=bool))
        _, mask = metrics.axis_intercepts(result)
        assert not np.any(np.asarray(mask))


def test_focus_error_zero_at_target():
    records = blank_records(1, 3)
    records[0, metrics.COL["x0"], :] = 5.0  # intercept = 5 - xt*0/yt = 5
    records[0, metrics.COL["y0"], :] = 0.0
    records[0, metrics.COL["x_tilt"], :] = 1.0
    records[0, metrics.COL["y_tilt"], :] = -0.3
    result = make_result(records, np.ones((1, 3), dtype=bool))
    assert np.allclose(metrics.focus_error(result, 5.0), 0.0)
    assert np.allclose(metrics.focus_error(result, 4.0), 1.0)


def test_spot_diagram_points_roundtrip():
    records = blank_records(1, 2)
    records[0, metrics.COL["surface"], :] = [1, 2]
    records[0, metrics.COL["y1"], :] = [0.1, 0.2]
    records[0, metrics.COL["z1"], :] = [0.3, 0.4]
    result = make_result(records, np.ones((1, 2), dtype=bool))
    y, z, mask = metrics.spot_diagram_points(result, 2)
    assert np.allclose(np.asarray(y)[np.asarray(mask)], [0.2])
    assert np.allclose(np.asarray(z)[np.asarray(mask)], [0.4])
