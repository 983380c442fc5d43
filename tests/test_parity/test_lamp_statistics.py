"""Statistical parity of Lamp/StaticLamp vs the reference's Lambertian
source (VERDICT round 2, next #8).

The RNG deviation is by design (JAX counter-based PRNG vs global
np.random, documented on Lamp), so frames can never match ray-by-ray —
instead the *distributions* must agree: intensity law exactly (it is a
deterministic function of direction, 100 cos(theta) — reference
components.py:652), and direction/position moments within Monte-Carlo
bounds at N = 1e5.
"""

import numpy as np
import pytest

from pyrayt_tpu import components as tcomp

N = 100_000
# MC tolerance: moments of bounded variables have sigma <= 1/sqrt(N) scale;
# 5 sigma at N=1e5 is ~1.6e-2 relative for variance-level stats
ATOL = 2e-2


def _our_samples(max_angle=60.0):
    lamp = tcomp.Lamp(width=2.0, length=1.0, max_angle=max_angle, seed=1234)
    rays = lamp.generate_rays(N)
    d = np.asarray(rays.directions)[:3]
    p = np.asarray(rays.positions)[:3]
    i = np.asarray(rays.intensity)
    return p, d, i


def _ref_samples(reference, max_angle=60.0):
    np.random.seed(4321)
    lamp = reference.components.Lamp(width=2.0, length=1.0, max_angle=max_angle)
    rays = lamp.generate_rays(N)
    d = np.asarray(rays.rays[1][:3])
    p = np.asarray(rays.rays[0][:3])
    i = np.asarray(rays.intensity)
    return p, d, i


class TestLambertianParity:
    def test_intensity_law_exact(self, reference):
        """intensity == 100 cos(theta) == 100 * x-direction, per ray, in
        BOTH frameworks (deterministic given the sampled angle)."""
        _, d_ours, i_ours = _our_samples()
        np.testing.assert_allclose(i_ours, 100.0 * d_ours[0], rtol=1e-6)
        _, d_ref, i_ref = _ref_samples(reference)
        np.testing.assert_allclose(i_ref, 100.0 * d_ref[0], rtol=1e-6)

    def test_direction_distribution_moments(self, reference):
        """First + second moments of the direction distribution and of
        cos(theta) match between frameworks within MC bounds."""
        _, d_ours, _ = _our_samples()
        _, d_ref, _ = _ref_samples(reference)
        for ours, ref, name in (
            (d_ours[0], d_ref[0], "cos(theta)"),
            (d_ours[1], d_ref[1], "dir_y"),
            (d_ours[2], d_ref[2], "dir_z"),
        ):
            assert abs(ours.mean() - ref.mean()) < ATOL, name
            assert abs(ours.var() - ref.var()) < ATOL, name
        # the azimuth is uniform: y/z second moments match each other too
        assert abs(d_ours[1].var() - d_ours[2].var()) < ATOL

    def test_costheta_inverse_cdf_analytic(self, reference):
        """cos(theta) is uniform on [cos(max_angle), 1] under the
        reference's inverse-CDF sampler — check both frameworks against
        the analytic mean/variance, not just each other."""
        max_angle = 60.0
        lo = np.cos(np.radians(max_angle))
        mean_expect = (1 + lo) / 2
        var_expect = (1 - lo) ** 2 / 12
        for sampler in (
            lambda: _our_samples(max_angle)[1][0],
            lambda: _ref_samples(reference, max_angle)[1][0],
        ):
            ct = sampler()
            assert abs(ct.mean() - mean_expect) < ATOL
            assert abs(ct.var() - var_expect) < ATOL
            assert ct.min() >= lo - 1e-6 and ct.max() <= 1 + 1e-6

    def test_position_distribution_moments(self, reference):
        """Positions are uniform on the width x length rectangle: compare
        moments and bounds across frameworks."""
        p_ours, _, _ = _our_samples()
        p_ref, _, _ = _ref_samples(reference)
        for axis, half in ((1, 1.0), (2, 0.5)):  # width=2 -> +-1, length=1 -> +-0.5
            for p in (p_ours, p_ref):
                assert abs(p[axis].mean()) < ATOL
                assert abs(p[axis].var() - (2 * half) ** 2 / 12) < ATOL
                assert p[axis].min() >= -half - 1e-9
                assert p[axis].max() <= half + 1e-9
            assert abs(p_ours[axis].var() - p_ref[axis].var()) < ATOL

    def test_static_lamp_caches_rays(self):
        lamp = tcomp.StaticLamp(width=1.0, length=1.0, seed=7)
        a = lamp.generate_rays(64)
        b = lamp.generate_rays(64)
        np.testing.assert_array_equal(
            np.asarray(a.directions), np.asarray(b.directions)
        )
