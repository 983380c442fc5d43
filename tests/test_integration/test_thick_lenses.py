"""Full-stack physics integration tests.

Re-hosts test/integration_tests/int_test_thick_lenses.py: collimated rays
through each lens family focus/diverge exactly as the lensmaker's equation
predicts, verified from the recorded tilts at an absorbing baffle.
"""

import numpy as np
import pytest

import pyrayt_tpu as pyrayt
from pyrayt_tpu import components
from pyrayt_tpu.utils import lensmakers_equation

N_LENS = 1.5
APERTURE = 1.0
THICKNESS = 0.2


def trace_through_lens(lens, baffle_x=1.0, n_rays=11, spacing=0.5):
    baffle = components.baffle((4, 4)).move_x(baffle_x)
    source = components.LineOfRays(spacing).move_x(-1)
    tracer = pyrayt.RayTracer(
        source, [lens, baffle], rays_per_source=n_rays, generation_limit=100
    )
    frame = tracer.trace()
    return frame[frame["surface"] == float(baffle.get_id())]


class TestPlanarWindow:
    def test_collimated_rays_stay_collimated(self):
        lens = components.thick_lens(np.inf, np.inf, THICKNESS, aperture=APERTURE)
        at_baffle = trace_through_lens(lens, spacing=0.5)
        assert len(at_baffle) == 11
        assert np.allclose(at_baffle["y_tilt"], 0.0, atol=1e-10)
        assert np.allclose(at_baffle["x_tilt"], 1.0, atol=1e-10)
        # lateral position preserved (parallel plate causes no offset at
        # normal incidence)
        assert np.allclose(at_baffle["y1"], np.linspace(-0.25, 0.25, 11), atol=1e-9)


class TestFocusingLenses:
    """Reference geometry (int_test_thick_lenses.py): design focus 5,
    thickness 0.1, |y| <= 0.25 paraxial fan; elevation check
    focus * (y_tilt / x_tilt) ~ -y0 at the baffle."""

    FOCUS = 5.0
    THICK = 0.1

    def _elevation_check(self, lens, sign, rtol=0.01):
        baffle = components.baffle((2, 2)).move_x(self.FOCUS)
        source = components.LineOfRays(0.5).move_x(-1)
        tracer = pyrayt.RayTracer(
            source, [lens, baffle], rays_per_source=11, generation_limit=100
        )
        frame = tracer.trace()
        at_baffle = frame[frame["surface"] == float(baffle.get_id())]
        assert len(at_baffle) > 0
        expected_elevation = (
            self.FOCUS * at_baffle["y_tilt"] / at_baffle["x_tilt"]
        ).to_numpy()
        assert np.allclose(
            expected_elevation, sign * at_baffle["y0"].to_numpy(), rtol=rtol
        )

    def test_biconvex(self):
        lens = components.thick_lens(self.FOCUS, -self.FOCUS, self.THICK, aperture=1)
        self._elevation_check(lens, sign=-1)

    def test_plano_convex(self):
        lens = components.thick_lens(np.inf, -self.FOCUS / 2, self.THICK, aperture=1)
        self._elevation_check(lens, sign=-1)

    def test_convex_plano(self):
        # curved side first: rays bend at entry, so y0 (recorded at the
        # exit face) differs from the entry height by ~thickness * slope —
        # wider tolerance than the flat-first cases
        lens = components.thick_lens(self.FOCUS / 2, np.inf, self.THICK, aperture=1)
        self._elevation_check(lens, sign=-1, rtol=0.05)

    def test_biconcave(self):
        lens = components.thick_lens(-self.FOCUS, self.FOCUS, self.THICK, aperture=1)
        self._elevation_check(lens, sign=+1)

    def test_plano_concave(self):
        lens = components.thick_lens(np.inf, self.FOCUS / 2, self.THICK, aperture=1)
        self._elevation_check(lens, sign=+1, rtol=0.02)

    def test_positive_meniscus_power_sign(self):
        # meniscus with equal radii: power comes from the thickness term
        r_lens, thickness = 1.0, 1.0
        focus = ((0.5**2) / 1.5 * (thickness / r_lens**2)) ** -1
        baffle = components.baffle((2, 2)).move_x(focus)
        source = components.LineOfRays(0.5).move_x(-1)
        lens = components.thick_lens(r_lens, r_lens, thickness, aperture=1)
        tracer = pyrayt.RayTracer(source, [lens, baffle], generation_limit=100)
        frame = tracer.trace()
        at_baffle = frame[frame["surface"] == float(baffle.get_id())]
        power_sign = (
            -focus
            * at_baffle["y_tilt"]
            / at_baffle["x_tilt"]
            * at_baffle["y0"]
        ).to_numpy()
        assert np.all(power_sign > 0)


class TestConvexCollimator:
    """The reference's int_test_ray_plane_intersection.py, verbatim physics."""

    def setup_method(self):
        r1 = r2 = 2
        thickness = 0.25
        lens = components.biconvex_lens(r1, r2, thickness, aperture=1)
        focus = lensmakers_equation(r1, -r2, 1.5, thickness)
        source = components.ConeOfRays(cone_angle=6).move_x(-focus)
        baffle = components.baffle((1, 1)).move_x(1)
        tracer = pyrayt.RayTracer(source, [lens, baffle])
        tracer.set_rays_per_source(50)
        tracer.set_generation_limit(100)
        self.results = tracer.trace()

    def test_result_dataframe(self):
        assert len(self.results) == 150
        x_vec = self.results.loc[self.results["generation"] == 2]["x1"]
        assert np.allclose(x_vec, 1.0)

    def test_collimation(self):
        gen2 = self.results.loc[self.results["generation"] == 2]
        assert np.allclose(gen2["y_tilt"], 0.0, atol=5e-3)
        assert np.allclose(gen2["z_tilt"], 0.0, atol=5e-3)
