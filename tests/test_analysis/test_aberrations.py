"""Aberration analyses vs closed-form paraxial optics.

The reference ships these only as notebook cells (lens_design.ipynb cells
12-21); analysis/aberrations.py packages them, and these tests pin them to
the lensmaker's equation and to the sign conventions of third-order optics.
"""

import numpy as np

from pyrayt_tpu import components, materials
from pyrayt_tpu.analysis import aberrations
from pyrayt_tpu.utils import lensmakers_equation

N_IDEAL = 1.5


def make_singlet(focal_length=2.0, thickness=0.05, aperture=1.0):
    """Symmetric biconvex singlet + imager (the analyses read the final
    recorded segment, so the system must end on a detector — same shape as
    the notebook's imager systems).  Returns (system, exact focal length)."""
    # lensmaker: 1/f = (n-1)(1/r1 - 1/r2 + (n-1)t/(n r1 r2)); for a thin
    # symmetric lens r = 2 (n-1) f
    r = 2 * (N_IDEAL - 1) * focal_length
    lens = components.thick_lens(
        r, -r, thickness, aperture=aperture, material=materials.glass["ideal"]
    )
    f_exact = lensmakers_equation(r, -r, N_IDEAL, thickness)
    imager = components.baffle((4.0, 4.0)).move_x(2.0 * focal_length)
    return [lens, imager], float(f_exact)


class TestSphericalAberration:
    def test_paraxial_focus_matches_lensmaker(self):
        system, f = make_singlet()
        table = aberrations.spherical_aberration(
            system, ray_origin=-1.0, max_radius=0.1, sample_points=11
        )
        assert len(table) == 11
        # paraxial rays: every focus within 1% of the lensmaker prediction
        assert np.allclose(table["focus"], f, rtol=0.01)

    def test_marginal_rays_focus_shorter(self):
        # positive spherical aberration of a biconvex lens: marginal focus
        # is shorter than paraxial focus
        system, f = make_singlet()
        table = aberrations.spherical_aberration(
            system, ray_origin=-1.0, max_radius=0.8, sample_points=11
        ).sort_values("radius")
        focus = table["focus"].to_numpy()
        assert focus[-1] < focus[0]
        assert focus[-1] < f


class TestChromaticAberration:
    def test_bk7_normal_dispersion_orders_foci(self):
        # n(blue) > n(red) for BK7, so blue focuses shorter
        r = 2 * 0.51680003 * 2.0  # n_BK7(0.5893) - 1 ~ 0.5168
        lens = components.thick_lens(
            r, -r, 0.05, aperture=1.0, material=materials.glass["BK7"]
        )
        imager = components.baffle((4.0, 4.0)).move_x(4.0)
        table = aberrations.chromatic_aberration(
            [lens, imager], ray_origin=-1.0, test_radius=0.05,
            wavelengths=(0.4861, 0.5893, 0.6563),
        )
        focus = table.sort_values("wavelength")["focus"].to_numpy()
        assert focus[0] < focus[1] < focus[2]

    def test_ideal_glass_has_no_chromatic_aberration(self):
        system, _ = make_singlet()
        table = aberrations.chromatic_aberration(
            system, ray_origin=-1.0, test_radius=0.05,
            wavelengths=(0.4861, 0.5893, 0.6563),
        )
        focus = table["focus"].to_numpy()
        assert np.allclose(focus, focus[0], rtol=1e-9)


def test_coma_zero_on_axis():
    system, _ = make_singlet()
    on_axis = aberrations.coma(system, ray_origin=-1.0, max_radius=0.05, angle=0.0)
    off_axis = aberrations.coma(system, ray_origin=-1.0, max_radius=0.5, angle=5.0)
    assert on_axis < 1e-6
    assert off_axis > on_axis
