"""Source parity tests (test/test_pyrayt/test_components/test_sources.py)."""

import numpy as np
import pytest

from pyrayt_tpu import components


class TestLineOfRays:
    def test_spacing_and_direction(self):
        rays = components.LineOfRays(spacing=2).generate_rays(5)
        pos = np.asarray(rays.positions)
        dirs = np.asarray(rays.directions)
        assert np.allclose(pos[1], np.linspace(-1, 1, 5))
        assert np.allclose(dirs[0], 1.0)
        assert np.allclose(dirs[1:3], 0.0)

    def test_single_ray_at_origin(self):
        rays = components.LineOfRays(spacing=2).generate_rays(1)
        assert np.allclose(np.asarray(rays.positions)[:3], 0.0)

    def test_wavelength(self):
        rays = components.LineOfRays(wavelength=0.532).generate_rays(3)
        assert np.allclose(np.asarray(rays.wavelength), 0.532)

    def test_translation(self):
        rays = components.LineOfRays().move_x(-5).generate_rays(3)
        assert np.allclose(np.asarray(rays.positions)[0], -5.0)

    def test_rotation(self):
        rays = components.LineOfRays().rotate_z(90).generate_rays(3)
        dirs = np.asarray(rays.directions)
        assert np.allclose(dirs[1], 1.0, atol=1e-12)  # +x rotates to +y
        assert np.allclose(dirs[0], 0.0, atol=1e-12)

    def test_directions_unit_after_scaled_transform(self):
        rays = components.LineOfRays().scale_all(3).generate_rays(4)
        norms = np.linalg.norm(np.asarray(rays.directions), axis=0)
        assert np.allclose(norms, 1.0)


class TestConeOfRays:
    def test_cone_angle(self):
        angle = 10
        rays = components.ConeOfRays(cone_angle=angle).generate_rays(8)
        dirs = np.asarray(rays.directions)
        assert np.allclose(dirs[0], np.cos(np.deg2rad(angle)))
        transverse = np.linalg.norm(dirs[1:3], axis=0)
        assert np.allclose(transverse, np.sin(np.deg2rad(angle)))

    def test_point_origin(self):
        rays = components.ConeOfRays(cone_angle=5).generate_rays(8)
        assert np.allclose(np.asarray(rays.positions)[:3], 0.0)


class TestCircleOfRays:
    def test_on_circle(self):
        rays = components.CircleOfRays(diameter=2).generate_rays(9)
        pos = np.asarray(rays.positions)
        assert np.allclose(np.hypot(pos[1], pos[2]), 1.0)
        assert np.allclose(np.asarray(rays.directions)[0], 1.0)


class TestWedgeOfRays:
    def test_fan_angles(self):
        rays = components.WedgeOfRays(angle=90).generate_rays(5)
        dirs = np.asarray(rays.directions)
        angles = np.rad2deg(np.arctan2(dirs[1], dirs[0]))
        assert np.allclose(angles, np.linspace(-45, 45, 5))


class TestLamp:
    def test_lambertian_properties(self):
        lamp = components.Lamp(width=2, length=4, max_angle=60, seed=0)
        rays = lamp.generate_rays(2000)
        pos = np.asarray(rays.positions)
        dirs = np.asarray(rays.directions)
        inten = np.asarray(rays.intensity)
        assert np.all(np.abs(pos[1]) <= 1.0)
        assert np.all(np.abs(pos[2]) <= 2.0)
        # max angle respected: cos(theta) >= cos(60 deg)
        assert np.all(dirs[0] >= np.cos(np.deg2rad(60)) - 1e-9)
        # intensity = 100 cos(theta)
        assert np.allclose(inten, 100.0 * dirs[0], atol=1e-9)

    def test_different_calls_differ(self):
        lamp = components.Lamp(width=1, length=1, seed=1)
        a = np.asarray(lamp.generate_rays(16).directions)
        b = np.asarray(lamp.generate_rays(16).directions)
        assert not np.allclose(a, b)

    def test_static_lamp_caches(self):
        lamp = components.StaticLamp(width=1, length=1, seed=2)
        a = np.asarray(lamp.generate_rays(16).directions)
        b = np.asarray(lamp.generate_rays(16).directions)
        assert np.allclose(a, b)
