"""Viewport render layer tests.

Parity specs ported from the reference's render-layer tests:
test/test_tinygfx/test_g3d/test_cameras.py (camera ray grid),
test_renderers.py (render output shapes), test_materials.py (Gooch
limiting colors).
"""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from pyrayt_tpu.render import (
    EdgeRender,
    GoochMaterial,
    OrthographicCamera,
    ShadedRenderer,
    color,
    draw,
)
from pyrayt_tpu.scene.surfaces import Sphere


class TestOrthographicCamera:
    @pytest.fixture()
    def camera(self):
        return OrthographicCamera(10, 1, 0.5)

    def test_number_of_rays_created(self, camera):
        assert camera.generate_rays().shape[-1] == 50

    def test_ray_direction(self, camera):
        rays = np.asarray(camera.generate_rays())
        assert np.allclose(rays[1].T, np.array((1, 0, 0, 0)))
        rays = np.asarray(camera.rotate_y(90).generate_rays())
        assert np.allclose(rays[1].T, np.array((0, 0, -1.0, 0)), atol=1e-7)

    def test_ray_position(self, camera):
        rays = np.asarray(camera.generate_rays())
        assert np.allclose(rays[0, 0], 0)
        y_spans = rays[0, 1].reshape(5, 10)
        assert np.allclose(y_spans, np.linspace(0.5, -0.5, 10))
        z_spans = rays[0, 2].reshape(5, 10).T
        assert np.allclose(z_spans, np.linspace(0.25, -0.25, 5))


class TestEdgeRenderer:
    def test_render_results(self):
        surfaces = (
            Sphere(1).move_x(3).move_y(0.5),
            Sphere(1).move_x(3).move_y(-0.5),
        )
        camera = OrthographicCamera(10, 10, 1)
        renderer = EdgeRender(camera, surfaces)
        results = renderer.render()
        assert results.shape == (*camera.get_resolution()[::-1], 4)


class TestShadedRenderer:
    def test_render_results(self):
        matl = GoochMaterial()
        surfaces = (
            Sphere(1, material=matl).move_x(3).move_y(0.5),
            Sphere(1, material=matl).move_x(3).move_y(-0.5),
        )
        camera = OrthographicCamera(10, 10, 1)
        renderer = ShadedRenderer(
            camera, surfaces, light_position=(0, 10, 10, 1)
        )
        results = renderer.render()
        assert results.shape == (*camera.get_resolution()[::-1], 4)


class TestGoochMaterial:
    @pytest.fixture()
    def material(self):
        return GoochMaterial(
            base_color=color.WHITE,
            warm_color=color.YELLOW,
            cool_color=color.BLUE,
            alpha=0,
            beta=0,
        )

    def test_single_light_source(self, material):
        light = np.array((0.0, 0.0, 10.0, 1.0))
        normals = np.zeros((4, 10))
        normals[2] = 1
        normals[2, :5] = -1
        rays = np.zeros((2, 4, 10))
        rays[0, 3] = 1
        pixel_values = material.shade(rays, normals, light)
        assert np.allclose(pixel_values[:, :5], np.atleast_2d(color.BLUE).T)
        assert np.allclose(pixel_values[:, 5:], np.atleast_2d(color.YELLOW).T)

    def test_single_ray_case(self, material):
        light = np.array((0.0, 0.0, 10.0, 1.0))
        ray = np.zeros((2, 4, 1))
        ray[0, 3] = 1
        ray[1, 0] = 1

        normal = np.array((0.0, 0.0, 1.0, 0.0))
        pixel_values = material.shade(ray, normal, light)
        assert pixel_values.shape == (4, 1)
        assert np.allclose(pixel_values, np.atleast_2d(color.YELLOW).T)

        normal = np.array((0.0, 0.0, -1.0, 0.0))
        pixel_values = material.shade(ray, normal, light)
        assert np.allclose(pixel_values, np.atleast_2d(color.BLUE).T)

        normal = np.array((0.0, 1.0, 0.0, 0.0))
        pixel_values = material.shade(ray, normal, light)
        expected = color.RGBAColor(0.5, 0.5, 0.5)
        assert np.allclose(pixel_values, np.atleast_2d(expected).T)


class TestDraw:
    def test_draw_and_show_smoke(self):
        """draw() renders CSG components into an axis; RayTracer.show runs."""
        import matplotlib.pyplot as plt

        import pyrayt_tpu as prt
        from pyrayt_tpu import components as comp
        from pyrayt_tpu import materials as matl

        lens = comp.thick_lens(
            r1=1, r2=-1, thickness=0.25, aperture=0.5, material=matl.glass["ideal"]
        )
        detector = comp.baffle((1, 1)).move_x(1)

        fig, axis = plt.subplots()
        draw([lens, detector], view="xy", axis=axis, shaded=True, resolution=64)
        draw([lens, detector], view="xz", axis=axis, shaded=False, resolution=64)

        source = comp.LineOfRays(0.4).move_x(-0.5)
        tracer = prt.RayTracer(
            source, [lens, detector], rays_per_source=5, generation_limit=4
        )
        tracer.trace()
        tracer.show(axis=axis, resolution=64, color_function="wavelength")
        plt.close(fig)
