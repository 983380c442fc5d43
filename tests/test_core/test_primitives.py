"""Parity tests for the primitive intersection kernels.

Re-hosts the reference's test/test_tinygfx/test_g3d/test_primitives.py
conventions: both-roots ordering, +/-inf encodings for misses and
inside-solid rays, skew/linear degenerate cases, normals (including cube
corners and cylinder caps).
"""

import numpy as np
import pytest

from pyrayt_tpu.core import primitives as prim


def make_rays(origins, directions):
    """Build a (2, 4, n) ray bundle from lists of 3-vectors."""
    origins = np.atleast_2d(np.asarray(origins, dtype=float))
    directions = np.atleast_2d(np.asarray(directions, dtype=float))
    n = origins.shape[0]
    rays = np.zeros((2, 4, n))
    rays[0, :3] = origins.T
    rays[0, 3] = 1
    rays[1, :3] = directions.T
    return rays


class TestSphere:
    def test_double_intersection(self):
        rays = make_rays([(-2, 0, 0)], [(1, 0, 0)])
        hits = np.asarray(prim.sphere_intersect(rays, 1.0))
        assert np.allclose(np.sort(hits, axis=0)[:, 0], [1.0, 3.0])

    def test_miss_is_positive_inf(self):
        rays = make_rays([(-2, 5, 0)], [(1, 0, 0)])
        hits = np.asarray(prim.sphere_intersect(rays, 1.0))
        assert np.all(np.isinf(hits)) and np.all(hits > 0)

    def test_tangent_double_root(self):
        rays = make_rays([(-2, 1, 0)], [(1, 0, 0)])
        hits = np.asarray(prim.sphere_intersect(rays, 1.0))
        assert np.allclose(hits, 2.0)

    def test_from_inside(self):
        rays = make_rays([(0, 0, 0)], [(1, 0, 0)])
        hits = np.sort(np.asarray(prim.sphere_intersect(rays, 1.0)), axis=0)
        assert np.allclose(hits[:, 0], [-1.0, 1.0])

    def test_arrayed(self):
        n = 1000
        rays = make_rays([(-2, 0, 0)] * n, [(1, 0, 0)] * n)
        hits = np.sort(np.asarray(prim.sphere_intersect(rays, 1.0)), axis=0)
        assert np.allclose(hits[0], 1.0) and np.allclose(hits[1], 3.0)

    def test_scaled_radius(self):
        rays = make_rays([(-5, 0, 0)], [(1, 0, 0)])
        hits = np.sort(np.asarray(prim.sphere_intersect(rays, 3.0)), axis=0)
        assert np.allclose(hits[:, 0], [2.0, 8.0])

    def test_dead_ray_is_inf_not_nan(self):
        rays = make_rays([(0, 0, 0)], [(0, 0, 0)])
        hits = np.asarray(prim.sphere_intersect(rays, 1.0))
        assert np.all(np.isinf(hits))

    def test_normal(self):
        points = np.array([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0], [1.0, 1.0]])
        normals = np.asarray(prim.sphere_normal(points, 1.0))
        assert np.allclose(normals[:, 0], [1, 0, 0, 0])
        assert np.allclose(normals[:, 1], [0, 1, 0, 0])


class TestParaboloid:
    # surface x^2 + y^2 = 4 f z with focus f=1, height 1

    def test_axial_hit(self):
        rays = make_rays([(0, 0, -1)], [(0, 0, 1)])
        # linear case: enters at the apex z=0 (t=1), exits through cap
        hits = np.asarray(prim.paraboloid_intersect(rays, 1.0, 1.0))
        assert np.allclose(np.sort(hits, axis=0)[:, 0], [1.0, 2.0])

    def test_side_entry(self):
        # ray along x at height z=0.25: parabola radius there is 1
        rays = make_rays([(-5, 0, 0.25)], [(1, 0, 0)])
        hits = np.sort(np.asarray(prim.paraboloid_intersect(rays, 1.0, 1.0)), axis=0)
        assert np.allclose(hits[:, 0], [4.0, 6.0])

    def test_above_height_misses(self):
        rays = make_rays([(-5, 0, 5)], [(1, 0, 0)])
        hits = np.asarray(prim.paraboloid_intersect(rays, 1.0, 1.0))
        assert np.all(np.isinf(hits)) and np.all(hits > 0)

    def test_linear_case_descending(self):
        # ray travelling -z from above the cap, on-axis
        rays = make_rays([(0, 0, 2)], [(0, 0, -1)])
        hits = np.sort(np.asarray(prim.paraboloid_intersect(rays, 1.0, 1.0)), axis=0)
        # enters through cap at t=1, exits apex at t=2
        assert np.allclose(hits[:, 0], [1.0, 2.0])

    def test_normal_on_surface(self):
        # at (2, 0, 1) the normal ~ (2, 0, -2f)/|.| = (1, 0, -1)/sqrt(2)
        # but z=1 == height -> cap normal +z wins
        points = np.array([[2.0], [0.0], [1.0], [1.0]])
        normals = np.asarray(prim.paraboloid_normal(points, 1.0, 1.0))
        assert np.allclose(normals[:, 0], [0, 0, 1, 0])

        points = np.array([[2.0], [0.0], [0.5], [1.0]])
        normals = np.asarray(prim.paraboloid_normal(points, 1.0, 2.0))
        expected = np.array([2.0, 0.0, -2.0, 0.0])
        assert np.allclose(normals[:, 0], expected / np.linalg.norm(expected))


class TestPlane:
    def test_direct_hit_is_duplicated(self):
        rays = make_rays([(0, 0, -1)], [(0, 0, 1)])
        hits = np.asarray(prim.plane_intersect(rays, 2.0, 2.0))
        assert hits.shape[0] == 2
        assert np.allclose(hits, 1.0)

    def test_outside_patch_misses(self):
        rays = make_rays([(5, 0, -1)], [(0, 0, 1)])
        hits = np.asarray(prim.plane_intersect(rays, 2.0, 2.0))
        assert np.all(np.isinf(hits))

    def test_oblique_hit_within_bounds(self):
        rays = make_rays([(-0.5, 0, -1)], [(1 / np.sqrt(2), 0, 1 / np.sqrt(2))])
        hits = np.asarray(prim.plane_intersect(rays, 4.0, 4.0))
        assert np.allclose(hits, np.sqrt(2))

    def test_skew_ray_misses(self):
        rays = make_rays([(0, 0, 1)], [(1, 0, 0)])
        hits = np.asarray(prim.plane_intersect(rays, 2.0, 2.0))
        assert np.all(np.isinf(hits))

    def test_normal_is_positive_z(self):
        # the reference docstring says -z but returns +z (quirk Q8);
        # behavior wins
        points = np.zeros((4, 3))
        normals = np.asarray(prim.plane_normal(points, 2.0, 2.0))
        assert np.allclose(normals[2], 1.0)


class TestCube:
    spans = np.array([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]])

    def test_axial_hit(self):
        rays = make_rays([(-3, 0, 0)], [(1, 0, 0)])
        hits = np.asarray(prim.cube_intersect(rays, self.spans))
        assert np.allclose(hits[:, 0], [2.0, 4.0])

    def test_miss(self):
        rays = make_rays([(-3, 5, 0)], [(1, 0, 0)])
        hits = np.asarray(prim.cube_intersect(rays, self.spans))
        assert np.all(np.isinf(hits))

    def test_skew_inside_slab(self):
        # ray at y=0 (inside the y/z slabs) travelling +x still hits
        rays = make_rays([(-3, 0.5, 0.5)], [(1, 0, 0)])
        hits = np.asarray(prim.cube_intersect(rays, self.spans))
        assert np.allclose(hits[:, 0], [2.0, 4.0])

    def test_from_inside(self):
        rays = make_rays([(0, 0, 0)], [(1, 0, 0)])
        hits = np.asarray(prim.cube_intersect(rays, self.spans))
        assert np.allclose(hits[:, 0], [-1.0, 1.0])

    def test_diagonal(self):
        d = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
        rays = make_rays([(-2 * d[0] * 2, -2 * d[1] * 2, -2 * d[2] * 2)], [d])
        hits = np.asarray(prim.cube_intersect(rays, self.spans))
        assert np.all(np.isfinite(hits))

    def test_face_normals(self):
        points = np.array(
            [
                [1.0, -1.0, 0.0],
                [0.0, 0.0, 1.0],
                [0.0, 0.0, 0.0],
                [1.0, 1.0, 1.0],
            ]
        )
        normals = np.asarray(prim.cube_normal(points, self.spans))
        assert np.allclose(normals[:, 0], [1, 0, 0, 0])
        assert np.allclose(normals[:, 1], [-1, 0, 0, 0])
        assert np.allclose(normals[:, 2], [0, 1, 0, 0])

    def test_corner_normal_normalized(self):
        points = np.array([[1.0], [1.0], [1.0], [1.0]])
        normals = np.asarray(prim.cube_normal(points, self.spans))
        assert np.allclose(np.linalg.norm(normals, axis=0), 1.0)
        assert np.allclose(normals[:3, 0], 1 / np.sqrt(3))


class TestCylinder:
    # radius 1, z in [-1, 1]

    def test_wall_hit(self):
        rays = make_rays([(-5, 0, 0)], [(1, 0, 0)])
        hits = np.asarray(prim.cylinder_intersect(rays, 1.0, -1.0, 1.0))
        assert np.allclose(hits[:, 0], [4.0, 6.0])

    def test_wall_outside_height_misses(self):
        rays = make_rays([(-5, 0, 2)], [(1, 0, 0)])
        hits = np.asarray(prim.cylinder_intersect(rays, 1.0, -1.0, 1.0))
        assert np.all(np.isinf(hits)) and np.all(hits > 0)

    def test_cap_hit_axial_ray(self):
        rays = make_rays([(0, 0, -5)], [(0, 0, 1)])
        hits = np.asarray(prim.cylinder_intersect(rays, 1.0, -1.0, 1.0))
        assert np.allclose(hits[:, 0], [4.0, 6.0])

    def test_axial_ray_outside_radius_misses(self):
        rays = make_rays([(2, 0, -5)], [(0, 0, 1)])
        hits = np.asarray(prim.cylinder_intersect(rays, 1.0, -1.0, 1.0))
        assert np.all(np.isinf(hits)) and np.all(hits > 0)

    def test_cap_vs_wall_oblique(self):
        # 45-degree ray entering through the wall, exiting through the cap
        d = np.array([1.0, 0.0, 1.0]) / np.sqrt(2)
        rays = make_rays([(-2, 0, -0.5)], [d])
        hits = np.sort(np.asarray(prim.cylinder_intersect(rays, 1.0, -1.0, 1.0)), axis=0)
        # wall entry at x=-1 -> t = sqrt(2); cap exit at z=1 -> t = 1.5*sqrt(2)
        assert hits[0, 0] == pytest.approx(np.sqrt(2))
        assert hits[1, 0] == pytest.approx(1.5 * np.sqrt(2))

    def test_wall_normal(self):
        points = np.array([[1.0], [0.0], [0.0], [1.0]])
        normals = np.asarray(prim.cylinder_normal(points, 1.0, -1.0, 1.0))
        assert np.allclose(normals[:, 0], [1, 0, 0, 0])

    def test_cap_normals(self):
        points = np.array([[0.5, 0.5], [0.0, 0.0], [1.0, -1.0], [1.0, 1.0]])
        normals = np.asarray(prim.cylinder_normal(points, 1.0, -1.0, 1.0))
        assert np.allclose(normals[:, 0], [0, 0, 1, 0])
        assert np.allclose(normals[:, 1], [0, 0, -1, 0])

    def test_uncapped_ignores_caps(self):
        points = np.array([[1.0], [0.0], [1.0], [1.0]])
        normals = np.asarray(
            prim.cylinder_normal(points, 1.0, -1.0, 1.0, capped=0.0)
        )
        assert np.allclose(normals[:, 0], [1, 0, 0, 0])


class TestLeafDispatch:
    def test_all_types_roundtrip(self):
        rays = make_rays([(-5, 0, 0)], [(1, 0, 0)])
        cases = [
            (prim.SPHERE, np.array([1.0, 0, 0, 0, 0, 0])),
            (prim.PARABOLOID, np.array([1.0, 1.0, 0, 0, 0, 0])),
            (prim.PLANE, np.array([2.0, 2.0, 0, 0, 0, 0])),
            (prim.CUBE, np.array([-1.0, 1.0, -1.0, 1.0, -1.0, 1.0])),
            (prim.CYLINDER, np.array([1.0, -1.0, 1.0, 1.0, 0, 0])),
        ]
        for code, params in cases:
            hits = np.asarray(prim.leaf_intersect(code, rays, params))
            assert hits.shape == (2, 1)
