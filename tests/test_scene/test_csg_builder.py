"""CSG builder surface tests (ray-fan sweeps, id survival, AABBs).

Modeled on the reference's test/test_tinygfx/test_g3d/test_csg.py
CSGSurface cases: two unit spheres offset along y, swept by a fan of +x
rays, asserting which child's hits + surface ids survive in which y-range
for each operation.
"""

import numpy as np
import pytest

from pyrayt_tpu.scene import Sphere, difference, intersect, union


def fan_rays(y_vals, x0=-5.0):
    n = len(y_vals)
    rays = np.zeros((2, 4, n))
    rays[0, 0] = x0
    rays[0, 1] = y_vals
    rays[0, 3] = 1
    rays[1, 0] = 1
    return rays


def sphere_hits_analytic(y, center_y, radius=1.0, x0=-5.0):
    """Entry/exit t of a +x ray at height y against a sphere at (0, c, 0)."""
    dy = y - center_y
    disc = radius**2 - dy**2
    if disc < 0:
        return np.inf, np.inf
    half = np.sqrt(disc)
    return -x0 - half, -x0 + half


@pytest.fixture()
def spheres():
    l_sphere = Sphere(1)
    r_sphere = Sphere(1).move_y(0.5)
    return l_sphere, r_sphere


class TestUnionSurface:
    def test_hits_and_ids(self, spheres):
        l_sphere, r_sphere = spheres
        u = union(l_sphere, r_sphere)
        y_vals = np.linspace(-1.5, 2.0, 29)
        hits, ids = u.intersect(fan_rays(y_vals))
        hits, ids = np.asarray(hits), np.asarray(ids)

        for col, y in enumerate(y_vals):
            l_in, l_out = sphere_hits_analytic(y, 0.0)
            r_in, r_out = sphere_hits_analytic(y, 0.5)
            finite = np.isfinite(hits[:, col])
            if np.isinf(l_in) and np.isinf(r_in):
                assert not finite.any()
                continue
            entry = hits[0, col]
            expected_entry = min(l_in, r_in)
            assert entry == pytest.approx(expected_entry)
            # entry id belongs to whichever sphere is hit first (skip the
            # exact-tie column, where stable-sort order decides)
            if abs(l_in - r_in) > 1e-9:
                expected_id = (
                    l_sphere.get_id() if l_in < r_in else r_sphere.get_id()
                )
                assert ids[0, col] == expected_id
            # exit is the max exit among the spheres actually hit
            last = np.max(np.where(finite)[0])
            exits = [e for e in (l_out, r_out) if np.isfinite(e)]
            assert hits[last, col] == pytest.approx(max(exits))

    def test_bounding_box_merges(self, spheres):
        u = union(*spheres)
        spans = np.asarray(u.bounding_box)
        assert np.allclose(spans[1], [-1.0, 1.5])

    def test_bounding_box_tracks_child_move(self, spheres):
        l_sphere, r_sphere = spheres
        u = union(l_sphere, r_sphere)
        u.move_x(2)
        spans = np.asarray(u.bounding_box)
        assert np.allclose(spans[0], [1.0, 3.0])


class TestIntersectSurface:
    def test_hits_and_ids(self, spheres):
        l_sphere, r_sphere = spheres
        csg = intersect(l_sphere, r_sphere)
        y_vals = np.linspace(-1.5, 2.0, 29)
        hits, ids = csg.intersect(fan_rays(y_vals))
        hits, ids = np.asarray(hits), np.asarray(ids)

        for col, y in enumerate(y_vals):
            l_in, l_out = sphere_hits_analytic(y, 0.0)
            r_in, r_out = sphere_hits_analytic(y, 0.5)
            entry, exit_ = max(l_in, r_in), min(l_out, r_out)
            finite = np.isfinite(hits[:, col])
            if np.isinf(entry) or entry > exit_:
                assert not finite.any()
                continue
            assert hits[0, col] == pytest.approx(entry)
            assert hits[1, col] == pytest.approx(exit_)
            # intersection entry belongs to the LATER-entered sphere (skip
            # exact ties, where stable-sort order decides)
            if abs(l_in - r_in) > 1e-9:
                assert ids[0, col] == (
                    l_sphere.get_id() if l_in > r_in else r_sphere.get_id()
                )
            if abs(l_out - r_out) > 1e-9:
                assert ids[1, col] == (
                    l_sphere.get_id() if l_out < r_out else r_sphere.get_id()
                )


class TestDifferenceSurface:
    def test_hits_and_ids(self, spheres):
        l_sphere, r_sphere = spheres
        csg = difference(l_sphere, r_sphere)
        y_vals = np.array([-0.75, -0.25, 0.25])
        hits, ids = csg.intersect(fan_rays(y_vals))
        hits, ids = np.asarray(hits), np.asarray(ids)

        for col, y in enumerate(y_vals):
            l_in, l_out = sphere_hits_analytic(y, 0.0)
            r_in, r_out = sphere_hits_analytic(y, 0.5)
            if np.isinf(r_in):
                # cut sphere missed -> left sphere intact
                assert hits[0, col] == pytest.approx(l_in)
                assert hits[1, col] == pytest.approx(l_out)
                assert ids[0, col] == l_sphere.get_id()
            else:
                # overlap: [l_in, r_in] survives (cut removes the middle);
                # [r_out, l_out] survives when r exits before l
                assert hits[0, col] == pytest.approx(l_in)
                assert ids[0, col] == l_sphere.get_id()
                assert hits[1, col] == pytest.approx(r_in)
                assert ids[1, col] == r_sphere.get_id()
                if r_out < l_out:
                    assert hits[2, col] == pytest.approx(r_out)
                    assert hits[3, col] == pytest.approx(l_out)

    def test_difference_inverts_right_normals(self, spheres):
        l_sphere, r_sphere = spheres
        difference(l_sphere, r_sphere)
        assert r_sphere._normal_scale == -1
        assert l_sphere._normal_scale == 1

    def test_bounding_box_is_left_child(self, spheres):
        l_sphere, r_sphere = spheres
        csg = difference(l_sphere, r_sphere)
        assert np.allclose(np.asarray(csg.bounding_box), np.asarray(l_sphere.bounding_box))


class TestCSGTransforms:
    def test_transform_propagates_to_children(self, spheres):
        l_sphere, r_sphere = spheres
        u = union(l_sphere, r_sphere)
        u.move_z(4)
        assert np.allclose(np.asarray(l_sphere.get_position()), [0, 0, 4, 1])
        assert np.allclose(np.asarray(r_sphere.get_position()), [0, 0.5, 4, 1])

    def test_surface_ids_concatenate(self, spheres):
        l_sphere, r_sphere = spheres
        u = union(l_sphere, r_sphere)
        ids = [sid for sid, _ in u.surface_ids]
        assert ids == [l_sphere.get_id(), r_sphere.get_id()]

    def test_nested_csg(self):
        a, b, c = Sphere(1), Sphere(1).move_y(0.5), Sphere(1).move_y(-0.5)
        tree = union(union(a, b), c)
        ids = [sid for sid, _ in tree.surface_ids]
        assert ids == [a.get_id(), b.get_id(), c.get_id()]
        hits, surf = tree.intersect(fan_rays(np.array([0.0])))
        hits = np.asarray(hits)
        assert hits.shape[0] == 6
        assert np.isfinite(hits[:, 0]).sum() == 2  # single merged interval
