"""Scene-graph builder parity tests.

Re-hosts the reference's test/test_tinygfx/test_g3d/test_world_objects.py
assertions: id monotonicity, transform algebra, group propagation, the
TracerSurface hits/ids contract, and AABB tracking under transforms.
"""

import numpy as np
import pytest

from pyrayt_tpu.scene import (
    CSGSurface,
    Cuboid,
    Cylinder,
    ObjectGroup,
    Paraboloid,
    Sphere,
    WorldObject,
    XYPlane,
    fresh_ids,
)
from pyrayt_tpu.scene.objects import CountedObject


def make_rays(origins, directions):
    origins = np.atleast_2d(np.asarray(origins, dtype=float))
    directions = np.atleast_2d(np.asarray(directions, dtype=float))
    n = origins.shape[0]
    rays = np.zeros((2, 4, n))
    rays[0, :3] = origins.T
    rays[0, 3] = 1
    rays[1, :3] = directions.T
    return rays


class TestCountedObject:
    def test_monotonic_ids(self):
        a = CountedObject()
        b = CountedObject()
        c = CountedObject()
        assert a.get_id() < b.get_id() < c.get_id()

    def test_fresh_ids_resets_and_restores(self):
        _ = CountedObject()
        with fresh_ids():
            x = CountedObject()
            assert x.get_id() == 0
            y = CountedObject()
            assert y.get_id() == 1
        with fresh_ids():
            z = CountedObject()
            assert z.get_id() == 0


class TestWorldObjectTransforms:
    def test_move_updates_position(self):
        obj = WorldObject().move(1, 2, 3)
        assert np.allclose(obj.get_position(), [1, 2, 3, 1])

    def test_chained_moves(self):
        obj = WorldObject().move_x(1).move_y(2).move_z(3)
        assert np.allclose(obj.get_position(), [1, 2, 3, 1])

    def test_rotation_changes_orientation(self):
        obj = WorldObject().rotate_x(90)
        # default direction +z rotates to -y
        assert np.allclose(obj.get_orientation(), [0, -1, 0, 0], atol=1e-12)

    def test_rotation_radians(self):
        a = WorldObject().rotate_z(90)
        b = WorldObject().rotate_z(np.pi / 2, units="rad")
        assert np.allclose(a.get_world_transform(), b.get_world_transform())

    def test_invalid_units_raises(self):
        with pytest.raises(ValueError):
            WorldObject().rotate_x(90, units="grads")

    def test_negative_scale_prohibited(self):
        with pytest.raises(ValueError):
            WorldObject().scale(-1)

    def test_scale_all(self):
        obj = WorldObject().scale_all(2).move(1, 0, 0)
        tx = np.asarray(obj.get_world_transform())
        assert tx[0, 0] == 2 and tx[1, 1] == 2 and tx[2, 2] == 2

    def test_object_transform_is_inverse(self):
        obj = WorldObject().move(1, 2, 3).rotate_y(37).scale(2, 2, 2)
        w = np.asarray(obj.get_world_transform())
        o = np.asarray(obj.get_object_transform())
        assert np.allclose(w @ o, np.eye(4), atol=1e-12)

    def test_to_and_from_world_roundtrip(self):
        obj = WorldObject().rotate_z(30).move(5, -2, 1)
        p = np.array([1.0, 2.0, 3.0, 1.0])
        assert np.allclose(
            obj.to_object_coordinates(obj.to_world_coordinates(p)), p, atol=1e-12
        )

    def test_quaternion(self):
        obj = WorldObject().rotate_z(90)
        q = obj.get_quaternion()
        assert np.allclose(np.abs(q), [0, 0, np.sqrt(2) / 2, np.sqrt(2) / 2], atol=1e-12)

    def test_movement_returns_self(self):
        obj = WorldObject()
        assert obj.move(1) is obj
        assert obj.rotate_x(5) is obj
        assert obj.scale(1, 1, 1) is obj
        assert obj.transform(np.eye(4)) is obj


class TestObjectGroup:
    def test_group_transform_propagates(self):
        child = WorldObject()
        group = ObjectGroup([child])
        group.move(1, 2, 3)
        assert np.allclose(child.get_position(), [1, 2, 3, 1])

    def test_nested_groups(self):
        child = WorldObject()
        inner = ObjectGroup([child])
        outer = ObjectGroup([inner])
        outer.move_x(2)
        inner.move_y(3)
        assert np.allclose(child.get_position(), [2, 3, 0, 1])

    def test_list_interface(self):
        a, b = WorldObject(), WorldObject()
        group = ObjectGroup([a])
        group.append(b)
        assert len(group) == 2
        assert group[1] is b
        assert list(iter(group)) == [a, b]


class TestTracerSurface:
    def test_intersect_contract(self):
        sphere = Sphere(1)
        hits, ids = sphere.intersect(make_rays([(-2, 0, 0)], [(1, 0, 0)]))
        hits, ids = np.asarray(hits), np.asarray(ids)
        assert hits.shape == (2, 1) and ids.shape == (2, 1)
        assert np.allclose(hits[:, 0], [1.0, 3.0])  # sorted ascending
        assert np.all(ids == sphere.get_id())

    def test_transformed_intersection(self):
        sphere = Sphere(1).move_x(5)
        hits, _ = sphere.intersect(make_rays([(0, 0, 0)], [(1, 0, 0)]))
        assert np.allclose(np.asarray(hits)[:, 0], [4.0, 6.0])

    def test_scaled_intersection_world_distance(self):
        # hit parameters stay valid world-space distances under scaling
        sphere = Sphere(1).scale_all(3)
        hits, _ = sphere.intersect(make_rays([(-5, 0, 0)], [(1, 0, 0)]))
        assert np.allclose(np.asarray(hits)[:, 0], [2.0, 8.0])

    def test_world_normals_of_moved_sphere(self):
        sphere = Sphere(1).move_x(2)
        normals = np.asarray(
            sphere.get_world_normals(np.array([[3.0], [0.0], [0.0], [1.0]]))
        )
        assert np.allclose(normals[:, 0], [1, 0, 0, 0])

    def test_world_normals_nonuniform_scale_inverse_transpose(self):
        # unit sphere scaled x2 in y: at the "equator" point (0, 2, 0) the
        # normal must still be +y (inverse-transpose semantics)
        sphere = Sphere(1).scale_y(2)
        normals = np.asarray(
            sphere.get_world_normals(np.array([[0.0], [2.0], [0.0], [1.0]]))
        )
        assert np.allclose(normals[:, 0], [0, 1, 0, 0])

    def test_inverted_normals(self):
        sphere = Sphere(1)
        sphere.invert_normals()
        normals = np.asarray(
            sphere.get_world_normals(np.array([[1.0], [0.0], [0.0], [1.0]]))
        )
        assert np.allclose(normals[:, 0], [-1, 0, 0, 0])
        sphere.reset_normals()
        normals = np.asarray(
            sphere.get_world_normals(np.array([[1.0], [0.0], [0.0], [1.0]]))
        )
        assert np.allclose(normals[:, 0], [1, 0, 0, 0])

    def test_surface_ids_tuple(self):
        sphere = Sphere(1)
        ((sid, obj),) = sphere.surface_ids
        assert sid == sphere.get_id() and obj is sphere


class TestBoundingBoxes:
    def test_sphere_aabb(self):
        spans = np.asarray(Sphere(2).bounding_box)
        assert np.allclose(spans, [[-2, 2], [-2, 2], [-2, 2]])

    def test_aabb_tracks_move(self):
        sphere = Sphere(1).move(1, 2, 3)
        spans = np.asarray(sphere.bounding_box)
        assert np.allclose(spans, [[0, 2], [1, 3], [2, 4]])

    def test_aabb_tracks_scale(self):
        spans = np.asarray(Sphere(1).scale(2, 3, 4).bounding_box)
        assert np.allclose(spans, [[-2, 2], [-3, 3], [-4, 4]])

    def test_aabb_under_rotation_contains_shape(self):
        cube = Cuboid((-1, -1, -1), (1, 1, 1)).rotate_z(45)
        spans = np.asarray(cube.bounding_box)
        assert spans[0, 1] == pytest.approx(np.sqrt(2))
        assert spans[1, 1] == pytest.approx(np.sqrt(2))
        assert spans[2, 1] == pytest.approx(1.0)

    def test_all_surface_types_have_aabbs(self):
        for surf in (
            Sphere(1),
            Cylinder(1, -1, 1),
            Paraboloid(1, 1),
            XYPlane(2, 2),
            Cuboid(),
        ):
            spans = np.asarray(surf.bounding_box)
            assert spans.shape == (3, 2)
            assert np.all(spans[:, 0] <= spans[:, 1])
