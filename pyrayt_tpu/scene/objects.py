"""Scene-graph builder objects.

User-facing counterparts of the reference's WorldObject hierarchy
(tinygfx/g3d/world_objects.py:26-422) with the same movement/chaining API.
These are *builders*: they hold 4x4 transforms and primitive specs and
compile into the flat scene representation consumed by the jitted trace
engine (pyrayt_tpu/scene/compile.py).

Transform math runs on NumPy for plain-float scenes (fast eager path) and
transparently switches to jnp when any parameter is a JAX tracer, so a
scene can be (re)built inside ``jax.grad``/``jax.jit`` with traced
parameters — the differentiable-lens-design path (see
pyrayt_tpu/scene/_backend.py).

Object identity: like the reference, every object draws a monotonically
increasing id from a global counter (world_objects.py:26-40); that id is
what appears in the result DataFrame's ``surface`` column.  For stable
jaxprs when a scene is rebuilt every optimization step, wrap the rebuild in
``fresh_ids()`` so ids repeat identically.
"""

from __future__ import annotations

import abc
import contextlib
import copy
import itertools
import math

import jax.numpy as jnp
import numpy as np

from pyrayt_tpu.core import primitives as prim
from pyrayt_tpu.core.operations import TRANSFORM_PRECISION, transform_rays
from pyrayt_tpu.scene._backend import is_traced, xp_for

__all__ = [
    "CountedObject",
    "fresh_ids",
    "WorldObject",
    "ObjectGroup",
    "Intersectable",
    "TracerSurface",
    "bounding_box_spans",
]


class CountedObject:
    """Global monotonically-increasing object ids (reference parity)."""

    _ids = itertools.count(0)

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._id = next(CountedObject._ids)

    def get_id(self) -> int:
        return self._id


@contextlib.contextmanager
def fresh_ids(start: int = 0):
    """Reset the global id counter inside the context, restoring it after.

    Use when rebuilding a parametric scene every optimization step so the
    emitted ids (and therefore the traced program) are identical across
    rebuilds — otherwise every step would recompile.
    """
    saved = CountedObject._ids
    CountedObject._ids = itertools.count(start)
    try:
        yield
    finally:
        CountedObject._ids = saved


class WorldObject(CountedObject):
    """An object in 3D space with chainable move/scale/rotate operations.

    Parity with tinygfx/g3d/world_objects.py:43-280 (transform semantics,
    watchlist callbacks, deg/rad units, negative-scale prohibition).
    """

    @staticmethod
    def _sin_cos(angle, units="deg"):
        if units == "deg":
            scale = math.pi / 180.0
        elif units == "rad":
            scale = 1.0
        else:
            raise ValueError(f"{units} is not a valid option for angle units")
        xp = xp_for(angle)
        if xp is np:
            return math.sin(float(angle) * scale), math.cos(float(angle) * scale)
        return jnp.sin(angle * scale), jnp.cos(angle * scale)

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._obj_origin = np.array([0.0, 0.0, 0.0, 1.0])
        self._obj_direction = np.array([0.0, 0.0, 1.0, 0.0])
        self._world_coordinate_transform = np.identity(4)
        self._object_coordinate_transform = np.identity(4)
        self._world_origin = self._obj_origin
        self._world_direction = self._obj_direction
        # callbacks fired whenever the world transform changes
        self.var_watchlist = [self._world_matrix_update_handler]

    # -- transform bookkeeping ------------------------------------------------

    def _world_matrix_update_handler(self):
        tx = self._world_coordinate_transform
        xp = xp_for(tx)
        self._world_origin = tx @ xp.asarray(self._obj_origin)
        world_dir = tx @ xp.asarray(self._obj_direction)
        norm = xp.linalg.norm(world_dir)
        if not is_traced(norm) and float(norm) < 1e-7:
            raise ValueError(
                f"Measured Norm of World Vector below tolerance: {norm}"
            )
        self._world_direction = world_dir / norm
        self._object_coordinate_transform = xp.linalg.inv(tx)

    def _append_world_transform(self, new_transform):
        xp = xp_for(new_transform, self._world_coordinate_transform)
        self._world_coordinate_transform = xp.asarray(new_transform) @ xp.asarray(
            self._world_coordinate_transform
        )
        for fn in self.var_watchlist:
            fn()

    # -- getters --------------------------------------------------------------

    def get_position(self):
        return self._world_origin

    def get_orientation(self):
        return self._world_direction

    def get_quaternion(self):
        from scipy.spatial import transform as scipy_transform

        r = scipy_transform.Rotation.from_matrix(
            np.asarray(self._world_coordinate_transform)[:-1, :-1]
        )
        return r.as_quat()

    def get_world_transform(self):
        return copy.copy(self._world_coordinate_transform)

    def get_object_transform(self):
        return copy.copy(self._object_coordinate_transform)

    def _get_object_transform(self):
        return self._object_coordinate_transform

    def to_object_coordinates(self, coordinates):
        xp = xp_for(coordinates, self._object_coordinate_transform)
        return xp.asarray(self._object_coordinate_transform) @ xp.asarray(coordinates)

    def to_world_coordinates(self, coordinates):
        xp = xp_for(coordinates, self._world_coordinate_transform)
        return xp.asarray(self._world_coordinate_transform) @ xp.asarray(coordinates)

    # -- movement -------------------------------------------------------------

    def move(self, x=0, y=0, z=0):
        if is_traced(x, y, z):
            tx = jnp.eye(4).at[:-1, -1].set(jnp.asarray([x, y, z], dtype=float))
        else:
            tx = np.identity(4)
            tx[:-1, -1] = (x, y, z)
        self._append_world_transform(tx)
        return self

    def move_x(self, movement):
        return self.move(x=movement)

    def move_y(self, movement):
        return self.move(y=movement)

    def move_z(self, movement):
        return self.move(z=movement)

    def scale(self, x=1, y=1, z=1):
        for val in (x, y, z):
            if not is_traced(val) and float(val) < 0:
                raise ValueError("Negative values for scale operations are prohibited")
        if is_traced(x, y, z):
            tx = jnp.diag(jnp.asarray([x, y, z, 1.0], dtype=float))
        else:
            tx = np.diag((float(x), float(y), float(z), 1.0))
        self._append_world_transform(tx)
        return self

    def scale_x(self, scale_val):
        return self.scale(x=scale_val)

    def scale_y(self, scale_val):
        return self.scale(y=scale_val)

    def scale_z(self, scale_val):
        return self.scale(z=scale_val)

    def scale_all(self, scale_val):
        return self.scale(scale_val, scale_val, scale_val)

    def _rotation_matrix(self, axes, sin_a, cos_a):
        (i, j) = axes
        if is_traced(sin_a, cos_a):
            tx = (
                jnp.eye(4)
                .at[i, i].set(cos_a)
                .at[j, j].set(cos_a)
                .at[i, j].set(-sin_a)
                .at[j, i].set(sin_a)
            )
        else:
            tx = np.identity(4)
            tx[i, i] = cos_a
            tx[j, j] = cos_a
            tx[i, j] = -sin_a
            tx[j, i] = sin_a
        return tx

    def rotate_x(self, angle, units="deg"):
        sin_a, cos_a = self._sin_cos(angle, units)
        self._append_world_transform(self._rotation_matrix((1, 2), sin_a, cos_a))
        return self

    def rotate_y(self, angle, units="deg"):
        sin_a, cos_a = self._sin_cos(angle, units)
        self._append_world_transform(self._rotation_matrix((2, 0), sin_a, cos_a))
        return self

    def rotate_z(self, angle, units="deg"):
        sin_a, cos_a = self._sin_cos(angle, units)
        self._append_world_transform(self._rotation_matrix((0, 1), sin_a, cos_a))
        return self

    def transform(self, transform_matrix):
        self._append_world_transform(transform_matrix)
        return self


class ObjectGroup(WorldObject):
    """Rigid assembly: transforms applied to the group propagate to members.

    Parity with tinygfx/g3d/world_objects.py:283-295 (list semantics kept
    via the ``data`` attribute and sequence dunders).
    """

    def __init__(self, initlist=None, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.data = list(initlist) if initlist is not None else []

    def __iter__(self):
        return iter(self.data)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, item):
        return self.data[item]

    def append(self, item):
        self.data.append(item)

    def _append_world_transform(self, new_transform):
        super()._append_world_transform(new_transform)
        for surface in self.data:
            surface.transform(new_transform)


def bounding_box_spans(point_set):
    """(3, 2) per-axis (min, max) spans of a homogeneous point set (4, k)."""
    xp = xp_for(point_set)
    point_set = xp.asarray(point_set)
    return xp.stack(
        (xp.min(point_set[:3], axis=1), xp.max(point_set[:3], axis=1)), axis=1
    )


class Intersectable(WorldObject, abc.ABC):
    """Base for anything traceable (reference: world_objects.py:298-335)."""

    _normal_scale = 1

    @abc.abstractmethod
    def intersect(self, rays):
        """Eager intersection; returns ``(hits (m, n), surface_ids (m, n))``."""

    @property
    def bounding_box(self):
        """(3, 2) world-space AABB spans (min, max per axis)."""
        return self._aobb_spans

    @property
    def bounding_volume(self):
        return self._aobb_spans

    def attach_to(self, parent_object: WorldObject) -> None:
        self._parent = parent_object
        self.var_watchlist += parent_object.var_watchlist

    def invert_normals(self):
        self._normal_scale = -1

    def reset_normals(self):
        self._normal_scale = 1

    @property
    def surface_ids(self) -> tuple:
        return ((self.get_id(), self),)


def _corners_to_cube_points(spans):
    """8 homogeneous corner points of a (3, 2) span box, shape (4, 8)."""
    xp = xp_for(spans)
    spans = xp.asarray(spans)
    corners = [
        xp.stack(
            (spans[0, ix], spans[1, iy], spans[2, iz], xp.asarray(1.0))
        )
        for ix in range(2)
        for iy in range(2)
        for iz in range(2)
    ]
    return xp.stack(corners, axis=1)


class TracerSurface(Intersectable, abc.ABC):
    """Binds a primitive type + packed params + material + transform.

    Unlike the reference (which holds a SurfacePrimitive instance,
    world_objects.py:338-422) the primitive is stored as a static type code
    plus a packed ``(PARAM_WIDTH,)`` parameter vector — exactly what the
    flattened scene IR needs.
    """

    prim_type: int  # set by subclasses

    def __init__(self, params, bounding_spans, material=None, *args, **kwargs):
        super().__init__(*args, **kwargs)
        xp = xp_for(params)
        params = xp.asarray(params, dtype=float).reshape(-1)
        if xp is np:
            packed = np.zeros(prim.PARAM_WIDTH)
            packed[: params.shape[0]] = params
        else:
            packed = jnp.zeros(prim.PARAM_WIDTH).at[: params.shape[0]].set(params)
        self._prim_params = packed
        self.material = material
        self._local_bounding_points = _corners_to_cube_points(bounding_spans)
        self._boundary_box_update_fn()
        self.var_watchlist.append(self._boundary_box_update_fn)

    def _boundary_box_update_fn(self):
        xp = xp_for(self._world_coordinate_transform, self._local_bounding_points)
        world_points = xp.asarray(self._world_coordinate_transform) @ xp.asarray(
            self._local_bounding_points
        )
        self._aobb_spans = bounding_box_spans(world_points)

    @property
    def bounding_points(self):
        xp = xp_for(self._world_coordinate_transform, self._local_bounding_points)
        return xp.asarray(self._world_coordinate_transform) @ xp.asarray(
            self._local_bounding_points
        )

    @property
    def prim_params(self):
        return self._prim_params

    def intersect(self, rays):
        """Eager single-surface intersection (parity: world_objects.py:360-383)."""
        rays = jnp.asarray(rays)
        if rays.ndim == 2:
            rays = rays[..., None]
        local_rays = jnp.einsum(
            "ij,rjn->rin",
            jnp.asarray(self._object_coordinate_transform),
            rays,
            precision=TRANSFORM_PRECISION,
        )
        hits = prim.leaf_intersect(self.prim_type, local_rays, jnp.asarray(self._prim_params))
        hits = jnp.stack((jnp.minimum(hits[0], hits[1]), jnp.maximum(hits[0], hits[1])))
        return hits, jnp.full(hits.shape, self.get_id())

    def shade(self, rays, distances, **kwargs):
        """Per-pixel RGBA of camera rays hitting this surface at ``distances``
        (viewport path; parity: world_objects.py:385-399)."""
        import numpy as np_

        from pyrayt_tpu.render import gooch

        rays = np_.asarray(rays)
        distances = np_.asarray(distances)
        coordinates = rays[0] + distances * rays[1]
        normals = np_.asarray(self.get_world_normals(coordinates))
        material = self.material if self.material is not None else gooch.BLACK
        return material.shade(
            np_.stack((coordinates, rays[1]), axis=0), normals, **kwargs
        )

    def get_world_normals(self, positions):
        """World-space unit normals at (assumed on-surface) positions.

        Parity with world_objects.py:401-418 (inverse-transpose transform,
        w zeroed, renormalized, scaled by the inversion flag).
        """
        positions = jnp.asarray(positions)
        single = positions.ndim == 1
        if single:
            positions = positions[:, None]
        obj_tx = jnp.asarray(self._object_coordinate_transform)
        local_points = transform_rays(obj_tx, positions)
        local_normals = prim.leaf_normal(
            self.prim_type, local_points, jnp.asarray(self._prim_params)
        )
        world_normals = transform_rays(obj_tx.T, local_normals)
        world_normals = world_normals.at[-1].set(0.0)
        world_normals = world_normals / jnp.linalg.norm(world_normals, axis=0)
        world_normals = world_normals * self._normal_scale
        return world_normals[:, 0] if single else world_normals
