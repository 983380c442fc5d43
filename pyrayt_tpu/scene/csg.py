"""CSG builder surfaces.

User-facing compound-surface construction with reference ergonomics
(tinygfx/g3d/csg.py:64-191): ``union``/``intersect``/``difference`` free
functions building a binary tree of Intersectables.  The tree structure is
static; the jitted engine consumes it via scene compilation, while the
eager ``intersect`` method here exists for API parity, tests, and the
host-side renderers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pyrayt_tpu.core.csg import Operation, array_csg, csg_combine_with_ids
from pyrayt_tpu.scene._backend import is_traced
from pyrayt_tpu.scene.objects import Intersectable


def _array_csg_spans_np(array1, array2, operation: Operation):
    """NumPy twin of core.csg.array_csg for the builder's (2, 3) AABB span
    merges — keeps scene construction off the XLA eager-dispatch path."""
    merged = np.concatenate((array1, array2), axis=0)
    order = np.argsort(merged, axis=0, kind="stable")
    merged_sorted = np.take_along_axis(merged, order, axis=0)
    if operation in (Operation.UNION, Operation.INTERSECT):
        count = np.cumsum(np.where(order & 1, -1, 1), axis=0)
    else:
        from_second = order >= array1.shape[0]
        count = np.cumsum(np.where((order & 1).astype(bool) ^ from_second, -1, 1), axis=0) + 1
    if operation == Operation.UNION:
        occupied = count != 0
        boundary = occupied ^ np.roll(occupied, 1, axis=0)
    else:
        is_two = count == 2
        boundary = is_two | np.roll(is_two, 1, axis=0)
    return np.sort(np.where(boundary, merged_sorted, np.inf), axis=0)

__all__ = ["Operation", "CSGSurface", "union", "intersect", "difference"]


class CSGSurface(Intersectable):
    def __init__(
        self,
        l_child: Intersectable,
        r_child: Intersectable,
        operation: Operation,
        *args,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self._operation = operation
        self.var_watchlist.append(self._update_bounding_box)

        self._l_child = l_child
        self._l_child.attach_to(self)
        self._r_child = r_child
        self._r_child.attach_to(self)

        # difference inverts the cut surface's normals (csg.py:88-89)
        if self._operation == Operation.DIFFERENCE:
            self._r_child.invert_normals()

        self._update_bounding_box()

    def _update_bounding_box(self):
        if self._operation != Operation.DIFFERENCE:
            # CSG-combine the children's per-axis spans (csg.py:98-110)
            l_spans = self._l_child.bounding_box.T
            r_spans = self._r_child.bounding_box.T
            if is_traced(l_spans, r_spans):
                new_spans = array_csg(l_spans, r_spans, self._operation)
            else:
                new_spans = _array_csg_spans_np(
                    np.asarray(l_spans), np.asarray(r_spans), self._operation
                )
            self._aobb_spans = new_spans[:2].T
        else:
            self._aobb_spans = self._l_child.bounding_box

    @property
    def operation(self) -> Operation:
        return self._operation

    @property
    def l_child(self) -> Intersectable:
        return self._l_child

    @property
    def r_child(self) -> Intersectable:
        return self._r_child

    def intersect(self, rays):
        """Eager CSG intersection returning ``(hits, surface_ids)``.

        Matches CSGSurface.intersect (csg.py:118-160) minus the AABB ray
        cull — see pyrayt_tpu.core.csg.csg_combine_with_ids for why the cull
        cannot change results.
        """
        rays = jnp.asarray(rays)
        if rays.ndim == 2:
            rays = rays[..., None]
        l_hits, l_ids = self._l_child.intersect(rays)
        r_hits, r_ids = self._r_child.intersect(rays)
        return csg_combine_with_ids(l_hits, l_ids, r_hits, r_ids, self._operation)

    def invert_normals(self):
        self._l_child.invert_normals()
        self._r_child.invert_normals()

    def reset_normals(self):
        self._l_child.reset_normals()
        self._r_child.reset_normals()

    @property
    def surface_ids(self) -> tuple:
        return self._l_child.surface_ids + self._r_child.surface_ids

    def _append_world_transform(self, new_transform):
        super()._append_world_transform(new_transform)
        self._l_child.transform(new_transform)
        self._r_child.transform(new_transform)


def union(s0: Intersectable, s1: Intersectable) -> CSGSurface:
    return CSGSurface(s0, s1, Operation.UNION)


def intersect(s0: Intersectable, s1: Intersectable) -> CSGSurface:
    return CSGSurface(s0, s1, Operation.INTERSECT)


def difference(s0: Intersectable, s1: Intersectable) -> CSGSurface:
    return CSGSurface(s0, s1, Operation.DIFFERENCE)
