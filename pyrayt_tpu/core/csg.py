"""Constructive solid geometry interval engine.

JAX port of the reference's parity-count CSG combiner
(tinygfx/g3d/csg.py:13-61) plus the surface-id co-sorting used by compound
surfaces (tinygfx/g3d/csg.py:118-160).  The whole CSG tree of a component is
known statically at scene-compile time, so tree evaluation unrolls into a
static chain of these ops — ideal for XLA fusion; there is no recursion or
dynamic control flow on device.

Algorithm (per ray column): each child contributes a sorted, even-length
list of entry/exit parameters.  Merging both lists in sorted order and
cumulative-summing +/-1 (entering/leaving a solid) yields the number of
solids containing the ray at each event.  Boundary events of the combined
solid are kept, everything else becomes ``+inf``.

One deliberate deviation: ``jnp.argsort`` is stable while ``np.argsort``'s
default quicksort is not; for tied hit parameters (coincident surfaces) the
two can order events differently.  Stable order is deterministic and at
least as self-consistent, so we keep it (documented deviation, SURVEY.md
section 3.3).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp

__all__ = ["Operation", "array_csg", "csg_combine_with_ids"]


class Operation(enum.Enum):
    UNION = 1
    INTERSECT = 2
    DIFFERENCE = 3


def _merged_events(array1, array2, operation: Operation):
    """Merge two sorted hit lists; return (sorted events, argsort, inside count)."""
    merged = jnp.concatenate((array1, array2), axis=0)
    order = jnp.argsort(merged, axis=0)
    merged_sorted = jnp.take_along_axis(merged, order, axis=0)

    if operation in (Operation.UNION, Operation.INTERSECT):
        # even index within its own (sorted, even-length) array => an entry
        mask = jnp.where(order & 1, -1, 1)
        count = jnp.cumsum(mask, axis=0)
    elif operation == Operation.DIFFERENCE:
        # array2's roles flip (its inside counts against), +1 treats
        # "outside array2" as inside — parity with csg.py:44-48
        from_second = order >= array1.shape[0]
        mask = jnp.where((order & 1).astype(bool) ^ from_second, -1, 1)
        count = jnp.cumsum(mask, axis=0) + 1
    else:  # pragma: no cover
        raise ValueError(f"operation {operation} is invalid")
    return merged_sorted, order, count


def _boundary_mask(count, operation: Operation):
    if operation == Operation.UNION:
        occupied = count != 0
        return occupied ^ jnp.roll(occupied, 1, axis=0)
    # INTERSECT / DIFFERENCE: boundaries of the inside-both region
    is_two = count == 2
    return is_two | jnp.roll(is_two, 1, axis=0)


def array_csg(array1, array2, operation: Operation, sort_output: bool = True):
    """Combine two sorted even-length hit-parameter arrays with a CSG op.

    Accepts 1-D arrays or ``(m, n)`` arrays whose columns are independent
    rays.  Non-boundary events are replaced with ``+inf``.
    """
    array1 = jnp.asarray(array1)
    array2 = jnp.asarray(array2)
    merged_sorted, _, count = _merged_events(array1, array2, operation)
    csg_hits = jnp.where(_boundary_mask(count, operation), merged_sorted, jnp.inf)
    return jnp.sort(csg_hits, axis=0) if sort_output else csg_hits


def csg_combine_with_ids(l_hits, l_ids, r_hits, r_ids, operation: Operation):
    """CSG-combine two children's (hits, surface-ids) matrices.

    Port of CSGSurface.intersect's merge path (tinygfx/g3d/csg.py:134-149)
    minus the AABB ray culling: the cull is a host-side perf optimization
    that cannot change results (any finite combined hit lies inside the
    combined AABB), and dynamic compaction is hostile to XLA static shapes.

    Returns ``(hits, ids)``, both ``(m1+m2, n)``, sorted ascending by hit
    with ``+inf`` for removed events (their ids travel with the sort).
    """
    l_hits = jnp.asarray(l_hits)
    r_hits = jnp.asarray(r_hits)
    merged_ids = jnp.concatenate((l_ids, r_ids), axis=0)

    merged_sorted, order, count = _merged_events(l_hits, r_hits, operation)
    ids_sorted = jnp.take_along_axis(merged_ids, order, axis=0)

    csg_hits = jnp.where(_boundary_mask(count, operation), merged_sorted, jnp.inf)

    final_order = jnp.argsort(csg_hits, axis=0)
    csg_hits = jnp.take_along_axis(csg_hits, final_order, axis=0)
    csg_ids = jnp.take_along_axis(ids_sorted, final_order, axis=0)
    return csg_hits, csg_ids
