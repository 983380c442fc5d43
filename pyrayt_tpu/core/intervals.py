"""Closed-form interval CSG (the fast path for factory-shaped trees).

Every leaf intersector returns exactly one (entry, exit) interval per ray,
and every factory-built CSG tree (thick_lens, mirrors, prisms, aperture)
combines a left subtree with a *leaf* right child using
intersect/difference.  On that shape, CSG evaluates as a handful of
min/max/where ops per node — measured ~30 element-ops/ray for a 3-leaf
lens versus ~1000 for the general merge-sort-network combiner
(core.csg.csg_combine_with_ids).  Trees with union nodes or non-leaf
right children keep the general path.

Used by both the XLA engine (tracer/engine.py — also the reverse-mode
path: min/max/where differentiate as subgradients, same class as the
network path) and the fused Pallas kernel (ops/fused_trace.py).

Interval encoding: ``(lo, hi, lo_id, hi_id)`` arrays of any common shape;
misses are ``(+inf, +inf)``, a ray born inside an open solid can carry
``-inf`` — the downstream nearest-positive-hit fold ignores non-positive
and infinite events naturally.  Semantics match the parity-tested network
engine except exactly at coincident-surface ties (measure-zero; asserted
equal on the component zoo in tests/test_ops/test_fused_trace.py).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "tree_supports_intervals",
    "interval_intersect",
    "interval_difference",
    "eval_tree_intervals",
    "leaf_intervals_from_hits",
]


def tree_supports_intervals(tree) -> bool:
    from pyrayt_tpu.scene.compile import LEAF

    if tree[0] == LEAF:
        return True
    op_name, l_tree, r_tree = tree
    return (
        op_name in ("intersect", "difference")
        and r_tree[0] == LEAF
        and tree_supports_intervals(l_tree)
    )


def interval_intersect(iv, b):
    """[a0,a1] ∩ [b0,b1] with surface ids travelling on each endpoint."""
    a0, a1, i0, i1 = iv
    b0, b1, j0, j1 = b
    lo = jnp.maximum(a0, b0)
    hi = jnp.minimum(a1, b1)
    lo_id = jnp.where(b0 > a0, j0, i0)
    hi_id = jnp.where(b1 < a1, j1, i1)
    empty = lo > hi
    inf = jnp.asarray(jnp.inf, a0.dtype)
    return (jnp.where(empty, inf, lo), jnp.where(empty, inf, hi), lo_id, hi_id)


def interval_difference(iv, b):
    """[a0,a1] − [b0,b1] -> up to two intervals (the general convex case)."""
    a0, a1, i0, i1 = iv
    b0, b1, j0, j1 = b
    inf = jnp.asarray(jnp.inf, a0.dtype)
    # piece 1: [a0, min(a1, b0)] — the part before the subtracted solid
    p1_hi = jnp.minimum(a1, b0)
    p1_hi_id = jnp.where(b0 < a1, j0, i1)
    e1 = a0 > p1_hi
    p1 = (jnp.where(e1, inf, a0), jnp.where(e1, inf, p1_hi), i0, p1_hi_id)
    # piece 2: [max(a0, b1), a1] — the part after it
    p2_lo = jnp.maximum(a0, b1)
    p2_lo_id = jnp.where(b1 > a0, j1, i0)
    e2 = p2_lo > a1
    p2 = (jnp.where(e2, inf, p2_lo), jnp.where(e2, inf, a1), p2_lo_id, i1)
    return [p1, p2]


def eval_tree_intervals(tree, leaf_intervals):
    """Evaluate a supports-intervals CSG tree to a list of id-carrying
    intervals ``(lo, hi, lo_id, hi_id)``."""
    from pyrayt_tpu.scene.compile import LEAF

    if tree[0] == LEAF:
        return [leaf_intervals[tree[1]]]
    op_name, l_tree, r_tree = tree
    left = eval_tree_intervals(l_tree, leaf_intervals)
    b = leaf_intervals[r_tree[1]]
    if op_name == "intersect":
        return [interval_intersect(iv, b) for iv in left]
    out = []
    for iv in left:
        out.extend(interval_difference(iv, b))
    return out


def leaf_intervals_from_hits(sorted_leaf_hits):
    """Attach leaf-slot ids to a list of sorted ``(2, ...)`` hit pairs."""
    out = []
    for slot, hits in enumerate(sorted_leaf_hits):
        ids = jnp.full(hits.shape[1:], slot, jnp.int32)
        out.append((hits[0], hits[1], ids, ids))
    return out
