"""Fused Pallas trace kernel: the whole bounce loop in VMEM.

The XLA engine (pyrayt_tpu/tracer/engine.py) runs the generation loop as a
``lax.scan``/``lax.while_loop`` whose step is many small fused kernels;
every generation's ray state round-trips HBM.  This module compiles the
*entire* trace — every PROPAGATE + INTERACT + RECORD generation — into one
Pallas kernel blocked over the ray axis:

* each grid step loads one ray-state block into VMEM once,
* runs the generation loop on it without touching HBM (scene constants live
  in SMEM; transforms are scalar-broadcast multiply-adds, CSG is the
  comparator-network engine — pure VPU work), with an in-kernel
  ``lax.while_loop`` that exits as soon as every ray in the block is dead,
* and writes only the mandatory outputs: the ``(G, 15, ...)`` record
  block, per-generation living masks, and the final ray state.

TPU layout note: rays are shaped ``(R, 128)`` — sublanes x lanes — not
``(B,)``.  Mosaic lays a 1-D vector out as ``(1, B)``, wasting 7/8 of every
f32 vector register; the 2-D tiling keeps the VPU fully occupied.  The ray
axis is simply reshaped ``n -> (n / 128, 128)`` outside the kernel (row
major, so host-side order is unchanged).

Physics parity with engine._generation_step is asserted in
tests/test_ops/test_fused_trace.py (interpret mode, bit-exact) and the
dispatch from :func:`pyrayt_tpu.tracer.engine.trace_rays` is covered there
too.  On TPU hardware the two compilers (Mosaic vs XLA) could in principle
contract f32 differently at geometric edges; ``bench.py --verify`` measures
the disagreement on the real chip and asserts a 2% bound.  Last measured:
**0.0%** of the 1M-ray condenser trace at atol 1e-4 (after round 3's
full-precision scalarized transforms in the XLA engine — the earlier ~1%
divergence was the engine's bf16-default einsum, not the kernel).

Scope: this kernel is forward-only; reverse mode lives in
ops/fused_grad.py, whose custom_vjp reuses this forward unchanged and
sweeps the generations backward in a second Pallas kernel.  Supported when
every material is packed (absorber / mirror / glass — reference
materials.py has no others; custom Python materials fall back to XLA).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyrayt_tpu import materials as matl
from pyrayt_tpu.config import TraceConfig
from pyrayt_tpu.core import primitives as prim
from pyrayt_tpu.core.operations import (
    _norm_rows,
    _sum_rows,
    affine_inverse,
    reflect,
    refract,
    safe_normalize,
)
from pyrayt_tpu.scene.compile import SceneSpec

__all__ = [
    "supports_fused",
    "supports_fused_wide",
    "build_fused_trace_fn",
    "on_tpu",
    "pick_fused",
    "fused_block_rays",
    "LANE",
]

_PACKED_KINDS = (matl.KIND_ABSORB, matl.KIND_MIRROR, matl.KIND_GLASS)

LANE = 128  # TPU lane width: rays tile as (R, LANE)
_SUBLANE = 8  # f32 sublane granularity
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024  # of ~16 MB/core, leaving compiler slack
_MAX_R = 64  # 8192 rays per block
_ZERO_RECORDS = True  # zero-fill skipped generations' records (see kernel)
# generations per while-loop iteration (tuning knob).  Swept 1/2/3/6 on the
# v5e condenser: 3.47 / 3.56 / 3.36 / 3.96 ms — all within ±5%; unroll
# trades scf.while overhead against lost early-exit granularity and the
# optimum is scene-specific, so the default stays 1 (see design notes).
_LOOP_UNROLL = 1


def on_tpu() -> bool:
    """True when JAX's default device is a TPU (incl. the axon relay)."""
    dev = jax.devices()[0]
    return "tpu" in dev.platform.lower() or "TPU" in getattr(dev, "device_kind", "")


# the kernel unrolls the scene per leaf; past this count the generated
# Mosaic program (and its compile time) stops paying for itself.  Wider
# scenes whose trees batch into same-SHAPE groups run the WIDE kernel
# variant below — an in-VMEM fori_loop over the tree axis; since round 5
# groups batch by CSG shape alone (materials / normal scales / ids are
# runtime meta-table data), so heterogeneous assemblies qualify too.
# Only wide scenes with no >= 8 same-shape trees (genuinely irregular
# template mixes) fall back to the XLA engine's batched path
# (tracer/engine.py)
_FUSED_MAX_LEAVES = 32
# wide-kernel leaf cap: scene tables (transforms 16 + prim params + ids)
# live in SMEM as scalars; this bounds their footprint (~176 B/leaf)
_FUSED_WIDE_MAX_LEAVES = 4096
# the MONOLITHIC wide backward kernel's cap: its per-generation vjp
# program crashes the Mosaic compile helper past ~300 leaves on this
# toolchain (silent subprocess death, no diagnostic; 12x12 MLA = 289
# leaves compiles and runs, 16x16 = 513 does not — reproduced with
# single-copy dynamic chunk sweeps AND with chunking disabled entirely,
# so the trigger is the scene-table scale itself, not the loop
# structure).  Past this cap gradients switch to the STAGED wide
# backward (ops/fused_grad._run_bwd_staged): per-generation XLA tail
# vjps + per-chunk Pallas tree sweeps whose scene tables are each
# bounded by fused_grad._STAGED_CHUNK_LEAVES, so no single Mosaic
# program ever sees the full table.  The staged path covers scenes up
# to _FUSED_WIDE_MAX_LEAVES.
_FUSED_WIDE_GRAD_MAX_LEAVES = 300


def supports_fused(spec: SceneSpec) -> bool:
    """The (unrolled) fused kernel covers every reference material; custom
    Python TracableMaterials (arbitrary host code) fall back to the XLA
    engine, and scenes past ``_FUSED_MAX_LEAVES`` leaves dispatch to the
    wide kernel variant (:func:`supports_fused_wide`) instead."""
    return (
        0 < spec.n_leaves <= _FUSED_MAX_LEAVES
        and all(spec.mat_packed)
        and all(k in _PACKED_KINDS for k in spec.mat_kinds)
    )


def supports_fused_wide(spec: SceneSpec) -> bool:
    """True when the WIDE fused kernel covers the scene: packed materials,
    leaf count past the unrolled kernel's cap, the engine's wide plan finds
    at least one batchable same-shape tree group, and whatever is NOT
    grouped (odd singles like the detector baffle) is small enough to
    unroll.  Gradients default to the STAGED wide backward at any size
    (ops/fused_grad._run_bwd_staged); the monolithic wide backward kernel
    remains available below its compile cap via
    ``TraceConfig(wide_grad="fused")``."""
    from pyrayt_tpu.tracer.engine import _tree_slots, _wide_plan

    if not (
        _FUSED_MAX_LEAVES < spec.n_leaves <= _FUSED_WIDE_MAX_LEAVES
        and all(spec.mat_packed)
        and all(k in _PACKED_KINDS for k in spec.mat_kinds)
    ):
        return False
    order, groups = _wide_plan(spec)
    if not groups:
        return False
    single_leaves = sum(
        len(_tree_slots(spec.trees[idx]))
        for kind, idx in order
        if kind == "single"
    )
    return single_leaves <= _FUSED_MAX_LEAVES


def pick_fused(
    spec: SceneSpec,
    config: TraceConfig,
    itemsize: int = 4,
    need_grad: bool = False,
) -> bool:
    """THE fused-vs-XLA dispatch rule, shared by every entry point
    (engine.trace_rays, analysis.build_objective, parallel trace/train).

    Returns True when the fused kernel(s) should run: the scene's materials
    are all packed, the VMEM budgets fit at this ray ``itemsize`` (forward
    kernel, plus the backward kernel when ``need_grad``), and either
    ``config.use_fused`` forces it or the auto rule (None) finds a TPU.
    Raises ValueError when ``use_fused=True`` demands an infeasible setup.
    """
    use = config.use_fused
    narrow = supports_fused(spec)
    feasible = (
        narrow or supports_fused_wide(spec)
    ) and fused_block_rays(config, itemsize, wide=not narrow) is not None
    if need_grad:
        from pyrayt_tpu.ops.fused_grad import bwd_block_rays

        # wide gradients past the monolithic kernel's leaf cap run the
        # STAGED backward (chunked scene tables), so any supports_fused_wide
        # scene is differentiable on the fused path
        feasible = (
            feasible
            and bwd_block_rays(config, itemsize, wide=not narrow) is not None
        )
    if use is True and not feasible:
        raise ValueError(
            "use_fused=True, but the scene has non-packed materials or the "
            "generation_limit exceeds the fused kernels' VMEM budget"
        )
    return use is True or (use is None and feasible and on_tpu())


def pow2_floor(r: int) -> int:
    """Largest power of two <= r.  Block-row counts are clamped to powers
    of two: the round-4 backward sweep measured non-pow2 blocks (24/40/48
    rows) at ~2x the step time of pow2 ones (16/32/64) — alignment and
    zero-padding of the 2^k-ray batch dominate block-size sensitivity
    (docs/design_notes.md)."""
    return 1 << (int(r).bit_length() - 1)


def fused_block_rays(config: TraceConfig, itemsize: int = 4, wide: bool = False,
                     save_fold: bool = False):
    """Rays per block — the largest power-of-two (R x 128) tile whose VMEM
    working set fits the budget — or ``None`` when even the minimum tile
    overflows (huge generation_limit): callers must fall back to the XLA
    engine.

    Per-ray bytes: in/out state (2 x 13 rows), records (G x 15), masks (G),
    all double-buffered by the pipeline (x2), plus ~60 rows of loop-carry
    and temporaries (the wide kernel's tree-axis fold carries ~40 more).
    ``save_fold`` (the staged wide backward's forward pass) adds the
    per-generation fold outputs: 5 f32 rows + 1 int32 row per generation,
    double-buffered."""
    g = config.generation_limit
    per_ray = itemsize * (
        2 * (26 + 16 * g) + 60 + (40 if wide else 0)
        + (2 * 6 * g if save_fold else 0)
    )
    r = _VMEM_BUDGET_BYTES // (per_ray * LANE)
    r = min(_MAX_R, (r // _SUBLANE) * _SUBLANE)
    if r < _SUBLANE:
        return None
    return pow2_floor(r)


# ---------------------------------------------------------------------------
# scalarized helpers (SMEM scalar reads -> broadcast VPU math; no tiny
# matmuls, no gathers)
# ---------------------------------------------------------------------------


def _mat_rows(ref, s):
    """A 4x4 transform as nested scalars from a flattened (S, 16) SMEM ref."""
    return [[ref[s, 4 * i + j] for j in range(4)] for i in range(4)]


def _apply_affine_point(m_rows, x3):
    """Affine transform of xyz point rows (w = 1 implicit; the builders only
    ever produce affine transforms — last row (0,0,0,1))."""
    return [
        m_rows[i][0] * x3[0] + m_rows[i][1] * x3[1] + m_rows[i][2] * x3[2] + m_rows[i][3]
        for i in range(3)
    ]


def _apply_linear_vec(m_rows, x3):
    """Linear part only (w = 0: directions and normals ignore translation)."""
    return [
        m_rows[i][0] * x3[0] + m_rows[i][1] * x3[1] + m_rows[i][2] * x3[2]
        for i in range(3)
    ]


def _apply_linear_transpose(m_rows, x3):
    """y_i = sum_j M[j][i] * x[j] (the normals' inverse-transpose path)."""
    return [
        m_rows[0][i] * x3[0] + m_rows[1][i] * x3[1] + m_rows[2][i] * x3[2]
        for i in range(3)
    ]


def _leaf_intersect_scalar(type_code, local_rays, pr, s):
    """prim.leaf_intersect with packed params read as SMEM scalars."""
    if type_code == prim.SPHERE:
        return prim.sphere_intersect(local_rays, pr[s, 0])
    if type_code == prim.PARABOLOID:
        return prim.paraboloid_intersect(local_rays, pr[s, 0], pr[s, 1])
    if type_code == prim.PLANE:
        return prim.plane_intersect(local_rays, pr[s, 0], pr[s, 1])
    if type_code == prim.CUBE:
        spans = jnp.stack(
            [jnp.stack([pr[s, 2 * a], pr[s, 2 * a + 1]]) for a in range(3)]
        )
        return prim.cube_intersect(local_rays, spans)
    if type_code == prim.CYLINDER:
        return prim.cylinder_intersect(local_rays, pr[s, 0], pr[s, 1], pr[s, 2])
    raise ValueError(f"unknown primitive type code {type_code}")


def _leaf_normal_scalar(type_code, points, pr, s):
    if type_code == prim.SPHERE:
        return prim.sphere_normal(points, pr[s, 0])
    if type_code == prim.PARABOLOID:
        return prim.paraboloid_normal(points, pr[s, 0], pr[s, 1])
    if type_code == prim.PLANE:
        return prim.plane_normal(points, pr[s, 0], pr[s, 1])
    if type_code == prim.CUBE:
        spans = jnp.stack(
            [jnp.stack([pr[s, 2 * a], pr[s, 2 * a + 1]]) for a in range(3)]
        )
        return prim.cube_normal(points, spans)
    if type_code == prim.CYLINDER:
        return prim.cylinder_normal(points, pr[s, 0], pr[s, 1], pr[s, 2], pr[s, 3])
    raise ValueError(f"unknown primitive type code {type_code}")


def _index_from_scalars(gr, slot, wavelength):
    """matl.index_from_coeffs on a [A, b1..b3, c1..c3] row of SMEM scalars.

    The Sellmeier denominator is guarded at its pole (wl^2 == c): no real
    trace evaluates there, but the backward kernel's state reconstruction
    feeds zero-filled dead rows (wavelength 0) through this function, and
    with c = 0 glasses (constant-index rows) an unguarded 0/0 would emit
    NaNs that survive multiplication by the rows' zero cotangents and
    poison the summed glass-parameter gradient.
    """
    wl2 = wavelength * wavelength
    n2 = gr[slot, 0]
    for i in range(3):
        d = wl2 - gr[slot, 4 + i]
        d = jnp.where(d == 0, 1.0, d)
        n2 = n2 + gr[slot, 1 + i] * wl2 / d
    return jnp.sqrt(n2)


# unnormalized object-space normals shared with the engine's wide-scene
# gather path (the [s, i] access pattern works for SMEM refs and for
# per-ray column views alike)
_leaf_normal_raw3 = prim.leaf_normal_raw3


# interval CSG lives in core.intervals (shared with the XLA engine);
# re-exported here for the kernel and its tests
from pyrayt_tpu.core.intervals import (  # noqa: E402  (grouped with kin)
    eval_tree_intervals as _eval_tree_intervals,
    leaf_intervals_from_hits,
    tree_supports_intervals,
)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _make_step(spec: SceneSpec, config: TraceConfig):
    """The generation step over in-VMEM ray tiles, shared by the forward
    kernel (below) and the reverse-mode kernel (ops/fused_grad.py).

    ``objtx_ref`` / ``prim_ref`` / ``glass_ref`` only need ``obj[s, i]``
    scalar indexing — SMEM refs in the forward kernel, nested traced-scalar
    tables (differentiable) in the backward kernel.
    """
    # local import: engine <-> fused_trace is one-way at runtime (engine's
    # trace_rays dispatches here); _eval_tree is pure jnp shared logic used
    # by the general (non-interval) CSG fallback
    from pyrayt_tpu.tracer.engine import _eval_tree

    # leaves whose material never reads a normal (absorber zeroes the
    # direction unconditionally) skip the whole normal pipeline
    needs_normal = tuple(
        spec.mat_kinds[slot] != matl.KIND_ABSORB for slot in spec.leaf_mat_slot
    )
    fast_tree = tuple(tree_supports_intervals(t) for t in spec.trees)

    def step(objtx_ref, prim_ref, glass_ref, carry):
        """One generation on in-VMEM (R, 128) ray tiles
        (parity: engine._generation_step).

        Layout choices, all perf-motivated and output-preserving:
        * positions/directions travel as xyz rows — the homogeneous w rows
          are compile-time constants (1/0) and would cost real FMAs, since
          transform entries are runtime SMEM scalars;
        * ``alive`` travels as the float dtype — Mosaic cannot carry i1
          vectors through scf.while;
        * normals come from the already-transformed local rays
          (local_hit = lo + t * ld; hit params are transform-invariant
          because directions are not renormalized, same invariant the
          reference relies on at world_objects.py:360-383).
        """
        p3, v3, gen, inten, wav, ridx, rid, alive_f = carry
        alive = alive_f > 0.5
        dtype = p3.dtype
        shape = p3.shape[1:]
        mats = [_mat_rows(objtx_ref, s) for s in range(spec.n_leaves)]
        p_rows = [p3[0], p3[1], p3[2]]
        v_rows = [v3[0], v3[1], v3[2]]

        # PROPAGATE: per-leaf object-space rays -> one interval per leaf
        local_o = []
        local_d = []
        leaf_hits = []
        for s, t in enumerate(spec.leaf_types):
            lo3 = _apply_affine_point(mats[s], p_rows)
            ld3 = _apply_linear_vec(mats[s], v_rows)
            local_o.append(lo3)
            local_d.append(ld3)
            local = jnp.stack((jnp.stack(lo3), jnp.stack(ld3)))
            pair = _leaf_intersect_scalar(t, local, prim_ref, s)
            leaf_hits.append(
                jnp.stack((jnp.minimum(pair[0], pair[1]), jnp.maximum(pair[0], pair[1])))
            )

        # CSG + nearest positive hit
        hit_distances = jnp.full(shape, jnp.inf, dtype)
        hit_leaf = jnp.full(shape, -1, dtype=jnp.int32)

        def fold(cand, ids):
            nonlocal hit_distances, hit_leaf
            cand = jnp.where(cand > 0, cand, jnp.inf)
            new_min = cand < hit_distances
            hit_distances = jnp.where(new_min, cand, hit_distances)
            hit_leaf = jnp.where(new_min, ids, hit_leaf)

        leaf_intervals = leaf_intervals_from_hits(leaf_hits)
        for tree, fast in zip(spec.trees, fast_tree):
            if fast:
                for lo, hi, lo_id, hi_id in _eval_tree_intervals(tree, leaf_intervals):
                    fold(lo, lo_id)
                    fold(hi, hi_id)
            else:
                shape_hits, shape_ids = _eval_tree(tree, leaf_hits)
                for row in range(shape_hits.shape[0]):
                    fold(shape_hits[row], shape_ids[row])
        no_hit = hit_leaf < 0

        # advance to hit point
        t_safe = jnp.where(no_hit, 0.0, hit_distances)
        p_hit = p3 + t_safe * v3

        # world normals of the hit leaf from the local rays (gather-free
        # masked accumulation; absorber-only leaves skipped)
        normals = jnp.zeros_like(p_hit)
        for s, t in enumerate(spec.leaf_types):
            if not needs_normal[s]:
                continue
            local_hit = [o + t_safe * d for o, d in zip(local_o[s], local_d[s])]
            ln3 = _leaf_normal_raw3(t, local_hit, prim_ref, s)
            wn3 = _apply_linear_transpose(mats[s], ln3)
            wn = jnp.stack(wn3)
            sq = _sum_rows(wn * wn)
            zero = sq == 0
            wn = jnp.where(zero, wn, wn / jnp.sqrt(jnp.where(zero, 1.0, sq)))
            wn = wn * spec.leaf_normal_scale[s]
            normals = jnp.where(hit_leaf == s, wn, normals)

        # INTERACT: leaf -> material slot, masked branchless physics
        ray_slot = jnp.zeros_like(hit_leaf)
        for s, slot in enumerate(spec.leaf_mat_slot):
            ray_slot = jnp.where(hit_leaf == s, slot, ray_slot)

        new_dir = jnp.where(no_hit, 0.0, v3)
        new_index = ridx
        new_inten = inten
        for slot, kind in enumerate(spec.mat_kinds):
            mask = (ray_slot == slot) & ~no_hit
            if kind == matl.KIND_ABSORB:
                d2, i2, t2 = jnp.zeros_like(v3), ridx, inten
            elif kind == matl.KIND_MIRROR:
                d2, i2, t2 = reflect(v3, normals), ridx, inten
            else:  # KIND_GLASS
                n2 = _index_from_scalars(glass_ref, slot, wav)
                d2, i2 = refract(
                    v3, normals, ridx, n2, n_global=config.world_index
                )
                t2 = inten
            new_dir = jnp.where(mask, d2, new_dir)
            new_index = jnp.where(mask, i2, new_index)
            new_inten = jnp.where(mask, t2, new_inten)

        # death rules (Q1: intensity test opt-in, as in the XLA engine)
        absorbed = jnp.isclose(_norm_rows(v3), 0)
        dead = absorbed | no_hit
        if config.apply_intensity_threshold:
            dead = dead | (inten < config.intensity_threshold)
        living = alive & ~dead

        # RECORD block (parity: _RayTraceDataframe.insert, _pyrayt.py:168-186)
        public_id = jnp.zeros(shape, dtype)
        for s, leaf_id in enumerate(spec.leaf_ids):
            public_id = jnp.where(hit_leaf == s, jnp.asarray(leaf_id, dtype), public_id)
        tilt = safe_normalize(v3, axis=0)
        record = jnp.concatenate(
            (
                gen[None], inten[None], wav[None], ridx[None], rid[None],
                public_id[None],
                p3, p_hit, tilt,
            )
        )

        new_p = jnp.where(living, p_hit + config.ray_offset * new_dir, p_hit)
        new_gen = jnp.where(living, gen + 1, gen)
        # rays absorbed *this* generation (new_dir == 0) can never record
        # again — dropping them from the carry now lets the while_loop exit
        # one generation earlier with identical outputs (the skipped pass
        # would only have re-derived dead = True for them)
        will_die = _sum_rows(new_dir * new_dir) == 0
        living_f = (living & ~will_die).astype(dtype)
        mask_f = living.astype(dtype)
        return (
            (new_p, new_dir, new_gen, new_inten, wav, new_index, rid, living_f),
            record,
            mask_f,
        )

    return step


# ---------------------------------------------------------------------------
# the WIDE step: in-VMEM tree-axis loop for lens/microlens arrays
# ---------------------------------------------------------------------------


# trees per predicated chunk of a wide group (the supercell size): each
# chunk gets one conservative AABB; a block whose rays all miss it skips
# the chunk's whole tree loop.  Groups smaller than 2 chunks stay
# unchunked (the test would cost as much as it saves).  Swept on the v5e
# 16x16 MLA: C in {4, 8, 16, 32} -> 29.9 / 23.3 / 22.4 / 25.7 ms/trace;
# 16 balances skip granularity against per-chunk test + branch overhead.
_WIDE_CHUNK_TREES = 16


def _wide_tables(spec: SceneSpec):
    """Static plan for the wide kernel: ``(order, groups, offsets,
    slots_flat, chunk_offsets, n_chunks)`` — the engine's wide plan plus
    each group's slot matrix flattened row-major into one int32 vector
    (``offsets[g]`` is group g's start), so the kernel addresses leaf
    ``j`` of tree ``t`` as ``slots_ref[offsets[g] + t * L + j]``.
    ``chunk_offsets[g]`` indexes group g's rows of the runtime chunk-AABB
    table (``n_chunks[g]`` of them; 0 = group runs unchunked)."""
    import numpy as np

    from pyrayt_tpu.tracer.engine import _wide_plan

    order, groups = _wide_plan(spec)
    offsets = []
    flat = []
    chunk_offsets = []
    n_chunks = []
    total_chunks = 0
    for template, types_pos, slot_matrix in groups:
        offsets.append(len(flat))
        for row in slot_matrix:
            flat.extend(row)
        T = len(slot_matrix)
        nc = -(-T // _WIDE_CHUNK_TREES) if T >= 2 * _WIDE_CHUNK_TREES else 0
        chunk_offsets.append(total_chunks)
        n_chunks.append(nc)
        total_chunks += nc
    slots_flat = np.asarray(flat if flat else [0], np.int32)
    return (
        order, groups, tuple(offsets), slots_flat,
        tuple(chunk_offsets), tuple(n_chunks),
    )


def _leaf_world_aabb(type_code, pr, world):
    """Conservative world-space AABB of a (T,)-batch of one leaf position:
    ``pr`` (T, P) primitive params, ``world`` (T, 4, 4) local->world
    transforms.  Returns ``(mins (T, 3), maxs (T, 3))``.

    Local boxes per type (see core/primitives.py conventions); the world
    box is the standard center/halfwidth transform  c' = A c + t,
    h' = |A| h.  Only used to SKIP work (never to produce hits), so any
    over-estimate is safe and bf16 matmul concerns do not apply.
    """
    T = pr.shape[0]
    dtype = pr.dtype
    zeros = jnp.zeros((T,), dtype)
    if type_code == prim.SPHERE:
        r = jnp.abs(pr[:, 0])
        c = jnp.stack([zeros, zeros, zeros], axis=1)
        h = jnp.stack([r, r, r], axis=1)
    elif type_code == prim.PARABOLOID:
        f, height = pr[:, 0], pr[:, 1]
        r = 2.0 * jnp.sqrt(jnp.abs(f * height))
        lo_z = jnp.minimum(zeros, height)
        hi_z = jnp.maximum(zeros, height)
        c = jnp.stack([zeros, zeros, (lo_z + hi_z) / 2], axis=1)
        h = jnp.stack([r, r, (hi_z - lo_z) / 2], axis=1)
    elif type_code == prim.PLANE:
        w, l = jnp.abs(pr[:, 0]), jnp.abs(pr[:, 1])
        c = jnp.stack([zeros, zeros, zeros], axis=1)
        h = jnp.stack([w / 2, l / 2, zeros], axis=1)
    elif type_code == prim.CUBE:
        lo = jnp.stack([pr[:, 0], pr[:, 2], pr[:, 4]], axis=1)
        hi = jnp.stack([pr[:, 1], pr[:, 3], pr[:, 5]], axis=1)
        c = (lo + hi) / 2
        h = (hi - lo) / 2
    elif type_code == prim.CYLINDER:
        r = jnp.abs(pr[:, 0])
        h_min, h_max = pr[:, 1], pr[:, 2]
        c = jnp.stack([zeros, zeros, (h_min + h_max) / 2], axis=1)
        h = jnp.stack([r, r, (h_max - h_min) / 2], axis=1)
    else:  # pragma: no cover - compile_scene only emits the five types
        raise ValueError(f"unknown primitive type code {type_code}")
    A = world[:, :3, :3]
    t = world[:, :3, 3]
    wc = jnp.einsum("tij,tj->ti", A, c) + t
    wh = jnp.einsum("tij,tj->ti", jnp.abs(A), h)
    return wc - wh, wc + wh


def _wide_runtime_tables(spec: SceneSpec, params, dtype):
    """Call-time (traced) wide-kernel tables: the spatially-sorted flat
    slot vector and the per-chunk AABB table ``(total_chunks, 6)`` as
    ``[lo_x, lo_y, lo_z, hi_x, hi_y, hi_z]`` rows.

    Per group: each tree's AABB is the union of its leaves' conservative
    world boxes; trees sort along the axis of largest center spread so
    consecutive chunks are spatially compact; chunk boxes are segment
    min/maxes over the sorted order.  All geometry-dependent data is
    runtime — the kernel's structure (chunk counts, loop bounds) is
    static, so parameter changes never recompile.

    Tie-break note: the fold visits trees in sorted order, so exact
    cross-tree distance ties (measure zero) may resolve differently from
    the index-ordered XLA wide path.
    """
    import numpy as np

    order, groups, offsets, slots_flat, chunk_offsets, n_chunks = _wide_tables(spec)
    world = params["world"]
    prims = params["prim"]

    slots_out = jnp.asarray(slots_flat, jnp.int32)
    total_chunks = sum(n_chunks)
    if total_chunks == 0:
        return slots_out, jnp.zeros((1, 6), dtype)

    aabb_rows = jnp.zeros((total_chunks, 6), dtype)
    C = _WIDE_CHUNK_TREES
    for gi, (template, types_pos, slot_matrix) in enumerate(groups):
        if n_chunks[gi] == 0:
            continue
        T, L = len(slot_matrix), len(types_pos)
        slots_np = np.asarray(slot_matrix, np.int64)  # (T, L) static
        mins = jnp.full((T, 3), jnp.inf, dtype)
        maxs = jnp.full((T, 3), -jnp.inf, dtype)
        for j in range(L):
            sj = slots_np[:, j]
            lo, hi = _leaf_world_aabb(
                types_pos[j], prims[sj].astype(dtype), world[sj].astype(dtype)
            )
            mins = jnp.minimum(mins, lo)
            maxs = jnp.maximum(maxs, hi)
        centers = (mins + maxs) / 2
        spread = jnp.max(centers, axis=0) - jnp.min(centers, axis=0)
        axis = jnp.argmax(spread)
        key = jnp.take_along_axis(
            centers, jnp.full((T, 1), axis, jnp.int32), axis=1
        )[:, 0]
        perm = jnp.argsort(key)

        # permuted flat slots for this group
        sorted_slots = jnp.asarray(slots_np, jnp.int32)[perm].reshape(T * L)
        off = offsets[gi]
        slots_out = lax.dynamic_update_slice(slots_out, sorted_slots, (off,))

        # chunk AABBs over the sorted order (pad the ragged tail with
        # empty boxes: +inf/-inf never expand a union)
        nc = n_chunks[gi]
        pad = nc * C - T
        s_min = jnp.concatenate(
            (mins[perm], jnp.full((pad, 3), jnp.inf, dtype))
        ).reshape(nc, C, 3)
        s_max = jnp.concatenate(
            (maxs[perm], jnp.full((pad, 3), -jnp.inf, dtype))
        ).reshape(nc, C, 3)
        rows = jnp.concatenate(
            (jnp.min(s_min, axis=1), jnp.max(s_max, axis=1)), axis=1
        )
        aabb_rows = lax.dynamic_update_slice(
            aabb_rows, rows, (chunk_offsets[gi], 0)
        )
    return slots_out, aabb_rows


class _Row1:
    """``view[_, i] -> i-th scalar`` over one row of traced scalars, so the
    scalarized primitive helpers read per-tree values the same way they
    read SMEM refs."""

    def __init__(self, vals):
        self._vals = vals

    def __getitem__(self, idx):
        return self._vals[idx[1]]


def _wide_needs_normal(spec: SceneSpec, slot: int) -> bool:
    return spec.mat_kinds[spec.leaf_mat_slot[slot]] != matl.KIND_ABSORB


def _leaf_meta_table(spec: SceneSpec):
    """Static (S, 3) per-slot [public id, material slot, normal scale] —
    the wide kernels' SMEM meta table.  Values ride as floats (all exactly
    representable); being PER SLOT rather than per group position is what
    lets shape-only groups mix materials and orientations."""
    import numpy as np

    return np.stack(
        [
            np.asarray(spec.leaf_ids, np.float64),
            np.asarray(spec.leaf_mat_slot, np.float64),
            np.asarray(spec.leaf_normal_scale, np.float64),
        ],
        axis=1,
    )


def _wide_tree_eval(
    template, fast, types_pos, scale_pos, needs_pos,
    mats_j, prim_rows_j, p_rows, v_rows,
):
    """PURE per-tree nearest-hit eval -> ``((d_t, n3_t), pos_t)``.

    ``template`` is the tree with leaves renumbered to positions 0..L-1
    (engine._tree_template); ``mats_j`` / ``prim_rows_j`` are per-position
    nested lists of traced scalars (read from SMEM by the caller);
    ``p_rows`` / ``v_rows`` are 3-lists of ray rows.  No refs are touched
    here, so the backward kernel can ``jax.vjp`` this function per tree —
    cotangents route through the candidate fold's where-selections and the
    winner's normal chain automatically.

    Returns the nearest positive candidate distance, the winner's world
    normal (payload — computed here because a grouped tree's leaf slot is
    a traced scalar and cannot be re-indexed after the fold), and the
    winning leaf position (aux, non-differentiable).
    """
    from pyrayt_tpu.tracer.engine import _eval_tree

    L = len(types_pos)
    shape = p_rows[0].shape
    dtype = p_rows[0].dtype
    inf = jnp.asarray(jnp.inf, dtype)

    lo3s, ld3s, hits_list = [], [], []
    for j in range(L):
        lo3 = _apply_affine_point(mats_j[j], p_rows)
        ld3 = _apply_linear_vec(mats_j[j], v_rows)
        local = jnp.stack((jnp.stack(lo3), jnp.stack(ld3)))
        pair = _leaf_intersect_scalar(types_pos[j], local, _Row1(prim_rows_j[j]), 0)
        hits = jnp.stack(
            (jnp.minimum(pair[0], pair[1]), jnp.maximum(pair[0], pair[1]))
        )
        lo3s.append(lo3)
        ld3s.append(ld3)
        hits_list.append(hits)

    cands = []
    if fast:
        intervals = [
            (h[0], h[1], jnp.full(shape, j, jnp.int32), jnp.full(shape, j, jnp.int32))
            for j, h in enumerate(hits_list)
        ]
        for lo, hi, lo_id, hi_id in _eval_tree_intervals(template, intervals):
            cands.append((lo, lo_id))
            cands.append((hi, hi_id))
    else:
        shape_hits, shape_ids = _eval_tree(template, hits_list)
        for row in range(shape_hits.shape[0]):
            cands.append((shape_hits[row], shape_ids[row]))

    d_t = jnp.full(shape, jnp.inf, dtype)
    pos_t = jnp.full(shape, -1, jnp.int32)
    for cand, pos in cands:
        cand = jnp.where(cand > 0, cand, inf)
        new_min = cand < d_t
        d_t = jnp.where(new_min, cand, d_t)
        pos_t = jnp.where(new_min, pos, pos_t)

    d_safe = jnp.where(jnp.isinf(d_t), 0.0, d_t)
    n3_t = jnp.zeros((3,) + shape, dtype)
    for j in range(L):
        if not needs_pos[j]:
            continue
        local_hit = [o + d_safe * d for o, d in zip(lo3s[j], ld3s[j])]
        ln3 = _leaf_normal_raw3(types_pos[j], local_hit, _Row1(prim_rows_j[j]), 0)
        wn3 = _apply_linear_transpose(mats_j[j], ln3)
        wn = jnp.stack(wn3)
        sq = _sum_rows(wn * wn)
        zero = sq == 0
        wn = jnp.where(zero, wn, wn / jnp.sqrt(jnp.where(zero, 1.0, sq)))
        n3_t = jnp.where((pos_t == j)[None], wn * scale_pos[j], n3_t)
    return (d_t, n3_t), pos_t


def _block_any_hit(lo3, hi3, p_rows, v_rows):
    """Conservative: does ANY ray of the block intersect the AABB at
    positive t?  Covers every candidate the full fold could produce: real
    hits lie inside a leaf's box, and the degenerate (zero-direction)
    phantom candidates the guarded intersectors can emit only arise with
    the ray origin inside the primitive volume — which the zero-direction
    `inside` branch flags."""
    shape = p_rows[0].shape
    dtype = p_rows[0].dtype
    tmin = jnp.full(shape, -jnp.inf, dtype)
    tmax = jnp.full(shape, jnp.inf, dtype)
    for a in range(3):
        o, d = p_rows[a], v_rows[a]
        zero_d = d == 0
        dsafe = jnp.where(zero_d, 1.0, d)
        t0 = (lo3[a] - o) / dsafe
        t1 = (hi3[a] - o) / dsafe
        a_lo = jnp.minimum(t0, t1)
        a_hi = jnp.maximum(t0, t1)
        ax_in = (o >= lo3[a]) & (o <= hi3[a])
        a_lo = jnp.where(zero_d, jnp.where(ax_in, -jnp.inf, jnp.inf), a_lo)
        a_hi = jnp.where(zero_d, jnp.where(ax_in, jnp.inf, -jnp.inf), a_hi)
        tmin = jnp.maximum(tmin, a_lo)
        tmax = jnp.minimum(tmax, a_hi)
    hit = (tmax >= tmin) & (tmax > 0)
    return jnp.max(hit.astype(dtype)) > 0


def _wide_fold_plan(spec: SceneSpec):
    """Static per-`order`-entry eval info for the wide fold: a list of
    ``("single", tree_index, info)`` / ``("group", group_index, info)``
    where ``info`` carries template, per-position types/scales/needs/mat
    slots, and (singles) static slots / public ids.  Win codes enumerate
    trees in fold order (singles one code, group trees base..base+T-1)."""
    from pyrayt_tpu.tracer.engine import _tree_slots, _tree_template

    order, groups, offsets, _, chunk_offsets, n_chunks = _wide_tables(spec)
    plan = []
    code = 0
    for kind, idx in order:
        if kind == "single":
            tree = spec.trees[idx]
            slots = _tree_slots(tree)
            info = dict(
                template=_tree_template(tree),
                fast=tree_supports_intervals(tree),
                slots=slots,
                types_pos=tuple(spec.leaf_types[s] for s in slots),
                scale_pos=tuple(spec.leaf_normal_scale[s] for s in slots),
                needs_pos=tuple(_wide_needs_normal(spec, s) for s in slots),
                mat_pos=tuple(spec.leaf_mat_slot[s] for s in slots),
                pub_pos=tuple(float(spec.leaf_ids[s]) for s in slots),
                code=code,
            )
            code += 1
        else:
            template, types_pos, slot_matrix = groups[idx]
            info = dict(
                template=template,
                fast=True,
                T=len(slot_matrix),
                L=len(types_pos),
                off=offsets[idx],
                types_pos=types_pos,
                # groups may be HETEROGENEOUS (mixed materials / normal
                # scales — engine._tree_sig groups by shape only): scale,
                # material slot and public id are read per tree from the
                # runtime meta table (meta_ref) in the kernels; the only
                # static per-position property is the conservative
                # needs-normal OR over the group's members
                needs_pos=tuple(
                    any(
                        _wide_needs_normal(spec, row[j])
                        for row in slot_matrix
                    )
                    for j in range(len(types_pos))
                ),
                chunk_off=chunk_offsets[idx],
                n_chunks=n_chunks[idx],
                code_base=code,
            )
            code += len(slot_matrix)
        plan.append((kind, idx, info))
    return plan


def _read_single_tables(objtx_ref, prim_ref, info):
    """Per-position scalar tables of a single tree (static slot indices)."""
    P = prim_ref.shape[1]
    mats_j = [_mat_rows(objtx_ref, s) for s in info["slots"]]
    prim_rows_j = [
        [prim_ref[s, i] for i in range(P)] for s in info["slots"]
    ]
    return mats_j, prim_rows_j


def _read_group_tables(objtx_ref, prim_ref, slots_ref, info, t):
    """Per-position scalar tables of grouped tree ``t`` (traced slots)."""
    P = prim_ref.shape[1]
    L, off = info["L"], info["off"]
    tree_slots = [slots_ref[off + t * L + j] for j in range(L)]
    mats_j = [_mat_rows(objtx_ref, s) for s in tree_slots]
    prim_rows_j = [[prim_ref[s, i] for i in range(P)] for s in tree_slots]
    return mats_j, prim_rows_j, tree_slots


def _make_wide_fold(spec: SceneSpec, config: TraceConfig, want_win: bool = False,
                    dynamic_chunks: bool = False):
    """The wide nearest-hit fold: ``fold(objtx_ref, prim_ref, slots_ref,
    meta_ref, aabb_ref, p_rows, v_rows) -> (best_d, best_n, best_mat,
    best_pub[, win_code])``.

    Ungrouped singles unroll; each same-shape group loops its tree axis
    with a ``lax.fori_loop`` reading that tree's scalars from
    dynamically-indexed SMEM, under the supercell AABB skip.
    ``meta_ref`` is the (S, 3) per-slot [public id, material slot, normal
    scale] table — runtime data, so groups may mix materials and surface
    orientations (heterogeneous zoom assemblies, not just uniform lens
    arrays).  Tie-breaking matches the XLA engine's wide path: strict
    ``<`` in component order / ascending tree index.  ``want_win=True``
    additionally tracks the winning tree's fold code (the backward
    kernel's winner mask).  ``dynamic_chunks=True`` runs the chunk sweep
    as one more fori_loop (traced AABB reads / inner bounds) so the
    program holds a single copy of the tree body — the backward kernel
    needs this to stay within the Mosaic compiler's capacity at hundreds
    of leaves; the forward keeps the unrolled sweep (measured equal
    speed, simpler addressing).
    """
    plan = _wide_fold_plan(spec)

    def fold(objtx_ref, prim_ref, slots_ref, meta_ref, aabb_ref, p_rows, v_rows):
        shape = p_rows[0].shape
        dtype = p_rows[0].dtype

        best = [
            jnp.full(shape, jnp.inf, dtype),      # distance
            jnp.zeros((3,) + shape, dtype),       # world normal
            jnp.zeros(shape, dtype),              # material slot
            jnp.zeros(shape, dtype),              # public surface id
        ]
        if want_win:
            best.append(jnp.full(shape, -1, jnp.int32))  # winning tree code

        def folded(entry, d_t, n3_t, mat_t, pub_t, code):
            d_g = entry[0]
            better = d_t < d_g
            out = [
                jnp.where(better, d_t, d_g),
                jnp.where(better[None], n3_t, entry[1]),
                jnp.where(better, mat_t, entry[2]),
                jnp.where(better, pub_t, entry[3]),
            ]
            if want_win:
                out.append(jnp.where(better, code, entry[4]))
            return out

        for kind, idx, info in plan:
            if kind == "single":
                mats_j, prim_rows_j = _read_single_tables(objtx_ref, prim_ref, info)
                (d_t, n3_t), pos_t = _wide_tree_eval(
                    info["template"], info["fast"], info["types_pos"],
                    info["scale_pos"], info["needs_pos"],
                    mats_j, prim_rows_j, p_rows, v_rows,
                )
                mat_t = jnp.zeros(shape, dtype)
                pub_t = jnp.zeros(shape, dtype)
                for j in range(len(info["slots"])):
                    sel = pos_t == j
                    mat_t = jnp.where(sel, jnp.asarray(info["mat_pos"][j], dtype), mat_t)
                    pub_t = jnp.where(sel, jnp.asarray(info["pub_pos"][j], dtype), pub_t)
                best = folded(best, d_t, n3_t, mat_t, pub_t, info["code"])
                continue

            T, L = info["T"], info["L"]

            def tree_body(t, gcarry, info=info):
                mats_j, prim_rows_j, tree_slots = _read_group_tables(
                    objtx_ref, prim_ref, slots_ref, info, t
                )
                scale_j = [meta_ref[s, 2] for s in tree_slots]
                (d_t, n3_t), pos_t = _wide_tree_eval(
                    info["template"], True, info["types_pos"],
                    scale_j, info["needs_pos"],
                    mats_j, prim_rows_j, p_rows, v_rows,
                )
                mat_t = jnp.zeros(shape, dtype)
                pub_t = jnp.zeros(shape, dtype)
                for j in range(info["L"]):
                    sel = pos_t == j
                    mat_t = jnp.where(sel, meta_ref[tree_slots[j], 1], mat_t)
                    pub_t = jnp.where(sel, meta_ref[tree_slots[j], 0], pub_t)
                # ascending-t strict-< fold: lowest tree index wins ties,
                # matching engine._reduce_tree_axis's argmin
                return folded(
                    gcarry, d_t, n3_t, mat_t, pub_t, info["code_base"] + t
                )

            init = [
                jnp.full(shape, jnp.inf, dtype),
                jnp.zeros((3,) + shape, dtype),
                jnp.zeros(shape, dtype),
                jnp.zeros(shape, dtype),
            ]
            if want_win:
                init.append(jnp.full(shape, -1, jnp.int32))
            carry_g = init
            if info["n_chunks"] == 0:
                carry_g = lax.fori_loop(0, T, tree_body, carry_g)
            else:
                # supercell skip: the group's trees arrive spatially sorted
                # (runtime permutation, _wide_runtime_tables); each chunk
                # of _WIDE_CHUNK_TREES trees has one conservative AABB row
                # in aabb_ref, and a block whose rays all miss it skips the
                # chunk's whole tree loop
                coff = info["chunk_off"]
                C = _WIDE_CHUNK_TREES
                if dynamic_chunks:
                    def chunk_body(c, cr, T=T, coff=coff):
                        lo3 = [aabb_ref[coff + c, k] for k in range(3)]
                        hi3 = [aabb_ref[coff + c, 3 + k] for k in range(3)]
                        start = c * C
                        stop = jnp.minimum(start + C, T)
                        return lax.cond(
                            _block_any_hit(lo3, hi3, p_rows, v_rows),
                            lambda x: lax.fori_loop(start, stop, tree_body, x),
                            lambda x: x,
                            cr,
                        )

                    carry_g = lax.fori_loop(
                        0, info["n_chunks"], chunk_body, carry_g
                    )
                else:
                    for c in range(info["n_chunks"]):
                        lo3 = [aabb_ref[coff + c, k] for k in range(3)]
                        hi3 = [aabb_ref[coff + c, 3 + k] for k in range(3)]
                        start, stop = c * C, min((c + 1) * C, T)
                        carry_g = lax.cond(
                            _block_any_hit(lo3, hi3, p_rows, v_rows),
                            lambda cr, start=start, stop=stop: lax.fori_loop(
                                start, stop, tree_body, cr
                            ),
                            lambda cr: cr,
                            carry_g,
                        )
            best = folded(
                best, carry_g[0], carry_g[1], carry_g[2], carry_g[3],
                carry_g[4] if want_win else 0,
            )

        return tuple(best)

    return fold


def _wide_tail(spec: SceneSpec, config: TraceConfig, glass_view,
               best_d, best_n, best_mat, best_pub, carry):
    """PURE post-fold step tail: INTERACT + death rules + record + carry
    update (parity: the narrow _make_step from its INTERACT block on,
    dispatching on the folded material slot instead of a leaf index).
    ``glass_view`` only needs ``g[slot, i]`` scalar access — an SMEM ref
    in the forward kernel, nested traced scalars (differentiable) in the
    backward.  Differentiable in (best_d, best_n, glass, carry floats);
    best_mat / best_pub gate masks only."""
    p3, v3, gen, inten, wav, ridx, rid, alive_f = carry
    alive = alive_f > 0.5
    dtype = p3.dtype

    no_hit = jnp.isinf(best_d)
    t_safe = jnp.where(no_hit, 0.0, best_d)
    p_hit = p3 + t_safe * v3
    normals = best_n

    new_dir = jnp.where(no_hit, 0.0, v3)
    new_index = ridx
    new_inten = inten
    for slot, kind in enumerate(spec.mat_kinds):
        mask = (best_mat == slot) & ~no_hit
        if kind == matl.KIND_ABSORB:
            d2, i2, t2 = jnp.zeros_like(v3), ridx, inten
        elif kind == matl.KIND_MIRROR:
            d2, i2, t2 = reflect(v3, normals), ridx, inten
        else:  # KIND_GLASS
            n2 = _index_from_scalars(glass_view, slot, wav)
            d2, i2 = refract(v3, normals, ridx, n2, n_global=config.world_index)
            t2 = inten
        new_dir = jnp.where(mask, d2, new_dir)
        new_index = jnp.where(mask, i2, new_index)
        new_inten = jnp.where(mask, t2, new_inten)

    absorbed = jnp.isclose(_norm_rows(v3), 0)
    dead = absorbed | no_hit
    if config.apply_intensity_threshold:
        dead = dead | (inten < config.intensity_threshold)
    living = alive & ~dead

    public_id = best_pub  # folded payload; 0 where no hit
    tilt = safe_normalize(v3, axis=0)
    record = jnp.concatenate(
        (
            gen[None], inten[None], wav[None], ridx[None], rid[None],
            public_id[None],
            p3, p_hit, tilt,
        )
    )

    new_p = jnp.where(living, p_hit + config.ray_offset * new_dir, p_hit)
    new_gen = jnp.where(living, gen + 1, gen)
    will_die = _sum_rows(new_dir * new_dir) == 0
    living_f = (living & ~will_die).astype(dtype)
    mask_f = living.astype(dtype)
    return (
        (new_p, new_dir, new_gen, new_inten, wav, new_index, rid, living_f),
        record,
        mask_f,
    )


def _make_step_wide(spec: SceneSpec, config: TraceConfig, save_fold: bool = False):
    """The generation step for wide scenes (supports_fused_wide): same
    carry/record contract as :func:`_make_step`, composed as
    ``_wide_tail  ∘  _make_wide_fold`` — the nearest-hit search runs per
    *tree* (singles unrolled, groups as an in-VMEM fori_loop over
    dynamically-indexed SMEM scalars under the supercell AABB skip), and
    the fold carries the winner's payload (normal, material slot, public
    id) computed at candidate time, since a grouped tree's leaf slot is a
    traced scalar that cannot be re-indexed after the fold.  Compile size
    is O(groups + single leaves), not O(total leaves).

    Reverse mode lives in ops/fused_grad.py's WIDE backward, which
    differentiates the same two pieces (jax.vjp of _wide_tail, then a
    winner-masked per-tree vjp of _wide_tree_eval).  ``save_fold`` (the
    STAGED wide backward's forward pass) additionally returns the fold
    outputs the backward needs — ``(fold5, win)`` with fold5 =
    [best_d, n_x, n_y, n_z, best_mat] rows and win the winning tree's
    fold code — so the backward never recomputes the nearest-hit search.
    """
    fold = _make_wide_fold(spec, config, want_win=save_fold)

    def step(objtx_ref, prim_ref, glass_ref, slots_ref, meta_ref, aabb_ref, carry):
        p3, v3 = carry[0], carry[1]
        p_rows = [p3[0], p3[1], p3[2]]
        v_rows = [v3[0], v3[1], v3[2]]
        outs = fold(
            objtx_ref, prim_ref, slots_ref, meta_ref, aabb_ref, p_rows, v_rows
        )
        best_d, best_n, best_mat, best_pub = outs[:4]
        tail = _wide_tail(
            spec, config, glass_ref, best_d, best_n, best_mat, best_pub, carry
        )
        if not save_fold:
            return tail
        new_carry, record, mask_f = tail
        fold5 = jnp.concatenate(
            (best_d[None], best_n, best_mat[None])
        )
        return new_carry, record, mask_f, fold5, outs[4]

    return step


def _make_kernel(
    spec: SceneSpec, config: TraceConfig, generations: int,
    static_loop=False, wide: bool = False, save_fold: bool = False,
):
    """``static_loop`` selects the generation-loop driver:

    * False — ``lax.while_loop`` with early exit (production default);
    * True — fully static unroll, every generation runs unconditionally;
    * "predicated" — static unroll where each generation's body sits under
      ``pl.when(any ray alive)`` with the carry in a VMEM scratch ref:
      static record stores + scf.if-skipped dead generations, trading the
      measured scf.while carry/branch overhead (~0.58 ms/generation on the
      v5e condenser) for one branch per generation.  Experimental (round-4
      item #8); measured in docs/design_notes.md.

    ``wide`` swaps in the tree-axis-looping step (_make_step_wide): the
    kernel takes two extra SMEM refs (flattened group slot matrices +
    per-slot public ids) threaded through to the step; only the production
    while_loop driver is supported.
    """
    if wide:
        assert static_loop is False, "wide kernel: while_loop driver only"
        wide_step = _make_step_wide(spec, config, save_fold=save_fold)

        # the production while-loop driver (below) reads scene data only
        # through ``step(objtx_ref, prim_ref, glass_ref, carry)``; the wide
        # kernel closes the three extra SMEM refs into that signature
        if save_fold:
            def kernel(state_ref, objtx_ref, prim_ref, glass_ref,
                       slots_ref, meta_ref, aabb_ref,
                       rec_ref, mask_ref, fstate_ref, fold_ref, win_ref):
                def step(o_ref, p_ref, g_ref, carry):
                    return wide_step(
                        o_ref, p_ref, g_ref, slots_ref, meta_ref, aabb_ref, carry
                    )

                _run_while_kernel(
                    step, generations,
                    state_ref, objtx_ref, prim_ref, glass_ref,
                    rec_ref, mask_ref, fstate_ref,
                    fold_ref=fold_ref, win_ref=win_ref,
                )

            return kernel

        def kernel(state_ref, objtx_ref, prim_ref, glass_ref,
                   slots_ref, meta_ref, aabb_ref, rec_ref, mask_ref, fstate_ref):
            def step(o_ref, p_ref, g_ref, carry):
                return wide_step(
                    o_ref, p_ref, g_ref, slots_ref, meta_ref, aabb_ref, carry
                )

            _run_while_kernel(
                step, generations,
                state_ref, objtx_ref, prim_ref, glass_ref,
                rec_ref, mask_ref, fstate_ref,
            )

        return kernel
    assert not save_fold, "save_fold is a wide-kernel (staged backward) mode"

    step = _make_step(spec, config)

    if static_loop == "predicated":
        def kernel(state_ref, objtx_ref, prim_ref, glass_ref,
                   rec_ref, mask_ref, fstate_ref, carry_ref):
            state = state_ref[:]
            dtype = state.dtype
            if _ZERO_RECORDS:
                rec_ref[:] = jnp.zeros_like(rec_ref)
            mask_ref[:] = jnp.zeros_like(mask_ref)
            carry_ref[:] = jnp.concatenate(
                (
                    state[0:3], state[4:7],
                    state[8][None], state[9][None], state[10][None],
                    state[11][None], state[12][None],
                    jnp.ones_like(state[8])[None],  # alive
                )
            )
            for g in range(generations):
                alive_any = jnp.max(carry_ref[11]) > 0.5  # alive row

                @pl.when(alive_any)
                def _(g=g):
                    c = carry_ref[:]
                    carry = (c[0:3], c[3:6], c[6], c[7], c[8], c[9], c[10], c[11])
                    new_carry, record, mask_f = step(
                        objtx_ref, prim_ref, glass_ref, carry
                    )
                    rec_ref[g] = record          # static store
                    mask_ref[g] = mask_f
                    p3, v3, gen, inten, wav, ridx, rid, living_f = new_carry
                    carry_ref[:] = jnp.concatenate(
                        (
                            p3, v3, gen[None], inten[None], wav[None],
                            ridx[None], rid[None], living_f[None],
                        )
                    )
            c = carry_ref[:]
            ones = jnp.ones_like(c[6])
            zeros = jnp.zeros_like(c[6])
            fstate_ref[:] = jnp.concatenate(
                (
                    c[0:3], ones[None],
                    c[3:6], zeros[None],
                    c[6][None], c[7][None], c[8][None], c[9][None], c[10][None],
                )
            )

        return kernel

    def kernel(state_ref, objtx_ref, prim_ref, glass_ref, rec_ref, mask_ref, fstate_ref):
        if not static_loop:
            _run_while_kernel(
                step, generations,
                state_ref, objtx_ref, prim_ref, glass_ref,
                rec_ref, mask_ref, fstate_ref,
            )
            return
        # experimental variant (bench tuning): every generation runs
        # unconditionally with static record stores — trades the
        # early-exit saving for static addressing / better scheduling.
        # Nothing to zero-fill: every generation's outputs are written.
        state = state_ref[:]
        carry = (
            state[0:3],   # positions xyz (w == 1 dropped)
            state[4:7],   # directions xyz (w == 0 dropped)
            state[8],     # generation
            state[9],     # intensity
            state[10],    # wavelength
            state[11],    # index
            state[12],    # id
            jnp.ones_like(state[8]),  # alive (float mask; see step docstring)
        )
        for g in range(generations):
            carry, record, mask_f = step(objtx_ref, prim_ref, glass_ref, carry)
            rec_ref[g] = record
            mask_ref[g] = mask_f
        p3, v3, gen, inten, wav, ridx, rid, _ = carry
        ones = jnp.ones_like(gen)
        zeros = jnp.zeros_like(gen)
        fstate_ref[:] = jnp.concatenate(
            (
                p3, ones[None],       # homogeneous w restored
                v3, zeros[None],
                gen[None], inten[None], wav[None], ridx[None], rid[None],
            )
        )

    return kernel


def _run_while_kernel(
    step, generations,
    state_ref, objtx_ref, prim_ref, glass_ref, rec_ref, mask_ref, fstate_ref,
    fold_ref=None, win_ref=None,
):
    """The production generation-loop driver (early-exit while_loop),
    shared verbatim by the narrow and wide kernels — only ``step``
    differs.  With ``fold_ref``/``win_ref`` set (the staged wide
    backward's forward), the step returns two extra per-generation
    outputs — the fold payload rows and the winning tree's fold code —
    stored alongside the records; never-ran generations keep win = -1
    (no tree selected), which the backward's winner masks treat as
    zero-contribution."""
    state = state_ref[:]
    carry0 = (
        state[0:3],   # positions xyz (w == 1 dropped)
        state[4:7],   # directions xyz (w == 0 dropped)
        state[8],     # generation
        state[9],     # intensity
        state[10],    # wavelength
        state[11],    # index
        state[12],    # id
        jnp.ones_like(state[8]),  # alive (float mask; see step docstring)
    )
    # outputs must be defined even for generations the early exit skips.
    # Mask zeroing is load-bearing for the forward contract; record
    # zeroing is ALSO load-bearing since round 3 — the backward kernel
    # (ops/fused_grad.py) reconstructs per-generation input states from
    # these rows and relies on never-ran generations being zeros (its
    # build asserts _ZERO_RECORDS).
    if _ZERO_RECORDS:
        rec_ref[:] = jnp.zeros_like(rec_ref)
    mask_ref[:] = jnp.zeros_like(mask_ref)
    if fold_ref is not None:
        fold_ref[:] = jnp.zeros_like(fold_ref)
        win_ref[:] = jnp.full(win_ref.shape, -1, win_ref.dtype)

    # the loop body steps UNROLL generations per iteration: the
    # scf.while carry/branch overhead is ~2x a generation's compute
    # (measured — see design notes), so amortizing it wins even
    # though early exit coarsens to UNROLL granularity
    unroll = _LOOP_UNROLL
    while generations % unroll:
        unroll -= 1

    def cond(loop_carry):
        g = loop_carry[0]
        alive_f = loop_carry[-1]
        return (g < generations) & (jnp.max(alive_f) > 0.5)

    def body(loop_carry):
        g = loop_carry[0]
        carry = loop_carry[1:]
        for k in range(unroll):
            outs = step(objtx_ref, prim_ref, glass_ref, carry)
            carry, record, mask_f = outs[:3]
            rec_ref[pl.ds(g + k, 1)] = record[None]
            mask_ref[pl.ds(g + k, 1)] = mask_f[None]
            if fold_ref is not None:
                fold_ref[pl.ds(g + k, 1)] = outs[3][None]
                win_ref[pl.ds(g + k, 1)] = outs[4][None]
        return (g + unroll,) + carry

    final = lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32),) + carry0)
    _, p3, v3, gen, inten, wav, ridx, rid, _ = final
    ones = jnp.ones_like(gen)
    zeros = jnp.zeros_like(gen)
    fstate_ref[:] = jnp.concatenate(
        (
            p3, ones[None],       # homogeneous w restored
            v3, zeros[None],
            gen[None], inten[None], wav[None], ridx[None], rid[None],
        )
    )


@lru_cache(maxsize=64)
def build_fused_trace_fn(
    spec: SceneSpec, materials, config: TraceConfig, interpret: bool = False,
    static_loop: bool = False, save_fold: bool = False,
):
    """Build the fused-kernel trace: ``fn(params, rays) -> TraceResult``.

    Same contract as engine.build_trace_fn (records / record_mask /
    final_rays / generations_run), forward-only.  ``materials`` is accepted
    for signature parity; all packed kinds are compiled from the glass
    table.  ``interpret=True`` runs the Pallas interpreter (test-only, for
    bit-exact CPU parity checks); production dispatch happens in
    engine.trace_rays, which routes non-TPU traces to the XLA engine.

    Scenes past the unrolled kernel's leaf cap compile the WIDE variant
    (supports_fused_wide): the same driver around the tree-axis-looping
    step, with two extra SMEM scene tables.

    ``save_fold`` (wide only — the STAGED backward's forward pass) makes
    the trace return ``(TraceResult, fold5 (G, 5, n), win (G, n) int32)``
    — the per-generation fold payload [best_d, n_x, n_y, n_z, best_mat]
    and the winning tree's fold code, so the backward pass never
    recomputes the nearest-hit search (ops/fused_grad._run_bwd_staged).
    """
    from pyrayt_tpu.tracer.engine import N_RECORD_COLS, TraceResult
    from pyrayt_tpu.tracer.rayset import RaySet

    wide = not supports_fused(spec)
    if wide and not supports_fused_wide(spec):
        raise ValueError(
            "scene has non-packed materials or no batchable tree groups; "
            "use the XLA engine"
        )
    if save_fold and not wide:
        raise ValueError("save_fold is a wide-kernel (staged backward) mode")
    if wide:
        meta_const = _leaf_meta_table(spec)

    generations = config.generation_limit
    kernel = _make_kernel(
        spec, config, generations, static_loop=static_loop, wide=wide,
        save_fold=save_fold,
    )

    @jax.jit
    def trace(params, initial_rays: RaySet) -> TraceResult:
        n = initial_rays.n_rays
        dtype = initial_rays.positions.dtype
        r_rows = fused_block_rays(
            config, jnp.dtype(dtype).itemsize, wide=wide, save_fold=save_fold
        )
        if r_rows is None:
            raise ValueError(
                "generation_limit too large for the fused kernel's VMEM "
                "budget; use the XLA engine"
            )
        block = r_rows * LANE
        n_pad = -(-n // block) * block

        state = jnp.concatenate(
            (
                initial_rays.positions,
                initial_rays.directions,
                initial_rays.metadata,
            )
        ).astype(dtype)
        # zero-padding appends rays with zero direction: they die (absorbed)
        # in generation 0 and their mask rows are sliced off below
        state = jnp.pad(state, ((0, 0), (0, n_pad - n)))
        # rays tile as (rows, 128) so vregs are fully dense (see module doc)
        state = state.reshape(13, n_pad // LANE, LANE)

        obj_tx = affine_inverse(params["world"]).reshape(spec.n_leaves, 16)
        prim_p = params["prim"]
        glass = params["glass"]
        if glass.shape[0] == 0:  # SMEM refs need >= 1 row
            glass = jnp.zeros((1, matl.N_GLASS_COEFFS), dtype)

        scratch_shapes = (
            [pltpu.VMEM((12, r_rows, LANE), dtype)]
            if static_loop == "predicated"
            else []
        )
        inputs = [
            state,
            obj_tx.astype(dtype),
            prim_p.astype(dtype),
            glass.astype(dtype),
        ]
        in_specs = [
            pl.BlockSpec(
                (13, r_rows, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        if wide:
            # spatially-sorted slot vector + chunk AABBs are RUNTIME data
            # (they depend on params); the kernel structure is static, so
            # moving a lenslet never recompiles
            slots_arr, aabb_arr = _wide_runtime_tables(spec, params, dtype)
            inputs += [slots_arr, jnp.asarray(meta_const, dtype), aabb_arr]
            in_specs += [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ]
        out_specs = [
            pl.BlockSpec(
                (generations, N_RECORD_COLS, r_rows, LANE),
                lambda i: (0, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (generations, r_rows, LANE),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (13, r_rows, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ]
        out_shape = [
            jax.ShapeDtypeStruct(
                (generations, N_RECORD_COLS, n_pad // LANE, LANE), dtype
            ),
            jax.ShapeDtypeStruct((generations, n_pad // LANE, LANE), dtype),
            jax.ShapeDtypeStruct((13, n_pad // LANE, LANE), dtype),
        ]
        if save_fold:
            out_specs += [
                pl.BlockSpec(
                    (generations, 5, r_rows, LANE),
                    lambda i: (0, 0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (generations, r_rows, LANE),
                    lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            out_shape += [
                jax.ShapeDtypeStruct(
                    (generations, 5, n_pad // LANE, LANE), dtype
                ),
                jax.ShapeDtypeStruct(
                    (generations, n_pad // LANE, LANE), jnp.int32
                ),
            ]
        outs = pl.pallas_call(
            kernel,
            grid=(n_pad // block,),
            scratch_shapes=scratch_shapes,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            interpret=interpret,
        )(*inputs)
        records, masks, fstate = outs[:3]

        records = records.reshape(generations, N_RECORD_COLS, n_pad)[:, :, :n]
        masks = masks.reshape(generations, n_pad)[:, :n] > 0.5
        fstate = fstate.reshape(13, n_pad)
        final_rays = initial_rays.replace(
            positions=fstate[0:4, :n],
            directions=fstate[4:8, :n],
            generation=fstate[8, :n],
            intensity=fstate[9, :n],
            wavelength=fstate[10, :n],
            index=fstate[11, :n],
            id=fstate[12, :n],
        )
        result = TraceResult(
            records=records,
            record_mask=masks,
            final_rays=final_rays,
            generations_run=jnp.sum(jnp.any(masks, axis=1)),
        )
        if not save_fold:
            return result
        fold5 = outs[3].reshape(generations, 5, n_pad)[:, :, :n]
        win = outs[4].reshape(generations, n_pad)[:, :n]
        return result, fold5, win

    return trace
