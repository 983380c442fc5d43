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
# Mosaic program (and its compile time) stops paying for itself — the XLA
# engine's batched wide-scene path (tracer/engine.py) takes over for
# lens/microlens arrays (measured scaling in docs/design_notes.md)
_FUSED_MAX_LEAVES = 32


def supports_fused(spec: SceneSpec) -> bool:
    """The fused kernel covers every reference material; custom Python
    TracableMaterials (arbitrary host code) and very wide scenes (leaf
    count above ``_FUSED_MAX_LEAVES`` — lens arrays) fall back to the XLA
    engine."""
    return (
        0 < spec.n_leaves <= _FUSED_MAX_LEAVES
        and all(spec.mat_packed)
        and all(k in _PACKED_KINDS for k in spec.mat_kinds)
    )


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
    feasible = supports_fused(spec) and fused_block_rays(config, itemsize) is not None
    if feasible and need_grad:
        from pyrayt_tpu.ops.fused_grad import bwd_block_rays

        feasible = bwd_block_rays(config, itemsize) is not None
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


def fused_block_rays(config: TraceConfig, itemsize: int = 4):
    """Rays per block — the largest power-of-two (R x 128) tile whose VMEM
    working set fits the budget — or ``None`` when even the minimum tile
    overflows (huge generation_limit): callers must fall back to the XLA
    engine.

    Per-ray bytes: in/out state (2 x 13 rows), records (G x 15), masks (G),
    all double-buffered by the pipeline (x2), plus ~60 rows of loop-carry
    and temporaries."""
    g = config.generation_limit
    per_ray = itemsize * (2 * (26 + 16 * g) + 60)
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


def _make_kernel(
    spec: SceneSpec, config: TraceConfig, generations: int,
    static_loop=False,
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
    """
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
        state = state_ref[:]
        dtype = state.dtype
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
        # build asserts _ZERO_RECORDS).  The static-loop variant writes
        # every generation, so nothing to fill.
        if not static_loop:
            if _ZERO_RECORDS:
                rec_ref[:] = jnp.zeros_like(rec_ref)
            mask_ref[:] = jnp.zeros_like(mask_ref)

        if static_loop:
            # experimental variant (bench tuning): every generation runs
            # unconditionally with static record stores — trades the
            # early-exit saving for static addressing / better scheduling
            carry = carry0
            for g in range(generations):
                carry, record, mask_f = step(objtx_ref, prim_ref, glass_ref, carry)
                rec_ref[g] = record
                mask_ref[g] = mask_f
            final = (None,) + carry
        else:
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
                    carry, record, mask_f = step(
                        objtx_ref, prim_ref, glass_ref, carry
                    )
                    rec_ref[pl.ds(g + k, 1)] = record[None]
                    mask_ref[pl.ds(g + k, 1)] = mask_f[None]
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

    return kernel


@lru_cache(maxsize=64)
def build_fused_trace_fn(
    spec: SceneSpec, materials, config: TraceConfig, interpret: bool = False,
    static_loop: bool = False,
):
    """Build the fused-kernel trace: ``fn(params, rays) -> TraceResult``.

    Same contract as engine.build_trace_fn (records / record_mask /
    final_rays / generations_run), forward-only.  ``materials`` is accepted
    for signature parity; all packed kinds are compiled from the glass
    table.  ``interpret=True`` runs the Pallas interpreter (test-only, for
    bit-exact CPU parity checks); production dispatch happens in
    engine.trace_rays, which routes non-TPU traces to the XLA engine.
    """
    from pyrayt_tpu.tracer.engine import N_RECORD_COLS, TraceResult
    from pyrayt_tpu.tracer.rayset import RaySet

    if not supports_fused(spec):
        raise ValueError("scene has non-packed materials; use the XLA engine")

    generations = config.generation_limit
    kernel = _make_kernel(spec, config, generations, static_loop=static_loop)

    @jax.jit
    def trace(params, initial_rays: RaySet) -> TraceResult:
        n = initial_rays.n_rays
        dtype = initial_rays.positions.dtype
        r_rows = fused_block_rays(config, jnp.dtype(dtype).itemsize)
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
        records, masks, fstate = pl.pallas_call(
            kernel,
            grid=(n_pad // block,),
            scratch_shapes=scratch_shapes,
            in_specs=[
                pl.BlockSpec(
                    (13, r_rows, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
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
            ),
            out_shape=(
                jax.ShapeDtypeStruct(
                    (generations, N_RECORD_COLS, n_pad // LANE, LANE), dtype
                ),
                jax.ShapeDtypeStruct((generations, n_pad // LANE, LANE), dtype),
                jax.ShapeDtypeStruct((13, n_pad // LANE, LANE), dtype),
            ),
            interpret=interpret,
        )(
            state,
            obj_tx.astype(dtype),
            prim_p.astype(dtype),
            glass.astype(dtype),
        )

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
        return TraceResult(
            records=records,
            record_mask=masks,
            final_rays=final_rays,
            generations_run=jnp.sum(jnp.any(masks, axis=1)),
        )

    return trace
