"""Reverse-mode companion to the fused Pallas trace kernel.

The XLA scan engine differentiates by saving (or rematerializing) every
generation's intermediates through HBM — measured at ~114 ms per
2^20-ray/6-generation gradient step on v5e, ~25x the fused forward.  This
module closes that gap with a ``jax.custom_vjp`` whose

* **forward** is the fused Pallas kernel itself (ops/fused_trace.py) — the
  record buffer it already writes *is* the full per-generation input state
  (positions = x0..z0 rows, unit directions = tilt rows, metadata rows),
  so no extra residuals are saved;
* **backward** is a second Pallas kernel that sweeps the generations in
  reverse inside VMEM: for each generation it reconstructs the input ray
  state from the saved record block and applies the VJP of the shared
  generation step (``jax.vjp`` of ``fused_trace._make_step`` — traced
  straight into the kernel), chaining ray-state cotangents through the
  loop and accumulating scene-parameter cotangents as SMEM scalars across
  grid steps (the TPU grid is sequential, so cross-block accumulation into
  one SMEM output is race-free).

WIDE scenes (lens/microlens arrays past the unrolled kernel's leaf cap)
get their own backward (:func:`_make_bwd_kernel_wide`): vjp through the
wide step's in-kernel tree loop is impossible (stacked residuals), so the
sweep differentiates the step's two pure pieces by hand — jax.vjp of the
tail, then a winner-masked per-tree vjp of the eval, accumulating
transform/parameter cotangents into SMEM at traced slot indices.  Parity
pinned in tests/test_ops/test_fused_wide_grad.py.

Gradient contract (matches jax.grad of the XLA engine, asserted in
tests/test_ops/test_fused_grad.py):

* exact for every ray on all record cotangents — a recorded row's state
  reconstruction is exact (records are written before masking, and dead
  rays freeze), the only deviation being one ulp of tilt renormalization;
* final-ray cotangents flow through the frozen-state identity for rays
  that died early and exactly for rays alive at the horizon;
* ``record_mask`` / ``generations_run`` are non-differentiable outputs.

Reference counterpart: none — the reference optimizes via scipy finite
differences (examples/lens_design.ipynb cells 28-33), re-tracing once per
parameter per step.
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
from pyrayt_tpu.core.operations import affine_inverse
from pyrayt_tpu.ops import fused_trace as ft
from pyrayt_tpu.scene.compile import SceneSpec

__all__ = [
    "build_fused_vjp_trace_fn",
    "build_fused_value_and_grad_fn",
    "bwd_block_rays",
    "loss_plan",
    "wide_grad_mode",
]


class _Rows:
    """Ref-like ``obj[s, i]`` view over a nested list of traced scalars, so
    the shared step can read parameters either from SMEM refs (forward
    kernel) or from differentiable values (this kernel)."""

    def __init__(self, rows):
        self._rows = rows

    def __getitem__(self, idx):
        s, i = idx
        return self._rows[s][i]


# the loss-mode backward's leaner working set tolerates a higher VMEM
# budget: at 15 MB the condenser gets full (64, 128) blocks — measured
# 7.8 ms/step vs 14.6 ms at the 10 MB budget's 48-row blocks (v5e, 2^20
# rays; the exact-power-of-two tiling with zero ray padding is most of
# the win — see docs/design_notes.md round-4 table)
_VMEM_BUDGET_BYTES_LOSS = 15 * 1024 * 1024


def bwd_block_rays(config: TraceConfig, itemsize: int = 4, loss_mode: bool = False,
                   wide: bool = False):
    """Rays per backward block, or None when VMEM cannot fit one.

    Per-ray rows resident: records (15G) [+ record cotangents (15G) and a
    final-state cotangent (13) in the generic mode], masks (G), initial
    state (13) and state-cotangent output (13), all double-buffered (x2),
    plus ~140 rows of VJP loop working set (~80 more for the wide
    kernel's fold recompute + per-tree vjp temporaries).  ``loss_mode``
    (the fused-loss path) drops the cotangent buffers — the kernel
    synthesizes them from SMEM scalars — roughly halving the working set
    and nearly doubling the block."""
    g = config.generation_limit
    # loss-mode per-generation cost is 20 rows, not the record buffer's
    # 16: at G=8 the 16-row estimate chose 64-row blocks whose scoped
    # VMEM measured 21.6 MB against the v5e 16 MB cap (Mosaic stack OOM
    # on the real chip); 20 rows lands G=8 on 32-row blocks while G<=6
    # keeps the measured (64, 128) fast path (7.8 ms condenser step)
    rows = (20 * g + 26) if loss_mode else (31 * g + 39)
    budget = _VMEM_BUDGET_BYTES_LOSS if loss_mode else ft._VMEM_BUDGET_BYTES
    per_ray = itemsize * (2 * rows + 140 + (80 if wide else 0))
    r = budget // (per_ray * ft.LANE)
    r = min(ft._MAX_R, (r // ft._SUBLANE) * ft._SUBLANE)
    if r < ft._SUBLANE:
        return None
    # pow2 clamp: measured 2x on non-pow2 blocks (see ft.pow2_floor)
    return ft.pow2_floor(r)


def _scalar_tables(ref, n_rows, n_cols):
    return [[ref[s, i] for i in range(n_cols)] for s in range(n_rows)]


def _zeros_like_tables(tables):
    return jax.tree_util.tree_map(jnp.zeros_like, tables)


def _make_bwd_kernel(spec: SceneSpec, config: TraceConfig, generations: int,
                     n_prim_cols: int, n_glass_rows: int, loss_drec=None):
    """The reverse-generation-sweep kernel.

    Two modes share one body:

    * generic (``loss_drec=None``): record and final-state cotangents
      arrive as HBM buffers (the custom_vjp contract);
    * fused-loss (``loss_drec(rec, mask_g, scal_ref) -> (15, R, L)``):
      the record cotangent of a recognized scalar loss is synthesized
      in-VMEM from a row of SMEM scalars — no (G, 15, n) cotangent buffer
      ever exists, and the final-state cotangent is identically zero.
    """
    step = ft._make_step(spec, config)
    S = spec.n_leaves

    def kernel(*refs):
        if loss_drec is None:
            (objtx_ref, prim_ref, glass_ref,
             state0_ref,   # (13, R, L) the TRUE initial ray state (see below)
             rec_ref,      # (G, 15, R, L) saved records
             mask_ref,     # (G, R, L) float masks
             drec_ref,     # (G, 15, R, L) record cotangents
             dfstate_ref,  # (13, R, L) final-state cotangent
             dobjtx_ref,   # (S, 16) SMEM out, accumulated across grid steps
             dprim_ref,    # (S, P) SMEM out
             dglass_ref,   # (M, 7) SMEM out
             dstate0_ref,  # (13, R, L) cotangent of the initial ray state
             ) = refs
            scal_ref = None
        else:
            (objtx_ref, prim_ref, glass_ref,
             state0_ref, rec_ref, mask_ref,
             scal_ref,     # (K,) SMEM loss scalars (last = upstream cotangent)
             dobjtx_ref, dprim_ref, dglass_ref, dstate0_ref,
             ) = refs
            drec_ref = dfstate_ref = None
        dtype = rec_ref.dtype
        objtx_vals = _scalar_tables(objtx_ref, S, 16)
        prim_vals = _scalar_tables(prim_ref, S, n_prim_cols)
        glass_vals = _scalar_tables(glass_ref, n_glass_rows, matl.N_GLASS_COEFFS)

        def f(ot, pv, gv, carry):
            return step(_Rows(ot), _Rows(pv), _Rows(gv), carry)

        if loss_drec is None:
            df = dfstate_ref[:]
            carry_bar0 = (
                df[0:3],          # d positions xyz
                df[4:7],          # d directions xyz
                df[8],            # d generation
                df[9],            # d intensity
                df[10],           # d wavelength
                df[11],           # d index
                df[12],           # d id
                jnp.zeros_like(df[8]),  # d alive (non-diff float mask)
            )
        else:
            zero_block = jnp.zeros(rec_ref.shape[2:], dtype)
            carry_bar0 = (
                jnp.zeros((3,) + rec_ref.shape[2:], dtype),
                jnp.zeros((3,) + rec_ref.shape[2:], dtype),
            ) + (zero_block,) * 6
        d_ot0 = _zeros_like_tables(objtx_vals)
        d_pv0 = _zeros_like_tables(prim_vals)
        d_gv0 = _zeros_like_tables(glass_vals)

        s0 = state0_ref[:]

        def body(i, loop_carry):
            carry_bar, d_ot, d_pv, d_gv = loop_carry
            g = generations - 1 - i
            rec = rec_ref[pl.ds(g, 1)][0]     # (15, R, L)
            mask_g = mask_ref[pl.ds(g, 1)][0]
            if loss_drec is None:
                drec = drec_ref[pl.ds(g, 1)][0]
            else:
                drec = loss_drec(rec, mask_g, scal_ref)
            # input-state reconstruction (see module docstring): positions,
            # unit directions, and metadata are the record's own rows; the
            # incoming alive mask is the previous generation's record mask.
            # Generation 0 instead uses the TRUE initial state (its record's
            # tilt rows are *renormalized* directions — a caller passing
            # non-unit initial directions would otherwise get a backward
            # linearized at the wrong point).  The forward's extra
            # early-death drop (will_die) is output-invariant, so omitting
            # it here changes nothing (absorbed rays recompute dead = True
            # either way).
            prev_g = jnp.maximum(g - 1, 0)
            prev_mask = mask_ref[pl.ds(prev_g, 1)][0]
            is0 = g == 0
            alive_f = jnp.where(is0, jnp.ones_like(prev_mask), prev_mask)
            carry_g = (
                jnp.where(is0, s0[0:3], rec[6:9]),     # positions xyz
                jnp.where(is0, s0[4:7], rec[12:15]),   # directions
                jnp.where(is0, s0[8], rec[0]),         # generation
                jnp.where(is0, s0[9], rec[1]),         # intensity
                jnp.where(is0, s0[10], rec[2]),        # wavelength
                jnp.where(is0, s0[11], rec[3]),        # index
                jnp.where(is0, s0[12], rec[4]),        # id
                alive_f,
            )
            _, vjp_fn = jax.vjp(f, objtx_vals, prim_vals, glass_vals, carry_g)
            cot = (carry_bar, drec, jnp.zeros_like(mask_g))
            g_ot, g_pv, g_gv, d_carry = vjp_fn(cot)
            d_ot = jax.tree_util.tree_map(jnp.add, d_ot, g_ot)
            d_pv = jax.tree_util.tree_map(jnp.add, d_pv, g_pv)
            d_gv = jax.tree_util.tree_map(jnp.add, d_gv, g_gv)
            return d_carry, d_ot, d_pv, d_gv

        # dynamic trip count: only sweep the generations this block actually
        # ran.  The forward's while loop advances _LOOP_UNROLL generations
        # per iteration and exits at most one iteration after the last
        # living mask, so rounding count(any-mask) + 1 up to the unroll
        # multiple covers every generation whose records were really
        # written; the skipped ones are zero-filled and provable cotangent
        # no-ops (position cotangents pass by identity, direction
        # cotangents are re-zeroed at the real death generation).
        u = ft._LOOP_UNROLL
        while generations % u:
            u -= 1
        any_g = jnp.stack(
            [jnp.max(mask_ref[g]) for g in range(generations)]
        )
        count1 = jnp.sum((any_g > 0.5).astype(jnp.int32)) + 1
        ran = jnp.minimum(-(-count1 // u) * u, generations)
        carry_bar, d_ot, d_pv, d_gv = lax.fori_loop(
            generations - ran, generations, body, (carry_bar0, d_ot0, d_pv0, d_gv0)
        )

        p_bar, v_bar, gen_bar, int_bar, wav_bar, idx_bar, id_bar, _ = carry_bar
        zero = jnp.zeros_like(gen_bar)
        dstate0_ref[:] = jnp.concatenate(
            (
                p_bar, zero[None],
                v_bar, zero[None],
                gen_bar[None], int_bar[None], wav_bar[None],
                idx_bar[None], id_bar[None],
            )
        )

        # parameter cotangents: accumulate across the (sequential) grid
        first = pl.program_id(0) == 0

        @pl.when(first)
        def _init():
            for s in range(S):
                for i in range(16):
                    dobjtx_ref[s, i] = jnp.zeros((), dtype)
                for i in range(n_prim_cols):
                    dprim_ref[s, i] = jnp.zeros((), dtype)
            for m in range(n_glass_rows):
                for i in range(matl.N_GLASS_COEFFS):
                    dglass_ref[m, i] = jnp.zeros((), dtype)

        for s in range(S):
            for i in range(16):
                dobjtx_ref[s, i] = dobjtx_ref[s, i] + d_ot[s][i]
            for i in range(n_prim_cols):
                dprim_ref[s, i] = dprim_ref[s, i] + d_pv[s][i]
        for m in range(n_glass_rows):
            for i in range(matl.N_GLASS_COEFFS):
                dglass_ref[m, i] = dglass_ref[m, i] + d_gv[m][i]

    return kernel


def _make_bwd_kernel_wide(spec: SceneSpec, config: TraceConfig, generations: int,
                          n_prim_cols: int, n_glass_rows: int, loss_drec=None):
    """The reverse sweep for WIDE scenes (ft.supports_fused_wide).

    The narrow kernel re-applies ``jax.vjp`` of the whole unrolled step;
    through the wide step that is impossible (vjp of the in-kernel
    ``fori_loop`` would stack per-tree residuals in VMEM).  Instead the
    sweep differentiates the step's two pieces by hand:

    * **tail**: ``jax.vjp`` of the pure ``ft._wide_tail`` (INTERACT +
      record + carry update) w.r.t. (best_d, best_n, glass, carry) —
      yields the fold-output cotangents and the glass/ray-state chains;
    * **fold**: the forward fold is recomputed with winner tracking
      (``want_win=True``); then each tree's contribution is the
      winner-masked vjp of the pure per-tree eval ``ft._wide_tree_eval``
      — mathematically, ``best = select(win==t, eval_t, ...)`` so
      ``d eval_t = mask_t * d best``.  Grouped trees run this inside a
      ``fori_loop`` whose body accumulates transform/parameter cotangents
      directly into the SMEM output refs at traced slot indices (the TPU
      grid is sequential, so cross-block accumulation is race-free);
      chunks with no winning ray skip under ``lax.cond``.

    Tie-break caveat: at an exact cross-tree distance tie (measure zero)
    the winner mask routes the full cotangent to the first-seen tree,
    where jax.grad of the XLA engine splits subgradients by its own
    selection order — same class of deviation as min/max subgradients.
    """
    S = spec.n_leaves
    plan = ft._wide_fold_plan(spec)
    fold_win = ft._make_wide_fold(
        spec, config, want_win=True, dynamic_chunks=True
    )

    def kernel(*refs):
        if loss_drec is None:
            (objtx_ref, prim_ref, glass_ref, slots_ref, meta_ref, aabb_ref,
             state0_ref, rec_ref, mask_ref,
             drec_ref, dfstate_ref,
             dobjtx_ref, dprim_ref, dglass_ref, dstate0_ref,
             ) = refs
            scal_ref = None
        else:
            (objtx_ref, prim_ref, glass_ref, slots_ref, meta_ref, aabb_ref,
             state0_ref, rec_ref, mask_ref,
             scal_ref,
             dobjtx_ref, dprim_ref, dglass_ref, dstate0_ref,
             ) = refs
            drec_ref = dfstate_ref = None
        dtype = rec_ref.dtype
        glass_vals = _scalar_tables(glass_ref, n_glass_rows, matl.N_GLASS_COEFFS)

        # zero the SMEM accumulators once (sequential grid; every later
        # read-modify-write below accumulates into them).  The zeroing
        # runs as a fori_loop of dynamic stores, NOT an unrolled python
        # loop: at 513 leaves the unrolled form cost ~1 MB of scoped SMEM
        # (v5e capacity is 1.0 MB) in straight-line store bookkeeping.
        first = pl.program_id(0) == 0

        @pl.when(first)
        def _init():
            def zero_row(s, c):
                for i in range(16):
                    dobjtx_ref[s, i] = jnp.zeros((), dtype)
                for i in range(n_prim_cols):
                    dprim_ref[s, i] = jnp.zeros((), dtype)
                return c

            lax.fori_loop(0, S, zero_row, 0)
            for m in range(n_glass_rows):
                for i in range(matl.N_GLASS_COEFFS):
                    dglass_ref[m, i] = jnp.zeros((), dtype)

        if loss_drec is None:
            df = dfstate_ref[:]
            carry_bar0 = (
                df[0:3], df[4:7], df[8], df[9], df[10], df[11], df[12],
                jnp.zeros_like(df[8]),
            )
        else:
            zero_block = jnp.zeros(rec_ref.shape[2:], dtype)
            carry_bar0 = (
                jnp.zeros((3,) + rec_ref.shape[2:], dtype),
                jnp.zeros((3,) + rec_ref.shape[2:], dtype),
            ) + (zero_block,) * 6

        s0 = state0_ref[:]

        def _acc_tree_cotangents(info, mats_j, prim_rows_j, tree_slots,
                                 p_rows, v_rows, gd, gn, scale_pos=None):
            """vjp of one tree's pure eval; accumulate into SMEM + return
            the ray-state cotangent contribution (d_p3, d_v3).
            ``scale_pos`` overrides the static per-position normal scales
            for grouped trees (runtime meta-table reads — groups may mix
            orientations)."""
            if scale_pos is None:
                scale_pos = info["scale_pos"]

            def evalf(mj, pj, pr, vr):
                return ft._wide_tree_eval(
                    info["template"], info["fast"] if "fast" in info else True,
                    info["types_pos"], scale_pos, info["needs_pos"],
                    mj, pj, pr, vr,
                )

            _, vjp_fn = jax.vjp(
                lambda mj, pj, pr, vr: evalf(mj, pj, pr, vr)[0],
                mats_j, prim_rows_j, p_rows, v_rows,
            )
            g_mats, g_prims, g_p, g_v = vjp_fn((gd, gn))
            for j, slot in enumerate(tree_slots):
                for i in range(4):
                    for k in range(4):
                        dobjtx_ref[slot, 4 * i + k] = (
                            dobjtx_ref[slot, 4 * i + k] + g_mats[j][i][k]
                        )
                for i in range(n_prim_cols):
                    dprim_ref[slot, i] = dprim_ref[slot, i] + g_prims[j][i]
            return jnp.stack(g_p), jnp.stack(g_v)

        def body(i, loop_carry):
            carry_bar, d_gv = loop_carry
            g = generations - 1 - i
            rec = rec_ref[pl.ds(g, 1)][0]
            mask_g = mask_ref[pl.ds(g, 1)][0]
            if loss_drec is None:
                drec = drec_ref[pl.ds(g, 1)][0]
            else:
                drec = loss_drec(rec, mask_g, scal_ref)
            prev_g = jnp.maximum(g - 1, 0)
            prev_mask = mask_ref[pl.ds(prev_g, 1)][0]
            is0 = g == 0
            alive_f = jnp.where(is0, jnp.ones_like(prev_mask), prev_mask)
            carry_g = (
                jnp.where(is0, s0[0:3], rec[6:9]),
                jnp.where(is0, s0[4:7], rec[12:15]),
                jnp.where(is0, s0[8], rec[0]),
                jnp.where(is0, s0[9], rec[1]),
                jnp.where(is0, s0[10], rec[2]),
                jnp.where(is0, s0[11], rec[3]),
                jnp.where(is0, s0[12], rec[4]),
                alive_f,
            )
            p3_in, v3_in = carry_g[0], carry_g[1]
            p_rows = [p3_in[0], p3_in[1], p3_in[2]]
            v_rows = [v3_in[0], v3_in[1], v3_in[2]]

            # forward fold recompute, with the winning tree's fold code
            best_d, best_n, best_mat, best_pub, win = fold_win(
                objtx_ref, prim_ref, slots_ref, meta_ref, aabb_ref,
                p_rows, v_rows,
            )

            # tail vjp: fold-output cotangents + glass + ray-state chain
            def tailf(bd, bn, gv, cr):
                return ft._wide_tail(
                    spec, config, _Rows(gv), bd, bn, best_mat, best_pub, cr
                )

            _, tail_vjp = jax.vjp(tailf, best_d, best_n, glass_vals, carry_g)
            d_bd, d_bn, g_gv, d_carry = tail_vjp(
                (carry_bar, drec, jnp.zeros_like(mask_g))
            )
            d_gv = jax.tree_util.tree_map(jnp.add, d_gv, g_gv)

            d_p3 = d_carry[0]
            d_v3 = d_carry[1]

            # fold backward: winner-masked per-tree vjp
            for kind, idx, info in plan:
                if kind == "single":
                    sel = (win == info["code"]).astype(dtype)
                    gd = d_bd * sel
                    gn = d_bn * sel[None]
                    mats_j, prim_rows_j = ft._read_single_tables(
                        objtx_ref, prim_ref, info
                    )
                    g_p, g_v = _acc_tree_cotangents(
                        info, mats_j, prim_rows_j, info["slots"],
                        p_rows, v_rows, gd, gn,
                    )
                    d_p3 = d_p3 + g_p
                    d_v3 = d_v3 + g_v
                    continue

                T = info["T"]
                base = info["code_base"]

                def tree_bwd(t, acc, info=info, base=base):
                    ap, av = acc
                    sel = (win == base + t).astype(dtype)
                    gd = d_bd * sel
                    gn = d_bn * sel[None]
                    mats_j, prim_rows_j, tree_slots = ft._read_group_tables(
                        objtx_ref, prim_ref, slots_ref, info, t
                    )
                    scale_j = [meta_ref[s, 2] for s in tree_slots]
                    g_p, g_v = _acc_tree_cotangents(
                        info, mats_j, prim_rows_j, tree_slots,
                        p_rows, v_rows, gd, gn, scale_pos=scale_j,
                    )
                    return (ap + g_p, av + g_v)

                acc = (jnp.zeros_like(d_p3), jnp.zeros_like(d_v3))
                if info["n_chunks"] == 0:
                    acc = lax.fori_loop(0, T, tree_bwd, acc)
                else:
                    # the chunk sweep is itself a fori_loop (traced inner
                    # bounds) so the program holds ONE copy of the vjp
                    # body — a python chunk loop instantiates it per chunk
                    # and crashed the Mosaic compiler past ~300 leaves
                    C = ft._WIDE_CHUNK_TREES

                    def chunk_bwd(c, a, T=T, base=base):
                        start = c * C
                        stop = jnp.minimum(start + C, T)
                        won = (win >= base + start) & (win < base + stop)
                        return lax.cond(
                            jnp.max(won.astype(dtype)) > 0,
                            lambda aa: lax.fori_loop(start, stop, tree_bwd, aa),
                            lambda aa: aa,
                            a,
                        )

                    acc = lax.fori_loop(0, info["n_chunks"], chunk_bwd, acc)
                d_p3 = d_p3 + acc[0]
                d_v3 = d_v3 + acc[1]

            new_bar = (
                d_p3, d_v3, d_carry[2], d_carry[3], d_carry[4],
                d_carry[5], d_carry[6], jnp.zeros_like(d_carry[2]),
            )
            return new_bar, d_gv

        u = ft._LOOP_UNROLL
        while generations % u:
            u -= 1
        any_g = jnp.stack([jnp.max(mask_ref[g]) for g in range(generations)])
        count1 = jnp.sum((any_g > 0.5).astype(jnp.int32)) + 1
        ran = jnp.minimum(-(-count1 // u) * u, generations)
        d_gv0 = _zeros_like_tables(glass_vals)
        carry_bar, d_gv = lax.fori_loop(
            generations - ran, generations, body, (carry_bar0, d_gv0)
        )

        p_bar, v_bar, gen_bar, int_bar, wav_bar, idx_bar, id_bar, _ = carry_bar
        zero = jnp.zeros_like(gen_bar)
        dstate0_ref[:] = jnp.concatenate(
            (
                p_bar, zero[None],
                v_bar, zero[None],
                gen_bar[None], int_bar[None], wav_bar[None],
                idx_bar[None], id_bar[None],
            )
        )
        for m in range(n_glass_rows):
            for i in range(matl.N_GLASS_COEFFS):
                dglass_ref[m, i] = dglass_ref[m, i] + d_gv[m][i]

    return kernel


def _run_bwd(
    spec: SceneSpec,
    config: TraceConfig,
    interpret: bool,
    params,
    state0,
    records,
    masks,
    d_records=None,
    d_fstate=None,
    scal=None,
    loss_drec=None,
):
    """Run the backward kernel over ray blocks; returns
    ``(d_objtx (S,16), d_prim, d_glass, d_state0 (13, n))``.

    Generic mode passes ``d_records``/``d_fstate`` buffers; fused-loss
    mode passes ``scal`` (a small scalar row) + ``loss_drec`` instead.
    """
    from pyrayt_tpu.tracer.engine import N_RECORD_COLS

    generations = config.generation_limit
    loss_mode = loss_drec is not None
    wide = not ft.supports_fused(spec)
    dtype = records.dtype
    n = records.shape[-1]
    r_rows = bwd_block_rays(
        config, jnp.dtype(dtype).itemsize, loss_mode=loss_mode, wide=wide
    )
    if r_rows is None:
        raise ValueError(
            "generation_limit too large for the backward kernel's VMEM "
            "budget; differentiate the XLA engine instead"
        )
    block = r_rows * ft.LANE
    n_pad = -(-n // block) * block
    pad3 = ((0, 0), (0, 0), (0, n_pad - n))
    pad2 = ((0, 0), (0, n_pad - n))

    def tile(x, spec_pad):
        x = jnp.pad(x, spec_pad)
        return x.reshape(x.shape[:-1] + (n_pad // ft.LANE, ft.LANE))

    obj_tx = affine_inverse(params["world"]).reshape(spec.n_leaves, 16)
    prim_p = params["prim"]
    glass = params["glass"]
    if glass.shape[0] == 0:
        glass = jnp.zeros((1, matl.N_GLASS_COEFFS), dtype)
    n_glass_rows = glass.shape[0]
    n_prim_cols = prim_p.shape[1]

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem13 = pl.BlockSpec(
        (13, r_rows, ft.LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    vmem_rec = pl.BlockSpec(
        (generations, N_RECORD_COLS, r_rows, ft.LANE),
        lambda i: (0, 0, i, 0),
        memory_space=pltpu.VMEM,
    )
    vmem_mask = pl.BlockSpec(
        (generations, r_rows, ft.LANE), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )

    inputs = [
        obj_tx.astype(dtype),
        prim_p.astype(dtype),
        glass.astype(dtype),
    ]
    in_specs = [smem, smem, smem]
    if wide:
        slots_arr, aabb_arr = ft._wide_runtime_tables(spec, params, dtype)
        inputs += [
            lax.stop_gradient(slots_arr),
            jnp.asarray(ft._leaf_meta_table(spec), dtype),
            lax.stop_gradient(aabb_arr),
        ]
        in_specs += [smem, smem, smem]
    inputs += [
        tile(state0.astype(dtype), pad2),
        tile(records, pad3),
        tile(masks.astype(dtype), pad2),
    ]
    in_specs += [vmem13, vmem_rec, vmem_mask]
    if loss_mode:
        inputs.append(scal.astype(dtype))
        in_specs.append(smem)
    else:
        inputs += [tile(d_records, pad3), tile(d_fstate, pad2)]
        in_specs += [vmem_rec, vmem13]

    make = _make_bwd_kernel_wide if wide else _make_bwd_kernel
    kernel = make(
        spec, config, generations, n_prim_cols, n_glass_rows, loss_drec=loss_drec
    )
    d_objtx, d_prim, d_glass, d_state0 = pl.pallas_call(
        kernel,
        grid=(n_pad // block,),
        in_specs=in_specs,
        out_specs=(smem, smem, smem, vmem13),
        out_shape=(
            jax.ShapeDtypeStruct((spec.n_leaves, 16), dtype),
            jax.ShapeDtypeStruct((spec.n_leaves, n_prim_cols), dtype),
            jax.ShapeDtypeStruct((n_glass_rows, matl.N_GLASS_COEFFS), dtype),
            jax.ShapeDtypeStruct((13, n_pad // ft.LANE, ft.LANE), dtype),
        ),
        interpret=interpret,
    )(*inputs)
    d_state0 = d_state0.reshape(13, n_pad)[:, :n]
    return d_objtx, d_prim, d_glass, d_state0


# ---------------------------------------------------------------------------
# The STAGED wide backward: no Mosaic program ever sees the full scene.
#
# The monolithic wide backward kernel (above) crashes the Mosaic compile
# helper past ~300 leaves — the trigger scales with the scene-table size
# itself (docs/design_notes.md).  The staged backward removes the full
# table from every kernel:
#
# * the FORWARD saves the fold outputs (win code, best_d, best_n,
#   best_mat) per generation (fused_trace.build_fused_trace_fn with
#   save_fold=True), so the backward never recomputes the nearest-hit
#   search at all;
# * per generation (a static reversed loop in XLA), the TAIL vjp —
#   INTERACT + record + carry, no scene geometry — runs as plain XLA
#   (jax.vjp of fused_trace._wide_tail on flat (n,) arrays);
# * the fold backward fans out over CHUNKS of trees: each chunk is its
#   own Pallas dispatch whose scene table holds at most
#   ``_STAGED_CHUNK_LEAVES`` leaves, PRE-GATHERED in chunk-local order
#   (XLA gathers the sorted slot vector's segment — the kernel has no
#   slot indirection and no S-sized anything).  Ragged last chunks pad
#   their tree count by repeating the first chunk tree (codes above the
#   group's range never match a win code, so pads contribute exact
#   zeros), keeping every chunk of a group the same shape — one compiled
#   program.  Chunk outputs scatter-add back into the (S, 16)/(S, P)
#   accumulators in XLA;
# * the ray-state cotangent chain (carry_bar) rides HBM between
#   generations — ~6 rows/generation of extra traffic, measured in the
#   design notes.
#
# Parity: tests/test_ops/test_fused_staged_grad.py pins the staged path
# against jax.grad of the XLA engine at f64 (interpret mode), both
# generic and loss-fused, including a scene past the monolithic cap.
# ---------------------------------------------------------------------------

# leaves per staged chunk kernel's scene table.  The monolithic kernel
# compiles at 289 leaves and dies at 513; 256 keeps each chunk program —
# which also carries far less code than the monolithic kernel (no fold
# recompute, no tail) — comfortably inside the working envelope.
_STAGED_CHUNK_LEAVES = 256
# trees per winner-skip subchunk inside a staged chunk kernel (same role
# as fused_trace._WIDE_CHUNK_TREES: one any-winner test guards a
# subchunk's whole tree sweep).  v5e sweep at 2^20 rays, G=4:
#   8x8 MLA  (129 leaves): sub 8/16/32 -> 34.3 / 37.9 / 49.5 ms
#   16x16    (513 leaves): sub 8/16/32 -> 49.7 / 48.2 / 57.7 ms
# 8 wins small arrays by ~10% and costs large ones ~3%; ships.
_STAGED_SUBCHUNK_TREES = 8


def wide_grad_mode(spec: SceneSpec, config: TraceConfig) -> str:
    """Backward-path selection: ``"narrow"`` (unrolled scenes),
    ``"fused"`` (the monolithic wide kernel) or ``"staged"``.

    ``config.wide_grad`` forces a wide mode; None (auto) picks STAGED for
    every wide scene — measured faster than the monolithic kernel even
    well below that kernel's compile cap (v5e, 8x8 MLA: 34.3 vs 48.9
    ms/step — dropping the in-kernel fold recompute beats the extra
    dispatches), and the only path that compiles past ~300 leaves.
    """
    if ft.supports_fused(spec):
        return "narrow"
    mode = config.wide_grad
    if mode == "staged" or mode is None:
        return "staged"
    if mode == "fused":
        if spec.n_leaves > ft._FUSED_WIDE_GRAD_MAX_LEAVES:
            raise ValueError(
                "wide_grad='fused' but the scene exceeds the monolithic wide "
                f"backward's leaf cap ({ft._FUSED_WIDE_GRAD_MAX_LEAVES}); "
                "use wide_grad='staged'"
            )
        return "fused"
    raise ValueError(f"unknown wide_grad mode {mode!r}")


def _staged_plan(spec: SceneSpec):
    """Static chunking of the wide fold plan: ``(singles_infos,
    group_chunks)`` with ``group_chunks[i] = (info, ct, nc)`` — trees per
    chunk and chunk count for each batched group."""
    plan = ft._wide_fold_plan(spec)
    singles = tuple(info for kind, idx, info in plan if kind == "single")
    groups = []
    for kind, idx, info in plan:
        if kind != "group":
            continue
        ct = max(1, _STAGED_CHUNK_LEAVES // info["L"])
        nc = -(-info["T"] // ct)
        groups.append((info, min(ct, info["T"]) if nc == 1 else ct, nc))
    return singles, tuple(groups)


@lru_cache(maxsize=256)
def _make_staged_group_kernel(
    template, fast, types_pos, needs_pos, n_trees, n_prim_cols,
    subchunk=_STAGED_SUBCHUNK_TREES,
):
    """One chunk's fold-backward kernel: winner-masked per-tree vjp of the
    pure tree eval over a chunk-local scene table.

    Refs: ``objtx_ref (n_trees*L, 16)`` / ``prim_ref (n_trees*L, P)``
    chunk tables in SMEM (row ``t*L + j`` = tree t's leaf j),
    ``scale_ref (n_trees*L,)`` per-row normal scales (runtime — groups
    may mix orientations), ``code_ref (2,)`` = [first tree's global fold
    code, one past the group's real code range] (pads compare >= the hi
    bound and never select), ``buf_ref (10, R, L)`` = [p3, v3, d_best_d,
    d_best_n] rows, ``win_ref (R, L)`` int32 fold codes.  Outputs:
    per-row table cotangents (SMEM, accumulated across the sequential
    ray grid) and the (6, R, L) ray-state cotangent block [d_p3, d_v3].

    lru_cached on the static signature so every same-shape chunk of a
    group — across chunks AND generations — reuses one kernel function,
    letting XLA/Mosaic deduplicate the compiled program.
    """
    L = len(types_pos)
    nsub = -(-n_trees // subchunk)

    def kernel(objtx_ref, prim_ref, scale_ref, code_ref, buf_ref, win_ref,
               dobj_ref, dprim_ref, dpv_ref):
        dtype = buf_ref.dtype
        first = pl.program_id(0) == 0

        @pl.when(first)
        def _init():
            def zrow(r, c):
                for i in range(16):
                    dobj_ref[r, i] = jnp.zeros((), dtype)
                for i in range(n_prim_cols):
                    dprim_ref[r, i] = jnp.zeros((), dtype)
                return c

            lax.fori_loop(0, n_trees * L, zrow, 0)

        buf = buf_ref[:]
        p_rows = [buf[0], buf[1], buf[2]]
        v_rows = [buf[3], buf[4], buf[5]]
        d_bd = buf[6]
        d_bn = buf[7:10]
        win = win_ref[:]
        lo = code_ref[0]
        hi = code_ref[1]

        def tree_bwd(t, acc):
            ap, av = acc
            row0 = t * L
            mats_j = [
                [[objtx_ref[row0 + j, 4 * i + k] for k in range(4)]
                 for i in range(4)]
                for j in range(L)
            ]
            prim_rows_j = [
                [prim_ref[row0 + j, i] for i in range(n_prim_cols)]
                for j in range(L)
            ]
            scale_j = [scale_ref[row0 + j] for j in range(L)]
            code = lo + t
            sel = ((win == code) & (code < hi)).astype(dtype)
            gd = d_bd * sel
            gn = d_bn * sel[None]

            def evalf(mj, pj, pr, vr):
                return ft._wide_tree_eval(
                    template, fast, types_pos, scale_j, needs_pos,
                    mj, pj, pr, vr,
                )[0]

            _, vjp_fn = jax.vjp(evalf, mats_j, prim_rows_j, p_rows, v_rows)
            g_mats, g_prims, g_p, g_v = vjp_fn((gd, gn))
            for j in range(L):
                for i in range(4):
                    for k in range(4):
                        dobj_ref[row0 + j, 4 * i + k] = (
                            dobj_ref[row0 + j, 4 * i + k] + g_mats[j][i][k]
                        )
                for i in range(n_prim_cols):
                    dprim_ref[row0 + j, i] = (
                        dprim_ref[row0 + j, i] + g_prims[j][i]
                    )
            return (ap + jnp.stack(g_p), av + jnp.stack(g_v))

        shape = p_rows[0].shape
        acc = (
            jnp.zeros((3,) + shape, dtype),
            jnp.zeros((3,) + shape, dtype),
        )
        C = subchunk

        def sub_bwd(c, a):
            start = c * C
            stop = jnp.minimum(start + C, n_trees)
            won = (win >= lo + start) & (win < jnp.minimum(lo + stop, hi))
            return lax.cond(
                jnp.max(won.astype(dtype)) > 0,
                lambda aa: lax.fori_loop(start, stop, tree_bwd, aa),
                lambda aa: aa,
                a,
            )

        acc = lax.fori_loop(0, nsub, sub_bwd, acc)
        dpv_ref[:] = jnp.concatenate(acc)

    return kernel


@lru_cache(maxsize=64)
def _make_staged_tail_kernel(
    spec: SceneSpec, config: TraceConfig, is0: bool, n_glass_rows: int,
    loss_key=None, loss_drec=None, generic: bool = False,
):
    """One generation's TAIL vjp as a Pallas kernel (scene-geometry-free).

    The first staged implementation ran the tail vjp + carry
    reconstruction + cotangent-buffer packing as per-generation XLA ops;
    measured on v5e that glue cost ~22-28 ms of the ~57-62 ms step (vs
    ~6-10 ms for the actual tree sweeps) — sub-8-sublane row arrays and
    per-generation pad/reshape copies dominate.  This kernel does the
    whole per-generation scalar chain in VMEM:

    * reconstructs the generation's input carry (records rows, or the
      true initial state when ``is0``);
    * synthesizes the loss cotangent rows (``loss_drec``) or reads the
      generic ``drec`` block;
    * applies ``jax.vjp`` of the pure ``ft._wide_tail``;
    * writes the chunk kernels' input buffer ``buf = [p3, v3, d_best_d,
      d_best_n]`` (already tiled) and the carry-bar cotangent block, and
      accumulates glass cotangents in SMEM across the ray grid.

    ``loss_key`` only keys the cache (the drec closure is not hashable
    by content); callers pass the loss descriptor itself.
    """
    del loss_key

    def kernel(*refs):
        if generic:
            (rec_ref, mask_ref, pmask_ref, state0_ref, fold_ref,
             glass_ref, drec_ref, cbar_ref,
             buf_ref, dcarry_ref, dglass_ref) = refs
            scal_ref = None
        else:
            (rec_ref, mask_ref, pmask_ref, state0_ref, fold_ref,
             glass_ref, scal_ref, cbar_ref,
             buf_ref, dcarry_ref, dglass_ref) = refs
            drec_ref = None
        rec = rec_ref[:]
        dtype = rec.dtype
        mask_g = mask_ref[:]
        fold5 = fold_ref[:]
        best_d, best_n, best_mat = fold5[0], fold5[1:4], fold5[4]
        best_pub = rec[5]
        if is0:
            s0 = state0_ref[:]
            p3_in, v3_in = s0[0:3], s0[4:7]
            carry_g = (
                p3_in, v3_in, s0[8], s0[9], s0[10], s0[11], s0[12],
                jnp.ones_like(mask_g),
            )
        else:
            p3_in, v3_in = rec[6:9], rec[12:15]
            carry_g = (
                p3_in, v3_in, rec[0], rec[1], rec[2], rec[3], rec[4],
                pmask_ref[:],
            )
        if generic:
            drec = drec_ref[:]
        else:
            drec = loss_drec(rec, mask_g, scal_ref)
        cb = cbar_ref[:]
        carry_bar = (
            cb[0:3], cb[3:6], cb[6], cb[7], cb[8], cb[9], cb[10],
            jnp.zeros_like(cb[6]),
        )
        glass_vals = _scalar_tables(glass_ref, n_glass_rows, matl.N_GLASS_COEFFS)

        def tailf(bd, bn, gv, cr):
            return ft._wide_tail(
                spec, config, _Rows(gv), bd, bn, best_mat, best_pub, cr
            )

        _, tail_vjp = jax.vjp(tailf, best_d, best_n, glass_vals, carry_g)
        d_bd, d_bn, g_gv, d_carry = tail_vjp(
            (carry_bar, drec, jnp.zeros_like(mask_g))
        )
        buf_ref[:] = jnp.concatenate((p3_in, v3_in, d_bd[None], d_bn))
        dcarry_ref[:] = jnp.concatenate(
            (
                d_carry[0], d_carry[1],
                d_carry[2][None], d_carry[3][None], d_carry[4][None],
                d_carry[5][None], d_carry[6][None],
            )
        )
        first = pl.program_id(0) == 0

        @pl.when(first)
        def _init():
            for m in range(n_glass_rows):
                for i in range(matl.N_GLASS_COEFFS):
                    dglass_ref[m, i] = jnp.zeros((), dtype)

        for m in range(n_glass_rows):
            for i in range(matl.N_GLASS_COEFFS):
                dglass_ref[m, i] = dglass_ref[m, i] + g_gv[m][i]

    return kernel


def _make_staged_singles_kernel(singles_infos, n_prim_cols):
    """The ungrouped singles' fold backward — one kernel, python-unrolled
    (singles total <= fused_trace._FUSED_MAX_LEAVES leaves by
    supports_fused_wide).  Table rows are the singles' leaves in plan
    order; codes are static.  Signature matches the group chunk kernel
    (code_ref present but unused) so the orchestration treats all chunk
    calls uniformly."""
    row_of = []
    r = 0
    for info in singles_infos:
        row_of.append(r)
        r += len(info["slots"])

    def kernel(objtx_ref, prim_ref, scale_ref, code_ref, buf_ref, win_ref,
               dobj_ref, dprim_ref, dpv_ref):
        del scale_ref, code_ref  # singles keep their static per-tree values
        dtype = buf_ref.dtype
        first = pl.program_id(0) == 0
        n_rows = r

        @pl.when(first)
        def _init():
            def zrow(rr, c):
                for i in range(16):
                    dobj_ref[rr, i] = jnp.zeros((), dtype)
                for i in range(n_prim_cols):
                    dprim_ref[rr, i] = jnp.zeros((), dtype)
                return c

            lax.fori_loop(0, n_rows, zrow, 0)

        buf = buf_ref[:]
        p_rows = [buf[0], buf[1], buf[2]]
        v_rows = [buf[3], buf[4], buf[5]]
        d_bd = buf[6]
        d_bn = buf[7:10]
        win = win_ref[:]

        d_p3 = jnp.zeros((3,) + p_rows[0].shape, dtype)
        d_v3 = jnp.zeros_like(d_p3)
        for si, info in enumerate(singles_infos):
            row0 = row_of[si]
            Lj = len(info["slots"])
            mats_j = [
                [[objtx_ref[row0 + j, 4 * i + k] for k in range(4)]
                 for i in range(4)]
                for j in range(Lj)
            ]
            prim_rows_j = [
                [prim_ref[row0 + j, i] for i in range(n_prim_cols)]
                for j in range(Lj)
            ]
            sel = (win == info["code"]).astype(dtype)
            gd = d_bd * sel
            gn = d_bn * sel[None]

            def evalf(mj, pj, pr, vr, info=info):
                return ft._wide_tree_eval(
                    info["template"], info["fast"], info["types_pos"],
                    info["scale_pos"], info["needs_pos"],
                    mj, pj, pr, vr,
                )[0]

            _, vjp_fn = jax.vjp(evalf, mats_j, prim_rows_j, p_rows, v_rows)
            g_mats, g_prims, g_p, g_v = vjp_fn((gd, gn))
            for j in range(Lj):
                for i in range(4):
                    for k in range(4):
                        dobj_ref[row0 + j, 4 * i + k] = (
                            dobj_ref[row0 + j, 4 * i + k] + g_mats[j][i][k]
                        )
                for i in range(n_prim_cols):
                    dprim_ref[row0 + j, i] = (
                        dprim_ref[row0 + j, i] + g_prims[j][i]
                    )
            d_p3 = d_p3 + jnp.stack(g_p)
            d_v3 = d_v3 + jnp.stack(g_v)
        dpv_ref[:] = jnp.concatenate((d_p3, d_v3))

    return kernel


def _run_bwd_staged(
    spec: SceneSpec,
    config: TraceConfig,
    interpret: bool,
    params,
    state0,
    records,
    masks,
    fold5,
    win,
    d_records=None,
    d_fstate=None,
    scal=None,
    loss_drec=None,
):
    """The staged wide backward (see the section comment above): returns
    ``(d_objtx (S, 16), d_prim, d_glass, d_state0 (13, n))`` — the same
    contract as :func:`_run_bwd` — without any Mosaic program seeing more
    than ``_STAGED_CHUNK_LEAVES`` leaves of scene table.

    ``fold5``/``win`` are the forward's saved fold outputs
    (build_fused_trace_fn(save_fold=True)); never-ran generations carry
    win = -1 and are additionally skipped whole via ``lax.cond`` on the
    dynamic trip count, mirroring the monolithic kernels."""
    import numpy as np

    generations = config.generation_limit
    loss_mode = loss_drec is not None
    dtype = records.dtype
    n = records.shape[-1]
    S = spec.n_leaves
    itemsize = jnp.dtype(dtype).itemsize
    r_rows = 64 if itemsize <= 4 else 32
    block = r_rows * ft.LANE
    n_pad = -(-n // block) * block

    obj_tx = affine_inverse(params["world"]).reshape(S, 16).astype(dtype)
    prim_p = params["prim"].astype(dtype)
    glass = params["glass"]
    if glass.shape[0] == 0:
        glass = jnp.zeros((1, matl.N_GLASS_COEFFS), dtype)
    glass = glass.astype(dtype)
    n_prim_cols = prim_p.shape[1]

    # the win codes saved by the forward enumerate trees in the
    # spatially-SORTED fold order, so chunk tables gather through the same
    # runtime slot vector (deterministic in params; non-differentiable)
    slots_arr, _ = ft._wide_runtime_tables(spec, params, dtype)
    slots_arr = lax.stop_gradient(slots_arr)
    meta_arr = jnp.asarray(ft._leaf_meta_table(spec), dtype)
    n_glass_rows = glass.shape[0]

    singles_infos, group_chunks = _staged_plan(spec)

    # uniform chunk-call list: (kernel_fn, row_slots (rows,) int32 traced,
    # code_lo/hi array, n_rows)
    chunk_calls = []
    if singles_infos:
        rows = np.concatenate(
            [np.asarray(info["slots"], np.int64) for info in singles_infos]
        )
        chunk_calls.append(
            (
                _make_staged_singles_kernel(singles_infos, n_prim_cols),
                jnp.asarray(rows, jnp.int32),
                jnp.zeros((2,), jnp.int32),
                len(rows),
            )
        )
    for info, ct, nc in group_chunks:
        T, L, off = info["T"], info["L"], info["off"]
        kern = _make_staged_group_kernel(
            info["template"], True, info["types_pos"],
            info["needs_pos"], ct, n_prim_cols,
            subchunk=_STAGED_SUBCHUNK_TREES,
        )
        for k in range(nc):
            trees = np.clip(np.arange(k * ct, (k + 1) * ct), 0, T - 1)
            pos = (
                off + (trees[:, None] * L + np.arange(L)[None, :])
            ).ravel()
            row_slots = slots_arr[jnp.asarray(pos, jnp.int32)]
            code = jnp.asarray(
                [info["code_base"] + k * ct, info["code_base"] + T], jnp.int32
            )
            chunk_calls.append((kern, row_slots, code, ct * L))

    masks_f = masks.astype(dtype)
    u = ft._LOOP_UNROLL
    while generations % u:
        u -= 1
    any_g = jnp.any(masks, axis=1)
    count1 = jnp.sum(any_g.astype(jnp.int32)) + 1
    ran = jnp.minimum(-(-count1 // u) * u, generations)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def vmem_rows(k):
        return pl.BlockSpec(
            (k, r_rows, ft.LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    vmem_1 = pl.BlockSpec(
        (r_rows, ft.LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    # EVERYTHING per-ray is tiled to (rows, LANE) ONCE, here, and the
    # whole reverse sweep — tail kernels, chunk kernels, cotangent adds —
    # stays in that layout.  The first implementation re-packed and
    # re-padded per generation in XLA; measured on v5e that glue plus the
    # XLA-side tail vjp cost ~22-28 ms of the ~60 ms step (design notes).
    def tile_all(x, fill=0):
        pad_width = [(0, 0)] * (x.ndim - 1) + [(0, n_pad - n)]
        return jnp.pad(x, pad_width, constant_values=fill).reshape(
            x.shape[:-1] + (n_pad // ft.LANE, ft.LANE)
        )

    rec_t = tile_all(records)                       # (G, 15, rows, L)
    mask_t = tile_all(masks_f)                      # (G, rows, L)
    fold_t = tile_all(fold5.astype(dtype))          # (G, 5, rows, L)
    # win pads with -1: 0 is a real fold code; -1 keeps the subchunk
    # winner skip exact for padded rays (their cotangents are already
    # zeroed by the zero-padded d_bd/d_bn rows either way)
    win_t = tile_all(win, fill=-1)                  # (G, rows, L) int32
    state0_t = tile_all(state0.astype(dtype))       # (13, rows, L)
    ones_t = jnp.ones_like(mask_t[0])
    if not loss_mode:
        drec_t = tile_all(d_records)                # (G, 15, rows, L)

    n_blocks = n_pad // block
    grid = (n_blocks,)

    def run_tail(g, carry_bar_t):
        is0 = g == 0
        tailk = _make_staged_tail_kernel(
            spec, config, is0, n_glass_rows,
            loss_key=None, loss_drec=loss_drec, generic=not loss_mode,
        )
        ins = [
            rec_t[g], mask_t[g],
            ones_t if is0 else mask_t[g - 1],
            state0_t, fold_t[g], glass,
            (drec_t[g] if not loss_mode else scal.astype(dtype)),
            carry_bar_t,
        ]
        in_specs = [
            vmem_rows(15), vmem_1, vmem_1, vmem_rows(13), vmem_rows(5),
            smem,
            (vmem_rows(15) if not loss_mode else smem),
            vmem_rows(11),
        ]
        return pl.pallas_call(
            tailk,
            grid=grid,
            in_specs=in_specs,
            out_specs=(vmem_rows(10), vmem_rows(11), smem),
            out_shape=(
                jax.ShapeDtypeStruct((10, n_pad // ft.LANE, ft.LANE), dtype),
                jax.ShapeDtypeStruct((11, n_pad // ft.LANE, ft.LANE), dtype),
                jax.ShapeDtypeStruct(
                    (n_glass_rows, matl.N_GLASS_COEFFS), dtype
                ),
            ),
            interpret=interpret,
        )(*ins)

    def gen_step(g, ops):
        carry_bar_t, d_obj_acc, d_prim_acc, d_glass_acc = ops
        buf_t, dcarry_t, g_gv = run_tail(g, carry_bar_t)
        d_glass_acc = d_glass_acc + g_gv

        dpv_sum = jnp.zeros((6, n_pad // ft.LANE, ft.LANE), dtype)
        for kern, row_slots, code, n_rows in chunk_calls:
            tbl_o = obj_tx[row_slots]
            tbl_p = prim_p[row_slots]
            tbl_s = meta_arr[row_slots, 2]
            d_obj_rows, d_prim_rows, dpv = pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[smem, smem, smem, smem, vmem_rows(10), vmem_1],
                out_specs=(smem, smem, vmem_rows(6)),
                out_shape=(
                    jax.ShapeDtypeStruct((n_rows, 16), dtype),
                    jax.ShapeDtypeStruct((n_rows, n_prim_cols), dtype),
                    jax.ShapeDtypeStruct(
                        (6, n_pad // ft.LANE, ft.LANE), dtype
                    ),
                ),
                interpret=interpret,
            )(tbl_o, tbl_p, tbl_s, code, buf_t, win_t[g])
            # pads repeat real rows with exact-zero contributions; XLA
            # scatter-add sums duplicate indices
            d_obj_acc = d_obj_acc.at[row_slots].add(d_obj_rows)
            d_prim_acc = d_prim_acc.at[row_slots].add(d_prim_rows)
            dpv_sum = dpv_sum + dpv

        new_bar = jnp.concatenate(
            (dcarry_t[0:6] + dpv_sum, dcarry_t[6:11])
        )
        return new_bar, d_obj_acc, d_prim_acc, d_glass_acc

    if loss_mode:
        carry_bar0 = jnp.zeros((11, n_pad // ft.LANE, ft.LANE), dtype)
    else:
        df = d_fstate.astype(dtype)
        carry_bar0 = tile_all(
            jnp.concatenate(
                (
                    df[0:3], df[4:7], df[8][None], df[9][None],
                    df[10][None], df[11][None], df[12][None],
                )
            )
        )
    ops = (
        carry_bar0,
        jnp.zeros((S, 16), dtype),
        jnp.zeros((S, n_prim_cols), dtype),
        jnp.zeros_like(glass),
    )
    for g in reversed(range(generations)):
        ops = lax.cond(
            g < ran, lambda o, g=g: gen_step(g, o), lambda o: o, ops
        )
    carry_bar_t, d_obj_acc, d_prim_acc, d_glass_acc = ops
    cb = carry_bar_t.reshape(11, n_pad)[:, :n]
    zero = jnp.zeros_like(cb[6])
    d_state0 = jnp.concatenate(
        (
            cb[0:3], zero[None],
            cb[3:6], zero[None],
            cb[6][None], cb[7][None], cb[8][None], cb[9][None], cb[10][None],
        )
    )
    return d_obj_acc, d_prim_acc, d_glass_acc, d_state0


# ---------------------------------------------------------------------------
# Fused losses: recognized scalar objectives whose record-cotangent is a
# closed form of (records, a few global scalars).  The generic custom_vjp
# path must materialize a full (G, 15, n) cotangent buffer through HBM —
# measured 2.4 ms of pure buffer traffic per 2^20-ray step on v5e, plus
# half the backward kernel's VMEM working set.  For these losses the
# backward kernel synthesizes the cotangent rows in VMEM instead.
# ---------------------------------------------------------------------------

# record row indices (engine record layout)
_R_SURF, _R_X0, _R_Y0 = 5, 6, 7
_R_Y1, _R_Z1 = 10, 11
_R_XT, _R_YT = 12, 13


class _LossPlan:
    """scalars(records, masks) -> (K,); value(scalars) -> scalar;
    drec(rec (15,R,L), mask (R,L), scal_ref) -> (15,R,L).  The LAST
    scalar slot is reserved for the upstream cotangent g."""

    def __init__(self, scalars, value, drec, n_scalars):
        self.scalars = scalars
        self.value = value
        self.drec = drec
        self.n_scalars = n_scalars


def _zeros_rows_like(template_rows, filled):
    """(15, R, L) block with only the rows in ``filled`` (index -> value)
    nonzero."""
    rows = [
        filled.get(i, jnp.zeros_like(template_rows[0]))
        for i in range(template_rows.shape[0])
    ]
    return jnp.stack(rows)


def _rms_plan(loss) -> _LossPlan:
    sid = float(loss.surface_id)

    def scalars(records, masks):
        dtype = records.dtype
        w = (masks & (records[:, _R_SURF, :] == sid)).astype(dtype)
        W = jnp.maximum(jnp.sum(w), 1.0)
        y = records[:, _R_Y1, :]
        z = records[:, _R_Z1, :]
        cy = jnp.sum(y * w) / W
        cz = jnp.sum(z * w) / W
        r2 = (y - cy) ** 2 + (z - cz) ** 2
        L = jnp.sqrt(jnp.sum(r2 * w) / W)
        return jnp.stack([cy, cz, W, L])

    def value(scal):
        return scal[3]

    def drec(rec, mask_g, scal_ref):
        # dL/dy1_i = m_i (y1_i - cy) / (W * L); centroid terms cancel
        # exactly (sum of m (y - cy) = 0).  L == 0 (all hits coincident)
        # is guarded to 0 gradient — the autodiff sqrt would NaN there.
        m = (mask_g > 0.5) & (rec[_R_SURF] == scal_ref[5])
        L = scal_ref[3]
        safe = jnp.where(L > 0, scal_ref[2] * L, 1.0)
        coef = jnp.where(m & (L > 0), scal_ref[4] / safe, 0.0)
        return _zeros_rows_like(
            rec,
            {
                _R_Y1: coef * (rec[_R_Y1] - scal_ref[0]),
                _R_Z1: coef * (rec[_R_Z1] - scal_ref[1]),
            },
        )

    # scal layout: [cy, cz, W, L, g, surface_id]
    return _LossPlan(scalars, value, drec, n_scalars=6)


def _focus_plan(loss) -> _LossPlan:
    sid = float(loss.surface_id)
    target = float(loss.target_focus)
    min_tilt = float(loss.min_tilt)

    def scalars(records, masks):
        dtype = records.dtype
        yt = records[:, _R_YT, :]
        tilted = jnp.abs(yt) > min_tilt
        w = (masks & (records[:, _R_SURF, :] == sid) & tilted).astype(dtype)
        W = jnp.maximum(jnp.sum(w), 1.0)
        safe_yt = jnp.where(tilted, yt, 1.0)
        t = records[:, _R_X0, :] - records[:, _R_XT, :] * records[:, _R_Y0, :] / safe_yt
        value = jnp.sum(w * (t - target) ** 2) / W
        return jnp.stack([W, value])

    def value(scal):
        return scal[1]

    def drec(rec, mask_g, scal_ref):
        yt = rec[_R_YT]
        tilted = jnp.abs(yt) > scal_ref[4]
        m = (mask_g > 0.5) & (rec[_R_SURF] == scal_ref[3]) & tilted
        safe_yt = jnp.where(tilted, yt, 1.0)
        t = rec[_R_X0] - rec[_R_XT] * rec[_R_Y0] / safe_yt
        base = jnp.where(m, 2.0 * (t - scal_ref[5]) * scal_ref[2] / scal_ref[0], 0.0)
        return _zeros_rows_like(
            rec,
            {
                _R_X0: base,
                _R_XT: base * (-rec[_R_Y0] / safe_yt),
                _R_Y0: base * (-rec[_R_XT] / safe_yt),
                _R_YT: base * (rec[_R_XT] * rec[_R_Y0] / (safe_yt * safe_yt)),
            },
        )

    # scal layout: [W, value, g, surface_id, min_tilt, target]
    return _LossPlan(scalars, value, drec, n_scalars=6)


def _soft_focus_plan(loss) -> _LossPlan:
    """soft_focus_error's cotangent: the t-chain terms of the plain focus
    plan, PLUS weight-derivative terms — w depends on (y1, z1, y_tilt)
    through the C1 windows, and d/dw_i of a weighted mean is
    ((e_i^2 - L) / W).  Smoothstep s(t) = t^2(3-2t) has s'(t) = 6t(1-t)
    on [0, 1], 0 outside — all closed-form in-kernel."""
    sid = float(loss.surface_id)
    target = float(loss.target_focus)
    hy, hz = (float(v) for v in loss.half_widths)
    ramp = float(loss.ramp)
    t0, t1 = (float(v) for v in loss.tilt_ramp)

    from pyrayt_tpu.analysis.metrics import smoothstep

    def _sprime(u):
        u_in = (u > 0) & (u < 1)
        return jnp.where(u_in, 6.0 * u * (1.0 - u), 0.0)

    def _weights(surf, mask_b, y1, z1, yt):
        m = mask_b & (surf == sid)
        wy = smoothstep((hy - jnp.abs(y1)) / ramp)
        wz = smoothstep((hz - jnp.abs(z1)) / ramp)
        wt = smoothstep((jnp.abs(yt) - t0) / (t1 - t0))
        w = jnp.where(m, wy * wz, 0.0) * wt
        return m, wy, wz, wt, w

    def scalars(records, masks):
        surf = records[:, _R_SURF, :]
        y1 = records[:, _R_Y1, :]
        z1 = records[:, _R_Z1, :]
        yt = records[:, _R_YT, :]
        _, _, _, _, w = _weights(surf, masks, y1, z1, yt)
        W = jnp.maximum(jnp.sum(w), 1e-12)
        safe_yt = jnp.where(jnp.abs(yt) > t0, yt, t0)
        t = records[:, _R_X0, :] - records[:, _R_XT, :] * records[:, _R_Y0, :] / safe_yt
        value = jnp.sum(w * (t - target) ** 2) / W
        return jnp.stack([W, value])

    def value(scal):
        return scal[1]

    def drec(rec, mask_g, scal_ref):
        W, L, g = scal_ref[0], scal_ref[1], scal_ref[2]
        y1, z1, yt = rec[_R_Y1], rec[_R_Z1], rec[_R_YT]
        m, wy, wz, wt, w = _weights(rec[_R_SURF], mask_g > 0.5, y1, z1, yt)
        tilted = jnp.abs(yt) > t0
        safe_yt = jnp.where(tilted, yt, t0)
        t = rec[_R_X0] - rec[_R_XT] * rec[_R_Y0] / safe_yt
        e = t - target
        base = 2.0 * e * w / W * g          # t-chain coefficient
        dE = (e * e - L) / W * g            # d loss / d w_i
        # weight derivatives (chain through |.|)
        dwy = _sprime((hy - jnp.abs(y1)) / ramp) * (-jnp.sign(y1) / ramp)
        dwz = _sprime((hz - jnp.abs(z1)) / ramp) * (-jnp.sign(z1) / ramp)
        dwt = _sprime((jnp.abs(yt) - t0) / (t1 - t0)) * (jnp.sign(yt) / (t1 - t0))
        mf = m.astype(rec.dtype)
        # dt/dyt is zero where safe_yt is the clamped constant
        t_yt = jnp.where(
            tilted, base * rec[_R_XT] * rec[_R_Y0] / (safe_yt * safe_yt), 0.0
        )
        return _zeros_rows_like(
            rec,
            {
                _R_X0: base,
                _R_XT: base * (-rec[_R_Y0] / safe_yt),
                _R_Y0: base * (-rec[_R_XT] / safe_yt),
                _R_YT: t_yt + mf * wy * wz * dwt * dE,
                _R_Y1: mf * dwy * wz * wt * dE,
                _R_Z1: mf * wy * dwz * wt * dE,
            },
        )

    # scal layout: [W, value, g]; statics baked into the closures
    return _LossPlan(scalars, value, drec, n_scalars=3)


def loss_plan(loss):
    """The fused in-kernel plan for a recognized loss descriptor, or None.

    Recognized: :class:`pyrayt_tpu.analysis.metrics.RmsSpotRadius`,
    :class:`~.FocusError` and :class:`~.SoftFocusError`
    (detector-restricted — the recommended objectives).  Anything else
    differentiates through the generic custom_vjp path.
    """
    from pyrayt_tpu.analysis import metrics as _m

    if isinstance(loss, _m.RmsSpotRadius) and loss.surface_id is not None:
        return _rms_plan(loss)
    if isinstance(loss, _m.FocusError) and loss.surface_id is not None:
        return _focus_plan(loss)
    if isinstance(loss, _m.SoftFocusError) and loss.surface_id is not None:
        return _soft_focus_plan(loss)
    return None


@lru_cache(maxsize=64)
def build_fused_value_and_grad_fn(
    spec: SceneSpec, materials, config: TraceConfig, loss, interpret: bool = False
):
    """``fn(params, rays) -> scalar`` for a recognized loss descriptor,
    reverse-mode differentiable with the loss-fused backward kernel:
    ``jax.value_and_grad(fn)`` runs fused forward -> tiny scalar
    reductions -> loss-aware Pallas backward.  Raises ValueError for
    unrecognized losses (callers should fall back to
    build_fused_vjp_trace_fn).
    """
    from pyrayt_tpu.tracer.rayset import RaySet

    plan = loss_plan(loss)
    if plan is None:
        raise ValueError(f"loss {loss!r} has no fused plan")
    if not (ft.supports_fused(spec) or ft.supports_fused_wide(spec)):
        raise ValueError("scene has non-packed materials; use the XLA engine")
    mode = wide_grad_mode(spec, config)
    staged = mode == "staged"
    assert ft._ZERO_RECORDS

    fwd_fn = ft.build_fused_trace_fn(spec, materials, config, interpret=interpret)
    if staged:
        fwd_fold_fn = ft.build_fused_trace_fn(
            spec, materials, config, interpret=interpret, save_fold=True
        )

    def _static_tail(loss):
        from pyrayt_tpu.analysis import metrics as _m

        if isinstance(loss, _m.RmsSpotRadius):
            return (float(loss.surface_id),)
        if isinstance(loss, _m.FocusError):
            return (
                float(loss.surface_id),
                float(loss.min_tilt),
                float(loss.target_focus),
            )
        return ()  # SoftFocusError bakes its statics into the plan closures

    tail = _static_tail(loss)

    @jax.custom_vjp
    def traced_loss(params, rays: RaySet):
        result = fwd_fn(params, rays)
        return plan.value(plan.scalars(result.records, result.record_mask))

    def fwd_rule(params, rays):
        if staged:
            result, fold5, win = fwd_fold_fn(params, rays)
        else:
            result = fwd_fn(params, rays)
            fold5 = win = None
        scal = plan.scalars(result.records, result.record_mask)
        return plan.value(scal), (
            params, rays, result.records, result.record_mask, scal, fold5, win
        )

    def bwd_rule(residuals, g):
        params, initial_rays, records, masks, scal, fold5, win = residuals
        dtype = records.dtype
        scal_full = jnp.concatenate(
            (
                scal,
                jnp.asarray(g, dtype)[None],
                jnp.asarray(tail, dtype),
            )
        )
        state0 = jnp.concatenate(
            (initial_rays.positions, initial_rays.directions, initial_rays.metadata)
        )
        if staged:
            d_objtx, d_prim, d_glass, d_state0 = _run_bwd_staged(
                spec, config, interpret, params, state0, records, masks,
                fold5, win, scal=scal_full, loss_drec=plan.drec,
            )
        else:
            d_objtx, d_prim, d_glass, d_state0 = _run_bwd(
                spec, config, interpret, params, state0, records, masks,
                scal=scal_full, loss_drec=plan.drec,
            )

        _, inv_vjp = jax.vjp(
            lambda w: affine_inverse(w).reshape(spec.n_leaves, 16),
            params["world"],
        )
        (d_world,) = inv_vjp(d_objtx.astype(params["world"].dtype))

        d_glass_out = d_glass.astype(params["glass"].dtype)
        if params["glass"].shape[0] == 0:
            d_glass_out = jnp.zeros_like(params["glass"])
        else:
            d_glass_out = d_glass_out[: params["glass"].shape[0]]

        d_params = jax.tree_util.tree_map(jnp.zeros_like, params)
        d_params["world"] = d_world
        d_params["prim"] = d_prim.astype(params["prim"].dtype)
        d_params["glass"] = d_glass_out

        rd = initial_rays.positions.dtype
        d_rays = initial_rays.replace(
            positions=d_state0[0:4].astype(rd),
            directions=d_state0[4:8].astype(rd),
            generation=d_state0[8].astype(rd),
            intensity=d_state0[9].astype(rd),
            wavelength=d_state0[10].astype(rd),
            index=d_state0[11].astype(rd),
            id=d_state0[12].astype(rd),
        )
        return d_params, d_rays

    traced_loss.defvjp(fwd_rule, bwd_rule)
    return jax.jit(traced_loss)


@lru_cache(maxsize=64)
def build_fused_vjp_trace_fn(
    spec: SceneSpec, materials, config: TraceConfig, interpret: bool = False
):
    """``fn(params, rays) -> TraceResult``, same contract as
    fused_trace.build_fused_trace_fn, but reverse-mode differentiable:
    ``jax.grad`` of any function of ``result.records`` (and/or
    ``result.final_rays``) runs the Pallas backward kernel instead of the
    XLA scan engine's saved-residual path.
    """
    from pyrayt_tpu.tracer.engine import N_RECORD_COLS, TraceResult
    from pyrayt_tpu.tracer.rayset import RaySet

    if not (ft.supports_fused(spec) or ft.supports_fused_wide(spec)):
        raise ValueError("scene has non-packed materials; use the XLA engine")
    mode = wide_grad_mode(spec, config)
    staged = mode == "staged"
    # never-ran generations' record rows double as this kernel's "state is
    # zero, step is an identity" sentinel — the forward must zero-fill them
    assert ft._ZERO_RECORDS, "fused backward requires zero-filled records"

    generations = config.generation_limit
    fwd_fn = ft.build_fused_trace_fn(spec, materials, config, interpret=interpret)
    if staged:
        fwd_fold_fn = ft.build_fused_trace_fn(
            spec, materials, config, interpret=interpret, save_fold=True
        )

    def _bwd_pallas(params, state0, d_records, d_fstate, records, masks,
                    fold5, win):
        if staged:
            return _run_bwd_staged(
                spec, config, interpret, params, state0, records, masks,
                fold5, win, d_records=d_records, d_fstate=d_fstate,
            )
        return _run_bwd(
            spec, config, interpret, params, state0, records, masks,
            d_records=d_records, d_fstate=d_fstate,
        )

    @jax.custom_vjp
    def trace(params, initial_rays: RaySet) -> TraceResult:
        return fwd_fn(params, initial_rays)

    def trace_fwd(params, initial_rays):
        if staged:
            result, fold5, win = fwd_fold_fn(params, initial_rays)
        else:
            result = fwd_fn(params, initial_rays)
            fold5 = win = None
        return result, (
            params, initial_rays, result.records, result.record_mask,
            fold5, win,
        )

    def trace_bwd(residuals, g: TraceResult):
        params, initial_rays, records, masks, fold5, win = residuals
        dtype = records.dtype

        def _cot(x, shape):
            # float0 / None cotangents (bool + int outputs) become zeros
            if x is None or (hasattr(x, "dtype") and x.dtype == jax.dtypes.float0):
                return jnp.zeros(shape, dtype)
            return jnp.asarray(x, dtype)

        d_records = _cot(g.records, records.shape)
        n = records.shape[-1]
        fr = g.final_rays
        d_fstate = jnp.concatenate(
            (
                _cot(fr.positions, (4, n)),
                _cot(fr.directions, (4, n)),
                _cot(fr.generation, (n,))[None],
                _cot(fr.intensity, (n,))[None],
                _cot(fr.wavelength, (n,))[None],
                _cot(fr.index, (n,))[None],
                _cot(fr.id, (n,))[None],
            )
        )
        state0 = jnp.concatenate(
            (
                initial_rays.positions,
                initial_rays.directions,
                initial_rays.metadata,
            )
        )
        d_objtx, d_prim, d_glass, d_state0 = _bwd_pallas(
            params, state0, d_records, d_fstate, records, masks, fold5, win
        )

        # chain through the outside-kernel pre-processing: obj_tx =
        # affine_inverse(world).reshape(S, 16)
        _, inv_vjp = jax.vjp(
            lambda w: affine_inverse(w).reshape(spec.n_leaves, 16),
            params["world"],
        )
        (d_world,) = inv_vjp(d_objtx.astype(params["world"].dtype))

        d_glass_out = d_glass.astype(params["glass"].dtype)
        if params["glass"].shape[0] == 0:
            d_glass_out = jnp.zeros_like(params["glass"])
        else:
            d_glass_out = d_glass_out[: params["glass"].shape[0]]

        # zero cotangents for any params-pytree leaves the kernel never
        # reads, then fill in the three it does
        d_params = jax.tree_util.tree_map(jnp.zeros_like, params)
        d_params["world"] = d_world
        d_params["prim"] = d_prim.astype(params["prim"].dtype)
        d_params["glass"] = d_glass_out

        rd = initial_rays.positions.dtype
        d_rays = initial_rays.replace(
            positions=d_state0[0:4].astype(rd),
            directions=d_state0[4:8].astype(rd),
            generation=d_state0[8].astype(rd),
            intensity=d_state0[9].astype(rd),
            wavelength=d_state0[10].astype(rd),
            index=d_state0[11].astype(rd),
            id=d_state0[12].astype(rd),
        )
        return d_params, d_rays

    trace.defvjp(trace_fwd, trace_bwd)
    return jax.jit(trace)
