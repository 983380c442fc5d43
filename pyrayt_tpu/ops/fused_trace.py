"""Fused Pallas trace kernel: the whole bounce loop in VMEM.

The XLA engine (pyrayt_tpu/tracer/engine.py) runs the generation loop as a
``lax.scan`` whose step is dozens of small fused kernels; every intermediate
round-trips HBM, so at 1M rays the trace is HBM-bandwidth-bound on traffic
that never needed to leave the chip.  This module compiles the *entire*
trace — every PROPAGATE + INTERACT + RECORD generation — into one Pallas
kernel blocked over the ray axis:

* each grid step loads a ``(13, B)`` ray-state block into VMEM once,
* runs all ``generation_limit`` bounces on it without touching HBM
  (scene constants live in SMEM; transforms are scalarized multiply-adds,
  CSG is the comparator-network engine — pure VPU work),
* and writes only the mandatory outputs: the ``(G, 15, B)`` record block,
  per-generation living masks, and the final ray state.

HBM traffic drops to the information-theoretic floor (state in + records +
state out).  Physics parity is with engine._generation_step — the two paths
are asserted equal in tests/test_ops/test_fused_trace.py.

Scope: forward tracing only (Pallas kernels are not reverse-mode
differentiable); gradient work uses the XLA engine path.  Supported when
every material is packed (absorber / mirror / glass — reference
materials.py has no others; custom Python materials fall back to XLA).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
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

__all__ = ["supports_fused", "build_fused_trace_fn", "on_tpu"]

_PACKED_KINDS = (matl.KIND_ABSORB, matl.KIND_MIRROR, matl.KIND_GLASS)


def on_tpu() -> bool:
    """True when JAX's default device is a TPU (incl. the axon relay)."""
    dev = jax.devices()[0]
    return "tpu" in dev.platform.lower() or "TPU" in getattr(dev, "device_kind", "")


def supports_fused(spec: SceneSpec) -> bool:
    """The fused kernel covers every reference material; custom Python
    TracableMaterials (arbitrary host code) fall back to the XLA engine."""
    return (
        spec.n_leaves > 0
        and all(spec.mat_packed)
        and all(k in _PACKED_KINDS for k in spec.mat_kinds)
    )


# ---------------------------------------------------------------------------
# scalarized helpers (SMEM scalar reads -> broadcast VPU math; no tiny
# matmuls, no gathers)
# ---------------------------------------------------------------------------


def _mat_rows(ref, s):
    """A 4x4 transform as nested scalars from a flattened (S, 16) SMEM ref."""
    return [[ref[s, 4 * i + j] for j in range(4)] for i in range(4)]


def _apply44(m_rows, x):
    """y_i = sum_j M[i][j] * x[j] for x (4, B) — scalar-broadcast FMAs."""
    return jnp.stack(
        [
            m_rows[i][0] * x[0] + m_rows[i][1] * x[1] + m_rows[i][2] * x[2] + m_rows[i][3] * x[3]
            for i in range(4)
        ]
    )


def _apply44_transpose(m_rows, x):
    """y_i = sum_j M[j][i] * x[j] (the normals' inverse-transpose path)."""
    return jnp.stack(
        [
            m_rows[0][i] * x[0] + m_rows[1][i] * x[1] + m_rows[2][i] * x[2] + m_rows[3][i] * x[3]
            for i in range(4)
        ]
    )


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
    """matl.index_from_coeffs on a [A, b1..b3, c1..c3] row of SMEM scalars."""
    wl2 = wavelength * wavelength
    n2 = gr[slot, 0]
    for i in range(3):
        n2 = n2 + gr[slot, 1 + i] * wl2 / (wl2 - gr[slot, 4 + i])
    return jnp.sqrt(n2)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _make_kernel(spec: SceneSpec, config: TraceConfig, generations: int):
    # local import: engine <-> fused_trace is intentionally one-way at
    # runtime (engine dispatches here lazily); _eval_tree is pure jnp
    from pyrayt_tpu.tracer.engine import _eval_tree

    def step(objtx_ref, prim_ref, glass_ref, carry):
        """One generation on in-VMEM values (parity: engine._generation_step)."""
        p_old, v_old, gen, inten, wav, ridx, rid, alive = carry
        dtype = p_old.dtype
        mats = [_mat_rows(objtx_ref, s) for s in range(spec.n_leaves)]

        # PROPAGATE: leaf hits -> CSG trees -> nearest positive hit
        leaf_hits = []
        for s, t in enumerate(spec.leaf_types):
            local = jnp.stack((_apply44(mats[s], p_old), _apply44(mats[s], v_old)))
            leaf_hits.append(_leaf_intersect_scalar(t, local, prim_ref, s))

        hit_distances = jnp.full_like(p_old[0], jnp.inf)
        hit_leaf = jnp.full(p_old[0].shape, -1, dtype=jnp.int32)
        for tree in spec.trees:
            shape_hits, shape_ids = _eval_tree(tree, leaf_hits)
            for row in range(shape_hits.shape[0]):
                cand = jnp.where(shape_hits[row] > 0, shape_hits[row], jnp.inf)
                new_min = cand < hit_distances
                hit_distances = jnp.where(new_min, cand, hit_distances)
                hit_leaf = jnp.where(new_min, shape_ids[row], hit_leaf)
        no_hit = hit_leaf < 0

        # advance to hit point
        t_safe = jnp.where(no_hit, 0.0, hit_distances)
        p_hit = p_old + t_safe * v_old

        # world normals of the hit leaf (masked accumulation, gather-free)
        normals = jnp.zeros_like(p_hit)
        for s, t in enumerate(spec.leaf_types):
            local_p = _apply44(mats[s], p_hit)
            ln = _leaf_normal_scalar(t, local_p, prim_ref, s)
            wn = prim._zero_w(_apply44_transpose(mats[s], ln))
            sq = _sum_rows(wn * wn)
            zero = sq == 0
            wn = jnp.where(zero, wn, wn / jnp.sqrt(jnp.where(zero, 1.0, sq)))
            wn = wn * spec.leaf_normal_scale[s]
            normals = jnp.where(hit_leaf == s, wn, normals)

        # INTERACT: leaf -> material slot, masked branchless physics
        ray_slot = jnp.zeros_like(hit_leaf)
        for s, slot in enumerate(spec.leaf_mat_slot):
            ray_slot = jnp.where(hit_leaf == s, slot, ray_slot)

        new_dir = jnp.where(no_hit, 0.0, v_old)
        new_index = ridx
        new_inten = inten
        for slot, kind in enumerate(spec.mat_kinds):
            mask = (ray_slot == slot) & ~no_hit
            if kind == matl.KIND_ABSORB:
                d2, i2, t2 = jnp.zeros_like(v_old), ridx, inten
            elif kind == matl.KIND_MIRROR:
                d2, i2, t2 = reflect(v_old, normals), ridx, inten
            else:  # KIND_GLASS
                n2 = _index_from_scalars(glass_ref, slot, wav)
                d2, i2 = refract(
                    v_old, normals, ridx, n2, n_global=config.world_index
                )
                t2 = inten
            new_dir = jnp.where(mask, d2, new_dir)
            new_index = jnp.where(mask, i2, new_index)
            new_inten = jnp.where(mask, t2, new_inten)

        # death rules (Q1: intensity test opt-in, as in the XLA engine)
        absorbed = jnp.isclose(_norm_rows(v_old), 0)
        dead = absorbed | no_hit
        if config.apply_intensity_threshold:
            dead = dead | (inten < config.intensity_threshold)
        living = alive & ~dead

        # RECORD block (parity: _RayTraceDataframe.insert, _pyrayt.py:168-186)
        public_id = jnp.zeros_like(p_old[0])
        for s, leaf_id in enumerate(spec.leaf_ids):
            public_id = jnp.where(hit_leaf == s, jnp.asarray(leaf_id, dtype), public_id)
        tilt = safe_normalize(v_old[:3], axis=0)
        record = jnp.concatenate(
            (
                gen[None], inten[None], wav[None], ridx[None], rid[None],
                public_id[None],
                p_old[:3], p_hit[:3], tilt,
            )
        )

        new_p = jnp.where(living, p_hit + config.ray_offset * new_dir, p_hit)
        new_gen = jnp.where(living, gen + 1, gen)
        return (new_p, new_dir, new_gen, new_inten, wav, new_index, rid, living), record

    def kernel(state_ref, objtx_ref, prim_ref, glass_ref, rec_ref, mask_ref, fstate_ref):
        state = state_ref[:]
        carry = (
            state[0:4],   # positions
            state[4:8],   # directions
            state[8],     # generation
            state[9],     # intensity
            state[10],    # wavelength
            state[11],    # index
            state[12],    # id
            jnp.ones_like(state[8], dtype=bool),  # alive
        )
        # unrolled generation loop: every bounce stays in VMEM/registers
        for g in range(generations):
            carry, record = step(objtx_ref, prim_ref, glass_ref, carry)
            rec_ref[g] = record
            mask_ref[g] = carry[-1].astype(state.dtype)
        p, v, gen, inten, wav, ridx, rid, _ = carry
        fstate_ref[:] = jnp.concatenate(
            (p, v, gen[None], inten[None], wav[None], ridx[None], rid[None])
        )

    return kernel


def _block_rays(generations: int) -> int:
    """Largest 128-multiple block whose record output fits ~3 MB of VMEM."""
    budget = 3 * 1024 * 1024 // (generations * 15 * 4)
    return max(128, min(2048, (budget // 128) * 128))


@lru_cache(maxsize=64)
def build_fused_trace_fn(spec: SceneSpec, materials, config: TraceConfig):
    """Build the fused-kernel trace: ``fn(params, rays) -> TraceResult``.

    Same contract as engine.build_trace_fn (records / record_mask /
    final_rays / generations_run), forward-only.  ``materials`` is accepted
    for signature parity; all packed kinds are compiled from the glass table.
    """
    from pyrayt_tpu.tracer.engine import N_RECORD_COLS, TraceResult
    from pyrayt_tpu.tracer.rayset import RaySet

    if not supports_fused(spec):
        raise ValueError("scene has non-packed materials; use the XLA engine")

    generations = config.generation_limit
    block = _block_rays(generations)
    kernel = _make_kernel(spec, config, generations)
    interpret = not on_tpu()

    @jax.jit
    def trace(params, initial_rays: RaySet) -> TraceResult:
        n = initial_rays.n_rays
        dtype = initial_rays.positions.dtype
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

        obj_tx = affine_inverse(params["world"]).reshape(spec.n_leaves, 16)
        prim_p = params["prim"]
        glass = params["glass"]
        if glass.shape[0] == 0:  # SMEM refs need >= 1 row
            glass = jnp.zeros((1, matl.N_GLASS_COEFFS), dtype)

        records, masks, fstate = pl.pallas_call(
            kernel,
            grid=(n_pad // block,),
            in_specs=[
                pl.BlockSpec((13, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec(
                    (generations, N_RECORD_COLS, block),
                    lambda i: (0, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (generations, block), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((13, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((generations, N_RECORD_COLS, n_pad), dtype),
                jax.ShapeDtypeStruct((generations, n_pad), dtype),
                jax.ShapeDtypeStruct((13, n_pad), dtype),
            ),
            interpret=interpret,
        )(
            state,
            obj_tx.astype(dtype),
            prim_p.astype(dtype),
            glass.astype(dtype),
        )

        records = records[:, :, :n]
        masks = masks[:, :n] > 0.5
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
