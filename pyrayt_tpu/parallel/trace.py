"""Sharded trace execution and the distributed training (optimization) step.

Two entry points:

* :func:`sharded_trace` / :func:`build_sharded_trace_fn` — the forward
  path: one jitted program whose ray-axis inputs/outputs are sharded over
  the mesh.  Because rays are independent, XLA partitions the whole trace
  with zero communication; the per-shard program is identical to the
  single-device one.

* :func:`build_train_step` — the "training step" of this domain: one
  gradient-descent update of the differentiable scene parameters (lens
  curvatures, positions, glass coefficients) against a trace-derived loss
  (e.g. RMS spot size).  Rays are sharded (DP), parameters replicated, and
  the loss/grad reductions psum over the mesh — the exact layout SURVEY.md
  §2.3 prescribes (grad all-reduce is O(10-100) scalars: latency-bound,
  rides ICI).

Pipeline/expert parallelism are deliberate non-goals (SURVEY.md §2.3): the
bounce loop is a short sequential ``lax.scan`` and material dispatch is a
branch-free masked select, so there is nothing to pipeline or route.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pyrayt_tpu.config import TraceConfig
from pyrayt_tpu.scene.compile import CompiledScene
from pyrayt_tpu.tracer import engine
from pyrayt_tpu.tracer.rayset import RaySet
from pyrayt_tpu.parallel.mesh import pad_rayset, rayset_sharding, shard_rayset

__all__ = ["build_sharded_trace_fn", "sharded_trace", "build_train_step"]


def build_sharded_trace_fn(
    scene: CompiledScene,
    config: TraceConfig,
    mesh: Mesh,
    use_fused: Optional[bool] = None,
    itemsize: int = 4,
):
    """Jit the trace with ray-axis input shardings pinned to ``mesh``.

    Returns ``fn(params, rays: RaySet) -> TraceResult`` whose record buffers
    stay sharded on device (fetch once at the end — SURVEY.md §7 stage 8).

    ``use_fused`` mirrors ``TraceConfig.use_fused`` for the multi-device
    path: the fused Pallas kernel is a single-device program, so it runs
    under ``shard_map`` — each shard traces its rays independently and only
    the ``generations_run`` scalar is max-reduced.  ``None`` picks it
    automatically on TPU for supported scenes; ``False`` keeps the XLA
    engine (which XLA partitions from the sharding annotations alone).

    ``itemsize`` is the ray dtype's byte width used by the VMEM feasibility
    check (4 for the float32 production path; pass 8 when tracing f64 rays
    so the check matches what the kernel recomputes at trace time).
    """
    from pyrayt_tpu.ops import fused_trace as ft

    if use_fused is not None:
        config = TraceConfig(**{**config.__dict__, "use_fused": use_fused})
    if ft.pick_fused(scene.spec, config, itemsize):
        return _build_shard_mapped_fused(scene, config, mesh, ft)

    base = engine.build_trace_fn(scene.spec, scene.materials, config)
    replicated = NamedSharding(mesh, P())
    in_shardings = (
        jax.tree_util.tree_map(lambda _: replicated, scene.params),
        rayset_sharding(mesh),
    )
    return jax.jit(base, in_shardings=in_shardings)


def _build_shard_mapped_fused(scene, config, mesh, ft, vjp: bool = False):
    """shard_map the fused kernel: per-shard traces, zero collectives except
    the pmax of generations_run.

    ``vjp=True`` wraps the reverse-mode variant (ops/fused_grad.py): the
    shard_map transpose then inserts the psum of per-shard parameter
    cotangents automatically, which is the entire gradient communication of
    this domain (O(#scene params) scalars over ICI).

    The interpret-vs-Mosaic choice is made at *call* time, not build time: a
    fn built before TPU initialization must still run compiled once a TPU is
    the default backend (each variant is built once and memoized)."""
    shard_map = jax.shard_map

    axes = mesh.axis_names
    ray_spec = P(axes)
    vec_spec = P(None, axes)

    params_specs = jax.tree_util.tree_map(lambda _: P(), scene.params)
    rays_specs = RaySet(
        positions=vec_spec,
        directions=vec_spec,
        generation=ray_spec,
        intensity=ray_spec,
        wavelength=ray_spec,
        index=ray_spec,
        id=ray_spec,
    )
    result_specs = engine.TraceResult(
        records=P(None, None, axes),
        record_mask=P(None, axes),
        final_rays=rays_specs,
        generations_run=P(),
    )

    def build(interpret: bool):
        if vjp:
            from pyrayt_tpu.ops import fused_grad

            fused = fused_grad.build_fused_vjp_trace_fn(
                scene.spec, scene.materials, config, interpret=interpret
            )
        else:
            fused = ft.build_fused_trace_fn(
                scene.spec, scene.materials, config, interpret=interpret
            )

        def local_trace(params, rays):
            result = fused(params, rays)
            # max-reduce generations_run across the mesh.  all_gather + max
            # instead of pmax: pmax has no differentiation rule, and the
            # vjp variant linearizes the whole program even though this
            # integer output carries no tangent.  Cost: axis_size ints.
            gens = result.generations_run
            for name in axes:
                gens = jnp.max(jax.lax.all_gather(gens, name))
            return result.replace(generations_run=gens)

        mapped = shard_map(
            local_trace,
            mesh=mesh,
            in_specs=(params_specs, rays_specs),
            out_specs=result_specs,
            # pallas_call out_shapes carry no varying-mesh-axes metadata,
            # which the replication checker requires; the out_specs above
            # are the truth, so skip the check
            check_vma=False,
        )
        return jax.jit(mapped)

    built = {}

    def dispatch(params, rays):
        interpret = not ft.on_tpu()
        if interpret not in built:
            built[interpret] = build(interpret)
        return built[interpret](params, rays)

    return dispatch


def sharded_trace(
    scene: CompiledScene,
    rays: RaySet,
    config: TraceConfig,
    mesh: Optional[Mesh] = None,
) -> engine.TraceResult:
    """Trace ``rays`` with the ray axis sharded over ``mesh`` (or a default
    mesh over all devices).  Pads the ray count to the mesh size; padding
    rays are born dead and never reach the results frame."""
    from pyrayt_tpu.parallel.mesh import default_mesh

    if mesh is None:
        mesh = default_mesh()
    rays, _ = pad_rayset(rays, mesh.size)
    rays = shard_rayset(rays, mesh)
    itemsize = jnp.dtype(rays.positions.dtype).itemsize
    fn = build_sharded_trace_fn(scene, config, mesh, itemsize=itemsize)
    return fn(scene.params, rays)


def build_train_step(
    scene: CompiledScene,
    config: TraceConfig,
    mesh: Mesh,
    loss_fn: Callable[[engine.TraceResult], jnp.ndarray],
    learning_rate: float = 1e-2,
    param_filter: Optional[Callable[[dict], dict]] = None,
    use_fused: Optional[bool] = None,
    itemsize: int = 4,
):
    """Build the jitted distributed optimization step.

    ``loss_fn(result) -> scalar`` consumes a TraceResult (e.g. RMS spot
    radius at a focal plane).  The returned ``step(params, rays)`` computes
    ``grad(loss ∘ trace)`` with rays sharded over the mesh and applies one
    SGD update, returning ``(new_params, loss)``.  All reductions (the
    scalar loss and every parameter gradient) are mesh-wide psums inserted
    by XLA from the sharding annotations (XLA engine) or by the shard_map
    transpose (fused path).

    ``use_fused`` selects the fused Pallas forward + backward kernels
    (ops/fused_grad.py — measured 12x the XLA scan gradient step on v5e):
    ``None`` picks them automatically on TPU for supported scenes, ``True``
    forces (raises if unsupported), ``False`` keeps the XLA engine.

    ``param_filter`` masks which parameter pytree leaves receive updates
    (by zeroing gradient entries), e.g. to optimize only lens transforms.

    ``itemsize`` is the ray dtype's byte width for the VMEM feasibility
    checks (4 for the f32 production path, 8 for f64 rays).
    """
    from pyrayt_tpu.ops import fused_trace as ft

    cfg = TraceConfig(**{**config.__dict__, "fixed_loop": True})
    if use_fused is not None:
        cfg = TraceConfig(**{**cfg.__dict__, "use_fused": use_fused})
    if ft.pick_fused(scene.spec, cfg, itemsize, need_grad=True):
        trace = _build_shard_mapped_fused(scene, cfg, mesh, ft, vjp=True)
    else:
        trace = engine.build_trace_fn(scene.spec, scene.materials, cfg)

    def loss_of(params, rays):
        return loss_fn(trace(params, rays))

    replicated = NamedSharding(mesh, P())

    def step(params, rays: RaySet):
        loss, grads = jax.value_and_grad(loss_of)(params, rays)
        if param_filter is not None:
            grads = param_filter(grads)
        new_params = jax.tree_util.tree_map(
            lambda p, g: p - learning_rate * g, params, grads
        )
        return new_params, loss

    in_shardings = (
        jax.tree_util.tree_map(lambda _: replicated, scene.params),
        rayset_sharding(mesh),
    )
    out_shardings = (
        jax.tree_util.tree_map(lambda _: replicated, scene.params),
        replicated,
    )
    return jax.jit(step, in_shardings=in_shardings, out_shardings=out_shardings)
