"""On-device, differentiable trace metrics.

The reference's analysis layer is user-side Pandas filtering of the results
frame (examples/lens_design.ipynb cells 12-21; SURVEY.md §5.5).  These are
the same quantities as pure jnp functions of the on-device TraceResult, so
they compose with ``jax.grad`` / ``jit`` / sharding without a host sync —
the loss functions of the differentiable-design path.

Record rows follow the 15-column frame layout (engine.N_RECORD_COLS):
generation, intensity, wavelength, index, id, surface, x0, y0, z0,
x1, y1, z1, x_tilt, y_tilt, z_tilt.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "COL",
    "surface_mask",
    "last_generation_mask",
    "masked_mean",
    "rms_spot_radius",
    "axis_intercepts",
    "focus_error",
    "spot_diagram_points",
]

COL = {
    name: i
    for i, name in enumerate(
        (
            "generation",
            "intensity",
            "wavelength",
            "index",
            "id",
            "surface",
            "x0",
            "y0",
            "z0",
            "x1",
            "y1",
            "z1",
            "x_tilt",
            "y_tilt",
            "z_tilt",
        )
    )
}


def surface_mask(result, surface_id) -> jnp.ndarray:
    """(G, n) mask of record rows that terminated on ``surface_id``."""
    return result.record_mask & (
        result.records[:, COL["surface"], :] == surface_id
    )


def last_generation_mask(result) -> jnp.ndarray:
    """(G, n) mask of each ray's final recorded segment (the notebook's
    ``generation == max(generation)`` imager filter, cell 12)."""
    mask = result.record_mask
    gen = jnp.cumsum(mask[::-1], axis=0)[::-1]
    return mask & (gen == 1)


def masked_mean(values, mask, axis=None):
    """Mean of ``values`` over ``mask`` (safe when the mask is empty)."""
    w = mask.astype(values.dtype)
    total = jnp.sum(w, axis=axis)
    return jnp.sum(values * w, axis=axis) / jnp.maximum(total, 1.0)


def spot_diagram_points(result, surface_id):
    """((G,n) y, (G,n) z, (G,n) mask) of hit points on a surface — the spot
    diagram raw data."""
    mask = surface_mask(result, surface_id)
    y = result.records[:, COL["y1"], :]
    z = result.records[:, COL["z1"], :]
    return y, z, mask


def rms_spot_radius(result, surface_id=None) -> jnp.ndarray:
    """RMS radial distance of hits from their centroid on a surface
    (or on every ray's final surface when ``surface_id`` is None)."""
    mask = (
        last_generation_mask(result)
        if surface_id is None
        else surface_mask(result, surface_id)
    )
    y = result.records[:, COL["y1"], :]
    z = result.records[:, COL["z1"], :]
    cy = masked_mean(y, mask)
    cz = masked_mean(z, mask)
    r2 = (y - cy) ** 2 + (z - cz) ** 2
    return jnp.sqrt(masked_mean(r2, mask))


def axis_intercepts(result, min_tilt: float = 1e-6, surface_id=None):
    """(values (G,n), mask (G,n)) of each final ray's x-axis intercept:
    ``x0 - x_tilt * y0 / y_tilt`` (lens_design.ipynb cell 12's focal-length
    estimator).

    Rays with ``|y_tilt| < min_tilt`` are masked out, not just exactly-zero
    ones: a near-axial ray's intercept is 0/0 noise at any precision, and
    at f32 the unfiltered division is so ill-conditioned that the MSE value
    swings by orders of magnitude with last-bit tilt differences (measured
    on the doublet example; the reference notebook ran f64 and a narrower
    fan).  ``min_tilt = 1e-6`` keeps every ray that carries real focal
    information for mm-scale optics; pass 0.0 for the raw estimator.

    ``surface_id`` restricts the estimate to rays whose segment terminates
    on that surface (the detector).  The default (None: each ray's final
    segment, the notebook's ``generation == max`` filter) admits rays that
    never reached the detector — edge-clipped or bounce-budget-exhausted
    paths whose "intercepts" are meaningless and, at f32, make the metric
    jump by orders of magnitude when a marginal ray flips in or out
    (measured on the doublet example).  Optimization objectives should
    pass the detector's id.
    """
    mask = (
        last_generation_mask(result)
        if surface_id is None
        else surface_mask(result, surface_id)
    )
    x0 = result.records[:, COL["x0"], :]
    y0 = result.records[:, COL["y0"], :]
    xt = result.records[:, COL["x_tilt"], :]
    yt = result.records[:, COL["y_tilt"], :]
    tilted = jnp.abs(yt) > min_tilt
    safe_yt = jnp.where(tilted, yt, 1.0)
    intercept = x0 - xt * y0 / safe_yt
    return jnp.where(mask & tilted, intercept, 0.0), mask & tilted


def focus_error(
    result, target_focus, min_tilt: float = 1e-6, surface_id=None
) -> jnp.ndarray:
    """Mean squared deviation of axis intercepts from a target focal plane
    (the notebook's ``doublet_performance`` objective, cell 28).  Pass the
    detector's ``surface_id`` for a vignetting-robust objective (see
    axis_intercepts)."""
    intercepts, mask = axis_intercepts(
        result, min_tilt=min_tilt, surface_id=surface_id
    )
    return masked_mean((intercepts - target_focus) ** 2, mask)
