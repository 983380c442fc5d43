"""Orthographic viewport renderers (Edge + Gooch-shaded) and ``draw()``.

Behavioral parity with tinygfx/g3d/renderers.py:11-349, re-designed for the
accelerator: the reference re-runs its Python PROPAGATE state machine per
pixel bundle; here the entire pixel grid is ONE batched nearest-hit pass
through the same compiled-scene engine the tracer uses
(pyrayt_tpu/tracer/engine.py scene_nearest_hit).  Edge extraction and Gooch
shading are cheap viewport post-processing on host NumPy.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from pyrayt_tpu.render.camera import OrthographicCamera
from pyrayt_tpu.scene.compile import compile_scene
from pyrayt_tpu.tracer.engine import scene_nearest_hit

__all__ = ["EdgeRender", "ShadedRenderer", "draw"]


@lru_cache(maxsize=32)
def _nearest_hit_fn(spec):
    """Jitted (params, rays) -> (hit_distances, public surface ids)."""

    def fn(params, rays):
        hit_distances, hit_leaf, _ = scene_nearest_hit(spec, params, rays)
        surface_ids = jnp.full_like(hit_leaf, -1)
        for s, leaf_id in enumerate(spec.leaf_ids):
            surface_ids = jnp.where(hit_leaf == s, leaf_id, surface_ids)
        return hit_distances, surface_ids

    return jax.jit(fn)


def _propagate(camera: OrthographicCamera, shapes):
    """One device pass: per-pixel nearest hit distance + surface id."""
    scene = compile_scene(shapes, require_materials=False)
    rays = camera.generate_rays()
    hit_distances, surface_ids = _nearest_hit_fn(scene.spec)(scene.params, rays)
    return rays, np.asarray(hit_distances), np.asarray(surface_ids)


def _binary_dilation(image: np.ndarray, iterations: int) -> np.ndarray:
    """8-connected binary dilation via shifted maxima (scipy-free)."""
    out = image.astype(bool)
    for _ in range(max(iterations, 0)):
        padded = np.pad(out, 1)
        acc = np.zeros_like(out)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                acc |= padded[1 + dy : padded.shape[0] - 1 + dy,
                              1 + dx : padded.shape[1] - 1 + dx]
        out = acc
    return out


class _RendererBase:
    """Shared camera/scene plumbing (replaces the reference state machine —
    the 'machine' is now a single jitted call)."""

    def __init__(self, camera: OrthographicCamera, surfaces: list):
        self._camera = camera
        self._shapes = (
            surfaces if hasattr(surfaces, "__iter__") else (surfaces,)
        )
        self._results = None
        self._simulation_complete = False

    def reset(self):
        self._results = None
        self._simulation_complete = False

    def render(self):
        rays, hit_distances, hit_surfaces = _propagate(self._camera, self._shapes)
        self._results = self._interact(rays, hit_distances, hit_surfaces)
        self._simulation_complete = True
        return self._results


class EdgeRender(_RendererBase):
    """Silhouette render: edges where the per-pixel surface id changes
    (parity: renderers.py:96-116)."""

    ray_offset_value = 1e-6

    def _interact(self, rays, hit_distances, hit_surfaces):
        hit_matrix = hit_surfaces.reshape(self._camera.get_resolution()[-1], -1)
        h_diffs = np.abs(np.diff(hit_matrix, axis=-1, prepend=-1))
        v_diffs = np.abs(np.diff(hit_matrix, axis=0, prepend=-1))
        edges = _binary_dilation(
            (h_diffs + v_diffs) > 0,
            iterations=max(1, int(max(hit_matrix.shape) / 300)),
        )
        canvas = np.zeros((*hit_matrix.shape, 4), dtype=float)
        canvas[...] = np.logical_not(edges)[..., np.newaxis]
        canvas[..., 3] = edges
        return canvas


class ShadedRenderer(_RendererBase):
    """Gooch-shaded render via per-surface shade dispatch
    (parity: renderers.py:129-248)."""

    def __init__(self, camera: OrthographicCamera, shapes: list, light_position):
        super().__init__(camera, shapes)
        self._light = np.asarray(light_position)
        self._surface_lut = tuple()
        for shape in self._shapes:
            self._surface_lut += shape.surface_ids

    def _interact(self, rays, hit_distances, hit_surfaces):
        canvas = np.zeros((4, rays.shape[-1]))
        rays = np.asarray(rays)
        for surface_id, surface in self._surface_lut:
            surface_mask = hit_surfaces == surface_id
            if np.any(surface_mask):
                canvas[:, surface_mask] = surface.shade(
                    rays[..., surface_mask],
                    hit_distances[surface_mask],
                    light_positions=self._light,
                )
        return canvas.T.reshape(*self._camera.get_resolution()[::-1], 4)


def draw(
    surfaces,
    view: str = "xy",
    axis=None,
    shaded: bool = True,
    bounds=None,
    resolution: int = 640,
):
    """Render components into a matplotlib axis with world-extent mapping
    (parity: renderers.py:251-349)."""
    import matplotlib.pyplot as plt

    if not hasattr(surfaces, "__iter__"):
        surfaces = (surfaces,)

    if bounds is not None:
        mins = np.asarray(bounds[0])
        maxes = np.asarray(bounds[1])
    else:
        spans = np.stack(
            [np.asarray(surface.bounding_box) for surface in surfaces]
        )  # (k, 3, 2)
        mins = spans[..., 0].min(axis=0)
        maxes = spans[..., 1].max(axis=0)

    if axis is None:
        axis = plt.gca()

    if view == "xy":
        _draw_projection(surfaces, axis, shaded, resolution, maxes, mins, plane="xy")
    elif view == "xz":
        _draw_projection(surfaces, axis, shaded, resolution, maxes, mins, plane="xz")
    else:
        raise ValueError(f"view {view!r} is not one of ('xy', 'xz')")


def _draw_projection(
    surfaces: List, axis, shaded, resolution, maxes, mins, plane: str
):
    camera_origin = (maxes + mins) / 2
    if plane == "xy":
        camera_origin[2] = 1.5 * maxes[2]
        h_span, v_span = 1.5 * (maxes[:2] - mins[:2])
    else:
        camera_origin[1] = 1.5 * maxes[1]
        h_span, v_span = 1.5 * (maxes[[0, 2]] - mins[[0, 2]])
    h_span = max(h_span, 1e-6)
    v_span = max(v_span, 1e-6)
    resolution = (
        resolution if h_span > v_span else int(resolution * h_span / v_span)
    )

    camera = OrthographicCamera(resolution, h_span, v_span / h_span)
    light_position = np.append(maxes.astype(float), 1.0)
    if plane == "xy":
        camera.rotate_y(90).rotate_z(90).move(*camera_origin[:3])
        light_position[2] *= 3
    else:
        camera.rotate_z(90).move(*camera_origin[:3])
        light_position[1] *= -3

    if shaded:
        renderer = ShadedRenderer(camera, surfaces, light_position=light_position)
    else:
        renderer = EdgeRender(camera, surfaces)
    image = renderer.render()

    a0 = camera_origin[0]
    a1 = camera_origin[1] if plane == "xy" else camera_origin[2]
    axis.imshow(
        image,
        extent=[a0 - h_span / 2, a0 + h_span / 2, a1 - v_span / 2, a1 + v_span / 2],
    )
    axis.set_axisbelow(True)
