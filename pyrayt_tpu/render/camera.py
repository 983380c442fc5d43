"""Orthographic viewport camera.

Parity with tinygfx/g3d/world_objects.py:499-537: a camera oriented along
the z-axis, rays pointing +x in local space, pixel grid spanning
``h_width x (aspect_ratio * h_width)``.  Ray generation is one jnp
broadcast; the full pixel bundle feeds the batched nearest-hit engine in a
single call.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pyrayt_tpu.core.operations import TRANSFORM_PRECISION
from pyrayt_tpu.scene.objects import WorldObject

__all__ = ["OrthographicCamera"]


class OrthographicCamera(WorldObject):
    def __init__(
        self, h_pixel_count: int, h_width: float, aspect_ratio: float, *args, **kwargs
    ) -> None:
        super().__init__(*args, **kwargs)
        self._h_pixels = int(h_pixel_count)
        self._h_width = float(h_width)
        self._v_width = float(aspect_ratio) * float(h_width)
        self._v_pixels = int(aspect_ratio * self._h_pixels)

    def get_resolution(self):
        return (self._h_pixels, self._v_pixels)

    def get_span(self):
        return (self._h_width, self._v_width)

    def generate_rays(self) -> jnp.ndarray:
        """(2, 4, h*v) world-space pixel rays, unit directions."""
        rays = self._local_ray_generation()
        rays = jnp.einsum(
            "ij,rjn->rin",
            jnp.asarray(self._world_coordinate_transform),
            rays,
            precision=TRANSFORM_PRECISION,
        )
        directions = rays[1] / jnp.linalg.norm(rays[1], axis=0)
        return jnp.stack((rays[0], directions))

    def _local_ray_generation(self) -> jnp.ndarray:
        h_steps = np.linspace(self._h_width / 2, -self._h_width / 2, self._h_pixels)
        v_steps = np.linspace(self._v_width / 2, -self._v_width / 2, self._v_pixels)
        ys, zs = np.meshgrid(h_steps, v_steps)
        n = self._h_pixels * self._v_pixels
        positions = np.zeros((4, n))
        positions[1] = ys.reshape(-1)
        positions[2] = zs.reshape(-1)
        positions[3] = 1.0
        directions = np.zeros((4, n))
        directions[0] = 1.0
        return jnp.asarray(np.stack((positions, directions)))
