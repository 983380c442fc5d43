"""Gooch (cool-to-warm) shading for the orthographic viewport renderers.

Behavioral parity with tinygfx/g3d/materials/gooch.py:9-82: per-pixel color
= mix(warm_shade, cool_shade) with mixture ratio ½(1 + l·n) averaged over
lights.  Shading is viewport work over at most ~1M pixels with trivial
math — it runs vectorized NumPy on host (keeping the TPU for the
nearest-hit pass, which is the actual hot loop of rendering).
"""

from __future__ import annotations

import abc
from dataclasses import dataclass, field

import numpy as np

from pyrayt_tpu.render import color
from pyrayt_tpu.render.color import RGBAColor

__all__ = [
    "Material",
    "GoochMaterial",
    "WHITE",
    "RED",
    "GREEN",
    "BLUE",
    "YELLOW",
    "ORANGE",
    "BLACK",
]


class Material(abc.ABC):
    """Base class for all viewport (render) materials."""

    @abc.abstractmethod
    def shade(self, rays, normals, light_positions) -> np.ndarray:
        """Per-pixel RGBA values, shape (4, n)."""


@dataclass
class GoochMaterial(Material):
    base_color: RGBAColor = field(default_factory=RGBAColor)
    warm_color: RGBAColor = field(default_factory=RGBAColor)
    cool_color: RGBAColor = field(default_factory=RGBAColor)

    alpha: float = 0.3
    beta: float = 0.3

    def shade(self, rays, normals, light_positions) -> np.ndarray:
        """Cool-to-warm shade of hit points.

        ``rays``: (2, 4, n) hit positions + view directions (world space);
        ``normals``: (4, n) or (4,) unit surface normals;
        ``light_positions``: (4,) single light or (4, L) light array.
        Returns (4, n) RGBA.
        """
        shade_warm = (1 - self.alpha) * np.asarray(
            self.warm_color
        ) + self.alpha * np.asarray(self.base_color)
        shade_cool = (1 - self.beta) * np.asarray(
            self.cool_color
        ) + self.beta * np.asarray(self.base_color)

        rays = np.atleast_3d(np.asarray(rays))
        normals = np.asarray(normals)
        normals = normals[:3, np.newaxis] if normals.ndim == 1 else normals[:3]
        light_positions = np.asarray(light_positions)

        if light_positions.ndim == 1:
            # (1, 3, n): one light vector per pixel
            light_vectors = (light_positions[:3, np.newaxis] - rays[0, :3])[
                np.newaxis, ...
            ]
        else:
            # (L, 3, n)
            light_vectors = light_positions[:3].T[:, :, np.newaxis] - rays[0, :3]

        light_vectors = light_vectors / np.linalg.norm(light_vectors, axis=1)
        light_normal_dot = np.einsum("ijk,jk->ik", light_vectors, normals)

        mixture_ratio = 0.5 * (1 + light_normal_dot)
        all_light_mixture = np.mean(mixture_ratio, axis=0)
        return np.einsum("i,j->ij", shade_warm, all_light_mixture) + np.einsum(
            "i,j->ij", shade_cool, 1 - all_light_mixture
        )


def _blue_yellow_gooch(base_color):
    return GoochMaterial(
        base_color=base_color, warm_color=color.ORANGE, cool_color=color.BLUE
    )


WHITE = _blue_yellow_gooch(color.WHITE)
RED = _blue_yellow_gooch(color.RED)
GREEN = _blue_yellow_gooch(color.GREEN)
BLUE = GoochMaterial(
    base_color=color.BLUE, warm_color=color.YELLOW, cool_color=color.BLUE, alpha=0.2
)
YELLOW = _blue_yellow_gooch(color.YELLOW)
ORANGE = _blue_yellow_gooch(color.ORANGE)
BLACK = _blue_yellow_gooch(color.BLACK)
