"""Concrete traceable surfaces.

Parity with the thin wrappers in tinygfx/g3d/world_objects.py:425-496
(including the corrected Cylinder defaults — the reference defines Cylinder
twice and the second definition wins, SURVEY.md quirk Q5).

Parameter packing is NumPy on the plain-float path and jnp when built from
traced values (see pyrayt_tpu/scene/_backend.py).
"""

from __future__ import annotations

import numpy as np

from pyrayt_tpu.core import primitives as prim
from pyrayt_tpu.scene._backend import is_traced, xp_for
from pyrayt_tpu.scene.objects import TracerSurface

__all__ = ["Sphere", "Paraboloid", "XYPlane", "Cuboid", "Cylinder"]


class Sphere(TracerSurface):
    prim_type = prim.SPHERE

    def __init__(self, radius=1, material=None, *args, **kwargs):
        xp = xp_for(radius)
        r = xp.asarray(radius, dtype=float)
        spans = xp.stack((xp.stack((-r, -r, -r)), xp.stack((r, r, r))), axis=1)
        super().__init__(
            params=xp.reshape(r, (1,)),
            bounding_spans=spans,
            material=material,
            *args,
            **kwargs,
        )

    def get_radius(self):
        return self._prim_params[0]


class Paraboloid(TracerSurface):
    prim_type = prim.PARABOLOID

    def __init__(self, focus=1, height=1, material=None, *args, **kwargs):
        for val in (focus, height):
            if not is_traced(val) and float(val) <= 0:
                raise ValueError("Focus and height must be positive numbers")
        xp = xp_for(focus, height)
        f = xp.asarray(focus, dtype=float)
        h = xp.asarray(height, dtype=float)
        radius_at_max = xp.sqrt(4.0 * f * h)
        zero = xp.asarray(0.0)
        spans = xp.stack(
            (
                xp.stack((-radius_at_max, -radius_at_max, zero)),
                xp.stack((radius_at_max, radius_at_max, h)),
            ),
            axis=1,
        )
        super().__init__(
            params=xp.stack((f, h)),
            bounding_spans=spans,
            material=material,
            *args,
            **kwargs,
        )

    def get_focus(self):
        return self._prim_params[0]


class XYPlane(TracerSurface):
    prim_type = prim.PLANE

    def __init__(self, width=2, length=2, material=None, *args, **kwargs):
        xp = xp_for(width, length)
        w = xp.asarray(width, dtype=float)
        l = xp.asarray(length, dtype=float)
        spans = xp.stack(
            (
                xp.stack((-w / 2, -l / 2, xp.asarray(-0.01))),
                xp.stack((w / 2, l / 2, xp.asarray(0.01))),
            ),
            axis=1,
        )
        super().__init__(
            params=xp.stack((w, l)),
            bounding_spans=spans,
            material=material,
            *args,
            **kwargs,
        )


class Cuboid(TracerSurface):
    prim_type = prim.CUBE

    def __init__(
        self, l_corner=(-1, -1, -1), r_corner=(1, 1, 1), material=None, *args, **kwargs
    ):
        xp = xp_for(l_corner, r_corner)
        lo = xp.asarray(l_corner, dtype=float)[:3]
        hi = xp.asarray(r_corner, dtype=float)[:3]
        spans = xp.sort(xp.stack((lo, hi), axis=1), axis=1)  # (3, 2)
        super().__init__(
            params=spans.reshape(-1),
            bounding_spans=spans,
            material=material,
            *args,
            **kwargs,
        )

    @classmethod
    def from_sides(cls, x=1, y=1, z=1, **kwargs):
        xp = xp_for(x, y, z)
        dims = xp.stack([xp.asarray(v, dtype=float) for v in (x, y, z)])
        return cls(-0.5 * dims, 0.5 * dims, **kwargs)

    @classmethod
    def from_length(cls, length, **kwargs):
        xp = xp_for(length)
        half = 0.5 * xp.asarray(length, dtype=float)
        corner = xp.stack((half, half, half))
        return cls(-corner, corner, **kwargs)

    @property
    def axis_spans(self):
        return self._prim_params[:6].reshape(3, 2)


class Cylinder(TracerSurface):
    prim_type = prim.CYLINDER

    def __init__(
        self,
        radius=1,
        min_height=-1,
        max_height=1,
        capped=True,
        material=None,
        *args,
        **kwargs,
    ):
        xp = xp_for(radius, min_height, max_height)
        r = xp.asarray(radius, dtype=float)
        h_min = xp.asarray(min_height, dtype=float)
        h_max = xp.asarray(max_height, dtype=float)
        spans = xp.stack(
            (xp.stack((-r, -r, h_min)), xp.stack((r, r, h_max))), axis=1
        )
        super().__init__(
            params=xp.stack((r, h_min, h_max, xp.asarray(1.0 if capped else 0.0))),
            bounding_spans=spans,
            material=material,
            *args,
            **kwargs,
        )

    def get_radius(self):
        return self._prim_params[0]
