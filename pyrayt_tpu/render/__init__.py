"""Viewport rendering: orthographic Edge/Gooch renderers and ``draw()``.

The nearest-hit pass runs on the accelerator through the same compiled
scene engine as the tracer; shading/edge extraction are host-side viz.
"""

from pyrayt_tpu.render import color, gooch, renderers
from pyrayt_tpu.render.camera import OrthographicCamera
from pyrayt_tpu.render.color import RGBAColor
from pyrayt_tpu.render.gooch import GoochMaterial
from pyrayt_tpu.render.renderers import EdgeRender, ShadedRenderer, draw

__all__ = [
    "color",
    "gooch",
    "renderers",
    "OrthographicCamera",
    "RGBAColor",
    "GoochMaterial",
    "EdgeRender",
    "ShadedRenderer",
    "draw",
]
