"""Scene-graph builders: world objects, surfaces, CSG, compilation.

Mirrors the capability surface of the reference's ``tinygfx.g3d``
(world_objects.py, csg.py) as scene *builders* that compile to the flat
array representation the jitted engine consumes.
"""

from pyrayt_tpu.scene.objects import (
    CountedObject,
    Intersectable,
    ObjectGroup,
    TracerSurface,
    WorldObject,
    bounding_box_spans,
    fresh_ids,
)
from pyrayt_tpu.scene.surfaces import Cuboid, Cylinder, Paraboloid, Sphere, XYPlane
from pyrayt_tpu.scene import csg
from pyrayt_tpu.scene.csg import CSGSurface, difference, intersect, union
from pyrayt_tpu.scene.compile import CompiledScene, SceneSpec, compile_scene
