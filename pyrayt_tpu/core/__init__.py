"""Pure-function geometry/math kernels (jit/vmap/grad-safe)."""

from pyrayt_tpu.core.operations import (
    binomial_root,
    element_wise_dot,
    reflect,
    refract,
    safe_normalize,
    safe_sqrt,
    smallest_positive_root,
)
from pyrayt_tpu.core.csg import Operation, array_csg, csg_combine_with_ids
from pyrayt_tpu.core.homogeneous import (
    HomogeneousCoordinate,
    Point,
    Ray,
    Vector,
    bundle_of_rays,
    bundle_rays,
)
from pyrayt_tpu.core import primitives
