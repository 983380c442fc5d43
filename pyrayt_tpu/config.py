"""Trace configuration.

The reference configures via two class attributes and constructor args
(pyrayt/_pyrayt.py:190-196, SURVEY.md section 5.6); the TPU build threads
one frozen dataclass through the engine instead.  It is hashable so it can
key the jit cache.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

__all__ = ["TraceConfig"]


@dataclasses.dataclass(frozen=True)
class TraceConfig:
    #: maximum bounce count before a ray is terminated (_pyrayt.py:242)
    generation_limit: int = 10
    #: epsilon push-off from the intersected surface (_pyrayt.py:190)
    ray_offset: float = 1e-6
    #: intensity kill threshold (_pyrayt.py:196)
    intensity_threshold: float = 0.1
    #: the reference's threshold test is inert (quirk Q1, _pyrayt.py:415-419);
    #: False reproduces shipped behavior, True implements the intended one
    apply_intensity_threshold: bool = False
    #: refractive index of the world / surrounding medium (_pyrayt.py:245)
    world_index: float = 1.0
    #: True -> fixed-trip-count generation loop (lax.scan): reverse-mode
    #: differentiable, no early exit.  False -> lax.while_loop with
    #: all-rays-dead early exit (forward-only, fastest).
    fixed_loop: bool = False
    #: fused Pallas kernel dispatch for forward traces via trace_rays():
    #: None = auto (fused on TPU when the scene supports it), True = force
    #: (raises if unsupported), False = always the XLA engine.
    use_fused: Optional[bool] = None
    #: rematerialize the generation step under reverse-mode AD (scan driver
    #: only): saves just the inter-generation ray carry and recomputes the
    #: step's intermediates in the backward pass — trades ~1 extra forward
    #: step for not round-tripping every intersection/CSG intermediate
    #: through HBM.  No effect on forward-only traces.
    remat: bool = False
    #: WIDE-scene backward selection (scenes past the narrow kernel's leaf
    #: cap): None = auto = the STAGED multi-dispatch backward (measured
    #: faster than the monolithic wide kernel at every size, and the only
    #: path that compiles past ~300 leaves); "fused" = the monolithic wide
    #: backward kernel (raises past its compile cap).  See
    #: ops/fused_grad._run_bwd_staged and docs/design_notes.md.
    wide_grad: Optional[str] = None
