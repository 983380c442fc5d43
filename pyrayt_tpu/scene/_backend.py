"""NumPy/JAX dispatch for the scene builders.

Builder objects do tiny 4x4 transform math.  Running it eagerly through
jnp costs an XLA micro-compile per distinct op/shape — seconds of latency
for a scene built from plain floats.  The builders therefore run on NumPy
*unless* a traced value (jax Tracer) is involved, in which case they
switch to jnp so scenes can be rebuilt with differentiable parameters
inside ``jax.grad``/``jax.jit``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["is_traced", "xp_for", "asarray"]


def is_traced(*values) -> bool:
    """True if any value (or element of a tuple/list) is a JAX tracer."""
    for v in values:
        if isinstance(v, jax.core.Tracer):
            return True
        if isinstance(v, (tuple, list)) and is_traced(*v):
            return True
    return False


def xp_for(*values):
    """The array namespace (numpy or jax.numpy) appropriate for ``values``."""
    return jnp if is_traced(*values) else np


def asarray(value, like=None):
    """Convert with the namespace implied by ``value`` (and ``like``)."""
    xp = xp_for(value, like)
    return xp.asarray(value, dtype=float)
