"""Optical materials.

Parity with pyrayt/materials.py:10-173 (absorber / mirror / Glass /
BasicRefractor / SellmeierRefractor / glass catalog) re-hosted on JAX.

Two interfaces per material:

* ``trace(surface, ray_set)`` — eager, object-oriented, reference-parity
  (used by tests and host-side experimentation).
* ``pure_trace(directions, normals, wavelength, index, intensity)`` — the
  branch-free functional form the jitted engine evaluates *for every ray*
  under that material's dispatch mask (the EP-analog masked dispatch from
  SURVEY.md section 2.3).  Must be jnp-pure.

Built-in refractive materials expose their dispersion model as a packed
coefficient row ``[A, b1, b2, b3, c1, c2, c3]`` meaning
``n(lambda) = sqrt(A + sum_i b_i l^2 / (l^2 - c_i))`` — A = n0^2 with all
b = 0 recovers a constant index, A = 1 recovers the Sellmeier equation.
The engine reads these rows from the params pytree, so glass coefficients
are first-class differentiable parameters.
"""

from __future__ import annotations

import abc
from functools import lru_cache
from typing import Union

import jax.numpy as jnp
import numpy as np

from pyrayt_tpu.core.operations import reflect, refract

__all__ = [
    "TracableMaterial",
    "Glass",
    "BasicRefractor",
    "SellmeierRefractor",
    "absorber",
    "mirror",
    "glass",
    "index_from_coeffs",
    "KIND_ABSORB",
    "KIND_MIRROR",
    "KIND_GLASS",
]

# material kind codes used by the flattened scene representation
KIND_ABSORB = 0
KIND_MIRROR = 1
KIND_GLASS = 2

N_GLASS_COEFFS = 7


def index_from_coeffs(coeffs, wavelength):
    """Refractive index from a packed ``[A, b1..b3, c1..c3]`` coefficient row."""
    coeffs = jnp.asarray(coeffs)
    wl2 = jnp.asarray(wavelength) ** 2
    n2 = coeffs[0]
    for i in range(3):
        b, c = coeffs[1 + i], coeffs[4 + i]
        n2 = n2 + b * wl2 / (wl2 - c)
    return jnp.sqrt(n2)


class TracableMaterial(abc.ABC):
    """Base class for any material traceable by RayTracer objects."""

    kind: int  # one of the KIND_* codes

    def __init__(self, base_material=None, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # the render material used when the object is drawn (tinygfx parity)
        self._base_material = base_material

    def shade(self, rays, normals, light_positions):
        from pyrayt_tpu.render import gooch

        base = self._base_material or gooch.BLACK
        return base.shade(rays, normals, light_positions)

    @abc.abstractmethod
    def trace(self, surface, ray_set):
        """Eagerly update a RaySet after hitting ``surface`` (reference API)."""

    @abc.abstractmethod
    def pure_trace(self, directions, normals, wavelength, index, intensity):
        """Functional form: returns (new_directions, new_index, new_intensity)."""

    def glass_coeffs(self) -> jnp.ndarray:
        """Packed dispersion row for the scene params pytree (zeros if N/A)."""
        return jnp.zeros(N_GLASS_COEFFS)


def _as_float(value) -> float:
    try:
        return float(value)
    except Exception as exc:  # a traced value has no concrete float
        raise TypeError(f"non-concrete material value: {exc}") from None


class _ValueIdentity:
    """Equality/hash by physical value, not object identity.

    engine.build_trace_fn caches compiled traces keyed on the material
    tuple; a scene rebuilt each optimization step creates fresh material
    instances, which under identity semantics would silently recompile
    every step.  Built-in materials are fully described by their class and
    dispersion values, so they compare by value; traced (non-concrete)
    values fall back to identity.
    """

    def _value_key(self):
        return ()

    def __eq__(self, other):
        if type(other) is not type(self):
            return NotImplemented
        try:
            return self._value_key() == other._value_key()
        except TypeError:
            return self is other

    def __hash__(self):
        try:
            return hash((type(self),) + self._value_key())
        except TypeError:
            return object.__hash__(self)


class _AbsorbingMaterial(_ValueIdentity, TracableMaterial):
    """Ideal absorber: zeroes the direction vector, which the tracer reads
    as a dead ray (parity: pyrayt/materials.py:40-50)."""

    kind = KIND_ABSORB

    def trace(self, surface, ray_set):
        ray_set = ray_set.replace(directions=jnp.zeros_like(ray_set.directions))
        return ray_set

    def pure_trace(self, directions, normals, wavelength, index, intensity):
        return jnp.zeros_like(directions), index, intensity


class _ReflectingMaterial(_ValueIdentity, TracableMaterial):
    """Ideal mirror (parity: pyrayt/materials.py:53-62)."""

    kind = KIND_MIRROR

    def trace(self, surface, ray_set):
        normals = surface.get_world_normals(ray_set.positions)
        return ray_set.replace(directions=reflect(ray_set.directions, normals))

    def pure_trace(self, directions, normals, wavelength, index, intensity):
        return reflect(directions, normals), index, intensity


class Glass(TracableMaterial):
    """Refractive material ABC (parity: pyrayt/materials.py:65-99)."""

    kind = KIND_GLASS

    def trace(self, surface, ray_set):
        normals = surface.get_world_normals(ray_set.positions)
        new_dirs, new_index = refract(
            ray_set.directions, normals, ray_set.index, self.index_at(ray_set.wavelength)
        )
        return ray_set.replace(directions=new_dirs, index=new_index)

    def pure_trace(self, directions, normals, wavelength, index, intensity):
        new_dirs, new_index = refract(
            directions, normals, index, self.index_at(wavelength)
        )
        return new_dirs, new_index, intensity

    @lru_cache(100)
    def abbe(self) -> float:
        """Abbe number V_d = (n_d - 1) / (n_F - n_C)."""
        n_short = self.index_at(0.4861)
        n_center = self.index_at(0.5893)
        n_long = self.index_at(0.6563)
        return float((n_center - 1) / (n_short - n_long))

    @abc.abstractmethod
    def index_at(self, wavelength):
        """Refractive index at ``wavelength`` (microns); shape-preserving."""


class BasicRefractor(_ValueIdentity, Glass):
    def __init__(self, refractive_index: float, *args, **kwargs):
        """Non-dispersive glass with a constant refractive index.

        Immutable after construction: materials hash by their dispersion
        values (see _ValueIdentity) and are used as cache / slot-map keys,
        so the values may not change once built.  To vary the index, build
        a new material (cheap) or optimize the scene params pytree, where
        glass coefficients are first-class differentiable leaves.
        """
        self._refractive_index = refractive_index
        super().__init__()

    @property
    def refractive_index(self):
        return self._refractive_index

    def _value_key(self):
        return (_as_float(self._refractive_index),)

    def index_at(self, wavelength: Union[float, jnp.ndarray]):
        wavelength = jnp.asarray(wavelength)
        if wavelength.ndim == 0:
            return jnp.asarray(self._refractive_index, dtype=float)
        return jnp.full(wavelength.shape, self._refractive_index, dtype=float)

    def glass_coeffs(self) -> jnp.ndarray:
        n = jnp.asarray(self._refractive_index, dtype=float)
        return jnp.zeros(N_GLASS_COEFFS).at[0].set(n**2)


class SellmeierRefractor(_ValueIdentity, Glass):
    def __init__(self, b1=0, b2=0, b3=0, c1=0, c2=0, c3=0):
        """Dispersive glass following the Sellmeier equation
        (coefficients as found at refractiveindex.info).

        Immutable after construction: the coefficients are read-only
        properties because materials hash by value (_ValueIdentity) and key
        compile caches and compile_scene's slot map — mutating them after a
        scene is compiled would silently corrupt lookups.  Optimize glass
        via the scene params pytree instead.
        """
        self._b1, self._b2, self._b3 = b1, b2, b3
        self._c1, self._c2, self._c3 = c1, c2, c3
        super().__init__()

    b1 = property(lambda self: self._b1)
    b2 = property(lambda self: self._b2)
    b3 = property(lambda self: self._b3)
    c1 = property(lambda self: self._c1)
    c2 = property(lambda self: self._c2)
    c3 = property(lambda self: self._c3)

    def _value_key(self):
        return tuple(
            _as_float(v)
            for v in (self.b1, self.b2, self.b3, self.c1, self.c2, self.c3)
        )

    def index_at(self, wavelength):
        wl2 = jnp.asarray(wavelength) ** 2
        return jnp.sqrt(
            1
            + (self.b1 * wl2) / (wl2 - self.c1)
            + (self.b2 * wl2) / (wl2 - self.c2)
            + (self.b3 * wl2) / (wl2 - self.c3)
        )

    def glass_coeffs(self) -> jnp.ndarray:
        return jnp.asarray(
            [1.0, self.b1, self.b2, self.b3, self.c1, self.c2, self.c3], dtype=float
        )


absorber = _AbsorbingMaterial()
"""A bulk absorbing material."""

mirror = _ReflectingMaterial()
"""A perfectly reflecting material."""

glass = {
    "ideal": BasicRefractor(1.5),
    "BK7": SellmeierRefractor(
        1.03961212,
        0.231792344,
        1.01046945,
        6.00069867e-3,
        2.00179144e-2,
        1.03560653e02,
    ),
    "SF5": SellmeierRefractor(
        1.52481889, 0.187085527, 1.42729015, 0.011254756, 0.0588995392, 129.141675
    ),
    "SF2": SellmeierRefractor(
        1.40301821, 0.231767504, 0.939056586, 0.0105795466, 0.0493226978, 112.405955
    ),
}
"""A dictionary of common glasses (same catalog as pyrayt/materials.py:155-171)."""
