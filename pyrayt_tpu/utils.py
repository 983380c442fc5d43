"""Optics utilities: wavelength -> RGB and the lensmaker's equation.

Parity with pyrayt/utils.py:5-118.  ``wavelength_to_rgb`` stays NumPy (it
is display-path only); ``lensmakers_equation`` is plain arithmetic and
works on floats or traced jnp values alike.
"""

from __future__ import annotations

import numpy as np

__all__ = ["wavelength_to_rgb", "lensmakers_equation"]


def wavelength_to_rgb(wavelength, gamma=0.8) -> np.ndarray:
    """Piecewise-linear visible-spectrum (0.38-0.75 um) to RGB with gamma.

    Returns an (n, 3) array; out-of-range wavelengths clip to the limits
    (parity: pyrayt/utils.py:5-102, six spectral zones).
    """
    wavelength = np.atleast_1d(np.asarray(wavelength, dtype=float))
    color = np.empty((3, wavelength.shape[0]))

    # 380 -> 440 nm (violet, attenuated toward the UV edge)
    zone_min, zone_max = 0.38, 0.44
    clipped = np.maximum(wavelength, zone_min)
    attenuation = 0.3 + 0.7 * (clipped - zone_min) / (zone_max - zone_min)
    red = np.abs(-(clipped - zone_max) / (zone_max - zone_min) * attenuation) ** gamma
    green = np.zeros_like(wavelength)
    blue = np.abs(1.0 * attenuation) ** gamma
    color = np.where(wavelength < zone_max, np.vstack((red, green, blue)), color)

    # 440 -> 490 nm
    zone_min, zone_max = 0.44, 0.49
    zone = np.vstack(
        (
            np.zeros_like(wavelength),
            np.abs((wavelength - zone_min) / (zone_max - zone_min)) ** gamma,
            np.ones_like(wavelength),
        )
    )
    color = np.where((wavelength >= zone_min) & (wavelength < zone_max), zone, color)

    # 490 -> 510 nm
    zone_min, zone_max = 0.49, 0.51
    zone = np.vstack(
        (
            np.zeros_like(wavelength),
            np.ones_like(wavelength),
            np.abs((zone_max - wavelength) / (zone_max - zone_min)) ** gamma,
        )
    )
    color = np.where((wavelength >= zone_min) & (wavelength < zone_max), zone, color)

    # 510 -> 580 nm
    zone_min, zone_max = 0.51, 0.58
    zone = np.vstack(
        (
            np.abs((wavelength - zone_min) / (zone_max - zone_min)) ** gamma,
            np.ones_like(wavelength),
            np.zeros_like(wavelength),
        )
    )
    color = np.where((wavelength >= zone_min) & (wavelength < zone_max), zone, color)

    # 580 -> 645 nm
    zone_min, zone_max = 0.58, 0.645
    zone = np.vstack(
        (
            np.ones_like(wavelength),
            np.abs((zone_max - wavelength) / (zone_max - zone_min)) ** gamma,
            np.zeros_like(wavelength),
        )
    )
    color = np.where((wavelength >= zone_min) & (wavelength < zone_max), zone, color)

    # >= 645 nm (red, attenuated toward the IR edge)
    zone_min, zone_max = 0.645, 0.75
    clipped = np.minimum(wavelength, zone_max)
    attenuation = 0.3 + 0.7 * (zone_max - clipped) / (zone_max - zone_min)
    zone = np.zeros((3, wavelength.shape[0]))
    zone[0] = np.abs(attenuation) ** gamma
    color = np.where(wavelength >= zone_min, zone, color)

    return color.T


def lensmakers_equation(r1: float, r2: float, n_lens: float, thickness: float) -> float:
    """Thick-lens paraxial focal length (parity: pyrayt/utils.py:105-118)."""
    p = (n_lens - 1) * (
        1 / r1 - 1 / r2 + (n_lens - 1) * thickness / (n_lens * r1 * r2)
    )
    return 1 / p
