"""Analytic daylight sky: azimuth/zenith/turbidity/albedo -> device SkyState.

Capability parity with the reference's ``SkyParams::to_sky_state``
(src/raytracer/mod.rs:543-595), which feeds the 27-param + 3-radiance
Hosek-Wilkie-form evaluator in the shader (raytracer.wgsl:316-343). The
rebuild keeps the reference's *exact evaluation formula* (see
ops/sky_radiance.py) so the device state has the same shape and meaning:

    SkyState { params: f32[3, 9], radiances: f32[3], sun_direction: f32[3] }

Coefficient source: the reference uses the external ``hw_skymodel`` crate,
which embeds the fitted Hosek-Wilkie 2012 dataset (~3.6k values, not
redistributable here and unavailable offline). This module instead computes
the nine per-channel parameters analytically from the Preetham 1999 model
("A Practical Analytic Model for Daylight"), whose coefficients are closed
form in turbidity, mapped into the Hosek-Wilkie parameter slots:

    Preetham/Perez:  F(theta, gamma) = (1 + A e^{B/cos theta})
                                       (1 + C e^{D gamma} + E cos^2 gamma)
    HW form (wgsl):  (1 + p0 e^{p1/(cos theta + 0.01)})
                     (p2 + p3 e^{p4 gamma} + p5 cos^2 gamma
                      + p6 mieM(p8) + p7 sqrt(cos theta))

so p0..p5 = (A, B, 1, C, D, E) of the luminance channel, p6 = p7 = 0, and
the per-RGB radiance scales come from the Preetham zenith chromaticity
(x_z, y_z, Y_z) converted to linear sRGB. Chromaticity is spatially constant
(a documented approximation); the angular luminance distribution (horizon
brightening, circumsolar glow via C e^{D gamma}) is Preetham-exact. Users
with the fitted Hosek-Wilkie dataset can inject exact coefficients via
``SkyState.from_raw``.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .angle import Angle

# Preetham luminance (Y) Perez coefficients, linear in turbidity T.
_PEREZ_Y = np.array(
    [
        [0.1787, -1.4630],
        [-0.3554, 0.4275],
        [-0.0227, 5.3251],
        [0.1206, -2.5771],
        [-0.0670, 0.3703],
    ]
)

# Preetham zenith chromaticity: [T^2, T, 1] . M . [ts^3, ts^2, ts, 1]
_ZENITH_X = np.array(
    [
        [0.00166, -0.00375, 0.00209, 0.0],
        [-0.02903, 0.06377, -0.03202, 0.00394],
        [0.11693, -0.21196, 0.06052, 0.25886],
    ]
)
_ZENITH_Y = np.array(
    [
        [0.00275, -0.00610, 0.00317, 0.0],
        [-0.04214, 0.08970, -0.04153, 0.00516],
        [0.15346, -0.26756, 0.06670, 0.26688],
    ]
)

# XYZ -> linear sRGB (IEC 61966-2-1)
_XYZ_TO_SRGB = np.array(
    [
        [3.2404542, -1.5371385, -0.4985314],
        [-0.9692660, 1.8760108, 0.0415560],
        [0.0556434, -0.2040259, 1.0572252],
    ]
)


@dataclasses.dataclass(frozen=True)
class SkyParams:
    """User-facing sky parameters (reference mod.rs:545-565).

    azimuth_degrees in [0, 360]; zenith_degrees in [0, 90] (sun zenith
    angle — 0 is overhead); turbidity in [1, 10]; albedo RGB in [0, 1].
    """

    azimuth_degrees: float = 0.0
    zenith_degrees: float = 85.0
    turbidity: float = 4.0
    albedo: Tuple[float, float, float] = (1.0, 1.0, 1.0)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SkyState:
    """Device sky state, same shape as the reference's GpuSkyState
    (mod.rs:888-896): 9 params per RGB channel + radiance scale + sun dir."""

    params: jnp.ndarray  # f32 [3, 9]
    radiances: jnp.ndarray  # f32 [3]
    sun_direction: jnp.ndarray  # f32 [3]

    def tree_flatten(self):
        return ((self.params, self.radiances, self.sun_direction), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def from_raw(params, radiances, sun_direction) -> "SkyState":
        """Inject externally-computed coefficients (e.g. the real fitted
        Hosek-Wilkie dataset), matching hw_skymodel's ``state.raw()``."""
        return SkyState(
            params=jnp.asarray(params, dtype=jnp.float32).reshape(3, 9),
            radiances=jnp.asarray(radiances, dtype=jnp.float32).reshape(3),
            sun_direction=jnp.asarray(sun_direction, dtype=jnp.float32).reshape(3),
        )


def _perez_hw_form(cos_theta: float, gamma: float, a, b, c, d, e) -> float:
    """Host-side evaluation of the HW-form distribution with the Preetham
    mapping (p2=1, p6=p7=0); used to normalize the zenith radiance scale."""
    return (1.0 + a * math.exp(b / (cos_theta + 0.01))) * (
        1.0 + c * math.exp(d * gamma) + e * cos_theta * cos_theta
    )


def to_sky_state(sky: SkyParams, exposure_scale: float = 1.0) -> SkyState:
    """Compute the device SkyState (reference mod.rs:567-595).

    The sun direction convention matches mod.rs:573-579:
    [sin(zenith) cos(azimuth), cos(zenith), sin(zenith) sin(azimuth)].
    """
    azimuth = Angle.degrees(sky.azimuth_degrees).as_radians()
    zenith = Angle.degrees(sky.zenith_degrees).as_radians()
    # The Preetham luminance distribution degenerates below T ~ 1.7 (the
    # 1 + A e^{B/cos(theta)} factor goes negative at the zenith, flipping
    # the normalized radiance sign at the horizon) — a known limitation of
    # the model. Clamp the coefficient turbidity; the user-facing range
    # stays [1, 10].
    t = max(1.9, min(10.0, float(sky.turbidity)))

    sun_direction = np.array(
        [
            math.sin(zenith) * math.cos(azimuth),
            math.cos(zenith),
            math.sin(zenith) * math.sin(azimuth),
        ]
    )

    # Perez luminance coefficients at this turbidity.
    a, b, c, d, e = (_PEREZ_Y[:, 0] * t + _PEREZ_Y[:, 1]).tolist()

    # Zenith luminance (Preetham eq. A.2), kcd/m^2.
    ts = zenith  # sun zenith angle
    chi = (4.0 / 9.0 - t / 120.0) * (math.pi - 2.0 * ts)
    y_z = max(1e-4, (4.0453 * t - 4.9710) * math.tan(chi) - 0.2155 * t + 2.4192)

    # Zenith chromaticity (Preetham eq. A.3/A.4).
    t_vec = np.array([t * t, t, 1.0])
    s_vec = np.array([ts**3, ts**2, ts, 1.0])
    x_z = float(t_vec @ _ZENITH_X @ s_vec)
    yy_z = float(t_vec @ _ZENITH_Y @ s_vec)

    # xyY -> XYZ -> linear sRGB zenith radiance.
    big_y = y_z
    big_x = x_z / yy_z * big_y
    big_z = (1.0 - x_z - yy_z) / yy_z * big_y
    rgb_zenith = _XYZ_TO_SRGB @ np.array([big_x, big_y, big_z])
    rgb_zenith = np.maximum(rgb_zenith, 1e-4)

    # First-order ground-albedo lift (the Preetham model has no albedo
    # input; Hosek-Wilkie's dataset does — approximate it as a small
    # per-channel brightening from ground bounce).
    albedo = np.asarray(sky.albedo, dtype=np.float64)
    rgb_zenith = rgb_zenith * (1.0 + 0.15 * albedo)

    # Normalize so that evaluating the HW-form distribution at the zenith
    # (theta=0, gamma=ts) returns exactly rgb_zenith.
    f_zenith = _perez_hw_form(1.0, ts, a, b, c, d, e)
    radiances = exposure_scale * rgb_zenith / max(f_zenith, 1e-6)

    params_one = np.array([a, b, 1.0, c, d, e, 0.0, 0.0, 0.8])
    params = np.tile(params_one, (3, 1))

    return SkyState(
        params=jnp.asarray(params, dtype=jnp.float32),
        radiances=jnp.asarray(radiances, dtype=jnp.float32),
        sun_direction=jnp.asarray(sun_direction, dtype=jnp.float32),
    )
