"""Uncharted2 filmic tonemapping of the running sample mean.

Exact reimplementation of the reference's display transform
(raytracer.wgsl:83-103): uncharted2 curve with exposure bias 0.246 and
white point 11.2, applied to accumulated-radiance / sample-count.
"""
from __future__ import annotations

import jax.numpy as jnp

EXPOSURE_BIAS = 0.246  # wgsl:86, "determined experimentally for the scene"
WHITE_POINT = 11.2  # wgsl:89


def _curve(x: jnp.ndarray) -> jnp.ndarray:
    """uncharted2Tonemap (wgsl:94-103)."""
    a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return ((x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f)) - e / f


def uncharted2(x: jnp.ndarray) -> jnp.ndarray:
    """Tonemap linear radiance to display range [0, ~1] (wgsl:83-92)."""
    curr = _curve(EXPOSURE_BIAS * x)
    white_scale = 1.0 / _curve(jnp.float32(WHITE_POINT))
    return white_scale * curr


def to_srgb_u8(mean_radiance: jnp.ndarray) -> jnp.ndarray:
    """Tonemap + quantize to uint8 for display/PNG.

    The reference presents into a Bgra8UnormSrgb swapchain (main.rs:463-473),
    i.e. the linear tonemapped value goes through the sRGB transfer function
    in hardware; apply the same encoding here.
    """
    x = jnp.clip(uncharted2(mean_radiance), 0.0, 1.0)
    srgb = jnp.where(
        x <= 0.0031308, 12.92 * x, 1.055 * jnp.power(x, 1.0 / 2.4) - 0.055
    )
    return jnp.clip(srgb * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
