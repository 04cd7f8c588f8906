"""Tonemap + color-space ops (resources/shaders/include/{tonemap,utility}.glsl)."""

from __future__ import annotations

import jax.numpy as jnp

GAMMA = 2.2


def tonemap_unreal(x):
    """Unreal 3 fit, gamma 2.2 baked in (tonemap.glsl:35-37) — the tonemap
    the shading pass actually uses (shading_pass.frag:116)."""
    return x / (x + 0.155) * 1.019


def tonemap_reinhard(color):
    """tonemap.glsl:26-32."""
    r = color / (color + 1.0)
    return jnp.power(r, 1.0 / GAMMA)


def tonemap_uncharted2(color):
    """tonemap.glsl:6-24 (with the reference's modified constants)."""
    a, b, c, d, e, f, w = 0.22, 0.30, 0.10, 0.20, 0.01, 0.30, 11.2

    def curve(x):
        return ((x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f)) - e / f

    color = curve(color * 2.0)
    white = curve(jnp.float32(w))
    return jnp.power(jnp.maximum(color / white, 0.0), 1.0 / GAMMA)


def srgb_to_linear(srgb):
    """utility.glsl toLinear (:15-22), piecewise."""
    return jnp.where(
        srgb < 0.04045,
        srgb / 12.92,
        jnp.power(jnp.maximum((srgb + 0.055) / 1.055, 0.0), 2.4),
    )


def linear_to_srgb(linear):
    """utility.glsl fromLinear (:5-12), piecewise."""
    return jnp.where(
        linear < 0.0031308,
        linear * 12.92,
        1.055 * jnp.power(jnp.maximum(linear, 1e-20), 1.0 / 2.4) - 0.055,
    )


def quantize_unorm8(color):
    """Float [0,1] -> uint8 with round-to-nearest (Vulkan UNORM store)."""
    return jnp.clip(
        jnp.round(jnp.clip(color, 0.0, 1.0) * 255.0), 0, 255
    ).astype(jnp.uint8)
