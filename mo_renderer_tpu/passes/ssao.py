"""SSAO pass — jax.numpy port of resources/shaders/ssao.comp.

Depth-only ambient occlusion with 3 rings x 6i samples (18 taps), hash
noise, and depth-proportional radius.  All constants match the shader:
near/far 0.1/100 hardcoded (ssao.comp:12-13), aoCap 0.5, aoMultiplier 50,
aoRange 60, ring fade 0.5^i.  Output is quantized to rgba8 like the
reference's storage image before the shading pass consumes it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEAR = 0.1
FAR = 100.0


def _linear_depth(d):
    """ssao.comp:22-24."""
    return (2.0 * NEAR) / (FAR + NEAR - d * (FAR - NEAR))


def _compare_depths(d1, d2):
    """ssao.comp:26-34."""
    ao_cap = 0.5
    ao_multiplier = 50.0
    depth_tolerance = 0.001
    ao_range = 60.0
    diff = jnp.sqrt(
        jnp.clip(1.0 - (d1 - d2) / (ao_range / (FAR - NEAR)), 0.0, 1.0)
    )
    return jnp.minimum(ao_cap, jnp.maximum(0.0, d1 - d2 - depth_tolerance) * ao_multiplier) * diff


def _noise(px, py):
    """generateRandomNoise (ssao.comp:15-20): fract(sin(dot)*43758.5453)."""
    def fract_sin(dx, dy):
        v = jnp.sin(px * dx + py * dy) * 43758.5453
        return v - jnp.floor(v)

    nx = fract_sin(12.9898, 78.233)
    ny = fract_sin(12.9898 * 2.0, 78.233 * 2.0)
    return nx * 0.004, ny * 0.004


def ssao_pass(depth: jnp.ndarray) -> jnp.ndarray:
    """depth (H, W) raw [0,1] depth buffer -> ssao (H, W) in [0,1]."""
    h, w = depth.shape
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    px = ix.astype(jnp.float32)
    py = iy.astype(jnp.float32)

    d_lin = _linear_depth(depth)
    nx, ny = _noise(px, py)

    rw = (1.0 / w) / jnp.clip(d_lin, 0.05, 1.0) + nx * (1.0 - nx)
    rh = (1.0 / h) / jnp.clip(d_lin, 0.05, 1.0) + ny * (1.0 - ny)
    rw = rw * (w / 2.0)
    rh = rh * (h / 2.0)

    ao = jnp.zeros_like(d_lin)
    total = 0.0
    fade = 1.0
    num_rings, num_samples = 3, 6
    for i in range(num_rings):
        fade *= 0.5
        for j in range(num_samples * i):
            step = 2.0 * jnp.pi / (num_samples * i)
            sw = jnp.cos(j * step) * i
            sh = jnp.sin(j * step) * i
            # int() truncates toward zero in GLSL
            ox = jnp.trunc(sw * rw).astype(jnp.int32)
            oy = jnp.trunc(sh * rh).astype(jnp.int32)
            sy = jnp.clip(iy + oy, 0, h - 1)
            sx = jnp.clip(ix + ox, 0, w - 1)
            d_s = _linear_depth(depth.reshape(-1)[sy * w + sx])
            ao = ao + _compare_depths(d_lin, d_s) * fade
            total += fade

    ao = 1.0 - ao / total
    # stored to an rgba8 image in the reference (ssao_pass.rs:49-60)
    return jnp.round(jnp.clip(ao, 0.0, 1.0) * 255.0) / 255.0
