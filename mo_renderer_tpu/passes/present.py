"""Present pass — swapchain blit replacement (mo_renderpass/src/present_pass.rs).

The reference samples the shading output into the swapchain image with a
fullscreen draw.  Headless on TPU, "present" = quantize the tonemapped
color to rgba8 (the swapchain format) and hand the array to the host.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..kernels.tonemap import quantize_unorm8


def present_pass(color: jnp.ndarray) -> jnp.ndarray:
    """color (H, W, 3) float [0,1] -> (H, W, 4) uint8 rgba."""
    rgb = quantize_unorm8(color)
    alpha = jnp.full(color.shape[:2] + (1,), 255, jnp.uint8)
    return jnp.concatenate([rgb, alpha], axis=-1)
