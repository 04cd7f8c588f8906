"""Quantized SSAO vs the exact gather oracle (ssao.comp port)."""

import jax
import jax.numpy as jnp
import numpy as np

from mo_renderer_tpu.passes.ssao import (
    ssao_pass,
    ssao_pass_exact,
    ssao_pass_pallas,
)


def _synthetic_depth(h=96, w=256, seed=0):
    """Plane-ish depth with a step edge and a bump: AO-relevant features."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    d = 0.96 + 0.02 * yy
    d = np.where(xx > 0.5, d - 0.005, d)  # depth edge
    bump = 0.004 * np.exp(-(((xx - 0.25) ** 2 + (yy - 0.5) ** 2) / 0.01))
    d = d - bump
    d += rng.normal(0, 1e-5, (h, w))
    return jnp.asarray(np.clip(d, 0.0, 1.0), jnp.float32)


def test_quantized_matches_exact_closely():
    depth = _synthetic_depth()
    exact = np.asarray(jax.jit(ssao_pass_exact)(depth))
    fast = np.asarray(jax.jit(ssao_pass)(depth))
    # same range, same large-scale structure
    assert fast.shape == exact.shape
    mad = np.abs(fast - exact).mean()
    assert mad < 0.02, f"mean abs diff {mad}"
    # occlusion dips at the depth edge in both
    assert exact.min() < 0.95 and fast.min() < 0.95
    corr = np.corrcoef(fast.ravel(), exact.ravel())[0, 1]
    assert corr > 0.95, f"correlation {corr}"


def test_flat_depth_unoccluded():
    depth = jnp.full((64, 128), 0.9, jnp.float32)
    for fn in (ssao_pass, ssao_pass_exact):
        ao = np.asarray(jax.jit(fn)(depth))
        assert ao.min() > 0.99  # no occlusion on a flat plane


def test_pallas_matches_jnp():
    """The Pallas tile kernel computes the identical radius-quantized AO
    (same tap offsets, same compares) — only the schedule differs."""
    depth = _synthetic_depth(32, 256, seed=3)
    a = np.asarray(jax.jit(ssao_pass)(depth))
    b = np.asarray(
        jax.jit(lambda d: ssao_pass_pallas(d, tile_h=16, tile_w=128))(depth)
    )
    np.testing.assert_allclose(a, b, atol=1.01 / 255.0)
    assert (a != b).mean() < 0.002


def test_output_is_rgba8_quantized():
    ao = np.asarray(jax.jit(ssao_pass)(_synthetic_depth(48, 128)))
    assert np.allclose(ao * 255.0, np.round(ao * 255.0), atol=1e-4)
