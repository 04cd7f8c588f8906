"""Specular prefilter approximation budget.

kernels/ibl.specular_prefilter samples its environment from the merged
child+parent RGBE quad chain (ONE 32-byte gather per trilinear tap —
see NOTES_PERF round 3) instead of exact f32 trilinear taps.  Two
approximations ride on that: RGBE quantization (shared-exponent 8-bit
mantissa, <= ~0.4%/tap) and the merged layout's constant 1/4-parent-
texel shift of the coarse tap.  This test pins the combined deviation
against an EXACT oracle that reruns the identical importance-sampling
math with float32 trilinear taps (sampling.sample_mipcube_lod).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mo_renderer_tpu.device import sampling
from mo_renderer_tpu.kernels import brdf
from mo_renderer_tpu.kernels.ibl import (
    PI,
    _env_mip_chain,
    cube_directions,
    specular_prefilter,
)

MIPS = 3
SAMPLES = 32  # kept small: the oracle unrolls all samples in one trace


def _oracle_level(env_chain, dirs, roughness, num_samples, env_size):
    """Exact-trilinear twin of ibl._prefilter_level (same math, same
    Hammersley sequence, f32 taps)."""
    p = dirs.shape[0]
    color = jnp.zeros((p, 3), jnp.float32)
    weight = jnp.zeros((p,), jnp.float32)
    for i in range(num_samples):
        xi = brdf.hammersley2d(jnp.full((p,), i, jnp.uint32), num_samples)
        h = brdf.importance_sample_ggx(xi, roughness, dirs)
        l = 2.0 * brdf.dot3(dirs, h)[..., None] * h - dirs
        l = l / jnp.linalg.norm(l, axis=-1, keepdims=True)
        ndotl = jnp.maximum(brdf.dot3(dirs, l), 0.0)
        ndoth = jnp.maximum(brdf.dot3(dirs, h), 1e-4)
        d = brdf.distribution_ggx(dirs, h, roughness)
        pdf = jnp.maximum(d * ndoth / (4.0 * ndoth), 1e-8)
        omega_s = 1.0 / (num_samples * pdf)
        omega_p = 4.0 * PI / (6.0 * env_size * env_size)
        lod = jnp.clip(0.5 * jnp.log2(omega_s / omega_p), 0.0, 12.0)
        env = sampling.sample_mipcube_lod(env_chain, l, lod)
        w = jnp.where(ndotl > 0.0, ndotl, 0.0)
        color = color + env * w[..., None]
        weight = weight + w
    return color / jnp.maximum(weight, 1e-8)[..., None]


def test_prefilter_matches_exact_trilinear_oracle():
    rng = np.random.default_rng(7)
    # HDR-ish env: smooth base + a few bright "suns" (exercises RGBE
    # shared-exponent quantization across a wide dynamic range)
    env = rng.random((6, 16, 16, 3)).astype(np.float32) * 2.0
    env[0, 3:5, 3:5] = 40.0
    env[3, 10:12, 5:7] = 25.0
    env = jnp.asarray(env)

    spec = specular_prefilter(env, num_mips=MIPS, num_samples=SAMPLES)
    chain = _env_mip_chain(env)
    size = env.shape[1]

    np.testing.assert_allclose(
        np.asarray(spec.level(0)), np.asarray(env), rtol=1e-6
    )
    for i in range(1, MIPS):
        s = max(size >> i, 1)
        dirs = cube_directions(s).reshape(-1, 3)
        oracle = np.asarray(
            jax.jit(
                lambda d: _oracle_level(
                    chain, d, jnp.float32(i / (MIPS - 1)), SAMPLES, size
                )
            )(dirs)
        ).reshape(6, s, s, 3)
        got = np.asarray(spec.level(i))
        rel = np.abs(got - oracle) / (np.abs(oracle) + 1e-2)
        assert rel.mean() < 0.02, (i, rel.mean())
        assert rel.max() < 0.25, (i, rel.max())
