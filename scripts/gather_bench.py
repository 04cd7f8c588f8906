"""Microbenchmark: random-gather formulations on TPU.

2M pixel-indices into a 4M-texel texture — which gather lowering is
fastest?  Informs the sampling library design.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_IDX = 1920 * 1088          # ~2M pixel samples
N_TEX = 1024 * 1024 * 4      # 4M texels (4-layer 1024^2 array)
REPS = 20


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:44s} {dt * 1e3:8.3f} ms")


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N_IDX,), 0, N_TEX, dtype=jnp.int32)
    # coherent indices (sorted) to test locality sensitivity
    idx_sorted = jnp.sort(idx)

    tex_f32_rows4 = jnp.zeros((N_TEX, 4), jnp.float32)
    tex_f32_flat = jnp.zeros((N_TEX,), jnp.float32)
    tex_u8_rows4 = jnp.zeros((N_TEX, 4), jnp.uint8)
    tex_u32_flat = jnp.zeros((N_TEX,), jnp.uint32)
    tex_f32_rows128 = jnp.zeros((N_TEX // 32, 128), jnp.float32)
    idx128 = idx % (N_TEX // 32)

    bench("take rows (N,4) f32", lambda t, i: jnp.take(t, i, axis=0),
          tex_f32_rows4, idx)
    bench("take rows (N,4) u8", lambda t, i: jnp.take(t, i, axis=0),
          tex_u8_rows4, idx)
    bench("take flat f32 x1", lambda t, i: jnp.take(t, i), tex_f32_flat, idx)
    bench("take flat f32 x4 (4 planes)",
          lambda t, i: sum(jnp.take(t, i + k) for k in range(4)),
          tex_f32_flat, idx)
    bench("take flat u32 packed + unpack",
          lambda t, i: (lambda v: (v & 0xFF).astype(jnp.float32)
                        + ((v >> 8) & 0xFF).astype(jnp.float32)
                        + ((v >> 16) & 0xFF).astype(jnp.float32)
                        + ((v >> 24) & 0xFF).astype(jnp.float32))(
                            jnp.take(t, i)),
          tex_u32_flat, idx)
    bench("take flat f32 sorted idx", lambda t, i: jnp.take(t, i),
          tex_f32_flat, idx_sorted)
    bench("take rows (N/32,128) f32",
          lambda t, i: jnp.take(t, i, axis=0), tex_f32_rows128, idx128)
    # 2D image gather formulation (H,W,C) baseline used by sample_bilinear
    tex_img = jnp.zeros((2048, 2048, 4), jnp.float32)
    iy = idx % 2048
    ix = (idx // 2048) % 2048
    bench("img (H,W,4) fancy-index [iy,ix]",
          lambda t, y, x: t[y, x], tex_img, iy, ix)

    # full bilinear through the current library
    from mo_renderer_tpu.device.sampling import (
        sample_array_bilinear,
    )
    tex_arr = jnp.zeros((4, 1024, 1024, 4), jnp.uint8)
    uv = jax.random.uniform(key, (N_IDX, 2))
    layer = idx % 4
    bench("sample_array_bilinear (lib)",
          lambda t, l, u: sample_array_bilinear(t, l, u), tex_arr, layer, uv)

    # channel-planes formulation of the same bilinear: 4 scalar gathers/tap
    def bilinear_planes(planes, layer, uv):
        _, h, w = planes.shape[1:] if False else (None, 1024, 1024)
        x = uv[..., 0] * w - 0.5
        y = uv[..., 1] * h - 0.5
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        fx = x - x0; fy = y - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        base = layer * (h * w)
        out = []
        for p in planes:  # 4 channel planes, each flat (L*H*W,)
            t00 = jnp.take(p, base + y0i * w + x0i)
            t10 = jnp.take(p, base + y0i * w + x1i)
            t01 = jnp.take(p, base + y1i * w + x0i)
            t11 = jnp.take(p, base + y1i * w + x1i)
            out.append((t00 * (1 - fx) + t10 * fx) * (1 - fy)
                       + (t01 * (1 - fx) + t11 * fx) * fy)
        return jnp.stack(out, -1)

    planes = [jnp.zeros((4 * 1024 * 1024,), jnp.float32) for _ in range(4)]
    bench("bilinear via 4 channel planes f32",
          lambda l, u, *ps: bilinear_planes(ps, l, u), layer, uv, *planes)

    # packed-u32 formulation: 1 scalar gather/tap + bit unpack
    def bilinear_packed(packed, layer, uv):
        h = w = 1024
        x = uv[..., 0] * w - 0.5
        y = uv[..., 1] * h - 0.5
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        fx = (x - x0)[..., None]; fy = (y - y0)[..., None]
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        base = layer * (h * w)

        def tap(iy, ix):
            v = jnp.take(packed, base + iy * w + ix)
            return jnp.stack(
                [((v >> s) & 0xFF).astype(jnp.float32) for s in
                 (0, 8, 16, 24)], -1) * (1 / 255.0)

        t00 = tap(y0i, x0i); t10 = tap(y0i, x1i)
        t01 = tap(y1i, x0i); t11 = tap(y1i, x1i)
        return ((t00 * (1 - fx) + t10 * fx) * (1 - fy)
                + (t01 * (1 - fx) + t11 * fx) * fy)

    packed = jnp.zeros((4 * 1024 * 1024,), jnp.uint32)
    bench("bilinear via packed u32",
          lambda l, u, p: bilinear_packed(p, l, u), layer, uv, packed)


if __name__ == "__main__":
    main()
