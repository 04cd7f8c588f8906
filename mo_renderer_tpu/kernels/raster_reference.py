"""Reference (oracle) rasterizer — pure jax.numpy, O(T x pixels).

Semantically identical to the Pallas tile rasterizer (kernels/rasterizer.py)
but brute-force: every triangle is tested against every pixel.  Used as the
correctness oracle in tests and as a fallback for tiny scenes.  Shares the
tri_data layout produced by kernels/raster_setup.triangle_setup.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .raster_setup import (
    COL_TIE,
    COL_TRI_ID,
    COL_VALID,
    TriangleSetup,
)

FAR_DEPTH = 1.0


def _cover_and_depth(row, px, py):
    """Coverage mask + depth + barycentrics for one triangle over a pixel
    grid.  row: (16,) tri_data; px/py: (H, W) pixel centers."""
    a0, a1, a2 = row[0], row[1], row[2]
    b0, b1, b2 = row[3], row[4], row[5]
    c0, c1, c2 = row[6], row[7], row[8]
    zx, zy, zc = row[9], row[10], row[11]
    inv_area = row[12]
    tie_bits = row[13].astype(jnp.int32)
    valid = row[COL_VALID] > 0

    w0 = a0 * px + b0 * py + c0
    w1 = a1 * px + b1 * py + c1
    w2 = a2 * px + b2 * py + c2

    tie0 = (tie_bits & 1) > 0
    tie1 = (tie_bits & 2) > 0
    tie2 = (tie_bits & 4) > 0

    def accept(w, tie):
        return jnp.where(tie, w >= 0, w > 0)

    cover = accept(w0, tie0) & accept(w1, tie1) & accept(w2, tie2) & valid

    bb0 = w0 * inv_area
    bb1 = w1 * inv_area
    z = zx * px + zy * py + zc  # affine depth plane (see raster_setup)
    return cover, z, bb0, bb1


@functools.partial(jax.jit, static_argnames=("width", "height"))
def rasterize_reference(setup: TriangleSetup, width: int, height: int):
    """Visibility buffer: (tri_id int32 (H,W) — -1 = background,
    depth f32 (H,W), b0 f32 (H,W), b1 f32 (H,W)).

    Depth test LessOrEqual with later-drawn triangle winning ties
    (Vulkan CompareOp::LessOrEqual, gbuffer_pass.rs:363)."""
    tri_data = setup.tri_data
    t = tri_data.shape[0]

    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    py, px = jnp.meshgrid(ys, xs, indexing="ij")

    init = (
        jnp.full((height, width), -1, jnp.int32),
        jnp.full((height, width), FAR_DEPTH, jnp.float32),
        jnp.zeros((height, width), jnp.float32),
        jnp.zeros((height, width), jnp.float32),
    )

    def body(k, acc):
        tri, depth, bb0a, bb1a = acc
        row = tri_data[k]
        cover, z, bb0, bb1 = _cover_and_depth(row, px, py)
        win = cover & (z <= depth) & (z >= 0.0)
        tid = row[COL_TRI_ID].astype(jnp.int32)
        return (
            jnp.where(win, tid, tri),
            jnp.where(win, z, depth),
            jnp.where(win, bb0, bb0a),
            jnp.where(win, bb1, bb1a),
        )

    return jax.lax.fori_loop(0, t, body, init)
