"""Compare formulations of the two layout-copy hotspots on the REAL
man.glb scene at 1080p (trace: copy.383 ~2.1ms after the attrs gather,
copy.318 ~1.2ms after the one-hot material matmul).

Variants are timed as gather/matmul + the consuming math reduced to a
scalar, so a winning formulation must beat gather+copy+interp combined.

Usage: python scripts/bench_interp_variants.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("MO_MODEL", "man.glb")

import jax
import jax.numpy as jnp

from examples.pbr_ibl import build_app
from mo_renderer_tpu.config import EngineConfig
from mo_renderer_tpu.device.sampling import take_rows
from mo_renderer_tpu.passes.vertex_stage import (
    TRI_B0, TRI_N0, TRI_T0, TRI_UV0, TRI_WP0,
)

REPS = 10
H, W = 1088, 1920


def timeit(name, f, *args):
    g = jax.jit(f)
    np.asarray(g(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = g(*args)
    np.asarray(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/REPS*1e3:8.2f} ms",
          flush=True)


def main():
    cfg = EngineConfig(width=W, height=H)
    app = build_app(cfg)
    app.resumed()
    scene = app.renderer.scene
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.integers(0, 11264, (H, W)).astype(np.int32))
    b0 = jnp.asarray(rng.random((H, W), np.float32))
    b1 = jnp.asarray(rng.random((H, W), np.float32) * (1 - np.asarray(b0)))

    def consume(outs):
        return sum(jnp.sum(o) for o in outs)

    # --- attrs: current corner-major slices ---
    def attrs_current(attrs, t, bb0, bb1, bb2):
        row = take_rows(attrs, t)

        def corner(base, width, k):
            return row[..., base + width * k : base + width * (k + 1)]

        def interp(base, width):
            return (
                corner(base, width, 0) * bb0[..., None]
                + corner(base, width, 1) * bb1[..., None]
                + corner(base, width, 2) * bb2[..., None]
            )

        outs = [interp(b, w) for b, w in (
            (TRI_WP0, 3), (TRI_N0, 3), (TRI_T0, 3), (TRI_B0, 3), (TRI_UV0, 2)
        )]
        outs.append(row[..., 42:44])
        return consume(outs)

    # --- attrs: reshape-einsum per attribute ---
    def attrs_einsum(attrs, t, bb0, bb1, bb2):
        row = take_rows(attrs, t)
        bb = jnp.stack([bb0, bb1, bb2], axis=-1)
        outs = []
        for base, width in (
            (TRI_WP0, 3), (TRI_N0, 3), (TRI_T0, 3), (TRI_B0, 3), (TRI_UV0, 2)
        ):
            blk = row[..., base : base + 3 * width].reshape(H, W, 3, width)
            outs.append(jnp.einsum("hwk,hwkc->hwc", bb, blk))
        outs.append(row[..., 42:44])
        return consume(outs)

    # --- attrs: flat-N gather ---
    def attrs_flat(attrs, t, bb0, bb1, bb2):
        row = take_rows(attrs, t.reshape(-1))
        f0 = bb0.reshape(-1, 1)
        f1 = bb1.reshape(-1, 1)
        f2 = bb2.reshape(-1, 1)

        def interp(base, width):
            return (
                row[:, base : base + width] * f0
                + row[:, base + width : base + 2 * width] * f1
                + row[:, base + 2 * width : base + 3 * width] * f2
            )

        outs = [interp(b, w) for b, w in (
            (TRI_WP0, 3), (TRI_N0, 3), (TRI_T0, 3), (TRI_B0, 3), (TRI_UV0, 2)
        )]
        outs.append(row[:, 42:44])
        return consume(outs)

    # --- attrs: channel-major rows (one 14-wide interp) ---
    # reorder host-side: [c0 14ch | c1 | c2 | mat ht]
    perm = []
    for k in range(3):
        for base, width in (
            (TRI_WP0, 3), (TRI_N0, 3), (TRI_T0, 3), (TRI_B0, 3), (TRI_UV0, 2)
        ):
            perm.extend(range(base + width * k, base + width * (k + 1)))
    perm.extend([42, 43])
    attrs_cm = jnp.asarray(np.asarray(scene.tri_attrs)[:, perm])

    def attrs_chmajor(attrs, t, bb0, bb1, bb2):
        row = take_rows(attrs, t)
        a = (
            row[..., 0:14] * bb0[..., None]
            + row[..., 14:28] * bb1[..., None]
            + row[..., 28:42] * bb2[..., None]
        )
        return consume([a, row[..., 42:44]])

    bb2 = 1.0 - b0 - b1
    timeit("attrs current (corner-major)", attrs_current, scene.tri_attrs, t, b0, b1, bb2)
    timeit("attrs einsum", attrs_einsum, scene.tri_attrs, t, b0, b1, bb2)
    timeit("attrs flat-N", attrs_flat, scene.tri_attrs, t, b0, b1, bb2)
    timeit("attrs channel-major", attrs_chmajor, attrs_cm, t, b0, b1, bb2)

    # --- material one-hot matmul ---
    mats = scene.materials  # (64, 48)
    mid = jnp.asarray(rng.integers(0, 8, (H, W)).astype(np.int32))

    def mat_current(mats, mid):
        onehot = jax.nn.one_hot(mid, mats.shape[0], dtype=jnp.float32)
        m = jnp.einsum("hwm,mc->hwc", onehot, mats,
                       precision=jax.lax.Precision.HIGHEST)
        return consume([m[..., c] * (c + 1.0) for c in range(0, 48, 5)])

    def mat_reduced(mats, mid):
        cols = jnp.asarray(list(range(0, 24)), jnp.int32)
        sub = mats[:, cols]
        onehot = jax.nn.one_hot(mid, mats.shape[0], dtype=jnp.float32)
        m = jnp.einsum("hwm,mc->hwc", onehot, sub,
                       precision=jax.lax.Precision.HIGHEST)
        return consume([m[..., c] * (c + 1.0) for c in range(0, 24, 3)])

    def mat_chw(mats, mid):
        onehot = jax.nn.one_hot(mid, mats.shape[0], dtype=jnp.float32)
        m = jnp.einsum("mc,hwm->chw", mats, onehot,
                       precision=jax.lax.Precision.HIGHEST)
        return consume([m[c] * (c + 1.0) for c in range(0, 48, 5)])

    def mat_gather(mats, mid):
        m = take_rows(mats, mid)
        return consume([m[..., c] * (c + 1.0) for c in range(0, 48, 5)])

    timeit("mat one-hot hwc (current)", mat_current, mats, mid)
    timeit("mat one-hot 24 cols", mat_reduced, mats, mid)
    timeit("mat one-hot chw", mat_chw, mats, mid)
    timeit("mat row gather", mat_gather, mats, mid)


if __name__ == "__main__":
    main()
