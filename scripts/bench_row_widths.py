"""Measure XLA gather cost vs ROW WIDTH at fixed index count (TPU).

The texture-stack gather (10.3ms @ 2M idx, 8xu32 rows) is claimed to sit
at a per-index floor (NOTES_PERF.md).  If narrower rows have a faster
emitter tier, u16/channel-dropped stack packings are worth building;
if cost is flat in row bytes, index count is the only lever.

Usage: python scripts/bench_row_widths.py
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def take_rows(table, idx):
    return table.at[idx].get(mode="promise_in_bounds")


def timeit(name, rows, width, dtype, n_idx, reps=10):
    table = jnp.zeros((rows, width), dtype)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, rows, n_idx).astype(np.int32)
    )
    f = jax.jit(lambda t, i: jnp.sum(take_rows(t, i).astype(jnp.float32)))
    np.asarray(f(table, idx))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(table, idx)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    mb = rows * width * jnp.dtype(dtype).itemsize / 1e6
    print(f"{name:26s} {dt:8.2f} ms  ({n_idx/1e6:.2f}M idx, "
          f"{width}x{jnp.dtype(dtype).itemsize}B rows, {mb:7.1f}MB)",
          flush=True)


def main():
    n = 1920 * 1088
    rows = 2 * 1024 * 1024  # ~ the man.glb 2-slot native stack row count
    for w, d, tag in [
        (8, jnp.uint32, "u32x8 (current 32B)"),
        (6, jnp.uint32, "u32x6 (24B rgb+rg)"),
        (4, jnp.uint32, "u32x4 (16B)"),
        (8, jnp.uint16, "u16x8 (16B)"),
        (2, jnp.uint32, "u32x2 (8B)"),
        (1, jnp.uint32, "u32x1 (4B nearest)"),
    ]:
        timeit(tag, rows, w, d, n)
    # index-count scaling at the current width
    for frac, tag in [(2, "u32x8 @half idx"), (4, "u32x8 @quarter idx")]:
        timeit(tag, rows, 8, jnp.uint32, n // frac)
    # small-table tier check (entire table VMEM-resident?)
    timeit("u32x8 64K rows", 64 * 1024, 8, jnp.uint32, n)


if __name__ == "__main__":
    main()
