"""Microbench: even-grid (stride-2) decimation strategies at 1080p.

The frame's half-res consumers share one ``a[::2, ::2]`` slice of a
concatenated (H, W, 8) G-buffer plane; XLA lowers the strided slice to a
per-index gather (~4.5ms at 0.5M output indices — NOTES_PERF.md roadmap
item 3).  Candidates measured here:

  slice    a[::2, ::2]                      (current baseline)
  rwin     lax.reduce_window, window 1, stride 2
  matmul   S_r @ a @ S_c with one-hot f32 selection matrices (MXU;
           decimation-as-matmul is bandwidth-bound, not index-bound)
  bf16mm   same, bf16 inputs to the dots (exactness: one-hot rows have
           a single 1.0 — bf16 mantissa holds f32 values' top 8 bits,
           so ONLY valid if a is already bf16; measured for reference)

Run: python scripts/bench_evengrid.py  (TPU; ~1 min)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

H, W, C = 1088, 1920, 8
REPS = 20


def _time(name, fn, *args):
    f = jax.jit(lambda *a: jnp.sum(fn(*a)))
    out = f(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:12s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (H, W, C), jnp.float32)

    # correctness references
    want = np.asarray(a)[::2, ::2]

    def f_slice(x):
        return x[::2, ::2]

    def f_rwin(x):
        return lax.reduce_window(
            x, 0.0, lax.add,
            window_dimensions=(1, 1, 1),
            window_strides=(2, 2, 1),
            padding="VALID",
        )

    sr = np.zeros((H // 2, H), np.float32)
    sr[np.arange(H // 2), 2 * np.arange(H // 2)] = 1.0
    sc = np.zeros((W, W // 2), np.float32)
    sc[2 * np.arange(W // 2), np.arange(W // 2)] = 1.0
    srj, scj = jnp.asarray(sr), jnp.asarray(sc)

    def f_matmul(x):
        # rows: (H/2, H) @ (H, W*C) -> (H/2, W, C)
        rows = (srj @ x.reshape(H, W * C)).reshape(H // 2, W, C)
        # cols: contract w -> (H/2, C, W/2) then put W back in the middle
        cols = jnp.einsum(
            "hwc,wk->hkc", rows, scj,
            precision=lax.Precision.HIGHEST,
        )
        return cols

    for name, fn in [("slice", f_slice), ("rwin", f_rwin),
                     ("matmul", f_matmul)]:
        got = np.asarray(jax.jit(fn)(a))
        err = np.abs(got - want).max()
        print(f"{name:12s} max_err {err:.2e}")
        _time(name, fn, a)

    # the same on separate planes (3x (H, W) f32), closer to some uses
    p = jax.random.normal(key, (H, W), jnp.float32)
    _time("slice2d", lambda x: x[::2, ::2], p)
    _time(
        "matmul2d",
        lambda x: jnp.einsum("rh,hw,wk->rk", srj, x, scj,
                             precision=lax.Precision.HIGHEST),
        p,
    )


if __name__ == "__main__":
    main()
