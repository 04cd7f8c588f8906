"""Correctness + speed of the Pallas decimate/interleave kernels on TPU,
vs the reduce_window even-grid trick and XLA strided slices.

Usage: python scripts/bench_decimate.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from mo_renderer_tpu.kernels import decimate as D

H, W = 1088, 1920
REPS = 20


def timeit(name, f, *args):
    g = jax.jit(lambda: jnp.sum(f(*args).astype(jnp.float32)))
    np.asarray(g())
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = g()
    np.asarray(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/REPS*1e3:8.3f} ms",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((H, W), np.float32))
    a = jnp.asarray(rng.random((H, W // 2), np.float32))
    b = jnp.asarray(rng.random((H, W // 2), np.float32))
    xi = jnp.asarray(rng.integers(0, 1 << 20, (H, W)).astype(np.int32))

    # correctness vs oracles
    for phase in (0, 1, "cb", "anti"):
        got = np.asarray(D.decimate_cols(x, phase))
        want = np.asarray(D.decimate_cols_ref(x, phase))
        assert (got == want).all(), f"decimate {phase} mismatch"
    assert (
        np.asarray(D.interleave_cols(a, b))
        == np.asarray(D.interleave_cols_ref(a, b))
    ).all(), "interleave mismatch"
    gi = np.asarray(D.decimate_cols(xi, "cb"))
    assert (gi == np.asarray(D.decimate_cols_ref(xi, "cb"))).all(), "int cb"
    print("correctness OK", flush=True)

    timeit("baseline sum(x)", lambda t: t, x)

    # net per-op cost via a 20-deep in-jit chain (amortizes the dispatch
    # floor): each step is a decimate/decimate/interleave roundtrip
    def chain(t):
        for k in range(20):
            e = D.decimate_cols(t, 0)
            o = D.decimate_cols(t, 1)
            t = D.interleave_cols(e, o) + np.float32(k)
        return t

    def chain_rw(t):
        for k in range(20):
            e = jax.lax.reduce_window(
                t, jnp.zeros((), t.dtype), jax.lax.add,
                window_dimensions=(1, 1), window_strides=(1, 2),
                padding="VALID")
            t = jnp.concatenate([e, e], axis=1) + np.float32(k)
        return t

    def chain_rw_ilv(t):  # reduce_window decimate + reshape interleave
        for k in range(20):
            e = jax.lax.reduce_window(
                t, jnp.zeros((), t.dtype), jax.lax.add,
                window_dimensions=(1, 1), window_strides=(1, 2),
                padding="VALID")
            o = jax.lax.reduce_window(
                t, jnp.zeros((), t.dtype), jax.lax.add,
                window_dimensions=(1, 1), window_strides=(1, 2),
                padding=((0, 0), (-1, 1)))
            t = jnp.stack([e, o], axis=-1).reshape(t.shape) + np.float32(k)
        return t

    def chain_rw_pilv(t):  # reduce_window decimate + pallas interleave
        for k in range(20):
            e = jax.lax.reduce_window(
                t, jnp.zeros((), t.dtype), jax.lax.add,
                window_dimensions=(1, 1), window_strides=(1, 2),
                padding="VALID")
            o = jax.lax.reduce_window(
                t, jnp.zeros((), t.dtype), jax.lax.add,
                window_dimensions=(1, 1), window_strides=(1, 2),
                padding=((0, 0), (-1, 1)))
            t = D.interleave_cols(e, o) + np.float32(k)
        return t

    timeit("chain 20x (dec+dec+ilv)", chain, x)
    timeit("chain 20x reduce_window", chain_rw, x)
    timeit("chain 20x rw + reshape-ilv", chain_rw_ilv, x)
    timeit("chain 20x rw + pallas-ilv", chain_rw_pilv, x)

    timeit("decimate f32 (reduce_window)", D.decimate_cols, x, "cb")
    timeit("decimate i32 (reduce_window)", D.decimate_cols, xi, "cb")
    timeit("pallas interleave", D.interleave_cols, a, b)

    def rw_slice(t):
        return jax.lax.reduce_window(
            t, jnp.zeros((), t.dtype), jax.lax.add,
            window_dimensions=(1, 1), window_strides=(1, 2),
            padding="VALID",
        )

    timeit("reduce_window (1,2) f32", rw_slice, x)
    timeit("xla strided slice f32", lambda t: t[:, ::2], x)

    # 8-channel half_geo analog: 4 plane decimations vs one reduce_window
    x8 = jnp.asarray(rng.random((H, W, 8), np.float32))

    def rw22(t):
        return jax.lax.reduce_window(
            t, jnp.zeros((), t.dtype), jax.lax.add,
            window_dimensions=(1, 1, 1), window_strides=(2, 2, 1),
            padding="VALID",
        )

    timeit("reduce_window (2,2) 8ch", rw22, x8)


if __name__ == "__main__":
    main()
