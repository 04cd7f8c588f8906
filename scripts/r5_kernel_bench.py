"""Standalone sweep of the attrs->planes kernel vs the XLA relayout path.

Isolates the round-5 relayout attack from the full frame (fast compiles,
same shapes as the 1080p cb domain): a (T, 58) table gathered at
(1088, 960) indices, then either

- xla_interp: the production slicing math (forces the gather-output
  relayout copy + plane fusions), or
- kernel[b=..]: kernels/attr_planes.py at various block_rows /
  input-fusion settings.

Every variant ends in a sum over all planes so the work is observable
on the axon backend (scalar fetch syncs).  The gather itself rides in
every variant identically, so deltas are pure consumer cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mo_renderer_tpu.kernels.attr_planes import attr_planes

H, W, T, NMAT = 1088, 960, 12288, 23
C = 35 + NMAT


def reference_planes(rows, nx, ny, pv, n_mat):
    def ch(c):
        return rows[..., c]

    u, v = [], []
    for k in range(3):
        wx, wy, wz = ch(3 * k), ch(3 * k + 1), ch(3 * k + 2)
        xk = wx * pv[0, 0] + wy * pv[0, 1] + wz * pv[0, 2] + pv[0, 3]
        yk = wx * pv[1, 0] + wy * pv[1, 1] + wz * pv[1, 2] + pv[1, 3]
        wk = wx * pv[3, 0] + wy * pv[3, 1] + wz * pv[3, 2] + pv[3, 3]
        u.append(xk - nx * wk)
        v.append(yk - ny * wk)
    q0 = u[1] * v[2] - u[2] * v[1]
    q1 = u[2] * v[0] - u[0] * v[2]
    q2 = u[0] * v[1] - u[1] * v[0]
    qs = q0 + q1 + q2
    qs = jnp.where(jnp.abs(qs) > 1e-30, qs, 1.0)
    bb0, bb1, bb2 = q0 / qs, q1 / qs, q2 / qs

    def interp(base, width, c):
        return (
            ch(base + c) * bb0
            + ch(base + width + c) * bb1
            + ch(base + 2 * width + c) * bb2
        )

    wp = [interp(0, 3, c) for c in range(3)]
    n = [interp(9, 3, c) for c in range(3)]
    t = [interp(18, 3, c) for c in range(3)]
    handed = ch(34)
    bt = [
        (n[1] * t[2] - n[2] * t[1]) * handed,
        (n[2] * t[0] - n[0] * t[2]) * handed,
        (n[0] * t[1] - n[1] * t[0]) * handed,
    ]
    uv = [interp(27, 2, 0), interp(27, 2, 1)]
    mats = [ch(35 + m) for m in range(n_mat)]
    return wp + n + t + bt + uv + [ch(33), handed] + mats


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32))
    # coherent-ish indices: blocks of repeated tri ids like a real frame
    idx = jnp.asarray(
        np.repeat(
            rng.integers(0, T, size=(H * W // 64)), 64
        ).reshape(H, W).astype(np.int32)
    )
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    nx = jnp.asarray((xx + 0.5) * (2.0 / W) - 1.0)
    ny = jnp.asarray((yy + 0.5) * (2.0 / H) - 1.0)
    pv = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))

    def gather(i):
        return table.at[i].get(mode="promise_in_bounds")

    @jax.jit
    def xla_interp(i):
        rows = gather(i)
        planes = reference_planes(rows, nx, ny, pv, NMAT)
        return sum(p.sum() for p in planes)

    def make_kernel(block_rows, input_fusion=False):
        @jax.jit
        def f(i):
            rows = gather(i)
            planes = attr_planes(
                rows, nx, ny, pv, n_mat=NMAT,
                block_rows=block_rows, input_fusion=input_fusion,
            )
            return sum(p.sum() for p in planes)
        return f

    @jax.jit
    def gather_only(i):
        # baseline: gather + a trivial native-layout reduce (no relayout)
        return gather(i).sum()

    variants = [
        ("gather_only", gather_only),
        ("xla_interp", xla_interp),
        ("kernel_b8", make_kernel(8)),
        ("kernel_b16", make_kernel(16)),
        ("kernel_b32", make_kernel(32)),
        ("kernel_b8_fuse", make_kernel(8, True)),
    ]
    compiled = []
    for name, f in variants:
        t0 = time.perf_counter()
        try:
            np.asarray(f(idx))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        print(f"{name}: warm in {time.perf_counter()-t0:.0f}s", flush=True)
        compiled.append((name, f))

    best = {n: float("inf") for n, _ in compiled}
    for trial in range(4):
        for name, f in compiled:
            t0 = time.perf_counter()
            for _ in range(10):
                r = f(idx)
            np.asarray(r)
            best[name] = min(best[name], (time.perf_counter() - t0) / 10)
    print("\n=== best-of-4 (ms, incl. shared gather) ===")
    for name, _ in compiled:
        print(f"{name:16s} {best[name]*1e3:7.2f}")


if __name__ == "__main__":
    main()
