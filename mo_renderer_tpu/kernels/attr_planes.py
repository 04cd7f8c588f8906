"""Fused attrs-row -> channel-plane kernel (the gather-relayout attack).

Round-4 trace: the attrs row gather emits ``f32[H, W, C]`` in its native
row-major layout (channels minor), but every consumer wants per-channel
(H, W) planes, so XLA inserts a whole-tensor relayout copy — 1.21 ms /
233 MB of traffic at 1080p, the single largest non-floor block
(NOTES_PERF.md round-4 floor proof).  All table-side layout experiments
measured neutral: the copy is compiler-chosen, pinned by the gather
emitter's output layout on one side and the elementwise pipeline's
plane layout on the other.

This kernel removes the copy by CONSUMING the gather result in its
native layout: each grid step DMAs a (8, 128, C) block of rows (one
native f32 tile of pixels x all channels), transposes it in VMEM
(8, C, 128), and runs the whole per-pixel interpolation pipeline of
``passes/gbuffer.gbuffer_pass_fast`` on (8, 128) channel tiles at full
VPU utilization:

- homogeneous perspective-correct barycentrics from the packed
  world-space corners (gbuffer._homogeneous_barycentrics),
- world position / normal / tangent / uv0 interpolation,
- the per-pixel bitangent (cross(n, t) * handedness),
- material-column passthrough (the columns appended to the attrs row
  at pack time).

Outputs (16 + n_mat of them) are (H, W) planes — exactly the layout the shading pipeline
wants — so XLA's relayout never exists: traffic drops from
read C + write C (copy) + re-read for interpolation to read C + write
only the ~17+n_mat consumed planes, and the interpolation math rides
the kernel's DMA for free.

Arithmetic mirrors gbuffer_pass_fast term-for-term; residual FMA-
grouping differences between Mosaic and XLA are a few f32 ULPs
(pinned by tests/test_attr_planes.py at the 8-bit-LSB level).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax._src.pallas.mosaic.core import CompilerParams

from .rasterizer import _use_interpret

_BLOCK = 1024  # pixels per grid step: one native (8, 128) f32 tile


def supports(h: int, w: int) -> bool:
    """The kernel tiles the flattened pixel stream in 1024-pixel blocks."""
    return (h * w) % _BLOCK == 0


def _kernel(params_ref, rows_ref, nx_ref, ny_ref, *out_refs, n_mat: int):
    # (8, 128, C) pixel-major block -> (8, C, 128): channels become
    # sublane-indexable, pixels stay on (8, 128) native tiles.
    t = jnp.transpose(rows_ref[0], (0, 2, 1))

    def ch(c):
        return t[:, c, :]

    def pv(r, c):
        return params_ref[0, 4 * r + c]

    nx = nx_ref[0]
    ny = ny_ref[0]

    # --- homogeneous barycentrics (gbuffer._homogeneous_barycentrics) ---
    u, v = [], []
    for k in range(3):
        wx, wy, wz = ch(3 * k), ch(3 * k + 1), ch(3 * k + 2)
        xk = wx * pv(0, 0) + wy * pv(0, 1) + wz * pv(0, 2) + pv(0, 3)
        yk = wx * pv(1, 0) + wy * pv(1, 1) + wz * pv(1, 2) + pv(1, 3)
        wk = wx * pv(3, 0) + wy * pv(3, 1) + wz * pv(3, 2) + pv(3, 3)
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

    out = list(out_refs)

    def emit(val):
        out.pop(0)[0] = val

    # layout constants mirror passes/vertex_stage.py (TRI_*)
    wp = [interp(0, 3, c) for c in range(3)]
    n = [interp(9, 3, c) for c in range(3)]
    tg = [interp(18, 3, c) for c in range(3)]
    handed = ch(34)
    # bitangent = cross(n, t) * handedness (gbuffer_pass_fast)
    bt = [
        (n[1] * tg[2] - n[2] * tg[1]) * handed,
        (n[2] * tg[0] - n[0] * tg[2]) * handed,
        (n[0] * tg[1] - n[1] * tg[0]) * handed,
    ]
    for val in wp + n + tg + bt:
        emit(val)
    emit(interp(27, 2, 0))  # uv0.u
    emit(interp(27, 2, 1))  # uv0.v
    emit(ch(33))  # material id
    emit(handed)
    for m in range(n_mat):  # material-column passthrough
        emit(ch(35 + m))
    assert not out


@functools.partial(
    jax.jit,
    static_argnames=("n_mat", "interpret", "block_rows", "input_fusion"),
)
def attr_planes(rows, nx, ny, proj_view, *, n_mat: int,
                interpret: bool | None = None, block_rows: int = 8,
                input_fusion: bool = False):
    """rows (H, W, 35 + n_mat) f32 gather output (native layout);
    nx/ny (H, W) pixel-center NDC (gbuffer.pixel_ndc); proj_view (4, 4).

    Returns 16 + n_mat (H, W) f32 planes, in order:
    wp.xyz, n.xyz, t.xyz, bt.xyz, uv0.uv, mat_id, handed, mat_cols...

    block_rows: sublane rows of pixels per grid step (block =
    block_rows x 128 pixels x C channels); measured on TPU by
    scripts/r5_kernel_bench.py.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w, c = rows.shape
    p = h * w
    blk = block_rows * 128
    assert p % blk == 0, (h, w, block_rows)
    assert c == 35 + n_mat, (c, n_mat)
    b = p // blk
    n_out = 16 + n_mat

    r4 = rows.reshape(b, block_rows, 128, c)
    nx4 = nx.reshape(b, block_rows, 128).astype(jnp.float32)
    ny4 = ny.reshape(b, block_rows, 128).astype(jnp.float32)
    params = proj_view.astype(jnp.float32).reshape(1, 16)

    grid = (b,)
    plane_spec = pl.BlockSpec((1, block_rows, 128), lambda i: (i, 0, 0))
    outs = pl.pallas_call(
        functools.partial(_kernel, n_mat=n_mat),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_rows, 128, c), lambda i: (i, 0, 0, 0)),
            plane_spec,
            plane_spec,
        ],
        out_specs=[plane_spec] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((b, block_rows, 128), jnp.float32)
        ] * n_out,
        compiler_params=CompilerParams(
            dimension_semantics=("arbitrary",),
            allow_input_fusion=[False, True, False, False]
            if input_fusion else None,
        ),
        interpret=_use_interpret() if interpret is None else interpret,
    )(params, r4, nx4, ny4)
    return [o.reshape(h, w) for o in outs]
