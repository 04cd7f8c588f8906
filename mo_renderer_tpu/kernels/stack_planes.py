"""Fused texture-stack rows -> shaded channel planes (relayout attack #2).

Companion of kernels/attr_planes.py for the OTHER gather-output relayout
in the round-4 trace: the texture-stack quad gathers emit
``u32[H, W, 4*k]`` rows (one packed 2x2 bilinear quad per sampled slot),
which XLA converts to per-channel planes in an 8-step sublane->flat
while loop (~0.6 ms / 33 MB at 1080p) before the byte-unpack + bilinear
fusions run.

This kernel consumes the gather results (one array per stack group) in
their native layout and emits exactly the channel planes the G-buffer
assembly reads — for each sampled slot, each CONSUMED 8-bit channel is
unpacked from the 4 quad texels and bilinearly blended with the pixel's
(fx, fy) weights, term-for-term identical to
``passes/gbuffer._texture_and_assemble``'s slot() math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax._src.pallas.mosaic.core import CompilerParams

from .rasterizer import _use_interpret


def _kernel(fx_ref, fy_ref, *refs, n_groups: int, out_spec: tuple):
    # groups arrive bitcast to int32 (Mosaic has no u32->f32 convert);
    # (x >> s) & 0xFF is byte-exact under arithmetic shift + mask
    groups = [
        jnp.transpose(r[0], (0, 2, 1)) for r in refs[:n_groups]
    ]  # each (block_rows, 4k, 128) i32
    outs = list(refs[n_groups:])
    fx = fx_ref[0]
    fy = fy_ref[0]
    # bilinear weights exactly as _texture_and_assemble builds them
    w00 = (1 - fx) * (1 - fy)
    w10 = fx * (1 - fy)
    w01 = (1 - fx) * fy
    w11 = fx * fy
    for (gi, col, shift), o in zip(out_spec, outs):
        v = [
            (
                (groups[gi][:, col + tap, :] >> shift) & 0xFF
            ).astype(jnp.float32) * (1.0 / 255.0)
            for tap in range(4)
        ]
        o[0] = v[0] * w00 + v[1] * w10 + v[2] * w01 + v[3] * w11
    assert not outs[len(out_spec):]


@functools.partial(
    jax.jit,
    static_argnames=("out_spec", "block_rows", "interpret"),
)
def stack_planes(group_rows, fx, fy, *, out_spec: tuple,
                 block_rows: int = 32, interpret: bool | None = None):
    """group_rows: list of (H, W, 4k) uint32 stack-gather results;
    fx/fy: (H, W) f32 bilinear fractions.

    out_spec: tuple of (group_index, quad_col_base, bit_shift) — one
    entry per output plane, e.g. slot at stack position p (group p//2,
    local quad p%2) channel c -> (p // 2, 4 * (p % 2), 8 * c).

    Returns len(out_spec) (H, W) f32 planes.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = fx.shape
    p = h * w
    blk = block_rows * 128
    assert p % blk == 0, (h, w, block_rows)
    b = p // blk

    plane_spec = pl.BlockSpec((1, block_rows, 128), lambda i: (i, 0, 0))
    # no scalar params needed — first two inputs are the fraction planes
    in_specs = [plane_spec, plane_spec]
    args = [
        fx.reshape(b, block_rows, 128).astype(jnp.float32),
        fy.reshape(b, block_rows, 128).astype(jnp.float32),
    ]
    for g in group_rows:
        c = g.shape[-1]
        in_specs.append(
            pl.BlockSpec((1, block_rows, 128, c), lambda i: (i, 0, 0, 0))
        )
        args.append(
            jax.lax.bitcast_convert_type(g, jnp.int32)
            .reshape(b, block_rows, 128, c)
        )

    outs = pl.pallas_call(
        functools.partial(
            _kernel, n_groups=len(group_rows), out_spec=out_spec
        ),
        grid=(b,),
        in_specs=in_specs,
        out_specs=[plane_spec] * len(out_spec),
        out_shape=[
            jax.ShapeDtypeStruct((b, block_rows, 128), jnp.float32)
        ] * len(out_spec),
        compiler_params=CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_use_interpret() if interpret is None else interpret,
    )(*args)
    return [o.reshape(h, w) for o in outs]
