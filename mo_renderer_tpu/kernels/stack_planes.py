"""Fused texture-stack rows -> shaded channel planes (relayout attack #2).

Companion of kernels/attr_planes.py for the OTHER gather-output relayout
in the round-4 trace: the texture-stack quad gathers prefer emitting
CHANNEL-MAJOR results (``u32[8, P]`` — the round-5 HLO shows exactly
that), which XLA then converts to the flat layout its unpack fusions
want through an 8-step while loop + dynamic-slice/update ops (~1.2 ms
at 1080p: while.1 0.60 + its body fusions 0.60).

This kernel consumes channel-major (4k, P/128, 128) input — every
channel a native (rows, 128) tile slice, no in-kernel transpose, full
VPU utilization — and emits only the consumed unpacked+blended planes.
MEASURED REALITY (round 5, both variants): XLA still materializes a
conversion feeding the kernel, because the gather's native layout is
{0,1:T(8,128)} — channels INTERLEAVED with pixels inside (8, 128)
tiles, not contiguous channel planes — so neither a row-major nor a
channel-major pallas operand can bind it zero-copy (the optimized HLO
shows the same 8-step while + a bitcast fusion either way).  Net
in-frame effect: -0.27 ms with the attrs kernel OFF, -0.03 ms (tie)
with it ON — which is why ``stack_plane_kernel`` defaults to False.
For each sampled slot, each CONSUMED 8-bit channel is unpacked from the
4 quad texels and bilinearly blended with the pixel's (fx, fy) weights,
term-for-term identical to
``passes/gbuffer._texture_and_assemble``'s slot() math.

Mosaic note: no u32->f32 convert — groups are bitcast to int32 and
unpacked with arithmetic-shift+mask (byte-exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax._src.pallas.mosaic.core import CompilerParams

from .rasterizer import _use_interpret


def _kernel(fx_ref, fy_ref, *refs, n_groups: int, out_spec: tuple):
    groups = refs[:n_groups]  # each (4k, rows, 128) i32, channel-major
    outs = list(refs[n_groups:])
    fx = fx_ref[...]
    fy = fy_ref[...]
    # bilinear weights exactly as _texture_and_assemble builds them
    w00 = (1 - fx) * (1 - fy)
    w10 = fx * (1 - fy)
    w01 = (1 - fx) * fy
    w11 = fx * fy
    for (gi, col, shift), o in zip(out_spec, outs):
        v = [
            ((groups[gi][col + tap] >> shift) & 0xFF).astype(jnp.float32)
            * (1.0 / 255.0)
            for tap in range(4)
        ]
        o[...] = v[0] * w00 + v[1] * w10 + v[2] * w01 + v[3] * w11
    assert not outs[len(out_spec):]


@functools.partial(
    jax.jit,
    static_argnames=("out_spec", "block_rows", "interpret"),
)
def stack_planes(group_rows, fx, fy, *, out_spec: tuple,
                 block_rows: int = 256, interpret: bool | None = None):
    """group_rows: list of (H, W, 4k) uint32 stack-gather results;
    fx/fy: (H, W) f32 bilinear fractions.

    out_spec: tuple of (group_index, quad_col_base, bit_shift) — one
    entry per output plane, e.g. slot at stack position p (group p//2,
    local quad p%2) channel c -> (p // 2, 4 * (p % 2), 8 * c).

    block_rows: 128-pixel rows per grid step (block = block_rows x 128
    pixels); requires H*W % (block_rows*128) == 0.

    Returns len(out_spec) (H, W) f32 planes.
    """
    from jax.experimental import pallas as pl

    h, w = fx.shape
    p = h * w
    blk = block_rows * 128
    assert p % blk == 0, (h, w, block_rows)
    b = p // blk

    plane_spec = pl.BlockSpec((block_rows, 128), lambda i: (i, 0))
    in_specs = [plane_spec, plane_spec]
    args = [
        fx.reshape(b * block_rows, 128).astype(jnp.float32),
        fy.reshape(b * block_rows, 128).astype(jnp.float32),
    ]
    for g in group_rows:
        c = g.shape[-1]
        # channel-major view: the gather's preferred output layout, so
        # the transpose is a layout rebinding, not a copy
        cm = jnp.transpose(
            jax.lax.bitcast_convert_type(g, jnp.int32), (2, 0, 1)
        ).reshape(c, b * block_rows, 128)
        in_specs.append(
            pl.BlockSpec((c, block_rows, 128), lambda i: (0, i, 0))
        )
        args.append(cm)

    outs = pl.pallas_call(
        functools.partial(
            _kernel, n_groups=len(group_rows), out_spec=out_spec
        ),
        grid=(b,),
        in_specs=in_specs,
        out_specs=[plane_spec] * len(out_spec),
        out_shape=[
            jax.ShapeDtypeStruct((b * block_rows, 128), jnp.float32)
        ] * len(out_spec),
        compiler_params=CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_use_interpret() if interpret is None else interpret,
    )(*args)
    return [o.reshape(h, w) for o in outs]
