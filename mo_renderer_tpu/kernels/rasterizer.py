"""Pallas TPU tile rasterizer — the fixed-function GPU raster replacement.

Produces a *visibility buffer* per pixel: winning triangle id, depth, and
two screen-space barycentrics.  Attribute interpolation and shading happen
in later gather passes (passes/gbuffer.py) — the modern "visibility buffer"
split, which maps far better to TPU than per-triangle attribute export:
the hot loop is pure VPU math over (8, tile_h, tile_w) blocks with zero
gathers, and all texture/vertex gathers run once per *visible* pixel.

Inputs come from kernels/raster_setup.bin_triangles: per-tile contiguous
triangle runs (every DMA'd row is relevant to the tile) plus a small
VMEM-resident global list for huge triangles.  The kernel double-buffers
run DMA against compute with a dynamic per-tile trip count.

Depth semantics: LessOrEqual, later-drawn triangle wins ties
(Vulkan CompareOp::LessOrEqual — gbuffer_pass.rs:363; shadow LessOrEqual —
shadow_pass.rs:139).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster_setup import BinnedTriangles

FAR_DEPTH = 1.0
SUB_K = 8  # triangles processed per inner step


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _process_rows(rows, px, py, state, depth_only: bool):
    """Rasterize SUB_K triangles (rows (K,16)) against one tile.

    state = (z, tri_f, b0, b1) arrays (TH, TW); returns updated state.
    Zeroed (inert) rows never cover any pixel: w == 0 and tie bits == 0.
    """
    z_acc, tri_acc, b0_acc, b1_acc = state
    k = rows.shape[0]

    def col(j):
        return rows[:, j].reshape(k, 1, 1)

    w0 = col(0) * px + col(3) * py + col(6)
    w1 = col(1) * px + col(4) * py + col(7)
    w2 = col(2) * px + col(5) * py + col(8)

    tie_bits = rows[:, 13].astype(jnp.int32).reshape(k, 1, 1)

    def accept(w, bit):
        tie = (tie_bits & bit) > 0
        return (w > 0) | (tie & (w == 0))

    cover = accept(w0, 1) & accept(w1, 2) & accept(w2, 4)

    inv_area = col(12)
    bb0 = w0 * inv_area
    bb1 = w1 * inv_area
    bb2 = w2 * inv_area
    z = bb0 * col(9) + bb1 * col(10) + bb2 * col(11)

    masked_z = jnp.where(cover & (z >= 0.0), z, jnp.inf)
    zmin = jnp.min(masked_z, axis=0)

    win = zmin <= z_acc
    new_z = jnp.where(win, zmin, z_acc)
    if depth_only:
        return (new_z, tri_acc, b0_acc, b1_acc)

    # later triangle wins depth ties -> highest k among the minima
    kidx = jax.lax.broadcasted_iota(jnp.int32, masked_z.shape, 0)
    winner = jnp.max(jnp.where(masked_z == zmin[None], kidx, -1), axis=0)
    onehot = (kidx == winner[None]).astype(jnp.float32)
    tri_w = jnp.sum(col(14) * onehot, axis=0)
    b0_w = jnp.sum(bb0 * onehot, axis=0)
    b1_w = jnp.sum(bb1 * onehot, axis=0)
    return (
        new_z,
        jnp.where(win, tri_w, tri_acc),
        jnp.where(win, b0_w, b0_acc),
        jnp.where(win, b1_w, b1_acc),
    )


def _make_kernel(tile_h, tile_w, n_tiles_x, global_cap, depth_only):
    def kernel(
        runs_ref,  # SMEM (2, n_tiles): rows [starts; counts], resident
        gcount_ref,  # SMEM (1, 1)
        gdata_ref,  # VMEM (G, 16)
        hbm_ref,  # ANY/HBM (P+K, 16)
        z_ref, tri_ref, b0_ref, b1_ref,  # VMEM out blocks (TH, TW)
        buf, sem,  # scratch: (2, K, 16) VMEM + 2 DMA sems
    ):
        i = pl.program_id(0)
        ty = i // n_tiles_x
        tx = i % n_tiles_x
        oy = (ty * tile_h).astype(jnp.float32)
        ox = (tx * tile_w).astype(jnp.float32)
        iy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        ix = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        py = oy + 0.5 + iy.astype(jnp.float32)
        px = ox + 0.5 + ix.astype(jnp.float32)

        def read_state():
            return (z_ref[:], tri_ref[:], b0_ref[:], b1_ref[:])

        def write_state(st):
            z_ref[:] = st[0]
            tri_ref[:] = st[1]
            b0_ref[:] = st[2]
            b1_ref[:] = st[3]

        # clear
        z_ref[:] = jnp.full((tile_h, tile_w), FAR_DEPTH, jnp.float32)
        tri_ref[:] = jnp.full((tile_h, tile_w), -1.0, jnp.float32)
        b0_ref[:] = jnp.zeros((tile_h, tile_w), jnp.float32)
        b1_ref[:] = jnp.zeros((tile_h, tile_w), jnp.float32)

        # --- global (huge-triangle) list, VMEM resident -----------------
        gcount = gcount_ref[0, 0]

        @pl.when(gcount > 0)
        def _():
            st = read_state()
            for j in range(global_cap // SUB_K):
                # inert rows are zeroed; no masking needed beyond count skip
                st = jax.lax.cond(
                    j * SUB_K < gcount,
                    lambda s: _process_rows(
                        gdata_ref[j * SUB_K : (j + 1) * SUB_K, :], px, py, s, depth_only
                    ),
                    lambda s: s,
                    st,
                )
            write_state(st)

        # --- per-tile run with double-buffered DMA ----------------------
        start = runs_ref[0, i]
        count = runs_ref[1, i]
        nb = pl.cdiv(count, SUB_K)

        def get_dma(slot, j):
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(start + j * SUB_K, SUB_K), :],
                buf.at[slot],
                sem.at[slot],
            )

        @pl.when(nb > 0)
        def _():
            get_dma(0, 0).start()

            def body(j, st):
                slot = jax.lax.rem(j, 2)

                @pl.when(j + 1 < nb)
                def _():
                    get_dma(1 - slot, j + 1).start()

                get_dma(slot, j).wait()
                return _process_rows(buf[slot], px, py, st, depth_only)

            st = jax.lax.fori_loop(0, nb, body, read_state())
            write_state(st)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "depth_only"),
)
def rasterize(
    binned: BinnedTriangles,
    *,
    width: int,
    height: int,
    tile_h: int = 16,
    tile_w: int = 128,
    depth_only: bool = False,
):
    """Rasterize binned triangles into a visibility buffer.

    Returns (tri_id int32 (H,W) with -1 background, depth f32 (H,W),
    b0 f32 (H,W), b1 f32 (H,W)).  width/height must be multiples of the
    tile size (pad + crop at the caller).
    """
    assert width % tile_w == 0 and height % tile_h == 0
    n_tiles_x = width // tile_w
    n_tiles_y = height // tile_h
    n_tiles = n_tiles_x * n_tiles_y

    # Mosaic DMA slices must be 128-lane aligned: pad tri rows 16 -> 128
    # floats.  Also pad the run buffer so the last sub-batch never reads OOB.
    def pad_rows(d):
        return jnp.pad(d, ((0, 0), (0, 128 - d.shape[1])))

    hbm_data = jnp.concatenate(
        [pad_rows(binned.binned_data), jnp.zeros((SUB_K, 128), jnp.float32)],
        axis=0,
    )
    global_data = pad_rows(binned.global_data)
    # SMEM rows are padded to 128 lanes: shape (2, n_tiles), not (n_tiles, 2)
    runs = jnp.stack([binned.tile_start, binned.tile_count], axis=0)
    gcount = jnp.reshape(binned.global_count, (1, 1)).astype(jnp.int32)

    kernel = _make_kernel(
        tile_h, tile_w, n_tiles_x, binned.global_data.shape[0], depth_only
    )

    out_shape = [
        jax.ShapeDtypeStruct((height, width), jnp.float32),  # z
        jax.ShapeDtypeStruct((height, width), jnp.float32),  # tri (as f32)
        jax.ShapeDtypeStruct((height, width), jnp.float32),  # b0
        jax.ShapeDtypeStruct((height, width), jnp.float32),  # b1
    ]
    tile_spec = pl.BlockSpec(
        (tile_h, tile_w),
        lambda i: (i // n_tiles_x, i % n_tiles_x),
        memory_space=pltpu.VMEM,
    )

    z, tri_f, b0, b1 = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((2, n_tiles), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                global_data.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[tile_spec, tile_spec, tile_spec, tile_spec],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, SUB_K, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_use_interpret(),
    )(
        runs,
        gcount,
        global_data,
        hbm_data,
    )
    tri = jnp.round(tri_f).astype(jnp.int32)
    tri = jnp.where(z < FAR_DEPTH, tri, -1)
    return tri, z, b0, b1
