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
# Triangles per inner step, per kernel mode.  8/8 is the measured
# optimum END TO END: standalone, SUB_K=16 looked better for the
# 4-output visibility kernel (gbuffer 4.25 -> 3.78ms) and worse for the
# slim depth-only kernel (shadow 4.82 -> 5.02ms), but in-frame 16/8
# regressed sponza 33.7 -> 33.3 fps — the bigger batches lose to DMA
# buffering inside the fused frame, so both stay at 8.
import os

SUB_K = int(os.environ.get("MO_SUB_K", "8"))
SUB_K_DEPTH = int(os.environ.get("MO_SUB_K_DEPTH", "8"))


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _process_rows_slim(rows, px, py, state):
    """Visibility-only rasterization of SUB_K triangles: state (z, tri_f).

    The lean inner loop for the fast path (b0/b1 are recomputed in the
    G-buffer pass from the packed world-space corners, so the kernel
    keeps no barycentric accumulators): a select-chain over k replaces
    the min-reduce + iota/one-hot winner arbitration (~25 vs ~40 VPU ops
    per candidate row per pixel), and the top-left tie test is 3 ops per
    edge via per-triangle scalars t_i in {0.0, NaN}:
    (w > 0) | (w == t_i)  —  w == NaN is always false, w == 0.0 accepts
    exact-on-edge pixels for top/left edges only (identical semantics to
    _process_rows; -0.0 == 0.0 matches its w == 0 test too).
    Ascending-k chaining with `zin <= acc` reproduces later-draw-wins.
    """
    z_acc, tri_acc = state
    k = rows.shape[0]
    for i in range(k):
        tb = rows[i, 13].astype(jnp.int32)

        def tie(bit):
            return jnp.where((tb & bit) > 0, 0.0, jnp.nan)

        w0 = rows[i, 0] * px + rows[i, 3] * py + rows[i, 6]
        w1 = rows[i, 1] * px + rows[i, 4] * py + rows[i, 7]
        w2 = rows[i, 2] * px + rows[i, 5] * py + rows[i, 8]
        a0 = (w0 > 0) | (w0 == tie(1))
        a1 = (w1 > 0) | (w1 == tie(2))
        a2 = (w2 > 0) | (w2 == tie(4))
        z = rows[i, 9] * px + rows[i, 10] * py + rows[i, 11]
        cover = a0 & a1 & a2 & (z >= 0.0)
        zin = jnp.where(cover, z, jnp.inf)
        better = zin <= z_acc
        z_acc = jnp.where(better, zin, z_acc)
        tri_acc = jnp.where(better, rows[i, 14], tri_acc)
    return z_acc, tri_acc


def _process_rows(rows, px, py, state, depth_only: bool):
    """Rasterize SUB_K triangles (rows (K,16)) against one tile.

    state = (z,) when depth_only else (z, tri_f, b0, b1), arrays
    (TH, TW); returns the updated state.  Zeroed (inert) rows never
    cover any pixel: w == 0 and tie bits == 0.
    """
    z_acc = state[0]
    k = rows.shape[0]

    def col(j):
        return rows[:, j].reshape(k, 1, 1)

    w0 = col(0) * px + col(3) * py + col(6)
    w1 = col(1) * px + col(4) * py + col(7)
    w2 = col(2) * px + col(5) * py + col(8)

    tie_bits = rows[:, 13].astype(jnp.int32).reshape(k, 1, 1)

    def accept(w, bit):
        # per-triangle scalar in {0.0, NaN}: w == NaN never accepts,
        # w == 0.0 accepts exact ties on top/left edges (one vreg op
        # fewer per edge than the (tie & (w == 0)) form)
        t = jnp.where((tie_bits & bit) > 0, 0.0, jnp.nan)
        return (w > 0) | (w == t)

    cover = accept(w0, 1) & accept(w1, 2) & accept(w2, 4)

    # affine depth plane (raster_setup COL_ZX/ZY/ZC): 2 fma per pair
    z = col(9) * px + col(10) * py + col(11)

    masked_z = jnp.where(cover & (z >= 0.0), z, jnp.inf)
    zmin = jnp.min(masked_z, axis=0)

    if depth_only:
        return (jnp.minimum(zmin, z_acc),)

    tri_acc, b0_acc, b1_acc = state[1:]
    win = zmin <= z_acc
    new_z = jnp.where(win, zmin, z_acc)
    # later triangle wins depth ties -> highest k among the minima
    kidx = jax.lax.broadcasted_iota(jnp.int32, masked_z.shape, 0)
    winner = jnp.max(jnp.where(masked_z == zmin[None], kidx, -1), axis=0)
    onehot = (kidx == winner[None]).astype(jnp.float32)
    inv_area = col(12)
    tri_w = jnp.sum(col(14) * onehot, axis=0)
    b0_w = jnp.sum(w0 * inv_area * onehot, axis=0)
    b1_w = jnp.sum(w1 * inv_area * onehot, axis=0)
    return (
        new_z,
        jnp.where(win, tri_w, tri_acc),
        jnp.where(win, b0_w, b0_acc),
        jnp.where(win, b1_w, b1_acc),
    )


def _process_rows_attrs(rows, px, py, state, n_interp):
    """Rasterize SUB_K triangles AND interpolate their attributes.

    rows (K, >=16+3+3*n_interp+2): raster columns 0..15 (see raster_setup),
    then the channel-major attr columns from
    vertex_stage.pack_raster_attr_columns.  state = (z, tri, c_0..c_{n-1},
    mat, ht) of (TH, TW) arrays.  Where a candidate wins the depth test its
    perspective-correct interpolated attributes overwrite the accumulators
    (the G-buffer interpolation fused into the raster loop — the per-pixel
    attrs-row gather disappears entirely).
    """
    z_acc, tri_acc = state[0], state[1]
    attr_acc = state[2:]
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
    # affine depth plane (raster_setup COL_ZX/ZY/ZC)
    z = col(9) * px + col(10) * py + col(11)

    masked_z = jnp.where(cover & (z >= 0.0), z, jnp.inf)
    zmin = jnp.min(masked_z, axis=0)
    win = zmin <= z_acc

    kidx = jax.lax.broadcasted_iota(jnp.int32, masked_z.shape, 0)
    winner = jnp.max(jnp.where(masked_z == zmin[None], kidx, -1), axis=0)
    onehot = (kidx == winner[None]).astype(jnp.float32)

    # perspective-correct barycentrics (q_i = b_i / w_i, normalized),
    # pre-multiplied by the winner mask so one reduction interpolates
    q0 = bb0 * col(16)
    q1 = bb1 * col(17)
    q2 = bb2 * col(18)
    qs = q0 + q1 + q2
    rs = onehot / jnp.where(jnp.abs(qs) > 1e-20, qs, 1.0)
    ob0 = q0 * rs
    ob1 = q1 * rs
    ob2 = q2 * rs

    out = [jnp.where(win, zmin, z_acc)]
    tri_w = jnp.sum(col(14) * onehot, axis=0)
    out.append(jnp.where(win, tri_w, tri_acc))
    for c in range(n_interp):
        b = 19 + 3 * c
        v = jnp.sum(ob0 * col(b) + ob1 * col(b + 1) + ob2 * col(b + 2), axis=0)
        out.append(jnp.where(win, v, attr_acc[c]))
    for j in range(2):  # flat columns: material id, has_tangent
        v = jnp.sum(onehot * col(19 + 3 * n_interp + j), axis=0)
        out.append(jnp.where(win, v, attr_acc[n_interp + j]))
    return tuple(out)


def _make_attrs_kernel(tile_h, tile_w, n_tiles_x, global_cap, n_interp):
    n_out = 2 + n_interp + 2

    def kernel(runs_ref, gcount_ref, gdata_ref, hbm_ref, *refs):
        out_refs = refs[:n_out]
        buf, sem = refs[n_out], refs[n_out + 1]
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
            return tuple(r[:] for r in out_refs)

        def write_state(st):
            for r, s in zip(out_refs, st):
                r[:] = s

        out_refs[0][:] = jnp.full((tile_h, tile_w), FAR_DEPTH, jnp.float32)
        out_refs[1][:] = jnp.full((tile_h, tile_w), -1.0, jnp.float32)
        for r in out_refs[2:]:
            r[:] = jnp.zeros((tile_h, tile_w), jnp.float32)

        gcount = gcount_ref[0, 0]

        @pl.when(gcount > 0)
        def _():
            def gbody(j, st):
                return _process_rows_attrs(
                    gdata_ref[pl.ds(j * SUB_K, SUB_K), :],
                    px, py, st, n_interp,
                )

            st = jax.lax.fori_loop(
                0, pl.cdiv(gcount, SUB_K), gbody, read_state()
            )
            write_state(st)

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
                return _process_rows_attrs(buf[slot], px, py, st, n_interp)

            st = jax.lax.fori_loop(0, nb, body, read_state())
            write_state(st)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "n_interp"),
)
def rasterize_attrs(
    binned: BinnedTriangles,
    *,
    width: int,
    height: int,
    tile_h: int = 16,
    tile_w: int = 128,
    n_interp: int = 14,
):
    """Rasterize + interpolate attributes in one Pallas kernel.

    binned rows must carry the extra attr columns
    (vertex_stage.pack_raster_attr_columns appended to the 16 raster
    columns).  Returns (tri int32 (H,W) -1=background, z (H,W), attrs
    tuple of n_interp (H,W) f32 planes, mat (H,W) f32, ht (H,W) f32).
    """
    assert width % tile_w == 0 and height % tile_h == 0
    n_tiles_x = width // tile_w
    n_tiles_y = height // tile_h
    n_tiles = n_tiles_x * n_tiles_y

    def pad_rows(d):
        return jnp.pad(d, ((0, 0), (0, 128 - d.shape[1])))

    # binned_data already carries ROW_PAD-wide rows + sentinel rows
    # (raster_setup emits them so no per-call relayout copy is needed)
    from .raster_setup import SENTINEL_ROWS

    assert SUB_K <= SENTINEL_ROWS and binned.binned_data.shape[1] == 128
    hbm_data = binned.binned_data
    global_data = pad_rows(binned.global_data)
    runs = jnp.stack([binned.tile_start, binned.tile_count], axis=0)
    gcount = jnp.reshape(binned.global_count, (1, 1)).astype(jnp.int32)

    kernel = _make_attrs_kernel(
        tile_h, tile_w, n_tiles_x, binned.global_data.shape[0], n_interp
    )

    n_out = 2 + n_interp + 2
    out_shape = [
        jax.ShapeDtypeStruct((height, width), jnp.float32) for _ in range(n_out)
    ]
    tile_spec = pl.BlockSpec(
        (tile_h, tile_w),
        lambda i: (i // n_tiles_x, i % n_tiles_x),
        memory_space=pltpu.VMEM,
    )

    outs = pl.pallas_call(
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
        out_specs=[tile_spec] * n_out,
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
    z, tri_f = outs[0], outs[1]
    tri = jnp.round(tri_f).astype(jnp.int32)
    tri = jnp.where(z < FAR_DEPTH, tri, -1)
    return tri, z, tuple(outs[2 : 2 + n_interp]), outs[-2], outs[-1]


def _make_kernel(tile_h, tile_w, n_blocks_x, global_cap, mode, n_tiles,
                 sub_y=1, sub_x=1):
    # mode: "full" -> (z, tri, b0, b1); "slim" -> (z, tri); "depth" -> (z,)
    depth_only = mode == "depth"
    sub_k = SUB_K_DEPTH if depth_only else SUB_K
    # sub_y > 1: the (tile_h, block_w) output block is covered by sub_y
    # vertical sub-runs binned at sub_h = tile_h/sub_y rows.  Each run's
    # candidates are tested against only their sub-block's pixels, so
    # per-pair VPU work drops sub_y-fold for small triangles while the
    # grid (and its per-step overhead — the measured raster floor) stays
    # at the coarse tiling.  Triangles spanning a sub-run boundary are
    # simply binned into both runs.
    # sub_x > 1 mirrors the trick horizontally: the block is sub_x
    # bin COLUMNS wide (block_w = sub_x * tile_w) and each grid step
    # processes its sub_y * sub_x runs — the grid shrinks sub_x-fold
    # with the per-pair pixel footprint unchanged (vs tile_w=256 bins,
    # which doubled the footprint and measured worse).
    sub_h = tile_h // sub_y
    block_w = tile_w * sub_x
    assert tile_h % sub_y == 0 and sub_h % 8 == 0

    if mode == "slim":
        def process(rows, px, py, st):
            return _process_rows_slim(rows, px, py, st)
    else:
        def process(rows, px, py, st):
            return _process_rows(rows, px, py, st, depth_only)

    def kernel(
        runs_ref,  # SMEM (2, n_tiles*sub_y*sub_x): rows [starts; counts]
        roff_ref,  # SMEM (1, 1): tile-row offset of this band
        gcount_ref,  # SMEM (1, 1)
        gdata_ref,  # VMEM (G, 16)
        hbm_ref,  # ANY/HBM (P+K, 16)
        *refs,  # out blocks (TH, BW): z[, tri, b0, b1]; then buf, sem
    ):
        out_refs = refs[:-2]
        buf, sem = refs[-2], refs[-1]
        i = pl.program_id(0)
        ty_l = i // n_blocks_x
        tx = i % n_blocks_x
        ty = ty_l + roff_ref[0, 0]
        iy = jax.lax.broadcasted_iota(jnp.int32, (sub_h, tile_w), 0)
        ix = jax.lax.broadcasted_iota(jnp.int32, (sub_h, tile_w), 1)

        # clear the whole block (depth-only keeps a single z plane)
        out_refs[0][:] = jnp.full((tile_h, block_w), FAR_DEPTH, jnp.float32)
        if mode != "depth":
            out_refs[1][:] = jnp.full((tile_h, block_w), -1.0, jnp.float32)
        if mode == "full":
            out_refs[2][:] = jnp.zeros((tile_h, block_w), jnp.float32)
            out_refs[3][:] = jnp.zeros((tile_h, block_w), jnp.float32)

        gcount = gcount_ref[0, 0]
        # run index: runs are binned row-major at (sub_h, tile_w)
        # granularity over n_blocks_x*sub_x bin columns; block
        # (ty_l, tx)'s (s, c) sub-run is bin row ty_l*sub_y + s,
        # bin col tx*sub_x + c
        n_bins_x = n_blocks_x * sub_x
        r0 = (ty_l * sub_y) * n_bins_x + tx * sub_x

        def first_dma(r):
            # first batch of run r into the prefetch slot
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(runs_ref[0, r], sub_k), :],
                buf.at[2],
                sem.at[2],
            )

        @pl.when((i == 0) & (runs_ref[1, 0] > 0))
        def _():
            first_dma(0).start()  # nobody prefetched for sub-run 0

        for s in range(sub_y):
            oy = (ty * tile_h + s * sub_h).astype(jnp.float32)
            py = oy + 0.5 + iy.astype(jnp.float32)
            lo, hi = s * sub_h, (s + 1) * sub_h
            for c in range(sub_x):
                r = r0 + s * n_bins_x + c
                ox = (tx * block_w + c * tile_w).astype(jnp.float32)
                px = ox + 0.5 + ix.astype(jnp.float32)
                cl, cr = c * tile_w, (c + 1) * tile_w

                def read_state():
                    return tuple(rf[lo:hi, cl:cr] for rf in out_refs)

                def write_state(st):
                    for rf, v in zip(out_refs, st):
                        rf[lo:hi, cl:cr] = v

                # --- global (huge-triangle) list, VMEM resident ---------
                @pl.when(gcount > 0)
                def _():
                    # dynamic trip count (not a static global_cap//K
                    # unroll of lax.conds: Mosaic branch overhead scales
                    # with the unroll, and gcount is usually a handful
                    # of batches)
                    def gbody(j, st):
                        return process(
                            gdata_ref[pl.ds(j * sub_k, sub_k), :], px, py, st
                        )

                    st = jax.lax.fori_loop(
                        0, pl.cdiv(gcount, sub_k), gbody, read_state()
                    )
                    write_state(st)

                # --- per-run double-buffered DMA -------------------------
                # Batch 0 lives in slot 2: it was prefetched by the
                # PREVIOUS sub-run (the tile sort lays runs back to back
                # in HBM), so the first-batch DMA latency — the dominant
                # raster overhead at the typical 1-2 batches/run —
                # overlaps the previous run's compute.
                start = runs_ref[0, r]
                count = runs_ref[1, r]
                nb = pl.cdiv(count, sub_k)

                def get_dma(slot, j, start=start):
                    return pltpu.make_async_copy(
                        hbm_ref.at[pl.ds(start + j * sub_k, sub_k), :],
                        buf.at[slot],
                        sem.at[slot],
                    )

                @pl.when(nb > 0)
                def _():
                    @pl.when(nb > 1)
                    def _():
                        get_dma(0, 1).start()

                    get_dma(2, 0).wait()
                    st0 = process(buf[2], px, py, read_state())

                    def body(j, st):
                        slot = jax.lax.rem(j - 1, 2)

                        @pl.when(j + 1 < nb)
                        def _():
                            get_dma(1 - slot, j + 1).start()

                        get_dma(slot, j).wait()
                        return process(buf[slot], px, py, st)

                    st = jax.lax.fori_loop(1, nb, body, st0)
                    write_state(st)

                # prefetch the NEXT sub-run's first batch into slot 2
                # (started iff that run is non-empty — it waits iff
                # non-empty, so every DMA is waited exactly once)
                if c < sub_x - 1:
                    nr = r + 1

                    @pl.when(runs_ref[1, nr] > 0)
                    def _():
                        first_dma(nr).start()
                elif s < sub_y - 1:
                    nr = r0 + (s + 1) * n_bins_x

                    @pl.when(runs_ref[1, nr] > 0)
                    def _():
                        first_dma(nr).start()
                elif n_tiles > 1:

                    @pl.when(i + 1 < n_tiles)
                    def _():
                        ty2 = (i + 1) // n_blocks_x
                        tx2 = (i + 1) % n_blocks_x
                        nr = (ty2 * sub_y) * n_bins_x + tx2 * sub_x

                        @pl.when(runs_ref[1, nr] > 0)
                        def _():
                            first_dma(nr).start()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile_h", "tile_w", "depth_only", "slim",
        "sub_y", "sub_x",
    ),
)
def rasterize(
    binned: BinnedTriangles,
    *,
    width: int,
    height: int,
    tile_h: int = 16,
    tile_w: int = 128,
    depth_only: bool = False,
    slim: bool = False,
    sub_y: int = 1,
    sub_x: int = 1,
    tile_row_offset=0,
):
    """Rasterize binned triangles into a visibility buffer.

    Returns (tri_id int32 (H,W) with -1 background, depth f32 (H,W),
    b0 f32 (H,W), b1 f32 (H,W)).  width/height must be multiples of the
    tile size (pad + crop at the caller).

    slim=True runs the lean visibility kernel (_process_rows_slim):
    identical tri/z, but b0/b1 are returned as None — the fast G-buffer
    path recomputes perspective-correct barycentrics from the packed
    world-space corners (passes/gbuffer.py::_homogeneous_barycentrics),
    so the kernel drops two output planes and the winner arbitration.

    sub_y > 1 splits each (tile_h, tile_w) output tile into sub_y
    vertical sub-runs: ``binned`` must have been binned at
    tile_h/sub_y-row granularity (same tile_w).  Candidate pairs are
    tested against sub_y-fold fewer pixels while the grid — and its
    dominant per-step overhead — stays at the coarse tiling.

    sub_x > 1 widens each grid step to sub_x adjacent bin COLUMNS
    (output block tile_h x sub_x*tile_w; width must divide by it): the
    grid shrinks sub_x-fold with the per-pair pixel footprint still
    (sub_h, tile_w).  Output is bit-identical across sub_x.

    tile_row_offset (int or traced scalar) > 0 renders only the
    ``height``-tall horizontal band starting at pixel row
    tile_row_offset*tile_h of the binned frame (binned must have been
    built for the FULL frame): the row-sharded multi-chip path gives
    each device its band (offset = axis_index * tiles-per-band), all
    reading the same global binned runs.
    """
    block_w = tile_w * sub_x
    assert width % block_w == 0 and height % tile_h == 0
    n_blocks_x = width // block_w
    n_tiles_y = height // tile_h
    n_tiles = n_blocks_x * n_tiles_y
    n_runs = n_tiles * sub_y * sub_x

    # Mosaic DMA slices must be 128-lane aligned: pad tri rows 16 -> 128
    # floats.  Also pad the run buffer so the last sub-batch never reads OOB.
    def pad_rows(d):
        return jnp.pad(d, ((0, 0), (0, 128 - d.shape[1])))

    from .raster_setup import SENTINEL_ROWS

    sub_k = SUB_K_DEPTH if depth_only else SUB_K
    # binned_data already carries ROW_PAD-wide rows + sentinel rows
    # (raster_setup emits them so no per-call relayout copy is needed)
    assert sub_k <= SENTINEL_ROWS and binned.binned_data.shape[1] == 128
    assert binned.tile_start.shape[0] >= n_runs, (
        f"binned has {binned.tile_start.shape[0]} runs but sub_y={sub_y} "
        f"needs {n_runs}: bin_triangles must use tile_h={tile_h}//{sub_y}"
    )
    hbm_data = binned.binned_data
    global_data = pad_rows(binned.global_data)
    # SMEM rows are padded to 128 lanes: shape (2, n_runs), not (n_runs, 2)
    t0 = jnp.asarray(tile_row_offset, jnp.int32) * (
        sub_y * n_blocks_x * sub_x
    )
    runs = jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(binned.tile_start, t0, n_runs),
            jax.lax.dynamic_slice_in_dim(binned.tile_count, t0, n_runs),
        ],
        axis=0,
    )
    roff = jnp.reshape(
        jnp.asarray(tile_row_offset, jnp.int32), (1, 1)
    )
    gcount = jnp.reshape(binned.global_count, (1, 1)).astype(jnp.int32)

    mode = "depth" if depth_only else ("slim" if slim else "full")
    kernel = _make_kernel(
        tile_h, tile_w, n_blocks_x, binned.global_data.shape[0], mode,
        n_tiles, sub_y, sub_x
    )

    n_out = {"depth": 1, "slim": 2, "full": 4}[mode]
    out_shape = [
        jax.ShapeDtypeStruct((height, width), jnp.float32)
        for _ in range(n_out)
    ]
    tile_spec = pl.BlockSpec(
        (tile_h, block_w),
        lambda i: (i // n_blocks_x, i % n_blocks_x),
        memory_space=pltpu.VMEM,
    )

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((2, n_runs), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                global_data.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[tile_spec] * n_out,
        out_shape=out_shape,
        scratch_shapes=[
            # slots 0/1: in-tile double buffer; slot 2: cross-tile
            # prefetch of the next tile's first batch
            pltpu.VMEM((3, sub_k, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=_use_interpret(),
    )(
        runs,
        roff,
        gcount,
        global_data,
        hbm_data,
    )
    if depth_only:
        # single z plane; callers unpack (_, z, _, _)
        return None, outs[0], None, None
    if slim:
        z, tri_f = outs
        b0 = b1 = None
    else:
        z, tri_f, b0, b1 = outs
    tri = jnp.round(tri_f).astype(jnp.int32)
    tri = jnp.where(z < FAR_DEPTH, tri, -1)
    return tri, z, b0, b1
