"""Row-sharded single-frame rendering over a TPU device mesh.

The second multi-chip axis next to view data-parallelism
(parallel/multi_view.py): ONE frame's framebuffer tile rows are sharded
over the mesh — the tensor-parallel analog called out in SURVEY.md §2.3
("shard G-buffer rows across cores with halo exchange for SSAO
neighborhoods").  Design:

- Scene tables, IBL maps, and camera params are replicated; triangle
  setup runs replicated (T-sized, tiny next to per-pixel work).
- Binning is BAND-LOCAL (round 5, VERDICT r4 #5): each device
  enumerates and sorts only the (tile, triangle) pairs of its own tile
  rows through 1/n-scaled caps (kernels/raster_setup.bin_triangles band
  mode) — the scene-sized sorts, previously the largest replicated
  stage, now parallelize with the pixels.  Tile ids stay global, so
  the runs each device reads are bit-identical to the full-frame
  binning restricted to its band (tests/test_banded_binning.py).
- Each device rasterizes, textures, and shades only its horizontal band
  of tile rows (kernels/rasterizer.rasterize(tile_row_offset),
  ssao/sky row offsets).
- The ONLY cross-band dependency is SSAO's depth neighborhood: real
  neighbor rows are exchanged over ICI with ``jax.lax.ppermute``
  (passes/ssao.ssao_halo_rows each way); outer edges replicate like the
  unsharded pass.
- The shadow map is light-space (unrelated to screen rows) and is
  computed replicated.

Deviations vs the unsharded frame (tests pin both): the half-res
PCF/specular upsamplers and the checkerboard reconstruction interpolate
within a band, so <=2 pixel rows per band boundary blend toward an
edge-replicated sample instead of the next band's (few LSBs); SSAO runs
at full rate here (the halo exchange is sized for it — ssao_res_divisor
is ignored), which differs from the half-rate default field by <=0.4 LSB
mean.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import EngineConfig
from ..kernels.decimate import decimate_cols
from ..kernels.raster_setup import (
    bin_triangles,
    triangle_setup_from_attrs,
)
from ..kernels.rasterizer import rasterize
from ..passes.checkerboard import reconstruct_full
from ..passes.frame_graph import Renderer, present_pass
from ..passes.gbuffer import gbuffer_pass_fast
from ..passes.shading import shading_pass_fast
from ..passes.ssao import ssao_halo_rows, ssao_pass_pallas
from .multi_view import make_view_mesh

logger = logging.getLogger("mo_renderer_tpu")


def _shadow_quads_replicated(scene, light_pv, cfg, binned_cap):
    from ..passes.frame_graph import _pcf_build, _shadow_map_from_clip

    shadow_map, overflow = _shadow_map_from_clip(
        None, scene, cfg=cfg, binned_cap=binned_cap, light_pv=light_pv
    )
    return _pcf_build(cfg)(shadow_map), overflow


def shadow_bands_divisible(cfg, n_devices: int) -> bool:
    """The shadow map splits into whole tile-row bands per device."""
    return cfg.shadow_map_size % (n_devices * cfg.tile_h) == 0


def _shadow_quads_banded(scene, light_pv, cfg, binned_cap, axis_name,
                         n_devices):
    """Shadow raster band-sharded over the mesh (VERDICT r3 #4).

    The shadow map is light-space, so its rows are unrelated to the
    frame's screen bands — but it is band-splittable by the SAME
    ``rasterize(tile_row_offset=...)`` machinery: triangle setup stays
    replicated (T-sized, cheap), binning is BAND-LOCAL since round 5
    (each device enumerates + sorts only its light-space band's pairs,
    bin_triangles band mode), each device rasterizes
    ``shadow_map_size / n`` rows of the 2048^2 target, and ONE
    ``all_gather`` reassembles the full map everywhere (every screen
    pixel may sample any light-space texel, so the PCF window table
    must be fully replicated).  Collective cost: each device contributes
    its (smap/n, smap) f32 band — smap^2 * 4B gathered per frame
    (16 MB at 2048^2, ~0.4 ms over ICI) against the ~n-fold cut of the
    shadow raster, the previously-largest replicated stage
    (NOTES_PERF.md multi-chip cost model).  Output is bit-identical to
    the replicated raster: bands partition the tile grid and the
    depth/tie rule is tile-local."""
    from ..passes.frame_graph import _pcf_build

    smap = cfg.shadow_map_size
    s_setup = triangle_setup_from_attrs(
        scene.tri_attrs, scene.tri_valid, light_pv, smap, smap,
        cull_backface=False,
        depth_bias_const=cfg.shadow_depth_bias_const,
        depth_bias_slope=cfg.shadow_depth_bias_slope,
    )
    bin_h = cfg.tile_h // cfg.raster_sub_y
    from ..passes.frame_graph import _sub_x_for

    d = jax.lax.axis_index(axis_name)
    # band-local binning (VERDICT r4 #5): each device enumerates + sorts
    # only its band's (tile, tri) pairs — the scene-sized sorts leave
    # the replicated bucket; output is bit-identical (global tile ids,
    # same (tile, tri) key order)
    bin_rows_band = smap // bin_h // n_devices
    s_binned = bin_triangles(
        s_setup,
        tile_h=bin_h, tile_w=cfg.tile_w,
        n_tiles_x=smap // cfg.tile_w,
        n_tiles_y=smap // bin_h,
        max_tiles_per_tri=8,
        binned_cap=binned_cap,
        global_cap=512,
        band_row0=d * bin_rows_band,
        band_tile_rows=bin_rows_band,
        band_devices=n_devices,
    )
    tiles_per_band = smap // cfg.tile_h // n_devices
    _, band, _, _ = rasterize(
        s_binned, width=smap, height=smap // n_devices,
        tile_h=cfg.tile_h, tile_w=cfg.tile_w, depth_only=True,
        sub_y=cfg.raster_sub_y, sub_x=_sub_x_for(cfg, smap),
        tile_row_offset=d * tiles_per_band,
    )
    shadow_map = jax.lax.all_gather(
        band, axis_name, axis=0, tiled=True
    )  # (smap, smap) full map on every device
    return _pcf_build(cfg)(shadow_map), s_binned.overflow


def row_sharded_frame_body(
    scene, ibl, params, *, cfg, pad_w, pad_h, pad_h_split, binned_cap,
    has_shadow_light, slot_map, static_light_count, axis_name, n_devices,
):
    """Runs inside shard_map: renders this device's band of tile rows.

    pad_h is the VIEWPORT height (identical to the unsharded renderer so
    the image matches); pad_h_split >= pad_h rounds the tile grid up to
    a whole number of tile rows per device (the extra rows have no
    binned triangles, render sky, and are cropped away).
    """
    assert pad_h_split % (n_devices * cfg.tile_h) == 0
    h_local = pad_h_split // n_devices
    tiles_per_band = h_local // cfg.tile_h
    d = jax.lax.axis_index(axis_name)
    row0 = d * h_local

    # no per-vertex stage: the fast path projects the packed per-
    # triangle corners directly (triangle_setup_from_attrs — row
    # sharding requires the fast path, so this always applies)
    shadow_overflow = jnp.zeros((), jnp.int32)
    shadow_quads = None
    if cfg.shadow_enabled and has_shadow_light:
        if shadow_bands_divisible(cfg, n_devices):
            shadow_quads, shadow_overflow = _shadow_quads_banded(
                scene, params["light_proj_view"], cfg, binned_cap,
                axis_name, n_devices
            )
        else:  # odd map/tile/device combination: replicated fallback
            shadow_quads, shadow_overflow = _shadow_quads_replicated(
                scene, params["light_proj_view"], cfg, binned_cap
            )

    # setup is replicated (T-sized, cheap); binning is BAND-LOCAL: each
    # device enumerates and sorts only the pairs of its own tile rows
    # through 1/n-scaled caps (kernels/raster_setup.bin_triangles band
    # mode) — the scene-sized sort was the largest replicated stage
    setup = triangle_setup_from_attrs(
        scene.tri_attrs, scene.tri_valid, params["proj_view"],
        pad_w, pad_h, cull_backface=True,
    )
    bin_h = cfg.tile_h // cfg.raster_sub_y  # binning granularity
    band_bin_rows = (pad_h_split // n_devices) // bin_h
    binned = bin_triangles(
        setup,
        tile_h=bin_h, tile_w=cfg.tile_w,
        n_tiles_x=pad_w // cfg.tile_w,
        n_tiles_y=pad_h // bin_h,
        max_tiles_per_tri=8,
        binned_cap=binned_cap,
        global_cap=512,
        band_row0=d * band_bin_rows,
        band_tile_rows=band_bin_rows,
        band_devices=n_devices,
    )
    if pad_h_split > pad_h:
        # pad the run table with empty runs for the split-only rows
        extra = (pad_h_split - pad_h) // bin_h * (pad_w // cfg.tile_w)
        import dataclasses

        binned = dataclasses.replace(
            binned,
            tile_start=jnp.pad(binned.tile_start, (0, extra)),
            tile_count=jnp.pad(binned.tile_count, (0, extra)),
        )
    from ..passes.frame_graph import _sub_x_for as _sx

    tri, z, _, _ = rasterize(
        binned, width=pad_w, height=h_local,
        tile_h=cfg.tile_h, tile_w=cfg.tile_w, slim=True,
        sub_y=cfg.raster_sub_y, sub_x=_sx(cfg, pad_w),
        tile_row_offset=d * tiles_per_band,
    )
    # checkerboard shading per band: bands start on tile_h multiples
    # (even rows), so local row parity == the global checkerboard phase
    # and the band-local decimate/upsample/reconstruct logic is exactly
    # the single-device one (passes/checkerboard.py).  Reconstruction's
    # up/down neighbors clamp at band edges — the same <=1-row seam the
    # half-res upsamplers already have (tests pin it).
    use_cb = cfg.checkerboard
    if use_cb:
        tri_full, z_full = tri, z
        tri = decimate_cols(tri, "cb")
        z = decimate_cols(z, "cb")
    else:
        z_full = z
    gbuf = gbuffer_pass_fast(
        tri, z, None, None, scene, scene.tri_attrs, params,
        slot_map=slot_map, cb=use_cb, full_wh=(pad_w, pad_h), y0=row0,
        plane_kernel=cfg.attrs_plane_kernel,
        stack_kernel=cfg.stack_plane_kernel,
    )

    # --- SSAO with a REAL halo exchange over the mesh -------------------
    # full-rate on the band's full-res depth (the halo is sized for it;
    # ssao_res_divisor is ignored here), then checkerboard-sampled
    if cfg.ssao_enabled:
        pad_rows = ssao_halo_rows(pad_w)
        # top halo: my upper neighbor's bottom rows (device d-1 -> d)
        send_down = z_full[-pad_rows:]
        top = jax.lax.ppermute(
            send_down, axis_name,
            perm=[(i, i + 1) for i in range(n_devices - 1)],
        )
        # bottom halo: my lower neighbor's top rows (device d+1 -> d)
        send_up = z_full[:pad_rows]
        bottom = jax.lax.ppermute(
            send_up, axis_name,
            perm=[(i + 1, i) for i in range(n_devices - 1)],
        )
        # outermost devices replicate their edge row (like jnp.pad "edge")
        edge_top = jnp.broadcast_to(z_full[:1], (pad_rows, pad_w))
        edge_bottom = jnp.broadcast_to(z_full[-1:], (pad_rows, pad_w))
        top = jnp.where(d == 0, edge_top, top)
        bottom = jnp.where(d == n_devices - 1, edge_bottom, bottom)
        ssao = ssao_pass_pallas(
            z_full, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
            near=cfg.ssao_near, far=cfg.ssao_far,
            row_offset=row0, y_halo=(top, bottom),
        )
        if use_cb:
            ssao = decimate_cols(ssao, "cb")
    else:
        ssao = jnp.ones_like(gbuf.depth)

    color = shading_pass_fast(
        gbuf, ssao, shadow_quads, cfg.shadow_map_size, scene.lights,
        scene.num_lights, params, ibl=ibl,
        shadow_res_divisor=cfg.pcf_res_divisor,
        static_light_count=static_light_count,
        parent_mip_half_res=cfg.spec_parent_mip_half_res,
        mirror_half_res=cfg.spec_mirror_half_res,
        merged_trilinear=cfg.spec_merged_trilinear,
        row_offset=row0, full_height=pad_h,  # pad_h = viewport height
        cb=use_cb,
    )
    rgba = present_pass(color)
    if use_cb:
        rgba = reconstruct_full(rgba, tri_full)
    overflow = jnp.stack([binned.overflow, shadow_overflow])
    return rgba, overflow  # (h_local, pad_w) u32, (2,) i32


class TileShardedRenderer:
    """Renders ONE frame with its tile rows sharded over the mesh.

    Complements MultiViewRenderer (data-parallel over cameras): here a
    single camera's frame is split across devices — the path a >1-chip
    deployment uses to cut latency of one big frame (e.g. 4K) rather
    than throughput over many.
    """

    def __init__(self, config: EngineConfig, mesh: Mesh | None = None):
        self.config = config
        self.mesh = mesh if mesh is not None else make_view_mesh(
            axis_name="rows"
        )
        self.axis = self.mesh.axis_names[0]
        self._inner = Renderer(config)
        self._frame_fn = None

    @property
    def scene(self):
        return self._inner.scene

    @property
    def ibl(self):
        return self._inner.ibl

    def prepare(self, world) -> None:
        self._inner.prepare(world)
        self._rebuild_frame_fn()
        logger.info(
            "tile-sharded renderer: %d tile-row bands over %d devices",
            self._inner.pad_h // self.config.tile_h,
            self.mesh.devices.size,
        )

    def _rebuild_frame_fn(self) -> None:
        """Validate the inner renderer's mode and (re)build the sharded
        frame fn — shared by prepare() and the full-prepare-fallback
        path in render_device, so a topology change that flips the
        fast-path flag raises instead of silently sampling wrong."""
        self._prepared_at = self._inner._prepare_count
        if not self._inner._fast:
            raise NotImplementedError(
                "row sharding requires the fast sampling path"
            )
        if self.config.raster_interp_attrs:
            raise NotImplementedError(
                "row sharding does not support the raster megakernel"
            )
        self._frame_fn = self._build_frame_fn()

    def _build_frame_fn(self):
        cfg = self.config
        inner = self._inner
        mesh, axis = self.mesh, self.axis
        n_dev = mesh.devices.size

        # bands must split evenly: pad the tile grid up to a multiple of
        # n_devices tile rows (the extra rows render empty sky and are
        # cropped away); the viewport height stays inner.pad_h so the
        # image matches the unsharded renderer
        band = n_dev * cfg.tile_h
        pad_h_split = ((inner.pad_h + band - 1) // band) * band
        body = functools.partial(
            row_sharded_frame_body,
            cfg=cfg, pad_w=inner.pad_w, pad_h=inner.pad_h,
            pad_h_split=pad_h_split,
            binned_cap=inner._binned_cap,
            slot_map=inner._slot_map,
            static_light_count=inner._n_lights,
            axis_name=axis, n_devices=n_dev,
        )

        @functools.partial(jax.jit, static_argnames=("has_shadow_light",))
        def frame(scene, ibl, params, has_shadow_light):
            sharded = jax.shard_map(
                functools.partial(body, has_shadow_light=has_shadow_light),
                mesh=mesh,
                in_specs=(P(), P(), P()),
                out_specs=(P(axis), P(axis)),
                check_vma=False,
            )
            return sharded(scene, ibl, params)

        return frame

    def render_device(self, world):
        from ..scene.scene_buffers import refresh_transforms

        if self._frame_fn is None:
            self.prepare(world)
        # topology changes: incremental repack is content-only (the
        # sharded jit keeps working); a full-prepare fallback rebuilds
        # the sharded frame fn too (derived statics may change)
        self._inner._sync_topology(world)
        if self._inner._prepare_count != getattr(self, "_prepared_at", None):
            self._rebuild_frame_fn()
        self._inner.scene = refresh_transforms(self._inner.scene)
        params, has_light = self._inner.frame_params(world)
        ibl_maps = self.ibl.maps() if self.ibl is not None else None
        full, overflow = self._frame_fn(
            self.scene, ibl_maps, params, has_shadow_light=has_light
        )
        # band-local binning: each device counts its own band's dropped
        # pairs — the stacked (n*2,) vector sums to the frame total
        self._inner._note_overflow(
            overflow.reshape(-1, 2).sum(axis=0)
        )
        return full[: self.config.height, : self.config.width]

    def check_overflow(self) -> None:
        self._inner.check_overflow()

    def render(self, world) -> np.ndarray:
        from ..passes.present import unpack_rgba8

        frame = unpack_rgba8(np.asarray(self.render_device(world)))
        self.check_overflow()
        return frame
