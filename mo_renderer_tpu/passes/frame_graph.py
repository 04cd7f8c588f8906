"""FrameGraph/Renderer — composes every render pass into ONE jitted frame.

The reference records its five passes into one Vulkan command buffer per
frame (mo_core/src/application/mod.rs:242-249).  The TPU-native equivalent
is a single XLA program: shadow raster -> G-buffer raster -> attribute/
texture pass -> SSAO -> deferred shading + skybox -> present, fused by jit
with zero host round-trips (BASELINE.json north_star).
"""

from __future__ import annotations

import dataclasses
import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..device.sampling import (
    build_pcf_window_u16,
    build_pcf_window_u16_half,
    build_window_rows_2x4,
)
from ..kernels.decimate import decimate_cols
from ..kernels.raster_setup import (
    bin_triangles,
    triangle_setup,
    triangle_setup_from_attrs,
)
from .checkerboard import reconstruct_full
from ..kernels.rasterizer import rasterize, rasterize_attrs
from ..scene.camera import Camera
from ..scene.scene_buffers import (
    find_shadow_light,
    incremental_repack,
    pack_scene,
    refresh_transforms,
)
from .gbuffer import gbuffer_pass, gbuffer_pass_fast, gbuffer_pass_from_planes
from .present import present_pass, unpack_rgba8
from .shading import shading_pass, shading_pass_fast
from .ssao import ssao_pass, ssao_pass_pallas
from .vertex_stage import pack_raster_attr_columns, run_vertex_stage

logger = logging.getLogger("mo_renderer_tpu")


def _pcf_build(cfg):
    """Shadow-map -> PCF table builder for the configured layout; the
    consumer (shading.calculate_shadow_fast) infers the layout from the
    table's dtype and row count."""
    if not cfg.pcf_u16:
        return build_window_rows_2x4
    if cfg.pcf_half_anchor:
        return build_pcf_window_u16_half
    return build_pcf_window_u16


@jax.tree_util.register_pytree_node_class
class CameraParams:
    """Per-frame UBO analog (shading_pass.rs:200-214 UBO_view + skybox
    near-plane basis, shading_pass.rs:363-401) packed into ONE (64,) f32
    vector — exactly like the reference's single UBO write per frame.

    One packed vector means ONE host->device upload per frame; the dict
    of nine small arrays it replaces paid nine synchronous uploads per
    frame (~1.5ms of host time on a remote backend).  ``params[key]``
    returns the field as its natural shape via static slices (free
    fusions under jit); a leading batch axis (stacked views / scanned
    sequences) is preserved: vec (V, 64) -> params["proj_view"] (V, 4, 4).
    """

    _LAYOUT = {
        "proj_view": (0, 16, (4, 4)),
        "prev_proj_view": (16, 32, (4, 4)),
        "light_proj_view": (32, 48, (4, 4)),
        "eye_pos": (48, 51, (3,)),
        "direction": (51, 54, (3,)),
        "right": (54, 57, (3,)),
        "up": (57, 60, (3,)),
        "near": (60, 61, ()),
        "near_wh": (61, 63, (2,)),
    }
    SIZE = 64  # padded to a lane-friendly size

    def __init__(self, vec, host=None):
        self.vec = vec
        # optional host-side numpy copy for cache keys (not a pytree leaf;
        # dropped by tree transforms, which is fine — only the builder's
        # direct output carries it)
        self.host = host

    def __getitem__(self, key):
        a, b, shape = self._LAYOUT[key]
        lead = tuple(self.vec.shape[:-1])
        return self.vec[..., a:b].reshape(lead + shape)

    def host_field(self, key) -> np.ndarray:
        a, b, shape = self._LAYOUT[key]
        return np.asarray(self.host[a:b]).reshape(shape)

    def items(self):
        return [(k, self[k]) for k in self._LAYOUT]

    def tree_flatten(self):
        return (self.vec,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


def build_camera_params(camera: "Camera", light_proj_view,
                        prev: CameraParams | None = None) -> CameraParams:
    """Everything the jitted frame needs from one camera, as ONE packed
    (64,) f32 device vector (see CameraParams).

    prev: the previous frame's CameraParams — when the freshly packed
    host bytes are identical (static camera AND light), the existing
    device vector is reused, skipping the upload RPC (~0.15ms/frame on a
    remote backend).  The host-side numpy packing always runs (it is the
    change detector, ~microseconds)."""
    proj = camera.projection()
    near = camera.near_p()
    near_h = 2.0 * near * np.tan(camera.fov() / 2.0)
    near_w = camera.aspect() * near_h
    buf = np.zeros(CameraParams.SIZE, np.float32)
    buf[0:16] = np.asarray(proj @ camera.view(), np.float32).reshape(-1)
    buf[16:32] = np.asarray(proj @ camera.prev_view(), np.float32).reshape(-1)
    buf[32:48] = np.asarray(light_proj_view, np.float32).reshape(-1)
    buf[48:51] = camera.position()
    buf[51:54] = camera.direction()
    buf[54:57] = camera.right()
    buf[57:60] = camera.up()
    buf[60] = near
    buf[61:63] = (near_w, near_h)
    if (
        prev is not None
        and prev.host is not None
        and np.array_equal(prev.host, buf)
    ):
        return prev
    return CameraParams(jnp.asarray(buf), host=buf)


class RenderPass:
    """API-parity base for custom passes (RenderPassTrait,
    mo_renderpass/src/lib.rs:25-48).  Custom passes are pure functions over
    the frame context dict; they slot in after shading, before present.

    Context domain: ctx['color'] / ctx['gbuffer'] / ctx['ssao'] are always
    FULL-RESOLUTION (H, W[, C]) arrays — matching the reference's
    RenderPassTrait, whose passes see full-res attachments.  Checkerboard
    shading (cfg.checkerboard) is therefore disabled automatically whenever
    extra passes are present: a custom pass must never silently receive the
    (H, W/2) parity-shuffled cb domain."""

    def render(self, ctx: dict) -> dict:
        return ctx

    def on_swapchain_recreate(self, window_size) -> None:
        pass


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _sub_x_for(cfg, width: int) -> int:
    """cfg.raster_sub_x when the target width divides by the widened
    raster block, else 1 (per-target: 1920 allows 3, the 2048 shadow
    map allows 2)."""
    sx = cfg.raster_sub_x
    return sx if sx > 1 and width % (cfg.tile_w * sx) == 0 else 1


def _shadow_map_from_clip(shadow_clip, scene, *, cfg, binned_cap,
                          light_pv=None):
    """Depth-only raster of the scene from light-space clip positions
    (shadow_pass.rs semantics: no culling, depth bias 2/2).

    shadow_clip: per-vertex light clip (V, 4), or None to project the
    packed per-triangle corners with ``light_pv`` instead (the fast
    path — no per-vertex stage, see triangle_setup_from_attrs).
    Returns (shadow_map, overflow) — overflow is the binning's dropped
    (tile, tri) pair count (0 = nothing dropped)."""
    smap = cfg.shadow_map_size
    if shadow_clip is None:
        s_setup = triangle_setup_from_attrs(
            scene.tri_attrs, scene.tri_valid, light_pv, smap, smap,
            cull_backface=False,  # shadow_pass.rs:132-140 CullMode::None
            depth_bias_const=cfg.shadow_depth_bias_const,
            depth_bias_slope=cfg.shadow_depth_bias_slope,
        )
    else:
        s_setup = triangle_setup(
            shadow_clip, scene.indices, scene.tri_valid, smap, smap,
            cull_backface=False,
            depth_bias_const=cfg.shadow_depth_bias_const,
            depth_bias_slope=cfg.shadow_depth_bias_slope,
        )
    bin_h = cfg.tile_h // cfg.raster_sub_y
    s_binned = bin_triangles(
        s_setup,
        tile_h=bin_h, tile_w=cfg.tile_w,
        n_tiles_x=smap // cfg.tile_w,
        n_tiles_y=smap // bin_h,
        max_tiles_per_tri=8,
        binned_cap=binned_cap,
        global_cap=512,
    )
    _, shadow_map, _, _ = rasterize(
        s_binned, width=smap, height=smap,
        tile_h=cfg.tile_h, tile_w=cfg.tile_w, depth_only=True,
        sub_y=cfg.raster_sub_y, sub_x=_sub_x_for(cfg, smap),
    )
    return shadow_map, s_binned.overflow


def shadow_program(scene, light_proj_view, *, cfg, binned_cap):
    """Shadow map as quad-window rows, split out of frame_program so the
    result can be memoized: it is a pure function of
    (scene, light_proj_view).  Returns (quad_rows, overflow).

    Only the fast path memoizes (Renderer._cached_shadow_quads), and the
    fast path's light clip comes from the packed per-triangle corners —
    same values the in-frame raster uses (triangle_setup_from_attrs)."""
    build = _pcf_build(cfg)
    shadow_map, overflow = _shadow_map_from_clip(
        None, scene, cfg=cfg, binned_cap=binned_cap,
        light_pv=light_proj_view,
    )
    return build(shadow_map), overflow


def frame_program(
    scene,
    ibl,
    params,
    *,
    cfg,
    pad_w,
    pad_h,
    binned_cap,
    has_shadow_light,
    extra_passes=(),
    fast_sampling=None,
    slot_map=None,
    shadow_quads=None,
    static_light_count=None,
    with_overflow=False,
):
    """One full deferred frame as a pure function over pytrees.

    The TPU-native equivalent of the reference's per-frame command buffer
    through all five passes (mo_core/src/application/mod.rs:242-249):
    shadow raster -> G-buffer raster -> SSAO -> deferred shading + skybox
    -> present, traced into ONE XLA program.  Shared by the single-view
    Renderer and the multi-chip multi-view path (parallel/multi_view.py).

    with_overflow=True additionally returns a (2,) int32 vector
    [gbuffer_bin_overflow, shadow_bin_overflow] so callers can detect
    dropped geometry (SURVEY §7 hard-part 1: never truncate silently).
    """
    use_ssao = cfg.ssao_enabled
    use_shadow = cfg.shadow_enabled
    smap = cfg.shadow_map_size
    fast = cfg.fast_sampling if fast_sampling is None else fast_sampling
    use_megakernel = fast and cfg.raster_interp_attrs
    # the slim fast path's ONLY vertex-stage consumers were the setup
    # corner gathers; projecting the packed per-triangle world corners
    # (triangle_setup_from_attrs) instead skips the whole per-vertex
    # stage — bit-identical (tri_attrs wp IS vs.world_pos per corner,
    # and affine transforms make the homogeneous w exactly 1.0)
    attrs_setup = fast and not use_megakernel
    vs = None if attrs_setup else run_vertex_stage(
        scene,
        params["proj_view"],
        params["prev_proj_view"],
        params["light_proj_view"],
    )

    # --- shadow pass (depth-only raster from the light) ------------------
    # skipped entirely when the caller supplies memoized shadow_quads
    shadow_map = None
    shadow_overflow = jnp.zeros((), jnp.int32)
    if use_shadow and has_shadow_light and not (fast and shadow_quads is not None):
        shadow_map, shadow_overflow = _shadow_map_from_clip(
            None if attrs_setup else vs.shadow_clip, scene,
            cfg=cfg, binned_cap=binned_cap,
            light_pv=params["light_proj_view"] if attrs_setup else None,
        )

    # --- G-buffer raster + attribute/texture pass -------------------------
    if attrs_setup:
        setup = triangle_setup_from_attrs(
            scene.tri_attrs, scene.tri_valid, params["proj_view"],
            pad_w, pad_h, cull_backface=True,  # gbuffer_pass.rs:350
        )
    else:
        setup = triangle_setup(
            vs.clip, scene.indices, scene.tri_valid, pad_w, pad_h,
            cull_backface=True,
        )
    if fast and slot_map is None:
        raise ValueError(
            "fast_sampling requires slot_map (the host-read value of "
            "scene.stack_slots — see Renderer.prepare)"
        )
    # checkerboard shading: keep the FULL-res visibility buffer (it
    # guides reconstruction) but run the attribute/texture pass and
    # everything downstream on half the pixels (passes/checkerboard.py).
    # Disabled when custom passes are present: the RenderPass API promises
    # a full-resolution frame context (see RenderPass docstring).
    use_cb = (
        fast and cfg.checkerboard and not use_megakernel and not extra_passes
    )
    if use_megakernel:
        # append the channel-major attr columns so the raster kernel
        # interpolates attributes in VMEM (rows are DMA'd at 128 floats
        # either way — the extra columns are free)
        extra = pack_raster_attr_columns(scene.tri_attrs, params["proj_view"])
        setup = dataclasses.replace(
            setup, tri_data=jnp.concatenate([setup.tri_data, extra], axis=1)
        )
    # megakernel interpolates per candidate row, so it keeps runs == tiles
    gb_sub = 1 if use_megakernel else cfg.raster_sub_y
    binned = bin_triangles(
        setup,
        tile_h=cfg.tile_h // gb_sub, tile_w=cfg.tile_w,
        n_tiles_x=pad_w // cfg.tile_w,
        n_tiles_y=pad_h // (cfg.tile_h // gb_sub),
        max_tiles_per_tri=8,
        binned_cap=binned_cap,
        global_cap=512,
    )
    if use_megakernel:
        tri, z, attrs, mat_plane, ht_plane = rasterize_attrs(
            binned, width=pad_w, height=pad_h,
            tile_h=cfg.tile_h, tile_w=cfg.tile_w,
        )
        gbuf = gbuffer_pass_from_planes(
            tri, z, attrs, mat_plane, ht_plane, scene, params,
            slot_map=slot_map,
        )
    else:
        # fast path: slim 2-output visibility kernel — barycentrics are
        # rebuilt in gbuffer_pass_fast from the packed corners
        tri, z, b0, b1 = rasterize(
            binned, width=pad_w, height=pad_h,
            tile_h=cfg.tile_h, tile_w=cfg.tile_w, slim=fast,
            sub_y=cfg.raster_sub_y, sub_x=_sub_x_for(cfg, pad_w),
        )
        if use_cb:
            tri_full, z_full = tri, z
            tri = decimate_cols(tri, "cb")
            z = decimate_cols(z, "cb")
        if fast:
            gbuf = gbuffer_pass_fast(
                tri, z, None, None, scene, scene.tri_attrs, params,
                slot_map=slot_map, cb=use_cb, full_wh=(pad_w, pad_h),
                plane_kernel=cfg.attrs_plane_kernel,
                stack_kernel=cfg.stack_plane_kernel,
            )
        else:
            gbuf = gbuffer_pass(tri, z, b0, b1, scene, vs)

    # --- SSAO --------------------------------------------------------------
    # screen-space neighborhoods need the FULL-res depth even under
    # checkerboard shading; the result is then checkerboard-sampled.
    # ssao_res_divisor=2 evaluates on the even grid instead — the
    # reference's own semantics at half resolution (its radius scales
    # with the window, ssao.comp:97-101) — and upsamples to the
    # shading domain.
    from .shading import _even_grid, _upsample_pow2, _upsample_to_cb

    ssao_depth = z_full if use_cb else gbuf.depth
    half_ssao = use_ssao and cfg.ssao_res_divisor > 1
    if half_ssao:
        d_in = _even_grid(ssao_depth, (2, 2))
        # the Pallas kernel needs tile-aligned dims; edge-pad and crop
        ph = _round_up(d_in.shape[0], cfg.tile_h) - d_in.shape[0]
        pw = _round_up(d_in.shape[1], cfg.tile_w) - d_in.shape[1]
        d_pad = jnp.pad(d_in, ((0, ph), (0, pw)), mode="edge")
    else:
        d_pad = ssao_depth
    if use_ssao:
        if cfg.ssao_pallas:
            ssao = ssao_pass_pallas(
                d_pad, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                near=cfg.ssao_near, far=cfg.ssao_far,
            )
        else:
            ssao = ssao_pass(
                d_pad, near=cfg.ssao_near, far=cfg.ssao_far
            )
        if half_ssao:
            ssao = ssao[: d_in.shape[0], : d_in.shape[1]]
            if use_cb:
                ssao = _upsample_to_cb(ssao, *gbuf.depth.shape, 2, 1)
            else:
                ssao = _upsample_pow2(ssao, *gbuf.depth.shape, 2)
        elif use_cb:
            ssao = decimate_cols(ssao, "cb")
    else:
        ssao = jnp.ones_like(gbuf.depth)

    # --- shading + skybox + tonemap ---------------------------------------
    if fast:
        if shadow_quads is None and shadow_map is not None:
            shadow_quads = _pcf_build(cfg)(shadow_map)
        if not (use_shadow and has_shadow_light):
            shadow_quads = None
        color = shading_pass_fast(
            gbuf, ssao, shadow_quads, smap, scene.lights,
            scene.num_lights, params, ibl=ibl,
            shadow_res_divisor=cfg.pcf_res_divisor,
            static_light_count=static_light_count,
            parent_mip_half_res=cfg.spec_parent_mip_half_res,
            mirror_half_res=cfg.spec_mirror_half_res,
            merged_trilinear=cfg.spec_merged_trilinear,
            cb=use_cb,
        )
    else:
        color = shading_pass(
            gbuf, ssao, shadow_map, scene.lights, scene.num_lights,
            params, ibl=ibl,
        )

    ctx = {"color": color, "gbuffer": gbuf, "ssao": ssao}
    for p in extra_passes:
        ctx = p.render(ctx)

    rgba = present_pass(ctx["color"])  # (H, W[/2]) packed uint32
    if use_cb:
        rgba = reconstruct_full(rgba, tri_full)  # (H, W)
    # crop padding back to the configured size
    rgba = rgba[: cfg.height, : cfg.width]
    if with_overflow:
        return rgba, jnp.stack([binned.overflow, shadow_overflow])
    return rgba


# moved to utils (shared with IBLResource.ensure_computed); re-exported
# here for compatibility
from ..utils import enable_compile_cache  # noqa: E402


class Renderer:
    """Owns packed scene + IBL data and the jitted frame function."""

    def __init__(self, config: EngineConfig, extra_passes=()):
        if config.compile_cache:
            enable_compile_cache()
        self.config = config
        self.extra_passes = list(extra_passes)
        self.scene = None
        self.ibl = None
        self._frame_fn = None
        self._pending_overflow = []
        # padded framebuffer (tiles must divide the raster target)
        self.pad_w = _round_up(config.width, config.tile_w)
        self.pad_h = _round_up(config.height, config.tile_h)

    # --- scene preparation (App::resumed analog) ------------------------
    def prepare(self, world) -> None:
        from ..assets.ibl_resource import IBLResource

        self._world_generation = getattr(world, "generation", None)
        # bumped on every full prepare so wrappers that close over the
        # derived statics (_binned_cap/_slot_map/_n_lights — multi-view,
        # row sharding) know to rebuild their own frame fns
        self._prepare_count = getattr(self, "_prepare_count", 0) + 1
        self.scene = pack_scene(world, self.config)
        ibl_res = world.get_resource(IBLResource)
        if ibl_res is not None:
            ibl_res.ensure_computed()
            self.ibl = ibl_res
        t = int(self.scene.indices.shape[0])
        if self.config.binned_cap is not None:
            self._binned_cap = _round_up(self.config.binned_cap, 8)
        else:
            # exactly the binner's enumeration bound (2 slots per
            # triangle + 8/32/n_tiles per compacted medium/large/xlarge
            # class row): the sort is never truncated, so pair overflow
            # can only come from the class caps.  n_tiles is the LARGER
            # of the framebuffer and shadow-map tilings (the cap is
            # shared by both raster passes).
            from ..kernels.raster_setup import (
                LARGE_SPAN,
                default_large_cap,
                default_medium_cap,
                default_xlarge_cap,
            )

            cfg = self.config
            bin_h = cfg.tile_h // cfg.raster_sub_y  # binning granularity
            n_tiles = max(
                (self.pad_w // cfg.tile_w) * (self.pad_h // bin_h),
                (cfg.shadow_map_size // cfg.tile_w)
                * (cfg.shadow_map_size // bin_h),
            )
            cap = (
                2 * t
                + 8 * default_medium_cap(t)
                + LARGE_SPAN * default_large_cap(t)
                + n_tiles * default_xlarge_cap(t)
            )
            self._binned_cap = _round_up(min(max(8192, cap), 1 << 20), 8)
        # the stacked-texture fast path samples every slot with UV set 0;
        # scenes using UV1 (rare) fall back to the reference samplers
        uses_uv1 = bool(np.asarray(self.scene.materials[:, 5:10]).any())
        self._fast = self.config.fast_sampling and not uses_uv1
        # live-light count is fixed at pack time; specializing the
        # shading loop to it drops 14 dead cook-torrance evaluations
        self._n_lights = int(np.asarray(self.scene.num_lights))
        # static layout of the texture stacks (host-read once)
        self._slot_map = tuple(
            int(x) for x in np.asarray(self.scene.stack_slots)
        )
        if self.config.fast_sampling and uses_uv1:
            logger.info("scene uses UV set 1: reference sampling path")
        # pre-warm the incremental-spawn chunk program so the first
        # mid-run spawn pays no remote compile (scene_buffers
        # _apply_tail_chunks; skipped on CPU where compiles are cheap)
        if jax.default_backend() != "cpu":
            from ..scene.scene_buffers import warm_incremental

            warm_incremental(self.scene)
        self._frame_fn = self._build_frame_fn()
        logger.info(
            "renderer prepared: %d tris, %d verts, fb %dx%d (pad %dx%d)",
            t, int(self.scene.position.shape[0]),
            self.config.width, self.config.height, self.pad_w, self.pad_h,
        )

    # --- the jitted frame ----------------------------------------------
    def _build_frame_fn(self):
        cfg = self.config
        pad_w, pad_h = self.pad_w, self.pad_h
        binned_cap = self._binned_cap
        extra_passes = tuple(self.extra_passes)
        fast = self._fast
        slot_map = self._slot_map
        n_lights = self._n_lights

        @functools.partial(jax.jit, static_argnames=("has_shadow_light",))
        def frame(scene, ibl, params, shadow_quads, has_shadow_light):
            return frame_program(
                scene, ibl, params,
                cfg=cfg, pad_w=pad_w, pad_h=pad_h, binned_cap=binned_cap,
                has_shadow_light=has_shadow_light,
                extra_passes=extra_passes,
                fast_sampling=fast,
                slot_map=slot_map,
                shadow_quads=shadow_quads,
                static_light_count=n_lights,
                with_overflow=True,
            )

        @functools.partial(jax.jit, static_argnames=("has_shadow_light",))
        def sequence(scene, ibl, params_stack, shadow_quads,
                     has_shadow_light):
            # K frames in ONE XLA program: lax.scan over the stacked
            # camera params.  The scene is frame-invariant, so only the
            # (tiny) params pytree scans.  shadow_quads is the memoized
            # PCF table when the light is identical across the WHOLE
            # sequence (render_sequence_device verifies byte equality);
            # None re-rasters the shadow inside each scanned step (a
            # per-frame light ride via the params).
            def body(ovf, p):
                rgba, o = frame_program(
                    p_scene, ibl, p,
                    cfg=cfg, pad_w=pad_w, pad_h=pad_h,
                    binned_cap=binned_cap,
                    has_shadow_light=has_shadow_light,
                    extra_passes=extra_passes,
                    fast_sampling=fast,
                    slot_map=slot_map,
                    shadow_quads=shadow_quads,
                    static_light_count=n_lights,
                    with_overflow=True,
                )
                return ovf + o, rgba

            p_scene = scene
            ovf, frames = jax.lax.scan(
                body, jnp.zeros((2,), jnp.int32), params_stack
            )
            return frames, ovf

        self._sequence_fn = sequence
        self._shadow_fn = jax.jit(
            functools.partial(shadow_program, cfg=cfg, binned_cap=binned_cap)
        )
        self._shadow_key = None
        self._shadow_scene = None
        self._shadow_quads = None
        self._pending_overflow = []
        return frame

    # --- overflow surfacing (SURVEY §7 hard-part 1) ----------------------
    # Binning caps are static under jit, so dropped (tile, tri) pairs are
    # counted on device and surfaced here.  render_device keeps the tiny
    # per-frame counter ON DEVICE; counters older than the lag window are
    # fetched (8 bytes, frames long since computed — no pipeline stall,
    # and the window keeps host round-trips off short benchmark loops);
    # render()/check_overflow() drain synchronously.
    _OVERFLOW_LAG = 64

    def _note_overflow(self, ovf) -> None:
        self._pending_overflow.append(ovf)
        while len(self._pending_overflow) > self._OVERFLOW_LAG:
            self._raise_if_overflow(self._pending_overflow.pop(0))

    def _raise_if_overflow(self, ovf) -> None:
        v = np.asarray(ovf)
        if v.any():
            raise RuntimeError(
                f"rasterizer bin overflow: {int(v[0])} G-buffer and "
                f"{int(v[1])} shadow (tile, triangle) pairs dropped — "
                f"geometry is missing from the frame.  Raise "
                f"EngineConfig.binned_cap (current {self._binned_cap}) "
                f"and re-prepare."
            )

    def check_overflow(self) -> None:
        """Drain all pending overflow counters; raises if any frame
        dropped geometry.  Called automatically by render(); device-
        resident loops (render_device) should call it at checkpoints."""
        while self._pending_overflow:
            self._raise_if_overflow(self._pending_overflow.pop(0))

    def resize(self, width: int, height: int) -> None:
        """Swapchain-recreate analog (mo_vk/src/lib.rs:352-388): rebuild
        pad/tile geometry and re-jit the frame for a new resolution.
        The packed scene, IBL maps, and shadow path are resolution-
        independent and are reused; only the frame program recompiles."""
        import dataclasses as _dc

        self.config = _dc.replace(self.config, width=width, height=height)
        self.pad_w = _round_up(width, self.config.tile_w)
        self.pad_h = _round_up(height, self.config.tile_h)
        for p in self.extra_passes:
            p.on_swapchain_recreate((width, height))
        if self.scene is not None:
            self._frame_fn = self._build_frame_fn()
            logger.info(
                "renderer resized: fb %dx%d (pad %dx%d)",
                width, height, self.pad_w, self.pad_h,
            )

    def _cached_shadow_quads(self, light_pv, has_light):
        """Memoized shadow map (quad rows): recomputed only when the
        caster light or any entity transform changed (bit-identical —
        the map is a pure function of scene + light_proj_view).

        The scene half of the key is an identity check against a STRONG
        reference (``self._shadow_scene``), never a bare ``id()``:
        scenes are replaced every frame by refresh_transforms /
        incremental_repack, and a recycled address could false-match a
        stale map if the keyed object were allowed to die."""
        if not (
            self._fast
            and has_light
            and self.config.shadow_enabled
            and self.config.shadow_cache
        ):
            return None
        key = np.asarray(light_pv).tobytes()
        if key != self._shadow_key or self._shadow_scene is not self.scene:
            self._shadow_quads, ovf = self._shadow_fn(
                self.scene, jnp.asarray(light_pv)
            )
            # surface overflow through the lagged pipeline (a synchronous
            # fetch here would stall dynamic scenes every recompute)
            self._note_overflow(
                jnp.stack([jnp.zeros((), jnp.int32), ovf])
            )
            self._shadow_key = key
            self._shadow_scene = self.scene
        return self._shadow_quads

    def _sync_topology(self, world) -> None:
        """Bring the packed scene up to date with world topology changes
        (spawn/despawn after prepare).  The reference re-queries the world
        per draw (gbuffer_pass.rs:516-548) so changes are free there; here
        the common cases (despawn; spawn reusing packed texture content)
        update the padded soup in place via ``incremental_repack`` —
        tens of ms instead of the seconds a full pack_scene + re-jit
        costs at sponza scale.  Anything the static layout cannot absorb
        (new texture content, capacity overflow, light-count change)
        falls back to a full ``prepare``."""
        gen = getattr(world, "generation", None)
        if gen is None or gen == self._world_generation:
            return
        new_scene = incremental_repack(
            self.scene, world, self.config, forbid_uv1=self._fast
        )
        if new_scene is not None:
            logger.info(
                "world topology changed (generation %s -> %s): "
                "incremental repack", self._world_generation, gen,
            )
            self.scene = new_scene
            self._world_generation = gen
        else:
            logger.info(
                "world topology changed (generation %s -> %s): full "
                "re-prepare", self._world_generation, gen,
            )
            self.prepare(world)

    # --- per-frame host side (App frame loop analog) --------------------
    def frame_params(self, world) -> tuple[dict, bool]:
        camera: Camera = world.resource(Camera)
        light_pv, has_light = find_shadow_light(world)
        # input fingerprint fast path: when the camera TRS/projection and
        # the light matrix are byte-identical to last frame AND the
        # packed UBO has converged (prev_view == view — true from the
        # second static frame, since refresh_view rolls prev <- view
        # every frame), skip the whole numpy rebuild, not just the
        # upload.  ~0.4ms/frame of host time on the idle frame loop.
        fp = (
            np.asarray(camera.transform.translation).tobytes(),
            np.asarray(camera.transform.rotation).tobytes(),
            camera.projection().tobytes(),
            np.asarray(light_pv).tobytes(),
        )
        prev = getattr(self, "_params_prev", None)
        if (
            prev is not None
            and prev.host is not None
            and getattr(self, "_params_fp", None) == fp
            and np.array_equal(prev.host[16:32], prev.host[0:16])
        ):
            return prev, has_light
        params = build_camera_params(camera, light_pv, prev=prev)
        self._params_prev = params
        self._params_fp = fp
        return params, has_light

    def render_device(self, world):
        """One frame, left on device as (H, W) packed-rgba8 uint32 — the
        swapchain-present analog (the reference never reads frames back
        either).  ``present.unpack_rgba8`` restores (H, W, 4) uint8."""
        self._sync_topology(world)
        # dynamic transforms: the reference re-reads Transform per draw
        # (gbuffer_pass.rs:516-548); re-bake if any entity moved (no-op
        # when nothing changed)
        self.scene = refresh_transforms(self.scene)
        params, has_light = self.frame_params(world)
        ibl_maps = self.ibl.maps() if self.ibl is not None else None
        quads = self._cached_shadow_quads(
            params.host_field("light_proj_view")
            if params.host is not None
            else params["light_proj_view"],
            has_light,
        )
        rgba, overflow = self._frame_fn(
            self.scene, ibl_maps, params, quads, has_shadow_light=has_light
        )
        self._note_overflow(overflow)
        return rgba

    def render_sequence_device(self, world, params_list):
        """K frames in ONE dispatch, left on device as (K, H, W) packed
        u32 — ``lax.scan`` over the stacked per-frame camera params.

        The per-jit-call dispatch floor (~3-4ms on a remote backend,
        NOTES_PERF.md) amortizes K-fold, so camera-path / offline-render
        workloads run at the device's true frame rate.  The scene is
        frame-invariant within the sequence (use ``render_device`` for
        interactive frames where entities move between frames); each
        scanned step still renders the FULL frame, shadow raster
        included (the light may differ per frame via the params).

        params_list: per-frame dicts from ``build_camera_params`` (the
        reference's per-frame UBO write, shading_pass.rs:200-214).
        """
        self._sync_topology(world)
        self.scene = refresh_transforms(self.scene)
        _, has_light = self.frame_params(world)
        stack = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *params_list
        )
        ibl_maps = self.ibl.maps() if self.ibl is not None else None
        # memoized shadow map only when the light matrix is identical
        # across the WHOLE sequence (each step carries its own
        # light_proj_view — a moving light must re-raster per step)
        light_pv, _ = find_shadow_light(world)
        lpv = np.asarray(light_pv, np.float32).reshape(-1)
        same_light = all(
            p.host is not None
            and np.array_equal(p.host[32:48], lpv)
            for p in params_list
        )
        quads = (
            self._cached_shadow_quads(light_pv, has_light)
            if same_light
            else None
        )
        frames, overflow = self._sequence_fn(
            self.scene, ibl_maps, stack, quads, has_shadow_light=has_light
        )
        self._note_overflow(overflow)
        return frames

    def render(self, world) -> np.ndarray:
        """One frame fetched to host as (H, W, 4) uint8 rgba."""
        frame = unpack_rgba8(np.asarray(self.render_device(world)))
        self.check_overflow()  # the fetch already synced; checks are free
        return frame
