"""Centralized engine configuration.

The reference hardcodes its knobs across files (shadow map 2048^2 at
mo_renderpass/src/shadow_pass.rs:56, IBL size 512 at
mo_ecs/src/resource/ibl_resource.rs:41, camera speeds at
mo_ecs/src/resource/camera.rs:13-15, SSAO near/far at
resources/shaders/ssao.comp:12-13, window 1280x720 at
mo_vk/src/window.rs:349-350).  Here they live in one typed config.
"""

from __future__ import annotations

import dataclasses
import os


def _default_resource_root() -> str:
    """Locate the ``resources/`` asset tree.

    Checks $MO_RESOURCES, then ./resources, then the read-only reference
    checkout (which holds the canonical textures/models for parity tests).
    """
    for cand in (
        os.environ.get("MO_RESOURCES"),
        os.path.join(os.getcwd(), "resources"),
        "/root/repo/resources",
        "/root/reference/resources",
    ):
        if cand and os.path.isdir(cand):
            return cand
    return os.path.join(os.getcwd(), "resources")


@dataclasses.dataclass
class EngineConfig:
    # Framebuffer (reference default window: mo_vk/src/window.rs:349-350)
    width: int = 1280
    height: int = 720

    # Shadow map (shadow_pass.rs:54-61): fixed-size D32 depth map.
    shadow_map_size: int = 2048
    # Vulkan rasterizer depth bias used by the shadow pipeline
    # (shadow_pass.rs:132-140): constant 2.0, slope 2.0.
    shadow_depth_bias_const: float = 2.0
    shadow_depth_bias_slope: float = 2.0

    # IBL precompute (ibl_resource.rs:41-64)
    ibl_cubemap_size: int = 512
    ibl_brdf_lut_size: int = 512
    ibl_env_name: str = "default_sky"
    ibl_specular_samples: int = 1024
    ibl_irradiance_delta: float = 0.025

    # SSAO (ssao.comp:12-13): hardcoded linearization range.
    ssao_near: float = 0.1
    ssao_far: float = 100.0
    ssao_enabled: bool = True
    shadow_enabled: bool = True
    # Memoize the shadow map across frames while the caster light and all
    # entity transforms are unchanged (bit-identical output — the map is
    # a pure function of scene + light_proj_view; the key covers both).
    # Default ON: with the 34MB half-anchor u16 window table the memoized
    # table rides the frame dispatch for free (measured 16.71 -> 15.28
    # ms/frame at 1080p, scripts/perf_shadow_cache.py — the round-1
    # "90ms/frame argument tax" was specific to the retired 134MB f32
    # layout), so static-light frames skip the whole shadow raster +
    # window build.  Dynamic scenes recompute the table in its own
    # dispatch on every change — roughly the same work the in-frame
    # raster did; set False to fold the shadow raster back into the
    # frame program (e.g. a light animated every frame).
    shadow_cache: bool = True

    # Rasterizer tiling. Pixel tiles are (tile_h, tile_w); tile_w must be a
    # multiple of 128 (TPU lane count), tile_h a multiple of 8.  Raster
    # cost is dominated by per-grid-step overhead, so the fewer tiles the
    # better AS LONG AS binning granularity (see raster_sub_y) stays at 32
    # rows — the measured per-pair pixel-footprint optimum (16x128 +0.3ms
    # flagship / +0.6ms sponza vs 32; 32x256 / 16x256 / 64-row BINS all
    # worse).  None (default) picks 64 when that doesn't grow the padded
    # framebuffer (1080p: 1088 either way — flagship -0.1ms, sponza
    # -0.6ms vs 32) and 32 otherwise (720p: 736 vs 768).  Raster output
    # is bit-identical across tilings (binning is conservative-exact and
    # the depth/tie rule is tile-local).
    tile_h: int | None = None
    tile_w: int = 128
    # Vertical sub-runs per raster tile: triangles are BINNED at
    # (tile_h/raster_sub_y)-row granularity while the Pallas grid stays at
    # (tile_h, tile_w) blocks — each grid step processes raster_sub_y
    # shorter runs, so candidates are tested against sub_y-fold fewer
    # pixels without paying more per-grid-step overhead.  None (default)
    # keeps 32-row bins (tile_h/32): measured optimal on both flagship
    # and sponza — 16-row bins lose ~0.4ms to per-run overhead at either
    # tile_h.  Output is bit-identical across values.
    raster_sub_y: int | None = None
    # Horizontal analog of raster_sub_y: each raster grid step covers
    # raster_sub_x adjacent 128-lane bin COLUMNS (output block
    # tile_h x sub_x*128), shrinking the grid — and its dominant
    # per-step overhead — sub_x-fold with the per-pair pixel footprint
    # unchanged.  Applied per raster target only when the padded width
    # divides by sub_x*tile_w (1920 allows 3/5/15; the 2048 shadow map
    # allows 2/4/...), falling back to 1 otherwise.  Output is
    # bit-identical across values.
    raster_sub_x: int = 1
    # Capacity of the per-tile (tile, triangle) pair table built by
    # bin_triangles.  None = heuristic (4x the triangle count, clamped to
    # [8192, 2^20]).  Overflow is detected at runtime (Renderer surfaces
    # the dropped-pair count and raises) — see passes/frame_graph.py.
    binned_cap: int | None = None

    # Static scene capacities (everything under jit needs static shapes).
    max_vertices: int = 1 << 20
    max_triangles: int = 1 << 20
    max_meshes: int = 256
    max_materials: int = 256
    max_lights: int = 16
    # Texture array for the REFERENCE sampling path: all material
    # textures are resampled into one (N, tex_size, tex_size, 4) array.
    # The fast path's quad stacks keep NATIVE pow2 sizes instead (capped
    # at max_texture_size) — see scene/scene_buffers.py.
    texture_array_size: int = 1024
    # Cap on a fast-path texture-stack entry's side length: native
    # texture sizes above this are downsampled (stack bytes grow with
    # size^2 and XLA's gather cost grows with table bytes).
    max_texture_size: int = 2048
    max_textures: int = 64
    # Fast sampling: quad-packed texture/shadow/IBL layouts + SH9
    # irradiance.  One gather per bilinear sample instead of four (XLA TPU
    # gathers cost ~7ns/index), at ~4-5x texture memory.  Falls back to
    # the reference path automatically when a material uses UV set 1.
    fast_sampling: bool = True
    # Interpolate triangle attributes inside the Pallas raster kernel
    # (rasterize_attrs megakernel) instead of a per-pixel attrs-row gather
    # + XLA interpolation.  Default OFF: measured +20ms at 1080p — the
    # per-CANDIDATE 14-channel interpolation triples the raster inner
    # loop's VPU work, which exceeds the ~12ms attrs gather it removes
    # (NOTES_PERF.md).  Kept for scenes where the gather dominates
    # (huge triangle tables).
    raster_interp_attrs: bool = False
    # Fused attrs->planes Pallas kernel (kernels/attr_planes.py): consume
    # the attrs-row gather result in its native channel-minor layout and
    # emit the per-channel planes directly, removing XLA's 233MB
    # gather-output relayout copy (1.21ms at 1080p, the round-4 trace's
    # one non-floor block).  Default ON: -0.43ms at 1080p, consistent
    # across every interleaved trial (r5 perf_ab; trace confirms
    # copy.167 gone, attr_planes.1 rides at ~0.8ms for the copy's 1.21
    # plus the interp fusions it absorbs).  Applies to the slim fast
    # path only (b0 is None); off falls back to the identical XLA math
    # (a few f32 ULPs of FMA-grouping drift, tests/test_attr_planes.py).
    attrs_plane_kernel: bool = True
    # Companion for the texture-stack gather: fused unpack+bilinear
    # Pallas kernel consuming the u32 quad rows in their native layout
    # (kernels/stack_planes.py), removing the 0.6ms stack-row relayout.
    # Default OFF: wins -0.27ms ALONE but combined with the attrs kernel
    # the frame measures +0.1-0.3ms WORSE than attrs-only (r5 interleaved
    # A/Bs — the two pallas calls lose the XLA overlap between the stack
    # gather and the surrounding fusions).  Kept for stacks-dominated
    # scenes where attrs_plane_kernel is off.
    stack_plane_kernel: bool = False
    # PCF window table as u16-packed 4x4 windows (ONE gather/pixel) vs
    # two f32 wide-row gathers.  Ceil quantization: boundary shift of at
    # most one 1.5e-5 depth quantum, no acne (see sampling.build_pcf_window_u16).
    pcf_u16: bool = True
    # Anchor the u16 PCF windows on the EVEN texel grid only: quarter the
    # window-table bytes (134 -> 34MB at 2048^2).  XLA's gather cost grows
    # with TABLE BYTES at a fixed index count (NOTES_PERF.md), and the PCF
    # window fetch was the one gather still table-bytes bound (~11ns/idx
    # vs the ~3.5ns floor).  Odd-anchored pixels shift their taps by the
    # (0|1, 0|1) residual inside the even-anchored window; a tap's
    # bilinear neighbor that falls one texel outside clamps to the window
    # edge — a <= half-texel softening on ~1/8 of taps (budget pinned in
    # tests/test_fast_budget.py).
    pcf_half_anchor: bool = True
    # Evaluate the PCF factor on a strided pixel grid (1 = full res,
    # 2 = even pixels, 4 = every 4th) and bilinearly upsample — the
    # divisor^2-fold fewer gather indices into the 134MB window table
    # were the single biggest frame cost.  Widens penumbrae slightly
    # (4-vs-2 at 1080p: 0.009% of pixels differ by >12/255, -10.7ms).
    pcf_res_divisor: int = 4
    # The coarser specular trilinear tap (mip l0+1, band-limited by
    # construction) sampled on the even-pixel grid and upsampled.
    spec_parent_mip_half_res: bool = True
    # Sample the mirror tap (and the skybox ride-along) on the even grid
    # too, with a mask-aware upsample that never blends across the
    # sky/surface silhouette.  On-vs-off at 1080p: mean diff 0.11 LSB,
    # 0.04% of pixels >12/255, -5.5ms.
    spec_mirror_half_res: bool = True
    # With both half-res flags on, fetch BOTH trilinear taps in ONE
    # 32-byte-row gather from the child+parent pair table
    # (sampling.MipCubeQuadMerged) — halves the trilinear index stream;
    # the coarse tap lands 1/4 parent texel from true trilinear
    # (band-limited mip; bounds pinned in tests/test_fast_budget.py).
    spec_merged_trilinear: bool = True
    # SSAO tap loop as one Pallas tile kernel (VMEM halo window) instead
    # of ~200 materialized full-image shifts.
    ssao_pallas: bool = True
    # Evaluate SSAO on the even-pixel grid and bilinearly upsample
    # (1 = full rate).  The reference's SSAO radius scales with the
    # window resolution (ssao.comp:97-101 via textureResolution), so the
    # half-res field is the reference's own semantics at W/2 — a smooth,
    # noise-dithered quantity that upsamples well.  Budget pinned in
    # tests/test_fast_budget.py; ignored by the row-sharded path (its
    # halo exchange is sized for full rate).
    ssao_res_divisor: int = 2
    # Checkerboard shading: the G-buffer attribute/texture pass and the
    # deferred shading run on HALF the pixels (columns 2j + (y&1)); the
    # other half is reconstructed from its 4 checkerboard neighbors,
    # triangle-id-guided so surfaces never blend across silhouettes
    # (passes/checkerboard.py).  Visibility (raster), shadow, and SSAO
    # stay full-resolution.  Halves the dominant per-pixel gather
    # streams (texture stack + attrs rows — the measured frame floor,
    # NOTES_PERF.md).  Error budget pinned in tests/test_fast_budget.py.
    # Requires fast_sampling + spec_mirror_half_res; ignored by the
    # reference path and the megakernel; row-sharded rendering
    # checkerboards per band (bands start on even rows, so the phase
    # is preserved).  On-vs-off at 1080p (man.glb): mean diff 0.134 LSB,
    # 0.06% of pixels >12/255 (detail edges only), -14.3ms device frame
    # (36.8 -> 22.5).
    checkerboard: bool = True

    # Asset root containing gltf/, tex/, shaders/ subdirs.
    resource_root: str = dataclasses.field(default_factory=_default_resource_root)

    # Persistent XLA compilation cache: first TPU compile of the full
    # frame takes minutes per shape/config; caching the compiled
    # executables under $MO_CACHE_DIR (the IBL cache's side-car dir)
    # makes repeat runs start in seconds.  Measured on this backend:
    # a 74s compile replays in 30s total process time.  Set False to
    # leave jax's compilation-cache config untouched.
    compile_cache: bool = True

    # Camera system constants (camera.rs:13-15).
    rotate_speed: float = 0.3141592653589793  # PI / 10
    move_speed: float = 0.01
    mouse_sensitivity: float = 0.005

    def __post_init__(self):
        def up(x, m):
            return ((x + m - 1) // m) * m

        if self.tile_h is None:
            # 64-row tiles iff they don't grow the padded framebuffer
            self.tile_h = (
                64 if up(self.height, 64) == up(self.height, 32) else 32
            )
        if self.raster_sub_y is None:
            self.raster_sub_y = max(1, self.tile_h // 32)  # 32-row bins
        assert self.tile_w % 128 == 0, "tile_w must be a multiple of 128"
        assert self.tile_h % 8 == 0, "tile_h must be a multiple of 8"
        assert (
            self.tile_h % self.raster_sub_y == 0
            and (self.tile_h // self.raster_sub_y) % 8 == 0
        ), "tile_h/raster_sub_y must be a multiple of 8"


DEFAULT_CONFIG = EngineConfig()
