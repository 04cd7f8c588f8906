"""Deferred shading + skybox — the fused equivalent of the reference's
two-subpass shading render pass (shading_pass.rs, shading_pass.frag,
skybox inline shaders :340-401).

Per pixel: Cook-Torrance sum over lights (pbr.glsl surfaceShading), split-
sum IBL ambient, 9-tap Poisson PCF shadow with bias 5e-6 and intensity mix
0.25, ``color = (ambient + Lo*shadow) * ssao + emissive``, Unreal tonemap.
The skybox fills depth==1 pixels by sampling the environment cubemap along
the reconstructed near-plane ray (skybox_fs, shading_pass.rs:363-401).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..device import sampling
from ..kernels import brdf
from ..kernels.tonemap import tonemap_unreal

# Poisson disk (shading_pass.frag:44-54)
POISSON = [
    (-0.94201624, -0.39906216),
    (0.94558609, -0.76890725),
    (-0.094184101, -0.92938870),
    (0.34495938, 0.29387760),
    (-0.91588581, 0.45771432),
    (-0.81544232, -0.87912464),
    (-0.38277543, 0.27676845),
    (0.97484398, 0.75648379),
    (0.44323325, -0.97511554),
]
SHADOW_BIAS = 0.000005  # shading_pass.frag:67
SHADOW_INTENSITY = 0.25  # shading_pass.frag:82
MAX_REFLECTION_LOD = 7.0  # pbr.glsl:262


def calculate_shadow(world_pos, light_proj_view, shadow_map):
    """CalculateShadow (shading_pass.frag:56-84).

    world_pos (H, W, 3); shadow_map (S, S) depth.  Returns (H, W) factor.
    """
    p = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], -1)
    lp = p @ light_proj_view.T
    wc = jnp.where(jnp.abs(lp[..., 3]) > 1e-20, lp[..., 3], 1.0)
    proj = lp[..., :3] / wc[..., None]
    uv = proj[..., :2] * 0.5 + 0.5
    beyond_far = proj[..., 2] > 1.0

    current = proj[..., 2] - SHADOW_BIAS
    s = shadow_map.shape[0]
    texel = 1.0 / s
    sm = shadow_map[..., None]  # (S, S, 1) for the sampling helpers

    shadow = jnp.zeros_like(current)
    for dx, dy in POISSON:
        tap_uv = jnp.stack(
            [uv[..., 0] + dx * texel, uv[..., 1] + dy * texel], axis=-1
        )
        closest = sampling.sample_bilinear(sm, tap_uv, sampling.CLAMP_TO_EDGE)[..., 0]
        shadow = shadow + (current > closest).astype(jnp.float32)
    shadow = shadow / len(POISSON)
    result = (1.0 - shadow) * (1.0 - SHADOW_INTENSITY) + SHADOW_INTENSITY
    return jnp.where(beyond_far, 1.0, result)


def shade_lights(gbuf, lights, num_lights, eye_pos, static_count=None):
    """Sum surfaceShading over the light table (masked static loop).

    static_count: host-known live-light count (Renderer.prepare reads it
    once) — shrinks the unrolled loop from max_lights (16) to the actual
    count; the mask still guards against a stale count."""
    lo = jnp.zeros_like(gbuf.base_color)
    max_lights = lights.shape[0]
    if static_count is not None:
        max_lights = min(max_lights, static_count)
    for i in range(max_lights):
        row = lights[i]
        contrib = brdf.surface_shading(
            gbuf.position,
            gbuf.base_color,
            gbuf.normal,
            gbuf.orm[..., 2],
            gbuf.orm[..., 1],
            row[0],
            row[4:7],
            row[8:11],
            row[12:15],
            row[16:20],
            eye_pos,
            spot_exponent=row[2],
        )
        lo = lo + jnp.where(i < num_lights, 1.0, 0.0) * contrib
    return lo


def ibl_ambient(gbuf, eye_pos, ibl):
    """imageBasedLighting (pbr.glsl:245-271) with our IBL maps.

    ibl: IBLResource-like with .irradiance (6,S,S,3) faces, .specular
    (MipCube), .brdf_lut (S,S,3).  Returns (H, W, 3).
    """
    irradiance = sampling.sample_cubemap(ibl.irradiance_faces, gbuf.normal)[..., :3]
    r = brdf.ibl_reflection_dir(gbuf.position, gbuf.normal, eye_pos)
    lod = gbuf.orm[..., 1] * MAX_REFLECTION_LOD
    prefiltered = sampling.sample_mipcube_lod(ibl.specular_mips, r, lod)[..., :3]
    v = brdf.normalize(eye_pos - gbuf.position, eps=1e-20)
    ndotv = jnp.maximum(brdf.dot3(gbuf.normal, v), 0.0)
    lut_uv = jnp.stack([ndotv, 1.0 - gbuf.orm[..., 1]], axis=-1)
    lut = sampling.sample_bilinear(
        ibl.brdf_lut, lut_uv, sampling.CLAMP_TO_EDGE
    )[..., :2]
    return brdf.image_based_lighting(
        gbuf.position,
        gbuf.base_color,
        gbuf.normal,
        gbuf.orm[..., 2],
        gbuf.orm[..., 1],
        gbuf.orm[..., 0],
        eye_pos,
        irradiance,
        prefiltered,
        lut,
    )


def skybox_color(height, width, camera_basis, env_faces):
    """Skybox ray reconstruction (skybox_fs shading_pass.rs:367-399).

    camera_basis: dict with direction/right/up (3,), near (scalar),
    near_wh (2,).  Returns (H, W, 3).
    """
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    y = (v * 2.0 - 1.0)[:, None, None]
    x = (u * 2.0 - 1.0)[None, :, None]
    near_w, near_h = camera_basis["near_wh"][0], camera_basis["near_wh"][1]
    d = (
        x * (near_w / 2.0) * camera_basis["right"]
        + y * (near_h / 2.0) * camera_basis["up"]
        - camera_basis["near"] * camera_basis["direction"]
    )
    d = d * jnp.reciprocal(
        jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1, keepdims=True), 1e-20))
    )
    return sampling.sample_cubemap(env_faces, d)[..., :3]


def shading_pass(
    gbuf, ssao, shadow_map, lights, num_lights, params, ibl=None
):
    """Full deferred shading to tonemapped color (H, W, 3) in [0,1].

    params: dict with eye_pos (3,), light_proj_view (4,4), camera basis
    entries for the skybox.  ibl None -> no ambient/sky (flat mode).
    """
    eye = params["eye_pos"]
    lo = shade_lights(gbuf, lights, num_lights, eye)

    if ibl is not None:
        ambient = ibl_ambient(gbuf, eye, ibl)
    else:
        ambient = jnp.zeros_like(lo)

    if shadow_map is not None:
        shadow = calculate_shadow(
            gbuf.position, params["light_proj_view"], shadow_map
        )
    else:
        shadow = jnp.ones_like(ssao)

    color = (ambient + lo * shadow[..., None]) * ssao[..., None]
    color = color + gbuf.emissive
    color = tonemap_unreal(color)

    if ibl is not None:
        sky = skybox_color(
            gbuf.depth.shape[0], gbuf.depth.shape[1], params, ibl.environment_faces
        )
        # subpass 1: skybox only where depth == 1 (CompareOp::Equal,
        # shading_pass.rs:886-892); skybox output is NOT tonemapped
        # (skybox_fs writes the sample directly)
        color = jnp.where((gbuf.depth >= 1.0)[..., None], sky, color)
    return jnp.clip(color, 0.0, 1.0)


# --- gather-minimal fast path ----------------------------------------------
#
# XLA TPU gathers cost ~7ns per index, so the naive shading pass (36 PCF
# taps + 16 IBL taps per pixel) dominates the frame.  The fast path cuts
# per-pixel gather indices from ~60 to 4:
#   PCF       : 2 wide-row fetches reconstruct the 4x4 texel window that
#               all 9 Poisson taps (|offset| <= 1 texel) live in
#   specular  : 2 (quad-packed mip chain, trilinear)
#   skybox    : 0 — sky pixels (depth==1) don't need specular, so their
#               first "specular" gather is re-pointed at the environment's
#               quad rows (appended to the same table): identical sample,
#               zero extra indices (ibl_ambient_sky_fast)
#   BRDF LUT  : 0 (fitted Chebyshev polynomial, brdf.env_brdf_poly —
#               the LUT is a universal smooth function; residual < ~6e-3)
#   irradiance: 0 (SH9 evaluation — the cosine-convolved map is order-2
#               band-limited; validated against cube sampling in tests)
# Deviation: PCF base coords clamp one texel earlier at the shadow-map
# border (a 2-texel band of the 2048^2 map).

def _select3(k, v0, v1, v2):
    """k in {0,1,2} (int array) -> elementwise select."""
    return jnp.where(k == 0, v0, jnp.where(k == 1, v1, v2))


def calculate_shadow_fast(world_pos, light_proj_view, shadow_quad_rows, s):
    """PCF from the 4x4 texel window, fetched in a single gather when
    shadow_quad_rows is the u16-packed table (sampling.build_pcf_window_u16,
    dtype uint32) or two wide-row gathers for the f32 table
    (sampling.build_window_rows_2x4); all 9 Poisson taps arithmetic."""
    p = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], -1)
    lp = p @ light_proj_view.T
    wc = jnp.where(jnp.abs(lp[..., 3]) > 1e-20, lp[..., 3], 1.0)
    proj = lp[..., :3] / wc[..., None]
    uv = proj[..., :2] * 0.5 + 0.5
    beyond_far = proj[..., 2] > 1.0
    current = proj[..., 2] - SHADOW_BIAS

    # window anchor (clamped so the 4x4 window stays on the map)
    xf = jnp.clip(uv[..., 0] * s - 0.5, 1.0, s - 3.0)
    yf = jnp.clip(uv[..., 1] * s - 0.5, 1.0, s - 3.0)
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    ax = xf - x0
    ay = yf - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if shadow_quad_rows.dtype == jnp.uint32:
        # u16-packed full window: ONE gather.  A table with (s/2)^2 rows
        # is anchored on the even texel grid only (build_pcf_window_u16_half,
        # quarter the bytes): quantize the anchor DOWN to even and shift
        # taps by the (0|1, 0|1) residual inside the fetched window.
        ya = y0i - 1
        xa = x0i - 1
        half_anchor = shadow_quad_rows.shape[0] == (s // 2) ** 2
        if half_anchor:
            idx = (ya >> 1) * (s // 2) + (xa >> 1)
        else:
            idx = ya * s + xa
        q = sampling.take_rows(shadow_quad_rows, idx)  # (..., 8) u32

        def texel(r, c):
            v = (q[..., (r * 4 + c) // 2] >> (16 * (c & 1))) & 0xFFFF
            return v.astype(jnp.float32) * (1.0 / 65535.0)

        if half_anchor:
            ry = ya & 1
            rx = xa & 1
            phys = [[texel(r, c) for c in range(4)] for r in range(4)]

            def shifted(r, c):
                # logical texel (r, c) lives at physical (r+ry, c+rx);
                # the r+ry==4 / c+rx==4 neighbors clamp to the window edge
                r1, c1 = min(r + 1, 3), min(c + 1, 3)
                a = jnp.where(rx == 0, phys[r][c], phys[r][c1])
                b = jnp.where(rx == 0, phys[r1][c], phys[r1][c1])
                return jnp.where(ry == 0, a, b)

            w_rows = [[shifted(r, c) for c in range(4)] for r in range(4)]
        else:
            w_rows = [[texel(r, c) for c in range(4)] for r in range(4)]
    else:
        def wide(dy):  # rows (y0+dy, y0+dy+1) x cols (x0-1 .. x0+2)
            idx = (y0i + dy) * s + (x0i - 1)
            return jnp.take(shadow_quad_rows, idx, axis=0)  # (..., 8)

        g_top = wide(-1)
        g_bot = wide(1)
        # W[r][c] = depth at (y0-1+r, x0-1+c), r,c in 0..3
        w_rows = [
            [g_top[..., c] for c in range(4)],
            [g_top[..., 4 + c] for c in range(4)],
            [g_bot[..., c] for c in range(4)],
            [g_bot[..., 4 + c] for c in range(4)],
        ]

    texel = 1.0 / s
    shadow = jnp.zeros_like(current)
    for dx, dy in POISSON:
        sx = ax + dx  # tap position relative to window col 1
        sy = ay + dy
        kx = jnp.floor(sx)
        ky = jnp.floor(sy)
        fx = sx - kx
        fy = sy - ky
        cx = kx.astype(jnp.int32) + 1  # window col in {0,1,2}
        cy = ky.astype(jnp.int32) + 1

        def col(r):  # (left, right) texels of row r at the tap's columns
            left = _select3(cx, w_rows[r][0], w_rows[r][1], w_rows[r][2])
            right = _select3(cx, w_rows[r][1], w_rows[r][2], w_rows[r][3])
            return left * (1 - fx) + right * fx

        rows = [col(r) for r in range(4)]
        top = _select3(cy, rows[0], rows[1], rows[2])
        bot = _select3(cy, rows[1], rows[2], rows[3])
        closest = top * (1 - fy) + bot * fy
        shadow = shadow + (current > closest).astype(jnp.float32)

    shadow = shadow / len(POISSON)
    result = (1.0 - shadow) * (1.0 - SHADOW_INTENSITY) + SHADOW_INTENSITY
    return jnp.where(beyond_far, 1.0, result)


def _even_grid(a, strides=(2, 2)):
    """a[::sy, ::sx] via a window-1 strided reduce_window.

    XLA lowers a strided SLICE to a per-index gather (~4.4ms for an
    (1088, 1920, 8) f32 at 1080p) but lowers the equivalent
    reduce_window to its pooling path, which is ~2x faster (2.1ms
    measured, bit-exact — scripts/bench_evengrid.py).  Other rejected
    lowerings: reshape+unit-slices (+10ms: forces gbuffer layout
    copies), one-hot decimation matmuls (similar speed to reduce_window
    but rounds through the MXU's reduced precision)."""
    win = (1,) * a.ndim
    st = tuple(strides) + (1,) * (a.ndim - 2)
    return jax.lax.reduce_window(
        a, jnp.zeros((), a.dtype), jax.lax.add,
        window_dimensions=win, window_strides=st, padding="VALID",
    )


def _upsample2x(a, h, w):
    """Bilinear 2x upsample aligned with ``x[::2, ::2]`` sampling (see
    _upsample_pow2)."""
    return _upsample_pow2(a, h, w, 2)


def _upsample_pow2(a, h, w, f, fx=None):
    """Bilinear upsample aligned with ``x[::f, ::fx]`` sampling: output
    (f*i, fx*j) are exact samples; in-between positions linearly
    interpolate the two neighbors per axis.  Pure slicing/arithmetic —
    no gathers.  Accepts (Hs, Ws) or (Hs, Ws, C).  fx defaults to f."""
    fx = f if fx is None else fx

    def up_axis(v, axis, fk):
        if fk == 1:
            return v
        idx = [slice(None)] * v.ndim
        idx[axis] = slice(1, None)
        last = [slice(None)] * v.ndim
        last[axis] = slice(-1, None)
        v_dn = jnp.concatenate([v[tuple(idx)], v[tuple(last)]], axis=axis)
        phases = [
            v * (1.0 - k / fk) + v_dn * (k / fk) for k in range(fk)
        ]
        st = jnp.stack(phases, axis=axis + 1)
        shape = list(v.shape)
        shape[axis] *= fk
        return st.reshape(shape)

    return up_axis(up_axis(a, 0, f), 1, fx)[:h, :w]


# --- checkerboard-domain upsamples ------------------------------------------
#
# The checkerboard shading domain (cfg.checkerboard) holds full pixels
# (y, 2j + (y&1)) in an (H, W/2) plane.  Half-res sample grids are laid on
# the FULL frame at (fy*i, 2*fxc*j) — even rows, even columns — so even cb
# rows coincide with sample columns and odd cb rows sit exactly halfway
# between two: upsampling to the cb domain = the standard per-axis
# upsample to the even-column grid, then a half-texel horizontal lerp on
# odd rows (the composition is exact bilinear — both steps are linear).

def _cb_row_odd(h, wc, extra_dims=0):
    odd = (jnp.arange(h) & 1).astype(bool)[:, None]
    return odd.reshape((h, 1) + (1,) * extra_dims)


def _upsample_to_cb(a, h, wc, fy, fxc):
    """Samples at full (fy*i, 2*fxc*j) -> cb-domain (h, wc) values."""
    g = _upsample_pow2(a, h, wc, fy, fxc)  # values at full (y, 2j)
    gr = jnp.concatenate([g[:, 1:], g[:, -1:]], axis=1)
    odd = _cb_row_odd(h, wc, a.ndim - 2)
    return jnp.where(odd, 0.5 * (g + gr), g)


def _upsample_to_cb_mask_aware(vals_h, mask_h, mask_cb, h, wc):
    """_upsample_to_cb for the (fy=2, fxc=1) grid, except where the four
    contributing samples straddle a mask boundary: there the nearest
    sample whose mask matches the cb pixel's mask is used instead.  Even
    cb rows are exact sample points (no blending, no fallback needed —
    phase (0, 0) is the identity there)."""
    up = _upsample_to_cb(vals_h, h, wc, 2, 1)

    def nn(a, dy, dx):
        # cb pixel (y, j) reads sample a[y//2 + dy, j + dx]
        if dy:
            a = jnp.concatenate([a[dy:], a[-1:]], axis=0)
        if dx:
            a = jnp.concatenate([a[:, dx:], a[:, -1:]], axis=1)
        return jnp.repeat(a, 2, axis=0)[:h, :wc]

    mask_f = mask_h.astype(jnp.float32)
    phases = [(0, 0), (0, 1), (1, 0), (1, 1)]
    ms = [nn(mask_f, dy, dx) > 0.5 for dy, dx in phases]
    uniform = (ms[0] == ms[1]) & (ms[0] == ms[2]) & (ms[0] == ms[3])

    res = up
    done = jnp.zeros_like(mask_cb)
    for (dy, dx), m in zip(phases, ms):
        use = (~uniform) & (~done) & (m == mask_cb)
        res = jnp.where(use[..., None], nn(vals_h, dy, dx), res)
        done = done | use
    return res


def half_res_geometry(gbuf, cb=False):
    """Even-grid (position, normal, roughness, depth) planes.

    Strided slicing via ``_even_grid`` takes XLA's pooling path and is
    bandwidth-bound (~26us/plane, scripts/bench_decimate.py), so each
    plane decimates separately — the earlier share-one-concatenated-
    slice trick dated from when slices lowered to per-index gathers,
    and its (H, W, 8) concat materialization cost more (0.39ms) than
    it saved.

    cb=True: gbuf lives on the checkerboard domain (H, W/2); its even
    ROWS hold exactly the full frame's (2i, 2j) pixels, so the same
    even grid is a (2, 1) stride there."""
    st = (2, 1) if cb else (2, 2)
    return (
        _even_grid(gbuf.position, st),
        _even_grid(gbuf.normal, st),
        _even_grid(gbuf.orm[..., 1], st),
        _even_grid(gbuf.depth, st),
    )


def _upsample2x_mask_aware(vals_h, mask_h, mask_full, h, w):
    """Bilinear 2x upsample of vals_h, except where the four contributing
    samples straddle a mask boundary: there the nearest sample whose mask
    matches the full-res pixel's mask is used instead (no cross-domain
    blending — e.g. sky color bleeding into surface specular)."""
    up = _upsample_pow2(vals_h, h, w, 2)

    def nn(a, dy, dx):
        # nearest-phase upsample: full pixel (y, x) reads a[y//2+dy, x//2+dx]
        if dy:
            a = jnp.concatenate([a[dy:], a[-1:]], axis=0)
        if dx:
            a = jnp.concatenate([a[:, dx:], a[:, -1:]], axis=1)
        r = jnp.repeat(jnp.repeat(a, 2, axis=0), 2, axis=1)
        return r[:h, :w]

    mask_f = mask_h.astype(jnp.float32)
    phases = [(0, 0), (0, 1), (1, 0), (1, 1)]
    ms = [nn(mask_f, dy, dx) > 0.5 for dy, dx in phases]
    uniform = (ms[0] == ms[1]) & (ms[0] == ms[2]) & (ms[0] == ms[3])

    res = up
    done = jnp.zeros_like(mask_full)
    for (dy, dx), m in zip(phases, ms):
        use = (~uniform) & (~done) & (m == mask_full)
        res = jnp.where(use[..., None], nn(vals_h, dy, dx), res)
        done = done | use
    return res


def calculate_shadow_fast_half(pos_half, full_hw, light_proj_view,
                               shadow_quad_rows, s, divisor=2, cb=False):
    """PCF factor evaluated on a strided pixel grid and bilinearly
    upsampled: divisor^2-fold fewer gather indices.  The factor field is
    smooth except across penumbra edges (which PCF itself already blurs
    over ~2 shadow texels), so the upsample costs a slightly wider
    penumbra; positions are point-sampled (no silhouette mixing at
    sample points).  pos_half is the SHARED even-grid position plane;
    divisor=4 subsamples it once more.

    cb=True: full_hw is the checkerboard domain (H, W/2); pos_half holds
    the same full-frame even grid either way, so only the upsample's
    target geometry changes."""
    h, w = full_hw
    if divisor == 4:
        pos_half = _even_grid(pos_half)
    factor = calculate_shadow_fast(
        pos_half, light_proj_view, shadow_quad_rows, s
    )
    if cb:
        return _upsample_to_cb(factor, h, w, divisor, divisor // 2)
    return _upsample_pow2(factor, h, w, divisor)


def ibl_ambient_fast(gbuf, eye_pos, ibl):
    """Split-sum ambient with SH irradiance + quad-packed maps (2 gathers)."""
    from ..kernels.ibl import sh9_eval

    irradiance = sh9_eval(ibl.irradiance_sh9, gbuf.normal)
    r = brdf.ibl_reflection_dir(gbuf.position, gbuf.normal, eye_pos)
    lod = gbuf.orm[..., 1] * MAX_REFLECTION_LOD
    prefiltered = sampling.sample_mipcube_quad_lod(ibl.specular_quad, r, lod)
    v = brdf.normalize(eye_pos - gbuf.position, eps=1e-20)
    ndotv = jnp.maximum(brdf.dot3(gbuf.normal, v), 0.0)
    lut = brdf.env_brdf_poly(ndotv, gbuf.orm[..., 1])
    return brdf.image_based_lighting(
        gbuf.position, gbuf.base_color, gbuf.normal,
        gbuf.orm[..., 2], gbuf.orm[..., 1], gbuf.orm[..., 0],
        eye_pos, irradiance, prefiltered, lut,
    )


def _sky_dirs(height, width, camera_basis, stride: int = 1,
              row_offset: int = 0, full_height: int | None = None):
    """Per-pixel skybox ray directions (skybox_fs near-plane basis).

    stride > 1 evaluates only pixels (stride*i, stride*j) of the full
    height x width grid (for half-res consumers).  For row-sharded
    rendering, row_offset/full_height give this band's place in the
    full frame."""
    fh = height if full_height is None else full_height
    v = (
        jnp.arange(height // stride, dtype=jnp.float32) * stride
        + row_offset + 0.5
    ) / fh
    u = (jnp.arange(width // stride, dtype=jnp.float32) * stride + 0.5) / width
    y = (v * 2.0 - 1.0)[:, None, None]
    x = (u * 2.0 - 1.0)[None, :, None]
    near_w, near_h = camera_basis["near_wh"][0], camera_basis["near_wh"][1]
    d = (
        x * (near_w / 2.0) * camera_basis["right"]
        + y * (near_h / 2.0) * camera_basis["up"]
        - camera_basis["near"] * camera_basis["direction"]
    )
    return d * jnp.reciprocal(
        jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1, keepdims=True), 1e-20))
    )


def _env_quad_index(ibl, dirs):
    """Quad-row index + fractions for the environment sample, served from
    the specular table's mip-0 region (mip 0 IS the environment —
    kernels/ibl.specular_prefilter packs the mirror level first)."""
    s = int(ibl.specular_quad.sizes[0])
    env_off = int(ibl.specular_quad.offsets[0])
    face, u, v = sampling.cube_face_uv(dirs)
    uv = jnp.stack([u, v], axis=-1)
    idx, fx, fy = sampling.bilinear_weights(uv, s, s, sampling.CLAMP_TO_EDGE)
    return env_off + face * (s * s) + idx, fx, fy


def skybox_color_fast(height, width, camera_basis, ibl):
    """Skybox via quad-packed environment rows: ONE gather per pixel.

    (Kept for standalone use/benchmarks; the frame path gets the sky for
    free inside ibl_ambient_sky_fast.)"""
    d = _sky_dirs(height, width, camera_basis)
    idx, fx, fy = _env_quad_index(ibl, d)
    quad = jnp.take(ibl.specular_quad.rows, idx, axis=0)
    return sampling.quad_lerp_rgbe(quad, fx, fy)


def ibl_ambient_sky_fast(gbuf, eye_pos, ibl, camera_basis,
                         parent_mip_half_res=False, half_geo=None,
                         mirror_half_res=False, merged_trilinear=False,
                         row_offset=0, full_height=None, cb=False):
    """Ambient AND sky from the same two trilinear gathers.

    Sky pixels (depth==1) need an environment sample but no specular;
    surface pixels need specular but no sky.  The environment lives in
    the mip-0 region of the specular table (mip 0 IS the mirror level),
    so the first specular gather's indices are re-pointed there for sky
    pixels — bit-identical samples, zero additional gather indices.

    parent_mip_half_res: evaluate the COARSER trilinear tap (c1, mip
    l0+1) on the even-pixel grid and upsample — that mip is band-limited
    by construction, so the upsample is nearly lossless and the second
    gather stream shrinks 4x.

    merged_trilinear (needs both half-res flags): fetch BOTH trilinear
    taps in ONE 32-byte-row gather from the child+parent pair table
    (sampling.MipCubeQuadMerged) — halves the remaining trilinear index
    stream for a 1/4-parent-texel shift of the coarse tap.

    Returns (ambient (H,W,3), sky (H,W,3), sky_mask (H,W) bool).
    """
    from ..kernels.ibl import sh9_eval

    mq = ibl.specular_quad
    sizes = jnp.asarray(mq.sizes)
    offsets = jnp.asarray(mq.offsets)

    # full-res lerp weight between the two mip taps
    lod = jnp.clip(gbuf.orm[..., 1] * MAX_REFLECTION_LOD, 0.0, mq.num_levels - 1)
    l0 = jnp.floor(lod).astype(jnp.int32)
    f = (lod - l0.astype(lod.dtype))[..., None]
    sky_mask = gbuf.depth >= 1.0
    h, w = gbuf.depth.shape
    # on the checkerboard domain, w is the half width; sky-ray x
    # coordinates must be computed against the FULL frame width
    sky_w = 2 * w if cb else w
    if cb and not mirror_half_res:
        raise NotImplementedError(
            "checkerboard shading requires spec_mirror_half_res (full-res "
            "sky rays are not evaluated on the cb domain)"
        )

    if mirror_half_res and half_geo is None:
        half_geo = half_res_geometry(gbuf, cb=cb)

    merged = (
        merged_trilinear and mirror_half_res and parent_mip_half_res
        and getattr(ibl, "specular_quad_merged", None) is not None
    )
    c1 = None

    if mirror_half_res:
        # mirror tap + sky on the even-pixel grid, upsampled: the env
        # cubemap is 512^2/face (already soft at 1080p).  Costs a ~1px
        # blend across the sky/surface silhouette.
        pos_h, n_h, rough_h, depth_h = half_geo
        rh = brdf.ibl_reflection_dir(pos_h, n_h, eye_pos)
        lodh = jnp.clip(
            rough_h * MAX_REFLECTION_LOD, 0.0, mq.num_levels - 1
        )
        l0h = jnp.floor(lodh).astype(jnp.int32)
        fh, uh, vh = sampling.cube_face_uv(rh)
        idx0, fx0, fy0, x0i, y0i = sampling.mipcube_quad_index_anchor(
            sizes, offsets, l0h, fh, uh, vh
        )
        sky_h = depth_h >= 1.0
        dh = _sky_dirs(h, sky_w, camera_basis, stride=2,
                       row_offset=row_offset, full_height=full_height)
        eidx, efx, efy = _env_quad_index(ibl, dh)
        idx0 = jnp.where(sky_h, eidx, idx0)
        fx0 = jnp.where(sky_h, efx, fx0)
        fy0 = jnp.where(sky_h, efy, fy0)
        if merged:
            # ONE 32-byte-row gather: child quad + parent quad; the
            # parent's fractions derive from the child anchor parity
            # (sky pixels' parent lanes are garbage — masked via f)
            rows8 = sampling.take_rows(ibl.specular_quad_merged.rows, idx0)
            c0h = sampling.quad_lerp_rgbe(rows8[..., :4], fx0, fy0)
            last = l0h >= mq.num_levels - 1
            fpx = jnp.where(
                last, fx0, ((x0i & 1).astype(fx0.dtype) + fx0) * 0.5
            )
            fpy = jnp.where(
                last, fy0, ((y0i & 1).astype(fy0.dtype) + fy0) * 0.5
            )
            c1h = sampling.quad_lerp_rgbe(rows8[..., 4:], fpx, fpy)
            c1 = (_upsample_to_cb(c1h, h, w, 2, 1) if cb
                  else _upsample2x(c1h, h, w))
        else:
            c0h = sampling.quad_lerp_rgbe(
                sampling.take_rows(mq.rows, idx0), fx0, fy0
            )
        if cb:
            c0 = _upsample_to_cb_mask_aware(c0h, sky_h, sky_mask, h, w)
        else:
            c0 = _upsample2x_mask_aware(c0h, sky_h, sky_mask, h, w)
    else:
        # specular trilinear indices (sample_mipcube_quad_lod, split
        # open); sky pixels re-point gather 0 at the environment rows
        r = brdf.ibl_reflection_dir(gbuf.position, gbuf.normal, eye_pos)
        face, u, v = sampling.cube_face_uv(r)
        idx0, fx0, fy0 = sampling.mipcube_quad_index(
            sizes, offsets, l0, face, u, v
        )
        d = _sky_dirs(h, w, camera_basis,
                      row_offset=row_offset, full_height=full_height)
        eidx, efx, efy = _env_quad_index(ibl, d)
        idx0 = jnp.where(sky_mask, eidx, idx0)
        fx0 = jnp.where(sky_mask, efx, fx0)
        fy0 = jnp.where(sky_mask, efy, fy0)
        c0 = sampling.quad_lerp_rgbe(
            sampling.take_rows(mq.rows, idx0), fx0, fy0
        )

    if parent_mip_half_res and c1 is None:
        if half_geo is None:
            half_geo = half_res_geometry(gbuf, cb=cb)
        pos_h, n_h, rough_h = half_geo[:3]
        r2 = brdf.ibl_reflection_dir(pos_h, n_h, eye_pos)
        lod2 = jnp.clip(
            rough_h * MAX_REFLECTION_LOD, 0.0, mq.num_levels - 1
        )
        l1h = jnp.minimum(
            jnp.floor(lod2).astype(jnp.int32) + 1, mq.num_levels - 1
        )
        f2, u2, v2 = sampling.cube_face_uv(r2)
        idx1, fx1, fy1 = sampling.mipcube_quad_index(
            sizes, offsets, l1h, f2, u2, v2
        )
        c1h = sampling.quad_lerp_rgbe(sampling.take_rows(mq.rows, idx1), fx1, fy1)
        c1 = (_upsample_to_cb(c1h, h, w, 2, 1) if cb
              else _upsample2x(c1h, h, w))
    elif c1 is None:
        r1 = brdf.ibl_reflection_dir(gbuf.position, gbuf.normal, eye_pos)
        face1, u1, v1 = sampling.cube_face_uv(r1)  # CSE'd with c0's
        l1 = jnp.minimum(l0 + 1, mq.num_levels - 1)
        idx1, fx1, fy1 = sampling.mipcube_quad_index(
            sizes, offsets, l1, face1, u1, v1
        )
        c1 = sampling.quad_lerp_rgbe(sampling.take_rows(mq.rows, idx1), fx1, fy1)

    prefiltered = c0 * (1 - f) + c1 * f  # garbage at sky pixels (masked out)
    sky = c0

    irradiance = sh9_eval(ibl.irradiance_sh9, gbuf.normal)
    veye = brdf.normalize(eye_pos - gbuf.position, eps=1e-20)
    ndotv = jnp.maximum(brdf.dot3(gbuf.normal, veye), 0.0)
    lut = brdf.env_brdf_poly(ndotv, gbuf.orm[..., 1])
    ambient = brdf.image_based_lighting(
        gbuf.position, gbuf.base_color, gbuf.normal,
        gbuf.orm[..., 2], gbuf.orm[..., 1], gbuf.orm[..., 0],
        eye_pos, irradiance, prefiltered, lut,
    )
    return ambient, sky, sky_mask


def shading_pass_fast(
    gbuf, ssao, shadow_quad_rows, shadow_size, lights, num_lights,
    params, ibl=None, shadow_res_divisor=1, static_light_count=None,
    parent_mip_half_res=False, mirror_half_res=False,
    merged_trilinear=False, row_offset=0, full_height=None, cb=False,
):
    """shading_pass with the gather-minimal samplers (same semantics).

    cb=True: gbuf (and ssao) live on the checkerboard domain — an
    (H, W/2) plane holding full pixels (y, 2j + (y&1)).  All half-res
    sample grids stay anchored to the FULL frame's even grid (the cb
    domain's even rows), so tap densities match the non-cb frame; only
    the upsample target geometry changes.  Requires mirror_half_res
    when ibl is given.  With row sharding, row_offset must be EVEN
    (bands start on tile_h multiples) so local row parity equals the
    global checkerboard phase."""
    eye = params["eye_pos"]
    lo = shade_lights(gbuf, lights, num_lights, eye,
                      static_count=static_light_count)

    # one shared even-grid slice feeds every half-res consumer
    need_half = (
        shadow_res_divisor > 1 and shadow_quad_rows is not None
    ) or (ibl is not None and (parent_mip_half_res or mirror_half_res))
    half_geo = half_res_geometry(gbuf, cb=cb) if need_half else None

    if ibl is not None:
        ambient, sky, sky_mask = ibl_ambient_sky_fast(
            gbuf, eye, ibl, params,
            parent_mip_half_res=parent_mip_half_res, half_geo=half_geo,
            mirror_half_res=mirror_half_res,
            merged_trilinear=merged_trilinear,
            row_offset=row_offset, full_height=full_height, cb=cb,
        )
    else:
        ambient = jnp.zeros_like(lo)

    if shadow_quad_rows is not None:
        if shadow_res_divisor > 1:
            shadow = calculate_shadow_fast_half(
                half_geo[0], gbuf.depth.shape, params["light_proj_view"],
                shadow_quad_rows, shadow_size,
                divisor=shadow_res_divisor, cb=cb,
            )
        else:
            shadow = calculate_shadow_fast(
                gbuf.position, params["light_proj_view"],
                shadow_quad_rows, shadow_size,
            )
    else:
        shadow = jnp.ones_like(ssao)

    color = (ambient + lo * shadow[..., None]) * ssao[..., None]
    color = color + gbuf.emissive
    color = tonemap_unreal(color)

    if ibl is not None:
        # subpass 1: skybox only where depth == 1 (CompareOp::Equal); the
        # skybox sample is NOT tonemapped (skybox_fs writes it directly)
        color = jnp.where(sky_mask[..., None], sky, color)
    return jnp.clip(color, 0.0, 1.0)
