"""Texture sampling library — the TPU replacement for fixed-function
samplers (mo_ecs/src/resource/global_samplers.rs, mo_vk/src/texture.rs).

On TPU, sampling is a gather: every routine here is pure jax.numpy over
batched pixel arrays.  Conventions follow GLSL ``texture()``:

- texel centers at ``(i + 0.5) / N``; uv (0,0) samples the first row/col
  (row 0 = top, matching the byte order Vulkan uploads see).
- bilinear filtering with per-axis address modes clamp/repeat/mirror
  (global_samplers.rs:13-54).
- cube faces are ordered +X,-X,+Y,-Y,+Z,-Z with the GL coordinate
  convention — identical to the reference's IBL ``getDirection`` table
  (resources/shaders/ibl/cubemap_brdflut.comp:141-153, which matches the
  GL spec exactly).
- mip chains are packed flat (``MipCube``) so per-pixel LOD selection is
  integer offset math + gathers: no per-mip control flow under jit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Address modes (match assets/samplers.py AddressMode).
CLAMP_TO_EDGE = 0
REPEAT = 1
MIRRORED_REPEAT = 2


def wrap_index(i, n: int, mode: int):
    """Wrap integer texel index i into [0, n) per address mode."""
    if mode == REPEAT:
        return jnp.mod(i, n)
    if mode == MIRRORED_REPEAT:
        period = 2 * n
        m = jnp.mod(i, period)
        return jnp.where(m < n, m, period - 1 - m)
    return jnp.clip(i, 0, n - 1)


def _gather2d(tex, iy, ix):
    """tex (H, W, C); iy/ix int arrays (...,) -> (..., C)."""
    h, w, c = tex.shape
    flat = tex.reshape(h * w, c)
    return jnp.take(flat, iy * w + ix, axis=0)


def sample_nearest(tex, uv, mode: int = CLAMP_TO_EDGE):
    """Nearest-neighbor sample; uv (..., 2) -> (..., C)."""
    h, w, _ = tex.shape
    ix = wrap_index(jnp.floor(uv[..., 0] * w).astype(jnp.int32), w, mode)
    iy = wrap_index(jnp.floor(uv[..., 1] * h).astype(jnp.int32), h, mode)
    return _gather2d(tex, iy, ix)


def texel_fetch(tex, iy, ix):
    """GLSL texelFetch with clamped coords (used by SSAO, ssao.comp:122)."""
    h, w, _ = tex.shape
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    return _gather2d(tex, iy, ix)


def sample_bilinear(tex, uv, mode: int = CLAMP_TO_EDGE):
    """GLSL-style bilinear sample; tex (H, W, C), uv (..., 2) -> (..., C)."""
    h, w, _ = tex.shape
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x0w = wrap_index(x0i, w, mode)
    x1w = wrap_index(x0i + 1, w, mode)
    y0w = wrap_index(y0i, h, mode)
    y1w = wrap_index(y0i + 1, h, mode)
    t00 = _gather2d(tex, y0w, x0w)
    t10 = _gather2d(tex, y0w, x1w)
    t01 = _gather2d(tex, y1w, x0w)
    t11 = _gather2d(tex, y1w, x1w)
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def sample_array_bilinear(tex_array, layer, uv, mode: int = CLAMP_TO_EDGE):
    """Bilinear sample from a texture array (the bindless analog).

    tex_array (L, S, S, C); layer int (...,); uv (..., 2) -> (..., C).
    All layers share one size, so the 4 taps become gathers into the flat
    (L*S*S, C) buffer — one coherent gather stream per tap.
    """
    n_layers, h, w, c = tex_array.shape
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x0w = wrap_index(x0i, w, mode)
    x1w = wrap_index(x0i + 1, w, mode)
    y0w = wrap_index(y0i, h, mode)
    y1w = wrap_index(y0i + 1, h, mode)
    flat = tex_array.reshape(n_layers * h * w, c)
    base = layer.astype(jnp.int32) * (h * w)
    is_unorm8 = tex_array.dtype == jnp.uint8

    def tap(iy, ix):
        v = jnp.take(flat, base + iy * w + ix, axis=0)
        if is_unorm8:
            v = v.astype(jnp.float32) * (1.0 / 255.0)
        return v

    t00 = tap(y0w, x0w)
    t10 = tap(y0w, x1w)
    t01 = tap(y1w, x0w)
    t11 = tap(y1w, x1w)
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


# --- cube maps -----------------------------------------------------------

def cube_direction(face: int, uv):
    """Face+uv -> direction, the reference's getDirection table
    (ibl/cubemap_brdflut.comp:141-153).  uv in [0,1]^2, returns (..., 3)."""
    u = uv[..., 0] * 2.0 - 1.0
    v = uv[..., 1] * 2.0 - 1.0
    one = jnp.ones_like(u)
    tables = [
        lambda: jnp.stack([one, -v, -u], -1),     # +X right
        lambda: jnp.stack([-one, -v, u], -1),     # -X left
        lambda: jnp.stack([u, one, v], -1),       # +Y up
        lambda: jnp.stack([u, -one, -v], -1),     # -Y down
        lambda: jnp.stack([u, -v, one], -1),      # +Z front
        lambda: jnp.stack([-u, -v, -one], -1),    # -Z back
    ]
    return tables[face]()


def cube_face_uv(dirs):
    """Direction (..., 3) -> (face int, u, v) — inverse of cube_direction,
    i.e. the GL cube sampling rule used by samplerCube in the shaders."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    # face selection by dominant axis
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(
        is_x,
        jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    ).astype(jnp.int32)
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-20)
    # sc/tc per GL spec (identical to inverting cube_direction)
    sc = jnp.where(
        is_x,
        jnp.where(x >= 0, -z, z),
        jnp.where(is_y, x, jnp.where(z >= 0, x, -x)),
    )
    tc = jnp.where(is_y, jnp.where(y >= 0, z, -z), -y)
    u = 0.5 * (sc / ma + 1.0)
    v = 0.5 * (tc / ma + 1.0)
    return face, u, v


def sample_cubemap(faces, dirs):
    """Bilinear cubemap sample (clamped at face edges, no seam blending).

    faces (6, S, S, C); dirs (..., 3) -> (..., C).
    """
    _, s, _, c = faces.shape
    face, u, v = cube_face_uv(dirs)
    x = u * s - 0.5
    y = v * s - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, s - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, s - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, s - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, s - 1)
    flat = faces.reshape(6 * s * s, c)
    base = face * (s * s)

    def tap(iy, ix):
        return jnp.take(flat, base + iy * s + ix, axis=0)

    t00 = tap(y0i, x0i)
    t10 = tap(y0i, x1i)
    t01 = tap(y1i, x0i)
    t11 = tap(y1i, x1i)
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


import jax


@jax.tree_util.register_pytree_node_class
class MipCube:
    """A cubemap mip chain packed into one flat texel buffer.

    ``data``: (total_texels, C) with mip m occupying
    ``offsets[m] : offsets[m] + 6*sizes[m]^2`` in face-major, row-major
    order.  Per-pixel trilinear LOD needs only integer offset math +
    gathers — no per-mip branches under jit.
    """

    def __init__(self, mips=None, _data=None, _sizes=None, _offsets=None):
        """mips: list of (6, S, S, C) arrays, S halving each level."""
        if mips is None:
            self.data = _data
            self.sizes = np.asarray(_sizes, np.int32)
            self.offsets = np.asarray(_offsets, np.int32)
            self.num_levels = len(self.sizes)
            return
        self.num_levels = len(mips)
        self.sizes = np.array([m.shape[1] for m in mips], dtype=np.int32)
        offs = np.zeros(len(mips), dtype=np.int32)
        acc = 0
        for i, m in enumerate(mips):
            offs[i] = acc
            acc += 6 * m.shape[1] * m.shape[1]
        self.offsets = offs
        c = mips[0].shape[-1]
        self.data = jnp.concatenate([jnp.asarray(m).reshape(-1, c) for m in mips], axis=0)

    def level(self, m: int):
        s = int(self.sizes[m])
        o = int(self.offsets[m])
        c = self.data.shape[-1]
        return self.data[o : o + 6 * s * s].reshape(6, s, s, c)

    def tree_flatten(self):
        return (self.data,), (tuple(self.sizes.tolist()), tuple(self.offsets.tolist()))

    @classmethod
    def tree_unflatten(cls, aux, children):
        sizes, offsets = aux
        return cls(_data=children[0], _sizes=sizes, _offsets=offsets)


def _sample_mipcube_level(data, sizes, offsets, level, face, u, v):
    """Bilinear sample at integer mip `level` (per-pixel int array)."""
    s = jnp.take(sizes, level)
    off = jnp.take(offsets, level)
    x = u * s - 0.5
    y = v * s - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, s - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, s - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, s - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, s - 1)
    base = off + face * s * s

    def tap(iy, ix):
        return jnp.take(data, base + iy * s + ix, axis=0)

    t00 = tap(y0i, x0i)
    t10 = tap(y0i, x1i)
    t01 = tap(y1i, x0i)
    t11 = tap(y1i, x1i)
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def sample_mipcube_lod(mipcube: MipCube, dirs, lod):
    """GLSL textureLod on a cubemap: trilinear between mip levels.

    dirs (..., 3); lod (...,) float -> (..., C).
    """
    sizes = jnp.asarray(mipcube.sizes)
    offsets = jnp.asarray(mipcube.offsets)
    nl = mipcube.num_levels
    face, u, v = cube_face_uv(dirs)
    lod = jnp.clip(lod, 0.0, nl - 1)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, nl - 1)
    f = (lod - l0.astype(lod.dtype))[..., None]
    c0 = _sample_mipcube_level(mipcube.data, sizes, offsets, l0, face, u, v)
    c1 = _sample_mipcube_level(mipcube.data, sizes, offsets, l1, face, u, v)
    return c0 * (1 - f) + c1 * f


# --- quad-packed layouts ---------------------------------------------------
#
# XLA's TPU gather costs ~7ns per INDEX regardless of row width (up to
# ~16 elements), so a bilinear sample as 4 scalar taps is 4x the price of
# one row fetch.  Quad packing stores every texel's 2x2 neighborhood
# (t(y,x), t(y,x+1), t(y+1,x), t(y+1,x+1)) contiguously — with the wrap
# mode baked into the neighbors — so a bilinear sample is ONE row gather
# plus elementwise weights.  4x memory for ~4x fewer gather indices.

def build_quad_rows(tex, mode: int = CLAMP_TO_EDGE):
    """(H, W, C) -> (H*W, 4*C) quad rows with wrap baked in.

    Row (y*W + x) = concat(t[y,x], t[y,xp], t[yp,x], t[yp,xp]) where
    xp/yp are the +1 neighbors under ``mode``.
    """
    h, w, c = tex.shape
    if mode == MIRRORED_REPEAT:
        raise NotImplementedError("quad rows: clamp/repeat only")
    if mode == REPEAT:
        xs = jnp.roll(tex, -1, axis=1)
        ys = jnp.roll(tex, -1, axis=0)
        xys = jnp.roll(xs, -1, axis=0)
    else:  # clamp
        xs = jnp.concatenate([tex[:, 1:], tex[:, -1:]], axis=1)
        ys = jnp.concatenate([tex[1:], tex[-1:]], axis=0)
        xys = jnp.concatenate([xs[1:], xs[-1:]], axis=0)
    return jnp.concatenate([tex, xs, ys, xys], axis=-1).reshape(h * w, 4 * c)


def bilinear_weights(uv, h: int, w: int, mode: int = CLAMP_TO_EDGE):
    """uv (..., 2) -> (row_index (...), fx (...), fy (...)) for quad rows."""
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    if mode == CLAMP_TO_EDGE:
        # below-range coords clamp BOTH taps to texel 0: kill the lerp
        # toward the quad's +1 neighbor (above-range is handled by the
        # quad build, whose edge rows duplicate the last texel).
        fx = jnp.where(x0 < 0, 0.0, fx)
        fy = jnp.where(y0 < 0, 0.0, fy)
    x0i = wrap_index(x0.astype(jnp.int32), w, mode)
    y0i = wrap_index(y0.astype(jnp.int32), h, mode)
    return y0i * w + x0i, fx, fy


def quad_lerp(quad, fx, fy, c: int):
    """quad (..., 4*C) + fractional weights -> bilinear result (..., C)."""
    t00 = quad[..., 0 * c : 1 * c]
    t10 = quad[..., 1 * c : 2 * c]
    t01 = quad[..., 2 * c : 3 * c]
    t11 = quad[..., 3 * c : 4 * c]
    fx = fx[..., None]
    fy = fy[..., None]
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def sample_quad_rows(rows, uv, h: int, w: int, c: int,
                     mode: int = CLAMP_TO_EDGE, base=None):
    """Bilinear sample from quad rows: ONE gather per sample.

    rows (N, 4*C) from build_quad_rows (N = H*W, or a concatenation of
    layers with ``base`` giving per-sample row offsets)."""
    idx, fx, fy = bilinear_weights(uv, h, w, mode)
    if base is not None:
        idx = idx + base
    quad = jnp.take(rows, idx, axis=0)
    if rows.dtype == jnp.uint8:
        quad = quad.astype(jnp.float32) * (1.0 / 255.0)
    return quad_lerp(quad, fx, fy, c)


def build_window_rows_2x4(img):
    """(H, W) -> (H*W, 8) rows [t(y, x..x+3), t(y+1, x..x+3)] (clamped).

    Two of these rows (at y-1 and y+1, column x-1) reconstruct the full
    4x4 neighborhood of texel (y, x) — the PCF footprint — in 2 gathers.
    """
    def shift_x(t, k):
        if k == 0:
            return t
        return jnp.concatenate([t[:, k:], jnp.repeat(t[:, -1:], k, axis=1)], axis=1)

    def shift_y(t):
        return jnp.concatenate([t[1:], t[-1:]], axis=0)

    rows0 = [shift_x(img, k) for k in range(4)]
    down = shift_y(img)
    rows1 = [shift_x(down, k) for k in range(4)]
    return jnp.stack(rows0 + rows1, axis=-1).reshape(-1, 8)


def take_rows(table, idx):
    """Row gather (``jnp.take(..., axis=0)``) that PROMISES in-bounds
    indices: drops the clamp/select XLA's default clip mode folds into
    every gather fusion.  Only for call sites whose index builders
    already clamp or wrap (bilinear_weights, mipcube_quad_index, the
    PCF window anchor, raster tri ids)."""
    return table.at[idx].get(mode="promise_in_bounds")


def build_pcf_window_u16(img):
    """(H, W) depth -> (H*W, 8) uint32: texel (y, x)'s full 4x4 window
    (rows y..y+3, cols x..x+3, edge-clamped), ceil-quantized to 16-bit
    unorm and packed in row-major pairs.

    ONE 32-byte row gather at (y-1, x-1) reconstructs the whole PCF
    footprint — half the gather cost of the two f32 wide rows
    (build_window_rows_2x4).  Ceil quantization only ever *raises* the
    stored occluder depth (by < 1/65535), which biases the compare toward
    "lit" exactly like the shadow raster's own depth bias — no acne; the
    shadow boundary can shift by at most one 1.5e-5 depth quantum.
    """
    q = jnp.minimum(
        jnp.ceil(jnp.clip(img, 0.0, 1.0) * 65535.0), 65535.0
    ).astype(jnp.uint32)

    def shift_x(t, k):
        if k == 0:
            return t
        return jnp.concatenate(
            [t[:, k:], jnp.repeat(t[:, -1:], k, axis=1)], axis=1
        )

    def shift_y(t, k):
        if k == 0:
            return t
        return jnp.concatenate([t[k:], jnp.repeat(t[-1:], k, axis=0)], axis=0)

    vals = []
    for r in range(4):
        ty = shift_y(q, r)
        for c in range(4):
            vals.append(shift_x(ty, c))
    packed = [vals[2 * j] | (vals[2 * j + 1] << 16) for j in range(8)]
    return jnp.stack(packed, axis=-1).reshape(-1, 8)


def build_pcf_window_u16_half(img):
    """(S, S) depth -> ((S/2)^2, 8) uint32: the 4x4 u16 window anchored at
    every EVEN texel (rows 2i..2i+3, cols 2j..2j+3), packed like
    build_pcf_window_u16.

    Quarter the table bytes (134 -> 34MB at 2048^2) — XLA's gather cost
    grows with TABLE BYTES at fixed index count (NOTES_PERF.md), so the
    per-pixel PCF window fetch drops from its ~11ns/idx table-bound tier
    toward the ~3.5ns floor.  The consumer quantizes each pixel's window
    anchor DOWN to the even grid and shifts its tap coordinates by the
    (0|1, 0|1) residual; taps whose bilinear neighbor falls one texel
    outside the 4x4 window clamp to its edge — a <= half-texel softening
    on ~1/8 of taps (budget-pinned in tests/test_fast_budget.py).
    """
    import jax as _jax

    h2, w2 = img.shape[0] // 2, img.shape[1] // 2
    q = jnp.minimum(
        jnp.ceil(jnp.clip(img, 0.0, 1.0) * 65535.0), 65535.0
    ).astype(jnp.uint32)
    # Phase decomposition: val(r, c)[i, j] = q[clamp(2i+r), clamp(2j+c)]
    # is a (r//2, c//2) SLICE of the (r%2, c%2) stride-2 phase plane, so
    # the 16 window taps read 4 quarter-size planes instead of 16 shifted
    # full-resolution ones (~2.5x less HBM traffic than the former
    # shift-then-decimate form).  Edge-replicating q by 2 first makes
    # qpad[y, x] = q[min(y, S-1), min(x, S-1)] — exactly the full-res
    # builder's clamp — so the slices never need their own clamping.
    q = jnp.concatenate([q, jnp.repeat(q[:, -1:], 2, axis=1)], axis=1)
    q = jnp.concatenate([q, jnp.repeat(q[-1:], 2, axis=0)], axis=0)

    def phase(a, b):  # qpad[a::2, b::2] as an (h2+1, w2+1) plane
        return _jax.lax.reduce_window(
            q[a : a + 2 * h2 + 1, b : b + 2 * w2 + 1],
            jnp.zeros((), q.dtype), _jax.lax.add,
            window_dimensions=(1, 1), window_strides=(2, 2),
            padding="VALID",
        )

    p = [[phase(a, b) for b in range(2)] for a in range(2)]
    vals = []
    for r in range(4):
        for c in range(4):
            pl = p[r % 2][c % 2]
            vals.append(pl[r // 2 : r // 2 + h2, c // 2 : c // 2 + w2])
    packed = [vals[2 * j] | (vals[2 * j + 1] << 16) for j in range(8)]
    return jnp.stack(packed, axis=-1).reshape(-1, 8)


def build_cube_quad_rows(faces):
    """(6, S, S, C) -> (6*S*S, 4*C) clamped quad rows, face-major."""
    return jnp.concatenate(
        [build_quad_rows(faces[f], CLAMP_TO_EDGE) for f in range(6)], axis=0
    )


def sample_cubemap_quad(rows, s: int, c: int, dirs):
    """Bilinear cubemap sample from quad rows: ONE gather."""
    face, u, v = cube_face_uv(dirs)
    uv = jnp.stack([u, v], axis=-1)
    idx, fx, fy = bilinear_weights(uv, s, s, CLAMP_TO_EDGE)
    quad = jnp.take(rows, idx + face * (s * s), axis=0)
    return quad_lerp(quad, fx, fy, c)


# --- RGBE shared-exponent packing ------------------------------------------
#
# HDR cube maps (environment, prefiltered specular) stored as quad rows of
# f32 RGB are 48-byte rows — a slow tier of XLA's TPU gather emitter.
# Radiance-style RGBE packs a texel into ONE uint32 (8-bit mantissas +
# shared exponent, <=0.4% relative error), putting a whole 2x2 quad in a
# 16-byte row (the fast tier).  Ambient/sky terms tolerate 0.4% easily.

def pack_rgbe(rgb):
    """(..., 3) f32 >= 0 -> (...,) uint32 RGBE."""
    m = jnp.max(rgb, axis=-1)
    e = jnp.floor(jnp.log2(jnp.maximum(m, 1e-32))) + 1.0
    scale = jnp.exp2(-e) * 256.0
    mant = jnp.clip(
        jnp.floor(rgb * scale[..., None]), 0.0, 255.0
    ).astype(jnp.uint32)
    packed = (
        mant[..., 0]
        | (mant[..., 1] << 8)
        | (mant[..., 2] << 16)
        | ((e.astype(jnp.int32) + 128).clip(1, 255).astype(jnp.uint32) << 24)
    )
    return jnp.where(m > 0.0, packed, jnp.uint32(0))


def unpack_rgbe(v):
    """(...,) uint32 RGBE -> (..., 3) f32."""
    e = (v >> 24).astype(jnp.int32)
    scale = jnp.where(e > 0, jnp.exp2(e.astype(jnp.float32) - 128.0 - 8.0), 0.0)
    rgb = jnp.stack(
        [
            ((v >> s) & 0xFF).astype(jnp.float32) + 0.5
            for s in (0, 8, 16)
        ],
        axis=-1,
    )
    return rgb * scale[..., None]


def quad_lerp_rgbe(quad_u32, fx, fy):
    """quad (..., 4) uint32 RGBE -> bilinear (..., 3)."""
    t00 = unpack_rgbe(quad_u32[..., 0])
    t10 = unpack_rgbe(quad_u32[..., 1])
    t01 = unpack_rgbe(quad_u32[..., 2])
    t11 = unpack_rgbe(quad_u32[..., 3])
    fx = fx[..., None]
    fy = fy[..., None]
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def build_cube_quad_rows_rgbe(faces):
    """(6, S, S, C>=3) HDR cube -> (6*S*S, 4) uint32 RGBE quad rows."""
    packed = pack_rgbe(faces[..., :3])  # (6, S, S) u32
    return jnp.concatenate(
        [
            build_quad_rows(packed[f][..., None], CLAMP_TO_EDGE)
            for f in range(6)
        ],
        axis=0,
    )


def sample_cubemap_quad_rgbe(rows, s: int, dirs):
    """Bilinear HDR cubemap sample: ONE 16-byte-row gather."""
    face, u, v = cube_face_uv(dirs)
    uv = jnp.stack([u, v], axis=-1)
    idx, fx, fy = bilinear_weights(uv, s, s, CLAMP_TO_EDGE)
    quad = jnp.take(rows, idx + face * (s * s), axis=0)
    return quad_lerp_rgbe(quad, fx, fy)


@jax.tree_util.register_pytree_node_class
class MipCubeQuad:
    """RGBE quad-packed cubemap mip chain: trilinear LOD in TWO 16-byte
    row gathers (the fast tier of XLA's TPU gather emitter).

    ``rows``: (total_texels, 4) uint32 RGBE quads, mips concatenated in
    the same face-major order as MipCube."""

    def __init__(self, mipcube=None, _rows=None, _sizes=None, _offsets=None):
        if mipcube is None:
            self.rows = _rows
            self.sizes = np.asarray(_sizes, np.int32)
            self.offsets = np.asarray(_offsets, np.int32)
            self.num_levels = len(self.sizes)
            return
        self.sizes = mipcube.sizes
        self.offsets = mipcube.offsets
        self.num_levels = mipcube.num_levels
        self.rows = jnp.concatenate(
            [
                build_cube_quad_rows_rgbe(mipcube.level(m))
                for m in range(mipcube.num_levels)
            ],
            axis=0,
        )

    def tree_flatten(self):
        return (self.rows,), (
            tuple(self.sizes.tolist()),
            tuple(self.offsets.tolist()),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        sizes, offsets = aux
        return cls(_rows=children[0], _sizes=sizes, _offsets=offsets)


@jax.tree_util.register_pytree_node_class
class MipCubeQuadMerged:
    """Child+parent RGBE quad pairs: trilinear LOD in ONE 32-byte gather.

    ``rows[i]`` = [mip l's quad at texel i (4 u32), mip l+1's quad at
    (y>>1, x>>1) (4 u32)], indexed exactly like MipCubeQuad (same
    sizes/offsets).  The last mip pairs with itself.  The parent tap's
    bilinear fractions derive from the child anchor's parity —
    fp = ((anchor & 1) + f) / 2 — which places the coarse tap a constant
    1/4 parent texel from true trilinear (the mip is band-limited by
    construction; the deviation is pinned in tests/test_fast_budget.py).
    Versus two 16-byte-row gathers this halves the trilinear index
    stream (passes/shading.py ibl_ambient_sky_fast)."""

    def __init__(self, quad: "MipCubeQuad" = None,
                 _rows=None, _sizes=None, _offsets=None):
        if quad is None:
            self.rows = _rows
            self.sizes = np.asarray(_sizes, np.int32)
            self.offsets = np.asarray(_offsets, np.int32)
            self.num_levels = len(self.sizes)
            return
        self.sizes = quad.sizes
        self.offsets = quad.offsets
        self.num_levels = quad.num_levels
        parts = []
        for lvl in range(self.num_levels):
            s = int(self.sizes[lvl])
            off = int(self.offsets[lvl])
            child = quad.rows[off : off + 6 * s * s]
            p = min(lvl + 1, self.num_levels - 1)
            sp = int(self.sizes[p])
            offp = int(self.offsets[p])
            par = quad.rows[offp : offp + 6 * sp * sp].reshape(6, sp, sp, 4)
            if sp != s:
                r = s // sp
                par = jnp.repeat(jnp.repeat(par, r, axis=1), r, axis=2)
            parts.append(
                jnp.concatenate([child, par.reshape(6 * s * s, 4)], axis=1)
            )
        self.rows = jnp.concatenate(parts, axis=0)

    def tree_flatten(self):
        return (self.rows,), (
            tuple(self.sizes.tolist()),
            tuple(self.offsets.tolist()),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        sizes, offsets = aux
        return cls(_rows=children[0], _sizes=sizes, _offsets=offsets)


def mipcube_quad_index_anchor(sizes, offsets, level, face, u, v):
    """Quad-row index, bilinear fractions AND texel anchors at per-pixel
    integer mip ``level`` (the gather-free half of
    _sample_mipcube_quad_level; anchors feed the merged child+parent
    layout's parity math)."""
    s = jnp.take(sizes, level)
    off = jnp.take(offsets, level)
    x = u * s - 0.5
    y = v * s - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = jnp.where(x0 < 0, 0.0, x - x0)
    fy = jnp.where(y0 < 0, 0.0, y - y0)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, s - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, s - 1)
    return off + face * s * s + y0i * s + x0i, fx, fy, x0i, y0i


def mipcube_quad_index(sizes, offsets, level, face, u, v):
    """Quad-row index + bilinear fractions at per-pixel integer mip
    ``level`` (the gather-free half of _sample_mipcube_quad_level)."""
    idx, fx, fy, _x0, _y0 = mipcube_quad_index_anchor(
        sizes, offsets, level, face, u, v
    )
    return idx, fx, fy


def _sample_mipcube_quad_level(rows, sizes, offsets, level, face, u, v):
    """RGBE bilinear sample at per-pixel integer mip `level`: ONE gather."""
    idx, fx, fy = mipcube_quad_index(sizes, offsets, level, face, u, v)
    quad = jnp.take(rows, idx, axis=0)
    return quad_lerp_rgbe(quad, fx, fy)


def sample_mipcube_quad_merged_lod(mq: "MipCubeQuadMerged", dirs, lod):
    """GLSL textureLod on the merged child+parent layout: trilinear in
    ONE 32-byte row gather.  The parent tap's bilinear fractions derive
    from the child anchor's parity (a constant 1/4-parent-texel shift —
    see MipCubeQuadMerged); the last level pairs with itself, so its
    parent fractions stay the child's."""
    sizes = jnp.asarray(mq.sizes)
    offsets = jnp.asarray(mq.offsets)
    nl = mq.num_levels
    face, u, v = cube_face_uv(dirs)
    lod = jnp.clip(lod, 0.0, nl - 1)
    l0 = jnp.floor(lod).astype(jnp.int32)
    f = (lod - l0.astype(lod.dtype))[..., None]
    idx, fx, fy, x0, y0 = mipcube_quad_index_anchor(
        sizes, offsets, l0, face, u, v
    )
    rows8 = jnp.take(mq.rows, idx, axis=0)
    c0 = quad_lerp_rgbe(rows8[..., :4], fx, fy)
    last = l0 >= nl - 1
    fpx = jnp.where(last, fx, ((x0 & 1).astype(fx.dtype) + fx) * 0.5)
    fpy = jnp.where(last, fy, ((y0 & 1).astype(fy.dtype) + fy) * 0.5)
    c1 = quad_lerp_rgbe(rows8[..., 4:], fpx, fpy)
    return c0 * (1 - f) + c1 * f


def sample_mipcube_quad_lod(mq: MipCubeQuad, dirs, lod):
    """GLSL textureLod on an RGBE quad-packed cubemap (2 gathers vs 8)."""
    sizes = jnp.asarray(mq.sizes)
    offsets = jnp.asarray(mq.offsets)
    nl = mq.num_levels
    face, u, v = cube_face_uv(dirs)
    lod = jnp.clip(lod, 0.0, nl - 1)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, nl - 1)
    f = (lod - l0.astype(lod.dtype))[..., None]
    c0 = _sample_mipcube_quad_level(mq.rows, sizes, offsets, l0, face, u, v)
    c1 = _sample_mipcube_quad_level(mq.rows, sizes, offsets, l1, face, u, v)
    return c0 * (1 - f) + c1 * f


# --- equirectangular -----------------------------------------------------

def spherical_uv(dirs):
    """Direction -> equirect uv, the reference's sampleSphericalMap
    (ibl/cubemap_brdflut.comp:155-160): u = atan2(z,x)/2pi + .5,
    v = asin(y)/pi + .5."""
    u = jnp.arctan2(dirs[..., 2], dirs[..., 0]) / (2.0 * jnp.pi) + 0.5
    v = jnp.arcsin(jnp.clip(dirs[..., 1], -1.0, 1.0)) / jnp.pi + 0.5
    return jnp.stack([u, v], axis=-1)


def sample_equirect(tex, dirs):
    """Sample an equirectangular map by direction (wrap in x, clamp in y)."""
    uv = spherical_uv(dirs)
    h, w, _ = tex.shape
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0.astype(jnp.int32) + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    t00 = _gather2d(tex, y0i, x0i)
    t10 = _gather2d(tex, y0i, x1i)
    t01 = _gather2d(tex, y1i, x0i)
    t11 = _gather2d(tex, y1i, x1i)
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy
