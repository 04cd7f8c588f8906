"""IBL precompute kernels — batched jax.numpy ports of resources/shaders/
ibl/{cubemap_brdflut,irradiance,specular}.comp, re-designed TPU-first.

Shifts vs the reference's per-texel GPU dispatches (all documented):

- equirect->cubemap: identical math (getDirection table + spherical map,
  including the reference's uv = pos/size quirk without the half-texel).
- BRDF LUT: identical 1024-sample Hammersley integration (GGX rg +
  Charlie sheen b), batched over all texels.
- irradiance: the reference runs a ~15.8k-sample Riemann quadrature per
  texel (irradiance.comp:44-56) and stores E/pi.  Here the same integral
  is computed EXACTLY as a cosine-kernel matmul against a downsampled env
  basis — an MXU matmul instead of 2.5e10 gathers.  Output resolution is
  configurable (irradiance is ultra-smooth; 128^2 faces by default).
- specular GGX prefilter: same importance sampler (with the reference's
  random() phi jitter) but each mip computed at its NATIVE resolution
  (the reference renders every mip at 512^2 and blit-downsamples,
  ibl_resource.rs:282-328) with filtered importance sampling (per-sample
  LOD into an env mip chain) for variance reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..device import sampling
from . import brdf

PI = jnp.pi


def _face_grid(size: int, half_texel: bool):
    """(size, size, 2) uv grid per the reference's uv convention."""
    off = 0.5 if half_texel else 0.0
    ys = (jnp.arange(size, dtype=jnp.float32) + off) / size
    xs = (jnp.arange(size, dtype=jnp.float32) + off) / size
    v, u = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([u, v], axis=-1)


def cube_directions(size: int, half_texel: bool = False):
    """(6, size, size, 3) normalized directions, reference getDirection
    table (ibl/cubemap_brdflut.comp:141-153; uv = pos/size, no half texel)."""
    uv = _face_grid(size, half_texel)
    faces = [sampling.cube_direction(f, uv) for f in range(6)]
    d = jnp.stack(faces)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("size",))
def equirect_to_cubemap(equirect, size: int = 512):
    """(H, W, C) equirect -> (6, size, size, C) cubemap (bilinear)."""
    dirs = cube_directions(size)
    return sampling.sample_equirect(equirect, dirs)


# --- BRDF LUT -------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("size", "num_samples"))
def brdf_lut(size: int = 512, num_samples: int = 1024):
    """(size, size, 3): rg = GGX scale/bias, b = Charlie sheen.

    Matches BRDF() in ibl/cubemap_brdflut.comp:104-140: NoV = u,
    roughness = 1 - v (row 0 = roughness ~1).
    """
    ys = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    xs = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    rough, nov = jnp.meshgrid(1.0 - ys, xs, indexing="ij")
    nov = jnp.maximum(nov, 1e-6)

    n = jnp.array([0.0, 0.0, 1.0])
    v = jnp.stack([jnp.sqrt(1.0 - nov * nov), jnp.zeros_like(nov), nov], -1)
    n_b = jnp.broadcast_to(n, v.shape)

    def sample_step(carry, i):
        lut = carry
        xi = brdf.hammersley2d(
            jnp.full(rough.shape, i, jnp.uint32), num_samples
        )
        # GGX term
        h = brdf.importance_sample_ggx(xi, rough, n_b)
        l = 2.0 * brdf.dot3(v, h)[..., None] * h - v
        dot_nl = jnp.maximum(l[..., 2], 0.0)
        dot_nv = jnp.maximum(v[..., 2], 0.0)
        dot_vh = jnp.maximum(brdf.dot3(v, h), 0.0)
        dot_nh = jnp.maximum(h[..., 2], 0.0)
        g = brdf.g_schlicksmith_ggx_ibl(dot_nl, dot_nv, rough)
        g_vis = (g * dot_vh) / jnp.maximum(dot_nh * dot_nv, 1e-8)
        fc = (1.0 - dot_vh) ** 5
        ok = dot_nl > 0.0
        a = jnp.where(ok, (1.0 - fc) * g_vis, 0.0)
        b = jnp.where(ok, fc * g_vis, 0.0)
        # Charlie sheen term
        hc = brdf.importance_sample_charlie(xi, rough, n_b)
        lc = 2.0 * brdf.dot3(v, hc)[..., None] * hc - v
        c_nl = jnp.maximum(lc[..., 2], 0.0)
        c_vh = jnp.maximum(brdf.dot3(v, hc), 0.0)
        c_nh = jnp.maximum(hc[..., 2], 0.0)
        d_ch = brdf.d_charlie(rough, c_nh)
        v_ash = brdf.v_ashikhmin(c_nl, dot_nv)
        c = jnp.where(c_nl > 0.0, v_ash * d_ch * c_nl * c_vh, 0.0)
        return lut + jnp.stack([a, b, c], -1), None

    init = jnp.zeros(rough.shape + (3,), jnp.float32)
    lut, _ = jax.lax.scan(
        sample_step, init, jnp.arange(num_samples, dtype=jnp.uint32)
    )
    return lut / num_samples


# --- irradiance (cosine convolution as MXU matmul) ------------------------

def _env_basis(env_faces, basis_size: int):
    """Downsample env to (6*b*b, 3) colors + dirs + solid angles."""
    c = env_faces.shape[-1]
    s = env_faces.shape[1]
    f = s // basis_size
    small = env_faces[..., :3].reshape(
        6, basis_size, f, basis_size, f, min(c, 3)
    ).mean(axis=(2, 4))
    dirs = cube_directions(basis_size, half_texel=True).reshape(-1, 3)
    # per-texel solid angle ~ (2/b)^2 / (x^2+y^2+1)^(3/2) on the unit face
    uv = _face_grid(basis_size, True) * 2.0 - 1.0
    r2 = uv[..., 0] ** 2 + uv[..., 1] ** 2 + 1.0
    sa = (2.0 / basis_size) ** 2 / (r2 ** 1.5)
    sa = jnp.tile(sa.reshape(-1), 6)
    return small.reshape(-1, small.shape[-1]), dirs, sa


@functools.partial(jax.jit, static_argnames=("out_size", "basis_size"))
def irradiance_map(env_faces, out_size: int = 128, basis_size: int = 16):
    """(6, out, out, 3) storing E/pi (the reference's normalization:
    irradiance.comp:55 'PI * irradiance / N' of L*cos*sin samples)."""
    colors, dirs, sa = _env_basis(env_faces, basis_size)
    out_dirs = cube_directions(out_size).reshape(-1, 3)
    weights = sa[None, :] * jnp.maximum(
        out_dirs @ dirs.T, 0.0
    )  # (O, D) cosine kernel, MXU
    irr = (weights @ colors) / PI
    return irr.reshape(6, out_size, out_size, colors.shape[-1])


# --- GGX specular prefilter ----------------------------------------------

def _env_mip_chain(env_faces, min_size: int = 4) -> sampling.MipCube:
    mips = [env_faces[..., :3]]
    cur = env_faces[..., :3]
    while cur.shape[1] > min_size:
        s = cur.shape[1] // 2
        cur = cur.reshape(6, s, 2, s, 2, cur.shape[-1]).mean(axis=(2, 4))
        mips.append(cur)
    return sampling.MipCube(mips)


def _prefilter_level(env_quad, dirs, roughness, num_samples, env_size):
    """Filtered importance sampling over a batch of output texels.

    dirs (P, 3): N = R = V (specular.comp:120-122); roughness scalar or
    (P,) — specular_prefilter passes EVERY mip's texels in one call with
    per-texel roughness, so the whole chain is ONE scan (one compile).
    The environment is sampled from the merged child+parent RGBE quad
    chain (ONE 32-byte gather per trilinear tap instead of 8 f32 taps —
    the precompute is gather-bound at ~0.5G taps for a 512^2 chain) in
    chunks of B samples per scan step, sized to keep the gather pipe
    busy without blowing VMEM.
    """
    p = dirs.shape[0]
    # largest power-of-two chunk with ~4M sample-points per step
    b = 1
    while b < num_samples and p * (b * 2) <= (1 << 22):
        b *= 2
    n_steps = (num_samples + b - 1) // b
    dirs_b = dirs[None]  # (1, P, 3)

    def sample_step(carry, step):
        color, weight = carry
        i = step * b + jnp.arange(b, dtype=jnp.uint32)[:, None]  # (B, 1)
        xi = brdf.hammersley2d(
            jnp.broadcast_to(i, (b, p)), num_samples
        )
        h = brdf.importance_sample_ggx(xi, roughness, dirs_b)
        l = 2.0 * brdf.dot3(dirs_b, h)[..., None] * h - dirs_b
        l = l / jnp.linalg.norm(l, axis=-1, keepdims=True)
        ndotl = jnp.maximum(brdf.dot3(dirs_b, l), 0.0)
        # filtered importance sampling: env LOD from the sample's solid angle
        ndoth = jnp.maximum(brdf.dot3(dirs_b, h), 1e-4)
        hdotv = ndoth  # V == N
        d = brdf.distribution_ggx(dirs_b, h, roughness)
        pdf = jnp.maximum(d * ndoth / (4.0 * hdotv), 1e-8)
        omega_s = 1.0 / (num_samples * pdf)
        omega_p = 4.0 * PI / (6.0 * env_size * env_size)
        lod = jnp.clip(0.5 * jnp.log2(omega_s / omega_p), 0.0, 12.0)
        env = sampling.sample_mipcube_quad_merged_lod(env_quad, l, lod)
        w = jnp.where(ndotl > 0.0, ndotl, 0.0)
        return (
            color + jnp.sum(env * w[..., None], axis=0),
            weight + jnp.sum(w, axis=0),
        ), None

    init = (jnp.zeros((p, 3), jnp.float32), jnp.zeros((p,), jnp.float32))
    (color, weight), _ = jax.lax.scan(
        sample_step, init, jnp.arange(n_steps, dtype=jnp.uint32)
    )
    return color / jnp.maximum(weight, 1e-8)[..., None]


@functools.partial(jax.jit, static_argnames=("num_mips", "num_samples"))
def specular_prefilter(
    env_faces, num_mips: int = 8, num_samples: int = 1024
) -> sampling.MipCube:
    """GGX-prefiltered mip chain: mip i at native size env/2^i with
    roughness i/(num_mips-1); mip 0 = environment (mirror).

    The shading LOD scale is roughness * (num_mips-1) = roughness * 7
    (pbr.glsl:262 MAX_REFLECTION_LOD).  One jit compiles the whole
    chain (the reference launches one GPU dispatch per mip,
    ibl_resource.rs:282-328); the source chain is RGBE quad-packed,
    trading <= 0.4% per-tap quantization (averaged down by the 1024-
    sample integration) for 4x fewer gather indices.
    """
    env_size = env_faces.shape[1]
    env_quad = sampling.MipCubeQuadMerged(
        sampling.MipCubeQuad(_env_mip_chain(env_faces))
    )
    # ALL mips' output texels in one flat batch with per-texel roughness:
    # one scan, one compile (a jit-per-mip chain compiled for minutes)
    sizes, dirs_l, rough_l = [], [], []
    for i in range(1, num_mips):
        size = max(env_size >> i, 1)
        sizes.append(size)
        d = cube_directions(size).reshape(-1, 3)
        dirs_l.append(d)
        rough_l.append(
            jnp.full((d.shape[0],), i / (num_mips - 1), jnp.float32)
        )
    flat = _prefilter_level(
        env_quad,
        jnp.concatenate(dirs_l),
        jnp.concatenate(rough_l),
        num_samples,
        env_size,
    )
    mips = [jnp.asarray(env_faces[..., :3])]
    off = 0
    for size in sizes:
        n = 6 * size * size
        mips.append(flat[off : off + n].reshape(6, size, size, 3))
        off += n
    return sampling.MipCube(mips)


# --- spherical harmonics (order 2) -----------------------------------------
#
# The irradiance cubemap is a cosine-convolved environment, which is
# band-limited to SH order 2 to within ~1% (the cosine kernel's l=3+ terms
# vanish or are negligible).  Projecting the irradiance map onto 9 SH
# coefficients lets the shading pass evaluate diffuse ambient with ~30
# flops and ZERO gathers (a cubemap sample costs 4 gather indices/pixel,
# ~7ns each on TPU).  Validated against cubemap sampling in tests.

_SH_C = (
    0.282095,              # Y00
    0.488603,              # Y1-1 (y), Y10 (z), Y11 (x)
    1.092548,              # Y2-2 (xy), Y2-1 (yz), Y21 (xz)
    0.315392,              # Y20 (3z^2 - 1)
    0.546274,              # Y22 (x^2 - y^2)
)


def _sh9_basis(dirs):
    """dirs (..., 3) -> (..., 9) real SH basis values."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    return jnp.stack(
        [
            jnp.full_like(x, _SH_C[0]),
            _SH_C[1] * y,
            _SH_C[1] * z,
            _SH_C[1] * x,
            _SH_C[2] * x * y,
            _SH_C[2] * y * z,
            _SH_C[3] * (3.0 * z * z - 1.0),
            _SH_C[2] * x * z,
            _SH_C[4] * (x * x - y * y),
        ],
        axis=-1,
    )


def sh9_project_cube(faces):
    """Project a cubemap (6, S, S, C) onto SH9: returns (9, C) coeffs.

    Uses the exact per-texel solid angle dw = 4 / (S^2 (x^2+y^2+1)^(3/2))
    for face-plane coordinates x, y in [-1, 1]."""
    s = faces.shape[1]
    uv = _face_grid(s, half_texel=True)
    fx = uv[..., 0] * 2.0 - 1.0
    fy = uv[..., 1] * 2.0 - 1.0
    dw = 4.0 / (s * s * jnp.power(fx * fx + fy * fy + 1.0, 1.5))  # (S, S)
    dirs = cube_directions(s, half_texel=True)  # (6, S, S, 3)
    basis = _sh9_basis(dirs)  # (6, S, S, 9)
    w = dw[None, :, :, None, None]  # broadcast over faces & channels
    contrib = basis[..., :, None] * faces[..., None, :] * w
    return jnp.sum(contrib, axis=(0, 1, 2))  # (9, C)


def sh9_eval(coeffs, dirs):
    """Evaluate SH9 reconstruction at dirs (..., 3) -> (..., C)."""
    basis = _sh9_basis(dirs)  # (..., 9)
    return jnp.einsum("...i,ic->...c", basis, coeffs)
