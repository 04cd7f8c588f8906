"""BRDF library — jax.numpy port of resources/shaders/include/pbr.glsl.

Every function is vectorized over leading batch dims (pixels, samples).
Constants and quirks match the GLSL bit-for-bit where possible; deviations
are float-precision only.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.14159265358979323846


def luminance(rgb):
    """BT.709 (pbr.glsl:11-15)."""
    return (
        rgb[..., 0] * 0.2126 + rgb[..., 1] * 0.7152 + rgb[..., 2] * 0.0722
    )


def dot3(a, b):
    return jnp.sum(a * b, axis=-1)


def normalize(v, eps: float = 0.0):
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def reflect_glsl(i, n):
    """GLSL reflect(I, N) = I - 2*dot(N,I)*N."""
    return i - 2.0 * dot3(n, i)[..., None] * n


def distribution_ggx(n, h, roughness):
    """pbr.glsl:75-87."""
    a = roughness * roughness
    a2 = a * a
    ndoth = jnp.maximum(dot3(n, h), 0.0)
    denom = ndoth * ndoth * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom)


def geometry_schlick_ggx(ndotv, roughness):
    """pbr.glsl:89-98 — direct-lighting k = (r+1)^2 / 8."""
    r = roughness + 1.0
    k = (r * r) / 8.0
    return ndotv / (ndotv * (1.0 - k) + k)


def geometry_smith(n, v, l, roughness):
    """pbr.glsl:100-108."""
    ndotv = jnp.maximum(dot3(n, v), 0.0)
    ndotl = jnp.maximum(dot3(n, l), 0.0)
    return geometry_schlick_ggx(ndotv, roughness) * geometry_schlick_ggx(
        ndotl, roughness
    )


def g_schlicksmith_ggx_ibl(ndotl, ndotv, roughness):
    """IBL variant with k = r^2/2 (ibl/cubemap_brdflut.comp:62-68)."""
    k = (roughness * roughness) / 2.0
    gl = ndotl / (ndotl * (1.0 - k) + k)
    gv = ndotv / (ndotv * (1.0 - k) + k)
    return gl * gv


def fresnel_schlick(cos_theta, f0):
    """pbr.glsl:153-156."""
    c = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    return f0 + (1.0 - f0) * (c**5)[..., None]


def fresnel_schlick_roughness(cos_theta, f0, roughness):
    """pbr.glsl:158-161."""
    c = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    fmax = jnp.maximum(1.0 - roughness[..., None], f0)
    return f0 + (fmax - f0) * (c**5)[..., None]


def glsl_random(co):
    """The canonical one-liner hash (pbr.glsl:111-119): co (..., 2)."""
    dt = co[..., 0] * 12.9898 + co[..., 1] * 78.233
    sn = jnp.mod(dt, 3.14)
    v = jnp.sin(sn) * 43758.5453
    return v - jnp.floor(v)


def hammersley2d(i, n):
    """pbr.glsl:122-131; i int array, n scalar int -> (..., 2)."""
    u = jnp.uint32
    i = jnp.asarray(i, u)
    bits = (i << 16) | (i >> 16)
    bits = ((bits & u(0x55555555)) << 1) | ((bits & u(0xAAAAAAAA)) >> 1)
    bits = ((bits & u(0x33333333)) << 2) | ((bits & u(0xCCCCCCCC)) >> 2)
    bits = ((bits & u(0x0F0F0F0F)) << 4) | ((bits & u(0xF0F0F0F0)) >> 4)
    bits = ((bits & u(0x00FF00FF)) << 8) | ((bits & u(0xFF00FF00)) >> 8)
    rdi = bits.astype(jnp.float32) * 2.3283064365386963e-10
    return jnp.stack([i.astype(jnp.float32) / n, rdi], axis=-1)


def importance_sample_ggx(xi, roughness, normal):
    """pbr.glsl:135-151 — GGX half-vector sample about `normal`.

    xi (..., 2), roughness scalar or (...), normal (..., 3) -> (..., 3).
    Includes the reference's random(normal.xz)*0.1 phi jitter.
    """
    alpha = roughness * roughness
    phi = 2.0 * PI * xi[..., 0] + glsl_random(normal[..., ::2]) * 0.1
    cos_theta = jnp.sqrt(
        (1.0 - xi[..., 1]) / (1.0 + (alpha * alpha - 1.0) * xi[..., 1])
    )
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    h = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    # tangent basis (up = Z unless normal ~ Z)
    up = jnp.where(
        (jnp.abs(normal[..., 2]) < 0.999)[..., None],
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), normal.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), normal.shape),
    )
    tangent_x = normalize(jnp.cross(up, normal), eps=1e-20)
    tangent_y = normalize(jnp.cross(normal, tangent_x), eps=1e-20)
    return normalize(
        tangent_x * h[..., 0:1] + tangent_y * h[..., 1:2] + normal * h[..., 2:3]
    )


def v_ashikhmin(ndotl, ndotv):
    """ibl/cubemap_brdflut.comp:71-73."""
    return jnp.clip(1.0 / (4.0 * (ndotl + ndotv - ndotl * ndotv)), 0.0, 1.0)


def d_charlie(sheen_roughness, ndoth):
    """ibl/cubemap_brdflut.comp:75-81."""
    r = jnp.maximum(sheen_roughness, 1e-6)
    inv_r = 1.0 / r
    sin2h = 1.0 - ndoth * ndoth
    return (2.0 + inv_r) * jnp.power(jnp.maximum(sin2h, 0.0), inv_r * 0.5) / (2.0 * PI)


def importance_sample_charlie(xi, roughness, normal):
    """ibl/cubemap_brdflut.comp:83-101."""
    alpha = roughness * roughness
    phi = 2.0 * PI * xi[..., 0]
    sin_theta = jnp.power(xi[..., 1], alpha / (2.0 * alpha + 1.0))
    cos_theta = jnp.sqrt(jnp.maximum(1.0 - sin_theta * sin_theta, 0.0))
    h = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    up = jnp.where(
        (jnp.abs(normal[..., 2]) < 0.999)[..., None],
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), normal.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), normal.shape),
    )
    tangent_x = normalize(jnp.cross(up, normal), eps=1e-20)
    tangent_y = normalize(jnp.cross(normal, tangent_x), eps=1e-20)
    return normalize(
        tangent_x * h[..., 0:1] + tangent_y * h[..., 1:2] + normal * h[..., 2:3]
    )


def surface_shading(
    position, base_color, normal, metallic, roughness,
    light_type, light_position, light_color, light_direction, light_attenuation,
    eye_pos, spot_exponent=None,
):
    """Cook-Torrance direct lighting — pbr.glsl surfaceShading (:183-243).

    Pixel arrays (..., 3)/(...,); light_* are per-pixel-broadcastable arrays
    describing ONE light.  Returns (..., 3).  Reproduces the reference's
    direction double-sign-flip (net effect: L = normalize(light_direction))
    for directional lights.  ``spot_exponent`` is type_range_spot_id.z.
    """
    n = normal
    v = normalize(eye_pos - position, eps=1e-20)

    f0 = 0.04 + (base_color - 0.04) * metallic[..., None]

    pos_to_light = light_position - position
    d = jnp.sqrt(jnp.maximum(dot3(pos_to_light, pos_to_light), 1e-20))

    is_dir = light_type == 0.0
    is_point = light_type == 1.0

    l_dir = normalize(light_direction, eps=1e-20)
    l_pos = pos_to_light / d[..., None]
    l = jnp.where(is_dir[..., None], l_dir, l_pos)

    att_poly = (
        light_attenuation[..., 0]
        + light_attenuation[..., 1] * d
        + light_attenuation[..., 2] * d * d
    )
    if spot_exponent is None:
        spot_exponent = jnp.ones_like(light_type)
    spot = jnp.power(
        jnp.maximum(dot3(l_pos, l_dir), 0.0), spot_exponent
    )
    attenuation = jnp.where(
        is_dir,
        light_attenuation[..., 0],
        jnp.where(is_point, 1.0 / att_poly, spot / att_poly),
    )

    h = normalize(v + l, eps=1e-20)
    radiance = light_color * attenuation[..., None]

    ndf = distribution_ggx(n, h, roughness)
    g = geometry_smith(n, v, l, roughness)
    f = fresnel_schlick(jnp.maximum(dot3(h, v), 0.0), f0)

    kd = (1.0 - f) * (1.0 - metallic[..., None])

    num = ndf[..., None] * g[..., None] * f
    denom = 4.0 * jnp.maximum(dot3(n, v), 0.0) * jnp.maximum(dot3(n, l), 0.0) + 1e-4
    specular = num / denom[..., None]

    ndotl = jnp.maximum(dot3(n, l), 0.0)
    return (kd * base_color / PI + specular) * radiance * ndotl[..., None]


def image_based_lighting(
    position, base_color, normal, metallic, roughness, occlusion,
    eye_pos, irradiance_map_sample, prefiltered_sample, brdf_sample,
):
    """Split-sum ambient (pbr.glsl:245-271) given pre-sampled maps.

    irradiance_map_sample: (..., 3) — irradiance cube at `normal`
    prefiltered_sample:   (..., 3) — specular mip chain at R, lod = r*7
    brdf_sample:          (..., 2) — BRDF LUT at (NdotV, 1-roughness)
    """
    v = normalize(eye_pos - position, eps=1e-20)
    f0 = 0.04 + (base_color - 0.04) * metallic[..., None]
    ndotv = jnp.maximum(dot3(normal, v), 0.0)
    f = fresnel_schlick_roughness(ndotv, f0, roughness)
    kd = (1.0 - f) * (1.0 - metallic[..., None])
    diffuse = irradiance_map_sample * base_color
    specular = prefiltered_sample * (
        f * brdf_sample[..., 0:1] + brdf_sample[..., 1:2]
    )
    return (kd * diffuse + specular) * occlusion[..., None]


def env_brdf_poly(ndotv, roughness):
    """Environment-BRDF (scale, bias) via a fitted Chebyshev polynomial.

    Register-resident replacement for the BRDF-LUT texture gather
    (ibl/cubemap_brdflut.comp BRDF(); sampled by shading_pass.frag:110 via
    pbr.glsl:263-266).  The LUT is a universal function of
    (NdotV, roughness) — see scripts/fit_env_brdf.py for the fit (max
    residual: scale ~2e-3, bias ~6e-3, i.e. at most ~1.5 8-bit LSBs in the
    worst grazing-angle corner).  Inputs are clamped to the LUT's texel-
    center range to mirror CLAMP_TO_EDGE sampling.  Returns (..., 2).
    """
    from .env_brdf_coeffs import COEFFS, DEG

    half = 0.5 / 512.0  # texel-center clamp of the reference's 512^2 LUT
    x = 2.0 * jnp.sqrt(jnp.clip(ndotv, half, 1.0 - half)) - 1.0
    y = 2.0 * jnp.sqrt(jnp.clip(roughness, half, 1.0 - half)) - 1.0

    def cheb_all(t):
        ts = [jnp.ones_like(t), t]
        for _ in range(DEG - 1):
            ts.append(2.0 * t * ts[-1] - ts[-2])
        return ts

    tx = cheb_all(x)  # T_j(x_n), j = 0..DEG
    ty = cheb_all(y)  # T_i(x_r)
    out = []
    for c in range(2):
        acc = 0.0
        for i in range(DEG + 1):
            row = COEFFS[2 * i + c]
            inner = row[0] * tx[0]
            for j in range(1, DEG + 1):
                inner = inner + row[j] * tx[j]
            acc = acc + ty[i] * inner
        out.append(acc)
    return jnp.stack(out, axis=-1)


def ibl_reflection_dir(position, normal, eye_pos):
    """The reference's quirky R = reflect(V, N) with V = eye - pos
    (pbr.glsl:248-249) — reproduced verbatim for image parity."""
    v = normalize(eye_pos - position, eps=1e-20)
    return reflect_glsl(v, normal)

