"""Numeric tests for the sampling library, BRDF math, and tonemap ops."""

import jax.numpy as jnp
import numpy as np
import pytest

from mo_renderer_tpu.device import sampling
from mo_renderer_tpu.kernels import brdf, tonemap


def test_bilinear_matches_manual():
    tex = jnp.arange(16.0).reshape(4, 4, 1)
    # Sample exactly at texel centers -> exact values
    uv = jnp.array([[(0.5) / 4, (0.5) / 4], [(2.5) / 4, (1.5) / 4]])
    out = sampling.sample_bilinear(tex, uv)
    np.testing.assert_allclose(out[:, 0], [0.0, 6.0], atol=1e-6)
    # Halfway between texels 0 and 1 in x
    uv = jnp.array([[1.0 / 4, 0.5 / 4]])
    np.testing.assert_allclose(sampling.sample_bilinear(tex, uv)[0, 0], 0.5, atol=1e-6)


def test_wrap_modes():
    n = 4
    i = jnp.array([-2, -1, 0, 3, 4, 5])
    np.testing.assert_array_equal(
        sampling.wrap_index(i, n, sampling.CLAMP_TO_EDGE), [0, 0, 0, 3, 3, 3]
    )
    np.testing.assert_array_equal(
        sampling.wrap_index(i, n, sampling.REPEAT), [2, 3, 0, 3, 0, 1]
    )
    np.testing.assert_array_equal(
        sampling.wrap_index(i, n, sampling.MIRRORED_REPEAT), [1, 0, 0, 3, 3, 2]
    )


def test_cube_direction_roundtrip():
    """cube_face_uv must invert cube_direction on every face."""
    s = 8
    ys, xs = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    uv = jnp.stack(
        [(xs + 0.5) / s, (ys + 0.5) / s], axis=-1
    ).reshape(-1, 2)
    for face in range(6):
        dirs = sampling.cube_direction(face, uv)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        f, u, v = sampling.cube_face_uv(dirs)
        np.testing.assert_array_equal(np.asarray(f), face)
        np.testing.assert_allclose(np.asarray(u), np.asarray(uv[:, 0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(v), np.asarray(uv[:, 1]), atol=1e-5)


def test_cubemap_sampling_constant_faces():
    s = 4
    faces = jnp.stack(
        [jnp.full((s, s, 3), float(i)) for i in range(6)]
    )
    dirs = jnp.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        jnp.float32,
    )
    out = sampling.sample_cubemap(faces, dirs)
    np.testing.assert_allclose(out[:, 0], [0, 1, 2, 3, 4, 5], atol=1e-6)


def test_mipcube_lod():
    mips = [
        np.full((6, 4, 4, 3), 1.0, np.float32),
        np.full((6, 2, 2, 3), 2.0, np.float32),
        np.full((6, 1, 1, 3), 4.0, np.float32),
    ]
    mc = sampling.MipCube(mips)
    dirs = jnp.array([[1.0, 0.1, 0.2], [0.0, -1.0, 0.0]])
    out0 = sampling.sample_mipcube_lod(mc, dirs, jnp.array([0.0, 0.0]))
    np.testing.assert_allclose(out0, 1.0, atol=1e-6)
    out_half = sampling.sample_mipcube_lod(mc, dirs, jnp.array([0.5, 1.5]))
    np.testing.assert_allclose(out_half[0], 1.5, atol=1e-6)
    np.testing.assert_allclose(out_half[1], 3.0, atol=1e-6)


def test_equirect_spherical_uv():
    d = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 1e-8]])
    uv = sampling.spherical_uv(d)
    np.testing.assert_allclose(uv[0], [0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(uv[1][1], 1.0, atol=1e-6)  # +Y -> v=1
    np.testing.assert_allclose(uv[2][0], 1.0, atol=1e-6)  # -X -> u=1


def test_ggx_distribution_analytic():
    n = jnp.array([[0.0, 0.0, 1.0]])
    h = n
    r = jnp.array([0.5])
    # At NdotH=1: D = a2 / (pi * a2^2) = 1/(pi*a2) with a = r^2
    a2 = 0.5**4
    np.testing.assert_allclose(
        brdf.distribution_ggx(n, h, r)[0], a2 / (np.pi * a2 * a2), rtol=1e-5
    )


def test_geometry_smith_range():
    n = jnp.array([[0.0, 0.0, 1.0]])
    v = jnp.array([[0.0, 0.6, 0.8]])
    l = jnp.array([[0.6, 0.0, 0.8]])
    g = brdf.geometry_smith(n, v, l, jnp.array([0.3]))
    assert 0.0 < float(g[0]) <= 1.0


def test_fresnel_schlick():
    f0 = jnp.array([[0.04, 0.04, 0.04]])
    f = brdf.fresnel_schlick(jnp.array([1.0]), f0)
    np.testing.assert_allclose(f[0], 0.04, atol=1e-6)
    f = brdf.fresnel_schlick(jnp.array([0.0]), f0)
    np.testing.assert_allclose(f[0], 1.0, atol=1e-6)


def test_hammersley_radical_inverse():
    pts = brdf.hammersley2d(jnp.array([0, 1, 2, 3]), 4)
    np.testing.assert_allclose(pts[:, 0], [0, 0.25, 0.5, 0.75], atol=1e-7)
    np.testing.assert_allclose(pts[:, 1], [0.0, 0.5, 0.25, 0.75], atol=1e-7)


def test_surface_shading_directional_light_behavior():
    """A white directional light straight above a flat diffuse surface."""
    pos = jnp.array([[0.0, 0.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    base = jnp.array([[1.0, 1.0, 1.0]])
    out = brdf.surface_shading(
        pos, base, n,
        metallic=jnp.array([0.0]), roughness=jnp.array([1.0]),
        light_type=jnp.array([0.0]),
        light_position=jnp.array([[0.0, 10.0, 0.0]]),
        light_color=jnp.array([[1.0, 1.0, 1.0]]),
        light_direction=jnp.array([[0.0, 1.0, 0.0]]),
        light_attenuation=jnp.array([[2.0, 2.0, 2.0, 2.0]]),
        eye_pos=jnp.array([[0.0, 5.0, 5.0]]),
    )
    assert np.all(np.asarray(out) > 0)
    # mostly diffuse: kD*albedo/pi * radiance(=2) * NdotL(=1) ~ 2/pi * (1-F)
    assert float(out[0, 0]) == pytest.approx(2.0 / np.pi * 0.96, rel=0.2)


def test_ibl_reflection_quirk():
    """R = reflect(V, N) with V toward the eye (pbr.glsl:248-249)."""
    pos = jnp.array([[0.0, 0.0, 0.0]])
    eye = jnp.array([[0.0, 1.0, 1.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = brdf.ibl_reflection_dir(pos, n, eye)
    v = np.array([0, 1, 1]) / np.sqrt(2)
    expect = v - 2 * np.dot(v, [0, 1, 0]) * np.array([0, 1, 0])
    np.testing.assert_allclose(np.asarray(r[0]), expect, atol=1e-6)


def test_tonemap_unreal():
    np.testing.assert_allclose(
        np.asarray(tonemap.tonemap_unreal(jnp.array([0.0, 1.0]))),
        [0.0, 1.0 / 1.155 * 1.019],
        atol=1e-6,
    )


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    rt = tonemap.srgb_to_linear(tonemap.linear_to_srgb(x))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(x), atol=1e-5)


def test_quantize_unorm8():
    out = tonemap.quantize_unorm8(jnp.array([0.0, 0.5, 1.0, 2.0, -1.0]))
    np.testing.assert_array_equal(np.asarray(out), [0, 128, 255, 255, 0])


def test_env_brdf_poly_matches_lut():
    """The fitted polynomial must track the 1024-sample LUT integration
    (ibl/cubemap_brdflut.comp BRDF) to sub-LSB accuracy; this pins the
    committed coefficients (scripts/fit_env_brdf.py) against any change
    to the LUT math."""
    from mo_renderer_tpu.kernels.ibl import brdf_lut

    s = 64
    lut = np.asarray(brdf_lut(s, 1024))[..., :2]
    nov = (np.arange(s) + 0.5) / s
    rough = 1.0 - (np.arange(s) + 0.5) / s
    rr, nn = np.meshgrid(rough, nov, indexing="ij")
    out = np.asarray(brdf.env_brdf_poly(jnp.asarray(nn), jnp.asarray(rr)))
    err = np.abs(out - lut)
    assert err.max() < 8e-3, f"max err {err.max()}"
    assert err.mean() < 2e-3, f"mean err {err.mean()}"
