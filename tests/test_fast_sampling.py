"""Quad-packed sampling, SH9 irradiance, analytic env-BRDF vs oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mo_renderer_tpu.device import sampling
from mo_renderer_tpu.kernels import brdf, ibl


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _rand_dirs(rng, n):
    d = rng.normal(size=(n, 3)).astype(np.float32)
    return jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))


def test_quad_rows_match_bilinear(rng):
    tex = jnp.asarray(rng.random((33, 47, 3), dtype=np.float32))
    uv = jnp.asarray(rng.random((500, 2), dtype=np.float32)) * 1.4 - 0.2
    for mode in (sampling.CLAMP_TO_EDGE, sampling.REPEAT):
        ref = sampling.sample_bilinear(tex, uv, mode)
        rows = sampling.build_quad_rows(tex, mode)
        out = sampling.sample_quad_rows(rows, uv, 33, 47, 3, mode)
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_quad_rows_uint8_layers(rng):
    tex = jnp.asarray(rng.integers(0, 256, (3, 16, 16, 4)).astype(np.uint8))
    uv = jnp.asarray(rng.random((300, 2), dtype=np.float32))
    layer = jnp.asarray(rng.integers(0, 3, 300).astype(np.int32))
    ref = sampling.sample_array_bilinear(tex, layer, uv, sampling.REPEAT)
    rows = jnp.concatenate(
        [sampling.build_quad_rows(tex[i], sampling.REPEAT) for i in range(3)]
    )
    out = sampling.sample_quad_rows(
        rows, uv, 16, 16, 4, sampling.REPEAT, base=layer * 256
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_cube_quad_matches_cubemap(rng):
    faces = jnp.asarray(rng.random((6, 16, 16, 3), dtype=np.float32))
    dirs = _rand_dirs(rng, 800)
    ref = sampling.sample_cubemap(faces, dirs)
    rows = sampling.build_cube_quad_rows(faces)
    out = sampling.sample_cubemap_quad(rows, 16, 3, dirs)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_mipcube_quad_matches_lod(rng):
    mips = [
        jnp.asarray(rng.random((6, s, s, 3), dtype=np.float32))
        for s in (16, 8, 4)
    ]
    mc = sampling.MipCube(mips)
    mq = sampling.MipCubeQuad(mc)
    dirs = _rand_dirs(rng, 500)
    lod = jnp.asarray(rng.random(500, dtype=np.float32) * 2.5)
    ref = np.asarray(sampling.sample_mipcube_lod(mc, dirs, lod))[..., :3]
    out = np.asarray(sampling.sample_mipcube_quad_lod(mq, dirs, lod))
    # RGBE packing: <=0.4% relative error on the max channel
    np.testing.assert_allclose(out, ref, atol=0.01)


def test_rgbe_roundtrip(rng):
    rgb = jnp.asarray(
        rng.random((1000, 3), dtype=np.float32) * 40.0
    )
    out = np.asarray(sampling.unpack_rgbe(sampling.pack_rgbe(rgb)))
    ref = np.asarray(rgb)
    m = ref.max(-1, keepdims=True)
    assert (np.abs(out - ref) <= m / 256.0 + 1e-6).all()
    # zeros stay zeros
    z = sampling.unpack_rgbe(sampling.pack_rgbe(jnp.zeros((4, 3))))
    assert np.asarray(z).max() == 0.0


def test_window_rows_2x4(rng):
    img = jnp.asarray(rng.random((9, 13), dtype=np.float32))
    rows = np.asarray(sampling.build_window_rows_2x4(img))
    ref = np.asarray(img)
    for y, x in [(0, 0), (3, 5), (8, 12), (7, 11)]:
        row = rows[y * 13 + x]
        for k in range(4):
            assert row[k] == ref[min(y, 8), min(x + k, 12)]
            assert row[4 + k] == ref[min(y + 1, 8), min(x + k, 12)]


def test_pcf_window_u16(rng):
    img = jnp.asarray(rng.random((9, 13), dtype=np.float32))
    rows = np.asarray(sampling.build_pcf_window_u16(img))
    q = np.minimum(np.ceil(np.asarray(img) * 65535.0), 65535.0)
    for y, x in [(0, 0), (3, 5), (8, 12), (6, 10)]:
        row = rows[y * 13 + x]
        for r in range(4):
            for c in range(4):
                v = (row[(r * 4 + c) // 2] >> (16 * (c & 1))) & 0xFFFF
                assert v == q[min(y + r, 8), min(x + c, 12)]


def test_pcf_window_u16_half(rng):
    """The even-anchor table holds exactly the full table's even rows."""
    img = jnp.asarray(rng.random((16, 16), dtype=np.float32))
    full = np.asarray(sampling.build_pcf_window_u16(img)).reshape(16, 16, 8)
    half = np.asarray(sampling.build_pcf_window_u16_half(img)).reshape(8, 8, 8)
    np.testing.assert_array_equal(half, full[::2, ::2])


def test_pcf_half_anchor_matches_full_on_even_anchors(rng):
    """Where a pixel's window anchor is already even, the half-anchor
    PCF factor is bit-identical to the full-table path; elsewhere the
    edge clamp softens at most a bounded fraction of taps."""
    from mo_renderer_tpu.passes.shading import calculate_shadow_fast

    s = 64
    smap = jnp.asarray(rng.random((s, s), dtype=np.float32))
    wp = jnp.asarray(rng.normal(size=(64, 64, 3)).astype(np.float32)) * 2.0
    lpv = jnp.asarray(np.diag([0.3, 0.3, 0.2, 1.0]).astype(np.float32))

    full = np.asarray(calculate_shadow_fast(
        wp, lpv, sampling.build_pcf_window_u16(smap), s
    ))
    half = np.asarray(calculate_shadow_fast(
        wp, lpv, sampling.build_pcf_window_u16_half(smap), s
    ))
    # recompute each pixel's anchor parity like the consumer does
    p = np.concatenate([np.asarray(wp), np.ones_like(wp[..., :1])], -1)
    lp = p @ np.asarray(lpv).T
    proj = lp[..., :3] / lp[..., 3:4]
    uvx = np.clip((proj[..., 0] * 0.5 + 0.5) * s - 0.5, 1.0, s - 3.0)
    uvy = np.clip((proj[..., 1] * 0.5 + 0.5) * s - 0.5, 1.0, s - 3.0)
    even = (((np.floor(uvx).astype(int) - 1) % 2) == 0) & (
        ((np.floor(uvy).astype(int) - 1) % 2) == 0
    )
    np.testing.assert_array_equal(full[even], half[even])
    # odd-anchored pixels only differ where an edge-clamped tap flips
    frac = (np.abs(full - half) > 1e-6).mean()
    assert frac < 0.20, f"diff fraction {frac}"


def test_pcf_u16_matches_f32_shadow(rng):
    """Full PCF factor: u16 single-gather vs f32 two-gather path.

    Ceil quantization can flip a tap only when |current - stored| <
    1.5e-5; on random depth fields that is a vanishing fraction."""
    from mo_renderer_tpu.passes.shading import calculate_shadow_fast

    s = 64
    smap = jnp.asarray(rng.random((s, s), dtype=np.float32))
    wp = jnp.asarray(rng.normal(size=(32, 32, 3)).astype(np.float32)) * 2.0
    lpv = jnp.asarray(np.diag([0.3, 0.3, 0.2, 1.0]).astype(np.float32))

    f32 = calculate_shadow_fast(
        wp, lpv, sampling.build_window_rows_2x4(smap), s
    )
    u16 = calculate_shadow_fast(
        wp, lpv, sampling.build_pcf_window_u16(smap), s
    )
    # agreement except where a tap sits within one quantum of the surface
    frac = (np.abs(np.asarray(f32) - np.asarray(u16)) > 1e-6).mean()
    assert frac < 0.01, f"diff fraction {frac}"


def test_upsample2x_exact_on_samples(rng):
    from mo_renderer_tpu.passes.shading import _upsample2x

    a = jnp.asarray(rng.random((16, 64), dtype=np.float32))
    up = np.asarray(_upsample2x(a, 32, 128))
    assert up.shape == (32, 128)
    np.testing.assert_array_equal(up[::2, ::2], np.asarray(a))
    # odd rows/cols are neighbor means
    np.testing.assert_allclose(
        up[1:-1:2, ::2], 0.5 * (np.asarray(a)[:-1] + np.asarray(a)[1:]),
        atol=1e-7,
    )


def test_sh9_reconstructs_irradiance(rng):
    # smooth synthetic environment -> irradiance -> SH9 vs cube sampling
    equirect = jnp.asarray(
        0.5
        + 0.4 * np.sin(np.linspace(0, np.pi, 32))[:, None, None]
        * np.ones((32, 64, 3), np.float32)
    )
    env = ibl.equirect_to_cubemap(equirect, 16)[..., :3]
    irr = ibl.irradiance_map(env, 16)
    coeffs = ibl.sh9_project_cube(irr)
    dirs = _rand_dirs(rng, 2000)
    ref = sampling.sample_cubemap(irr, dirs)
    out = ibl.sh9_eval(coeffs, dirs)
    err = np.abs(np.asarray(out) - np.asarray(ref)).mean()
    scale = float(np.abs(np.asarray(ref)).mean()) + 1e-9
    assert err / scale < 0.03, f"relative error {err / scale}"
