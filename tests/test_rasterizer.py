"""Rasterizer tests: Pallas tile kernel vs the jnp oracle, fill-rule and
depth-order semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from mo_renderer_tpu.kernels.raster_reference import rasterize_reference
from mo_renderer_tpu.kernels.raster_setup import bin_triangles, triangle_setup
from mo_renderer_tpu.kernels.rasterizer import rasterize

W, H = 256, 64  # 2x4 tiles at (16, 128)


def clip_from_screen(pts, z):
    """Build clip coords (w=1) from pixel coords for direct raster tests."""
    pts = np.asarray(pts, np.float32)
    ndc_x = pts[:, 0] / W * 2.0 - 1.0
    ndc_y = pts[:, 1] / H * 2.0 - 1.0
    return np.stack(
        [ndc_x, ndc_y, np.asarray(z, np.float32), np.ones(len(pts), np.float32)],
        axis=-1,
    )


def run_both(clip, indices, cull=False, mt=8, gcap=64):
    setup = triangle_setup(
        jnp.asarray(clip),
        jnp.asarray(indices, jnp.int32),
        jnp.ones(len(indices), bool),
        W, H, cull_backface=cull,
    )
    binned = bin_triangles(
        setup,
        tile_h=16, tile_w=128, n_tiles_x=W // 128, n_tiles_y=H // 16,
        max_tiles_per_tri=mt, binned_cap=2048, global_cap=gcap,
    )
    tri_p, z_p, b0_p, b1_p = rasterize(binned, width=W, height=H)
    tri_r, z_r, b0_r, b1_r = rasterize_reference(setup, W, H)
    return (tri_p, z_p, b0_p, b1_p), (tri_r, z_r, b0_r, b1_r), binned


def test_single_triangle_coverage():
    clip = clip_from_screen([[20, 10], [120, 10], [20, 50]], [0.5, 0.5, 0.5])
    (tri_p, z_p, _, _), (tri_r, z_r, _, _), _ = run_both(clip, [[0, 1, 2]])
    np.testing.assert_array_equal(np.asarray(tri_p), np.asarray(tri_r))
    covered = np.asarray(tri_r) == 0
    assert covered.sum() > 1000  # ~half of 100x40 bbox
    np.testing.assert_allclose(
        np.asarray(z_p)[covered], np.asarray(z_r)[covered], atol=1e-6
    )
    # interior pixel well inside
    assert np.asarray(tri_p)[15, 40] == 0
    assert np.asarray(tri_p)[5, 200] == -1


def test_shared_edge_no_double_coverage():
    """Two triangles of a split quad: every quad pixel covered exactly once
    (top-left fill rule), no cracks, no double hits."""
    quad = [[32, 8], [96, 8], [96, 40], [32, 40]]
    clip = clip_from_screen(quad, [0.5] * 4)
    idx = [[0, 1, 2], [0, 2, 3]]
    setup = triangle_setup(
        jnp.asarray(clip), jnp.asarray(idx, jnp.int32), jnp.ones(2, bool),
        W, H, cull_backface=False,
    )
    # count coverage per pixel by rasterizing each triangle alone
    covers = []
    for k in range(2):
        s1 = triangle_setup(
            jnp.asarray(clip), jnp.asarray([idx[k]], jnp.int32),
            jnp.ones(1, bool), W, H, cull_backface=False,
        )
        t, _, _, _ = rasterize_reference(s1, W, H)
        covers.append(np.asarray(t) == 0)
    total = covers[0].astype(int) + covers[1].astype(int)
    assert total.max() == 1, "double coverage on shared edge"
    # interior of the quad (pixel centers strictly inside) fully covered
    interior = np.zeros((H, W), bool)
    interior[9:39, 33:95] = True
    assert np.all(total[interior] == 1), "crack inside the quad"


def test_depth_lessequal_later_wins():
    # two identical triangles, same depth: later one wins
    pts = [[10, 10], [100, 10], [10, 50]]
    clip = np.concatenate(
        [clip_from_screen(pts, [0.5] * 3), clip_from_screen(pts, [0.5] * 3)]
    )
    idx = [[0, 1, 2], [3, 4, 5]]
    (tri_p, _, _, _), (tri_r, _, _, _), _ = run_both(clip, idx)
    covered = np.asarray(tri_r) >= 0
    assert np.all(np.asarray(tri_r)[covered] == 1)
    np.testing.assert_array_equal(np.asarray(tri_p), np.asarray(tri_r))

    # closer first triangle occludes
    clip2 = np.concatenate(
        [clip_from_screen(pts, [0.2] * 3), clip_from_screen(pts, [0.5] * 3)]
    )
    (tri_p2, z_p2, _, _), (tri_r2, _, _, _), _ = run_both(clip2, idx)
    covered = np.asarray(tri_r2) >= 0
    assert np.all(np.asarray(tri_r2)[covered] == 0)
    np.testing.assert_array_equal(np.asarray(tri_p2), np.asarray(tri_r2))
    assert np.allclose(np.asarray(z_p2)[covered], 0.2, atol=1e-6)


def test_backface_cull():
    pts = [[10, 10], [100, 10], [10, 50]]
    clip = clip_from_screen(pts, [0.5] * 3)
    # winding [0,1,2] in y-down screen space: check cull removes one of the
    # two orientations and keeps the other
    s_a = triangle_setup(
        jnp.asarray(clip), jnp.asarray([[0, 1, 2]], jnp.int32),
        jnp.ones(1, bool), W, H, cull_backface=True,
    )
    s_b = triangle_setup(
        jnp.asarray(clip), jnp.asarray([[0, 2, 1]], jnp.int32),
        jnp.ones(1, bool), W, H, cull_backface=True,
    )
    t_a, _, _, _ = rasterize_reference(s_a, W, H)
    t_b, _, _, _ = rasterize_reference(s_b, W, H)
    cov_a = (np.asarray(t_a) == 0).sum()
    cov_b = (np.asarray(t_b) == 0).sum()
    assert (cov_a == 0) != (cov_b == 0), "exactly one winding must be culled"


def test_random_soup_pallas_matches_oracle():
    rng = np.random.RandomState(42)
    n_tri = 50
    pts = rng.uniform([0, 0], [W, H], size=(n_tri * 3, 2)).astype(np.float32)
    z = rng.uniform(0.05, 0.95, size=n_tri * 3).astype(np.float32)
    clip = clip_from_screen(pts, z)
    idx = np.arange(n_tri * 3, dtype=np.int32).reshape(n_tri, 3)
    (tri_p, z_p, b0_p, b1_p), (tri_r, z_r, b0_r, b1_r), binned = run_both(
        clip, idx, mt=8, gcap=64
    )
    assert int(binned.overflow) == 0
    np.testing.assert_array_equal(np.asarray(tri_p), np.asarray(tri_r))
    np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_r), atol=1e-6)
    cov = np.asarray(tri_r) >= 0
    assert cov.sum() > 100
    np.testing.assert_allclose(
        np.asarray(b0_p)[cov], np.asarray(b0_r)[cov], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(b1_p)[cov], np.asarray(b1_r)[cov], atol=1e-6
    )


def test_screen_covering_triangle_routes_large_not_global():
    """A triangle covering this screen's 8 tiles (<= LARGE_SPAN) stays in
    the sorted per-tile runs — the global list is reserved for span > 32
    (a global triangle costs n_tiles effective pairs in the kernel)."""
    clip = clip_from_screen(
        [[-10, -10], [3 * W, -10], [-10, 3 * H]], [0.3] * 3
    )
    (tri_p, z_p, _, _), (tri_r, z_r, _, _), binned = run_both(
        clip, [[0, 1, 2]], mt=2, gcap=64
    )
    assert int(binned.global_count) == 0
    # every tile got exactly one run entry for it
    assert np.asarray(binned.tile_count).sum() == (W // 128) * (H // 16)
    np.testing.assert_array_equal(np.asarray(tri_p), np.asarray(tri_r))
    assert np.all(np.asarray(tri_r) == 0)  # full coverage
    np.testing.assert_allclose(np.asarray(z_p), 0.3, atol=1e-6)


def test_huge_triangle_global_list():
    """span > LARGE_SPAN (32 tiles) routes through the XLARGE class into
    the per-tile runs (one pair per covered tile; the global list stays
    empty — it used to cost every tile an inert batch) and still
    rasterizes identically to the oracle."""
    w, h = 1920, 48  # 15 x 3 = 45 tiles at (16, 128)
    pts = np.asarray(
        [[-10, -10], [3 * w, -10], [-10, 3 * h]], np.float32
    )
    ndc = np.stack(
        [pts[:, 0] / w * 2 - 1, pts[:, 1] / h * 2 - 1,
         np.full(3, 0.3, np.float32), np.ones(3, np.float32)],
        axis=-1,
    )
    setup = triangle_setup(
        jnp.asarray(ndc), jnp.asarray([[0, 1, 2]], jnp.int32),
        jnp.ones(1, bool), w, h, cull_backface=False,
    )
    binned = bin_triangles(
        setup, tile_h=16, tile_w=128, n_tiles_x=15, n_tiles_y=3,
        max_tiles_per_tri=8, binned_cap=2048, global_cap=64,
    )
    assert int(binned.global_count) == 0
    assert int(binned.overflow) == 0
    assert np.asarray(binned.tile_count).sum() == 45
    tri_p, z_p, _, _ = rasterize(binned, width=w, height=h)
    tri_r, z_r, _, _ = rasterize_reference(setup, w, h)
    np.testing.assert_array_equal(np.asarray(tri_p), np.asarray(tri_r))
    assert np.all(np.asarray(tri_r) == 0)
    np.testing.assert_allclose(np.asarray(z_p), 0.3, atol=1e-6)


def test_perspective_w_division():
    """Triangles with varying w: depth must be NDC z/w interpolated in
    screen space."""
    clip = np.array(
        [
            [-0.5 * 2, -0.5 * 2, 0.4 * 2, 2.0],
            [0.9, -0.5, 0.45, 1.0],
            [-0.5 * 0.5, 0.9 * 0.5, 0.25 * 0.5, 0.5],
        ],
        np.float32,
    )
    (tri_p, z_p, _, _), (tri_r, z_r, _, _), _ = run_both(clip, [[0, 1, 2]])
    np.testing.assert_array_equal(np.asarray(tri_p), np.asarray(tri_r))
    cov = np.asarray(tri_r) >= 0
    assert cov.sum() > 50
    zs = np.asarray(z_r)[cov]
    assert zs.min() >= 0.2 - 1e-4 and zs.max() <= 0.5 + 1e-4


def test_behind_camera_culled():
    clip = clip_from_screen([[10, 10], [100, 10], [10, 50]], [0.5] * 3)
    clip[1, 3] = -0.5  # one vertex behind the camera plane
    setup = triangle_setup(
        jnp.asarray(clip), jnp.asarray([[0, 1, 2]], jnp.int32),
        jnp.ones(1, bool), W, H, cull_backface=False,
    )
    t, _, _, _ = rasterize_reference(setup, W, H)
    assert np.all(np.asarray(t) == -1)


def test_binning_fallback_two_key_sort_matches_packed():
    """T > 65536 disables the packed (tile<<16)|tri key; the two-key
    fallback sort must produce identical runs/rasterization.  Compare a
    small soup binned normally against the SAME soup padded with 70K
    invalid triangles (forcing the fallback path)."""
    rng = np.random.default_rng(3)
    n = 40
    pts = rng.uniform([0, 0], [W, H], size=(3 * n, 2))
    z = rng.uniform(0.1, 0.9, size=3 * n)
    clip_small = clip_from_screen(pts, z)
    idx_small = np.arange(3 * n).reshape(n, 3)

    big_t = (1 << 16) + 8
    clip_big = clip_small
    idx_big = np.zeros((big_t, 3), np.int64)
    idx_big[:n] = idx_small
    valid_big = np.zeros(big_t, bool)
    valid_big[:n] = True

    s_small = triangle_setup(
        jnp.asarray(clip_small), jnp.asarray(idx_small, jnp.int32),
        jnp.ones(n, bool), W, H, cull_backface=False,
    )
    s_big = triangle_setup(
        jnp.asarray(clip_big), jnp.asarray(idx_big, jnp.int32),
        jnp.asarray(valid_big), W, H, cull_backface=False,
    )
    kw = dict(
        tile_h=16, tile_w=128, n_tiles_x=W // 128, n_tiles_y=H // 16,
        max_tiles_per_tri=8, binned_cap=4096, global_cap=64,
    )
    b_small = bin_triangles(s_small, **kw)
    b_big = bin_triangles(s_big, **kw)
    assert int(b_small.overflow) == 0 and int(b_big.overflow) == 0
    np.testing.assert_array_equal(
        np.asarray(b_small.tile_count), np.asarray(b_big.tile_count)
    )
    tri_s, z_s, _, _ = rasterize(b_small, width=W, height=H)
    tri_b, z_b, _, _ = rasterize(b_big, width=W, height=H)
    np.testing.assert_array_equal(np.asarray(tri_s), np.asarray(tri_b))
    np.testing.assert_array_equal(np.asarray(z_s), np.asarray(z_b))


def test_slim_kernel_matches_full_exactly():
    """The 2-output fast-path kernel (select-chain winner, NaN-tie
    accept) must be BIT-identical to the full kernel on tri/z — same
    edge arithmetic, same LessOrEqual later-draw-wins arbitration."""
    rng = np.random.RandomState(7)
    n_tri = 80
    pts = rng.uniform([-30, -20], [W + 30, H + 20], size=(n_tri * 3, 2))
    z = rng.uniform(0.0, 1.0, size=n_tri * 3).astype(np.float32)
    clip = clip_from_screen(pts.astype(np.float32), z)
    idx = np.arange(n_tri * 3, dtype=np.int32).reshape(n_tri, 3)
    setup = triangle_setup(
        jnp.asarray(clip), jnp.asarray(idx), jnp.ones(n_tri, bool),
        W, H, cull_backface=False,
    )
    binned = bin_triangles(
        setup, tile_h=16, tile_w=128, n_tiles_x=W // 128,
        n_tiles_y=H // 16, max_tiles_per_tri=8,
        binned_cap=4096, global_cap=64,
    )
    tri_f, z_f, _, _ = rasterize(binned, width=W, height=H)
    tri_s, z_s, b0_s, b1_s = rasterize(binned, width=W, height=H, slim=True)
    assert b0_s is None and b1_s is None
    np.testing.assert_array_equal(np.asarray(tri_s), np.asarray(tri_f))
    np.testing.assert_array_equal(np.asarray(z_s), np.asarray(z_f))


def test_sub_tile_runs_match_whole_tile():
    """sub_y=2/4 (bin at tile_h/sub rows, one grid step per whole tile)
    must be bit-identical to sub_y=1 in every kernel mode, including a
    banded (tile_row_offset) render of the middle band."""
    rng = np.random.RandomState(11)
    n_tri = 120
    pts = rng.uniform([-30, -20], [W + 30, H + 20], size=(n_tri * 3, 2))
    z = rng.uniform(0.0, 1.0, size=n_tri * 3).astype(np.float32)
    clip = clip_from_screen(pts.astype(np.float32), z)
    idx = np.arange(n_tri * 3, dtype=np.int32).reshape(n_tri, 3)
    setup = triangle_setup(
        jnp.asarray(clip), jnp.asarray(idx), jnp.ones(n_tri, bool),
        W, H, cull_backface=False,
    )

    def bin_at(h):
        return bin_triangles(
            setup, tile_h=h, tile_w=128, n_tiles_x=W // 128,
            n_tiles_y=H // h, max_tiles_per_tri=8,
            binned_cap=8192, global_cap=64,
        )

    b1 = bin_at(32)
    ref = rasterize(b1, width=W, height=H, tile_h=32)
    for sub in (2, 4):
        b = bin_at(32 // sub)
        assert int(b.overflow) == 0
        for mode in ({}, {"slim": True}, {"depth_only": True}):
            got = rasterize(
                b, width=W, height=H, tile_h=32, sub_y=sub, **mode
            )
            np.testing.assert_array_equal(
                np.asarray(got[1]), np.asarray(ref[1]), err_msg=f"{sub} {mode}"
            )
            if not mode.get("depth_only"):
                np.testing.assert_array_equal(
                    np.asarray(got[0]), np.asarray(ref[0])
                )

    # banded render: middle 32-row band of the full-frame binning
    b2 = bin_at(16)
    _, z_band, _, _ = rasterize(
        b2, width=W, height=32, tile_h=32, sub_y=2, tile_row_offset=1,
    )
    np.testing.assert_array_equal(
        np.asarray(z_band), np.asarray(ref[1])[32:64]
    )


def test_sub_x_columns_match_single_column():
    """sub_x=2 (one grid step covers two 128-lane bin columns) must be
    bit-identical to sub_x=1 in every kernel mode, alone and combined
    with sub_y and with a banded render."""
    rng = np.random.RandomState(13)
    n_tri = 150
    pts = rng.uniform([-30, -20], [W + 30, H + 20], size=(n_tri * 3, 2))
    z = rng.uniform(0.0, 1.0, size=n_tri * 3).astype(np.float32)
    clip = clip_from_screen(pts.astype(np.float32), z)
    idx = np.arange(n_tri * 3, dtype=np.int32).reshape(n_tri, 3)
    setup = triangle_setup(
        jnp.asarray(clip), jnp.asarray(idx), jnp.ones(n_tri, bool),
        W, H, cull_backface=False,
    )

    def bin_at(h):
        return bin_triangles(
            setup, tile_h=h, tile_w=128, n_tiles_x=W // 128,
            n_tiles_y=H // h, max_tiles_per_tri=8,
            binned_cap=8192, global_cap=64,
        )

    b32 = bin_at(32)
    ref = rasterize(b32, width=W, height=H, tile_h=32)
    for mode in ({}, {"slim": True}, {"depth_only": True}):
        got = rasterize(
            b32, width=W, height=H, tile_h=32, sub_x=2, **mode
        )
        np.testing.assert_array_equal(
            np.asarray(got[1]), np.asarray(ref[1]), err_msg=f"sub_x {mode}"
        )
        if not mode.get("depth_only"):
            np.testing.assert_array_equal(
                np.asarray(got[0]), np.asarray(ref[0])
            )

    # combined sub_y x sub_x, plus a banded middle-band render
    b16 = bin_at(16)
    got = rasterize(b16, width=W, height=H, tile_h=32, sub_y=2, sub_x=2)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    _, z_band, _, _ = rasterize(
        b16, width=W, height=32, tile_h=32, sub_y=2, sub_x=2,
        tile_row_offset=1,
    )
    np.testing.assert_array_equal(
        np.asarray(z_band), np.asarray(ref[1])[32:64]
    )
