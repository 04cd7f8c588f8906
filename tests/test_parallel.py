"""Multi-view sharded rendering on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

import __graft_entry__ as graft
from mo_renderer_tpu.parallel import MultiViewRenderer, make_view_mesh


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = graft._tiny_config()
    world = graft._tiny_world()
    return cfg, world


def test_graft_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (128, 256)  # packed-rgba8 uint32 (present.py)
    assert out.dtype == np.uint32
    # scene objects cover some pixels; sky covers the rest (non-black)
    from mo_renderer_tpu.passes.present import unpack_rgba8

    host = unpack_rgba8(np.asarray(out))
    assert (host[..., :3].sum(-1) > 0).mean() > 0.9


def test_multiview_all_devices(tiny_setup):
    cfg, world = tiny_setup
    n = len(jax.devices())
    assert n == 8, "conftest should force 8 virtual CPU devices"
    mesh = make_view_mesh()
    mv = MultiViewRenderer(cfg, mesh)
    cams = [graft._camera(cfg, angle=2 * np.pi * i / n) for i in range(n)]
    frames = mv.render_views(cams, world)
    assert frames.shape == (n, cfg.height, cfg.width, 4)
    # different cameras -> different images
    assert not np.array_equal(frames[0], frames[n // 2])


def test_multiview_pads_to_mesh(tiny_setup):
    cfg, world = tiny_setup
    mesh = make_view_mesh(jax.devices()[:4])
    mv = MultiViewRenderer(cfg, mesh)
    cams = [graft._camera(cfg, angle=0.5 * i) for i in range(3)]  # 3 < 4
    frames = mv.render_views(cams, world)
    assert frames.shape == (3, cfg.height, cfg.width, 4)


def test_graft_dryrun_multichip_small():
    """The driver's multichip dry run (both mesh axes) on 2 devices."""
    graft.dryrun_multichip(2)


def test_tile_sharded_matches_single():
    """Row-sharded frame (8 bands + SSAO halo exchange) vs unsharded.

    Everything is pixel-local except SSAO (which gets REAL halo rows, so
    it matches exactly) and the half-res upsamplers, which interpolate
    within a band: only a <=1-row seam per band boundary may differ."""
    import dataclasses

    from mo_renderer_tpu.parallel import TileShardedRenderer, make_view_mesh
    from mo_renderer_tpu.passes.frame_graph import Renderer

    # tall enough that each of the 8 bands exceeds the SSAO halo rows;
    # cb off: the row-sharded program never checkerboards, so the
    # single-device frame it is pinned against must not either
    # ...and at full-rate SSAO (the sharded path's halo exchange is
    # sized for full rate)
    cfg = dataclasses.replace(
        graft._tiny_config(), height=256, checkerboard=False,
        ssao_res_divisor=1,
    )
    world = graft._tiny_world()
    world.insert_resource(graft._camera(cfg))

    r = Renderer(cfg)
    r.prepare(world)
    single = r.render(world)

    ts = TileShardedRenderer(cfg, make_view_mesh(axis_name="rows"))
    ts.prepare(world)
    sharded = ts.render(world)

    assert sharded.shape == single.shape
    diff = np.abs(sharded.astype(int) - single.astype(int))[..., :3]
    assert diff.mean() < 0.05, f"mean |diff| {diff.mean()}"
    # differing pixels confined to band-boundary seam rows
    bad_rows = np.unique(np.where(diff.max(axis=(1, 2)) > 0)[0])
    assert len(bad_rows) <= 2 * 8, f"diff rows {bad_rows}"


def test_tile_sharded_matches_single_checkerboard():
    """Same pin with checkerboard shading ON in both (the production
    default): band-local decimate/reconstruct must reproduce the
    single-device cb frame except for the documented seam rows
    (reconstruction's up/down neighbors clamp at band edges)."""
    import dataclasses

    from mo_renderer_tpu.parallel import TileShardedRenderer, make_view_mesh
    from mo_renderer_tpu.passes.frame_graph import Renderer

    # full-rate SSAO on the single side (the sharded path's halo
    # exchange is full-rate by construction)
    cfg = dataclasses.replace(
        graft._tiny_config(), height=256, checkerboard=True,
        ssao_res_divisor=1,
    )
    world = graft._tiny_world()
    world.insert_resource(graft._camera(cfg))

    r = Renderer(cfg)
    r.prepare(world)
    single = r.render(world)

    ts = TileShardedRenderer(cfg, make_view_mesh(axis_name="rows"))
    ts.prepare(world)
    sharded = ts.render(world)

    assert sharded.shape == single.shape
    diff = np.abs(sharded.astype(int) - single.astype(int))[..., :3]
    assert diff.mean() < 0.08, f"mean |diff| {diff.mean()}"
    bad_rows = np.unique(np.where(diff.max(axis=(1, 2)) > 0)[0])
    # <=2 seam rows per boundary (upsamplers + cb reconstruction)
    assert len(bad_rows) <= 4 * 8, f"diff rows {bad_rows}"


def test_multiview_sequence_matches_per_step(tiny_setup):
    """The scanned camera-path renderer (K steps per dispatch) must be
    bit-identical to K per-step render_views_device dispatches."""
    cfg, world = tiny_setup
    from mo_renderer_tpu.passes.frame_graph import build_camera_params
    from mo_renderer_tpu.scene.scene_buffers import find_shadow_light

    mesh = make_view_mesh(jax.devices()[:2])
    mv = MultiViewRenderer(cfg, mesh)
    mv.prepare(world)
    light_pv, _ = find_shadow_light(world)
    k, v = 3, 2
    rigs = [
        [graft._camera(cfg, angle=0.4 * s + 1.5 * i) for i in range(v)]
        for s in range(k)
    ]
    steps = [
        [build_camera_params(c, light_pv) for c in rig] for rig in rigs
    ]
    seq = np.asarray(mv.render_view_sequence_device(steps, world))
    assert seq.shape[:2] == (k, v)
    for s in range(k):
        per_step = np.asarray(mv.render_views_device(rigs[s], world))
        np.testing.assert_array_equal(seq[s], per_step, err_msg=f"step {s}")
    mv.check_overflow()


def test_multiview_matches_single_view(tiny_setup):
    cfg, world = tiny_setup
    from mo_renderer_tpu.passes.frame_graph import Renderer

    cam = graft._camera(cfg, angle=1.0)
    mesh = make_view_mesh(jax.devices()[:2])
    mv = MultiViewRenderer(cfg, mesh)
    frames = mv.render_views([cam, cam], world)

    r = Renderer(cfg)
    r.prepare(world)
    world.insert_resource(cam)
    single = r.render(world)
    np.testing.assert_array_equal(frames[0], single)
    np.testing.assert_array_equal(frames[1], single)
