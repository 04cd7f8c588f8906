"""Every EngineConfig knob must be live: overflow surfacing via
binned_cap, SSAO near/far threading, camera speed trio, capacity caps,
and the resize (swapchain-recreate analog) API."""

import dataclasses

import numpy as np
import pytest

import __graft_entry__ as graft
from mo_renderer_tpu.assets.procedural import procedural_model
from mo_renderer_tpu.config import EngineConfig
from mo_renderer_tpu.math.transform import Transform
from mo_renderer_tpu.passes.frame_graph import Renderer
from mo_renderer_tpu.scene.components import DirectionalLight
from mo_renderer_tpu.scene.world import World


def _world(cfg):
    world = graft._tiny_world()
    world.insert_resource(graft._camera(cfg))
    return world


def test_binned_cap_overflow_raises():
    """An undersized pair table must raise, never silently drop geometry
    (SURVEY §7 hard-part 1)."""
    cfg = dataclasses.replace(graft._tiny_config(), binned_cap=8)
    world = _world(cfg)
    r = Renderer(cfg)
    r.prepare(world)
    assert r._binned_cap == 8
    with pytest.raises(RuntimeError, match="bin overflow"):
        r.render(world)


def test_default_cap_no_overflow():
    cfg = graft._tiny_config()
    world = _world(cfg)
    r = Renderer(cfg)
    r.prepare(world)
    r.render(world)
    r.check_overflow()  # second drain is a no-op


def test_ssao_far_changes_image():
    cfg = graft._tiny_config()
    world = _world(cfg)
    r = Renderer(cfg)
    r.prepare(world)
    f0 = r.render(world)

    cfg2 = dataclasses.replace(cfg, ssao_far=10.0)
    r2 = Renderer(cfg2)
    r2.prepare(world)
    f1 = r2.render(world)
    assert not np.array_equal(f0, f1), "ssao_far must affect the image"

    # ssao disabled -> far is irrelevant
    cfg3 = dataclasses.replace(cfg, ssao_enabled=False)
    cfg4 = dataclasses.replace(cfg3, ssao_far=10.0)
    ra, rb = Renderer(cfg3), Renderer(cfg4)
    ra.prepare(world)
    rb.prepare(world)
    np.testing.assert_array_equal(ra.render(world), rb.render(world))


def test_camera_speed_config_applied():
    from mo_renderer_tpu.app.application import App
    from mo_renderer_tpu.scene.camera import Camera
    from mo_renderer_tpu.scene.input import EInputButton, Input
    from mo_renderer_tpu.scene.timer import Timer

    cfg = dataclasses.replace(graft._tiny_config(), move_speed=0.5)
    app = App.new(config=cfg)
    app.world = _world(cfg)
    timer = Timer()
    timer.fixed_step = 0.1
    app.insert_resource(timer)
    app.insert_resource(Input())
    app.resumed()

    cam: Camera = app.world.resource(Camera)
    assert cam.move_speed == 0.5  # filled from config

    timer: Timer = app.world.resource(Timer)
    timer.next()
    inp: Input = app.world.resource(Input)
    inp.press(EInputButton.key("W"))
    p0 = cam.position().copy()
    Camera.update_camera(app.world)
    moved = np.linalg.norm(cam.position() - p0)
    assert moved == pytest.approx(0.5, rel=1e-5)

    # an explicit user-set value wins over config
    cam2 = Camera(position=(0, 0, 0))
    cam2.move_speed = 0.25
    app.world.insert_resource(cam2)
    app._resumed = False
    app.resumed()
    assert cam2.move_speed == 0.25


def test_capacity_caps_enforced():
    cfg = dataclasses.replace(graft._tiny_config(), max_meshes=2)
    world = World()
    for i in range(3):
        world.spawn((
            Transform.from_xyz(float(i), 0.0, 0.0),
            procedural_model("cube"),
        ))
    world.spawn((DirectionalLight(
        Transform.from_xyz(5.0, 8.0, 5.0).looking_at((0.0, 0.0, 0.0)),
        (1.0, 1.0, 1.0), 4.0, True,
    ),))
    world.insert_resource(graft._tiny_ibl())
    r = Renderer(cfg)
    with pytest.raises(ValueError, match="max_meshes"):
        r.prepare(world)

    cfg2 = dataclasses.replace(graft._tiny_config(), max_materials=1)
    r2 = Renderer(cfg2)
    with pytest.raises(ValueError, match="max_materials"):
        r2.prepare(world)


def test_renderer_resize():
    """One Renderer renders correctly at two resolutions
    (on_swapchain_recreate analog, mo_vk/src/lib.rs:352-388)."""
    cfg = graft._tiny_config()
    world = _world(cfg)
    r = Renderer(cfg)
    r.prepare(world)
    f0 = r.render(world)
    assert f0.shape == (cfg.height, cfg.width, 4)

    r.resize(320, 192)
    cam = graft._camera(dataclasses.replace(cfg, width=320, height=192))
    world.insert_resource(cam)
    f1 = r.render(world)
    assert f1.shape == (192, 320, 4)
    # still a real image: sky everywhere -> non-black
    assert (f1[..., :3].sum(-1) > 0).mean() > 0.99

    # back to the original size: matches the first frame exactly
    r.resize(cfg.width, cfg.height)
    world.insert_resource(graft._camera(cfg))
    f2 = r.render(world)
    np.testing.assert_array_equal(f0, f2)


# --- sharded-path knob sweep (VERDICT r4 #2) ---------------------------
# Every image-affecting EngineConfig knob must take effect in BOTH
# multi-chip paths, not just the single-chip Renderer.  The oracle is
# the single-chip frame rendered with the SAME non-default config:
#  - MultiViewRenderer runs the identical frame_program per view, so it
#    must match bit-exactly;
#  - TileShardedRenderer matches except the documented <=2 seam rows per
#    band boundary — if a knob were silently dropped (the round-4
#    ssao_near/far bug, tile_sharding.py), the divergence covers the
#    whole image and the seam-row bound fails.
# The `_knob_is_live` guard renders the default config once and asserts
# each swept knob really changes the single-chip image, so a knob dying
# EVERYWHERE cannot make the oracle comparison vacuously pass.

_SHARDED_BASE = dict(height=256, checkerboard=False, ssao_res_divisor=1)
_KNOB_SWEEPS = [
    # the exact round-4 gap: non-default SSAO linearization range
    {"ssao_near": 0.3, "ssao_far": 20.0},
    # pass toggles consumed inside the sharded frame body
    {"ssao_enabled": False},
    {"shadow_enabled": False},
    # shadow raster bias (threaded through the banded shadow path);
    # const units are 2^-23 depth quanta (polygon-offset semantics), so
    # a visible image change needs a large value
    {"shadow_depth_bias_const": 2.0e5, "shadow_depth_bias_slope": 16.0},
    # half-res PCF divisor (threaded through shading_pass_fast)
    {"pcf_res_divisor": 2},
]


@pytest.fixture(scope="module")
def sharded_sweep_setup():
    import dataclasses as dc

    cfg0 = dc.replace(graft._tiny_config(), **_SHARDED_BASE)
    world = _world(cfg0)
    r0 = Renderer(cfg0)
    r0.prepare(world)
    return cfg0, world, r0.render(world)


@pytest.mark.parametrize(
    "knobs", _KNOB_SWEEPS, ids=lambda k: ",".join(sorted(k))
)
def test_sharded_paths_consume_config(knobs, sharded_sweep_setup):
    import dataclasses as dc

    import jax

    from mo_renderer_tpu.parallel import (
        MultiViewRenderer,
        TileShardedRenderer,
        make_view_mesh,
    )

    cfg0, world, f_default = sharded_sweep_setup
    cfg = dc.replace(cfg0, **knobs)

    r = Renderer(cfg)
    r.prepare(world)
    single = r.render(world)
    assert not np.array_equal(single, f_default), (
        f"knob(s) {knobs} do not affect the single-chip image — "
        "the sharded oracle comparison would be vacuous"
    )

    ts = TileShardedRenderer(cfg, make_view_mesh(axis_name="rows"))
    ts.prepare(world)
    sharded = ts.render(world)
    diff = np.abs(sharded.astype(int) - single.astype(int))[..., :3]
    bad_rows = np.unique(np.where(diff.max(axis=(1, 2)) > 0)[0])
    assert len(bad_rows) <= 2 * 8, (
        f"row-sharded frame diverges beyond band seams under {knobs}: "
        f"{len(bad_rows)} differing rows (knob dropped by the sharded "
        f"path?)"
    )

    from mo_renderer_tpu.scene.camera import Camera

    mesh = make_view_mesh(jax.devices()[:2])
    mv = MultiViewRenderer(cfg, mesh)
    cam = world.resource(Camera)
    frames = mv.render_views([cam, cam], world)
    np.testing.assert_array_equal(
        frames[0], single,
        err_msg=f"multi-view frame != single-chip frame under {knobs}",
    )


def test_custom_pass_sees_full_resolution_context():
    """The RenderPass API promises a FULL-resolution frame context even
    under the checkerboard default: cfg.checkerboard must be disabled
    when extra passes are present (a custom screen-space pass silently
    operating on the (H, W/2) parity-shuffled domain would corrupt the
    frame with no error)."""
    from mo_renderer_tpu.passes.frame_graph import RenderPass

    cfg = graft._tiny_config()
    assert cfg.checkerboard  # the default this test guards against
    world = _world(cfg)

    seen = {}

    class Probe(RenderPass):
        def render(self, ctx):
            seen["color"] = ctx["color"].shape
            seen["ssao"] = ctx["ssao"].shape
            seen["gbuffer"] = ctx["gbuffer"].depth.shape
            # dim the frame so the pass's effect is observable
            ctx = dict(ctx)
            ctx["color"] = ctx["color"] * 0.5
            return ctx

    r = Renderer(cfg, extra_passes=[Probe()])
    r.prepare(world)
    frame = r.render(world)

    pad_hw = (r.pad_h, r.pad_w)
    assert seen["color"][:2] == pad_hw, seen
    assert seen["ssao"][:2] == pad_hw, seen
    assert seen["gbuffer"][:2] == pad_hw, seen

    baseline = Renderer(cfg)
    baseline.prepare(world)
    f0 = baseline.render(world)
    # the probe dims the image: the custom pass must actually run
    assert frame[..., :3].astype(int).sum() < f0[..., :3].astype(int).sum()
