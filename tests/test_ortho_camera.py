"""Orthographic camera path, end-to-end (VERDICT r3 #7).

The reference ships orthographic camera settings alongside perspective
(mo_ecs/src/resource/camera.rs:53-69, :20-27) but never exercises them in
an example.  These tests render real frames through the full deferred
stack with ``CameraSettings.new_orthographic`` and pin the projection's
defining property: projected size is independent of depth (no
foreshortening), while the same scene under a perspective camera
foreshortens.  Asset-free (procedural cubes), CPU.
"""

import numpy as np

from mo_renderer_tpu.assets.procedural import procedural_model
from mo_renderer_tpu.config import EngineConfig
from mo_renderer_tpu.math.transform import Transform
from mo_renderer_tpu.passes.frame_graph import Renderer
from mo_renderer_tpu.scene.camera import Camera, CameraSettings
from mo_renderer_tpu.scene.components import DirectionalLight
from mo_renderer_tpu.scene.world import World


W, H = 256, 128


def _world():
    world = World()
    # two identical cubes, one 6 units deeper than the other
    world.spawn((
        Transform.from_xyz(-0.5, 0.0, 2.0),
        procedural_model("cube", size=0.6),
    ))
    world.spawn((
        Transform.from_xyz(0.5, 0.0, 8.0),
        procedural_model("cube", size=0.6),
    ))
    world.spawn((DirectionalLight(
        Transform.from_xyz(3.0, 8.0, -2.0).looking_at((0.0, 0.0, 4.0)),
        (1.0, 1.0, 1.0), 4.0, True,
    ),))
    return world


def _camera(kind):
    # identity rotation: direction = +Z (transform.rs:161), so the camera
    # at z=-4 looks at both cubes down the +Z axis
    cam = Camera(position=(0.0, 0.0, -4.0))
    if kind == "orthographic":
        cam.settings = CameraSettings(
            "orthographic", height=4.0, near=0.1, far=100.0
        )
    cam.resize((W, H))
    return cam


def _render(kind):
    cfg = EngineConfig(
        width=W, height=H, shadow_map_size=256, ssao_enabled=False
    )
    world = _world()
    world.insert_resource(_camera(kind))
    r = Renderer(cfg)
    r.prepare(world)
    return r.render(world)


def _cube_extents(frame):
    """(width_px, height_px) of the lit silhouette in each half-frame."""
    lit = frame[..., :3].sum(-1) > 0
    out = []
    for half in (lit[:, : W // 2], lit[:, W // 2 :]):
        ys, xs = np.nonzero(half)
        assert len(xs) > 0, "cube not visible"
        out.append((xs.max() - xs.min() + 1, ys.max() - ys.min() + 1))
    return out


def test_orthographic_no_foreshortening():
    frame = _render("orthographic")
    assert frame.shape == (H, W, 4)
    (w_near, h_near), (w_far, h_far) = _cube_extents(frame)
    # identical projected size regardless of depth (within a pixel of
    # rasterization noise on each edge)
    assert abs(w_near - w_far) <= 2, (w_near, w_far)
    assert abs(h_near - h_far) <= 2, (h_near, h_far)
    # the ortho projection actually scaled the cube to the configured
    # volume: height 4 world units over 128 px -> 0.6 units ~ 19 px
    assert 15 <= h_near <= 24, h_near


def test_perspective_foreshortens_same_scene():
    frame = _render("perspective")
    # side-agnostic (screen-right maps to world -X): the far cube
    # (12 units away vs 6) must project ~half the size of the near one
    (w_a, h_a), (w_b, h_b) = _cube_extents(frame)
    assert min(w_a, w_b) < 0.75 * max(w_a, w_b), (w_a, w_b)
    assert min(h_a, h_b) < 0.75 * max(h_a, h_b), (h_a, h_b)


def test_orthographic_depth_order_correct():
    """Depth testing still orders surfaces under the ortho projection:
    move the far cube in front of the near one along the same ray; the
    overlapping pixels must show the closer cube's depth."""
    cfg = EngineConfig(
        width=W, height=H, shadow_map_size=256, ssao_enabled=False
    )
    world = World()
    world.spawn((
        Transform.from_xyz(0.0, 0.0, 3.0),
        procedural_model("cube", size=0.6, base_color=(1.0, 0.0, 0.0, 1.0)),
    ))
    world.spawn((
        Transform.from_xyz(0.0, 0.0, 6.0),
        procedural_model("cube", size=1.2, base_color=(0.0, 0.0, 1.0, 1.0)),
    ))
    world.spawn((DirectionalLight(
        Transform.from_xyz(0.0, 2.0, -6.0).looking_at((0.0, 0.0, 3.0)),
        (1.0, 1.0, 1.0), 4.0, True,
    ),))
    world.insert_resource(_camera("orthographic"))
    r = Renderer(cfg)
    r.prepare(world)
    frame = r.render(world)
    center = frame[H // 2 - 4 : H // 2 + 4, W // 2 - 4 : W // 2 + 4, :3]
    # the small red cube is closer: center pixels are red, not blue
    assert center[..., 0].mean() > center[..., 2].mean()
