"""Interactive window shell: OS events must flow through the existing
Input state machine into update_camera, and frames must blit (SURVEY §7
step 10; reference mo_core/src/application/mod.rs:178-283,
mo_vk/src/window.rs:40-156, input.rs:315-350).  Runs under SDL's dummy
video driver — no display needed."""

import os

import numpy as np
import pytest

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
pygame = pytest.importorskip("pygame")

import __graft_entry__ as graft
from mo_renderer_tpu.app.window import (
    PygameWindow,
    WindowDescriptor,
    WindowMode,
    WindowResizeConstraints,
    Windows,
    run_windowed,
)
from mo_renderer_tpu.scene.camera import Camera
from mo_renderer_tpu.scene.input import EInputButton, EInputState, Input


@pytest.fixture
def window():
    w = PygameWindow(64, 32, headless=True)
    yield w
    w.close()


def _post(**kw):
    t = kw.pop("type")
    pygame.event.post(pygame.event.Event(t, **kw))


def test_key_and_mouse_events_reach_input(window):
    inp = Input()
    _post(type=pygame.KEYDOWN, key=pygame.K_w)
    _post(type=pygame.MOUSEBUTTONDOWN, button=3, pos=(5, 5))
    _post(type=pygame.MOUSEMOTION, rel=(7.0, -3.0), pos=(12, 2), buttons=(0, 0, 1))
    assert window.pump(inp)
    assert inp.is_activated(EInputButton.key("W"))
    assert inp.button_state(EInputButton.MOUSE_RIGHT) == EInputState.ACTIVATED
    assert inp.mouse_delta() == (7.0, -3.0)

    _post(type=pygame.KEYUP, key=pygame.K_w)
    _post(type=pygame.MOUSEBUTTONUP, button=3, pos=(5, 5))
    assert window.pump(inp)
    assert inp.button_state(EInputButton.key("W")) == EInputState.DEACTIVATED


def test_escape_and_quit_end_the_loop(window):
    inp = Input()
    _post(type=pygame.KEYDOWN, key=pygame.K_ESCAPE)
    assert not window.pump(inp)
    _post(type=pygame.QUIT)
    assert not window.pump(inp)


def _tiny_app():
    from mo_renderer_tpu.app.application import App
    from mo_renderer_tpu.scene.timer import Timer

    cfg = graft._tiny_config()
    app = App(config=cfg)
    app.init_resource(Timer)
    app.init_resource(Input)
    app.add_runtime_system(Timer.update_timer)
    app.add_runtime_system(Camera.update_camera)
    app.insert_resource(graft._camera(cfg))
    tiny = graft._tiny_world()
    for comps in tiny._entities.values():
        app.world.spawn(tuple(comps.values()))
    app.world.insert_resource(graft._tiny_ibl())
    return app


def test_modifiers_reach_input(window):
    """ModifiersChanged analog (input.rs:331-335): modifier state must be
    mirrored into Input.modifiers on key events."""
    inp = Input()
    pygame.key.set_mods(pygame.KMOD_LSHIFT | pygame.KMOD_LCTRL)
    _post(type=pygame.KEYDOWN, key=pygame.K_w)
    assert window.pump(inp)
    assert "Shift" in inp.modifiers and "Ctrl" in inp.modifiers
    pygame.key.set_mods(0)
    _post(type=pygame.KEYUP, key=pygame.K_w)
    assert window.pump(inp)
    assert inp.modifiers == set()


def test_window_descriptor_modes_and_constraints():
    """WindowDescriptor -> pygame flags (window.rs:48-105) and resize
    constraint sanitation (window.rs:398-424)."""
    d = WindowDescriptor(mode=WindowMode.FULLSCREEN)
    assert d.pygame_flags(pygame) & pygame.FULLSCREEN
    d = WindowDescriptor(mode=WindowMode.BORDERLESS_FULLSCREEN)
    assert d.pygame_flags(pygame) & pygame.NOFRAME
    d = WindowDescriptor(decorations=False, resizable=True)
    flags = d.pygame_flags(pygame)
    assert flags & pygame.NOFRAME and flags & pygame.RESIZABLE

    c = WindowResizeConstraints(min_width=400, max_width=200,
                                min_height=-5, max_height=300)
    cc = c.check_constraints()
    assert cc.max_width == 400 and cc.min_height == 1.0
    assert c.clamp(1000, 50) == (400, 50)


def test_windows_manager_map():
    """VulkanoWindows analog (window.rs:32-160): id->window map with a
    primary; removal re-elects the primary."""
    mgr = Windows()
    w1 = mgr.create_window(WindowDescriptor(width=64, height=32,
                                            resize_constraints=WindowResizeConstraints(1, 1)),
                           renderer="r1", headless=True)
    w2 = mgr.create_window(WindowDescriptor(width=32, height=16), renderer="r2")
    assert len(mgr) == 2
    assert mgr.get_primary_window() is mgr.get_window(w1)
    assert mgr.get_primary_renderer() == "r1"
    assert mgr.get_renderer(w2) == "r2"
    # secondary windows present to an offscreen surface
    frame = np.zeros((16, 32, 4), np.uint8)
    mgr.get_window(w2).present(frame)
    assert mgr.get_window(w2).frame is frame
    mgr.remove_window(w1)
    assert mgr.get_primary_window() is mgr.get_window(w2)
    mgr.remove_window(w2)
    assert len(mgr) == 0


def test_live_resize_recreates_swapchain():
    """A VIDEORESIZE mid-loop must flow through the swapchain-recreate
    analog: Camera.resize + Renderer.resize, with the next frame rendered
    at the new (constraint-clamped) size (mo_vk/src/lib.rs:352-388)."""
    app = _tiny_app()
    app.resumed()

    seen = []
    win = PygameWindow(app.config.width, app.config.height, headless=True)

    class Recorder:
        def present(self, frame):
            seen.append(frame.shape)
            win.present(frame)

        def __getattr__(self, name):
            return getattr(win, name)

    try:
        _post(type=pygame.VIDEORESIZE, size=(384, 160), w=384, h=160)
        shown = run_windowed(app, window=Recorder(), max_frames=2)
    finally:
        win.close()
    assert shown == 2
    assert app.renderer.config.width == 384
    assert app.renderer.config.height == 160
    cam = app.world.get_resource(Camera)
    assert abs(cam.aspect() - 384.0 / 160.0) < 1e-6
    assert seen[-1][:2] == (160, 384), seen


def test_present_divisor_fetches_downscaled_frames():
    """present_divisor=2 must present (H/2, W/2) frames (the device-side
    decimation before the host fetch) and upscale in the blit."""
    app = _tiny_app()
    app.resumed()
    seen = []
    win = PygameWindow(app.config.width, app.config.height, headless=True)

    class Recorder:
        def present(self, frame):
            seen.append(frame.shape)
            win.present(frame)

        def __getattr__(self, name):
            return getattr(win, name)

    try:
        shown = run_windowed(app, window=Recorder(), max_frames=1,
                             present_divisor=2)
    finally:
        win.close()
    assert shown == 1
    assert seen == [(app.config.height // 2, app.config.width // 2, 4)]


def test_windowed_flight_moves_the_camera():
    """Two frames of held-W flight through the real frame loop: the
    camera must advance along its direction and frames must present."""
    app = _tiny_app()
    app.resumed()
    cam = app.world.get_resource(Camera)
    p0 = np.array(cam.transform.translation, np.float32).copy()

    win = PygameWindow(app.config.width, app.config.height, headless=True)
    try:
        _post(type=pygame.KEYDOWN, key=pygame.K_w)
        shown = run_windowed(app, window=win, max_frames=2)
    finally:
        win.close()
    assert shown == 2
    p1 = np.array(cam.transform.translation, np.float32)
    assert np.linalg.norm(p1 - p0) > 0.0, "held W did not move the camera"
