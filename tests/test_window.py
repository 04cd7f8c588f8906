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
from mo_renderer_tpu.app.window import PygameWindow, run_windowed
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
