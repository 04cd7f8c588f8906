"""Scene/ECS + app-skeleton tests (reference parity: mo_ecs resources,
mo_core App API)."""

import numpy as np
import pytest

from mo_renderer_tpu.app.color import FColor
from mo_renderer_tpu.app.plugin import PluginState, PluginTrait
from mo_renderer_tpu.math.projections import look_at_rh
from mo_renderer_tpu.math.transform import Transform
from mo_renderer_tpu.scene.camera import Camera
from mo_renderer_tpu.scene.components import DirectionalLight, PointLight
from mo_renderer_tpu.scene.input import EInputButton, EInputState, Input
from mo_renderer_tpu.scene.timer import Timer
from mo_renderer_tpu.scene.world import World


def test_world_entities_and_queries():
    w = World()
    t = Transform.from_xyz(1, 2, 3)
    light = DirectionalLight()
    w.spawn((t, light))
    w.spawn((Transform.from_xyz(4, 5, 6),))

    transforms = list(w.query(Transform))
    assert len(transforms) == 2
    pairs = list(w.query(Transform, DirectionalLight))
    assert len(pairs) == 1 and pairs[0][1] is light
    # single-type query yields bare components (reference query::<&T> style)
    assert all(isinstance(x, Transform) for x in transforms)


def test_world_resources():
    w = World()
    w.init_resource(Timer)
    assert isinstance(w.resource(Timer), Timer)
    inp = Input()
    w.insert_resource(inp)
    assert w.resource(Input) is inp
    assert w.get_resource(Camera) is None


def test_timer_fixed_step():
    t = Timer()
    t.fixed_step = 1 / 60
    t.next()
    assert t.delta() == pytest.approx(1 / 60)


def test_input_state_machine():
    inp = Input()
    assert inp.button_state(EInputButton.MOUSE_RIGHT) is None
    inp.press(EInputButton.MOUSE_RIGHT)
    assert inp.button_state(EInputButton.MOUSE_RIGHT) == EInputState.ACTIVATED
    inp.release(EInputButton.MOUSE_RIGHT)
    assert inp.button_state(EInputButton.MOUSE_RIGHT) == EInputState.DEACTIVATED
    inp.move_mouse(3.0, -2.0)
    inp.move_mouse(1.0, 1.0)
    assert inp.mouse_delta() == (4.0, -1.0)


def test_camera_example_setup_looks_at_origin():
    """The pbr_ibl camera (-3,0,3) rotated 3pi/4 about Y looks toward origin
    (examples/pbr_ibl/main.rs:27-31 + camera.rs:342-350 conventions)."""
    from mo_renderer_tpu.math import quat

    cam = Camera(
        position=(-3.0, 0.0, 3.0),
        rotation=quat.from_rotation_y(np.pi * 0.75),
    )
    d = cam.direction()
    np.testing.assert_allclose(d, [np.sqrt(0.5), 0, -np.sqrt(0.5)], atol=1e-6)

    # Drive the update system once: view == look_at_rh(pos, pos+dir, up)
    w = World()
    w.insert_resource(cam)
    w.insert_resource(Input())
    timer = Timer()
    timer.fixed_step = 1 / 60
    w.insert_resource(timer)
    Timer.update_timer(w)
    Camera.update_camera(w)
    expect = look_at_rh([-3, 0, 3], [-3 + d[0], d[1], 3 + d[2]], [0, 1, 0])
    np.testing.assert_allclose(cam.view(), expect, atol=1e-5)

    # WASD movement moves along direction by MOVE_SPEED
    inp = w.resource(Input)
    inp.press(EInputButton.key("W"))
    Camera.update_camera(w)
    np.testing.assert_allclose(
        cam.position(), np.array([-3, 0, 3], np.float32) + d * 0.01, atol=1e-6
    )


def test_camera_projection_vulkan_flip():
    cam = Camera()
    cam.resize((1280, 720))
    p = cam.projection()
    assert p[1, 1] < 0  # Y flip applied
    assert p[3, 2] == -1.0


def test_directional_light_proj_view_matches_reference_construction():
    """directional_light.rs:39-62: ortho with swapped bottom/top."""
    t = Transform.from_xyz(10.0, 10.0, 10.0).looking_at([0, 0, 0])
    light = DirectionalLight(t, (1, 1, 1), 4.0, True)
    pv = light.proj_view()
    # The light center (origin) projects to NDC center with depth in (0, 1)
    p = pv @ np.array([0, 0, 0, 1], np.float32)
    ndc = p[:3] / p[3]
    np.testing.assert_allclose(ndc[:2], [0, 0], atol=1e-5)
    assert 0.0 < ndc[2] < 1.0
    # A point toward world +Y from origin must project with NDC y < 0
    # (bottom/top swapped = Vulkan y-down: up is toward the top of the image)
    q = pv @ np.array([0, 1, 0, 1], np.float32)
    assert q[1] / q[3] < 0


def test_gpu_light_packing():
    t = Transform.from_xyz(10.0, 10.0, 10.0).looking_at([0, 0, 0])
    light = DirectionalLight(t, (1, 1, 1), 4.0, True)
    row = light.gpu_light()
    assert row[0] == 0.0
    np.testing.assert_allclose(row[4:7], [10, 10, 10])
    # direction() points from target toward the light (the reference's
    # looking_at quirk) — the shader's double negation makes L = this.
    np.testing.assert_allclose(row[12:15], np.array([10, 10, 10]) / np.sqrt(300), atol=1e-6)
    np.testing.assert_allclose(row[16:20], 4.0)

    p = PointLight(Transform.from_xyz(1, 2, 3), (1, 0, 0), 2.0)
    prow = p.gpu_light()
    assert prow[0] == 1.0
    np.testing.assert_allclose(prow[8:11], [2, 0, 0])


def test_fcolor():
    c = FColor.rgb(1.0, 0.5, 0.0) * 2.0
    assert c[0] == 2.0 and c[1] == 1.0 and c[3] == 2.0
    assert FColor.from_array([1, 0, 0]) == FColor.red()


def test_app_builder_api():
    from mo_renderer_tpu.app.application import App

    app = App.new()
    app.init_resource(Timer)
    app.init_resource(Input)
    calls = []
    app.add_runtime_system(lambda w: calls.append("rt"))
    app.add_startup_system(lambda w: calls.append("st"))
    app.add_entity((Transform.from_xyz(0, 0, 0),))
    app.add_entity((DirectionalLight(),))

    class P(PluginTrait):
        def build(self, a):
            calls.append("build")

    app.add_plugin(P())
    assert calls == ["build"]
    assert app.plugins[0][1] == PluginState.ADDING
    assert len(list(app.world.query(DirectionalLight))) == 1
