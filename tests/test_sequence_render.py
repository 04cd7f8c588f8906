"""K-frames-per-dispatch rendering (Renderer.render_sequence_device):
lax.scan over stacked camera params must reproduce the per-frame path
bit-exactly — it is the same frame_program, only the dispatch is
amortized (NOTES_PERF.md: ~3-4ms per-call floor on the remote backend)."""

import numpy as np

import __graft_entry__ as graft
from mo_renderer_tpu.passes.frame_graph import (
    Renderer,
    build_camera_params,
)
from mo_renderer_tpu.passes.present import unpack_rgba8
from mo_renderer_tpu.scene.camera import Camera
from mo_renderer_tpu.scene.scene_buffers import find_shadow_light


def test_sequence_matches_per_frame_dispatch():
    cfg = graft._tiny_config()
    world = graft._tiny_world()
    world.insert_resource(graft._camera(cfg))
    r = Renderer(cfg)
    r.prepare(world)

    camera = world.resource(Camera)
    light_pv, _ = find_shadow_light(world)
    base = np.asarray(camera.transform.translation, np.float64).copy()

    params, singles = [], []
    for i in range(3):
        camera.transform.translation = (
            base + np.array([0.1 * i, 0.0, 0.0])
        ).astype(np.float32)
        camera.refresh_view()
        params.append(build_camera_params(camera, light_pv))
        singles.append(np.asarray(r.render_device(world)))

    frames = np.asarray(r.render_sequence_device(world, params))
    assert frames.shape == (3,) + singles[0].shape
    for i in range(3):
        np.testing.assert_array_equal(frames[i], singles[i])
    # frames along the path genuinely differ (the camera moved)
    assert not np.array_equal(frames[0], frames[1])
    r.check_overflow()
    # fetched frames decode to sane rgba
    img = unpack_rgba8(frames[0])
    assert img.shape[-1] == 4 and img[..., :3].max() > 0
