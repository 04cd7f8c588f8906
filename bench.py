"""Headline benchmark: pbr_ibl deferred PBR+IBL frame rate at 1920x1080.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver-set north-star target of 60 FPS-equivalent at 1080p on
one TPU chip (BASELINE.md — the reference publishes no numbers of its own),
so vs_baseline = fps / 60.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WIDTH, HEIGHT = 1920, 1080
WARMUP_FRAMES = 3
BENCH_FRAMES = int(os.environ.get("MO_BENCH_FRAMES", "30"))


def build_app():
    from mo_renderer_tpu.config import EngineConfig

    cfg = EngineConfig(width=WIDTH, height=HEIGHT)
    if os.path.isdir(os.path.join(cfg.resource_root, "gltf")):
        from examples.pbr_ibl import build_app as build

        return build(cfg)

    # asset-free fallback: procedural scene + synthetic sky
    from __graft_entry__ import _camera, _tiny_world
    from mo_renderer_tpu.app.application import App

    app = App.new(config=cfg)
    app.world = _tiny_world()
    app.insert_resource(_camera(cfg))
    return app


def main():
    app = build_app()
    app.resumed()
    renderer = app.renderer

    def device_frame():
        # run the runtime systems + one jitted frame, frame stays on
        # device (the reference presents on-GPU and never reads back)
        app.runtime_schedule.run(app.world)
        return renderer.render_device(app.world)

    for _ in range(WARMUP_FRAMES):
        frame = device_frame()
    np.asarray(frame[0, 0])  # sync

    t0 = time.perf_counter()
    for _ in range(BENCH_FRAMES):
        frame = device_frame()
    np.asarray(frame[0, 0])  # blocks until the last frame is computed
    elapsed = time.perf_counter() - t0

    fps = BENCH_FRAMES / elapsed
    mpix = fps * WIDTH * HEIGHT / 1e6
    from mo_renderer_tpu.passes.present import unpack_rgba8

    frame = unpack_rgba8(np.asarray(frame))
    assert frame.shape == (HEIGHT, WIDTH, 4)
    assert frame[..., :3].max() > 0, "black frame"
    renderer.check_overflow()  # no frame may have dropped geometry

    print(json.dumps({
        "metric": "pbr_ibl_1080p_fps",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
        "mpixels_per_s": round(mpix, 1),
        "frames": BENCH_FRAMES,
        "resolution": f"{WIDTH}x{HEIGHT}",
        "backend": __import__("jax").default_backend(),
    }))


if __name__ == "__main__":
    main()
