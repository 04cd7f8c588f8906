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


def _path_params(app, n):
    """n distinct per-frame camera params along a gentle orbit — a real
    animated camera path (every frame renders different pixels)."""
    import math

    from mo_renderer_tpu.passes.frame_graph import build_camera_params
    from mo_renderer_tpu.scene.camera import Camera
    from mo_renderer_tpu.scene.scene_buffers import find_shadow_light

    camera = app.world.resource(Camera)
    light_pv, _ = find_shadow_light(app.world)
    base = np.asarray(camera.transform.translation, np.float64).copy()
    out = []
    for i in range(n):
        a = 2.0 * math.pi * i / max(n, 1)
        camera.transform.translation = (
            base + 0.05 * np.array([math.sin(a), 0.0, math.cos(a) - 1.0])
        ).astype(np.float32)
        camera.refresh_view()
        out.append(build_camera_params(camera, light_pv))
    camera.transform.translation = base.astype(np.float32)
    camera.refresh_view()
    return out


def _self_watchdog() -> int:
    """Re-exec the bench in a monitored child, retrying wedged attempts.

    The remote TPU backend intermittently wedges a fresh process before
    its first device op (~0 CPU forever; CLAUDE.md).  To keep unattended
    invocations reliable, the parent spawns `bench.py` with
    MO_BENCH_DIRECT=1 and kills+retries any attempt that sits below
    ~15s cumulative CPU after 150s of wall (a healthy run is busy
    packing/tracing by then).  The child's stdout (the JSON line)
    streams through.
    """
    import subprocess

    me = os.path.abspath(__file__)
    env = dict(os.environ, MO_BENCH_DIRECT="1")
    retries = int(os.environ.get("MO_RETRIES", "8"))
    window = float(os.environ.get("MO_WEDGE_WINDOW", "150"))
    min_cpu = float(os.environ.get("MO_WEDGE_MIN_CPU", "15"))

    def cpu_seconds(pid):
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            return (int(parts[13]) + int(parts[14])) / os.sysconf("SC_CLK_TCK")
        except (OSError, IndexError, ValueError):
            return -1.0

    for _ in range(retries):
        p = subprocess.Popen([sys.executable, me], env=env)
        t0 = time.time()
        while True:
            rc = p.poll()
            if rc is not None:
                if rc == 0:
                    # stderr only: the child's JSON line must stay the
                    # last thing on stdout for line-parsing callers
                    print("bench: ok", file=sys.stderr)
                    return 0
                break  # real failure: retry
            if time.time() - t0 > window and cpu_seconds(p.pid) < min_cpu:
                p.kill()
                p.wait()
                break  # wedged: retry
            time.sleep(10)
        time.sleep(15)
    print("bench: exhausted retries (backend wedged)", file=sys.stderr)
    return 1


def main():
    app = build_app()
    app.resumed()
    renderer = app.renderer

    # MO_BENCH_SEQ=K renders K frames per dispatch (lax.scan over stacked
    # camera params, Renderer.render_sequence_device).  Default 1: K=10
    # measured SLOWER in round 3 (42.8 vs 47.9 fps — each scanned frame
    # re-rastered the shadow map then) and a statistical TIE in round 4
    # (65.77 vs 65.95 with the memoized shadow table feeding the scan):
    # per-frame dispatches pipeline fully on this backend, so scanning
    # buys nothing and costs a (K, H, W) output allocation.
    seq = int(os.environ.get("MO_BENCH_SEQ", "1"))

    def device_frame():
        # run the runtime systems + one jitted frame, frame stays on
        # device (the reference presents on-GPU and never reads back)
        app.runtime_schedule.run(app.world)
        return renderer.render_device(app.world)

    if seq > 1:
        path = _path_params(app, seq)
        frames = renderer.render_sequence_device(app.world, path)
        np.asarray(frames[0, 0, 0])  # sync (warm)
        n_dispatch = max(1, BENCH_FRAMES // seq)
        t0 = time.perf_counter()
        for _ in range(n_dispatch):
            frames = renderer.render_sequence_device(app.world, path)
        np.asarray(frames[0, 0, 0])
        elapsed = time.perf_counter() - t0
        n_frames = n_dispatch * seq
        frame = frames[-1]
    else:
        for _ in range(WARMUP_FRAMES):
            frame = device_frame()
        np.asarray(frame[0, 0])  # sync

        t0 = time.perf_counter()
        for _ in range(BENCH_FRAMES):
            frame = device_frame()
        np.asarray(frame[0, 0])  # blocks until the last frame is computed
        elapsed = time.perf_counter() - t0
        n_frames = BENCH_FRAMES

    fps = n_frames / elapsed
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
        "frames": n_frames,
        "frames_per_dispatch": seq,
        "resolution": f"{WIDTH}x{HEIGHT}",
        "backend": __import__("jax").default_backend(),
    }))


if __name__ == "__main__":
    if os.environ.get("MO_BENCH_DIRECT") or sys.platform != "linux":
        main()
    else:
        sys.exit(_self_watchdog())
