"""Break down bench.py's per-frame HOST cost (runtime systems + the
render_device bookkeeping around the jit call).

perf_dispatch_overhead measured the raw _frame_fn pipelined loop at
16.7ms/frame; bench.py reads ~20ms — this script attributes the gap.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("MO_MODEL", "man.glb")

import numpy as np

from examples.pbr_ibl import build_app
from mo_renderer_tpu.config import EngineConfig


def t(label, fn, n=60):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(f"{label:40s} {dt*1e3:7.3f} ms/frame", flush=True)
    return dt


def main():
    cfg = EngineConfig(width=1920, height=1080)
    app = build_app(cfg)
    app.resumed()
    r = app.renderer

    from mo_renderer_tpu.scene.scene_buffers import refresh_transforms

    # warm the frame
    f = r.render_device(app.world)
    np.asarray(f[0, 0])

    t("runtime_schedule.run", lambda: app.runtime_schedule.run(app.world))
    t("refresh_transforms", lambda: refresh_transforms(r.scene))
    t("frame_params", lambda: r.frame_params(app.world))
    t("ibl.maps()", lambda: r.ibl.maps())

    params, has_light = r.frame_params(app.world)
    ibl = r.ibl.maps()
    t("_frame_fn issue only",
      lambda: r._frame_fn(r.scene, ibl, params, None,
                          has_shadow_light=has_light))
    t("render_device (full)", lambda: r.render_device(app.world))

    # e2e pipelined, bench-style
    def device_frame():
        app.runtime_schedule.run(app.world)
        return r.render_device(app.world)

    for trial in range(3):
        t0 = time.perf_counter()
        for _ in range(30):
            f = device_frame()
        np.asarray(f[0, 0])
        dt = (time.perf_counter() - t0) / 30
        print(f"bench-style e2e trial {trial}: {dt*1e3:7.2f} ms/frame",
              flush=True)
    # validate the timed frames rendered full geometry (bench/render()
    # do the same; without this a bin overflow would time broken frames)
    r.check_overflow()


if __name__ == "__main__":
    main()
