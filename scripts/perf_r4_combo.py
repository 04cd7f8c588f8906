"""Round-4 combined measurement: steady-state frame + raster_sub_x A/B +
bench-style e2e, all in ONE process (the remote backend wedges on some
process starts — one process means one dice roll).

Usage: python scripts/perf_r4_combo.py [flagship|sponza|both]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("MO_MODEL", "man.glb")

import numpy as np

from mo_renderer_tpu.config import EngineConfig
from mo_renderer_tpu.passes.frame_graph import Renderer


def steady(r, world, label, trials=4, n=10):
    params, has_light = r.frame_params(world)
    ibl = r.ibl.maps()
    f, _ = r._frame_fn(r.scene, ibl, params, None, has_shadow_light=has_light)
    np.asarray(f[0, 0])
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n):
            f, _ = r._frame_fn(r.scene, ibl, params, None,
                               has_shadow_light=has_light)
        np.asarray(f[0, 0])
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{label}: {best*1e3:8.2f} ms ({1.0/best:.2f} fps)", flush=True)
    return best


def e2e(app, r, label, n=30):
    def frame():
        app.runtime_schedule.run(app.world)
        return r.render_device(app.world)

    f = frame()
    np.asarray(f[0, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            f = frame()
        np.asarray(f[0, 0])
        best = min(best, (time.perf_counter() - t0) / n)
    r.check_overflow()
    print(f"{label} e2e: {best*1e3:8.2f} ms ({1.0/best:.2f} fps)", flush=True)
    return best


def run_scene(build, name, sub_xs=(1, 3)):
    cfg0 = EngineConfig(width=1920, height=1080)
    app = build(cfg0)
    app.resumed()
    steady(app.renderer, app.world, f"{name} sub_x=1 steady")
    e2e(app, app.renderer, f"{name} sub_x=1")
    for sx in sub_xs:
        if sx == 1:
            continue
        cfg = dataclasses.replace(cfg0, raster_sub_x=sx)
        r = Renderer(cfg)
        r.prepare(app.world)
        steady(r, app.world, f"{name} sub_x={sx} steady")
    return app


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("flagship", "both"):
        from examples.pbr_ibl import build_app

        run_scene(build_app, "flagship")
    if which in ("sponza", "both"):
        from examples.sponza_scale import build_app as build_sponza

        run_scene(build_sponza, "sponza")


if __name__ == "__main__":
    main()
