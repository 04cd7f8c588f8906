"""720p tile_h sweep (VERDICT r3 #2): the adaptive default picks 32
(64 would pad 720 -> 768), but tile_h=16 pads NOTHING at 720 — measure
whether the finer grid or the 2% fewer pixels wins at this resolution.
One process, e2e render_device loops (production path, shadow cache on).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("MO_MODEL", "man.glb")

import numpy as np

from examples.pbr_ibl import build_app
from mo_renderer_tpu.config import EngineConfig
from mo_renderer_tpu.passes.frame_graph import Renderer


def e2e(r, app, label, n=30):
    f = r.render_device(app.world)
    np.asarray(f[0, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            app.runtime_schedule.run(app.world)
            f = r.render_device(app.world)
        np.asarray(f[0, 0])
        best = min(best, (time.perf_counter() - t0) / n)
    r.check_overflow()
    print(f"{label}: {best*1e3:8.2f} ms ({1.0/best:.2f} fps)", flush=True)


def main():
    for full_stack in (False, True):
        cfg = EngineConfig(
            width=1280, height=720,
            ssao_enabled=full_stack, shadow_enabled=full_stack,
        )
        app = build_app(cfg)
        app.resumed()
        tag = "full" if full_stack else "ibl_only"
        e2e(app.renderer, app, f"720p {tag} tile_h=32(default)")
        for th in (16, 64):
            r = Renderer(dataclasses.replace(cfg, tile_h=th,
                                             raster_sub_y=None))
            # __post_init__ already ran on the replaced instance? No —
            # dataclasses.replace re-runs it, so sub_y rederives.
            r.prepare(app.world)
            e2e(r, app, f"720p {tag} tile_h={th}")


if __name__ == "__main__":
    main()
