"""Interleaved A/B for 720p full-stack tile_h 32 vs 64: the backend's
throughput drifts run to run (scripts/perf_720_tiles.py saw the full
stack measure faster than its own ibl-only subset), so trials alternate
A,B,A,B,... in one process and medians are compared.
"""
import dataclasses
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("MO_MODEL", "man.glb")

import numpy as np

from examples.pbr_ibl import build_app
from mo_renderer_tpu.config import EngineConfig
from mo_renderer_tpu.passes.frame_graph import Renderer


def one_trial(r, app, n=20):
    t0 = time.perf_counter()
    for _ in range(n):
        app.runtime_schedule.run(app.world)
        f = r.render_device(app.world)
    np.asarray(f[0, 0])
    return (time.perf_counter() - t0) / n


def main():
    cfg = EngineConfig(width=1280, height=720)
    app = build_app(cfg)
    app.resumed()
    ra = app.renderer  # tile_h 32 (default)
    rb = Renderer(dataclasses.replace(cfg, tile_h=64, raster_sub_y=None))
    rb.prepare(app.world)
    # warm both
    np.asarray(ra.render_device(app.world)[0, 0])
    np.asarray(rb.render_device(app.world)[0, 0])
    ta, tb = [], []
    for i in range(6):
        ta.append(one_trial(ra, app))
        tb.append(one_trial(rb, app))
    ma, mb = statistics.median(ta), statistics.median(tb)
    print(f"A tile_h=32: {ma*1e3:7.2f} ms ({1/ma:.1f} fps)  "
          f"trials {[round(t*1e3,2) for t in ta]}")
    print(f"B tile_h=64: {mb*1e3:7.2f} ms ({1/mb:.1f} fps)  "
          f"trials {[round(t*1e3,2) for t in tb]}")
    ra.check_overflow()
    rb.check_overflow()


if __name__ == "__main__":
    main()
