"""Sponza-scale steady-state frame timing with config overrides.

Usage: MO_TILE_H=8 python scripts/perf_sponza.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from examples.sponza_scale import build_app
from mo_renderer_tpu.config import EngineConfig


def main():
    overrides = {}
    if "MO_TILE_H" in os.environ:
        overrides["tile_h"] = int(os.environ["MO_TILE_H"])
    if "MO_TILE_W" in os.environ:
        overrides["tile_w"] = int(os.environ["MO_TILE_W"])
    if "MO_SUB_Y" in os.environ:
        overrides["raster_sub_y"] = int(os.environ["MO_SUB_Y"])
    cfg = EngineConfig(width=1920, height=1080, **overrides)
    app = build_app(cfg)
    app.resumed()
    r = app.renderer
    params, has_light = r.frame_params(app.world)
    ibl = r.ibl.maps() if r.ibl is not None else None

    f, _ = r._frame_fn(r.scene, ibl, params, None, has_shadow_light=has_light)
    np.asarray(f[0, 0])
    for trial in range(5):
        t0 = time.perf_counter()
        for _ in range(10):
            f, _ = r._frame_fn(r.scene, ibl, params, None,
                               has_shadow_light=has_light)
        np.asarray(f[0, 0])
        dt = (time.perf_counter() - t0) / 10
        print(f"trial {trial}: {dt*1e3:8.2f} ms ({1/dt:.2f} fps)", flush=True)
    r.check_overflow()


if __name__ == "__main__":
    main()
