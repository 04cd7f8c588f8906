"""Steady-state device-frame timing at 1080p (run on TPU, ~6 min).

The bench's complement: times r._frame_fn directly (no host-side work),
8 trials x 10 frames.  Remember block_until_ready does not block on the
axon backend — the np.asarray of one pixel is the sync.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("MO_MODEL", "man.glb")

import numpy as np

from examples.pbr_ibl import build_app
from mo_renderer_tpu.config import EngineConfig


def main():
    cfg = EngineConfig(width=1920, height=1080)
    app = build_app(cfg)
    app.resumed()
    r = app.renderer
    params, has_light = r.frame_params(app.world)
    ibl = r.ibl.maps()

    f, _ = r._frame_fn(r.scene, ibl, params, None, has_shadow_light=has_light)
    np.asarray(f[0, 0])
    for trial in range(8):
        t0 = time.perf_counter()
        for _ in range(10):
            f, _ = r._frame_fn(r.scene, ibl, params, None,
                                has_shadow_light=has_light)
        np.asarray(f[0, 0])
        dt = (time.perf_counter() - t0) / 10
        print(f"trial {trial}: {dt*1e3:8.2f} ms  ({1.0/dt:.2f} fps)",
              flush=True)


if __name__ == "__main__":
    main()
