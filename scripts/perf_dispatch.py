"""Is the steady-state frame loop host-limited on this backend?

Times (a) the pure Python+dispatch cost of issuing _frame_fn calls
without syncing, (b) the synced steady state, (c) the full
render_device host path.  Device trace says 19.6ms; the gap to (b)
is host/dispatch.

Usage: python scripts/perf_dispatch.py
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

    # (a) dispatch-only: issue N calls, don't wait
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        f, _ = r._frame_fn(r.scene, ibl, params, None,
                           has_shadow_light=has_light)
    t_issue = (time.perf_counter() - t0) / n
    np.asarray(f[0, 0])

    # (b) synced steady state
    t0 = time.perf_counter()
    for _ in range(n):
        f, _ = r._frame_fn(r.scene, ibl, params, None,
                           has_shadow_light=has_light)
    np.asarray(f[0, 0])
    t_sync = (time.perf_counter() - t0) / n

    # (c) full render_device path (runtime systems + param rebuild)
    frame = r.render_device(app.world)
    np.asarray(frame[0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        app.runtime_schedule.run(app.world)
        frame = r.render_device(app.world)
    np.asarray(frame[0, 0])
    t_full = (time.perf_counter() - t0) / n

    print(f"dispatch-only per call: {t_issue*1e3:7.2f} ms")
    print(f"synced steady state:    {t_sync*1e3:7.2f} ms")
    print(f"render_device loop:     {t_full*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
