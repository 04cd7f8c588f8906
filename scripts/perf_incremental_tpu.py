"""Incremental topology repack on the REAL backend (VERDICT r3 #5).

Spawns/despawns entities mid-run at sponza scale and times the host
cost of Renderer._sync_topology (the <50ms budget: tail-row numpy
writes + padded-array uploads over the host tunnel + one cached
tri_attrs dispatch), then verifies frames render the change.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from examples.sponza_scale import build_app
from mo_renderer_tpu.assets.procedural import procedural_model
from mo_renderer_tpu.config import EngineConfig
from mo_renderer_tpu.math.transform import Transform


def main():
    cfg = EngineConfig(width=1920, height=1080)
    app = build_app(cfg)
    app.resumed()
    r = app.renderer
    np.asarray(r.render_device(app.world)[0, 0])

    fn_before = r._frame_fn
    times = []
    spawned = []
    for i in range(4):
        e = app.world.spawn((
            Transform.from_xyz(0.0, 3.0 + i, 0.0),
            procedural_model("cube", base_color=(1.0, 1.0, 0.0, 1.0)),
        ))
        spawned.append(e)
        t0 = time.perf_counter()
        r._sync_topology(app.world)
        times.append(time.perf_counter() - t0)
    for e in spawned[:2]:
        app.world.despawn(e)
        t0 = time.perf_counter()
        r._sync_topology(app.world)
        times.append(time.perf_counter() - t0)
    assert r._frame_fn is fn_before, "incremental path must not re-jit"
    f = r.render_device(app.world)
    np.asarray(f[0, 0])
    r.check_overflow()
    print("sync_topology ms per change:",
          [round(t * 1e3, 1) for t in times], flush=True)
    worst = max(times) * 1e3
    print(f"worst {worst:.1f} ms (budget 50)", flush=True)


if __name__ == "__main__":
    main()
