"""Re-measure the shadow-map memoization (cfg.shadow_cache) at head.

Round-1 measured feeding the memoized PCF table into the frame jit as an
argument at ~90ms/frame EXTRA (134MB f32 quad table) and the flag was
parked OFF.  Hypothesis: that was a PER-CALL DEVICE RELAYOUT — the table
was another jit's OUTPUT, whose compiler-chosen layout need not match
the frame executable's expected input layout — not a fundamental arg
tax (the scene's own ~100MB of gather tables ride every call for free).
Today's table is 34MB u32 (pcf_half_anchor).  Measures, in ONE process:

  A) shadow_cache=False e2e (render_device loop) — baseline;
  B) shadow_cache=True, table straight from the shadow jit;
  C) shadow_cache=True, table host-round-tripped once (forces the
     default device layout) — isolates the relayout theory.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("MO_MODEL", "man.glb")

import jax.numpy as jnp
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
    return best


def main():
    # the default flipped to True after this script's first measurement:
    # force the baseline OFF explicitly
    cfg = dataclasses.replace(
        EngineConfig(width=1920, height=1080), shadow_cache=False
    )
    app = build_app(cfg)
    app.resumed()
    e2e(app.renderer, app, "A shadow_cache=False")

    cfg_b = dataclasses.replace(cfg, shadow_cache=True)
    rb = Renderer(cfg_b)
    rb.prepare(app.world)
    e2e(rb, app, "B cache, jit-output layout")

    # C: force default layout with ONE host round trip of the table
    quads = rb._shadow_quads
    rb._shadow_quads = jnp.asarray(np.asarray(quads))
    e2e(rb, app, "C cache, host-round-trip layout")


if __name__ == "__main__":
    main()
