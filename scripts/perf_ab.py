"""A/B steady-state device-frame timing for config knobs at 1080p.

Usage: python scripts/perf_ab.py knob=value [knob=value ...] -- compares
the default config against the overridden one in ONE process (same
backend state), 4 trials x 10 frames each.  Remember block_until_ready
does not block on the axon backend — np.asarray of one pixel syncs.
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


def _make_step(r, world):
    params, has_light = r.frame_params(world)
    ibl = r.ibl.maps()

    def step():
        f, _ = r._frame_fn(
            r.scene, ibl, params, None, has_shadow_light=has_light
        )
        return f

    np.asarray(step()[0, 0])  # warm/compile
    return step


def main():
    overrides = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=", 1)
        cur = getattr(EngineConfig, k)
        if isinstance(cur, bool):
            overrides[k] = v in ("1", "True", "true")
        elif cur is None:  # optional knobs (e.g. shadow_tile_*): int
            overrides[k] = None if v == "None" else int(v)
        else:
            overrides[k] = type(cur)(v)

    cfg_a = EngineConfig(width=1920, height=1080)
    app = build_app(cfg_a)
    app.resumed()
    step_a = _make_step(app.renderer, app.world)

    cfg_b = dataclasses.replace(cfg_a, **overrides)
    from mo_renderer_tpu.passes.frame_graph import Renderer

    rb = Renderer(cfg_b)
    rb.prepare(app.world)
    step_b = _make_step(rb, app.world)

    # INTERLEAVED trials: the backend's throughput drifts 2-4x within
    # minutes some days (NOTES_PERF round-4 caveat) — sequential
    # A-then-B comparisons are untrustworthy at the <1ms level
    best = {"A": float("inf"), "B": float("inf")}
    for trial in range(6):
        for label, step in (("A", step_a), ("B", step_b)):
            t0 = time.perf_counter()
            for _ in range(10):
                f = step()
            np.asarray(f[0, 0])
            dt = (time.perf_counter() - t0) / 10
            best[label] = min(best[label], dt)
            print(f"  trial {trial} {label}: {dt*1e3:7.2f} ms", flush=True)
    for label, name in (("A", "A (defaults)"), ("B", f"B ({overrides})")):
        b = best[label]
        print(f"{name}: {b*1e3:8.2f} ms  ({1.0/b:.2f} fps)", flush=True)


if __name__ == "__main__":
    main()
