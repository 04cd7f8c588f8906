"""Capture a jax.profiler trace of the steady-state frame and print the
per-op cost breakdown (works on the axon remote TPU backend).

Usage:  python scripts/trace_frame.py   (~6 min incl. compile)

The breakdown maps XLA fusion names to source lines via the trace's own
metadata — no HLO dump needed.  This is how the 87.8ms frame was broken
down into gather streams in NOTES_PERF.md.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("MO_MODEL", "man.glb")

TRACE_DIR = os.environ.get("MO_TRACE_DIR", "/tmp/jax_trace")


def capture():
    import jax
    import numpy as np

    from mo_renderer_tpu.config import EngineConfig

    if os.environ.get("MO_TRACE_APP") == "sponza":
        import functools

        from examples.sponza_scale import build_app as _ba

        # MO_TRACE_GRID scales the scene (20 = the 207K-tri stress grid)
        build_app = functools.partial(
            _ba, n_grid=int(os.environ.get("MO_TRACE_GRID", "10"))
        )
    else:
        from examples.pbr_ibl import build_app

    cfg = EngineConfig(width=1920, height=1080)
    # MO_TRACE_CFG="knob=value,knob=value" overrides config fields
    # (booleans parse from 1/true/True)
    import dataclasses as _dc

    for kv in filter(None, os.environ.get("MO_TRACE_CFG", "").split(",")):
        k, v = kv.split("=", 1)
        cur = getattr(EngineConfig, k)
        val = (
            v in ("1", "true", "True") if isinstance(cur, bool)
            else type(cur)(v) if cur is not None else int(v)
        )
        cfg = _dc.replace(cfg, **{k: val})
    app = build_app(cfg)
    app.resumed()
    r = app.renderer
    params, has_light = r.frame_params(app.world)
    ibl = r.ibl.maps()
    # the PRODUCTION frame path: with cfg.shadow_cache (default) the
    # memoized PCF table rides as an argument and the traced program
    # has no shadow raster; MO_TRACE_NO_SHADOW_CACHE=1 traces the
    # in-frame-shadow specialization instead
    quads = (
        None
        if os.environ.get("MO_TRACE_NO_SHADOW_CACHE")
        else r._cached_shadow_quads(
            params.host_field("light_proj_view"), has_light
        )
    )

    f, _ = r._frame_fn(r.scene, ibl, params, quads, has_shadow_light=True)
    np.asarray(f[0, 0])
    print("warm; tracing 5 frames", flush=True)

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(5):
        f, _ = r._frame_fn(r.scene, ibl, params, quads, has_shadow_light=True)
    np.asarray(f[0, 0])
    jax.profiler.stop_trace()


def report(n_frames: int = 5, top: int = 30):
    path = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    by = collections.Counter()
    src = {}
    total = 0
    for e in events:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            n = e.get("name", "")
            if n.startswith("jit_"):
                total += e.get("dur", 0)
                continue
            by[n] += e.get("dur", 0)
            args = e.get("args", {})
            s = args.get("source", "")
            if s:
                src[n] = s.split("/")[-1]
            elif args.get("tf_op"):
                # ops without source metadata (sorts, copies) usually
                # still carry the op-name path (jax.named_scope shows
                # up here) — keep its tail for attribution
                src[n] = args["tf_op"].split("/")[-1][:44]
    print(f"frame total: {total / (n_frames * 1e3):.1f} ms")
    for name, dur in by.most_common(top):
        print(f"{dur / (n_frames * 1e3):7.2f}  {name[:28]:28s} "
              f"{src.get(name, '')[:44]}")


if __name__ == "__main__":
    if "--report-only" not in sys.argv:
        capture()
    report()
