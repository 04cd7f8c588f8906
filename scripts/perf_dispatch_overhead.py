"""Isolate the per-dispatch host overhead of the frame jit on this backend.

Measures, at 1080p flagship steady state:
  a) issue-only rate — N _frame_fn calls, NO final sync (pure host cost
     of flatten + dispatch RPC per call);
  b) e2e pipelined rate — same loop + one sync at the end.  NOTE: bench's
     loop additionally pays render_device's per-frame host steps —
     app.runtime_schedule, refresh_transforms, frame_params (camera math
     + upload), ibl.maps(), overflow bookkeeping — so (b) understates the
     bench frame cost; scripts/perf_host_loop.py attributes those;
  c) AOT-compiled call — jit(...).lower(args).compile() then call the
     executable directly, skipping the jit dispatch cache machinery;
  d) leaf count of the argument pytrees (each leaf is a per-call buffer
     reference on the RPC).

NOTES_PERF context: device trace ~16.5ms but perf_frame ~19ms — if (a)
is ~2.5ms the gap is host dispatch cost, and (c) tells us whether the
AOT path recovers it.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("MO_MODEL", "man.glb")

import jax
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
    args = (r.scene, ibl, params, None)

    nleaves = len(jax.tree_util.tree_leaves(args))
    print(f"arg pytree leaves: {nleaves}", flush=True)

    f, _ = r._frame_fn(*args, has_shadow_light=has_light)
    np.asarray(f[0, 0])

    # (a) issue-only: no sync anywhere
    N = 30
    t0 = time.perf_counter()
    for _ in range(N):
        f, _ = r._frame_fn(*args, has_shadow_light=has_light)
    issue = (time.perf_counter() - t0) / N
    np.asarray(f[0, 0])
    print(f"(a) issue-only host cost: {issue*1e3:7.2f} ms/frame", flush=True)

    # (b) e2e pipelined
    for trial in range(3):
        t0 = time.perf_counter()
        for _ in range(N):
            f, _ = r._frame_fn(*args, has_shadow_light=has_light)
        np.asarray(f[0, 0])
        dt = (time.perf_counter() - t0) / N
        print(f"(b) e2e pipelined trial {trial}: {dt*1e3:7.2f} ms/frame",
              flush=True)

    # (c) AOT executable call
    lowered = r._frame_fn.lower(*args, has_shadow_light=has_light)
    compiled = lowered.compile()
    f, _ = compiled(*args)
    np.asarray(f[0, 0])
    t0 = time.perf_counter()
    for _ in range(N):
        f, _ = compiled(*args)
    issue_c = (time.perf_counter() - t0) / N
    np.asarray(f[0, 0])
    print(f"(c) AOT issue-only: {issue_c*1e3:7.2f} ms/frame", flush=True)
    for trial in range(3):
        t0 = time.perf_counter()
        for _ in range(N):
            f, _ = compiled(*args)
        np.asarray(f[0, 0])
        dt = (time.perf_counter() - t0) / N
        print(f"(c) AOT e2e trial {trial}:   {dt*1e3:7.2f} ms/frame",
              flush=True)


if __name__ == "__main__":
    main()
