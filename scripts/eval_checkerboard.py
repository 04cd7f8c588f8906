"""Checkerboard on-vs-off at 1080p on the flagship scene: error stats +
PNGs + steady-state frame time for both.

Usage: python scripts/eval_checkerboard.py  (~10 min incl. two compiles)
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("MO_MODEL", "man.glb")

from examples.pbr_ibl import build_app
from mo_renderer_tpu.config import EngineConfig
from mo_renderer_tpu.passes.present import unpack_rgba8


def run(cb: bool):
    cfg = EngineConfig(width=1920, height=1080, checkerboard=cb)
    app = build_app(cfg)
    app.resumed()
    r = app.renderer
    params, has_light = r.frame_params(app.world)
    ibl = r.ibl.maps()
    f, _ = r._frame_fn(r.scene, ibl, params, None, has_shadow_light=has_light)
    np.asarray(f[0, 0])
    t0 = time.perf_counter()
    for _ in range(20):
        f, _ = r._frame_fn(r.scene, ibl, params, None,
                           has_shadow_light=has_light)
    np.asarray(f[0, 0])
    dt = (time.perf_counter() - t0) / 20
    print(f"cb={cb}: {dt*1e3:.2f} ms ({1/dt:.2f} fps)", flush=True)
    return unpack_rgba8(np.asarray(f))


def main():
    base = run(False)
    cb = run(True)
    d = np.abs(cb.astype(np.float32) - base.astype(np.float32))[..., :3]
    print(f"mean diff {d.mean():.3f} LSB, max {d.max():.0f}, "
          f">4: {(d > 4).mean()*100:.3f}%, >12: {(d > 12).mean()*100:.3f}%",
          flush=True)
    try:
        from PIL import Image

        Image.fromarray(base).save("/tmp/cb_off.png")
        Image.fromarray(cb).save("/tmp/cb_on.png")
        amp = np.clip(d.max(-1) * 8, 0, 255).astype(np.uint8)
        Image.fromarray(amp).save("/tmp/cb_diff8x.png")
        print("wrote /tmp/cb_off.png /tmp/cb_on.png /tmp/cb_diff8x.png")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
