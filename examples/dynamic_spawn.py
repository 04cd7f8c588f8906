"""dynamic_spawn — entities spawned/despawned mid-run (incremental repack).

Demonstrates the dynamic-scene path: spawning an entity after startup
applies an incremental update to the packed scene (tail-row appends,
tens of ms — scene_buffers.incremental_repack) instead of the full
re-prepare; despawning masks its triangles and restores the prior
frame bit-exactly.  The reference gets this for free by re-recording
draws each frame (gbuffer_pass.rs:516-548); here the static-shape jit
stays compiled throughout.

Env overrides: MO_WIDTH/MO_HEIGHT, MO_OUT (PNG of the populated frame).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.sponza_scale import build_app  # noqa: E402
from mo_renderer_tpu.assets.procedural import procedural_model  # noqa: E402
from mo_renderer_tpu.config import EngineConfig  # noqa: E402
from mo_renderer_tpu.math.transform import Transform  # noqa: E402


def main():
    w = int(os.environ.get("MO_WIDTH", "1280"))
    h = int(os.environ.get("MO_HEIGHT", "720"))
    out = os.environ.get("MO_OUT", "/tmp/dynamic_spawn.png")

    app = build_app(EngineConfig(width=w, height=h), n_grid=6)
    app.resumed()
    r = app.renderer
    # warm the frame jit AND keep the full pre-spawn frame: the despawn
    # check at the end compares against these exact bytes
    f0 = np.asarray(r.render_device(app.world))

    # spawn a tower of cubes one frame at a time (each applies
    # incrementally: no re-jit, tail-row uploads only)
    spawned = []
    t0 = time.perf_counter()
    for i in range(6):
        spawned.append(app.world.spawn((
            Transform.from_xyz(0.0, 1.0 + 1.2 * i, 0.0),
            procedural_model(
                "cube", base_color=(1.0, 0.8 - 0.1 * i, 0.2, 1.0)
            ),
        )))
        app.runtime_schedule.run(app.world)
        frame = r.render_device(app.world)
    np.asarray(frame[0, 0])
    spawn_s = time.perf_counter() - t0

    from mo_renderer_tpu.assets.image_io import write_png
    from mo_renderer_tpu.passes.present import unpack_rgba8

    populated = unpack_rgba8(np.asarray(frame))
    write_png(out, populated)

    # despawn them all: the frame must return to the warmed pre-spawn
    # frame BIT-EXACTLY (same check tests/test_incremental_prepare.py
    # pins; np.array_equal against f0, not a vacuous non-zero test)
    for e in spawned:
        app.world.despawn(e)
    app.runtime_schedule.run(app.world)
    restored = np.asarray(r.render_device(app.world))
    r.check_overflow()
    bit_exact = bool(np.array_equal(f0, restored))
    print(
        f"spawned 6 entities mid-run in {spawn_s:.2f}s total "
        f"(incremental, no re-jit); wrote {out}; "
        f"despawn restored the pre-spawn frame bit-exactly: {bit_exact}"
    )
    if not bit_exact:
        raise SystemExit("despawn did NOT restore the pre-spawn frame")


if __name__ == "__main__":
    main()
