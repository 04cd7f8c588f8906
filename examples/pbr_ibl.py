"""pbr_ibl — the flagship example, mirroring the reference's
examples/pbr_ibl/main.rs:12-55 call-for-call.

The reference scene loads ``DamagedHelmet.glb`` (not shipped in its asset
tree); the shipped helmet-class model is ``man.glb``.  Set $MO_MODEL to
point at any .glb.  Renders headless frames and writes a PNG.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mo_renderer_tpu import (  # noqa: E402
    App,
    Camera,
    DefaultTextures,
    DirectionalLight,
    GlobalSamplers,
    IBLResource,
    Input,
    Model,
    Timer,
    Transform,
)
from mo_renderer_tpu.app.application import EventLoop  # noqa: E402
from mo_renderer_tpu.math import quat  # noqa: E402


def build_app(config=None) -> App:
    event_loop = EventLoop()
    app = App.new(event_loop, config)

    app.init_resource(Timer)
    app.init_resource(Input)

    app.init_resource(DefaultTextures)
    app.init_resource(IBLResource)
    app.init_resource(GlobalSamplers)

    app.add_runtime_system(Timer.update_timer)
    app.add_runtime_system(Camera.update_camera)

    camera = Camera(
        position=(-3.0, 0.0, 3.0),
        rotation=quat.from_rotation_y(np.pi * 0.75),
    )
    app.insert_resource(camera)

    model_name = os.environ.get("MO_MODEL", "man.glb")
    app.add_entity((
        Transform.from_xyz(0.0, 0.0, 0.0),
        Model.load_gltf(model_name),
    ))

    app.add_entity((DirectionalLight(
        Transform.from_xyz(10.0, 10.0, 10.0).looking_at((0.0, 0.0, 0.0)),
        (1.0, 1.0, 1.0),
        4.0,
        True,
    ),))

    app.add_entity((DirectionalLight(
        Transform.from_xyz(-10.0, 10.0, 10.0).looking_at((0.0, 0.0, 0.0)),
        (1.0, 1.0, 1.0),
        2.0,
        False,
    ),))

    return app


def main():
    app = build_app()
    if "--window" in sys.argv:
        # live WASD + right-mouse-drag flight (README.md:15-24)
        from mo_renderer_tpu.app.window import run_windowed

        shown = run_windowed(app)
        print(f"window closed after {shown} frames, "
              f"fps={app.world.resource(Timer).fps():.1f}")
        return
    frames = int(os.environ.get("MO_FRAMES", "1"))
    out = os.environ.get("MO_OUT", "/tmp/pbr_ibl.png")
    frame = app.run(num_frames=frames)
    app.save_frame(out, frame)
    print(f"wrote {out} ({frame.shape[1]}x{frame.shape[0]}), "
          f"fps={app.world.resource(Timer).fps():.1f}")


if __name__ == "__main__":
    main()
