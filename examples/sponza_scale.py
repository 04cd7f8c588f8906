"""sponza_scale — Sponza-class stress scene (BASELINE.json configs[3]).

~100 ECS entities with distinct PBR materials (textured + untextured mix),
4 point lights + 1 shadow-casting directional light, 1920x1080 headless.
The reference ships no Sponza asset, so the scene is procedural but matches
the config's entity/light/material counts and resolution.

Env overrides: MO_FRAMES, MO_OUT, MO_WIDTH/MO_HEIGHT.
"""

from __future__ import annotations

import os
import sys
import time

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
    Timer,
    Transform,
)
from mo_renderer_tpu.assets.procedural import procedural_model  # noqa: E402
from mo_renderer_tpu.config import EngineConfig  # noqa: E402
from mo_renderer_tpu.math import quat  # noqa: E402
from mo_renderer_tpu.scene.components import PointLight  # noqa: E402


def build_app(config: EngineConfig | None = None, n_grid: int = 10) -> App:
    app = App.new(config=config)
    app.init_resource(Timer)
    app.init_resource(Input)
    app.init_resource(DefaultTextures)
    app.init_resource(GlobalSamplers)
    try:
        app.init_resource(IBLResource)
    except FileNotFoundError:
        pass  # asset-free fallback: no IBL

    app.add_runtime_system(Timer.update_timer)
    app.add_runtime_system(Camera.update_camera)

    yaw = np.pi * 0.8
    d = np.array([np.sin(yaw), 0.0, np.cos(yaw)])
    cam = Camera(
        position=tuple(-14.0 * d + np.array([0.0, 4.0, 0.0])),
        rotation=quat.mul(
            quat.from_rotation_y(yaw), quat.from_rotation_x(-0.2)
        ),
    )
    app.insert_resource(cam)

    # ground plane
    app.add_entity((
        Transform.from_xyz(0.0, 0.0, 0.0),
        procedural_model("plane", size=40.0, textured=True, roughness=0.8),
    ))

    # n_grid x n_grid grid of alternating cubes/spheres, varied materials
    rng = np.random.default_rng(42)
    for i in range(n_grid):
        for j in range(n_grid):
            x = (i - (n_grid - 1) / 2) * 2.4
            z = (j - (n_grid - 1) / 2) * 2.4
            kind = "cube" if (i + j) % 2 == 0 else "sphere"
            color = tuple(rng.uniform(0.2, 1.0, 3)) + (1.0,)
            model = procedural_model(
                kind,
                base_color=color,
                metallic=float((i * n_grid + j) % 3 == 0),
                roughness=float(0.1 + 0.8 * rng.random()),
                textured=(i + j) % 5 == 0,
            )
            app.add_entity((
                Transform.from_xyz(x, 0.5 + 0.8 * rng.random(), z),
                model,
            ))

    # 1 shadow caster + 4 point lights (configs[3])
    app.add_entity((DirectionalLight(
        Transform.from_xyz(20.0, 30.0, 10.0).looking_at((0.0, 0.0, 0.0)),
        (1.0, 0.98, 0.9), 3.0, True, shadow_width=40.0, shadow_height=40.0,
    ),))
    for k in range(4):
        ang = k * np.pi / 2 + 0.4
        app.add_entity((PointLight(
            Transform.from_xyz(8 * np.cos(ang), 3.0, 8 * np.sin(ang)),
            color=[(1, .3, .2), (.2, 1, .3), (.3, .4, 1), (1, 1, .5)][k],
            intensity=8.0,
        ),))
    return app


def main():
    w = int(os.environ.get("MO_WIDTH", "1920"))
    h = int(os.environ.get("MO_HEIGHT", "1080"))
    cfg = EngineConfig(width=w, height=h)
    app = build_app(cfg)
    frames = int(os.environ.get("MO_FRAMES", "3"))
    out = os.environ.get("MO_OUT", "/tmp/sponza_scale.png")
    app.resumed()
    frame = app.renderer.render_device(app.world)
    np.asarray(frame[0, 0])
    t0 = time.perf_counter()
    for _ in range(frames):
        frame = app.renderer.render_device(app.world)
    np.asarray(frame[0, 0])
    dt = (time.perf_counter() - t0) / frames
    from mo_renderer_tpu.passes.present import unpack_rgba8

    app.save_frame(out, unpack_rgba8(np.asarray(frame)))
    print(f"wrote {out} ({w}x{h}), {1.0 / dt:.2f} fps "
          f"({int(app.renderer.scene.tri_valid.sum())} tris)")


if __name__ == "__main__":
    main()
