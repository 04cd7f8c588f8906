"""One-shot runner for all five BASELINE.json evaluation configs.

Emits ONE JSON object with a metric per config so every round's claims
are reproducible in a single command (VERDICT round-1 item 10):

  1. pbr_ibl_720p_ibl_only   — stock example, IBL only, 1280x720
  2. pbr_ibl_720p_full       — + PCF shadow + SSAO, 1280x720
  3. ibl_preprocess          — IBL chain validated vs the reference HDR
  4. sponza_1080p            — ~100 entities, 4 point + 1 dir, 1920x1080
  5. multi_view_4k           — 8 cameras at 3840x2160, device-resident

Run on TPU: ``python scripts/eval_configs.py`` (~20 min with compiles;
MO_EVAL_FRAMES trims the timed loops).  Writes the JSON to stdout and to
$MO_EVAL_OUT (default /tmp/eval_configs.json).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FRAMES = int(os.environ.get("MO_EVAL_FRAMES", "20"))


def _time_device_frames(render_device, n=FRAMES):
    """fps of a device-resident frame fn (sync once on one pixel)."""
    frame = render_device()
    np.asarray(frame[(0,) * (frame.ndim - 1) + (0,)])
    t0 = time.perf_counter()
    for _ in range(n):
        frame = render_device()
    np.asarray(frame[(0,) * (frame.ndim - 1) + (0,)])
    return n / (time.perf_counter() - t0)


def config_pbr_ibl(full_stack: bool) -> dict:
    from examples.pbr_ibl import build_app
    from mo_renderer_tpu.config import EngineConfig

    cfg = EngineConfig(
        width=1280, height=720,
        ssao_enabled=full_stack, shadow_enabled=full_stack,
    )
    app = build_app(cfg)
    app.resumed()
    r = app.renderer

    def step():
        app.runtime_schedule.run(app.world)
        return r.render_device(app.world)

    fps = _time_device_frames(step)
    r.check_overflow()
    return {
        "fps": round(fps, 2),
        "mpixels_per_s": round(fps * 1280 * 720 / 1e6, 1),
        "resolution": "1280x720",
        "stack": "shadow+ssao+ibl" if full_stack else "ibl_only",
    }


def config_ibl_preprocess() -> dict:
    """IBL chain timing + internal consistency checks vs the source HDR
    (BASELINE configs[3]: 'validated vs resources/tex outputs' — no
    Vulkan-side outputs exist, so validation is against the HDR input:
    energy conservation + mirror-mip equality, as in tests/test_kernels)."""
    from mo_renderer_tpu.assets.ibl_resource import IBLResource
    from mo_renderer_tpu.config import EngineConfig

    cfg = EngineConfig()
    t0 = time.perf_counter()
    ibl = IBLResource(
        name=cfg.ibl_env_name,
        resource_root=cfg.resource_root,
        cache=False,
    )
    ibl.ensure_computed()
    m = ibl.maps()
    np.asarray(m.specular_mips.level(0))
    dt = time.perf_counter() - t0

    env = np.asarray(m.environment_faces)
    irr = np.asarray(m.irradiance_faces)
    mip0 = np.asarray(m.specular_mips.level(0))
    checks = {
        # specular mip 0 is the mirror level == environment map
        "mirror_mip_matches_env": bool(
            np.allclose(mip0[..., :3], env[..., :3], rtol=1e-3, atol=1e-3)
        ),
        # irradiance is a weighted average: bounded by the env's range
        "irradiance_bounded": bool(
            irr[..., :3].max() <= env[..., :3].max() * 1.05 + 1e-3
        ),
        "finite": bool(
            np.isfinite(env).all() and np.isfinite(irr).all()
        ),
    }
    return {
        "precompute_seconds": round(dt, 2),
        "cubemap_size": int(env.shape[1]),
        "mips": int(m.specular_mips.num_levels),
        "checks": checks,
        "ok": all(checks.values()),
    }


def config_sponza() -> dict:
    from examples.sponza_scale import build_app
    from mo_renderer_tpu.config import EngineConfig

    cfg = EngineConfig(width=1920, height=1080)
    app = build_app(cfg)
    app.resumed()
    r = app.renderer

    def step():
        app.runtime_schedule.run(app.world)
        return r.render_device(app.world)

    fps = _time_device_frames(step)
    r.check_overflow()
    return {
        "fps": round(fps, 2),
        "mpixels_per_s": round(fps * 1920 * 1080 / 1e6, 1),
        "resolution": "1920x1080",
        "entities": 101,
        "tris": int(np.asarray(r.scene.tri_valid.sum())),
    }


def config_stress_200k() -> dict:
    """4x-sponza stress scene (~200K tris, 401 entities) — the
    past-BASELINE scaling probe (VERDICT r4 #6).  Gated behind
    MO_EVAL_STRESS=1: it is not a BASELINE config, it exists to find the
    binning/sort wall."""
    from examples.sponza_scale import build_app
    from mo_renderer_tpu.config import EngineConfig

    cfg = EngineConfig(
        width=1920, height=1080, max_meshes=512, max_materials=512,
    )
    app = build_app(cfg, n_grid=20)
    app.resumed()
    r = app.renderer

    def step():
        app.runtime_schedule.run(app.world)
        return r.render_device(app.world)

    fps = _time_device_frames(step)
    r.check_overflow()
    return {
        "fps": round(fps, 2),
        "mpixels_per_s": round(fps * 1920 * 1080 / 1e6, 1),
        "resolution": "1920x1080",
        "entities": 401,
        "tris": int(np.asarray(r.scene.tri_valid.sum())),
        "binned_cap": int(r._binned_cap),
    }


def config_multi_view() -> dict:
    """Scanned multi-view camera path: the 120-frame offline shape of
    BASELINE configs[4].  The whole camera path is precomputed host-side
    (scripted input -> Camera.update_camera -> per-view params), then
    rendered K steps per dispatch via
    MultiViewRenderer.render_view_sequence_device — per-step host work
    and the dispatch floor amortize K-fold (VERDICT r3 #6)."""
    from examples.multi_view_flythrough import camera_rig, scripted_input
    from examples.sponza_scale import build_app
    from mo_renderer_tpu import Camera, Input
    from mo_renderer_tpu.config import EngineConfig
    from mo_renderer_tpu.parallel import MultiViewRenderer, make_view_mesh
    from mo_renderer_tpu.passes.frame_graph import build_camera_params
    from mo_renderer_tpu.scene.scene_buffers import find_shadow_light

    w, h, n_views = 3840, 2160, 8
    seq = int(os.environ.get("MO_EVAL_MV_SEQ", "4"))
    # BASELINE configs[4] is a 120-FRAME camera path; that spec is the
    # default (VERDICT r4 #3 — no more 8-step stand-ins).  MO_EVAL_MV_FRAMES
    # trims it for smoke runs.
    n_frames = int(os.environ.get("MO_EVAL_MV_FRAMES", "120"))
    n_frames = max(((n_frames + seq - 1) // seq) * seq, seq)
    cfg = EngineConfig(width=w, height=h)
    app = build_app(cfg, n_grid=8)
    app.resumed()
    mesh = make_view_mesh()
    mv = MultiViewRenderer(cfg, mesh)
    mv.prepare(app.world)
    camera: Camera = app.world.resource(Camera)
    input_res: Input = app.world.resource(Input)
    camera.resize((w, h))

    # precompute the whole camera path host-side
    light_pv, _ = find_shadow_light(app.world)
    steps = []
    for step in range(n_frames):
        scripted_input(input_res, step)
        app.runtime_schedule.run(app.world)
        steps.append([
            build_camera_params(c, light_pv)
            for c in camera_rig(camera, n_views)
        ])

    frames_dev = mv.render_view_sequence_device(steps[:seq], app.world)
    np.asarray(frames_dev[0, 0, 0, 0])
    t0 = time.perf_counter()
    for k in range(0, n_frames, seq):
        frames_dev = mv.render_view_sequence_device(
            steps[k : k + seq], app.world
        )
    np.asarray(frames_dev[0, 0, 0, 0])
    elapsed = time.perf_counter() - t0
    mv.check_overflow()
    vps = n_frames * n_views / elapsed
    return {
        "views_per_s": round(vps, 2),
        "mpixels_per_s": round(vps * w * h / 1e6, 1),
        "resolution": f"{w}x{h}",
        "views": n_views,
        "n_frames": n_frames,
        "devices": int(mesh.devices.size),
        "frames_per_dispatch": seq,
        "device_resident": True,
    }


def main():
    import jax

    results = {"backend": jax.default_backend(), "frames": FRAMES}
    runners = [
        ("pbr_ibl_720p_ibl_only", lambda: config_pbr_ibl(False)),
        ("pbr_ibl_720p_full", lambda: config_pbr_ibl(True)),
        ("ibl_preprocess", config_ibl_preprocess),
        ("sponza_1080p", config_sponza),
        ("multi_view_4k", config_multi_view),
    ]
    if os.environ.get("MO_EVAL_STRESS"):
        runners.append(("stress_200k_1080p", config_stress_200k))
    only = os.environ.get("MO_EVAL_ONLY")  # comma-separated name filter
    if only:
        wanted = set(only.split(","))
        runners = [r for r in runners if r[0] in wanted]
    for name, fn in runners:
        print(f"[eval] {name} ...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        try:
            results[name] = fn()
        except Exception as e:  # record the failure, keep going
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        results[name]["wall_seconds"] = round(time.perf_counter() - t0, 1)
        print(f"[eval] {name}: {results[name]}", file=sys.stderr, flush=True)

    out = json.dumps(results)
    print(out)
    with open(os.environ.get("MO_EVAL_OUT", "/tmp/eval_configs.json"), "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
