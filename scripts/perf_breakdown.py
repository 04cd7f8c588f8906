"""Per-stage timing of the deferred frame at 1080p (run on TPU).

Usage: python scripts/perf_breakdown.py [--width W --height H --model M]
Times each stage of the frame program separately (each jitted, steady
state over N reps) to locate the bottleneck.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.pbr_ibl import build_app
from mo_renderer_tpu.config import EngineConfig
from mo_renderer_tpu.kernels.raster_setup import bin_triangles, triangle_setup
from mo_renderer_tpu.kernels.rasterizer import rasterize
from mo_renderer_tpu.passes.gbuffer import gbuffer_pass
from mo_renderer_tpu.passes.present import present_pass
from mo_renderer_tpu.passes.shading import shading_pass
from mo_renderer_tpu.passes.ssao import ssao_pass
from mo_renderer_tpu.passes.vertex_stage import run_vertex_stage

REPS = int(os.environ.get("MO_PERF_REPS", "10"))


def timeit(name, fn, *args, **kw):
    fn_j = jax.jit(fn, **kw)
    out = fn_j(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:26s} {dt * 1e3:9.2f} ms")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--model", default="man.glb")
    args = ap.parse_args()

    os.environ["MO_MODEL"] = args.model
    cfg = EngineConfig(width=args.width, height=args.height)
    app = build_app(cfg)
    app.resumed()
    r = app.renderer
    scene, ibl = r.scene, r.ibl.maps()
    params, _ = r.frame_params(app.world)
    pad_w, pad_h, cap = r.pad_w, r.pad_h, r._binned_cap
    smap = cfg.shadow_map_size

    print(f"scene: {int(scene.tri_valid.sum())} tris, fb {pad_w}x{pad_h}, "
          f"binned_cap {cap}")

    vs = timeit(
        "vertex_stage",
        lambda s, p: run_vertex_stage(
            s, p["proj_view"], p["prev_proj_view"], p["light_proj_view"]
        ),
        scene, params,
    )

    setup = timeit(
        "gbuf triangle_setup",
        lambda c, i, v: triangle_setup(c, i, v, pad_w, pad_h,
                                       cull_backface=True),
        vs.clip, scene.indices, scene.tri_valid,
    )

    bin_fn = functools.partial(
        bin_triangles, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
        n_tiles_x=pad_w // cfg.tile_w, n_tiles_y=pad_h // cfg.tile_h,
        max_tiles_per_tri=8, binned_cap=cap, global_cap=512,
    )
    binned = timeit("gbuf bin_triangles", bin_fn, setup)

    rast_fn = functools.partial(
        rasterize, width=pad_w, height=pad_h,
        tile_h=cfg.tile_h, tile_w=cfg.tile_w,
    )
    tri, z, b0, b1 = timeit("gbuf rasterize", rast_fn, binned)

    gbuf = timeit("gbuffer_pass", gbuffer_pass, tri, z, b0, b1, scene, vs)

    # shadow chain
    s_setup = timeit(
        "shadow triangle_setup",
        lambda c, i, v: triangle_setup(
            c, i, v, smap, smap, cull_backface=False,
            depth_bias_const=cfg.shadow_depth_bias_const,
            depth_bias_slope=cfg.shadow_depth_bias_slope,
        ),
        vs.shadow_clip, scene.indices, scene.tri_valid,
    )
    s_bin_fn = functools.partial(
        bin_triangles, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
        n_tiles_x=smap // cfg.tile_w, n_tiles_y=smap // cfg.tile_h,
        max_tiles_per_tri=8, binned_cap=cap, global_cap=512,
    )
    s_binned = timeit("shadow bin_triangles", s_bin_fn, s_setup)
    s_rast_fn = functools.partial(
        rasterize, width=smap, height=smap,
        tile_h=cfg.tile_h, tile_w=cfg.tile_w, depth_only=True,
    )
    _, shadow_map, _, _ = timeit("shadow rasterize", s_rast_fn, s_binned)

    ssao = timeit("ssao_pass", ssao_pass, gbuf.depth)

    color = timeit(
        "shading_pass",
        lambda g, s, sm, p, i: shading_pass(
            g, s, sm, scene.lights, scene.num_lights, p, ibl=i
        ),
        gbuf, ssao, shadow_map, params, ibl,
    )

    timeit("present_pass", present_pass, color)

    # whole frame for comparison
    frame = r._frame_fn
    out, _ = frame(scene, ibl, params, None, has_shadow_light=True)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out, _ = frame(scene, ibl, params, None, has_shadow_light=True)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{'FULL FRAME':26s} {dt * 1e3:9.2f} ms   "
          f"({1.0 / dt:.1f} fps)")


if __name__ == "__main__":
    main()
