"""Focused timing of the shading-side stages at 1080p (run on TPU).

Skips the slow-to-compile raster chains; see perf_fast.py for those.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("MO_MODEL", "man.glb")

from examples.pbr_ibl import build_app
from mo_renderer_tpu.config import EngineConfig
from mo_renderer_tpu.device.sampling import build_window_rows_2x4
from mo_renderer_tpu.kernels import brdf
from mo_renderer_tpu.kernels.raster_setup import bin_triangles, triangle_setup
from mo_renderer_tpu.kernels.rasterizer import rasterize
from mo_renderer_tpu.passes.gbuffer import gbuffer_pass_fast
from mo_renderer_tpu.passes.shading import (
    calculate_shadow_fast,
    ibl_ambient_fast,
    ibl_ambient_sky_fast,
    shade_lights,
    skybox_color_fast,
)
from mo_renderer_tpu.passes.ssao import ssao_pass
from mo_renderer_tpu.passes.vertex_stage import run_vertex_stage

REPS = int(os.environ.get("MO_PERF_REPS", "5"))


def _scalar(x):
    leaves = jax.tree.leaves(x)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def timeit(name, fn, *args):
    f = jax.jit(lambda *a: _scalar(fn(*a)))
    out = f(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:30s} {dt * 1e3:9.2f} ms", flush=True)


def main():
    cfg = EngineConfig(width=1920, height=1080)
    app = build_app(cfg)
    app.resumed()
    r = app.renderer
    scene, ibl = r.scene, r.ibl.maps()
    params, _ = r.frame_params(app.world)
    pad_w, pad_h, cap = r.pad_w, r.pad_h, r._binned_cap
    smap = cfg.shadow_map_size

    vs = run_vertex_stage(
        scene, params["proj_view"], params["prev_proj_view"],
        params["light_proj_view"],
    )
    setup = triangle_setup(vs.clip, scene.indices, scene.tri_valid,
                           pad_w, pad_h, cull_backface=True)
    binned = bin_triangles(
        setup, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
        n_tiles_x=pad_w // cfg.tile_w, n_tiles_y=pad_h // cfg.tile_h,
        max_tiles_per_tri=8, binned_cap=cap, global_cap=512)
    tri, z, b0, b1 = rasterize(binned, width=pad_w, height=pad_h,
                               tile_h=cfg.tile_h, tile_w=cfg.tile_w)
    gbuf = gbuffer_pass_fast(tri, z, b0, b1, scene, scene.tri_attrs, params,
                             slot_map=r._slot_map)
    squads = build_window_rows_2x4(jnp.zeros((smap, smap), jnp.float32))

    timeit("gbuffer_fast", lambda *a: gbuffer_pass_fast(
        *a, slot_map=r._slot_map),
        tri, z, b0, b1, scene, scene.tri_attrs, params)
    timeit("env_brdf_poly", brdf.env_brdf_poly,
           gbuf.orm[..., 0], gbuf.orm[..., 1])
    timeit("ibl_ambient_fast(no sky)", lambda g, p, i: ibl_ambient_fast(
        g, p["eye_pos"], i), gbuf, params, ibl)
    timeit("ibl_ambient_sky_fast", lambda g, p, i: ibl_ambient_sky_fast(
        g, p["eye_pos"], i, p), gbuf, params, ibl)
    timeit("skybox_fast(standalone)", lambda p, i: skybox_color_fast(
        pad_h, pad_w, p, i), params, ibl)
    timeit("pcf_fast", lambda g, p, q: calculate_shadow_fast(
        g.position, p["light_proj_view"], q, smap), gbuf, params, squads)
    timeit("shade_lights", lambda g, p: shade_lights(
        g, scene.lights, scene.num_lights, p["eye_pos"]), gbuf, params)
    timeit("ssao", ssao_pass, gbuf.depth)

    frame = r._frame_fn
    f = jax.jit(lambda s, i, p: _scalar(
        frame(s, i, p, None, has_shadow_light=True)[0]))
    out = f(scene, ibl, params)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(scene, ibl, params)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{'FULL FRAME':30s} {dt * 1e3:9.2f} ms   ({1.0 / dt:.2f} fps)")


if __name__ == "__main__":
    main()
