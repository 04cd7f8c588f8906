"""Per-stage timing of the FAST frame path at 1080p (run on TPU).

Outputs are reduced to scalars inside jit so the axon host-transfer cost
doesn't pollute timings (block_until_ready does not block on axon).
"""

from __future__ import annotations

import functools
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
from mo_renderer_tpu.kernels.raster_setup import bin_triangles, triangle_setup
from mo_renderer_tpu.kernels.rasterizer import rasterize
from mo_renderer_tpu.passes.gbuffer import gbuffer_pass_fast
from mo_renderer_tpu.passes.shading import (
    calculate_shadow_fast,
    ibl_ambient_fast,
    shade_lights,
    skybox_color_fast,
)
from mo_renderer_tpu.passes.ssao import ssao_pass
from mo_renderer_tpu.passes.vertex_stage import (
    pack_triangle_attributes,
    run_vertex_stage,
)

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
    print(f"scene: {int(scene.tri_valid.sum())} tris, fast={r._fast}")

    vs = run_vertex_stage(
        scene, params["proj_view"], params["prev_proj_view"],
        params["light_proj_view"],
    )
    timeit("vertex_stage", lambda s, p: run_vertex_stage(
        s, p["proj_view"], p["prev_proj_view"], p["light_proj_view"]), scene, params)
    timeit("pack_tri_attrs", pack_triangle_attributes, scene, vs)
    tri_attrs = pack_triangle_attributes(scene, vs)

    setup = triangle_setup(vs.clip, scene.indices, scene.tri_valid,
                           pad_w, pad_h, cull_backface=True)
    bin_fn = functools.partial(
        bin_triangles, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
        n_tiles_x=pad_w // cfg.tile_w, n_tiles_y=pad_h // cfg.tile_h,
        max_tiles_per_tri=8, binned_cap=cap, global_cap=512)
    binned = bin_fn(setup)
    rast = functools.partial(rasterize, width=pad_w, height=pad_h,
                             tile_h=cfg.tile_h, tile_w=cfg.tile_w)
    timeit("setup+bin+raster", lambda c: rast(bin_fn(
        triangle_setup(c, scene.indices, scene.tri_valid, pad_w, pad_h))), vs.clip)
    tri, z, b0, b1 = rast(binned)

    gb_fn = functools.partial(gbuffer_pass_fast,
                              slot_map=r._slot_map)
    timeit("gbuffer_fast", gb_fn, tri, z, b0, b1, scene, tri_attrs, params)
    gbuf = gb_fn(tri, z, b0, b1, scene, tri_attrs, params)

    # shadow chain
    s_setup = triangle_setup(
        vs.shadow_clip, scene.indices, scene.tri_valid, smap, smap,
        cull_backface=False, depth_bias_const=cfg.shadow_depth_bias_const,
        depth_bias_slope=cfg.shadow_depth_bias_slope)
    s_bin = functools.partial(
        bin_triangles, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
        n_tiles_x=smap // cfg.tile_w, n_tiles_y=smap // cfg.tile_h,
        max_tiles_per_tri=8, binned_cap=cap, global_cap=512)
    timeit("shadow raster chain", lambda c: rasterize(
        s_bin(triangle_setup(c, scene.indices, scene.tri_valid, smap, smap,
                             cull_backface=False)),
        width=smap, height=smap, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
        depth_only=True), vs.shadow_clip)
    _, shadow_map, _, _ = rasterize(
        s_bin(s_setup), width=smap, height=smap,
        tile_h=cfg.tile_h, tile_w=cfg.tile_w, depth_only=True)

    timeit("shadow window build", build_window_rows_2x4, shadow_map)
    squads = build_window_rows_2x4(shadow_map)

    timeit("ssao", ssao_pass, gbuf.depth)
    timeit("pcf_fast", lambda g, p, q: calculate_shadow_fast(
        g.position, p["light_proj_view"], q, smap), gbuf, params, squads)
    timeit("shade_lights", lambda g, p: shade_lights(
        g, scene.lights, scene.num_lights, p["eye_pos"]), gbuf, params)
    timeit("ibl_ambient_fast", lambda g, p, i: ibl_ambient_fast(
        g, p["eye_pos"], i), gbuf, params, ibl)
    timeit("skybox_fast", lambda p, i: skybox_color_fast(
        pad_h, pad_w, p, i), params, ibl)

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
