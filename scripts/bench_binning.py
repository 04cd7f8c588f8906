"""Raster setup/binning/raster cost breakdown on the sponza scene (TPU).

VERDICT round-2 item 2: sponza's wall is the raster+binning stack
(~12.7ms of its 32ms).  This script times each stage jitted separately
and prints (tile, tri) pair statistics — span histogram, pairs after
the bbox test vs after an EXACT edge-vs-tile-rect overlap test — so
binning experiments are driven by data, not guesses.

Usage: python scripts/bench_binning.py  (TPU; ~2 min with compiles)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from examples.sponza_scale import build_app
from mo_renderer_tpu.config import EngineConfig
from mo_renderer_tpu.kernels.raster_setup import bin_triangles, triangle_setup
from mo_renderer_tpu.kernels.rasterizer import rasterize
from mo_renderer_tpu.passes.vertex_stage import run_vertex_stage


def timeit(fn, *args, n=20, label=""):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / n
    print(f"{label:42s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    cfg = EngineConfig(width=1920, height=1080)
    app = build_app(cfg)
    app.resumed()
    r = app.renderer
    scene = r.scene
    params, _ = r.frame_params(app.world)
    pad_w, pad_h = r.pad_w, r.pad_h
    binned_cap = r._binned_cap
    print(f"tris={scene.indices.shape[0]} binned_cap={binned_cap} "
          f"pad={pad_w}x{pad_h} tile={cfg.tile_h}x{cfg.tile_w}")

    vs = jax.jit(run_vertex_stage)(
        scene, params["proj_view"], params["prev_proj_view"],
        params["light_proj_view"],
    )

    # --- stage timings (steady state, each its own jit) ------------------
    setup_fn = jax.jit(lambda clip: triangle_setup(
        clip, scene.indices, scene.tri_valid, pad_w, pad_h,
        cull_backface=True))
    setup = setup_fn(vs.clip)
    timeit(setup_fn, vs.clip, label="triangle_setup (gbuffer)")

    ntx, nty = pad_w // cfg.tile_w, pad_h // cfg.tile_h
    bin_fn = jax.jit(lambda s: bin_triangles(
        s, tile_h=cfg.tile_h, tile_w=cfg.tile_w, n_tiles_x=ntx,
        n_tiles_y=nty, max_tiles_per_tri=8, binned_cap=binned_cap,
        global_cap=512))
    binned = bin_fn(setup)
    timeit(bin_fn, setup, label="bin_triangles (gbuffer)")

    rast_fn = jax.jit(lambda b: rasterize(
        b, width=pad_w, height=pad_h, tile_h=cfg.tile_h,
        tile_w=cfg.tile_w)[1].sum())
    timeit(rast_fn, binned, label="rasterize full (gbuffer)")

    smap = cfg.shadow_map_size
    s_setup_fn = jax.jit(lambda clip: triangle_setup(
        clip, scene.indices, scene.tri_valid, smap, smap,
        cull_backface=False, depth_bias_const=cfg.shadow_depth_bias_const,
        depth_bias_slope=cfg.shadow_depth_bias_slope))
    s_setup = s_setup_fn(vs.shadow_clip)
    s_bin_fn = jax.jit(lambda s: bin_triangles(
        s, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
        n_tiles_x=smap // cfg.tile_w, n_tiles_y=smap // cfg.tile_h,
        max_tiles_per_tri=8, binned_cap=binned_cap, global_cap=512))
    s_binned = s_bin_fn(s_setup)
    timeit(s_bin_fn, s_setup, label="bin_triangles (shadow)")
    s_rast_fn = jax.jit(lambda b: rasterize(
        b, width=smap, height=smap, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
        depth_only=True)[1].sum())
    timeit(s_rast_fn, s_binned, label="rasterize depth-only (shadow)")

    # --- pair statistics (host, gbuffer + shadow) -------------------------
    for name, st, (tx_n, tw, th) in (
        ("gbuffer", setup, (ntx, cfg.tile_w, cfg.tile_h)),
        ("shadow", s_setup, (smap // cfg.tile_w, cfg.tile_w, cfg.tile_h)),
    ):
        tri = np.asarray(st.tri_data)
        bbox = np.asarray(st.bbox)
        live = (tri[:, 15] > 0) & (bbox[:, 0] <= bbox[:, 2])
        tx0, ty0 = bbox[:, 0] // tw, bbox[:, 1] // th
        tx1, ty1 = bbox[:, 2] // tw, bbox[:, 3] // th
        span = (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
        span = np.where(live, span, 0)
        hist = [int(((span == k) & live).sum()) for k in range(1, 9)]
        n_small = int((live & (span <= 8)).sum())
        n_global = int((live & (span > 8)).sum())
        pairs_bbox = int(span[live & (span <= 8)].sum())

        # exact edge-vs-tile-rect test: the tile overlaps iff every edge's
        # max over the tile's pixel-center rect is accepting
        a = tri[:, 0:3]; b = tri[:, 3:6]; c = tri[:, 6:9]
        exact_pairs = 0
        idx = np.nonzero(live & (span <= 8))[0]
        for t in idx:
            for sy in range(int(ty0[t]), int(ty1[t]) + 1):
                for sx in range(int(tx0[t]), int(tx1[t]) + 1):
                    x0, x1 = sx * tw + 0.5, sx * tw + tw - 0.5
                    y0, y1 = sy * th + 0.5, sy * th + th - 0.5
                    ok = True
                    for e in range(3):
                        mx = a[t, e] * (x1 if a[t, e] > 0 else x0)
                        my = b[t, e] * (y1 if b[t, e] > 0 else y0)
                        if mx + my + c[t, e] <= 0:
                            ok = False
                            break
                    if ok:
                        exact_pairs += 1
        print(f"[{name}] live={int(live.sum())} small={n_small} "
              f"global={n_global} span_hist(1..8)={hist}")
        print(f"[{name}] pairs: bbox={pairs_bbox} exact={exact_pairs} "
              f"({100.0 * exact_pairs / max(pairs_bbox, 1):.1f}% kept)",
              flush=True)


if __name__ == "__main__":
    main()
