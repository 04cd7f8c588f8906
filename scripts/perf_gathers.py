"""Microbenchmark the frame's hot row gathers in isolation, on the REAL
packed scene tables (man.glb @1080p), to attribute trace fusions without
relying on HLO fusion numbering.

Usage: python scripts/perf_gathers.py   (~2 min after first compile)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("MO_MODEL", "man.glb")

import jax
import jax.numpy as jnp

from examples.pbr_ibl import build_app
from mo_renderer_tpu.config import EngineConfig
from mo_renderer_tpu.device.sampling import take_rows

REPS = int(os.environ.get("MO_PERF_REPS", "10"))


def timeit(name, table, n_idx, note=""):
    rows = table.shape[0]
    idx = jnp.asarray(
        (np.random.default_rng(0).integers(0, rows, n_idx)).astype(np.int32)
    )

    f = jax.jit(
        lambda t, i: jnp.sum(take_rows(t, i).astype(jnp.float32))
    )
    np.asarray(f(table, idx))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(table, idx)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    mb = table.size * table.dtype.itemsize / 1e6
    print(
        f"{name:28s} {dt:8.2f} ms  ({n_idx/1e6:.2f}M idx, "
        f"{table.shape[1]}x{table.dtype.itemsize}B rows, {mb:7.1f}MB table) {note}",
        flush=True,
    )


def main():
    cfg = EngineConfig(width=1920, height=1080)
    app = build_app(cfg)
    app.resumed()
    r = app.renderer
    scene = r.scene
    ibl = r.ibl.maps()
    n_full = 1920 * 1088
    n_half = 960 * 544
    n_quarter = 480 * 272

    timeit("attrs packed u32x25", scene.tri_attrs_packed, n_full)
    timeit("attrs legacy f32x44", scene.tri_attrs, n_full)
    timeit("texture_stack_a", scene.texture_stack_a, n_full)
    timeit("spec_quad_merged @full", ibl.specular_quad_merged.rows, n_full)
    timeit("spec_quad_merged @half", ibl.specular_quad_merged.rows, n_half)
    timeit("specular_quad @half", ibl.specular_quad.rows, n_half)
    # PCF window table analog: shadow-map-sized u32 (rows, 8)
    smap = cfg.shadow_map_size
    win = jnp.zeros((smap * smap, 8), jnp.uint32)
    timeit("pcf window @quarter", win, n_quarter)
    timeit("pcf window @full", win, n_full)


if __name__ == "__main__":
    main()
