"""Multi-chip cost evidence without multi-chip hardware (VERDICT r2 #6).

Runs the row-sharded frame at a 4K-shaped config on a forced 8-device
CPU host mesh, then:

1. dumps the compiled sharded frame's HLO and records every collective
   (op kind, element type, shape, bytes) — the ppermute SSAO halo is the
   ONLY per-pixel collective by design;
2. checks the measured collective volume against the analytic model
   (2 ppermutes x halo_rows x pad_w x 4B);
3. executes ONE frame to prove the 4K shapes/VMEM layouts survive end
   to end on a real 8-way mesh;
4. prints a JSON cost model (collective bytes/frame, estimated ICI
   time at v4-ish 45 GB/s per link, replicated-vs-banded work split)
   for NOTES_PERF.md's multi-chip section.

Run directly (it forces its own backend): python scripts/multichip_cost_model.py
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_DEV = int(os.environ.get("MO_COST_DEVICES", "8"))
flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
flags.append(f"--xla_force_host_platform_device_count={N_DEV}")
os.environ["XLA_FLAGS"] = " ".join(flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import __graft_entry__ as graft  # noqa: E402

DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "f16": 2, "bf16": 2,
               "u16": 2, "s8": 1, "u8": 1, "pred": 1}
COLLECTIVES = ("collective-permute", "all-reduce", "all-gather",
               "reduce-scatter", "all-to-all")


def collect_collectives(hlo_text: str):
    """[(kind, dtype, shape, bytes)] for every collective in the HLO."""
    out = []
    for line in hlo_text.splitlines():
        for kind in COLLECTIVES:
            if f"{kind}(" not in line and f"{kind}-start(" not in line:
                continue
            m = re.search(r"=\s*(\w+)\[([\d,]*)\]", line)
            if not m:
                continue
            dt, dims = m.group(1), m.group(2)
            shape = [int(x) for x in dims.split(",") if x]
            n = int(np.prod(shape)) if shape else 1
            out.append((kind, dt, shape, n * DTYPE_BYTES.get(dt, 4)))
            break
    return out


def main():
    import dataclasses

    from mo_renderer_tpu.parallel.multi_view import make_view_mesh
    from mo_renderer_tpu.parallel.tile_sharding import TileShardedRenderer
    from mo_renderer_tpu.passes.ssao import ssao_halo_rows

    devices = jax.devices()
    assert len(devices) >= N_DEV, (len(devices), N_DEV)

    # 4K frame, tiny assets (procedural scene, small textures/shadow so
    # the one CPU execution stays minutes, not hours — the SHAPES under
    # test are the framebuffer bands and the halo, which are real 4K)
    cfg = dataclasses.replace(
        graft._tiny_config(), width=3840, height=2160,
        shadow_map_size=512,
    )
    world = graft._tiny_world()
    world.insert_resource(graft._camera(cfg))
    ts = TileShardedRenderer(cfg, make_view_mesh(devices[:N_DEV], "rows"))
    ts.prepare(world)
    inner = ts._inner
    params, has_light = inner.frame_params(world)
    ibl = ts.ibl.maps()

    lowered = ts._frame_fn.lower(
        ts.scene, ibl, params, has_shadow_light=has_light
    )
    hlo = lowered.compile().as_text()
    colls = collect_collectives(hlo)
    total_bytes = sum(c[3] for c in colls)

    # analytic model: the SSAO halo is 2 ppermutes of
    # (halo_rows, pad_w) f32, plus — since the shadow raster is band-
    # sharded (tile_sharding._shadow_quads_banded) — ONE all_gather
    # reassembling the (smap, smap) f32 shadow map from per-device
    # bands.  Everything else is replicated compute.
    from mo_renderer_tpu.parallel.tile_sharding import (
        shadow_bands_divisible,
    )

    halo = ssao_halo_rows(inner.pad_w)
    expect_halo = 2 * halo * inner.pad_w * 4
    smap = cfg.shadow_map_size
    banded_shadow = shadow_bands_divisible(cfg, N_DEV)
    expect_gather = smap * smap * 4 if banded_shadow else 0
    expect = expect_halo + expect_gather
    # shard_map may fuse/split or add tiny bookkeeping collectives;
    # demand the volume matches the model within 2x
    assert total_bytes <= 2 * expect + (1 << 16), (total_bytes, expect)

    t0 = time.perf_counter()
    frame = ts.render(world)  # one full 4K frame on the 8-way CPU mesh
    dt = time.perf_counter() - t0
    assert frame.shape == (cfg.height, cfg.width, 4), frame.shape
    assert frame[..., :3].max() > 0
    ts.check_overflow()

    # replicated-work fraction: binning enumerates 2T + 8*mcap pairs +
    # sorts them on EVERY device; banded work is the per-pixel stack
    t = int(ts.scene.indices.shape[0])
    ici_bps = 45e9  # ~TPU v4 unidirectional per-link
    model = {
        "devices": N_DEV,
        "resolution": f"{cfg.width}x{cfg.height}",
        "band_rows": inner.pad_h // N_DEV,
        "collectives": [
            {"op": k, "dtype": d, "shape": s, "bytes": b}
            for k, d, s, b in colls
        ],
        "collective_bytes_per_frame": total_bytes,
        "analytic_bytes": {
            "ssao_halo": expect_halo,
            "shadow_band_gather": expect_gather,
        },
        "est_ici_us_per_frame": round(total_bytes / ici_bps * 1e6, 1),
        "shadow_raster_banded": banded_shadow,
        "replicated_stages": {
            "what": (
                "triangle setups (per-triangle corner projection) + "
                "PCF-window build; the shadow RASTER is band-sharded "
                "(r4), BINNING is band-local (r5), and the per-vertex "
                "stage is GONE (r5: setup projects the packed "
                "per-triangle corners, triangle_setup_from_attrs)"
            ),
            "binned_pairs_capacity": int(inner._binned_cap),
            "triangles": t,
            # single-chip trace attribution at sponza (NOTES_PERF.md):
            # replicated = setups ~0.4 (corner projection + edge math,
            # gathers gone) + PCF window build 0.6 ~= 1.0ms of a 23.5ms
            # frame (~4%); binning (~2.0ms) band-local and the vertex
            # stage (0.3ms) eliminated in round 5 (was ~15% entering
            # the round, ~25% in round 3)
            "est_t_repl_frac_sponza": 0.04,
        },
        "cpu_mesh_4k_frame_seconds": round(dt, 1),
        "ok": True,
    }
    out = json.dumps(model)
    print(out)
    with open(os.environ.get(
        "MO_COST_OUT", "/tmp/multichip_cost_model.json"
    ), "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
