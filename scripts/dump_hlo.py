"""Compile the steady-state frame for TPU and dump the optimized HLO
(for mapping trace op names like copy.452 back to tensors/layouts).

Usage: python scripts/dump_hlo.py [out.txt]   (~4 min, compile only)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("MO_MODEL", "man.glb")


def main():
    import jax

    from examples.pbr_ibl import build_app
    from mo_renderer_tpu.config import EngineConfig

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/frame_hlo.txt"
    cfg = EngineConfig(width=1920, height=1080)
    app = build_app(cfg)
    app.resumed()
    r = app.renderer
    params, has_light = r.frame_params(app.world)
    ibl = r.ibl.maps()

    # production path: memoized shadow quads as an argument (shadow_cache)
    quads = r._cached_shadow_quads(
        params.host_field("light_proj_view"), has_light
    )
    lowered = jax.jit(
        lambda s, i, p, q: r._frame_fn(s, i, p, q, has_shadow_light=True)
    ).lower(r.scene, ibl, params, quads)
    txt = lowered.compile().as_text()
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
