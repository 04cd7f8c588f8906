"""Round-5 experiment: XLA layout/gather compiler flags vs the relayout.

Angle (a) of the gather-output-relayout attack (VERDICT r4 #1): compile
the SAME lowered 1080p frame under candidate xla_tpu flags (verified to
be parsed server-side — a bogus flag errors) and time each executable
interleaved in ONE process, per the drift rule (NOTES_PERF.md: only
same-process interleaved A/Bs are trustworthy).

Usage: python scripts/r5_relayout_flags.py  (~15 min: one compile per
variant + interleaved timing rounds)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("MO_MODEL", "man.glb")

import numpy as np


VARIANTS = [
    ("baseline", {}),
    # CANARY: disabling multi-output fusion must visibly hurt a frame
    # this fusion-heavy — if it times identical to baseline, the
    # compiler_options are not reaching compilation and every "neutral"
    # result below is invalid
    ("canary_no_mo_fusion", {"xla_jf_enable_multi_output_fusion": "False"}),
    ("gather_expander_better_layout",
     {"xla_tpu_gather_expander_expand_for_better_layout": "True"}),
    ("layout_negotiation", {"xla_tpu_allow_layout_negotiation": "True"}),
    ("autotune_layouts", {"xla_tpu_autotune_layouts": "True"}),
]


def main():
    import jax

    from examples.pbr_ibl import build_app
    from mo_renderer_tpu.config import EngineConfig

    # the persistent compile cache may not key on compiler_options (the
    # first run of this script saw 17-20s "compiles" of a 2-4 min
    # program — cache hits), which would silently time ONE executable
    # four times.  Disable it: every variant compiles fresh.
    jax.config.update("jax_enable_compilation_cache", False)

    cfg = EngineConfig(width=1920, height=1080, compile_cache=False)
    app = build_app(cfg)
    app.resumed()
    r = app.renderer
    params, has_light = r.frame_params(app.world)
    ibl = r.ibl.maps()
    quads = r._cached_shadow_quads(
        params.host_field("light_proj_view"), has_light
    )
    # The axon backend's server-side compile cache keys on the MODULE
    # ONLY — same HLO + different compiler_options returns the cached
    # executable byte-identical (verified: optimized HLO text equal
    # across options; a fresh module + options produces different HLO).
    # So each variant carries a unique dead scalar output to force a
    # fresh compile that actually applies its options.
    def make_fn(tag):
        def f(s, i, p, q):
            rgba, ovf = r._frame_fn(s, i, p, q, has_shadow_light=True)
            return rgba, ovf, jnp.float32(tag)
        return f

    import jax.numpy as jnp

    execs = []
    for k, (name, opts) in enumerate(VARIANTS):
        lowered = jax.jit(make_fn(1000.5 + k)).lower(
            r.scene, ibl, params, quads
        )
        t0 = time.perf_counter()
        try:
            c = lowered.compile(compiler_options=opts or None)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name}: COMPILE FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        print(f"{name}: compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)
        execs.append((name, c))

    args = (r.scene, ibl, params, quads)
    # warm + correctness spot check vs the first executable
    ref = None
    for name, c in execs:
        f, _, _ = c(*args)
        got = np.asarray(f[:4, :4])
        if ref is None:
            ref = got
        elif not np.array_equal(ref, got):
            print(f"{name}: OUTPUT DIFFERS from baseline (corner probe)",
                  flush=True)

    best = {name: float("inf") for name, _ in execs}
    for trial in range(4):
        for name, c in execs:
            t0 = time.perf_counter()
            for _ in range(10):
                f, _, _ = c(*args)
            np.asarray(f[0, 0])
            dt = (time.perf_counter() - t0) / 10
            best[name] = min(best[name], dt)
            print(f"  trial {trial} {name}: {dt*1e3:7.2f} ms", flush=True)
    print("\n=== best-of-4 (10-frame means) ===")
    for name, _ in execs:
        b = best[name]
        print(f"{name:34s} {b*1e3:7.2f} ms  ({1.0/b:6.2f} fps)")


if __name__ == "__main__":
    main()
