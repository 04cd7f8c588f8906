"""Phase-by-phase timing of the IBL precompute chain on TPU.

Separates compile (first call) from steady (second call) for every
stage so the 'cold precompute' budget (VERDICT round-2 item 5) is
attributed correctly.  Run ALONE — XLA compilation is host-CPU-bound
and concurrent processes contaminate it.

Usage: python scripts/perf_ibl.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mo_renderer_tpu.assets import image_io
from mo_renderer_tpu.config import DEFAULT_CONFIG
from mo_renderer_tpu.kernels import ibl as K


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)
    return x


def phase(label, fn):
    t0 = time.perf_counter()
    out = sync(fn())
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(fn())
    warm = time.perf_counter() - t0
    print(f"{label:28s} cold {cold:7.2f}s   steady {warm:7.2f}s", flush=True)
    return out


def main():
    from mo_renderer_tpu.utils import enable_compile_cache

    enable_compile_cache()  # same behavior as IBLResource.ensure_computed
    cfg = DEFAULT_CONFIG
    hdr = os.path.join(
        cfg.resource_root, "tex", "env", "default_sky.hdr"
    )
    equirect = jnp.asarray(image_io.load_hdr(hdr))
    print(f"equirect {equirect.shape}  backend={jax.default_backend()}")

    env = phase(
        "equirect_to_cubemap 512",
        lambda: K.equirect_to_cubemap(equirect, cfg.ibl_cubemap_size)[..., :3],
    )
    phase("irradiance_map 128", lambda: K.irradiance_map(env, 128))
    phase(
        "specular_prefilter 8x1024",
        lambda: K.specular_prefilter(env, 8, cfg.ibl_specular_samples),
    )
    phase("brdf_lut 512", lambda: K.brdf_lut(cfg.ibl_brdf_lut_size))


if __name__ == "__main__":
    main()
