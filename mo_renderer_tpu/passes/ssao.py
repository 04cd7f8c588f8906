"""SSAO pass — TPU-native port of resources/shaders/ssao.comp.

Depth-only ambient occlusion with 3 rings x 6i samples (18 taps), hash
noise, and depth-proportional radius.  All constants match the shader:
near/far 0.1/100 hardcoded (ssao.comp:12-13), aoCap 0.5, aoMultiplier 50,
aoRange 60, ring fade 0.5^i.

Two implementations:

- ``ssao_pass`` (default): radius-quantized.  Per-pixel random gathers are
  ~7ns/index on TPU (XLA gather emitter), so 18 data-dependent taps cost
  ~270ms at 1080p.  Instead the per-pixel sample radius is quantized to K
  geometric levels; for each (tap, level) the offset becomes a COMPILE-TIME
  integer shift of the depth image (a free fused slice), and each pixel
  selects its level's result.  All work is elementwise/VPU: ~50x faster.
  The radius includes the reference's hash-noise jitter, so quantization
  error is dithered exactly where the reference dithers.  Deviation from
  the shader: one shared radius drives both axes (the reference jitters
  rw/rh with two noise values, difference <2px at dither scale).

- ``ssao_pass_exact``: the direct gather port (ssao.comp semantics
  tap-for-tap), used as the numeric oracle in tests.

Output is quantized to rgba8 like the reference's storage image before the
shading pass consumes it (ssao_pass.rs:49-60).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

NEAR = 0.1
FAR = 100.0

NUM_RINGS = 3
NUM_SAMPLES = 6
# total fade weight: ring1 6 taps * 0.25 + ring2 12 taps * 0.125 = 3.0
_TAPS = []
_fade = 1.0
for _i in range(NUM_RINGS):
    _fade *= 0.5
    for _j in range(NUM_SAMPLES * _i):
        _step = 2.0 * np.pi / (NUM_SAMPLES * _i)
        _TAPS.append((np.cos(_j * _step) * _i, np.sin(_j * _step) * _i, _fade))
_TOTAL = sum(f for _, _, f in _TAPS)


def _linear_depth(d, near=NEAR, far=FAR):
    """ssao.comp:22-24 (near/far from EngineConfig.ssao_near/ssao_far;
    defaults match the shader's hardcoded 0.1/100)."""
    return (2.0 * near) / (far + near - d * (far - near))


def _compare_depths(d1, d2, near=NEAR, far=FAR):
    """ssao.comp:26-34."""
    ao_cap = 0.5
    ao_multiplier = 50.0
    depth_tolerance = 0.001
    ao_range = 60.0
    diff = jnp.sqrt(
        jnp.clip(1.0 - (d1 - d2) / (ao_range / (far - near)), 0.0, 1.0)
    )
    return jnp.minimum(ao_cap, jnp.maximum(0.0, d1 - d2 - depth_tolerance) * ao_multiplier) * diff


def _noise(px, py):
    """generateRandomNoise (ssao.comp:15-20): fract(sin(dot)*43758.5453)."""
    def fract_sin(dx, dy):
        v = jnp.sin(px * dx + py * dy) * 43758.5453
        return v - jnp.floor(v)

    nx = fract_sin(12.9898, 78.233)
    ny = fract_sin(12.9898 * 2.0, 78.233 * 2.0)
    return nx * 0.004, ny * 0.004


def _radii(depth_lin, w, h):
    """Per-pixel sample radii in pixels (ssao.comp:97-101)."""
    h_, w_ = depth_lin.shape
    iy = jax.lax.broadcasted_iota(jnp.int32, (h_, w_), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h_, w_), 1)
    nx, ny = _noise(ix.astype(jnp.float32), iy.astype(jnp.float32))
    d_c = jnp.clip(depth_lin, 0.05, 1.0)
    rw = ((1.0 / w) / d_c + nx * (1.0 - nx)) * (w / 2.0)
    rh = ((1.0 / h) / d_c + ny * (1.0 - ny)) * (h / 2.0)
    return rw, rh


def ssao_pass(depth: jnp.ndarray, num_levels: int = 16,
              near=NEAR, far=FAR) -> jnp.ndarray:
    """Radius-quantized SSAO: depth (H, W) raw [0,1] -> ao (H, W) [0,1]."""
    h, w = depth.shape
    d_lin = _linear_depth(depth, near, far)
    rw, _rh = _radii(d_lin, w, h)

    # geometric radius levels spanning the achievable range:
    # 0.5/clip(d,.05,1) in [0.5, 10] plus the hash-noise jitter, whose
    # amplitude is 0.004*(1-0.004)*(w/2) (ssao.comp noise * 0.004)
    r_lo, r_hi = 0.5, 10.0 + 0.004 * (1 - 0.004) * (w / 2.0)
    edges = np.geomspace(r_lo, r_hi, num_levels + 1)
    centers = np.sqrt(edges[:-1] * edges[1:])
    lvl = jnp.clip(
        jnp.searchsorted(jnp.asarray(edges[1:-1], jnp.float32), rw),
        0, num_levels - 1,
    )

    # max integer offset over all (tap, level) pairs bounds the pad
    max_r = float(centers[-1]) * max(abs(s) for s, _, _ in _TAPS + [(0, 2, 0)])
    pad = int(np.ceil(max_r * 2.0)) + 1
    padded = jnp.pad(d_lin, pad, mode="edge")

    def shifted(ox, oy):
        return jax.lax.slice(
            padded, (pad + oy, pad + ox), (pad + oy + h, pad + ox + w)
        )

    # compare() per UNIQUE integer offset, shared across (tap, level)
    compare_cache: dict[tuple[int, int], jnp.ndarray] = {}

    def compare_at(ox, oy):
        if (ox, oy) not in compare_cache:
            compare_cache[(ox, oy)] = _compare_depths(
                d_lin, shifted(ox, oy), near, far
            )
        return compare_cache[(ox, oy)]

    ao = jnp.zeros_like(d_lin)
    for k in range(num_levels):
        r_k = float(centers[k])
        ao_k = None
        for sw, sh, fade in _TAPS:
            # GLSL int() truncation toward zero (ssao.comp:124-125)
            ox = int(np.trunc(sw * r_k))
            oy = int(np.trunc(sh * r_k))
            c = compare_at(ox, oy) * fade
            ao_k = c if ao_k is None else ao_k + c
        ao = jnp.where(lvl == k, ao_k, ao)

    ao = 1.0 - ao / _TOTAL
    return jnp.round(jnp.clip(ao, 0.0, 1.0) * 255.0) / 255.0


def _ssao_tap_table(w: int, num_levels: int):
    """Static (edges, per-level integer tap offsets, max |offset|)."""
    r_lo, r_hi = 0.5, 10.0 + 0.004 * (1 - 0.004) * (w / 2.0)
    edges = np.geomspace(r_lo, r_hi, num_levels + 1)
    centers = np.sqrt(edges[:-1] * edges[1:])
    level_taps = []
    max_off = 0
    for k in range(num_levels):
        taps_k = []
        for sw, sh, fade in _TAPS:
            ox = int(np.trunc(sw * float(centers[k])))
            oy = int(np.trunc(sh * float(centers[k])))
            taps_k.append((ox, oy, fade))
            max_off = max(max_off, abs(ox), abs(oy))
        level_taps.append(taps_k)
    return edges, level_taps, max_off


def ssao_halo_rows(w: int, num_levels: int = 16) -> int:
    """Rows of neighbor depth a row-sharded SSAO needs on each side
    (== the Pallas kernel's y padding, kept exactly in sync)."""
    _, _, max_off = _ssao_tap_table(w, num_levels)
    return ((max_off + 7) // 8) * 8


def ssao_pass_pallas(
    depth: jnp.ndarray,
    num_levels: int = 16,
    tile_h: int = 16,
    tile_w: int = 128,
    row_offset: int = 0,
    y_halo=None,
    near=NEAR,
    far=FAR,
) -> jnp.ndarray:
    """ssao_pass with the tap loop inside one Pallas tile kernel.

    Numerically identical structure to ``ssao_pass`` (same radius
    quantization, same dedup'd integer tap offsets), but each (tile,
    level, tap) compare runs on a VMEM-resident halo window instead of a
    materialized full-image shift: the XLA version writes ~200
    intermediate (H, W) arrays to HBM (~14ms at 1080p); here the window
    is read once per tile.

    Row-sharded use: ``row_offset`` is this band's first GLOBAL pixel
    row (drives the hash noise), and ``y_halo = (top, bottom)`` supplies
    REAL neighbor depth rows (ssao_halo_rows(w) each, raw [0,1] depth)
    in place of edge padding — the sharded result is then bit-identical
    to the unsharded full-image pass.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = depth.shape
    assert h % tile_h == 0 and w % tile_w == 0
    n_ty, n_tx = h // tile_h, w // tile_w

    edges, level_taps, max_off = _ssao_tap_table(w, num_levels)

    # halo: y rounded to sublanes, x to one lane group (DMA alignment)
    pad_y = ((max_off + 7) // 8) * 8
    pad_x = 128
    assert max_off <= pad_x
    d_lin = _linear_depth(depth, near, far)
    if y_halo is None:
        padded = jnp.pad(d_lin, ((pad_y, pad_y), (pad_x, pad_x)), mode="edge")
    else:
        top, bottom = y_halo
        assert top.shape == (pad_y, w) and bottom.shape == (pad_y, w)
        padded = jnp.concatenate(
            [_linear_depth(top, near, far), d_lin,
             _linear_depth(bottom, near, far)], axis=0
        )
        padded = jnp.pad(padded, ((0, 0), (pad_x, pad_x)), mode="edge")
    win_h, win_w = tile_h + 2 * pad_y, tile_w + 2 * pad_x

    edges_in = jnp.asarray(edges[1:-1], jnp.float32).reshape(1, -1)
    roff = jnp.reshape(jnp.asarray(row_offset, jnp.int32), (1, 1))

    def kernel(edges_ref, roff_ref, hbm_ref, ao_ref, win, sem):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        copy = pltpu.make_async_copy(
            hbm_ref.at[
                pl.ds(ty * tile_h, win_h), pl.ds(tx * tile_w, win_w)
            ],
            win,
            sem,
        )
        copy.start()

        iy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        ix = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        py = (ty * tile_h + iy + roff_ref[0, 0]).astype(jnp.float32)
        px = (tx * tile_w + ix).astype(jnp.float32)
        nx, _ny = _noise(px, py)

        copy.wait()
        d_c = jnp.clip(win[pad_y : pad_y + tile_h, pad_x : pad_x + tile_w],
                       0.05, 1.0)
        dd = win[pad_y : pad_y + tile_h, pad_x : pad_x + tile_w]
        rw = ((1.0 / w) / d_c + nx * (1.0 - nx)) * (w / 2.0)
        lvl = jnp.zeros((tile_h, tile_w), jnp.int32)
        for e in range(num_levels - 1):
            lvl = lvl + (rw > edges_ref[0, e]).astype(jnp.int32)

        cache = {}

        def compare_at(ox, oy):
            if (ox, oy) not in cache:
                shifted = win[
                    pad_y + oy : pad_y + oy + tile_h,
                    pad_x + ox : pad_x + ox + tile_w,
                ]
                cache[(ox, oy)] = _compare_depths(dd, shifted, near, far)
            return cache[(ox, oy)]

        ao = jnp.zeros((tile_h, tile_w), jnp.float32)
        for k in range(num_levels):
            ao_k = None
            for ox, oy, fade in level_taps[k]:
                c = compare_at(ox, oy) * fade
                ao_k = c if ao_k is None else ao_k + c
            ao = jnp.where(lvl == k, ao_k, ao)

        ao = 1.0 - ao / _TOTAL
        ao_ref[:] = jnp.round(jnp.clip(ao, 0.0, 1.0) * 255.0) / 255.0

    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        kernel,
        grid=(n_ty, n_tx),
        in_specs=[
            pl.BlockSpec((1, num_levels - 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win_h, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(edges_in, roff, padded)


def ssao_pass_exact(depth: jnp.ndarray, near=NEAR, far=FAR) -> jnp.ndarray:
    """Direct gather port of ssao.comp (numeric oracle; slow on TPU)."""
    h, w = depth.shape
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    d_lin = _linear_depth(depth, near, far)
    rw, rh = _radii(d_lin, w, h)

    ao = jnp.zeros_like(d_lin)
    for sw, sh, fade in _TAPS:
        ox = jnp.trunc(sw * rw).astype(jnp.int32)
        oy = jnp.trunc(sh * rh).astype(jnp.int32)
        sy = jnp.clip(iy + oy, 0, h - 1)
        sx = jnp.clip(ix + ox, 0, w - 1)
        d_s = _linear_depth(depth.reshape(-1)[sy * w + sx], near, far)
        ao = ao + _compare_depths(d_lin, d_s, near, far) * fade

    ao = 1.0 - ao / _TOTAL
    return jnp.round(jnp.clip(ao, 0.0, 1.0) * 255.0) / 255.0
