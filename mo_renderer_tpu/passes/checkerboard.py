"""Checkerboard frame reconstruction (cfg.checkerboard).

The shading passes produce the frame on the checkerboard domain — an
(H, W/2) plane holding full pixels (y, 2j + (y&1)).  This module fills
the missing half from each missing pixel's four checkerboard neighbors
(left/right on the same row, up/down on the adjacent rows — all of which
ARE shaded), guided by the full-resolution visibility buffer: a neighbor
only contributes when it belongs to the same triangle as the missing
pixel, so surfaces never blend across silhouettes and the sky never
bleeds into geometry (sky pixels carry tri id -1 and reconstruct from
sky neighbors the same way).  Where no neighbor matches (a one-pixel
feature — its triangle was never shaded), all four average as the
fallback.

There is no Vulkan counterpart: the reference shades every fragment
(shading_pass.frag runs per pixel).  Checkerboarding exists because the
TPU frame's floor is the per-pixel gather streams (texture stack + attrs
rows, NOTES_PERF.md) whose cost is per-INDEX — halving the shaded pixels
halves them.  Error budget pinned in tests/test_fast_budget.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..kernels.decimate import decimate_cols, interleave_cols


def _up(a):  # neighbor above: row y reads a[y-1] (edge-clamped)
    return jnp.concatenate([a[:1], a[:-1]], axis=0)


def _down(a):
    return jnp.concatenate([a[1:], a[-1:]], axis=0)


def _prev_col(a):
    return jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)


def _next_col(a):
    return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)


def _row_odd(h, wc):
    return jnp.broadcast_to((jnp.arange(h) & 1).astype(bool)[:, None], (h, wc))


def _unpack3(u):
    """(H, Wc) packed-rgba8 uint32 -> three (H, Wc) float channels."""
    return [((u >> s) & 0xFF).astype(jnp.float32) for s in (0, 8, 16)]


def reconstruct_full(rgba_cb, tri_full):
    """(H, W/2) packed-u32 cb frame + (H, W) full-res tri ids -> (H, W).

    The missing plane M holds full pixels (y, 2j + 1 - (y&1)); its
    neighbors in cb coordinates are U/D = rgba_cb[y -/+ 1, j] and
    L/R = rgba_cb[y, j - (y&1)] / rgba_cb[y, j + 1 - (y&1)].
    """
    h, wc = rgba_cb.shape
    odd = _row_odd(h, wc)

    tri_cb = decimate_cols(tri_full, "cb")
    tri_anti = decimate_cols(tri_full, "anti")  # tri at missing pixels

    def neighbors(a):
        left = jnp.where(odd, _prev_col(a), a)
        right = jnp.where(odd, a, _next_col(a))
        return [left, right, _up(a), _down(a)]

    n_vals = [_unpack3(v) for v in neighbors(rgba_cb)]
    n_tris = neighbors(tri_cb)
    weights = [(t == tri_anti).astype(jnp.float32) for t in n_tris]
    wsum = sum(weights)
    any_match = wsum > 0.0

    chans = []
    for c in range(3):
        vals = [v[c] for v in n_vals]
        num = sum(w * v for w, v in zip(weights, vals))
        avg_match = num / jnp.maximum(wsum, 1.0)
        avg_all = sum(vals) * 0.25
        chans.append(jnp.where(any_match, avg_match, avg_all))

    m = (
        jnp.round(jnp.clip(chans[0], 0.0, 255.0)).astype(jnp.uint32)
        | (jnp.round(jnp.clip(chans[1], 0.0, 255.0)).astype(jnp.uint32) << 8)
        | (jnp.round(jnp.clip(chans[2], 0.0, 255.0)).astype(jnp.uint32) << 16)
        | jnp.uint32(0xFF000000)
    )

    even_plane = jnp.where(odd, m, rgba_cb)
    odd_plane = jnp.where(odd, rgba_cb, m)
    return interleave_cols(even_plane, odd_plane)
