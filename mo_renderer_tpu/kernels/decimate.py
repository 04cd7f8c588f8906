"""Column decimation / interleave for the checkerboard shading domain.

``decimate_cols(x, phase)`` extracts every other column with a per-row
column phase (0, 1, row-parity "cb", or its complement "anti");
``interleave_cols(a, b)`` merges two half-width planes back to full width.
Together they map between the full frame and the checkerboard domain
(passes/frame_graph.py): cb pixel (y, j) <-> full pixel (y, 2j + (y&1)).

Implementation notes (measured, scripts/bench_decimate.py):
- A stride-2 SLICE lowers to a per-index gather, but the equivalent
  window-1 stride-2 ``reduce_window`` takes XLA's pooling path and is
  bandwidth-bound (~26us net for a 1080p f32 plane) — so decimation is
  pure jnp, no kernel needed.
- The inverse (interleave) via ``stack(-1).reshape`` puts a 2-wide axis
  on the 128-lane minor dim (the layout-copy trap, NOTES_PERF.md), so on
  TPU it runs as a Pallas lane-gather kernel (~0.14ms net at 1080p);
  off-TPU the reshape form is used.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANES = 128


def _stride2_cols(x, start: int):
    """x[:, start::2] via reduce_window (pooling path, not gather)."""
    pad = ((0, 0), (-start, (x.shape[1] + start) % 2 + start - 1))
    return jax.lax.reduce_window(
        x, jnp.zeros((), x.dtype), jax.lax.add,
        window_dimensions=(1, 1), window_strides=(1, 2),
        padding=(pad if start else "VALID"),
    )


def _row_odd(h, w, dtype=bool):
    return jnp.broadcast_to(
        (jnp.arange(h) & 1).astype(dtype)[:, None], (h, w)
    )


def decimate_cols(x, phase=0):
    """(H, W) -> (H, ceil(W/2)): out[y, j] = x[y, 2j + p(y)].

    phase: 0 | 1 (constant column phase) | "cb" (p = y&1) |
    "anti" (p = 1 - (y&1)); the parity phases require even W (an odd
    plane would need ceil(W/2) even columns but floor(W/2) odd ones).
    Any 4-byte dtype.
    """
    if phase in (0, 1):
        return _stride2_cols(x, phase)
    if x.shape[1] % 2:
        raise ValueError(
            f"decimate_cols phase {phase!r} needs an even width, got "
            f"{x.shape[1]} (pad the plane by one edge column first)"
        )
    e = _stride2_cols(x, 0)
    o = _stride2_cols(x, 1)
    odd = _row_odd(x.shape[0], e.shape[1])
    if phase == "anti":
        odd = ~odd
    return jnp.where(odd, o, e)


def decimate_cols_ref(x, phase):
    """Strided-slice oracle for tests."""
    if phase in (0, 1):
        return x[:, phase::2]
    e, o = x[:, 0::2], x[:, 1::2]
    odd = _row_odd(x.shape[0], e.shape[1])
    if phase == "anti":
        odd = ~odd
    return jnp.where(odd, o, e)


def interleave_cols_ref(a, b):
    h, w2 = a.shape
    return jnp.stack([a, b], axis=-1).reshape(h, 2 * w2)


@functools.partial(jax.jit, static_argnames=("tile_h",))
def interleave_cols(a, b, tile_h: int = 8):
    """(H, W/2) x 2 -> (H, W): out[y, 2j] = a[y, j], out[y, 2j+1] = b[y, j].

    For checkerboard reassembly, pre-swap a/b per row parity (jnp.where
    on the half-width planes) so ``a`` is always the even-column plane.
    """
    if jax.default_backend() != "tpu":
        return interleave_cols_ref(a, b)
    return interleave_cols_pallas(a, b, tile_h=tile_h)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def interleave_cols_pallas(a, b, tile_h: int = 8, interpret: bool = False):
    """The Pallas lane-gather interleave kernel (see module docstring).

    ``interpret=True`` runs it in Pallas interpret mode so the production
    kernel is exercised by the CPU test suite (tests/test_decimate.py),
    matching kernels/rasterizer.py's _use_interpret pattern."""
    from jax.experimental import pallas as pl

    h, w2 = a.shape
    assert h % tile_h == 0, (h, w2)
    n_ty, n_tx = h // tile_h, -(-w2 // _LANES)

    def kernel(a_ref, b_ref, o_ref):
        l = jax.lax.broadcasted_iota(jnp.int32, (tile_h, _LANES), 1)
        odd = (l & 1).astype(bool)
        for half in range(2):
            src = half * (_LANES // 2) + (l >> 1)
            av = jnp.take_along_axis(a_ref[:, :], src, axis=1)
            bv = jnp.take_along_axis(b_ref[:, :], src, axis=1)
            o_ref[:, half * _LANES : (half + 1) * _LANES] = jnp.where(
                odd, bv, av
            )

    return pl.pallas_call(
        kernel,
        grid=(n_ty, n_tx),
        in_specs=[
            pl.BlockSpec((tile_h, _LANES), lambda i, j: (i, j)),
            pl.BlockSpec((tile_h, _LANES), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((tile_h, 2 * _LANES), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((h, 2 * w2), a.dtype),
        interpret=interpret,
    )(a, b)
