"""Checkerboard decimate/interleave kernels vs their strided-slice oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from mo_renderer_tpu.kernels import decimate as D


@pytest.mark.parametrize("shape", [(8, 256), (16, 1920), (32, 130)])
@pytest.mark.parametrize("phase", [0, 1, "cb", "anti"])
def test_decimate_cols(shape, phase):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape, np.float32))
    got = np.asarray(D.decimate_cols(x, phase))
    want = np.asarray(D.decimate_cols_ref(x, phase))
    assert got.shape == want.shape
    assert (got == want).all()


def test_decimate_int32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-5, 1 << 20, (16, 1920)).astype(np.int32))
    for phase in (0, 1, "cb", "anti"):
        got = np.asarray(D.decimate_cols(x, phase))
        assert (got == np.asarray(D.decimate_cols_ref(x, phase))).all()


@pytest.mark.parametrize("shape", [(8, 128), (16, 960), (32, 65)])
def test_interleave_cols(shape):
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.random(shape, np.float32))
    b = jnp.asarray(rng.random(shape, np.float32))
    got = np.asarray(D.interleave_cols(a, b))
    want = np.asarray(D.interleave_cols_ref(a, b))
    assert got.shape == (shape[0], 2 * shape[1])
    assert (got == want).all()


def test_decimate_odd_width_parity_raises():
    """cb/anti on an odd-width plane cannot satisfy the (H, ceil(W/2))
    contract (even/odd column counts differ); must fail loudly."""
    x = jnp.zeros((8, 131), jnp.float32)
    for phase in ("cb", "anti"):
        with pytest.raises(ValueError, match="even width"):
            D.decimate_cols(x, phase)
    # constant phases remain fine on odd widths
    assert D.decimate_cols(x, 0).shape == (8, 66)
    assert D.decimate_cols(x, 1).shape == (8, 65)


@pytest.mark.parametrize("dtype", [np.float32, np.uint32])
def test_interleave_cols_pallas_interpret(dtype):
    """The production Pallas lane-gather kernel (TPU path of
    interleave_cols) run in interpret mode on CPU, vs the reshape oracle —
    keeps the frame's final assembly kernel inside CI."""
    rng = np.random.default_rng(4)
    for shape in [(8, 128), (16, 960)]:
        if dtype == np.uint32:
            a = jnp.asarray(rng.integers(0, 1 << 32, shape, np.uint32))
            b = jnp.asarray(rng.integers(0, 1 << 32, shape, np.uint32))
        else:
            a = jnp.asarray(rng.random(shape, dtype))
            b = jnp.asarray(rng.random(shape, dtype))
        got = np.asarray(D.interleave_cols_pallas(a, b, interpret=True))
        want = np.asarray(D.interleave_cols_ref(a, b))
        assert (got == want).all()


def test_cb_roundtrip():
    """decimate cb + anti then parity-swapped interleave reproduces x."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((16, 256), np.float32))
    cb = D.decimate_cols(x, "cb")
    anti = D.decimate_cols(x, "anti")
    odd = D._row_odd(16, 128)
    even_plane = jnp.where(odd, anti, cb)
    odd_plane = jnp.where(odd, cb, anti)
    back = D.interleave_cols(even_plane, odd_plane)
    assert (np.asarray(back) == np.asarray(x)).all()
