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
