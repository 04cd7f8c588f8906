"""Native data-loader (C++/ctypes) vs the pure-Python implementations."""

import os

import numpy as np
import pytest

from mo_renderer_tpu import native

REF_HDR = "/root/reference/resources/tex/env/default_sky.hdr"


def _python_quads(img):
    u32 = (
        img[..., 0].astype(np.uint32)
        | (img[..., 1].astype(np.uint32) << 8)
        | (img[..., 2].astype(np.uint32) << 16)
        | (img[..., 3].astype(np.uint32) << 24)
    )
    xs = np.roll(u32, -1, axis=1)
    ys = np.roll(u32, -1, axis=0)
    xys = np.roll(xs, -1, axis=0)
    s = img.shape[0]
    return np.stack([u32, xs, ys, xys], axis=-1).reshape(s * s, 4)


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_pack_quads_matches_python(lib):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (33, 33, 4)).astype(np.uint8)
    out = native.pack_quads_u32(img)
    np.testing.assert_array_equal(out, _python_quads(img))


@pytest.mark.skipif(not os.path.exists(REF_HDR), reason="no reference HDR")
def test_hdr_decode_matches_python(lib, monkeypatch):
    from mo_renderer_tpu.assets import image_io

    with open(REF_HDR, "rb") as f:
        data = f.read()
    nat = native.hdr_decode_rgbe(data)
    assert nat is not None
    # force the Python decoder by disabling the native hook
    monkeypatch.setattr(
        "mo_renderer_tpu.native.hdr_decode_rgbe", lambda d: None
    )
    ref = image_io.load_hdr(REF_HDR)
    np.testing.assert_array_equal(image_io.rgbe_to_float(nat), ref)


def test_hdr_reject_garbage(lib):
    assert native.hdr_decode_rgbe(b"not an hdr file \n\n") is None
