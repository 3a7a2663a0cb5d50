"""Device-side RLE block codec (reference nvcomp lane,
src/compressed_blocks.py:16,30): host encode <-> jitted device decode
round-trips exactly, raw fallback engages on incompressible blocks, and the
ratio on stencil-style depth data is meaningfully > 1."""
import numpy as np

from beats3d_tpu.data.device_codec import (
    DeviceCodecBlocks, rle_decode, rle_encode)


def _stencil_depth(rng, n=3, h=40, w=64):
    out = np.zeros((n, h, w), np.uint16)
    for i in range(n):
        cy, cx = rng.integers(10, h - 10), rng.integers(16, w - 16)
        yy, xx = np.mgrid[0:h, 0:w]
        m = (yy - cy) ** 2 + (xx - cx) ** 2 < 12 ** 2
        out[i][m] = 2000 + (yy[m] * 3 + xx[m]).astype(np.uint16)
    return out


def test_rle_roundtrip_exact(rng):
    arr = _stencil_depth(rng)[0]
    v, l, nr, raw = rle_encode(arr, budget=arr.size)
    assert not raw
    dec = np.asarray(rle_decode(
        v, l, n=arr.size, shape=arr.shape, dtype="uint16"))
    np.testing.assert_array_equal(dec, arr)


def test_codec_blocks_roundtrip_and_ratio(rng):
    blocks = list(_stencil_depth(rng, n=4))
    store = DeviceCodecBlocks(blocks, budget_frac=0.5)
    for i, b in enumerate(blocks):
        np.testing.assert_array_equal(np.asarray(store.get_block(i)), b)
    assert store.compression_ratio() > 1.5
    assert not any(store._raw)


def test_codec_raw_fallback(rng):
    noise = [rng.integers(0, 65535, (16, 32)).astype(np.uint16)
             for _ in range(2)]
    store = DeviceCodecBlocks(noise, budget_frac=0.1)
    assert all(store._raw)
    for i, b in enumerate(noise):
        np.testing.assert_array_equal(np.asarray(store.get_block(i)), b)


def test_codec_labels_dtype(rng):
    lab = np.zeros((2, 24, 24), np.uint8)
    lab[:, 5:12, 6:14] = 3
    store = DeviceCodecBlocks(list(lab))
    got = np.asarray(store.get_block(1))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, lab[1])
