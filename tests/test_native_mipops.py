"""Native mipops library == NumPy reference paths."""

import numpy as np
import pytest

from colormipsearch_tpu.native import (available, max_filter_rgb_native,
                                       pack_planes_native,
                                       packbits_decode_range_native,
                                       rgb_gray_signal_native)
from colormipsearch_tpu.imageproc.filters import max_filter_plane
from colormipsearch_tpu.imageproc.colors import rgb_to_gray_no_gamma
from colormipsearch_tpu.cds.pixel_kernel import pack_planes

pytestmark = pytest.mark.skipif(not available(),
                                reason="native toolchain unavailable")

rng = np.random.default_rng(11)


@pytest.mark.parametrize("radius", [1.5, 2.5, 10.0, 20.0, 60.0])
def test_max_filter_parity(radius):
    rgb = rng.integers(0, 256, size=(70, 150, 3)).astype(np.uint8)
    rgb[rng.random((70, 150)) < 0.7] = 0
    # expected from the NumPy decomposition directly (max_filter_rgb
    # itself dispatches to the native path when available)
    want = np.stack([max_filter_plane(rgb[:, :, c], radius)
                     for c in range(3)], axis=2)
    got = max_filter_rgb_native(rgb, radius)
    np.testing.assert_array_equal(got, want)


def test_pack_planes_parity():
    rgb = rng.integers(0, 256, size=(64, 130, 3)).astype(np.uint8)
    rgb[rng.random((64, 130)) < 0.5] = 0
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    sel = (rgb > 20).any(axis=2)
    want = pack_planes(r, g, b, sel, np)
    got = pack_planes_native(rgb, 20)
    np.testing.assert_array_equal(got, want)

    excluded = rng.random((64, 130)) < 0.3
    want2 = pack_planes(r, g, b, sel & ~excluded, np)
    got2 = pack_planes_native(rgb, 20, excluded)
    np.testing.assert_array_equal(got2, want2)


def test_gray_signal_parity():
    rgb = rng.integers(0, 256, size=(50, 60, 3)).astype(np.uint8)
    rgb[rng.random((50, 60)) < 0.5] = 0
    want = (rgb_to_gray_no_gamma(rgb) > 2).astype(np.uint8)
    got = rgb_gray_signal_native(rgb, 2)
    np.testing.assert_array_equal(got, want)


def test_packbits_roundtrip():
    # encode a buffer with simple packbits and decode
    raw = rng.integers(0, 4, size=1000).astype(np.uint8)
    # trivial encoder: literal runs of <=128
    chunks = []
    for i in range(0, len(raw), 128):
        part = raw[i:i + 128]
        chunks.append(bytes([len(part) - 1]) + part.tobytes())
    data = b"".join(chunks)
    out = packbits_decode_range_native(data, len(raw))
    np.testing.assert_array_equal(out, raw)
    # ranged decode fills only [start, end)
    out2 = packbits_decode_range_native(data, len(raw), start=100, end=200)
    np.testing.assert_array_equal(out2[100:200], raw[100:200])
    assert (out2[:100] == 0).all()
