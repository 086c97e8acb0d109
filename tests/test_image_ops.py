"""Image-op tests (ImageOperationsTest analogue,
imageprocessing/ImageOperationsTest.java:22-317)."""

import numpy as np
import pytest
from PIL import Image as PILImage

from colormipsearch_tpu.imageproc import load_image
from colormipsearch_tpu.imageproc.colors import (mask_rgb, mirror_x,
                                                 rgb_to_gray_no_gamma)
from colormipsearch_tpu.imageproc.filters import (circular_footprint,
                                                  make_line_radii,
                                                  max_filter_plane,
                                                  max_filter_rgb)
import pathlib

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "imageprocessing"


def test_make_line_radii_r10():
    """Kernel geometry for r=10 matches the documented ImageJ shape
    (ImageTransformation.java:542-544)."""
    dxs = make_line_radii(10)
    assert list(dxs) == [1, 4, 6, 7, 8, 8, 9, 9, 9, 10, 10,
                        10, 9, 9, 9, 8, 8, 7, 6, 4, 1]


def test_radius_snapping():
    """1.5->1.75 and 2.5->2.85 snapping (ImageTransformation.java:551-556)."""
    assert (make_line_radii(1.5) == make_line_radii(1.74)).all()
    assert (make_line_radii(2.5) == make_line_radii(2.84)).all()
    assert len(make_line_radii(1.5)) != len(make_line_radii(1.0))


def test_max_filter_matches_brute_force():
    """Row-decomposed sliding max == dense footprint max."""
    rng = np.random.default_rng(5)
    plane = rng.integers(0, 256, size=(40, 50)).astype(np.uint8)
    for radius in (1.5, 3.0, 10.0):
        fp = circular_footprint(radius)
        kr = (fp.shape[0] - 1) // 2
        want = np.zeros_like(plane)
        for y in range(plane.shape[0]):
            for x in range(plane.shape[1]):
                best = 0
                for dy in range(-kr, kr + 1):
                    for dx in range(-kr, kr + 1):
                        if not fp[dy + kr, dx + kr]:
                            continue
                        yy, xx = y + dy, x + dx
                        if 0 <= yy < plane.shape[0] and 0 <= xx < plane.shape[1]:
                            best = max(best, plane[yy, xx])
                want[y, x] = best
        got = max_filter_plane(plane, radius)
        np.testing.assert_array_equal(got, want)


def test_mirror_composition_order():
    """mirror(maxFilter(img)) == maxFilter(mirror(img)) for symmetric
    kernels (ImageOperationsTest.maxFilterThenHorizontalMirroring...)."""
    img = load_image(FIXTURES / "minmaxTest1.tif")
    a = mirror_x(max_filter_rgb(img.pixels, 10))
    b = max_filter_rgb(np.ascontiguousarray(mirror_x(img.pixels)), 10)
    np.testing.assert_array_equal(a, b)
    # double mirror is identity
    np.testing.assert_array_equal(mirror_x(mirror_x(img.pixels)), img.pixels)


def test_mask_rgb_threshold():
    rgb = np.array([[[10, 10, 10], [10, 30, 10], [0, 0, 0]]], dtype=np.uint8)
    out = mask_rgb(rgb, 20)
    assert (out[0, 0] == 0).all()      # all channels <= 20 -> black
    assert (out[0, 1] == [10, 30, 10]).all()  # kept
    assert (out[0, 2] == 0).all()


def test_gray_conversion_rounding():
    """(int)(r/3 + g/3 + b/3 + 0.5) double semantics."""
    rgb = np.array([[[1, 1, 1], [255, 255, 255], [0, 0, 1], [2, 0, 0]]],
                   dtype=np.uint8)
    gray = rgb_to_gray_no_gamma(rgb)
    assert gray[0, 0] == 1     # 1 + 0.5 -> 1
    assert gray[0, 1] == 255
    assert gray[0, 2] == 0     # 1/3 + 0.5 = 0.83 -> 0
    assert gray[0, 3] == 1     # 2/3 + 0.5 = 1.16 -> 1


def test_packbits_tiff_decode_matches_pil():
    """Native PackBits range decoder reproduces PIL's decode of the
    reference's packbits-compressed TIFF fixtures
    (ImageArrayUtils.readImageArrayRangeWithTiffReader analogue)."""
    from colormipsearch_tpu.native import (available,
                                           packbits_decode_range_native)
    if not available():
        pytest.skip("native lib unavailable")
    for name in ("compressed_pack1.tif", "compressed_pack2.tif"):
        path = FIXTURES / name
        with PILImage.open(path) as im:
            w, h = im.size
            want = np.array(im.convert("RGB"), dtype=np.uint8)
            offsets = im.tag_v2[273]        # StripOffsets
            counts = im.tag_v2[279]         # StripByteCounts
            rps = im.tag_v2.get(278, h)
            rows_per_strip = rps[0] if isinstance(rps, (tuple, list)) else rps
            raw = open(path, "rb").read()
        out = np.zeros(h * w * 3, dtype=np.uint8)
        pos = 0
        for off, cnt in zip(offsets, counts):
            strip = raw[off:off + cnt]
            decoded = packbits_decode_range_native(strip, h * w * 3 - pos)
            # count decoded length for this strip
            n = min(rows_per_strip * w * 3, h * w * 3 - pos)
            out[pos:pos + n] = decoded[:n]
            pos += n
        got = out.reshape(h, w, 3)
        np.testing.assert_array_equal(got, want)
