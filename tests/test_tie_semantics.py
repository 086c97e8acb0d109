"""Exact-rational vs Java-double tie semantics.

At exact rational ties (|r1 - r2| == zTol precisely) the reference's
IEEE-double comparison gives operand-dependent results; the framework's
normative predicate counts ties as matches deterministically. Both
oracle modes reproduce every reference golden (the golden tests run the
default mode; this file pins the divergence itself).
"""

import numpy as np

from colormipsearch_tpu.cds.oracle import (PixelMatchOracle,
                                           match_exact_rational)
from colormipsearch_tpu.imageproc.io import image_from_array
from colormipsearch_tpu.cds.pixel_kernel import PixelMatchEngine


def _pair_images(mask_px, target_px):
    q = np.zeros((8, 8, 3), dtype=np.uint8)
    t = np.zeros((8, 8, 3), dtype=np.uint8)
    q[4, 4] = mask_px
    t[4, 4] = target_px
    return image_from_array(q), image_from_array(t)


def test_exact_tie_pixel():
    # sector 1 (BR): mask (r=50, b=100) ratio .5, target (r=51, b=100)
    # ratio .51 -> |diff| == zTol == 0.01 exactly as rationals
    query, target = _pair_images((50, 0, 100), (51, 0, 100))

    rational = PixelMatchOracle(query, 20, False, 20, 0.01, 0)
    assert rational.score(target).matching_pixels == 1  # tie counts

    java = PixelMatchOracle(query, 20, False, 20, 0.01, 0,
                            java_double_semantics=True)
    # fl(0.51) - fl(0.5) rounds above fl(0.01) -> Java would reject
    assert java.score(target).matching_pixels == 0

    # the device kernel follows the rational semantics
    engine = PixelMatchEngine(query, 20, False, 20, 1.0, 0)
    s, _, _ = engine.score_batch(np.asarray(target.pixels)[None])
    assert s[0] == 1


def test_non_tie_pixels_agree():
    rng = np.random.default_rng(123)
    s = np.full(4096, 1, dtype=np.int64)
    a1 = rng.integers(0, 256, 4096)
    b1 = rng.integers(1, 256, 4096)
    a2 = rng.integers(0, 256, 4096)
    b2 = rng.integers(1, 256, 4096)
    ok = match_exact_rational(s, a1, b1, s, a2, b2, 10_000_000)
    # same-sector requires both numerators > 0
    assert not ok[(a1 == 0) | (a2 == 0)].any()
