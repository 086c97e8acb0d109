"""Negative-query composition (score subtraction) vs the oracle."""

import numpy as np

from colormipsearch_tpu.cds.factory import create_pixel_match_engine
from colormipsearch_tpu.cds.oracle import PixelMatchOracle
from colormipsearch_tpu.imageproc.io import image_from_array


def test_neg_query_matches_oracle():
    rng = np.random.default_rng(21)
    h, w = 48, 160
    q = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    q[rng.random((h, w)) < 0.7] = 0
    nq = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    nq[rng.random((h, w)) < 0.8] = 0
    t = rng.integers(0, 256, size=(4, h, w, 3)).astype(np.uint8)
    t[rng.random((4, h, w)) < 0.5] = 0

    query, negq = image_from_array(q), image_from_array(nq)
    engine = create_pixel_match_engine(
        query, 20, True, 20, 2.0, 2, use_label_regions=False,
        engine="dense", neg_query=negq, neg_query_threshold=20,
        mirror_neg_query=True)
    oracle = PixelMatchOracle(query, 20, True, 20, 0.02, 2, None,
                              neg_query=negq, neg_query_threshold=20,
                              mirror_neg_query=True)
    pixels, ratios, mirrored = engine.score_batch(t)
    for i in range(4):
        expected = oracle.score(image_from_array(t[i]))
        assert int(pixels[i]) == expected.matching_pixels, i
        assert ratios[i] == np.float64(expected.matching_pixels_ratio)
