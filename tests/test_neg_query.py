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


def _java_neg_pass_scalar(q_img, nq_img, t_img, q_thr, nq_thr, t_thr,
                          z_tol, xy_shift, mirror):
    """Scalar transliteration of the reference's negative pass:
    srcPositions = POSITIVE query positions, srcImage = negQueryImage,
    targetPositions = shifted/mirrored NEGATIVE query positions, zip
    truncated to min(len) (PixelMatchColorDepthSearchAlgorithm.java:
    195-217 + calculateScore :238-263)."""
    from colormipsearch_tpu.cds.oracle import (_gap_from_sectors,
                                               sector_and_ratio,
                                               shift_ring_offsets)
    h, w = q_img.shape[:2]

    def positions(img, thr):
        r, g, b = (img[..., c].astype(np.int64) for c in range(3))
        sel = (r > thr) | (g > thr) | (b > thr)
        return np.nonzero(sel.reshape(-1))[0]

    qpos = positions(q_img, q_thr)
    npos = positions(nq_img, nq_thr)
    n = min(len(qpos), len(npos))
    best = 0
    for dx, dy in shift_ring_offsets(xy_shift):
        score = 0
        for i in range(n):
            x = int(npos[i]) % w + dx
            y = int(npos[i]) // w + dy
            if not (0 <= x < w and 0 <= y < h):
                continue
            if mirror:
                x = (w - 1) - x
            r2, g2, b2 = (int(t_img[y, x, c]) for c in range(3))
            if not (r2 > t_thr or g2 > t_thr or b2 > t_thr):
                continue
            sy, sx = divmod(int(qpos[i]), w)
            r1, g1, b1 = (int(nq_img[sy, sx, c]) for c in range(3))
            s1, q1 = sector_and_ratio(np.int64(r1), np.int64(g1),
                                      np.int64(b1))
            s2, q2 = sector_and_ratio(np.int64(r2), np.int64(g2),
                                      np.int64(b2))
            if _gap_from_sectors(np.asarray(s1), np.asarray(q1),
                                 np.asarray(s2), np.asarray(q2)) <= z_tol:
                score += 1
        best = max(best, score)
    return best


def test_java_neg_query_pairing_replay():
    """java_neg_query_pairing=True must replay the reference's pairing
    quirk exactly (scalar transliteration as ground truth)."""
    rng = np.random.default_rng(5)
    h, w = 24, 80
    q = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    q[rng.random((h, w)) < 0.7] = 0
    nq = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    nq[rng.random((h, w)) < 0.75] = 0
    targets = rng.integers(0, 256, size=(3, h, w, 3)).astype(np.uint8)
    targets[rng.random((3, h, w)) < 0.5] = 0

    query, negq = image_from_array(q), image_from_array(nq)
    oracle = PixelMatchOracle(query, 20, True, 20, 0.02, 2, None,
                              neg_query=negq, neg_query_threshold=20,
                              mirror_neg_query=True,
                              java_double_semantics=True,
                              java_neg_query_pairing=True)
    plain = PixelMatchOracle(query, 20, True, 20, 0.02, 2, None,
                             java_double_semantics=True)
    for i in range(3):
        t_img = image_from_array(targets[i])
        pos_score = plain.score(t_img).matching_pixels
        neg_best = max(
            _java_neg_pass_scalar(q, nq, targets[i], 20, 20, 20, 0.02, 2,
                                  mirror=m) for m in (False, True))
        n_neg = len(oracle._neg_q.xs)
        want = int(round(float(pos_score)
                         - float(neg_best) * plain.query_size / n_neg))
        got = oracle.score(t_img)
        assert got.matching_pixels == want, i
