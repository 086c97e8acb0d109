"""Ratio-interval predicate equivalence: the f32 threshold tables +
boolean kernel form must decide EXACTLY like the staged-rational
predicate for every word pair, robustly to device division error.

The device computes r2f = fl(a2 * rcp(b2)) (error <= ~4e-7); the
placement guarantees every threshold sits >= ~7.6e-6 from every
achievable a2/b2, so decisions are invariant under +-1e-6 relative
perturbation of r2f — asserted here explicitly.

Reference semantics: cds/pixel_pallas._match_unpacked (itself pinned to
AbstractColorDepthSearchAlgorithm.java:157-390 by the oracle goldens).
"""

import numpy as np
import pytest

from colormipsearch_tpu.cds.pixel_pallas import _match_unpacked, _unpack
from colormipsearch_tpu.cds.ratio_bounds import query_ratio_planes


def _make_words(rng, n):
    """Packed words covering the edge lattice + random interior."""
    edge_ab = [(0, 1), (1, 1), (0, 255), (1, 255), (254, 255), (255, 255),
               (1, 2), (127, 255), (128, 255), (51, 100), (102, 200),
               (11, 25), (27, 50), (7, 10), (4, 5), (255, 1)]
    words = []
    for s in range(0, 7):
        for sel in (0, 1):
            for cl in (0, 1):
                for cu in (0, 1):
                    for a, b in edge_ab:
                        words.append(b | (a << 8) | (s << 16) | (sel << 19)
                                     | (cl << 20) | (cu << 21))
    a = rng.integers(0, 256, n)
    b = rng.integers(1, 256, n)
    s = rng.integers(0, 7, n)
    fl = rng.integers(0, 8, n)
    words.extend((b | (a << 8) | (s << 16) | (fl << 19)).tolist())
    words.append(1)  # canonical empty word
    return np.array(words, dtype=np.int32)


def _ratio_predicate(q_cmp, q_f32, tw, rf):
    """The kernel's boolean form, in numpy (q_* broadcast [Nq, 1],
    target fields [1, Nt])."""
    f = tw >> 16
    scv = q_cmp & 31
    ucv = (q_cmp >> 5) & 31
    dcv = (q_cmp >> 10) & 63
    gup = ((q_cmp >> 16) & 1) > 0
    gdn = ((q_cmp >> 17) & 1) > 0
    lf, uf, cup, cdn = q_f32
    same_ok = ((f & 15) == scv) & (rf >= lf) & (rf <= uf)
    up_ok = ((f & 31) == ucv) & ((rf <= cup) ^ gup)
    dn_ok = ((f & 47) == dcv) & ((rf <= cdn) ^ gdn)
    return same_ok | up_ok | dn_ok


@pytest.mark.parametrize("zt9", [0, 10_000_000, 20_000_000, 7_654_321,
                                 54_000_000, 100_000_000])
def test_ratio_predicate_equivalence(zt9):
    rng = np.random.default_rng(42 + zt9 % 97)
    qw = _make_words(rng, 400)
    tw = _make_words(rng, 400)

    expected = np.asarray(_match_unpacked(
        _unpack(qw[:, None]), _unpack(tw[None, :]), zt9))

    q_cmp, q_f32 = query_ratio_planes(qw, zt9)
    q_cmp = q_cmp[:, None]
    q_f32 = [p.astype(np.float32)[:, None] for p in q_f32]

    a2 = (tw >> 8) & 0xFF
    b2 = tw & 0xFF
    rf_exact = (a2.astype(np.float64) / np.maximum(b2, 1)).astype(np.float32)
    for scale in (1.0, 1.0 + 1e-6, 1.0 - 1e-6):
        rf = (rf_exact * np.float32(scale)).astype(np.float32)
        rf = np.where(a2 == 0, np.float32(-1.0), rf)[None, :]
        got = _ratio_predicate(q_cmp, q_f32, tw[None, :], rf)
        mism = got != expected
        assert not mism.any(), (
            f"zt9={zt9} scale={scale}: {mism.sum()} mismatches, first at "
            f"q={qw[np.argwhere(mism)[0][0]]:#x} "
            f"t={tw[np.argwhere(mism)[0][1]]:#x}")
