"""Property test: int32-staged rational comparison == Python bignum."""

import numpy as np

from colormipsearch_tpu.cds.exact_ratio import ratio_leq_c9

rng = np.random.default_rng(42)


def test_ratio_leq_c9_exhaustive_boundaries():
    # constants used by the scorer
    for c9 in (10_000_000, 20_000_000, 1_000_000_000,
               2 * 354_862_745 + 10_000_000,
               2 * 996_078_431 + 10_000_000,
               2 * 505_882_353 + 10_000_000,
               2 * 996_078_431 + 1_000_000_000):
        u = rng.integers(0, 130051, size=20000).astype(np.int32)
        v = rng.integers(1, 65026, size=20000).astype(np.int32)
        got = ratio_leq_c9(np, u, v, c9)
        want = (u.astype(object) * 10 ** 9) <= (c9 * v.astype(object))
        assert (got == want.astype(bool)).all(), c9

        # adversarial near-boundary cases: u close to c9*v/1e9
        v2 = rng.integers(1, 65026, size=20000).astype(np.int64)
        u2 = (c9 * v2) // 10 ** 9 + rng.integers(-2, 3, size=20000)
        u2 = np.clip(u2, 0, 130050).astype(np.int32)
        v2 = v2.astype(np.int32)
        got = ratio_leq_c9(np, u2, v2, c9)
        want = (u2.astype(object) * 10 ** 9) <= (c9 * v2.astype(object))
        assert (got == want.astype(bool)).all(), c9


def test_exact_tie():
    # u/v == c9/1e9 exactly: c9=10^7 (zTol 0.01), u=1, v=100 -> 1e9 == 1e9
    assert ratio_leq_c9(np, np.array([1], np.int32), np.array([100], np.int32),
                        10_000_000)[0]
    assert not ratio_leq_c9(np, np.array([101], np.int32),
                            np.array([10000], np.int32), 10_000_000)[0]
    assert ratio_leq_c9(np, np.array([100], np.int32),
                        np.array([10000], np.int32), 10_000_000)[0]
