"""Active-tile Pallas kernel parity (interpret mode on CPU)."""

import numpy as np
import pytest

from colormipsearch_tpu.imageproc import load_image, label_regions_mask
from colormipsearch_tpu.imageproc.io import image_from_array
from colormipsearch_tpu.cds.pixel_pallas import ActiveTilePixelEngine
from colormipsearch_tpu.cds.pixel_kernel import PixelMatchEngine


def test_pallas_goldens(fixtures_dir):
    query = load_image(fixtures_dir / "ems" / "12191_JRC2018U.tif")
    excluded = label_regions_mask(query.height, query.width)
    engine = ActiveTilePixelEngine(query, 20, True, 20, 1.0, 2, excluded,
                                   interpret=True)
    assert engine.tiles.n_active > 0
    lms = ["VT033614_127B01_AE_01-20171124_64_H6-f-CH2_01.tif",
           "BJD_127B01_AE_01-20171124_64_H6-40x-Brain-JRC2018_Unisex_20x_HR-2483089192251293794-CH2-01_CDM.tif",
           "VT016795_115C08_AE_01-20200221_61_I2-m-CH1_01.tif"]
    targets = np.stack([load_image(fixtures_dir / "lms" / n).pixels
                        for n in lms])
    scores, ratios, mirrored = engine.score_batch(targets)
    assert list(scores) == [439, 414, 426]
    assert list(mirrored) == [False, False, True]


def test_pallas_matches_dense_random():
    rng = np.random.default_rng(3)
    h, w = 40, 200  # force multiple tiles + ragged edges
    q = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    q[rng.random((h, w)) < 0.8] = 0
    t = rng.integers(0, 256, size=(5, h, w, 3)).astype(np.uint8)
    t[rng.random((5, h, w)) < 0.5] = 0
    query = image_from_array(q)
    pallas = ActiveTilePixelEngine(query, 20, True, 20, 2.0, 2, None,
                                   interpret=True)
    dense = PixelMatchEngine(query, 20, True, 20, 2.0, 2, None)
    ps, pr, pm = pallas.score_batch(t)
    ds, dr, dm = dense.score_batch(t)
    np.testing.assert_array_equal(ps, ds)
    np.testing.assert_array_equal(pm, dm)


def test_ratio_engine_matches_goldens(fixtures_dir, monkeypatch):
    """Ratio-predicate kernel path (CMS_RATIO_PRED) == goldens +
    default engine, including the survivor-compaction path."""
    import colormipsearch_tpu.cds.pixel_pallas as pp
    monkeypatch.setattr(pp, "_RATIO_PRED", True)
    query = load_image(fixtures_dir / "ems" / "12191_JRC2018U.tif")
    excluded = label_regions_mask(query.height, query.width)
    engine = ActiveTilePixelEngine(query, 20, True, 20, 1.0, 2, excluded,
                                   interpret=True)
    assert engine.ratio and engine.tiles.q_cmp is not None
    lms = ["VT033614_127B01_AE_01-20171124_64_H6-f-CH2_01.tif",
           "BJD_127B01_AE_01-20171124_64_H6-40x-Brain-JRC2018_Unisex_20x_HR-2483089192251293794-CH2-01_CDM.tif",
           "VT016795_115C08_AE_01-20200221_61_I2-m-CH1_01.tif"]
    targets = np.stack([load_image(fixtures_dir / "lms" / n).pixels
                        for n in lms])
    scores, ratios, mirrored = engine.score_batch(targets)
    assert list(scores) == [439, 414, 426]
    assert list(mirrored) == [False, False, True]


def test_ratio_engine_matches_default_random(monkeypatch):
    """Ratio kernel == default kernel on dense random data, both full
    and compacted-survivor launches."""
    import colormipsearch_tpu.cds.pixel_pallas as pp
    rng = np.random.default_rng(7)
    h, w = 40, 200
    q = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    q[rng.random((h, w)) < 0.8] = 0
    t = rng.integers(0, 256, size=(8, h, w, 3)).astype(np.uint8)
    t[rng.random((8, h, w)) < 0.5] = 0
    query = image_from_array(q)
    base = ActiveTilePixelEngine(query, 20, True, 20, 2.0, 2, None,
                                 interpret=True)
    monkeypatch.setattr(pp, "_RATIO_PRED", True)
    ratio = ActiveTilePixelEngine(query, 20, True, 20, 2.0, 2, None,
                                  interpret=True)
    packed_b = base.prepare_targets(t)
    packed_r = ratio.prepare_targets(t)
    bs, br_, bm = base.score_packed(packed_b)
    rs, rr_, rm = ratio.score_packed(packed_r)
    np.testing.assert_array_equal(rs, bs)
    np.testing.assert_array_equal(rm, bm)
    # compaction path (2 survivors of 8, chunk forced small)
    monkeypatch.setattr(ActiveTilePixelEngine, "COMPACT_CHUNK", 2)
    surv = np.array([0, 1, 0, 0, 0, 0, 1, 0], np.int32)
    bs2 = base.score_packed(packed_b, surv)[0]
    rs2 = ratio.score_packed(packed_r, surv)[0]
    np.testing.assert_array_equal(rs2, bs2)
    np.testing.assert_array_equal(bs2, np.where(surv, bs, 0))


def test_fast_predicate_equals_general():
    """Packed-constant predicate == general staged predicate on random
    word pairs, for every production zt9 and at the packing gate edge."""
    import jax.numpy as jnp
    from colormipsearch_tpu.cds.pixel_pallas import (
        _match_unpacked, _match_unpacked_fast, _unpack, _PACK_ZT9_MAX)
    from colormipsearch_tpu.cds.pixel_kernel import z_tolerance_to_zt9

    rng = np.random.default_rng(3)
    n = 20000
    def words():
        b = rng.integers(0, 256, n)
        a = rng.integers(0, 256, n)
        s = rng.integers(0, 7, n)
        sel = rng.integers(0, 2, n)
        cl = rng.integers(0, 2, n)
        cu = rng.integers(0, 2, n)
        return jnp.asarray((b | (a << 8) | (s << 16) | (sel << 19)
                            | (cl << 20) | (cu << 21)).astype(np.int32))
    w1, w2 = words(), words()
    q, t = _unpack(w1), _unpack(w2)
    for zt9 in (0, z_tolerance_to_zt9(1.0), z_tolerance_to_zt9(2.0),
                _PACK_ZT9_MAX):
        got = np.asarray(_match_unpacked_fast(q, t, zt9))
        want = np.asarray(_match_unpacked(q, t, zt9))
        np.testing.assert_array_equal(got, want), zt9


def test_gate_fallback_general_predicate(fixtures_dir):
    """pixColorFluctuation above the packing gate (zt9 > 54e6) must use
    the general two-chain predicate; dense kernel == f64 oracle."""
    import jax.numpy as jnp
    from colormipsearch_tpu.imageproc import load_image, label_regions_mask
    from colormipsearch_tpu.cds.oracle import (PixelMatchOracle,
                                               shift_ring_offsets)
    from colormipsearch_tpu.cds.pixel_kernel import (
        prepare_query_planes, pack_targets, pixel_match_packed,
        z_tolerance_to_zt9)
    from colormipsearch_tpu.cds.pixel_pallas import _PACK_ZT9_MAX

    fluct = 10.0
    zt9 = z_tolerance_to_zt9(fluct)
    assert zt9 > _PACK_ZT9_MAX  # exercises the fallback

    query = load_image(fixtures_dir / "ems" / "12191_JRC2018U.tif")
    excluded = label_regions_mask(query.height, query.width)
    target = load_image(
        fixtures_dir / "lms" /
        "VT033614_127B01_AE_01-20171124_64_H6-f-CH2_01.tif")

    oracle = PixelMatchOracle(query, 20, True, 20, fluct / 100.0, 2,
                              excluded)
    want = oracle.score(target)

    qp = prepare_query_planes(query, 20, excluded)
    tp, tf = pack_targets(jnp.asarray(target.pixels[None]), 20, 2)
    shifts = jnp.asarray(np.asarray(shift_ring_offsets(2), dtype=np.int32))
    s, m = pixel_match_packed(jnp.asarray(qp.words[None]), tp, tf, shifts,
                              zt9=zt9, mirror=True)
    assert int(np.asarray(s)[0, 0]) == want.matching_pixels
