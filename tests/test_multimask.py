"""Multi-mask single-launch exact sweep (ROADMAP lever 2) must score
bit-identically to the per-mask deferred path — same kernel predicate,
different work layout. Reference counterpart: the per-(mask, partition)
task loop it replaces, LocalColorMIPSearchProcessor.java:82-112."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def library():
    rng = np.random.default_rng(17)
    h, w = 48, 160
    masks = []
    for _ in range(5):
        q = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        q[rng.random((h, w)) < 0.8] = 0
        masks.append(q)
    targets = rng.integers(0, 256, size=(29, h, w, 3)).astype(np.uint8)
    targets[rng.random((29, h, w)) < 0.7] = 0
    return masks, targets


def _engines(masks, mirror=True):
    from colormipsearch_tpu.cds.pixel_pallas import ActiveTilePixelEngine
    from colormipsearch_tpu.imageproc.io import image_from_array
    return [ActiveTilePixelEngine(image_from_array(q), 20, mirror, 20, 1.0,
                                  2, None, interpret=True) for q in masks]


def _survivor_matrix(engines, targets, dense=False):
    rng = np.random.default_rng(3)
    b, t = len(engines), targets.shape[0]
    if dense:
        return np.ones((b, t), np.int32)
    surv = (rng.random((b, t)) < 0.4).astype(np.int32)
    surv[0] = 0          # a mask with zero survivors
    surv[1] = 1          # a mask with all survivors
    surv[2, :] = 0
    surv[2, t - 1] = 1   # a single survivor at the last target
    return surv


@pytest.mark.parametrize("dense", [False, True])
def test_multimask_matches_per_mask_path(library, dense):
    from colormipsearch_tpu.cds.multimask import MultiMaskScorer
    from colormipsearch_tpu.cds.pixel_pallas import drain_deferred

    masks, targets = library
    engines = _engines(masks)
    packed = engines[0].prepare_targets(targets)
    surv = _survivor_matrix(engines, targets, dense)

    mm = MultiMaskScorer(engines, interpret=True)
    got = drain_deferred(mm.launch_deferred(packed, surv))
    want = drain_deferred([
        e.score_packed_deferred(packed, survivors=surv[i])
        for i, e in enumerate(engines)])
    for (gs, gr, gm), (ws, wr, wm) in zip(got, want):
        np.testing.assert_array_equal(gs, ws)
        np.testing.assert_array_equal(gm, wm)
        np.testing.assert_allclose(gr, wr)


def test_multimask_small_rows_bucket(library):
    """Tail launches round rows up to a pow2 bucket; a single-survivor
    sweep must still score exactly."""
    from colormipsearch_tpu.cds.multimask import MultiMaskScorer
    from colormipsearch_tpu.cds.pixel_pallas import drain_deferred

    masks, targets = library
    engines = _engines(masks[:2])
    packed = engines[0].prepare_targets(targets)
    surv = np.zeros((2, targets.shape[0]), np.int32)
    surv[0, 5] = 1
    surv[1, 0] = 1
    surv[1, 28] = 1

    mm = MultiMaskScorer(engines, interpret=True)
    got = drain_deferred(mm.launch_deferred(packed, surv))
    want = drain_deferred([
        e.score_packed_deferred(packed, survivors=surv[i])
        for i, e in enumerate(engines)])
    for (gs, _, gm), (ws, _, wm) in zip(got, want):
        np.testing.assert_array_equal(gs, ws)
        np.testing.assert_array_equal(gm, wm)


def test_multimask_mixed_k_buckets(library):
    """Engines whose tile counts land in different K buckets (128 vs
    768) must be grouped into separate launches and still score exactly
    (one stacked q-tile array per bucket)."""
    import numpy as np
    from colormipsearch_tpu.cds.multimask import MultiMaskScorer
    from colormipsearch_tpu.cds.pixel_pallas import drain_deferred

    masks, targets = library
    engines = _engines(masks[:3])
    # force engine 1 into the K=768 bucket by re-padding its tile stack
    # (small fixtures never exceed 128 naturally; the bucket split is
    # a pure layout property, so padded tiles must not change scores)
    e = engines[1]
    t = e.tiles
    k0 = t.q_tiles.shape[0]
    q_tiles = np.zeros((768, t.q_tiles.shape[1], t.q_tiles.shape[2]),
                       t.q_tiles.dtype)
    q_tiles[:k0] = t.q_tiles
    coords = np.zeros((768, 3), t.coords.dtype)
    coords[:k0] = t.coords
    coords[:, 2] = max(t.n_active, 1)
    t.q_tiles, t.coords = q_tiles, coords
    if t.q_cmp is not None:  # ratio-predicate planes pad alongside
        q_cmp = np.zeros((768,) + t.q_cmp.shape[1:], t.q_cmp.dtype)
        q_cmp[:k0] = t.q_cmp
        q_f32 = np.zeros((768,) + t.q_f32.shape[1:], t.q_f32.dtype)
        q_f32[:k0] = t.q_f32
        t.q_cmp, t.q_f32 = q_cmp, q_f32
    e._dev_query = {}

    packed = engines[0].prepare_targets(targets)
    surv = _survivor_matrix(engines, targets)
    mm = MultiMaskScorer(engines, interpret=True)
    assert set(mm.buckets) == {128, 768}
    got = drain_deferred(mm.launch_deferred(packed, surv))
    want = drain_deferred([
        e.score_packed_deferred(packed, survivors=surv[i])
        for i, e in enumerate(engines)])
    for (gs, _, gm), (ws, _, wm) in zip(got, want):
        np.testing.assert_array_equal(gs, ws)
        np.testing.assert_array_equal(gm, wm)


def test_multimask_g_bucket_rollover(library, monkeypatch):
    """More distinct masks than one launch's G_BUCKET forces multiple
    launches; scores must be unchanged."""
    import colormipsearch_tpu.cds.multimask as mmod
    from colormipsearch_tpu.cds.pixel_pallas import drain_deferred

    masks, targets = library
    engines = _engines(masks)
    packed = engines[0].prepare_targets(targets)
    surv = _survivor_matrix(engines, targets)

    monkeypatch.setattr(mmod, "_g_bucket", lambda n_k: 2)
    mm = mmod.MultiMaskScorer(engines, interpret=True)
    got = drain_deferred(mm.launch_deferred(packed, surv))
    want = drain_deferred([
        e.score_packed_deferred(packed, survivors=surv[i])
        for i, e in enumerate(engines)])
    for (gs, _, gm), (ws, _, wm) in zip(got, want):
        np.testing.assert_array_equal(gs, ws)
        np.testing.assert_array_equal(gm, wm)


def test_multimask_row_range_restriction(library):
    """Per-chunk tile row-range restriction (r3): scores must be
    bit-identical with and without row_ranges, on a spatially-banded
    library where ranges actually drop most tiles."""
    from colormipsearch_tpu.cds.multimask import (MultiMaskScorer,
                                                  row_ranges_from_words)
    from colormipsearch_tpu.cds.pixel_pallas import drain_deferred

    masks, targets = library
    # band the targets: each keeps one 12-row stripe of signal
    banded = np.zeros_like(targets)
    h = targets.shape[1]
    for i in range(targets.shape[0]):
        b0 = (7 * i) % (h - 12)
        banded[i, b0:b0 + 12] = targets[i, b0:b0 + 12]

    engines = _engines(masks)
    words = engines[0].pack_raw_words(banded)
    packed = engines[0].pad_from_words(words)
    rr = row_ranges_from_words(words)
    # sanity: ranges are the stripes (within threshold effects)
    assert (rr[:, 1] - rr[:, 0] <= 12).all()
    surv = _survivor_matrix(engines, banded)

    mm = MultiMaskScorer(engines, interpret=True)
    got = drain_deferred(mm.launch_deferred(packed, surv, row_ranges=rr))
    want = drain_deferred(mm.launch_deferred(packed, surv))
    for (gs, gr, gm), (ws, wr, wm) in zip(got, want):
        np.testing.assert_array_equal(gs, ws)
        np.testing.assert_array_equal(gm, wm)
    # and vs the per-mask reference path
    want2 = drain_deferred([
        e.score_packed_deferred(packed, survivors=surv[i])
        for i, e in enumerate(engines)])
    for (gs, _, gm), (ws, _, wm) in zip(got, want2):
        np.testing.assert_array_equal(gs, ws)
        np.testing.assert_array_equal(gm, wm)


@pytest.mark.parametrize("mirror", [True, False])
@pytest.mark.parametrize("mode", ["rows", "cols", "bitmap"])
def test_multimask_livetab_matches_hull(library, monkeypatch, mirror, mode):
    """Per-chunk live-tile table (CMS_MM_LIVETAB): the non-contiguous
    exact live sets — union of per-target row intervals ("rows"), row x
    column intervals with the mirrored reflection ("cols"), or the
    3x3-dilated tile-presence bitmaps ("bitmap") — must score
    bit-identically to the contiguous hull restriction, the
    unrestricted launch, and the per-mask reference path."""
    import colormipsearch_tpu.cds.multimask as mmod
    from colormipsearch_tpu.cds.multimask import (MultiMaskScorer,
                                                  row_ranges_from_words,
                                                  signal_ranges_from_words,
                                                  tile_live_from_words)
    from colormipsearch_tpu.cds.pixel_pallas import drain_deferred

    masks, targets = library
    # stripes at scattered rows AND columns (incl. the frame edges) so
    # chunk unions are non-contiguous and boundary formulas are hit
    banded = np.zeros_like(targets)
    h, w = targets.shape[1:3]
    for i in range(targets.shape[0]):
        b0 = (13 * i) % (h - 10)
        c0 = (41 * i) % (w - 24) if i % 4 else (0 if i % 8 else w - 24)
        banded[i, b0:b0 + 10, c0:c0 + 24] = targets[i, b0:b0 + 10,
                                                    c0:c0 + 24]

    engines = _engines(masks, mirror=mirror)
    words = engines[0].pack_raw_words(banded)
    packed = engines[0].pad_from_words(words)
    rr = signal_ranges_from_words(words) if mode == "cols" \
        else row_ranges_from_words(words)
    tl = tile_live_from_words(words) if mode == "bitmap" else None
    surv = _survivor_matrix(engines, banded)

    mm = MultiMaskScorer(engines, interpret=True)
    want_hull = drain_deferred(mm.launch_deferred(packed, surv,
                                                  row_ranges=rr))
    monkeypatch.setattr(mmod, "_LIVETAB", True)
    monkeypatch.setattr(mmod, "_LIVETAB_KEEP", 2.0)  # always use the table
    got = drain_deferred(mm.launch_deferred(packed, surv, row_ranges=rr,
                                            tile_live=tl))
    # the table must actually have been used
    la = mm._build_launches(next(iter(mm.buckets)), surv.astype(np.int32),
                            mm.buckets[next(iter(mm.buckets))],
                            row_ranges=rr, tile_live=tl)[0]
    assert la.ltab is not None
    for (gs, gr, gm), (ws, wr, wm) in zip(got, want_hull):
        np.testing.assert_array_equal(gs, ws)
        np.testing.assert_array_equal(gm, wm)
    want2 = drain_deferred([
        e.score_packed_deferred(packed, survivors=surv[i])
        for i, e in enumerate(engines)])
    for (gs, _, gm), (ws, _, wm) in zip(got, want2):
        np.testing.assert_array_equal(gs, ws)
        np.testing.assert_array_equal(gm, wm)


def test_multimask_ratio_matches_default(library, monkeypatch):
    """Ratio-predicate multimask launch (CMS_RATIO_PRED) must score
    bit-identically to the default-predicate multimask AND per-mask
    paths, over a sparse survivor matrix."""
    import colormipsearch_tpu.cds.pixel_pallas as pp
    from colormipsearch_tpu.cds.multimask import MultiMaskScorer
    from colormipsearch_tpu.cds.pixel_pallas import drain_deferred

    masks, targets = library
    base = _engines(masks)
    packed = base[0].prepare_targets(targets)
    surv = _survivor_matrix(base, targets)
    want = drain_deferred(
        MultiMaskScorer(base, interpret=True).launch_deferred(packed, surv))

    monkeypatch.setattr(pp, "_RATIO_PRED", True)
    engines = _engines(masks)
    mm = MultiMaskScorer(engines, interpret=True)
    assert mm.ratio
    got = drain_deferred(mm.launch_deferred(packed, surv))
    for (gs, gr, gm), (ws, wr, wm) in zip(got, want):
        np.testing.assert_array_equal(gs, ws)
        np.testing.assert_array_equal(gm, wm)
        np.testing.assert_allclose(gr, wr)


def test_multimask_acc2d_matches_default(library, monkeypatch):
    """Deferred-sublane-reduction accumulator (CMS_ACC2D) must be
    bit-identical, in both predicate modes."""
    import colormipsearch_tpu.cds.multimask as mmod
    import colormipsearch_tpu.cds.pixel_pallas as pp
    from colormipsearch_tpu.cds.pixel_pallas import drain_deferred

    masks, targets = library
    for ratio in (False, True):
        monkeypatch.setattr(pp, "_RATIO_PRED", ratio)
        engines = _engines(masks[:3])
        packed = engines[0].prepare_targets(targets)
        surv = _survivor_matrix(engines, targets)[:3]
        monkeypatch.setattr(mmod, "_ACC2D", False)
        want = drain_deferred(mmod.MultiMaskScorer(engines, interpret=True)
                              .launch_deferred(packed, surv))
        monkeypatch.setattr(mmod, "_ACC2D", True)
        got = drain_deferred(mmod.MultiMaskScorer(engines, interpret=True)
                             .launch_deferred(packed, surv))
        for (gs, _, gm), (ws, _, wm) in zip(got, want):
            np.testing.assert_array_equal(gs, ws)
            np.testing.assert_array_equal(gm, wm)


def test_row_ranges_from_words(library):
    from colormipsearch_tpu.cds.multimask import row_ranges_from_words
    masks, targets = library
    engines = _engines(masks[:1])
    t = np.zeros_like(targets[:3])
    t[0, 10:14] = 200   # rows 10..13
    t[2, 47] = 200      # last row only
    words = engines[0].pack_raw_words(t)
    rr = row_ranges_from_words(words)
    assert list(rr[0]) == [10, 13]
    assert list(rr[1]) == [0, -1]   # empty
    assert list(rr[2]) == [47, 47]


def test_multimask_acc16_bit_identical(library):
    """int16 accumulator lanes (CMS_ACC16) must not change scores:
    per-chunk counts are bounded by the tile count << 2^15."""
    import colormipsearch_tpu.cds.multimask as mmod
    from colormipsearch_tpu.cds.multimask import MultiMaskScorer
    from colormipsearch_tpu.cds.pixel_pallas import drain_deferred

    masks, targets = library
    engines = _engines(masks[:3])
    packed = engines[0].prepare_targets(targets)
    surv = _survivor_matrix(engines, targets)[:3]
    mm = MultiMaskScorer(engines, interpret=True)
    old = mmod._ACC16
    try:
        mmod._ACC16 = False
        want = drain_deferred(mm.launch_deferred(packed, surv))
        mmod._ACC16 = True
        got = drain_deferred(mm.launch_deferred(packed, surv))
    finally:
        mmod._ACC16 = old
    for (gs, _, gm), (ws, _, wm) in zip(got, want):
        np.testing.assert_array_equal(gs, ws)
        np.testing.assert_array_equal(gm, wm)
