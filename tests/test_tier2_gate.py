"""Tier-2 bin-compat tile gating fused into the multi-mask exact launch
(ROADMAP round-4 #1, VERDICT r3 #4): scores must stay bit-identical to
the ungated path — the gate only removes tiles whose windows contain NO
prescreen-compatible hue pairing for any chunk target (compat_matrix is
a proven superset of the exact gap predicate)."""

import numpy as np
import pytest

from colormipsearch_tpu.cds import multimask as mmx


@pytest.fixture(scope="module")
def library():
    rng = np.random.default_rng(23)
    h, w = 48, 160
    masks = []
    for _ in range(4):
        # hue-limited masks (red/blue, zero green): tier-2 has hue
        # structure to prune against the green-only targets below
        q = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        q[:, :, 1] = 0
        q[rng.random((h, w)) < 0.8] = 0
        masks.append(q)
    # half the targets share hue structure with the masks, half are
    # hue-disjoint (pure green-dominant where masks are red-dominant)
    targets = rng.integers(0, 256, size=(24, h, w, 3)).astype(np.uint8)
    targets[rng.random((24, h, w)) < 0.7] = 0
    for j in range(12, 24):
        t = np.zeros((h, w, 3), np.uint8)
        t[:, :, 1] = rng.integers(100, 256, size=(h, w)).astype(np.uint8)
        t[rng.random((h, w)) < 0.6] = 0
        targets[j] = t
    return masks, targets


def _engines(masks):
    from colormipsearch_tpu.cds.pixel_pallas import ActiveTilePixelEngine
    from colormipsearch_tpu.imageproc.io import image_from_array
    return [ActiveTilePixelEngine(image_from_array(q), 20, True, 20, 1.0,
                                  2, None, interpret=True) for q in masks]


def test_tier2_gated_scores_bit_identical(library, monkeypatch):
    from colormipsearch_tpu.cds.pixel_pallas import drain_deferred
    # force the live-tile table to engage regardless of pruning rate so
    # the gate itself (not the adaptive fallback) is what's tested
    monkeypatch.setattr(mmx, "_LIVETAB_KEEP", 2.0)
    monkeypatch.setattr(mmx, "_LIVETAB", True)
    masks, targets = library
    engines = _engines(masks)
    words = engines[0].pack_raw_words(targets)
    packed = engines[0].pad_from_words(words)
    row_ranges = mmx.signal_ranges_from_words(words)
    tile_live = mmx.tile_live_from_words(words)
    tier2 = mmx.bin_bits_from_words(words)
    surv = np.ones((len(engines), targets.shape[0]), np.int32)

    mm = mmx.MultiMaskScorer(engines, interpret=True)
    got = drain_deferred(mm.launch_deferred(
        packed, surv, row_ranges=row_ranges, tile_live=tile_live,
        tier2=tier2))
    want = drain_deferred([
        e.score_packed_deferred(packed, survivors=surv[i])
        for i, e in enumerate(engines)])
    for (gs, gr, gm), (ws, wr, wm) in zip(got, want):
        np.testing.assert_array_equal(gs, ws)
        np.testing.assert_array_equal(gm, wm)


def test_tier2_prunes_hue_disjoint_tiles(library, monkeypatch):
    """Hue-disjoint (tile, chunk) pairs must actually be pruned beyond
    signal presence: live-step totals with tier2 < with presence only."""
    monkeypatch.setattr(mmx, "_LIVETAB_KEEP", 2.0)
    masks, targets = library
    engines = _engines(masks[:2])
    words = engines[0].pack_raw_words(targets)
    tile_live = mmx.tile_live_from_words(words)
    tier2 = mmx.bin_bits_from_words(words)
    surv = np.ones((2, targets.shape[0]), np.int32)
    mm = mmx.MultiMaskScorer(engines, interpret=True)

    def total_steps(**kw):
        n_k = next(iter(mm.buckets))
        launches = mm._build_launches(n_k, surv, mm.buckets[n_k], None,
                                      **kw)
        return sum(int(la.kns[la.blk > 0].sum()) for la in launches)

    presence_only = total_steps(tile_live=tile_live)
    with_tier2 = total_steps(tile_live=tile_live, tier2=tier2)
    assert with_tier2 < presence_only


def test_tile_compat_bits_reflect_query_hues():
    """A pure-red query tile must expand to red-sector-compatible bins
    only — green-only target bins stay incompatible."""
    from colormipsearch_tpu.cds.pixel_pallas import ActiveTilePixelEngine
    from colormipsearch_tpu.cds.prescreen import NB
    from colormipsearch_tpu.imageproc.io import image_from_array
    q = np.zeros((16, 128, 3), np.uint8)
    q[:, :, 0] = 200  # pure red => sector RB (r max, b second, ratio 0)
    e = ActiveTilePixelEngine(image_from_array(q), 20, True, 20, 1.0, 2,
                              None, interpret=True)
    bits = mmx.tile_compat_bits(e)
    assert bits is not None and (bits != 0).any()
    # bins of sector GB (pure-green targets, sector id 3 => bins
    # [2*NB, 3*NB)) must NOT be compatible with a pure-red query
    for i in range(bits.shape[0]):
        for jt in range(2 * NB, 3 * NB):
            lane, bit = divmod(jt, 32)
            assert not (int(bits[i, lane]) >> bit) & 1


def test_tier2_enabled_gate(monkeypatch):
    assert mmx.tier2_enabled() in (True, False)
    monkeypatch.setattr(mmx, "_TIER2", False)
    assert not mmx.tier2_enabled()
