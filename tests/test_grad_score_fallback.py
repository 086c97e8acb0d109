"""CDMatchEntity.grad_score fallback semantics vs the reference
(CDMatchEntity.java:75-93): a valid bidirectionalAreaGap (the external
3D shape score) takes precedence over the 2D gradientAreaGap/
highExpressionArea pair; invalid/absent values fall through exactly as
in hasGradScore/has2DShapeScore."""

import numpy as np

from colormipsearch_tpu.model import CDMatchEntity
from colormipsearch_tpu.results.normalization import normalize_match_scores


def _m(pixels=None, bi=None, grad=None, high=None, mask_id=7):
    m = CDMatchEntity()
    m.matching_pixels = pixels
    m.bidirectional_area_gap = bi
    m.gradient_area_gap = grad
    m.high_expression_area = high

    class _Ref:
        entity_id = mask_id
    m.mask_image = _Ref()
    return m


def test_bidirectional_takes_precedence():
    # has3DBidirectionalShapeScore -> return bidirectionalAreaGap as-is,
    # even when the 2D pair is also present (CDMatchEntity.java:79-83)
    assert _m(bi=1234, grad=10, high=30).grad_score == 1234
    assert _m(bi=0, grad=10, high=30).grad_score == 0  # 0 is valid


def test_2d_shape_score_fallback():
    # no (valid) bidirectional -> gradientAreaGap + highExpressionArea/3
    assert _m(grad=10, high=30).grad_score == 10 + 30 // 3
    assert _m(bi=-1, grad=10, high=31).grad_score == 10 + 31 // 3
    assert _m(bi=None, grad=0, high=0).grad_score == 0


def test_no_grad_score_is_minus_one():
    assert _m().grad_score == -1
    assert _m(bi=-1).grad_score == -1
    assert _m(grad=10).grad_score == -1          # high missing
    assert _m(high=30).grad_score == -1          # grad missing
    assert _m(grad=-1, high=30).grad_score == -1
    assert _m(grad=10, high=-1).grad_score == -1
    assert not _m(bi=-1, grad=-1, high=5).has_grad_score
    assert _m(bi=5).has_grad_score


def test_normalization_uses_bidirectional_when_present():
    """The per-mask max(gradScore) and each match's shape score must use
    the bidirectional value when valid (NormalizeGradientScoresCmd picks
    up getGradScore transparently)."""
    a = _m(pixels=100, bi=600)               # 3D score
    b = _m(pixels=80, grad=100, high=300)    # 2D score = 200
    normalize_match_scores([a, b])
    from colormipsearch_tpu.cds.scores import calculate_normalized_score
    want_a = float(np.float32(calculate_normalized_score(100, 600, 100, 600)))
    want_b = float(np.float32(calculate_normalized_score(80, 200, 100, 600)))
    assert a.normalized_score == want_a
    assert b.normalized_score == want_b


def test_reset_clears_bidirectional():
    m = _m(pixels=5, bi=9, grad=1, high=2)
    m.normalized_score = 1.0
    m.reset_gradient_scores()
    assert m.bidirectional_area_gap is None
    assert m.gradient_area_gap is None
    assert m.high_expression_area is None
    assert m.normalized_score is None
    assert m.grad_score == -1
