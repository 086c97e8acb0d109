"""Golden-value conformance tests for the shape/gradient scorer oracle.

Values must match Shape2DMatchColorDepthSearchAlgorithmTest exactly
(Shape2DMatchColorDepthSearchAlgorithmTest.java:51-58, 86-132, 230-291).
"""

import pytest

from colormipsearch_tpu.imageproc import load_image, label_regions_mask
from colormipsearch_tpu.cds.shape_oracle import ShapeScoreOracle, build_query_shape_planes

LM_VT033614 = "VT033614_127B01_AE_01-20171124_64_H6-f-CH2_01"
LM_BJD = "BJD_127B01_AE_01-20171124_64_H6-40x-Brain-JRC2018_Unisex_20x_HR-2483089192251293794-CH2-01_CDM"
LM_VT016795 = "VT016795_115C08_AE_01-20200221_61_I2-m-CH1_01"

GOLDENS = [
    # (em, lm, zgap or None, gaps, highExpr, score, mirrored)
    ("12191_JRC2018U", LM_VT033614, None, 21365, 731, 21608, False),
    ("12191_JRC2018U", LM_BJD, None, 23359, 523, 23533, False),
    ("12191_JRC2018U", LM_BJD, LM_BJD, 33884, 523, 34058, False),
    ("12191_JRC2018U", LM_VT016795, None, 40696, 17253, 46447, True),
    ("12191_JRC2018U_FL", LM_VT033614, None, 65381, 677, 65606, False),
    ("12191_JRC2018U_FL", LM_VT016795, None, 104449, 16803, 110050, True),
]


def test_mask_statistics(fixtures_dir):
    """overExpressesMaskExpression (:32-60): query mask 17340 px,
    high-expression mask 70640 px for EM 12191_JRC2018U_FL."""
    query = load_image(fixtures_dir / "ems" / "12191_JRC2018U_FL.tif")
    excluded = label_regions_mask(query.height, query.width)
    planes = build_query_shape_planes(query, excluded)
    assert int(planes.q_mask.sum()) == 17340
    assert int(planes.high_expr.sum()) == 70640


@pytest.mark.parametrize("em,lm,zgap,gaps,high,score,mirrored", GOLDENS)
def test_shape_scores(fixtures_dir, em, lm, zgap, gaps, high, score, mirrored):
    query = load_image(fixtures_dir / "ems" / f"{em}.tif")
    target = load_image(fixtures_dir / "lms" / f"{lm}.tif")
    grad = load_image(fixtures_dir / "grad" / f"{lm}.png")
    zgap_img = load_image(fixtures_dir / "zgap" / f"{zgap}.tif") if zgap else None
    excluded = label_regions_mask(query.height, query.width)
    oracle = ShapeScoreOracle(query, query_threshold=20, mirror_query=True,
                              excluded=excluded)
    result = oracle.score(target, grad, zgap_img)
    assert result.gradient_area_gap == gaps
    assert result.high_expression_area == high
    assert result.score == score
    assert result.mirrored == mirrored


def test_mismatched_grad_quirk(fixtures_dir):
    """computeShapeScoreUsingDirectAlgorithmConstructor case 3 (:251-260):
    BJD target with VT033614's gradient image -> 23367/523/23541."""
    query = load_image(fixtures_dir / "ems" / "12191_JRC2018U.tif")
    target = load_image(fixtures_dir / "lms" / f"{LM_BJD}.tif")
    grad = load_image(fixtures_dir / "grad" / f"{LM_VT033614}.png")
    excluded = label_regions_mask(query.height, query.width)
    oracle = ShapeScoreOracle(query, 20, True, excluded)
    result = oracle.score(target, grad, None)
    assert result.gradient_area_gap == 23367
    assert result.high_expression_area == 523
    assert result.score == 23541
    assert not result.mirrored


def _reference_border_fold(planes, t, border):
    """Independent reference-semantics expectation: build the per-pixel
    gap image from UNCROPPED planes exactly as PIXEL_GAP_OP
    (Shape2DMatchColorDepthSearchAlgorithm.java:28-42), then fold over
    rows/cols [border, H-border) x [border, W-border) the way
    LImage.fold skips the border frame (LImage.java:89-97). The
    high-expression fold stays full-frame (combine2's first operand is
    the border-less target, :226-239)."""
    import numpy as np
    from colormipsearch_tpu.cds.lut import slice_gap
    both = planes.q_nonzero & t.z_nonzero
    sg = slice_gap(planes.q_slice, t.z_slice)
    default = planes.q_mask * t.grad
    gap = np.where(both & (sg - 40 >= 40), sg - 40, default)
    gap = np.where(gap > 3, gap, 0).astype(np.int64)
    h, w = gap.shape
    gaps = int(gap[border:h - border, border:w - border].sum())
    high = int((planes.high_expr.astype(bool) & t.t_above).sum())
    return gaps, high


def test_border_fold_parity(fixtures_dir):
    """--border crops the gradient-gap fold only
    (AbstractColorDepthMatchArgs.java:24-25 -> queryBorderSize ->
    LImage border folds). The oracle's zeroed-query-frame form must
    equal an independent border-cropped fold over uncropped planes."""
    import numpy as np
    from colormipsearch_tpu.cds.shape_oracle import (
        build_target_shape_planes, ShapeScoreOracle)
    query = load_image(fixtures_dir / "ems" / "12191_JRC2018U_FL.tif")
    target = load_image(fixtures_dir / "lms" / f"{LM_VT033614}.tif")
    grad = load_image(fixtures_dir / "grad" / f"{LM_VT033614}.png")
    excluded = label_regions_mask(query.height, query.width)
    uncropped = build_query_shape_planes(query, excluded)
    t = build_target_shape_planes(target, grad, None, 20, excluded)
    for border in (10, 60, 200):
        exp_gaps, exp_high = _reference_border_fold(uncropped, t, border)
        oracle = ShapeScoreOracle(query, 20, mirror_query=False,
                                  excluded=excluded, border=border)
        got = oracle.score(target, grad, None)
        assert got.gradient_area_gap == exp_gaps, border
        assert got.high_expression_area == exp_high, border
    # a big border must actually change the gap sum on this pair
    # (otherwise the test proves nothing)
    b0 = ShapeScoreOracle(query, 20, False, excluded).score(
        target, grad, None)
    b200 = ShapeScoreOracle(query, 20, False, excluded,
                            border=200).score(target, grad, None)
    assert b200.gradient_area_gap < b0.gradient_area_gap
    assert b200.high_expression_area == b0.high_expression_area


def test_border_zero_is_default(fixtures_dir):
    """border=0 keeps every golden bit-exact."""
    query = load_image(fixtures_dir / "ems" / "12191_JRC2018U.tif")
    target = load_image(fixtures_dir / "lms" / f"{LM_VT033614}.tif")
    grad = load_image(fixtures_dir / "grad" / f"{LM_VT033614}.png")
    excluded = label_regions_mask(query.height, query.width)
    r = ShapeScoreOracle(query, 20, True, excluded, border=0).score(
        target, grad, None)
    assert (r.gradient_area_gap, r.high_expression_area) == (21365, 731)


def test_border_mirrored_flip_equivalence(fixtures_dir):
    """The mirror pass under a border: the zeroed frame is x-symmetric
    so the flip-equivalence proof still holds; check the mirrored gap
    against an explicit mirrored-planes fold."""
    import numpy as np
    from colormipsearch_tpu.cds.shape_oracle import (
        build_mirrored_query_shape_planes, build_target_shape_planes,
        ShapeScoreOracle)
    border = 60
    query = load_image(fixtures_dir / "ems" / "12191_JRC2018U.tif")
    target = load_image(fixtures_dir / "lms" / f"{LM_VT016795}.tif")
    grad = load_image(fixtures_dir / "grad" / f"{LM_VT016795}.png")
    excluded = label_regions_mask(query.height, query.width)
    t = build_target_shape_planes(target, grad, None, 20, excluded)
    # explicit mirrored planes (uncropped) + border-cropped fold against
    # flipped z planes — the reference's mirrored orientation
    qm_uncropped = build_mirrored_query_shape_planes(query, excluded, None)
    import dataclasses
    tm = dataclasses.replace(
        t, z_nonzero=np.ascontiguousarray(t.z_nonzero[:, ::-1]),
        z_slice=np.ascontiguousarray(t.z_slice[:, ::-1]))
    exp_m_gaps, _ = _reference_border_fold(qm_uncropped, tm, border)
    oracle = ShapeScoreOracle(query, 20, mirror_query=True,
                              excluded=excluded, border=border)
    got = oracle.score(target, grad, None)
    assert got.mirrored
    assert got.gradient_area_gap == exp_m_gaps


def test_gradient_area_gap_utils_goldens():
    """GradientAreaGapUtilsTest.scoreCalculator mirrored exactly
    (cds/GradientAreaGapUtilsTest.java:10-50): shape score + normalized
    score quadruples, incl. the reference's own 'lower absolute scores
    higher ranking' quirk cases."""
    from colormipsearch_tpu.cds.scores import (calculate_2d_shape_score,
                                               calculate_normalized_score)
    cases = [
        # (pix, gap, highExpr, maxPix, maxNeg, shapeScore, normalized)
        (636, 156, 1897, 679, 1114361, 788, 46833.58),
        (636, 233, 1644, 679, 1107088, 781, 46833.58),
        (636, 0, 1644, 679, 1114361, 548, 46833.58),
        (795, 123, 93, 875, 1606182, 154, 45428.57),
    ]
    for pix, gap, he, max_pix, max_neg, exp_shape, exp_norm in cases:
        s = calculate_2d_shape_score(gap, he)
        assert s == exp_shape
        n = calculate_normalized_score(pix, s, max_pix, max_neg)
        assert abs(n - exp_norm) < 0.1
