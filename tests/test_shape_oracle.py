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
