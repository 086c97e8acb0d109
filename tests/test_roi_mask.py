"""ROI mask semantics in the shape scorer.

No reference golden exists for ROI masks (the reference's own tests pass
roiMaskImageArray=null), so these tests pin self-consistency: a full
ROI equals no ROI, a partial ROI only removes score mass, and the
mirrored orientation uses the UN-mirrored ROI (the reference applies
maskTransformation to the query images only,
Shape2DMatchColorDepthSearchAlgorithm.java:201-218).
"""

import numpy as np

from colormipsearch_tpu.imageproc import load_image, label_regions_mask
from colormipsearch_tpu.imageproc.io import Image, ImageKind
from colormipsearch_tpu.cds.shape_oracle import ShapeScoreOracle

LM = "VT016795_115C08_AE_01-20200221_61_I2-m-CH1_01"  # mirrored golden pair


def _roi(h, w, fill=255, zero_right=False):
    arr = np.full((h, w, 3), fill, dtype=np.uint8)
    if zero_right:
        arr[:, w // 2:] = 0
    return Image(ImageKind.RGB, arr)


def test_full_roi_equals_no_roi(fixtures_dir):
    query = load_image(fixtures_dir / "ems" / "12191_JRC2018U.tif")
    target = load_image(fixtures_dir / "lms" / f"{LM}.tif")
    grad = load_image(fixtures_dir / "grad" / f"{LM}.png")
    excluded = label_regions_mask(query.height, query.width)

    plain = ShapeScoreOracle(query, 20, True, excluded).score(target, grad)
    full = ShapeScoreOracle(query, 20, True, excluded,
                            roi_mask=_roi(query.height, query.width)
                            ).score(target, grad)
    assert (full.gradient_area_gap, full.high_expression_area,
            full.mirrored) == (plain.gradient_area_gap,
                               plain.high_expression_area, plain.mirrored)
    # and reproduces the golden (40696/17253 mirrored)
    assert plain.gradient_area_gap == 40696
    assert plain.mirrored


def test_partial_roi_changes_scores_and_respects_mirror(fixtures_dir):
    query = load_image(fixtures_dir / "ems" / "12191_JRC2018U.tif")
    target = load_image(fixtures_dir / "lms" / f"{LM}.tif")
    grad = load_image(fixtures_dir / "grad" / f"{LM}.png")
    excluded = label_regions_mask(query.height, query.width)
    roi = _roi(query.height, query.width, zero_right=True)

    scored = ShapeScoreOracle(query, 20, True, excluded,
                              roi_mask=roi).score(target, grad)
    plain = ShapeScoreOracle(query, 20, True, excluded).score(target, grad)
    # half the frame is masked out: the negative score cannot grow
    assert scored.score <= plain.score
    # mirror pass exists and used its own plane set (no crash, valid score)
    assert scored.gradient_area_gap >= 0
    assert scored.high_expression_area >= 0
