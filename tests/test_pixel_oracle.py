"""Golden-value conformance tests for the pixel-match oracle.

Scores must match the reference's JUnit goldens exactly
(PixelMatchColorDepthSearchAlgorithmTest.java:50-103).
"""

import numpy as np
import pytest

from colormipsearch_tpu.imageproc import load_image, label_regions_mask
from colormipsearch_tpu.cds.oracle import PixelMatchOracle

EMS = "ems"
LMS = "lms"

GOLDENS = [
    # (em, lm, expected score, expected mirrored)
    ("12191_JRC2018U.tif", "VT033614_127B01_AE_01-20171124_64_H6-f-CH2_01.tif", 439, False),
    ("12191_JRC2018U.tif",
     "BJD_127B01_AE_01-20171124_64_H6-40x-Brain-JRC2018_Unisex_20x_HR-2483089192251293794-CH2-01_CDM.tif",
     414, False),
    ("12191_JRC2018U_FL.tif", "VT033614_127B01_AE_01-20171124_64_H6-f-CH2_01.tif", 515, False),
    ("12191_JRC2018U_FL.tif", "VT016795_115C08_AE_01-20200221_61_I2-m-CH1_01.tif", 483, False),
    ("12191_JRC2018U.tif", "VT016795_115C08_AE_01-20200221_61_I2-m-CH1_01.tif", 426, True),
]


@pytest.mark.parametrize("em,lm,expected,mirrored", GOLDENS)
def test_multiple_pixel_scores(fixtures_dir, em, lm, expected, mirrored):
    query = load_image(fixtures_dir / EMS / em)
    target = load_image(fixtures_dir / LMS / lm)
    excluded = label_regions_mask(query.height, query.width)
    oracle = PixelMatchOracle(
        query, query_threshold=20, mirror_query=True,
        target_threshold=20, z_tolerance=0.01, xy_shift=2,
        excluded_regions=excluded)
    score = oracle.score(target)
    assert score.matching_pixels == expected
    assert score.mirrored == mirrored


def test_pixel_match_score_custom_region(fixtures_dir):
    """PixelMatchColorDepthSearchAlgorithmTest.pixelMatchScore (:32-53):
    custom excluded region x >= w-260 & y < 90 | x < 330 & y < 100."""
    query = load_image(fixtures_dir / EMS / "1752016801-LPLC2-RT_18U.tif")
    target = load_image(
        fixtures_dir / LMS /
        "GMR_31G04_AE_01-20190813_66_F3-40x-Brain-JRC2018_Unisex_20x_HR-2704505419467849826-CH2-07_CDM.tif")
    h, w = query.shape
    ys, xs = np.mgrid[0:h, 0:w]
    excluded = ((xs >= w - 260) & (ys < 90)) | ((xs < 330) & (ys < 100))
    oracle = PixelMatchOracle(
        query, query_threshold=20, mirror_query=True,
        target_threshold=20, z_tolerance=0.01, xy_shift=2,
        excluded_regions=excluded)
    score = oracle.score(target)
    assert score.matching_pixels == 87
    assert not score.mirrored
