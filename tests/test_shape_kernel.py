"""Device shape-score kernel vs reference goldens (batched)."""

import numpy as np

from colormipsearch_tpu.imageproc import load_image, label_regions_mask
from colormipsearch_tpu.cds.shape_oracle import (
    build_query_shape_planes, build_target_shape_planes)
from colormipsearch_tpu.cds.shape_kernel import shape_score_kernel, finish_shape_scores

LM_VT033614 = "VT033614_127B01_AE_01-20171124_64_H6-f-CH2_01"
LM_BJD = "BJD_127B01_AE_01-20171124_64_H6-40x-Brain-JRC2018_Unisex_20x_HR-2483089192251293794-CH2-01_CDM"
LM_VT016795 = "VT016795_115C08_AE_01-20200221_61_I2-m-CH1_01"


def test_shape_kernel_batched_goldens(fixtures_dir):
    query = load_image(fixtures_dir / "ems" / "12191_JRC2018U.tif")
    excluded = label_regions_mask(query.height, query.width)
    q = build_query_shape_planes(query, excluded)

    lms = [LM_VT033614, LM_BJD, LM_VT016795]
    tplanes = []
    for lm in lms:
        target = load_image(fixtures_dir / "lms" / f"{lm}.tif")
        grad = load_image(fixtures_dir / "grad" / f"{lm}.png")
        tplanes.append(build_target_shape_planes(target, grad, None, 20, excluded))

    grad = np.stack([t.grad for t in tplanes])
    znz = np.stack([t.z_nonzero for t in tplanes])
    zsl = np.stack([t.z_slice for t in tplanes])
    tab = np.stack([t.t_above for t in tplanes])

    out = shape_score_kernel(q.q_nonzero, q.q_slice, q.q_mask, q.high_expr,
                             grad, znz, zsl, tab, mirror=True)
    gaps, high, score, mirrored = finish_shape_scores(*out, mirror=True)

    # goldens: Shape2DMatchColorDepthSearchAlgorithmTest.java:86-132
    assert list(gaps) == [21365, 23359, 40696]
    assert list(high) == [731, 523, 17253]
    assert list(score) == [21608, 23533, 46447]
    assert list(mirrored) == [False, False, True]
