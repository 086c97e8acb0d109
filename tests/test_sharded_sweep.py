"""Distributed correctness: N-chip sharded sweep == single-device scores.

The reference has no distributed tests (SURVEY.md §4); here 1-chip vs
8-virtual-chip score equality is asserted directly.
"""

import numpy as np
import jax.numpy as jnp

from colormipsearch_tpu.imageproc import load_image, label_regions_mask
from colormipsearch_tpu.imageproc.io import image_from_array
from colormipsearch_tpu.cds.pixel_kernel import (
    prepare_query_planes, pack_targets, z_tolerance_to_zt9)
from colormipsearch_tpu.cds.oracle import shift_ring_offsets
from colormipsearch_tpu.parallel import (make_pair_mesh, local_pixel_sweep,
                                         sharded_pixel_sweep)
from colormipsearch_tpu.parallel.sweep import (sharded_pixel_sweep_topk,
                                               merge_topk)


def test_sharded_equals_local(fixtures_dir):
    rng = np.random.default_rng(7)
    h, w = 64, 96
    bsz, tsz = 4, 8

    queries = []
    for i in range(bsz):
        q = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        q[rng.random((h, w)) < 0.6] = 0
        queries.append(prepare_query_planes(image_from_array(q), 20).words)
    q_words = jnp.asarray(np.stack(queries))

    targets = rng.integers(0, 256, size=(tsz, h, w, 3)).astype(np.uint8)
    targets[rng.random((tsz, h, w)) < 0.5] = 0

    zt9 = z_tolerance_to_zt9(1.0)
    shifts = jnp.asarray(np.asarray(shift_ring_offsets(2), dtype=np.int32))
    t_padded, t_flipped = pack_targets(jnp.asarray(targets), 20, 2)

    local_scores, local_mirrored = local_pixel_sweep(
        q_words, t_padded, t_flipped, shifts, zt9, True)

    mesh = make_pair_mesh(shape=(2, 4))
    scores, mirrored, per_mask_max = sharded_pixel_sweep(
        mesh, q_words, t_padded, t_flipped, shifts, zt9, True)

    np.testing.assert_array_equal(np.asarray(scores), np.asarray(local_scores))
    np.testing.assert_array_equal(np.asarray(mirrored), np.asarray(local_mirrored))
    np.testing.assert_array_equal(np.asarray(per_mask_max),
                                  np.asarray(local_scores).max(axis=1))


def test_sharded_goldens(fixtures_dir):
    """Real fixtures through the sharded path: golden scores intact."""
    query = load_image(fixtures_dir / "ems" / "12191_JRC2018U.tif")
    excluded = label_regions_mask(query.height, query.width)
    qp = prepare_query_planes(query, 20, excluded)
    q_words = jnp.asarray(np.stack([qp.words] * 2))

    lms = ["VT033614_127B01_AE_01-20171124_64_H6-f-CH2_01.tif",
           "BJD_127B01_AE_01-20171124_64_H6-40x-Brain-JRC2018_Unisex_20x_HR-2483089192251293794-CH2-01_CDM.tif"]
    targets = np.stack([load_image(fixtures_dir / "lms" / n).pixels
                        for n in lms] * 2)

    zt9 = z_tolerance_to_zt9(1.0)
    shifts = jnp.asarray(np.asarray(shift_ring_offsets(2), dtype=np.int32))
    t_padded, t_flipped = pack_targets(jnp.asarray(targets), 20, 2)

    mesh = make_pair_mesh(shape=(2, 4))
    scores, mirrored, per_mask_max = sharded_pixel_sweep(
        mesh, q_words, t_padded, t_flipped, shifts, zt9, True)
    scores = np.asarray(scores)
    assert list(scores[0]) == [439, 414, 439, 414]
    assert list(scores[1]) == [439, 414, 439, 414]
    assert np.asarray(per_mask_max).tolist() == [439, 439]


def test_topk_sweep_matches_full_sort(fixtures_dir):
    """Device-side per-shard top-k + host merge == sort of full grid."""
    rng = np.random.default_rng(11)
    h, w = 48, 96
    bsz, tsz, k = 4, 16, 5
    qs = []
    for _ in range(bsz):
        q = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        q[rng.random((h, w)) < 0.6] = 0
        qs.append(prepare_query_planes(image_from_array(q), 20).words)
    q_words = jnp.asarray(np.stack(qs))
    t = rng.integers(0, 256, size=(tsz, h, w, 3)).astype(np.uint8)
    t[rng.random((tsz, h, w)) < 0.5] = 0
    zt9 = z_tolerance_to_zt9(1.0)
    shifts = jnp.asarray(np.asarray(shift_ring_offsets(2), dtype=np.int32))
    tp, tf = pack_targets(jnp.asarray(t), 20, 2)

    full, full_m = local_pixel_sweep(q_words, tp, tf, shifts, zt9, True)
    full = np.asarray(full)

    mesh = make_pair_mesh(shape=(2, 4))
    ts_, ti_, tm_ = sharded_pixel_sweep_topk(
        mesh, q_words, tp, tf, shifts, zt9, True, k)
    s, i, m = merge_topk(ts_, ti_, tm_, k)

    for b in range(bsz):
        expect = np.sort(full[b])[::-1][:k]
        np.testing.assert_array_equal(s[b], expect)
        # indices actually point at those scores
        np.testing.assert_array_equal(full[b][i[b]], s[b])
        np.testing.assert_array_equal(np.asarray(full_m)[b][i[b]], m[b])


def test_mesh_edge_shapes(fixtures_dir):
    """Degenerate mesh shapes (pure-target and pure-mask partitions)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    h, w = 40, 96
    qs = []
    for _ in range(8):
        q = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        q[rng.random((h, w)) < 0.6] = 0
        qs.append(prepare_query_planes(image_from_array(q), 20).words)
    q_words = jnp.asarray(np.stack(qs))
    t = rng.integers(0, 256, size=(8, h, w, 3)).astype(np.uint8)
    t[rng.random((8, h, w)) < 0.5] = 0
    zt9 = z_tolerance_to_zt9(1.0)
    shifts = jnp.asarray(np.asarray(shift_ring_offsets(2), dtype=np.int32))
    tp, tf = pack_targets(jnp.asarray(t), 20, 2)
    ref, _ = local_pixel_sweep(q_words, tp, tf, shifts, zt9, True)
    for shape in ((1, 8), (8, 1), (4, 2)):
        mesh = make_pair_mesh(shape=shape)
        s, _, _ = sharded_pixel_sweep(mesh, q_words, tp, tf, shifts, zt9, True)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(ref))


def test_sharded_shape_scores_equal_local(fixtures_dir):
    """Shape re-ranking sharded over 8 target shards == single-device
    scores, and the cross-chip pmin matches the global minimum."""
    from colormipsearch_tpu.parallel.sweep import sharded_shape_scores
    from colormipsearch_tpu.cds.shape_kernel import shape_score_kernel
    from colormipsearch_tpu.cds.shape_oracle import (
        build_query_shape_planes, build_target_shape_planes)

    rng = np.random.default_rng(13)
    h, w = 40, 96
    tsz = 8
    q = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    q[rng.random((h, w)) < 0.5] = 0
    qp = build_query_shape_planes(image_from_array(q), None)

    tplanes = []
    for _ in range(tsz):
        t = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        t[rng.random((h, w)) < 0.5] = 0
        grad16 = rng.integers(0, 300, size=(h, w)).astype(np.uint16)
        tplanes.append(build_target_shape_planes(
            image_from_array(t), image_from_array(grad16), None, 20, None))

    args = (jnp.asarray(qp.q_nonzero), jnp.asarray(qp.q_slice),
            jnp.asarray(qp.q_mask), jnp.asarray(qp.high_expr),
            jnp.asarray(np.stack([t.grad for t in tplanes])),
            jnp.asarray(np.stack([t.z_nonzero for t in tplanes])),
            jnp.asarray(np.stack([t.z_slice for t in tplanes])),
            jnp.asarray(np.stack([t.t_above for t in tplanes])))

    gaps_id, high_id, gaps_m, high_m = shape_score_kernel(*args, mirror=True)
    score_id = np.asarray(gaps_id).sum(1) + np.asarray(high_id).sum(1) // 3
    score_m = np.asarray(gaps_m).sum(1) + np.asarray(high_m).sum(1) // 3
    expected = np.minimum(score_id, score_m)

    mesh = make_pair_mesh(shape=(1, 8))
    score, use_m, best_global = sharded_shape_scores(mesh, *args, mirror=True)
    np.testing.assert_array_equal(np.asarray(score), expected)
    assert int(np.asarray(best_global)[0]) == int(expected.min())
