"""Grouping / top-ranked selection semantics (ItemsHandlingTest analogue)."""

from colormipsearch_tpu.results import (partition_collection,
                                        select_top_ranked_elements,
                                        select_best_matches)
from colormipsearch_tpu.model import CDMatchEntity, LMNeuronEntity, EMNeuronEntity


def _match(line, sample, pixels):
    m = CDMatchEntity()
    m.mask_image = EMNeuronEntity(published_name="mask1", mip_id="mask1")
    m.matched_image = LMNeuronEntity(published_name=line, slide_code=sample)
    m.matching_pixels = pixels
    return m


def test_partition_collection():
    parts = partition_collection(list(range(10)), 3)
    assert [len(p) for p in parts] == [3, 3, 3, 1]
    assert partition_collection([], 3) == []
    assert partition_collection(list(range(3)), 0) == [[0], [1], [2]]


def test_select_top_ranked_elements():
    items = [("a", 5), ("a", 9), ("b", 7), ("b", 8), ("c", 1)]
    entries = select_top_ranked_elements(items, lambda x: x[0], lambda x: x[1],
                                         top_results=2, limit_sub_results=1)
    assert [e.name for e in entries] == ["a", "b"]
    assert entries[0].score == 9
    assert entries[0].entry == [("a", 9)]
    assert entries[1].entry == [("b", 8)]


def test_select_best_matches_lines_then_samples():
    matches = [
        _match("line1", "s1", 100), _match("line1", "s1", 90),
        _match("line1", "s2", 80),
        _match("line2", "s3", 95), _match("line2", "s4", 50),
        _match("line3", "s5", 10),
    ]
    best = select_best_matches(matches, top_line_matches=2,
                               top_samples_per_line=1, top_matches_per_sample=1)
    got = {(m.matched_image.published_name, m.matched_image.slide_code,
            m.matching_pixels) for m in best}
    # line1 (best 100) and line2 (best 95) survive; best sample each,
    # best match per sample
    assert got == {("line1", "s1", 100), ("line2", "s3", 95)}
