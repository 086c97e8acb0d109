"""JSON persistence round-trips against the reference fixture
(mirrors dataio/fs/JSONReadWriteTest.java:37-120)."""

import json
import pathlib

import pytest

from colormipsearch_tpu.dataio import (DataSourceParam, JSONCDMIPsReader,
                                       JSONCDMIPsWriter,
                                       JSONNeuronMatchesReader,
                                       JSONNeuronMatchesWriter, ScoresFilter)
from colormipsearch_tpu.model import (CDMatchEntity, EMNeuronEntity,
                                      LMNeuronEntity, ProcessingType,
                                      entity_from_dict)

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "cdsmatches" / "testcdsmatches.json"


def load_fixture_matches():
    with open(FIXTURE) as f:
        return [CDMatchEntity.from_dict(d) for d in json.load(f)]


def test_match_entity_roundtrip():
    matches = load_fixture_matches()
    assert len(matches) == 18
    m = matches[0]
    assert isinstance(m.mask_image, EMNeuronEntity)
    assert isinstance(m.matched_image, LMNeuronEntity)
    assert m.matching_pixels == 241
    d = m.to_dict()
    m2 = CDMatchEntity.from_dict(d)
    assert m2.matching_pixels == m.matching_pixels
    assert m2.mask_image.mip_id == m.mask_image.mip_id
    assert m2.matched_image.compute_files == m.matched_image.compute_files


def test_grouped_write_read_roundtrip(tmp_path):
    matches = load_fixture_matches()
    per_masks = tmp_path / "em2lm"
    per_targets = tmp_path / "lm2em"
    writer = JSONNeuronMatchesWriter(str(per_masks), str(per_targets))
    n = writer.write(matches)
    assert n > 0
    mask_mips = {m.mask_image.mip_id for m in matches}
    files = {p.stem for p in per_masks.glob("*.json")}
    assert files == mask_mips

    reader = JSONNeuronMatchesReader(str(per_masks))
    assert set(reader.list_match_locations([DataSourceParam()])) == mask_mips
    read = reader.read_matches_by_mask(DataSourceParam())
    assert len(read) == len(matches)
    # mask-side compute files restored through matchComputeFiles
    by_pix = {m.matching_pixels for m in matches}
    assert {m.matching_pixels for m in read} == by_pix
    for m in read:
        assert m.mask_image is not None
        assert m.matched_image is not None

    # scores filter
    flt = ScoresFilter().add("matchingPixels", 400)
    strong = reader.read_matches_by_mask(DataSourceParam(), scores_filter=flt)
    assert all(m.matching_pixels >= 400 for m in strong)
    assert len(strong) == sum(1 for m in matches if m.matching_pixels >= 400)


def test_mips_write_read_roundtrip(tmp_path):
    matches = load_fixture_matches()
    entities = [m.mask_image for m in matches[:3]] + [m.matched_image for m in matches[:3]]
    path = tmp_path / "mips.json"
    w = JSONCDMIPsWriter(str(path))
    w.open()
    w.write(entities)
    w.add_processing_tags(entities, ProcessingType.ColorDepthSearch, {"test-tag"})
    w.close()

    r = JSONCDMIPsReader(str(path))
    read = r.read_mips(DataSourceParam())
    assert len(read) == len(entities)
    assert all(e.has_processed_tag(ProcessingType.ColorDepthSearch, "test-tag")
               for e in read)
    em_only = r.read_mips(DataSourceParam(libraries=["FlyEM_Hemibrain_v1.2.1"]))
    assert all(e.library_name == "FlyEM_Hemibrain_v1.2.1" for e in em_only)
    assert len(em_only) == 3
