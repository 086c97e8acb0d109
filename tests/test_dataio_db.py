"""SQLite DB backend tests (CDMatchesMongoDaoITest analogue, embedded)."""

import json
import pathlib

from colormipsearch_tpu.dataio import DataSourceParam, ScoresFilter
from colormipsearch_tpu.dataio.db import (DBCDMIPsReader, DBCDMIPsWriter,
                                          DBNeuronMatchesReader,
                                          DBNeuronMatchesWriter, SqliteStore)
from colormipsearch_tpu.model import CDMatchEntity, ProcessingType

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "cdsmatches" / "testcdsmatches.json"


def load_fixture_matches():
    with open(FIXTURE) as f:
        return [CDMatchEntity.from_dict(d) for d in json.load(f)]


def test_db_roundtrip_and_upsert(tmp_path):
    store = SqliteStore(str(tmp_path / "nb.db"))
    matches = load_fixture_matches()
    writer = DBNeuronMatchesWriter(store)
    n = writer.write(matches)
    assert n == len(matches)

    reader = DBNeuronMatchesReader(store)
    mips = reader.list_match_locations([DataSourceParam()])
    assert mips  # distinct mask mip ids
    read = reader.read_matches_by_mask(DataSourceParam(mip_ids=mips))
    assert len(read) == len(matches)
    # sorted desc by matching pixels
    pix = [m.matching_pixels for m in read]
    assert pix == sorted(pix, reverse=True)

    # idempotent re-run: upsert keyed on (mask_ref, matched_ref)
    n2 = writer.write(matches)
    assert n2 == len(matches)
    read2 = reader.read_matches_by_mask(DataSourceParam(mip_ids=mips))
    assert len(read2) == len(matches)

    # score-only field update
    for m in matches:
        m.normalized_score = 42.0
    writer.write_updates(matches, ["normalizedScore"])
    read3 = reader.read_matches_by_mask(DataSourceParam(mip_ids=mips))
    assert all(m.normalized_score == 42.0 for m in read3)

    # scores filter pushes through
    flt = ScoresFilter().add("matchingPixels", 400)
    strong = reader.read_matches_by_mask(DataSourceParam(mip_ids=mips),
                                         scores_filter=flt)
    assert all(m.matching_pixels >= 400 for m in strong)


def test_db_neurons_selectors(tmp_path):
    store = SqliteStore(str(tmp_path / "nb.db"))
    matches = load_fixture_matches()
    entities = [m.mask_image for m in matches] + [m.matched_image for m in matches]
    w = DBCDMIPsWriter(store)
    w.write(entities)
    w.add_processing_tags(entities[:3], ProcessingType.ColorDepthSearch, {"t1"})

    r = DBCDMIPsReader(store)
    em = r.read_mips(DataSourceParam(libraries=["FlyEM_Hemibrain_v1.2.1"]))
    assert em and all(e.library_name == "FlyEM_Hemibrain_v1.2.1" for e in em)
    tagged = [e for e in r.read_mips(DataSourceParam())
              if e.has_processed_tag(ProcessingType.ColorDepthSearch, "t1")]
    assert len(tagged) == len({e.entity_id for e in entities[:3]})
    assert store.distinct_neuron_values("library_name")


def test_update_scores_only_preserves_shape_scores(tmp_path):
    """--update-matches re-run semantics: pixel scores refresh, gradient
    and normalized scores survive (ColorDepthSearchCmd.java:395-401)."""
    store = SqliteStore(str(tmp_path / "nb.db"))
    matches = load_fixture_matches()
    writer = DBNeuronMatchesWriter(store)
    writer.write(matches)
    # simulate a completed gradientScores + normalize pass
    for m in matches:
        m.gradient_area_gap = 12345
        m.normalized_score = 88.5
    writer.write_updates(matches, ["gradientAreaGap", "normalizedScore"])

    # CDS re-run with different pixel scores, update-only writer.
    # Re-serialize through the wire format (entity ids included, as a
    # createDataInput-produced masks.json or DB read would carry them).
    rerun = [CDMatchEntity.from_dict(m.to_dict()) for m in matches]
    for m in rerun:
        m.matching_pixels = (m.matching_pixels or 0) + 1
    DBNeuronMatchesWriter(store, update_scores_only=True).write(rerun)

    reader = DBNeuronMatchesReader(store)
    mips = reader.list_match_locations([DataSourceParam()])
    read = reader.read_matches_by_mask(DataSourceParam(mip_ids=mips))
    assert all(m.gradient_area_gap == 12345 for m in read)
    assert all(m.normalized_score == 88.5 for m in read)
    orig = {(m.mask_ref(), m.matched_ref()): m.matching_pixels
            for m in matches}
    for m in read:
        assert m.matching_pixels == orig[(m.mask_ref(), m.matched_ref())] + 1


def test_session_provenance(tmp_path):
    """CDS sessions persist run params (DBCDSSessionWriter analogue)."""
    from colormipsearch_tpu.model import CDSSessionEntity
    store = SqliteStore(str(tmp_path / "nb.db"))
    s = CDSSessionEntity(username="tester",
                         params={"xyShift": 2, "mirrorMask": True},
                         masks=[{"file": "m.json"}],
                         targets=[{"file": "t.json"}])
    sid = store.create_session(s)
    docs = store.list_sessions()
    assert len(docs) == 1 and docs[0]["params"]["xyShift"] == 2
    assert sid == s.entity_id


def test_sqlite_ppp_and_pppm_urls(tmp_path):
    """Same PPP/pppmURL scenario as the Mongo backends (shared DAO
    semantics across stores)."""
    from colormipsearch_tpu.dataio.db import SqliteStore
    from tests.test_db_mongo import run_ppp_and_pppm_urls
    run_ppp_and_pppm_urls(SqliteStore(str(tmp_path / "p.db")))
