"""Mongo DAO backend tests (CDMatchesMongoDaoITest analogue).

pymongo is not installed in this image, so MongoStore is exercised
against an in-process fake implementing the exact pymongo subset it
uses (replace_one/update_one/find/distinct/delete_many with equality,
$in and $lt filters). The scenarios mirror test_dataio_db.py so both
backends are pinned to the same DAO semantics.
"""

import json
import pathlib

from colormipsearch_tpu.dataio import DataSourceParam, ScoresFilter
from colormipsearch_tpu.dataio.db import (DBCDMIPsReader, DBCDMIPsWriter,
                                          DBNeuronMatchesReader,
                                          DBNeuronMatchesWriter)
from colormipsearch_tpu.dataio.db_mongo import MongoStore, open_store
from colormipsearch_tpu.model import CDMatchEntity, ProcessingType

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "cdsmatches" / "testcdsmatches.json"


# --- minimal pymongo-compatible fake -----------------------------------

def _matches_filter(doc, query):
    for key, cond in query.items():
        val = doc.get(key)
        if isinstance(cond, dict):
            for op, arg in cond.items():
                if op == "$in":
                    if val not in arg:
                        return False
                elif op == "$lt":
                    if val is None or not val < arg:
                        return False
                else:
                    raise NotImplementedError(op)
        elif val != cond:
            return False
    return True


class _FakeCollection:
    def __init__(self):
        self.docs = {}

    def create_index(self, key):
        pass

    def find(self, query=None):
        return [dict(d) for d in self.docs.values()
                if _matches_filter(d, query or {})]

    def replace_one(self, flt, doc, upsert=False):
        for _id, d in list(self.docs.items()):
            if _matches_filter(d, flt):
                self.docs[_id] = dict(doc, _id=d["_id"])
                return
        if upsert:
            self.docs[doc["_id"]] = dict(doc)

    def update_one(self, flt, update):
        for d in self.docs.values():
            if _matches_filter(d, flt):
                d.update(update["$set"])
                return

    def distinct(self, key):
        return sorted({d.get(key) for d in self.docs.values()
                       if d.get(key) is not None})

    def delete_many(self, query):
        hit = [i for i, d in self.docs.items() if _matches_filter(d, query)]
        for i in hit:
            del self.docs[i]
        class R:
            deleted_count = len(hit)
        return R()


class _FakeDB(dict):
    def __missing__(self, key):
        self[key] = _FakeCollection()
        return self[key]


class _FakeClient:
    def __init__(self):
        self.dbs = {}

    def __getitem__(self, name):
        return self.dbs.setdefault(name, _FakeDB())

    def close(self):
        pass


def load_fixture_matches():
    with open(FIXTURE) as f:
        return [CDMatchEntity.from_dict(d) for d in json.load(f)]


def make_store():
    return MongoStore(client=_FakeClient(), database="neuronbridge")


def run_roundtrip_and_upsert(store):
    """DAO scenario shared by the hermetic fake and the env-gated real-
    Mongo itest (tests/test_db_mongo_itest.py)."""
    matches = load_fixture_matches()
    writer = DBNeuronMatchesWriter(store)
    assert writer.write(matches) == len(matches)

    reader = DBNeuronMatchesReader(store)
    mips = reader.list_match_locations([DataSourceParam()])
    assert mips
    read = reader.read_matches_by_mask(DataSourceParam(mip_ids=mips))
    assert len(read) == len(matches)
    pix = [m.matching_pixels for m in read]
    assert pix == sorted(pix, reverse=True)

    # idempotent re-run: replaceOne keyed on (mask_ref, matched_ref)
    assert writer.write(matches) == len(matches)
    read2 = reader.read_matches_by_mask(DataSourceParam(mip_ids=mips))
    assert len(read2) == len(matches)

    # score-only field update ($set path)
    for m in matches:
        m.normalized_score = 42.0
    writer.write_updates(matches, ["normalizedScore"])
    read3 = reader.read_matches_by_mask(DataSourceParam(mip_ids=mips))
    assert all(m.normalized_score == 42.0 for m in read3)

    flt = ScoresFilter().add("matchingPixels", 100)
    strong = reader.read_matches_by_mask(DataSourceParam(mip_ids=mips),
                                         scores_filter=flt)
    assert strong and all(m.matching_pixels >= 100 for m in strong)

    # delete below a pixel floor
    before = len(store.find_matches_by_mask_refs(
        store.matches.distinct("maskImageRefId")))
    deleted = store.delete_matches(max_pixels=100)
    assert deleted == before - len(strong)


def run_neuron_selectors(store):
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


def test_mongo_roundtrip_and_upsert():
    run_roundtrip_and_upsert(make_store())


def test_mongo_neuron_selectors():
    run_neuron_selectors(make_store())


def test_open_store_dispatch(tmp_path):
    from colormipsearch_tpu.dataio.db import SqliteStore
    s = open_store(str(tmp_path / "x.db"))
    assert isinstance(s, SqliteStore)
    # mongodb:// requires pymongo, which is absent: clear error
    try:
        open_store("mongodb://localhost/neuronbridge")
        raise AssertionError("expected RuntimeError without pymongo")
    except RuntimeError as e:
        assert "pymongo" in str(e)
