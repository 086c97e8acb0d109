"""Real-MongoDB integration tests (reference analogue:
CDMatchesMongoDaoITest and the other persist itests, which also run
only against a provisioned server).

Gated: runs only when CMS_MONGO_URI points at a reachable MongoDB and
pymongo is importable — both absent in the hermetic CI image, so these
skip there. Usage:

    CMS_MONGO_URI=mongodb://localhost:27017/cms_itest \\
        python -m pytest tests/test_db_mongo_itest.py -q

The scenarios are the SAME functions the fake-backed tests run
(tests/test_db_mongo.py), so a pass here certifies the pymongo-subset
fake models the server faithfully for every operation the DAO uses
(documented in PARITY.md "Mongo backend compatibility").
"""

import os

import pytest

URI = os.environ.get("CMS_MONGO_URI")

pymongo = pytest.importorskip("pymongo") if URI else None

if not URI:
    pytest.skip("CMS_MONGO_URI not set (real-Mongo itest)",
                allow_module_level=True)


@pytest.fixture()
def real_store():
    from colormipsearch_tpu.dataio.db_mongo import MongoStore
    client = pymongo.MongoClient(URI, serverSelectionTimeoutMS=2000)
    dbname = (pymongo.uri_parser.parse_uri(URI)["database"]
              or "cms_itest")
    try:
        client.admin.command("ping")
    except Exception as e:  # server not reachable: treat as not provisioned
        pytest.skip(f"MongoDB not reachable at {URI}: {e}")
    client.drop_database(dbname)
    store = MongoStore(client=client, database=dbname)
    yield store
    client.drop_database(dbname)
    client.close()


def test_real_mongo_roundtrip_and_upsert(real_store):
    from test_db_mongo import run_roundtrip_and_upsert
    run_roundtrip_and_upsert(real_store)


def test_real_mongo_neuron_selectors(real_store):
    from test_db_mongo import run_neuron_selectors
    run_neuron_selectors(real_store)


def test_real_mongo_published_stores(real_store):
    from test_published_stores import _roundtrip_published
    _roundtrip_published(real_store)


def test_real_mongo_field_handlers(real_store):
    from test_field_handlers import test_all_handler_kinds
    # reuse the shared scenario body directly against the real server
    import test_field_handlers as fh
    fh._seed(real_store)
    real_store.update_entity_fields(
        "neurons", 5, {"tags": fh.AppendField({"b", "c"}),
                       "useCount": fh.IncField(2)})
    real_store.update_entity_fields("neurons", 5,
                                    {"tags": fh.RemoveField("a")})
    d = dict(next(iter(real_store.neurons.find({"_id": 5}))))
    assert sorted(d["tags"]) == ["b", "c"] and d["useCount"] == 2


def test_real_mongo_selector_pushdown(real_store):
    """Certify the r4 pushdown operator surface ($gte/$all/$nin/$nor/
    $or/$and, dotted paths, update_many) against a real server."""
    from test_selector_pushdown import (SCORE_CASES, SELECTOR_CASES,
                                        _host_reference, _seed)
    matches = _seed(real_store)
    for sel in SELECTOR_CASES:
        want = _host_reference(matches, sel, None)
        got = real_store.find_matches_by_mask_refs([1], target_selector=sel)
        assert sorted(m.matched_image.mip_id for m in got) == want, sel
    for sf in SCORE_CASES:
        want = _host_reference(matches, None, sf)
        got = real_store.find_matches_by_mask_refs([1], scores_filter=sf)
        assert sorted(m.matched_image.mip_id for m in got) == want, \
            sf.selectors
    from colormipsearch_tpu.dataio.base import AppendField
    n = real_store.update_matches_fields_by_refs(
        mask_refs=[1], updates={"tags": AppendField({"itest-tag"})})
    assert n == len(matches)


def test_real_mongo_ppp_and_pppm_urls(real_store):
    from test_db_mongo import run_ppp_and_pppm_urls
    run_ppp_and_pppm_urls(real_store)
