"""NeuronSelector-breadth selectors on both DB backends + the deepened
validateDBData semantics (persisted validationErrors, error tagging of
entities and their matches, dangling-ref scan, paged reads).
Reference: dao/NeuronSelector.java, cmd/ValidateNBDBDataCmd.java."""

import json

import pytest

from colormipsearch_tpu.dataio import DataSourceParam
from colormipsearch_tpu.model import (CDMatchEntity, ComputeFileType,
                                      EMNeuronEntity, FileData,
                                      LMNeuronEntity)


def _neurons():
    out = []
    for i in range(6):
        cls = EMNeuronEntity if i % 2 == 0 else LMNeuronEntity
        e = cls(entity_id=100 + i, mip_id=f"mip-{i}",
                alignment_space="JRC2018_Unisex_20x_HR",
                library_name="libA" if i < 3 else "libB",
                published_name=f"name-{i}" if i != 5 else "No Consensus",
                source_ref_id=f"Sample#{i}")
        e.tags = {"good"} if i % 2 == 0 else {"bad"}
        e.neuron_terms = ["LC10"] if i in (0, 1) else ["LPLC2"]
        e.dataset_labels = {"release1"} if i < 4 else {"release2"}
        out.append(e)
    return out


@pytest.fixture(params=["sqlite", "mongo"])
def store(request, tmp_path):
    if request.param == "sqlite":
        from colormipsearch_tpu.dataio.db import SqliteStore
        s = SqliteStore(str(tmp_path / "t.db"))
    else:
        from tests.test_db_mongo import make_store
        s = make_store()
    s.upsert_neurons(_neurons())
    return s


def _ids(entities):
    return sorted(e.entity_id for e in entities)


def test_selector_matrix(store):
    f = store.find_neurons
    assert _ids(f(DataSourceParam(excluded_tags={"bad"}))) == [100, 102, 104]
    assert _ids(f(DataSourceParam(annotations={"LC10"}))) == [100, 101]
    assert _ids(f(DataSourceParam(excluded_annotations={"LC10"}))) == \
        [102, 103, 104, 105]
    assert _ids(f(DataSourceParam(datasets={"release2"}))) == [104, 105]
    assert _ids(f(DataSourceParam(source_ref_ids={"Sample#2"}))) == [102]
    assert _ids(f(DataSourceParam(entity_ids={101, 104}))) == [101, 104]
    assert _ids(f(DataSourceParam(neuron_class="EMNeuronEntity"))) == \
        [100, 102, 104]
    assert _ids(f(DataSourceParam(valid_name_only=True))) == \
        [100, 101, 102, 103, 104]
    assert _ids(f(DataSourceParam(libraries=["libB"],
                                  excluded_tags={"bad"}))) == [104]
    # paged reads
    page1 = f(DataSourceParam(offset=0, size=4))
    page2 = f(DataSourceParam(offset=4, size=4))
    assert _ids(page1) + _ids(page2) == [100 + i for i in range(6)]


def test_validate_db_persists_errors_and_tags(tmp_path, fixtures_dir):
    from colormipsearch_tpu.cmd.main import main
    from colormipsearch_tpu.cmd.backends import get_store
    db = str(tmp_path / "v.db")
    store = get_store(db)
    good = EMNeuronEntity(entity_id=1, mip_id="m-good",
                          library_name="libA", published_name="ok")
    good.compute_files[ComputeFileType.InputColorDepthImage] = \
        FileData.from_string(str(fixtures_dir / "ems" / "12191_JRC2018U.tif"))
    good.compute_files[ComputeFileType.SourceColorDepthImage] = \
        FileData.from_string(str(fixtures_dir / "ems" / "12191_JRC2018U.tif"))
    bad = EMNeuronEntity(entity_id=2, mip_id="m-bad",
                         library_name="libA", published_name="oops")
    bad.compute_files[ComputeFileType.InputColorDepthImage] = \
        FileData.from_string("/nonexistent/file.tif")
    orphan_target = LMNeuronEntity(entity_id=3, mip_id="m-t",
                                   library_name="libB",
                                   published_name="t")
    store.upsert_neurons([good, bad, orphan_target])
    m1 = CDMatchEntity()
    m1.mask_image, m1.matched_image = bad, orphan_target
    m1.matching_pixels = 10
    m2 = CDMatchEntity()
    m2.mask_image, m2.matched_image = good, orphan_target
    m2.matching_pixels = 20
    store.upsert_matches([m1, m2])
    # a dangling reference: delete the target neuron row
    store._conn.execute("DELETE FROM neuron_metadata WHERE entity_id = 3")
    store._conn.commit()

    report = tmp_path / "report.json"
    rc = main(["validateDBData", "--db", db, "--no-grad-files-check",
               "--error-tag", "validationError",
               "--apply-error-tag-to-em-cdmatches",
               "--check-matches", "--error-report", str(report)])
    assert rc == 1
    errs = json.load(open(report))
    by_entity = {}
    for e in errs:
        by_entity.setdefault(e["entity"], []).append(e["error"])
    assert any("not found" in x for x in by_entity["m-bad"])
    assert any("SourceColorDepthImage" in x for x in by_entity["m-bad"])
    assert "m-good" not in by_entity
    assert any("dangling" in "".join(v) for k, v in by_entity.items()
               if k.startswith("match"))

    # persisted validationErrors + tag on the entity and its matches
    nb = store.find_neurons(DataSourceParam(mip_ids=["m-bad"]))[0]
    assert nb.validation_errors and "validationError" in nb.tags
    bad_matches = store.find_matches_by_mask_refs([2])
    assert all("validationError" in m.tags for m in bad_matches)
    good_matches = store.find_matches_by_mask_refs([1])
    assert all("validationError" not in m.tags for m in good_matches)

    # fix the bad entity -> re-validate clears the persisted errors
    nb.compute_files[ComputeFileType.InputColorDepthImage] = \
        FileData.from_string(str(fixtures_dir / "ems" / "12191_JRC2018U.tif"))
    nb.compute_files[ComputeFileType.SourceColorDepthImage] = \
        FileData.from_string(str(fixtures_dir / "ems" / "12191_JRC2018U.tif"))
    store.upsert_neurons([nb])
    rc = main(["validateDBData", "--db", db, "--no-grad-files-check"])
    nb = store.find_neurons(DataSourceParam(mip_ids=["m-bad"]))[0]
    assert not nb.validation_errors


def test_tag_cmd_selectors_paged(tmp_path):
    from colormipsearch_tpu.cmd.main import main
    from colormipsearch_tpu.cmd.backends import get_store
    db = str(tmp_path / "t.db")
    store = get_store(db)
    store.upsert_neurons(_neurons())
    rc = main(["tag", "--db", db, "--tag", "lc10-set",
               "--annotations", "LC10", "--excluded-tags", "bad"])
    assert rc == 0
    tagged = store.find_neurons(DataSourceParam(tags={"lc10-set"}))
    assert _ids(tagged) == [100]
    # remove with selector feedback (removed tag is in --tags): snapshot
    # paging must still cover everything
    rc = main(["tag", "--db", db, "--tag", "lc10-set", "--remove",
               "--tags", "lc10-set"])
    assert rc == 0
    assert not store.find_neurons(DataSourceParam(tags={"lc10-set"}))
