"""deleteCDMatches parity (DeleteCDMatchesCmd.java:46-354): full
selector surface, default delete-only-unscored semantics (the -1
"no score" ScoresFilter sentinel), match tags, archive-on-delete,
dry-run."""

import json
import pathlib

import pytest

from colormipsearch_tpu.cmd.main import main
from colormipsearch_tpu.dataio import ScoresFilter
from colormipsearch_tpu.model import CDMatchEntity

FIXTURE = (pathlib.Path(__file__).parent / "fixtures" / "cdsmatches"
           / "testcdsmatches.json")


def _matches():
    with open(FIXTURE) as f:
        out = [CDMatchEntity.from_dict(d) for d in json.load(f)]
    # give the first 5 a gradient score, tag two of them
    for m in out[:5]:
        m.gradient_area_gap = 100
        m.high_expression_area = 30
    out[0].tags.add("keepme")
    out[1].tags.add("keepme")
    return out


def test_scores_filter_no_score_sentinel():
    flt = ScoresFilter().add("gradientAreaGap|bidirectionalAreaGap", -1)
    scored, unscored, bi = CDMatchEntity(), CDMatchEntity(), CDMatchEntity()
    scored.gradient_area_gap = 5
    bi.bidirectional_area_gap = 7
    assert flt.matches(unscored)
    assert not flt.matches(scored)
    assert not flt.matches(bi)
    minus1 = CDMatchEntity()
    minus1.gradient_area_gap = -1
    assert flt.matches(minus1)


@pytest.fixture()
def seeded_db(tmp_path):
    from colormipsearch_tpu.cmd.backends import get_store
    from colormipsearch_tpu.dataio.db import DBNeuronMatchesWriter
    db = str(tmp_path / "nb.db")
    store = get_store(db)
    matches = _matches()
    DBNeuronMatchesWriter(store).write(matches)
    return db, store, matches


def test_delete_default_skips_scored_matches(seeded_db):
    db, store, matches = seeded_db
    rc = main(["deleteCDMatches", "--db", db])
    assert rc == 0
    left = store.find_matches_by_mask_refs(
        [m.mask_ref() for m in matches])
    # only the 5 gradient-scored matches survive the default delete
    assert len(left) == 5
    assert all(m.gradient_area_gap is not None for m in left)
    # deleted docs were archived
    assert len(store.archived_match_ids()) == len(matches) - 5


def test_delete_include_gradscore_and_match_tags(seeded_db):
    db, store, matches = seeded_db
    # tag filter: only the two tagged (and scored) matches die
    rc = main(["deleteCDMatches", "--db", db,
               "--include-matches-with-gradscore",
               "--match-tags", "keepme"])
    assert rc == 0
    left = store.find_matches_by_mask_refs(
        [m.mask_ref() for m in matches])
    assert len(left) == len(matches) - 2
    assert all("keepme" not in (m.tags or set()) for m in left)


def test_delete_no_archive_and_dry_run(seeded_db):
    db, store, matches = seeded_db
    rc = main(["deleteCDMatches", "--db", db, "--dry-run"])
    assert rc == 0
    assert len(store.find_matches_by_mask_refs(
        [m.mask_ref() for m in matches])) == len(matches)
    rc = main(["deleteCDMatches", "--db", db, "--no-archive"])
    assert rc == 0
    assert store.archived_match_ids() == []
    assert len(store.find_matches_by_mask_refs(
        [m.mask_ref() for m in matches])) == 5


def test_delete_target_selector(seeded_db):
    db, store, matches = seeded_db
    # a target-library selector that matches nothing deletes nothing
    rc = main(["deleteCDMatches", "--db", db,
               "--targets-libraries", "NoSuchLibrary"])
    assert rc == 0
    assert len(store.find_matches_by_mask_refs(
        [m.mask_ref() for m in matches])) == len(matches)
    # ... and the real target library deletes the unscored ones
    rc = main(["deleteCDMatches", "--db", db,
               "--targets-libraries", "FlyLight Split-GAL4 Drivers"])
    assert rc == 0
    assert len(store.find_matches_by_mask_refs(
        [m.mask_ref() for m in matches])) == 5


def test_delete_mask_selector_no_match(seeded_db):
    db, store, matches = seeded_db
    rc = main(["deleteCDMatches", "--db", db,
               "--masks-libraries", "NoSuchLibrary"])
    assert rc == 0
    assert len(store.find_matches_by_mask_refs(
        [m.mask_ref() for m in matches])) == len(matches)


def test_mongo_delete_by_ids_archives():
    from test_db_mongo import make_store
    from colormipsearch_tpu.dataio.db import DBNeuronMatchesWriter
    store = make_store()
    matches = _matches()
    DBNeuronMatchesWriter(store).write(matches)
    ids = [m.entity_id for m in matches[:4]]
    assert store.delete_matches_by_ids(ids) == 4
    assert sorted(store.archived_match_ids()) == sorted(ids)
    assert store.delete_matches_by_ids([], archive=False) == 0


@pytest.fixture()
def seeded_json_dir(tmp_path):
    from colormipsearch_tpu.dataio import JSONNeuronMatchesWriter
    md = tmp_path / "matches"
    matches = _matches()
    JSONNeuronMatchesWriter(str(md)).write(matches)
    return str(md), matches


def test_json_delete_mask_selector_no_match(seeded_json_dir):
    """ADVICE r2 high: the JSON path must apply mask-side selectors —
    a selector matching zero masks deletes nothing (and dry-runs 0)."""
    md, matches = seeded_json_dir
    n_files = len(list(pathlib.Path(md).glob("*.json")))
    rc = main(["deleteCDMatches", "-md", md,
               "--masks-libraries", "NoSuchLibrary", "--dry-run"])
    assert rc == 0
    rc = main(["deleteCDMatches", "-md", md,
               "--masks-libraries", "NoSuchLibrary"])
    assert rc == 0
    assert len(list(pathlib.Path(md).glob("*.json"))) == n_files


def test_json_delete_mask_selector_filters(seeded_json_dir):
    """The real library selector still deletes that library's unscored
    matches (and only those files change)."""
    md, matches = seeded_json_dir
    lib = matches[0].mask_image.library_name
    assert lib  # fixture sanity
    rc = main(["deleteCDMatches", "-md", md, "--masks-libraries", lib])
    assert rc == 0
    from colormipsearch_tpu.dataio import (DataSourceParam,
                                           JSONNeuronMatchesReader)
    left = JSONNeuronMatchesReader(md).read_matches_by_mask(
        DataSourceParam())
    # default deletes only unscored matches of the selected masks
    n_scored = sum(1 for m in matches if m.gradient_area_gap is not None)
    assert len(left) == n_scored
    assert all(m.gradient_area_gap is not None for m in left)
