"""End-to-end pipeline against the SQLite DB backend."""

import os

import pytest

from colormipsearch_tpu.cmd.main import main
from colormipsearch_tpu.cmd import backends
from colormipsearch_tpu.dataio import DataSourceParam
from colormipsearch_tpu.dataio.db import DBNeuronMatchesReader, SqliteStore

from test_cli_e2e import workspace  # reuse the fixture workspace  # noqa: F401


def test_db_pipeline(workspace):  # noqa: F811
    ws = str(workspace)
    db = os.path.join(ws, "nb.db")

    rc = main(["colorDepthSearch",
               "-m", os.path.join(ws, "masks.json"),
               "-i", os.path.join(ws, "targets.json"),
               "--maskThreshold", "20", "--dataThreshold", "20",
               "--pixColorFluctuation", "1", "--xyShift", "2",
               "--mirrorMask", "--db", db])
    assert rc == 0

    reader = DBNeuronMatchesReader(backends.get_store(db))
    mips = reader.list_match_locations([DataSourceParam()])
    assert "em-12191" in mips
    matches = reader.read_matches_by_mask(DataSourceParam(mip_ids=["em-12191"]))
    by_target = {m.matched_image.mip_id: m for m in matches}
    assert by_target["lm-0"].matching_pixels == 439
    assert by_target["lm-1"].matching_pixels == 414
    assert by_target["lm-2"].matching_pixels == 426
    assert by_target["lm-2"].mirrored

    rc = main(["gradientScores", "--db", db,
               "--maskThreshold", "20", "--mirrorMask",
               "--computeZGapOnTheFly"])
    assert rc == 0
    matches = reader.read_matches_by_mask(DataSourceParam(mip_ids=["em-12191"]))
    by_target = {m.matched_image.mip_id: m for m in matches}
    assert by_target["lm-0"].gradient_area_gap == 21365
    assert by_target["lm-1"].gradient_area_gap == 33884
    assert by_target["lm-2"].gradient_area_gap == 40696
    assert by_target["lm-0"].normalized_score == pytest.approx(100.0)

    rc = main(["normalizeGradientScores", "--db", db])
    assert rc == 0
    matches = reader.read_matches_by_mask(DataSourceParam(mip_ids=["em-12191"]))
    by_target = {m.matched_image.mip_id: m for m in matches}
    assert by_target["lm-0"].normalized_score == pytest.approx(100.0)
