"""Smoke tests for the auxiliary CLI commands."""

import json
import os
import pathlib

import pytest

from colormipsearch_tpu.cmd.main import main
from colormipsearch_tpu.dataio import JSONCDMIPsReader, DataSourceParam
from colormipsearch_tpu.ppp import read_raw_ppp_matches

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def test_raw_ppp_reader():
    """RawPPPMatchesReaderTest analogue on the reference fixture."""
    path = FIXTURES / "cov_scores_1599747200-PFNp_c-RT_18U.json"
    matches = list(read_raw_ppp_matches(str(path)))
    assert len(matches) > 0
    m = matches[0]
    assert m.source_em_name == "1599747200-PFNp_c-RT_18U"
    assert m.cov_score is not None
    assert m.skeleton_matches
    only_best = list(read_raw_ppp_matches(str(path), only_best_matches=True))
    assert len(only_best) == len(matches)
    assert len(only_best[0].skeleton_matches) <= len(m.skeleton_matches)


def test_import_ppp_cmd(tmp_path):
    rd = tmp_path / "ppp"
    rd.mkdir()
    for f in FIXTURES.glob("cov_scores_*.json"):
        (rd / f.name).write_text(f.read_text())
    out = tmp_path / "out"
    rc = main(["importPPPResults", "-rd", str(rd), "-od", str(out)])
    assert rc == 0
    files = list(out.glob("*.json"))
    assert len(files) == 2
    doc = json.loads(files[0].read_text())
    assert doc["results"]
    assert doc["results"][0]["class"].endswith("PPPMatchEntity")


def test_create_data_input_cmd(tmp_path, fixtures_dir):
    out = tmp_path / "mips"
    rc = main(["createColorDepthSearchDataInput",
               "--library", "flyem_test",
               "--cdm-location", str(fixtures_dir / "ems"),
               "--variant", f"grad:{fixtures_dir / 'grad'}",
               "-od", str(out)])
    assert rc == 0
    mips = JSONCDMIPsReader(str(out / "flyem_test.json")).read_mips(DataSourceParam())
    assert len(mips) == 3
    names = {m.published_name for m in mips}
    assert "12191" in names
    assert "1752016801" in names


def test_tag_and_validate_cmds(tmp_path, fixtures_dir):
    out = tmp_path / "mips"
    main(["createColorDepthSearchDataInput", "--library", "flyem_test",
          "--cdm-location", str(fixtures_dir / "ems"), "-od", str(out)])
    mips_file = str(out / "flyem_test.json")
    rc = main(["tag", "--mips-file", mips_file, "--tag", "round1",
               "--names", "12191"])
    assert rc == 0
    mips = JSONCDMIPsReader(mips_file).read_mips(DataSourceParam())
    tagged = [m for m in mips if "round1" in m.tags]
    assert {m.published_name for m in tagged} == {"12191"}

    report = tmp_path / "errors.json"
    rc = main(["validateDBData", "--mips-file", mips_file,
               "--no-grad-files-check",
               "--check-file-existence", "--error-report", str(report)])
    assert rc == 0  # all fixture files exist

    # default mode checks the FULL compute-file matrix incl. gradient
    # inputs (ValidateNBDBDataCmd.java:310-315) — these MIPs have none
    rc = main(["validateDBData", "--mips-file", mips_file,
               "--error-report", str(report)])
    assert rc == 1
    import json as _json
    errs = {e["error"] for e in _json.load(open(report))}
    assert any("GradientImage" in e for e in errs)
    assert any("ZGapImage" in e for e in errs)


def test_copy_to_mips_store_cmd(tmp_path, fixtures_dir):
    out = tmp_path / "mips"
    main(["createColorDepthSearchDataInput", "--library", "flyem_test",
          "--cdm-location", str(fixtures_dir / "ems"), "-od", str(out)])
    store = tmp_path / "store"
    rc = main(["copyToMipsStore", "--mips-file", str(out / "flyem_test.json"),
               "--target-folder", str(store), "--update-mips"])
    assert rc == 0
    copied = list(store.rglob("*.tif"))
    assert len(copied) >= 3


def test_ppp_db_roundtrip(tmp_path):
    """importPPPResults --db (with screenshots) -> DB pppMatches +
    pppmURL store -> full-pipeline exportData
    (EMPPPMatchesExporter.java:84-252)."""
    import json
    import shutil
    from colormipsearch_tpu.cmd.main import main
    rd = tmp_path / "ppp" / "00"
    rd.mkdir(parents=True)
    for f in FIXTURES.glob("cov_scores_*.json"):
        shutil.copy(f, rd)
    # screenshots for the top matches of both EM bodies (suffix-typed,
    # PPPScreenshotType.findScreenshotType)
    shots = tmp_path / "screenshots"
    shots.mkdir()
    pairs = [("1599747200-PFNp_c-RT_18U",
              "BJD_100A01_AE_01-20170929_62_B1_REG_UNISEX_40x"),
             ("484130600-SMP145-RT_18U",
              "BJD_105A09_AE_01-20180112_62_A2_REG_UNISEX_40x")]
    for em, lm in pairs:
        for sfx in ("_1_raw.png", "_5_ch.png"):
            (shots / f"{em}-{lm}{sfx}").write_bytes(b"png")
    db = str(tmp_path / "nb.db")
    rc = main(["importPPPResults", "-rd", str(tmp_path / "ppp"),
               "-od", str(tmp_path / "ppp_json"), "--db", db,
               "--screenshots-dir", str(shots)])
    assert rc == 0
    # re-import is idempotent (natural-key upserts keep entity ids)
    rc = main(["importPPPResults", "-rd", str(tmp_path / "ppp"),
               "-od", str(tmp_path / "ppp_json2"), "--db", db,
               "--screenshots-dir", str(shots)])
    assert rc == 0
    from colormipsearch_tpu.cmd.backends import get_store
    store = get_store(db)
    ems = store.list_ppp_em_names()
    assert len(ems) == 2
    first = store.find_ppp_matches_by_em(ems[0])
    assert first and first[0].cov_score is not None
    assert sum(1 for m in first if m.has_source_image_files) == 1

    # published data: pppmURL docs (natural-pair keyed fixture) +
    # LM samples for the screenshot matches
    urls = tmp_path / "pppm_urls.json"
    urls.write_text(json.dumps(
        [{"id": f"{em}-{lm}",
          "uploadedFiles": {"RAW": f"https://s3/ppp/{em}-{lm}_raw.png",
                            "CH": f"https://s3/ppp/{em}-{lm}_ch.png"},
          "uploadedThumbnails": {
              "CH": f"https://s3/ppp/{em}-{lm}_ch.jpg"}}
         for em, lm in pairs]))
    samples = tmp_path / "samples.json"
    samples.write_text(json.dumps(
        [{"_id": "101", "name": "BJD_100A01_AE_01-20170929_62_B1",
          "publishingName": "BJD_100A01", "slideCode": "20170929_62_B1",
          "gender": "f"},
         {"_id": "102", "name": "BJD_105A09_AE_01-20180112_62_A2",
          "publishingName": "BJD_105A09", "slideCode": "20180112_62_A2",
          "gender": "m"}]))

    out = tmp_path / "ppp_export"
    rc = main(["exportData", "--exported-result-type", "EM_PPP_MATCHES",
               "--db", db, "-od", str(out),
               "--pppm-urls", str(urls),
               "--jacs-samples-file", str(samples)])
    assert rc == 0
    docs = sorted(out.glob("*.json"))
    # one file per EM body, named by publishedName (no EM body ref in
    # the raw PPP fixtures)
    assert [p.name for p in docs] == ["1599747200.json", "484130600.json"]
    d = json.load(open(docs[0]))
    assert d["inputImage"]["publishedName"] == "1599747200"
    # only the screenshot+URL-backed match exports, as PPPMatchedTarget
    assert len(d["results"]) == 1
    r = d["results"][0]
    assert r["type"] == "PPPMatch"
    assert "pppmRank" in r and "pppmScore" in r
    assert r["image"]["publishedName"] == "BJD_100A01"
    assert r["files"]["SignalMip"].endswith("_raw.png")
    assert r["files"]["CDMBest"].endswith("_ch.png")
    assert r["files"]["CDMBestThumbnail"].endswith("_ch.jpg")
