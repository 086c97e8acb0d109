"""EM PPP matches export parity (EMPPPMatchesExporter.java:84-276).

Covers the full pipeline the reference runs per EM mask: filter matches
without source screenshots (:119-121), group by mask publishedName with
rank ordering (:131-141), enrich targets from LM samples + published LM
images (:160-169, :205-259) and the per-match pppmURL store (:177-182,
:235-250), convert to PPPMatchedTarget DTOs with screenshot FileTypes,
relativize URLs, map image stores, cap same-published-name matches
(:184-200), and write grouped results keyed by EmRefId (:150-151) — on
both the SQLite and Mongo(-fake) backends.
"""

import json

import pytest

from colormipsearch_tpu.cmd.main import main
from colormipsearch_tpu.model import (EMNeuronEntity, LMNeuronEntity,
                                      PPPMatchEntity, PPPScreenshotType)

EM_NAME = "1599747200-PFNp_c-RT_18U"
ALIGNMENT_SPACE = "JRC2018_Unisex_20x_HR"

LM_A = "BJD_115G11_AE_01-20190507_62_F1_REG_UNISEX_40x"
LM_B = "BJD_106H09_AE_01-20170804_62_I6_REG_UNISEX_40x"
LM_C = "GMR_26E01_AE_01-20181002_63_G2_REG_UNISEX_40x"  # no screenshots
LM_D = "BJD_115G11_AE_01-20190508_61_B2_REG_UNISEX_40x"  # same line as A

SAMPLE_DOCS = [
    {"_id": "2345", "name": "BJD_115G11_AE_01-20190507_62_F1",
     "line": "BJD_115G11_AE_01", "publishingName": "BJD_115G11",
     "slideCode": "20190507_62_F1", "gender": "f",
     "mountingProtocol": "DPX PBS Mounting"},
    {"_id": "2346", "name": "BJD_106H09_AE_01-20170804_62_I6",
     "line": "BJD_106H09_AE_01", "publishingName": "BJD_106H09",
     "slideCode": "20170804_62_I6", "gender": "m"},
    {"_id": "2348", "name": "BJD_115G11_AE_01-20190508_61_B2",
     "line": "BJD_115G11_AE_01", "publishingName": "BJD_115G11",
     "slideCode": "20190508_61_B2", "gender": "f"},
]

LM_IMAGE_DOCS = [
    {"sampleRef": "Sample#2345", "slideCode": "20190507_62_F1",
     "objective": "40x", "alignmentSpace": ALIGNMENT_SPACE,
     "files": {"VisuallyLosslessStack":
               "https://s3/pub/stacks/BJD_115G11-20190507.h5j"}},
    # alias-space image: only matches when the alias is configured
    {"sampleRef": "Sample#2346", "slideCode": "20170804_62_I6",
     "objective": "40x", "alignmentSpace": "JRC2018_Unisex_HR",
     "files": {"VisuallyLosslessStack":
               "https://s3/pub/stacks/BJD_106H09-20170804.h5j"}},
    {"sampleRef": "Sample#2348", "slideCode": "20190508_61_B2",
     "objective": "40x", "alignmentSpace": ALIGNMENT_SPACE,
     "files": {"VisuallyLosslessStack":
               "https://s3/pub/stacks/BJD_115G11-20190508.h5j"}},
]


def _screenshots(lm_name):
    prefix = f"{EM_NAME}-{lm_name}"
    return [f"{prefix}_1_raw.png", f"{prefix}_5_ch.png"]


def _pppm_urls_doc(key, lm_name):
    prefix = f"{EM_NAME}-{lm_name}"
    return {"_id": key,
            "uploadedFiles": {
                "RAW": f"https://s3/ppp/{prefix}_raw.png",
                "CH": f"https://s3/ppp/{prefix}_ch.png"},
            "uploadedThumbnails": {
                "CH": f"https://s3/ppp/thumbs/{prefix}_ch.jpg"}}


def _build_matches():
    em = EMNeuronEntity(published_name="1599747200",
                        library_name="flyem_hemibrain_1_2_1",
                        alignment_space=ALIGNMENT_SPACE,
                        source_ref_id="EMBody#2941323")
    matches = []
    for i, (lm_name, rank, cov, shots) in enumerate(
            ((LM_A, 0.0, -140.73, True),
             (LM_B, 1.0, -142.24, True),
             (LM_C, 2.0, -130.0, False),      # filtered: no screenshots
             (LM_D, 3.0, -120.5, True))):
        lm = LMNeuronEntity(published_name=lm_name.split("-")[0],
                            library_name="flylight_split_gal4_published",
                            alignment_space=ALIGNMENT_SPACE)
        m = PPPMatchEntity(source_em_name=EM_NAME,
                           source_em_library="flyem_hemibrain_1_2_1",
                           source_lm_name=lm_name,
                           source_lm_library="flylight_split_gal4_published",
                           cov_score=cov, aggregate_coverage=93.4 - i,
                           rank=rank, mirrored=(i == 0))
        m.mask_image, m.matched_image = em, lm
        if shots:
            for name in _screenshots(lm_name):
                m.add_source_image_file(name)
        matches.append(m)
    return matches


def test_screenshot_type_mapping():
    """PPPScreenshotType suffix classification
    (model/PPPScreenshotType.java:21-27)."""
    assert PPPScreenshotType.find_screenshot_type("x_1_raw.png") \
        is PPPScreenshotType.RAW
    assert PPPScreenshotType.find_screenshot_type("x_2_masked_raw.png") \
        is PPPScreenshotType.MASKED_RAW
    assert PPPScreenshotType.find_screenshot_type("x_3_skel.png") \
        is PPPScreenshotType.SKEL
    assert PPPScreenshotType.find_screenshot_type("x_5_ch.png") \
        is PPPScreenshotType.CH
    assert PPPScreenshotType.find_screenshot_type("x_6_ch_skel.png") \
        is PPPScreenshotType.CH_SKEL
    assert PPPScreenshotType.find_screenshot_type("x.tif") is None
    assert PPPScreenshotType.CH.has_thumbnail
    assert not PPPScreenshotType.RAW.has_thumbnail


def test_lm_sample_name_and_objective_parse():
    """PPPMatchEntity.extractLMSampleName / updateLMSampleInfo
    (:189-216): strip _REG_UNISEX_<objective>, default 40x."""
    m = PPPMatchEntity(source_lm_name=LM_A)
    assert m.extract_lm_sample_name() == "BJD_115G11_AE_01-20190507_62_F1"
    assert m.source_objective() == "40x"
    m2 = PPPMatchEntity(source_lm_name="LINE-SLIDE_REG_UNISEX_63x")
    assert m2.source_objective() == "63x"
    m3 = PPPMatchEntity(source_lm_name="plainname")
    assert m3.extract_lm_sample_name() == "plainname"
    assert m3.source_objective() == "40x"
    m4 = PPPMatchEntity(source_lm_name="LINE_REG_UNISEX_VNC")
    # non-objective suffix falls back to the default
    assert m4.source_objective() == "40x"


def _seed_store(store):
    matches = _build_matches()
    assert store.upsert_ppp_matches(matches) == 4
    # pppmURL records keyed by the (now assigned) match entity ids;
    # LM_D intentionally has screenshots but NO published URLs
    url_docs = [_pppm_urls_doc(m.entity_id, m.source_lm_name)
                for m in matches if m.source_lm_name in (LM_A, LM_B)]
    assert store.upsert_pppm_urls(url_docs) == 2
    store.upsert_published_lm_images(LM_IMAGE_DOCS)
    return matches


@pytest.fixture(params=["sqlite", "mongo"])
def ppp_db(request, tmp_path):
    from colormipsearch_tpu.cmd import backends
    if request.param == "sqlite":
        db = str(tmp_path / "ppp.db")
        store = backends.get_store(db)
    else:
        from tests.test_db_mongo import make_store
        db = "mongodb://ppp-test/neuronbridge"
        store = make_store()
        backends._stores[db] = store
    yield db, store
    backends._stores.pop(db, None)


def test_ppp_export_full_pipeline(tmp_path, ppp_db):
    db, store = ppp_db
    _seed_store(store)
    samples = tmp_path / "samples.json"
    samples.write_text(json.dumps(SAMPLE_DOCS))
    out = tmp_path / "out"
    rc = main(["exportData", "--exported-result-type", "EM_PPP_MATCHES",
               "--db", db, "-od", str(out),
               "--jacs-samples-file", str(samples),
               "--published-alignment-space-alias",
               f"{ALIGNMENT_SPACE}=JRC2018_Unisex_HR",
               "--default-relative-url-index", "1",
               "--default-image-store", "fl:open_data:brain"])
    assert rc == 0
    files = sorted(out.glob("*.json"))
    # one file, named by the EM body ref id (EmRefId keying, :150-151)
    assert [f.name for f in files] == ["2941323.json"]
    doc = json.loads(files[0].read_text())
    em = doc["inputImage"]
    assert em["publishedName"] == "1599747200"
    assert em["type"] == "EMImage"
    assert "emRefId" not in em          # @JsonIgnore field
    assert em["anatomicalArea"] == "Brain"
    assert em["files"]["store"] == "fl:open_data:brain"
    # LM_C (no screenshots) and LM_D (no published URLs -> no match
    # files) are gone; rank ascending
    assert [r["pppmRank"] for r in doc["results"]] == [0.0, 1.0]
    r0, r1 = doc["results"]
    assert r0["type"] == "PPPMatch"
    assert r0["mirrored"] is True
    assert r0["pppmScore"] == 140     # int(abs(coverageScore))
    t0 = r0["image"]
    assert "mipId" not in t0          # LMPPPNeuronMetadata has no MIP id
    assert t0["id"] == "2345"         # sampleId serialized as "id"
    assert t0["publishedName"] == "BJD_115G11"
    assert t0["slideCode"] == "20190507_62_F1"
    assert t0["gender"] == "f"
    assert t0["mountingProtocol"] == "DPX PBS Mounting"
    assert t0["objective"] == "40x"
    assert t0["alignmentSpace"] == ALIGNMENT_SPACE
    assert t0["anatomicalArea"] == "Brain"
    # 3D stack from published LM images, relativized at index 1
    assert t0["files"]["VisuallyLosslessStack"] == \
        "stacks/BJD_115G11-20190507.h5j"
    assert t0["files"]["store"] == "fl:open_data:brain"
    # screenshot FileTypes from the pppmURL store: RAW -> SignalMip,
    # CH -> CDMBest (+thumbnail), relativized
    f0 = r0["files"]
    assert f0["SignalMip"] == f"{EM_NAME}-{LM_A}_raw.png"
    assert f0["CDMBest"] == f"{EM_NAME}-{LM_A}_ch.png"
    assert f0["CDMBestThumbnail"] == f"thumbs/{EM_NAME}-{LM_A}_ch.jpg"
    assert f0["store"] == "fl:open_data:brain"   # EM's store (:250)
    # alias-space published image resolved for LM_B
    assert r1["image"]["files"]["VisuallyLosslessStack"] == \
        "stacks/BJD_106H09-20170804.h5j"


def test_ppp_export_same_name_cap(tmp_path, ppp_db):
    """--max-matches-with-same-name-per-mip caps per target published
    name ordered by rank (:184-200)."""
    db, store = ppp_db
    matches = _seed_store(store)
    # give LM_D published URLs too so both BJD_115G11 matches survive
    store.upsert_pppm_urls(
        [_pppm_urls_doc(m.entity_id, m.source_lm_name)
         for m in matches if m.source_lm_name == LM_D])
    samples = tmp_path / "samples.json"
    samples.write_text(json.dumps(SAMPLE_DOCS))
    out = tmp_path / "uncapped"
    rc = main(["exportData", "--exported-result-type", "EM_PPP_MATCHES",
               "--db", db, "-od", str(out),
               "--jacs-samples-file", str(samples)])
    assert rc == 0
    doc = json.loads((out / "2941323.json").read_text())
    names = [r["image"]["publishedName"] for r in doc["results"]]
    assert names.count("BJD_115G11") == 2
    out2 = tmp_path / "capped"
    rc = main(["exportData", "--exported-result-type", "EM_PPP_MATCHES",
               "--db", db, "-od", str(out2),
               "--jacs-samples-file", str(samples),
               "--max-matches-with-same-name-per-mip", "1"])
    assert rc == 0
    doc2 = json.loads((out2 / "2941323.json").read_text())
    kept = [r for r in doc2["results"]
            if r["image"]["publishedName"] == "BJD_115G11"]
    assert len(kept) == 1 and kept[0]["pppmRank"] == 0.0


def test_ppp_export_missing_sample_drops_match(tmp_path, ppp_db):
    """Targets whose LM sample cannot be resolved export no match files
    and are filtered (:183, :256-258)."""
    db, store = ppp_db
    _seed_store(store)
    # samples fixture missing LM_B's sample
    samples = tmp_path / "samples.json"
    samples.write_text(json.dumps([SAMPLE_DOCS[0], SAMPLE_DOCS[2]]))
    out = tmp_path / "out"
    rc = main(["exportData", "--exported-result-type", "EM_PPP_MATCHES",
               "--db", db, "-od", str(out),
               "--jacs-samples-file", str(samples)])
    assert rc == 0
    doc = json.loads((out / "2941323.json").read_text())
    assert [r["pppmRank"] for r in doc["results"]] == [0.0]


def test_ppp_export_offline_fixtures_dir_source(tmp_path):
    """fs-backed export: per-mask JSON matches dir + offline PPPmURLs
    (natural-key) + offline published LM images, no store at all."""
    matches = _build_matches()
    mdir = tmp_path / "matches"
    mdir.mkdir()
    doc = {"inputImage": matches[0].mask_image.to_dict(),
           "results": [m.to_dict() for m in matches]}
    (mdir / f"{EM_NAME}.json").write_text(json.dumps(doc))
    samples = tmp_path / "samples.json"
    samples.write_text(json.dumps(SAMPLE_DOCS))
    urls = tmp_path / "pppm_urls.json"
    urls.write_text(json.dumps(
        [_pppm_urls_doc(f"{EM_NAME}-{n}", n) for n in (LM_A, LM_B)]))
    images = tmp_path / "lm_images.json"
    images.write_text(json.dumps(LM_IMAGE_DOCS))
    out = tmp_path / "out"
    rc = main(["exportData", "--exported-result-type", "EM_PPP_MATCHES",
               "-md", str(mdir), "-od", str(out),
               "--jacs-samples-file", str(samples),
               "--pppm-urls", str(urls),
               "--published-lm-images", str(images)])
    assert rc == 0
    doc = json.loads((out / "2941323.json").read_text())
    assert [r["pppmRank"] for r in doc["results"]] == [0.0, 1.0]
    assert doc["results"][0]["files"]["SignalMip"].startswith("https://")


def test_ppp_export_library_name_mapping(tmp_path, ppp_db):
    """internal->display library-name mapping applies to the EM mask
    and the PPP target (ExportData4NBCmd.java:67,264 via
    dataHelper.getLibraryName; updateTargetFromLMSample:221)."""
    db, store = ppp_db
    _seed_store(store)
    samples = tmp_path / "samples.json"
    samples.write_text(json.dumps(SAMPLE_DOCS))
    mapping = tmp_path / "libnames.json"
    mapping.write_text(json.dumps({
        "flyem_hemibrain_1_2_1": "FlyEM Hemibrain v1.2.1",
        "flylight_split_gal4_published": "FlyLight Split-GAL4 Drivers"}))
    out = tmp_path / "out"
    rc = main(["exportData", "--exported-result-type", "EM_PPP_MATCHES",
               "--db", db, "-od", str(out),
               "--jacs-samples-file", str(samples),
               "--library-name-mapping", str(mapping)])
    assert rc == 0
    doc = json.loads((out / "2941323.json").read_text())
    assert doc["inputImage"]["libraryName"] == "FlyEM Hemibrain v1.2.1"
    assert doc["results"][0]["image"]["libraryName"] == \
        "FlyLight Split-GAL4 Drivers"
