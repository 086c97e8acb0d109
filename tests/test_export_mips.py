"""exportData MIPs types + validation behavior."""

import json

from colormipsearch_tpu.cmd.main import main
from colormipsearch_tpu.dataio import JSONCDMIPsWriter
from colormipsearch_tpu.model import EMNeuronEntity, FileType


def test_export_mips_and_validation(tmp_path):
    good = EMNeuronEntity(entity_id=1, mip_id="m1", library_name="flyem_x",
                          alignment_space="JRC", published_name="101",
                          neuron_type="PFL1")
    good.files[FileType.CDM] = "https://example/101-CDM.png"
    good2 = EMNeuronEntity(entity_id=2, mip_id="m2", library_name="flyem_x",
                           alignment_space="JRC", published_name="101")
    mips = tmp_path / "mips.json"
    w = JSONCDMIPsWriter(str(mips))
    w.open()
    w.write([good, good2])
    w.close()

    out = tmp_path / "export"
    rc = main(["exportData", "--exported-result-type", "EM_MIPS",
               "--mips-file", str(mips), "-od", str(out)])
    assert rc == 0
    doc = json.loads((out / "101.json").read_text())
    assert len(doc["results"]) == 2
    meta = doc["results"][0]
    assert meta["type"] == "EMImage"
    assert meta["neuronType"] == "PFL1"
    assert meta["files"]["CDM"].endswith("CDM.png")


def test_url_transformer_semantics():
    """URLTransformer.java:52-99 behavior: http URLs relativized from the
    configured component, non-http only with the flag, short URLs and
    negative index left as-is, blank -> empty."""
    from colormipsearch_tpu.cmd.dataexport import (URLTransformer,
                                                   URLTransformerParams)
    t = URLTransformer(2, {
        "VisuallyLosslessStack": URLTransformerParams(1, True),
        "CDM": URLTransformerParams(-1, False),
    })
    url = "https://s3.amazonaws.com/janelia-flylight/JRC2018/stacks/a b.png"
    # default: drop the first 2 path components (bucket/space)
    assert t.relativize_url("CDMThumbnail", url) == "stacks/a+b.png"
    # per-type override index 1 + nonhttp
    assert t.relativize_url("VisuallyLosslessStack",
                            "local/path/stack.h5j") == "path/stack.h5j"
    # per-type keep-absolute
    assert t.relativize_url("CDM", url) == url
    # non-http without the flag: unchanged
    assert t.relativize_url("CDMThumbnail", "plain/path.png") == "plain/path.png"
    # fewer components than index: unchanged (with warning)
    assert t.relativize_url("CDMThumbnail", "https://x.com/one.png") == \
        "https://x.com/one.png"
    assert t.relativize_url("CDMThumbnail", "  ") == ""


def test_image_store_mapping_fallbacks():
    from colormipsearch_tpu.cmd.dataexport import parse_image_store_mapping
    m = parse_image_store_mapping("fl_light", [
        "JRC2018_Unisex_20x_HR:flyem_hemibrain=em_store",
        "JRC2018_VNC_Unisex_40x_DS=vnc_store",
    ])
    assert m.get_image_store("JRC2018_Unisex_20x_HR", "flyem_hemibrain") == "em_store"
    # alignment-space fallback
    assert m.get_image_store("JRC2018_VNC_Unisex_40x_DS", "any_lib") == "vnc_store"
    # default fallback
    assert m.get_image_store("JRC2018_Unisex_20x_HR", "other_lib") == "fl_light"


def test_export_applies_store_and_urls(tmp_path):
    """exportData end-to-end: files URLs relativized, store key set."""
    from colormipsearch_tpu.cmd.exportdata_cmd import (neuron_metadata,
                                                       build_transformers)
    import argparse
    from colormipsearch_tpu.model import EMNeuronEntity, FileType
    e = EMNeuronEntity(entity_id=7, mip_id="m7",
                       alignment_space="JRC2018_Unisex_20x_HR",
                       library_name="flyem_hemibrain", published_name="7")
    e.files[FileType.CDMThumbnail] = \
        "https://s3.amazonaws.com/janelia-flylight/JRC2018/thumb/7.jpg"
    args = argparse.Namespace(
        default_relative_url_index=2,
        relative_url_indexes_by_filetype=[],
        default_image_store="fl_light",
        image_stores_per_neuron_meta=[
            "JRC2018_Unisex_20x_HR:flyem_hemibrain=em_store"])
    url_t, store_m, _, _ = build_transformers(args)
    d = neuron_metadata(e, url_t, store_m)
    assert d["files"]["store"] == "em_store"
    assert d["files"]["CDMThumbnail"] == "thumb/7.jpg"


def test_published_urls_merge(tmp_path):
    """Uploaded published URLs merge into files (CDM/thumbnail both
    kinds; skeleton uploads EM-only), then relativize."""
    import json
    from colormipsearch_tpu.cmd.dataexport import (apply_published_urls,
                                                   load_published_urls)
    f = tmp_path / "urls.json"
    json.dump([{"id": 42, "uploaded": {
        "cdm": "https://s3.amazonaws.com/nb/JRC2018/cdm/42.png",
        "cdm_thumbnail": "https://s3.amazonaws.com/nb/JRC2018/thumb/42.jpg",
        "skeletonswc": "https://s3.amazonaws.com/nb/JRC2018/swc/42.swc"}}],
        open(f, "w"))
    urls = load_published_urls(str(f))
    em_files = apply_published_urls({}, urls["42"], is_em=True)
    assert em_files["CDM"].endswith("cdm/42.png")
    assert em_files["AlignedBodySWC"].endswith("42.swc")
    lm_files = apply_published_urls({}, urls["42"], is_em=False)
    assert "AlignedBodySWC" not in lm_files
    assert lm_files["CDMThumbnail"].endswith("thumb/42.jpg")


def test_published_lm_stacks(tmp_path):
    import json
    from colormipsearch_tpu.cmd.exportdata_cmd import neuron_metadata
    from colormipsearch_tpu.cmd.dataexport import load_published_lm_stacks
    from colormipsearch_tpu.model import LMNeuronEntity, EMNeuronEntity
    f = tmp_path / "stacks.json"
    json.dump([{"slideCode": "20200101_31_A1", "files": {
        "VisuallyLosslessStack": "https://s3/x/stack.h5j",
        "Gal4Expression": "https://s3/x/gal4.png"}}], open(f, "w"))
    stacks = load_published_lm_stacks(str(f))
    lm = LMNeuronEntity(mip_id="lm-9", slide_code="20200101_31_A1",
                        alignment_space="a", library_name="l",
                        published_name="p")
    d = neuron_metadata(lm, published_lm_stacks=stacks)
    assert d["files"]["VisuallyLosslessStack"] == "https://s3/x/stack.h5j"
    assert d["files"]["Gal4Expression"] == "https://s3/x/gal4.png"
    # EM neurons never get LM stacks
    em = EMNeuronEntity(mip_id="em-9", alignment_space="a",
                        library_name="l", published_name="p")
    d2 = neuron_metadata(em, published_lm_stacks=stacks)
    assert "files" not in d2 or "VisuallyLosslessStack" not in d2["files"]
