"""copyToMipsStore canonical renames (CopyToMIPsStore.java:199-268):
LM variants get the slideCode-objective-area-space-sampleRef-CHn_CDM
name; the copied store re-imports by naming convention."""

import json
import os

from colormipsearch_tpu.cmd.main import main
from colormipsearch_tpu.dataio import (DataSourceParam, JSONCDMIPsReader,
                                       JSONCDMIPsWriter)
from colormipsearch_tpu.model import (ComputeFileType, FileData, Gender,
                                      LMNeuronEntity)


def _lm_entity(tmp_path, fixtures_dir):
    # a source CDM named by the full convention (incl. the sample ref,
    # like the BJD fixture's name)
    src = tmp_path / ("VT033614_127B01_AE_01-20171124_64_H6-40x-Brain-"
                      "JRC2018_Unisex_20x_HR-2483089192251293794-"
                      "CH2_CDM.tif")
    src.write_bytes((fixtures_dir / "lms" /
                     "VT033614_127B01_AE_01-20171124_64_H6-f-CH2_01.tif"
                     ).read_bytes())
    lm = LMNeuronEntity(
        entity_id=42, mip_id="lm-42",
        alignment_space="JRC2018_Unisex_20x_HR",
        library_name="flylight_test",
        published_name="VT033614",
        internal_line_name="VT033614_127B01_AE_01",
        slide_code="20171124_64_H6", objective="40x",
        anatomical_area="Brain", gender=Gender.f,
        source_ref_id="Sample#2483089192251293794")
    lm.compute_files[ComputeFileType.SourceColorDepthImage] = \
        FileData.from_string(str(src))
    # a segmented searchable variant named by the reference convention
    seg = tmp_path / ("VT033614_127B01_AE_01-20171124_64_H6-40x-Brain-"
                      "JRC2018_Unisex_20x_HR-2483089192251293794-"
                      "CH2__1.tif")
    seg.write_bytes(src.read_bytes())
    lm.compute_files[ComputeFileType.InputColorDepthImage] = \
        FileData.from_string(str(seg))
    return lm


def test_lm_canonical_rename_and_reimport(tmp_path, fixtures_dir):
    lm = _lm_entity(tmp_path, fixtures_dir)
    mips_file = tmp_path / "mips.json"
    w = JSONCDMIPsWriter(str(mips_file))
    w.open()
    w.write([lm])
    w.close()

    store = tmp_path / "store"
    rc = main(["copyToMipsStore", "--mips-file", str(mips_file),
               "--target-folder", str(store), "--update-mips"])
    assert rc == 0

    # the source CDM keeps the _CDM canonical name in the store root
    root_files = os.listdir(store)
    expected_cdm = ("VT033614_127B01_AE_01-20171124_64_H6-40x-Brain-"
                    "JRC2018_Unisex_20x_HR-2483089192251293794-"
                    "CH2_CDM.tif")
    assert expected_cdm in root_files
    # the segmented variant carries its segment index
    seg_files = os.listdir(store / "searchable_neurons")
    expected_seg = ("VT033614_127B01_AE_01-20171124_64_H6-40x-Brain-"
                    "JRC2018_Unisex_20x_HR-2483089192251293794-"
                    "CH2-1_CDM.tif")
    assert seg_files == [expected_seg]

    # the rewritten MIP JSON points into the store
    mips = JSONCDMIPsReader(str(mips_file)).read_mips(DataSourceParam())
    assert mips[0].compute_files[
        ComputeFileType.SourceColorDepthImage].file_name.endswith(
            expected_cdm)

    # and the copied store re-imports by naming convention: slide code,
    # objective and channel are all recoverable from the new name
    out = tmp_path / "reimport"
    rc = main(["createColorDepthSearchDataInput", "--library",
               "flylight_reimport", "--cdm-location", str(store),
               "-od", str(out)])
    assert rc == 0
    doc = json.load(open(out / "flylight_reimport.json"))
    rows = doc if isinstance(doc, list) else doc["results"]
    by_slide = {r.get("slideCode"): r for r in rows}
    assert "20171124_64_H6" in by_slide


def test_missing_segment_index_errors_unless_ignored(tmp_path,
                                                     fixtures_dir):
    lm = _lm_entity(tmp_path, fixtures_dir)
    # variant WITHOUT the __<n> segment index
    bad = tmp_path / ("VT033614_127B01_AE_01-20171124_64_H6-40x-Brain-"
                      "JRC2018_Unisex_20x_HR-2483089192251293794-"
                      "CH2.tif")
    bad.write_bytes(b"x")
    lm.compute_files[ComputeFileType.InputColorDepthImage] = \
        FileData.from_string(str(bad))
    mips_file = tmp_path / "mips.json"
    w = JSONCDMIPsWriter(str(mips_file))
    w.open()
    w.write([lm])
    w.close()

    store = tmp_path / "store"
    rc = main(["copyToMipsStore", "--mips-file", str(mips_file),
               "--target-folder", str(store)])
    assert rc == 0
    assert not (store / "searchable_neurons").exists()

    rc = main(["copyToMipsStore", "--mips-file", str(mips_file),
               "--target-folder", str(store),
               "--lmIgnoreMissingSegmentation", "-f"])
    assert rc == 0
    assert os.listdir(store / "searchable_neurons")
