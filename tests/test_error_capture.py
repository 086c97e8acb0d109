"""Per-pair error capture: a corrupt image mid-partition must not kill
or silently shrink the run — the failing pairs are persisted with
CDMatchEntity.errors set and every other pair scores normally
(AbstractColorMIPSearchProcessor.java:58-85,
LocalColorMIPSearchProcessor.java:106)."""

import json
import os
import shutil

from colormipsearch_tpu.cmd.main import main
from colormipsearch_tpu.dataio import JSONCDMIPsWriter
from colormipsearch_tpu.model import (ComputeFileType, EMNeuronEntity,
                                      FileData, LMNeuronEntity)

LM_NAMES = [
    "VT033614_127B01_AE_01-20171124_64_H6-f-CH2_01",
    "VT016795_115C08_AE_01-20200221_61_I2-m-CH1_01",
]


def _write_inputs(ws, fixtures_dir):
    em = EMNeuronEntity(entity_id=1001, mip_id="em-12191",
                        alignment_space="JRC2018_Unisex_20x_HR",
                        library_name="flyem_test", published_name="12191")
    em.compute_files[ComputeFileType.InputColorDepthImage] = \
        FileData.from_string(
            str(fixtures_dir / "ems" / "12191_JRC2018U.tif"))
    targets = []
    for i, name in enumerate(LM_NAMES):
        lm = LMNeuronEntity(entity_id=2001 + i, mip_id=f"lm-{i}",
                            alignment_space="JRC2018_Unisex_20x_HR",
                            library_name="flylight_test",
                            published_name=name.split("_")[0])
        lm.compute_files[ComputeFileType.InputColorDepthImage] = \
            FileData.from_string(str(fixtures_dir / "lms" / f"{name}.tif"))
        targets.append(lm)
    # target 2: a corrupt (truncated) TIFF in the middle of the partition
    bad = ws / "corrupt.tif"
    with open(fixtures_dir / "lms" / f"{LM_NAMES[0]}.tif", "rb") as f:
        head = f.read(512)
    bad.write_bytes(head)
    lm_bad = LMNeuronEntity(entity_id=2999, mip_id="lm-bad",
                            alignment_space="JRC2018_Unisex_20x_HR",
                            library_name="flylight_test",
                            published_name="corrupt")
    lm_bad.compute_files[ComputeFileType.InputColorDepthImage] = \
        FileData.from_string(str(bad))
    targets.insert(1, lm_bad)
    for fname, ents in (("masks.json", [em]), ("targets.json", targets)):
        w = JSONCDMIPsWriter(str(ws / fname))
        w.open()
        w.write(ents)
        w.close()


def test_corrupt_target_persists_error_and_scores_rest(tmp_path,
                                                       fixtures_dir):
    _write_inputs(tmp_path, fixtures_dir)
    db = str(tmp_path / "matches.db")
    rc = main(["colorDepthSearch",
               "-m", str(tmp_path / "masks.json"),
               "-i", str(tmp_path / "targets.json"),
               "--maskThreshold", "20", "--dataThreshold", "20",
               "--pixColorFluctuation", "1", "--xyShift", "2",
               "--mirrorMask", "--db", db])
    assert rc == 0

    from colormipsearch_tpu.cmd.backends import get_store
    from colormipsearch_tpu.dataio import DataSourceParam
    from colormipsearch_tpu.dataio.db import DBNeuronMatchesReader
    rows = DBNeuronMatchesReader(get_store(db)).read_matches_by_mask(
        DataSourceParam())
    by_target = {m.matched_image.mip_id: m for m in rows}
    # the good pairs scored with the golden values
    assert by_target["lm-0"].matching_pixels == 439
    assert by_target["lm-1"].matching_pixels == 426
    # the corrupt pair persisted as a known-failed pair
    bad = by_target["lm-bad"]
    assert bad.errors
    assert bad.match_found is False
    assert bad.matching_pixels in (None, 0)


def test_mis_sized_target_persists_error(tmp_path, fixtures_dir):
    _write_inputs(tmp_path, fixtures_dir)
    # replace the corrupt file with a VALID but mis-sized image
    from PIL import Image as PILImage
    PILImage.new("RGB", (64, 32), (90, 120, 30)).save(
        str(tmp_path / "corrupt.tif"))
    out = str(tmp_path / "out")
    rc = main(["colorDepthSearch",
               "-m", str(tmp_path / "masks.json"),
               "-i", str(tmp_path / "targets.json"),
               "--maskThreshold", "20", "--dataThreshold", "20",
               "--pixColorFluctuation", "1", "--xyShift", "2",
               "--mirrorMask", "-od", out])
    assert rc == 0
    with open(os.path.join(out, "masks", "em-12191.json")) as f:
        doc = json.load(f)
    rows = {r["image"]["mipId"]: r for r in doc["results"]}
    assert rows["lm-0"]["matchingPixels"] == 439
    assert "size" in rows["lm-bad"]["errors"]
