"""Failure-isolation behavior: bad images never kill a run
(the reference's per-pair error capture, AbstractColorMIPSearchProcessor
.java:80-83; here load failures are skipped at the batch boundary)."""

import json
import os

from colormipsearch_tpu.cmd.main import main
from colormipsearch_tpu.dataio import JSONCDMIPsWriter
from colormipsearch_tpu.model import (ComputeFileType, EMNeuronEntity,
                                      FileData, LMNeuronEntity)


def test_corrupt_and_missing_images_are_skipped(tmp_path, fixtures_dir):
    corrupt = tmp_path / "corrupt.tif"
    corrupt.write_bytes(b"not a tiff at all")

    em = EMNeuronEntity(entity_id=1, mip_id="em-ok", library_name="l",
                        alignment_space="JRC", published_name="1")
    em.compute_files[ComputeFileType.InputColorDepthImage] = \
        FileData.from_string(str(fixtures_dir / "ems" / "12191_JRC2018U.tif"))

    lm_ok = LMNeuronEntity(entity_id=2, mip_id="lm-ok", library_name="l",
                           alignment_space="JRC", published_name="a",
                           slide_code="s1")
    lm_ok.compute_files[ComputeFileType.InputColorDepthImage] = \
        FileData.from_string(str(
            fixtures_dir / "lms" /
            "VT033614_127B01_AE_01-20171124_64_H6-f-CH2_01.tif"))
    lm_missing = LMNeuronEntity(entity_id=3, mip_id="lm-missing",
                                library_name="l", alignment_space="JRC",
                                published_name="b", slide_code="s2")
    lm_missing.compute_files[ComputeFileType.InputColorDepthImage] = \
        FileData.from_string(str(tmp_path / "nope.tif"))
    lm_corrupt = LMNeuronEntity(entity_id=4, mip_id="lm-corrupt",
                                library_name="l", alignment_space="JRC",
                                published_name="c", slide_code="s3")
    lm_corrupt.compute_files[ComputeFileType.InputColorDepthImage] = \
        FileData.from_string(str(corrupt))

    ws = str(tmp_path)
    for fname, ents in (("masks.json", [em]),
                        ("targets.json", [lm_ok, lm_missing, lm_corrupt])):
        w = JSONCDMIPsWriter(os.path.join(ws, fname))
        w.open()
        w.write(ents)
        w.close()

    rc = main(["colorDepthSearch", "-m", os.path.join(ws, "masks.json"),
               "-i", os.path.join(ws, "targets.json"),
               "--maskThreshold", "20", "--dataThreshold", "20",
               "--pixColorFluctuation", "1", "--xyShift", "2",
               "--mirrorMask", "-od", os.path.join(ws, "out")])
    assert rc == 0
    with open(os.path.join(ws, "out", "masks", "em-ok.json")) as f:
        doc = json.load(f)
    rows = {r["image"]["mipId"]: r for r in doc["results"]}
    assert "matchingPixels" in rows["lm-ok"]
    # failed targets are PERSISTED as known-failed pairs with errors set
    # (AbstractColorMIPSearchProcessor.java:80-83), never silently lost
    assert rows["lm-missing"]["errors"]
    assert rows["lm-corrupt"]["errors"]
    assert not rows["lm-corrupt"].get("matchingPixels")


def test_mismatched_target_size_is_skipped(tmp_path, fixtures_dir):
    """A target whose CDM has different dimensions is skipped with a
    warning instead of crashing the whole partition stack."""
    import numpy as np
    from PIL import Image as PILImage
    small = tmp_path / "small.png"
    PILImage.fromarray(
        np.random.default_rng(0).integers(0, 255, (64, 64, 3),
                                          dtype=np.uint8).astype(np.uint8)
    ).save(small)

    em = EMNeuronEntity(entity_id=1, mip_id="em-ok", library_name="l",
                        alignment_space="JRC", published_name="1")
    em.compute_files[ComputeFileType.InputColorDepthImage] = \
        FileData.from_string(str(fixtures_dir / "ems" / "12191_JRC2018U.tif"))
    lm_ok = LMNeuronEntity(entity_id=2, mip_id="lm-ok", library_name="l",
                           alignment_space="JRC", published_name="a")
    lm_ok.compute_files[ComputeFileType.InputColorDepthImage] = \
        FileData.from_string(str(
            fixtures_dir / "lms" /
            "VT033614_127B01_AE_01-20171124_64_H6-f-CH2_01.tif"))
    lm_small = LMNeuronEntity(entity_id=3, mip_id="lm-small",
                              library_name="l", alignment_space="JRC",
                              published_name="b")
    lm_small.compute_files[ComputeFileType.InputColorDepthImage] = \
        FileData.from_string(str(small))

    ws = str(tmp_path)
    for fname, ents in (("masks.json", [em]),
                        ("targets.json", [lm_ok, lm_small])):
        w = JSONCDMIPsWriter(os.path.join(ws, fname))
        w.open()
        w.write(ents)
        w.close()

    rc = main(["colorDepthSearch", "-m", os.path.join(ws, "masks.json"),
               "-i", os.path.join(ws, "targets.json"),
               "--maskThreshold", "20", "--dataThreshold", "20",
               "--pixColorFluctuation", "1", "--xyShift", "2",
               "--mirrorMask", "-od", os.path.join(ws, "out")])
    assert rc == 0
    with open(os.path.join(ws, "out", "masks", "em-ok.json")) as f:
        doc = json.load(f)
    rows = {r["image"]["mipId"]: r for r in doc["results"]}
    assert set(rows) == {"lm-ok", "lm-small"}
    assert "matchingPixels" in rows["lm-ok"]
    assert "size" in rows["lm-small"]["errors"]
