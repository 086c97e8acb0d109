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
