"""Config and ID generator tests (TimebasedIdGeneratorTest analogue)."""

import os

from colormipsearch_tpu.persist import Config, TimebasedIdGenerator
from colormipsearch_tpu.persist.config import _parse_properties


def test_id_generator_unique_and_monotonic():
    gen = TimebasedIdGenerator(deployment_context=3)
    ids = gen.generate_ids(5000)
    assert len(set(ids)) == 5000
    assert ids == sorted(ids)
    # deployment context and ip octet embedded in the low bits
    assert all(((i >> 8) & 0xF) == 3 for i in ids)


def test_id_generator_file_lock(tmp_path):
    gen = TimebasedIdGenerator(lock_file=str(tmp_path / "ids.lock"))
    ids = gen.generate_ids(10)
    assert len(set(ids)) == 10


def test_config_layers(tmp_path, monkeypatch):
    cfg_file = tmp_path / "nbdb.properties"
    cfg_file.write_text("""
# comment
MongoDB.ConnectionURL=mongodb://localhost
Memory.LowPercThreshold: 0.2
""")
    monkeypatch.setenv("CMS_Memory_LowPercThreshold", "0.3")
    cfg = Config.from_file(str(cfg_file))
    assert cfg.get("MongoDB.ConnectionURL") == "mongodb://localhost"
    # env override wins over the file
    assert cfg.get_float("Memory.LowPercThreshold") == 0.3
    assert cfg.get_int("TimebasedId.DeploymentContext") == 0


def test_properties_parsing():
    props = _parse_properties("a=1\n!skip\n b : two \n\nbad_line\n")
    assert props == {"a": "1", "b": "two"}
