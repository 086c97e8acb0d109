"""Telemetry helpers and the packed array cache."""

import logging

import numpy as np

from colormipsearch_tpu.imageproc.store import PackedArrayStore
from colormipsearch_tpu.model import FileData
from colormipsearch_tpu.utils import StageTimer, log_memory_usage, processing_context
from colormipsearch_tpu.utils.telemetry import current_context


def test_processing_context_nesting():
    assert current_context() == {}
    with processing_context(maskId="m1"):
        assert current_context() == {"maskId": "m1"}
        with processing_context(targetId="t1"):
            assert current_context() == {"maskId": "m1", "targetId": "t1"}
        assert current_context() == {"maskId": "m1"}
    assert current_context() == {}


def test_stage_timer_and_memory(caplog):
    with caplog.at_level(logging.INFO, "colormipsearch_tpu.telemetry"):
        with StageTimer("unit-test-stage", total_items=2) as t:
            t.add_items(2)
    assert any("unit-test-stage" in r.message for r in caplog.records)
    assert log_memory_usage("test") > 0


def test_packed_array_store_roundtrip(tmp_path, fixtures_dir):
    store = PackedArrayStore(str(tmp_path / "cache"))
    fd = FileData.from_string(str(fixtures_dir / "ems" / "12191_JRC2018U.tif"))
    img1 = store.load(fd)
    assert img1 is not None
    # second load comes from the .npy cache (memory-mapped)
    img2 = store.load(fd)
    np.testing.assert_array_equal(np.asarray(img1.pixels),
                                  np.asarray(img2.pixels))
    assert len(list((tmp_path / "cache").glob("*.npy"))) == 1
    assert store.load(None) is None
    assert store.load(FileData.from_string("/nonexistent/file.tif")) is None


def test_mips_cache_byte_budget(tmp_path, fixtures_dir):
    """MIPsCache evicts by decoded BYTES as well as entry count (the r5
    OOM postmortem: an entry-count-only bound is a ~200 GB license at
    production frame sizes)."""
    from colormipsearch_tpu.mips import MIPsCache
    from colormipsearch_tpu.model import ComputeFileType, EMNeuronEntity
    from colormipsearch_tpu.model.filedata import FileData

    src = fixtures_dir / "ems" / "12191_JRC2018U.tif"
    one = None
    cache = MIPsCache(max_size=100, max_bytes=1 << 62)
    e0 = EMNeuronEntity(entity_id=1, mip_id="m1")
    e0.compute_files[ComputeFileType.InputColorDepthImage] = \
        FileData.from_string(str(src))
    one = cache.load_mip(e0, ComputeFileType.InputColorDepthImage)
    nbytes = one.image.pixels.nbytes
    # budget for ~2.5 images: the 4th insert must evict the oldest
    cache = MIPsCache(max_size=100, max_bytes=int(nbytes * 2.5))
    for i in range(4):
        e = EMNeuronEntity(entity_id=10 + i, mip_id=f"m{i}")
        e.compute_files[ComputeFileType.InputColorDepthImage] = \
            FileData.from_string(str(src))
        cache.load_mip(e, ComputeFileType.InputColorDepthImage)
    assert len(cache._cache) == 2          # 3rd insert evicted to <= 2.5
    assert cache._nbytes <= int(nbytes * 2.5)
    # eviction keeps the MOST recent entries
    assert (13, ComputeFileType.InputColorDepthImage) in cache._cache
    cache.clear()
    assert cache._nbytes == 0
