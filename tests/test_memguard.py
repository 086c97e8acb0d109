"""Host memory-pressure guard (AbstractCmd.java:52-62 parity): bounded
caches shrink gracefully under an injected low-memory condition instead
of growing into an OOM, and recover when pressure clears."""

import pathlib

import pytest

from colormipsearch_tpu.mips import MIPsCache
from colormipsearch_tpu.model import (ComputeFileType, EMNeuronEntity,
                                      FileData)
from colormipsearch_tpu.utils.memguard import MemoryGuard, host_memory

FX = pathlib.Path(__file__).parent / "fixtures" / "cdsearch"


def _neurons():
    out = []
    names = sorted((FX / "ems").glob("*.tif")) + sorted(
        (FX / "lms").glob("*.tif"))
    for i, p in enumerate(names):
        e = EMNeuronEntity(entity_id=100 + i, mip_id=f"m-{i}")
        e.compute_files[ComputeFileType.InputColorDepthImage] = \
            FileData.from_string(str(p))
        out.append(e)
    return out


def test_host_memory_probe():
    avail, total = host_memory()
    assert 0 < avail <= total


def test_guard_pressure_threshold():
    state = {"avail": 100}
    g = MemoryGuard(low_pct=0.1, probe=lambda: (state["avail"], 1000),
                    min_interval=0)
    assert not g.under_pressure()
    state["avail"] = 50
    assert g.under_pressure()


def test_mips_cache_shrinks_under_pressure():
    state = {"avail": 1000}
    guard = MemoryGuard(low_pct=0.1, probe=lambda: (state["avail"], 1000),
                        min_interval=0)
    cache = MIPsCache(100, memory_guard=guard)
    neurons = _neurons()
    for n in neurons[:-1]:
        mip = cache.load_mip(n, ComputeFileType.InputColorDepthImage)
        assert mip.image is not None
    n_before = len(cache._cache)
    assert n_before == len(neurons) - 1

    # sustained pressure: the cache drains to empty but loads still work
    state["avail"] = 10
    mip = cache.load_mip(neurons[-1], ComputeFileType.InputColorDepthImage)
    assert mip.image is not None            # graceful: no failure
    assert len(cache._cache) < n_before     # shrank instead of growing
    assert len(cache._cache) <= 1           # drained under sustained low
                                            # (halving floors at 1 entry)

    # pressure clears: cache fills again
    state["avail"] = 1000
    for n in neurons:
        cache.load_mip(n, ComputeFileType.InputColorDepthImage)
    assert len(cache._cache) == len(neurons)


def test_plane_cache_insert_shrinks(monkeypatch):
    from colormipsearch_tpu.cmd import gradientscores_cmd as gs
    from colormipsearch_tpu.utils import memguard

    state = {"avail": 1000}
    guard = MemoryGuard(low_pct=0.1, probe=lambda: (state["avail"], 1000),
                        min_interval=0)
    monkeypatch.setattr(memguard, "_SHARED", guard)

    planes_cache = {}
    for i in range(10):
        gs._insert_plane(planes_cache, f"t{i}", object())
    assert len(planes_cache) == 10
    state["avail"] = 10
    gs._insert_plane(planes_cache, "t10", object())
    assert len(planes_cache) < 11  # halved (repeatedly) under pressure
