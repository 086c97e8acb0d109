"""Multi-device production two-phase sweep (MXU prescreen + pallas).

The reference runs the SAME scoring algorithm locally and on the Spark
cluster (cmd/cdsprocess/SparkColorMIPSearchProcessor.java:27-84 vs
LocalColorMIPSearchProcessor.java:38-122). This module gives the
production pallas engine the same property on TPU: targets are
block-partitioned over the local devices, and each device independently
runs the full two-phase pipeline on its shard — pack words, MXU bound
pass, survivor-compacted active-tile kernel launches — placed per
device via jax.default_device. The pair grid needs NO cross-device
collectives (every (mask, target) score is independent); per-mask
reductions (normalization maxima, best-match selection) happen after
the drain, on host for local runs or via process_allgather for
multi-host runs.

Scaling layers compose exactly like the reference's:
  process grid (jax.distributed / CMS_PROCESS_*) x local device grid
  x per-device two-phase pipeline,
so a v5p-16 runs 16 single-chip pipelines that share only the host-side
partition loop and the result writer.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

LOG = logging.getLogger(__name__)


def device_blocks(n: int, n_devices: int) -> List[Tuple[int, int]]:
    """Balanced contiguous (offset, length) blocks of n items over
    n_devices devices (first n % n_devices blocks get one extra)."""
    base, extra = divmod(n, n_devices)
    blocks, off = [], 0
    for d in range(n_devices):
        ln = base + (1 if d < extra else 0)
        blocks.append((off, ln))
        off += ln
    return blocks


class TwoPhaseSweep:
    """Two-phase exact sweep over every local device.

    engines: one ActiveTilePixelEngine per mask (shared host-side state;
      per-device query uploads are cached inside the engine).
    screen/u_matrix/thresholds: optional MXU prescreen — u_matrix is the
      stacked [B, F] query feature matrix (numpy; uploaded once per
      device), thresholds the per-mask keep thresholds in pixels.

    The per-device loop enqueues pack + screen + every mask's compacted
    kernel launches for one shard before moving to the next device, so
    all devices' exact phases run concurrently; only the [B, T_shard]
    bounds pull synchronizes with a device mid-loop.
    """

    def __init__(self, engines: Sequence, screen=None,
                 u_matrix: Optional[np.ndarray] = None,
                 thresholds: Optional[np.ndarray] = None,
                 devices: Optional[Sequence] = None):
        import jax
        import os
        self.engines = list(engines)
        self.screen = screen
        self.u_matrix = u_matrix
        self.thresholds = thresholds
        self.devices = list(devices) if devices is not None \
            else jax.local_devices()
        self._u_dev = {}
        # multi-mask single-launch exact phase (one pallas dispatch per
        # ~64 survivor chunks across masks instead of one per mask);
        # requires the prescreen's survivor lists and shared CDS params
        self._mm = None
        if (screen is not None and len(self.engines) > 1
                and os.environ.get("CMS_MULTIMASK", "1") == "1"):
            try:
                from ..cds.multimask import MultiMaskScorer
                self._mm = MultiMaskScorer(
                    self.engines,
                    interpret=getattr(self.engines[0], "interpret", False))
            except AssertionError:
                LOG.info("multi-mask launch disabled: engines do not "
                         "share CDS params")

    def _u_for(self, device):
        import jax
        got = self._u_dev.get(device)
        if got is None:
            got = jax.device_put(self.u_matrix, device)
            self._u_dev[device] = got
        return got

    def launch(self, targets_u8: np.ndarray, stage=None):
        """Enqueue the full two-phase sweep of one target batch on all
        local devices. Returns an opaque handle for collect(); nothing
        blocks except the per-device bounds pull, so a partition-
        pipelined caller overlaps the next batch's host pack with this
        batch's device compute (same contract as the single-device
        score_packed_deferred path)."""
        import time
        tsz = targets_u8.shape[0]
        stage = stage if stage is not None else {}
        launched = []  # (offset, length, [DeferredScore per mask])
        n_screened = 0
        for dev, (off, ln) in zip(self.devices,
                                  device_blocks(tsz, len(self.devices))):
            if ln == 0:
                continue
            shard = targets_u8[off:off + ln]
            t0 = time.perf_counter()
            words = self.engines[0].pack_raw_words(shard, device=dev)
            packed = self.engines[0].pad_from_words(words, device=dev)
            survivors = None
            row_ranges = None
            if self.screen is not None:
                bounds = self.screen.bounds_from_words(
                    self._u_for(dev), words, device=dev)  # [B, ln]
                survivors = (bounds > self.thresholds[:, None]).astype(
                    np.int32)
                n_screened += int((survivors == 0).sum())
            tile_live = tier2 = None
            if self._mm is not None:
                from ..cds import multimask as mmx
                row_ranges = mmx.signal_ranges_from_words(words)
                tile_live = mmx.tile_live_from_words(words)
                if mmx.tier2_enabled():
                    tier2 = mmx.bin_bits_from_words(words)
            del words
            stage["pack+screen"] = stage.get("pack+screen", 0.0) \
                + time.perf_counter() - t0
            t0 = time.perf_counter()
            if self._mm is not None and survivors is not None:
                defs = self._mm.launch_deferred(packed, survivors,
                                                device=dev,
                                                row_ranges=row_ranges,
                                                tile_live=tile_live,
                                                tier2=tier2)
            else:
                defs = [
                    eng.score_packed_deferred(
                        packed,
                        survivors=None if survivors is None else survivors[i],
                        device=dev)
                    for i, eng in enumerate(self.engines)]
            stage["launch"] = stage.get("launch", 0.0) \
                + time.perf_counter() - t0
            launched.append((off, ln, defs))
        stage["screened"] = stage.get("screened", 0) + n_screened
        return tsz, launched

    def collect(self, handle):
        """Drain one launch()'s results (ALL devices, ALL masks) in one
        batched device_get; returns (scores int64 [B, T], mirrored bool
        [B, T]) in the original target order."""
        from ..cds.pixel_pallas import drain_deferred
        tsz, launched = handle
        bsz = len(self.engines)
        scores = np.zeros((bsz, tsz), dtype=np.int64)
        mirrored = np.zeros((bsz, tsz), dtype=bool)
        flat = [d for _, _, defs in launched for d in defs]
        results = drain_deferred(flat)
        k = 0
        for off, ln, defs in launched:
            for i in range(bsz):
                s, _, m = results[k]
                scores[i, off:off + ln] = s
                mirrored[i, off:off + ln] = m
                k += 1
        return scores, mirrored

    def sweep(self, targets_u8: np.ndarray, stage=None):
        """launch + collect in one call (no partition pipelining)."""
        return self.collect(self.launch(targets_u8, stage))
