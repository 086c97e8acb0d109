"""Multi-mask single-launch exact sweep (ROADMAP lever 2).

The two-phase production path scores each mask's prescreen survivors
with the active-tile pallas kernel. Launching that kernel once per mask
(pixel_pallas.score_packed_deferred) pays a device dispatch plus a
survivor gather per mask — measured at ~40% of the exact phase (the
kernel itself runs 4.4K pairs/s; the per-mask path nets 2.7K).

This module removes both costs: ONE pallas dispatch scores the survivor
chunks of MANY masks.

- Host-side, every mask's survivor list is cut into fixed tb-row chunks
  and the chunks of up to G_BUCKET distinct masks are packed into one
  launch of ROWS rows (dead chunks pad the fixed shape and are skipped
  in-kernel like the compacted path's padding blocks).
- Scalar prefetch carries, per chunk, the mask identity twice: a GLOBAL
  id that drives the query-tile BlockSpec index map into one stacked
  [B*K, 8, 128] tile array (uploaded once per device per run), and a
  LOCAL slot selecting the launch's [G*K, 3] coords window (SMEM-sized;
  the full [B*K, 3] would not fit scalar memory).
- Each chunk's target windows are DMA'd PER ROW straight from the full
  resident padded frames at scalar-prefetched target indices — the
  per-mask path's device gather of survivor frames (0.5 GB HBM traffic
  per 64-survivor chunk) disappears entirely.

Scores are bit-identical to the per-mask path (pinned by
tests/test_multimask.py); the kernel body is pixel_pallas's predicate
and accumulator verbatim — only the work layout changes.

Reference counterpart: the per-mask submission loop this replaces,
cmd/cdsprocess/LocalColorMIPSearchProcessor.java:82-112 (one task per
(mask, target-partition) pair).
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pixel_pallas import (NV_PAD, TILE_H, TILE_W, DeferredScore,
                           _RATIO_PRED, _dev_ctx, _match_predicate,
                           _ratio_consts, _ratio_match, _ratio_prep,
                           _unpack)

# rows per launch (fixed compile shape; tails round up to a pow2
# bucket). MEASURED (1024x512 bench): 1024 rows -> 56.5K pairs/s,
# 2048 -> 67.4K (+19%: fewer inter-launch pipeline restarts).
ROWS = int(os.environ.get("CMS_MM_ROWS", "2048"))
# rows per chunk (one mask per chunk; per-mask survivor padding is
# <= tb-1). MEASURED on the production-shape bench (1024x512): tb=16 ->
# 45.7K pairs/s, tb=8 -> 55.0K, tb=4 -> 60.0K (padding rows 27% -> 13%
# -> 6% at the bench's ~35-survivors-per-mask partitions), tb=2 -> 29K
# (per-row DMA issue + scalar step overhead swamps the padding win).
TB = int(os.environ.get("CMS_MM_TB", "4"))


def _g_bucket(n_k: int) -> int:
    # distinct masks per launch, bounded by SMEM for the flat
    # [G*K*3] coords (1-D scalar-prefetch packs tight; the 1 MB SMEM
    # budget fits 64*128*3*4 = 98 KB easily). Too small a G leaves
    # launches half-filled with dead chunks once tb shrinks (at tb=4,
    # 16 masks x ~9 chunks = 144 of 256 slots), whose scalar grid steps
    # are pure waste.
    g = int(os.environ.get("CMS_MM_G", "0"))
    if g:
        return g
    return 64 if n_k <= 128 else 16


def _pow2_at_least(n: int, lo: int) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


def _make_kernel(shifts, zt9: int, n_k: int, tb: int, g_bucket: int,
                 ratio: bool = False, acc2d: bool = False,
                 dma_elide: bool = False, livetab: bool = False,
                 k_grid: int = 0, acc16: bool = False):
    # acc2d: accumulate full [8, 128] match tiles per variant and defer
    # the cross-sublane reduction to the single chunk-final out write
    # (bit-identical; removes one 8-sublane shuffle-reduce per
    # (tile, target, variant) from the hot loop).
    # acc16: int16 accumulator lanes for the acc2d path (ROADMAP
    # round-4 #2): the VPU's i16 add packs 2 values per 32-bit lane
    # (0.46 vs 0.21 Top/s measured, scripts/op_microbench.py), so the
    # hot accumulate halves its vector-op count. No overflow: per-chunk
    # per-pixel counts are bounded by the tile count n_k <= 768 <
    # 2^15. Widening to int32 happens once at the chunk-final write.
    # dma_elide: DIAGNOSTIC ONLY (wrong scores) — issue the window DMA
    # only at k == 0 so a profile run can measure the DMA-free floor of
    # the exact phase (attribution for the window-reuse lever).
    win_h = 3 * TILE_H
    win_w = 3 * TILE_W
    n_shifts = len(shifts)
    nv = 2 * n_shifts
    assert nv <= NV_PAD

    def kernel(gmids, lmids, blk, tgt, surv, coords, k0s, kns, q_ref, t_hbm,
               tf_hbm, out_ref, acc, win_d, win_m, sems, qf_ref=None,
               rfb=None, fb=None):
        t = pl.program_id(0)
        k = pl.program_id(1)
        alive = blk[t] > 0
        # coords is FLAT [g_bucket * n_k * 3]: 2-D scalar-prefetch arrays
        # are padded to 512 B per row in SMEM (measured: [2048, 3] int32
        # allocated 1.00 MB — the whole SMEM budget); 1-D packs tight
        lbase = lmids[t] * n_k
        # per-chunk tile restriction: tiles whose +-xyShift row window
        # misses every chunk target's signal rows provably score 0 and
        # are skipped BEFORE their window DMA is issued (the window
        # signal-skip only fires after paying the copy). Two forms:
        # - affine: contiguous sub-range [k0, k0+kn) (k0s[t] is the base)
        # - livetab: k0s is a flat [n_chunks * k_grid] per-chunk list of
        #   EXACT live tile indices (non-contiguous union of the chunk
        #   targets' row intervals) — the k-th grid step runs the k-th
        #   LIVE tile, so hull-internal dead tiles never become steps
        n_act = kns[t]

        if livetab:
            def tile_of(kk):
                return k0s[t * k_grid + kk]
        else:
            def tile_of(kk):
                return k0s[t] + kk

        def window_copies(slot, kk):
            ka = jnp.minimum(lbase + tile_of(kk), g_bucket * n_k - 1)
            ty = pl.multiple_of(coords[ka * 3], TILE_H)
            tx = pl.multiple_of(coords[ka * 3 + 1], TILE_W)
            copies = []
            # per-row DMA at scalar-prefetched target indices: survivors
            # are scattered in the resident frame, so there is no
            # contiguous slab to copy — but there is also no gather
            for j in range(tb):
                ti = tgt[t * tb + j]
                copies.append(pltpu.make_async_copy(
                    t_hbm.at[pl.ds(ti, 1), pl.ds(ty, win_h),
                             pl.ds(tx, win_w)],
                    win_d.at[slot, pl.ds(j, 1)], sems.at[slot, 0]))
                copies.append(pltpu.make_async_copy(
                    tf_hbm.at[pl.ds(ti, 1), pl.ds(ty, win_h),
                              pl.ds(tx, win_w)],
                    win_m.at[slot, pl.ds(j, 1)], sems.at[slot, 1]))
            return copies

        def start_window(slot, kk):
            for c in window_copies(slot, kk):
                c.start()

        def wait_window(slot, kk):
            for c in window_copies(slot, kk):
                c.wait()

        slot = jnp.int32(0) if dma_elide else jax.lax.rem(k, 2)

        acc_dt = jnp.int16 if acc16 else jnp.int32

        @pl.when(k == 0)
        def _():
            acc[...] = jnp.zeros(acc.shape, dtype=acc_dt)

        @pl.when(alive & (k == 0))
        def _():
            start_window(0, 0)

        if not dma_elide:
            @pl.when(alive & (k + 1 < n_act))
            def _():
                start_window(1 - slot, k + 1)

        @pl.when(alive & (k == 0 if dma_elide else k < n_act))
        def _():
            wait_window(slot, k if not dma_elide else 0)

        if ratio:
            C = _ratio_consts(q_ref[0], qf_ref[0])

            def variant_loop(win, g0, base_vi):
                for vi, (dx, dy) in enumerate(shifts):
                    r0, c0 = TILE_H + dy, TILE_W + dx
                    rf = rfb[r0:r0 + TILE_H, c0:c0 + TILE_W]
                    fw = fb[r0:r0 + TILE_H, c0:c0 + TILE_W]
                    if acc2d:
                        m = _ratio_match(rf, fw, C).astype(acc_dt)
                        acc[g0, base_vi + vi] += m
                    else:
                        m = _ratio_match(rf, fw, C).astype(jnp.int32)
                        acc[g0, base_vi + vi, :] += m.sum(axis=0)
        else:
            q = _unpack(q_ref[0])

            def variant_loop(win, g0, base_vi):
                for vi, (dx, dy) in enumerate(shifts):
                    r0, c0 = TILE_H + dy, TILE_W + dx
                    w = win[slot, g0, r0:r0 + TILE_H, c0:c0 + TILE_W]
                    if acc2d:
                        m = _match_predicate(q, _unpack(w),
                                             zt9).astype(acc_dt)
                        acc[g0, base_vi + vi] += m
                    else:
                        m = _match_predicate(q, _unpack(w),
                                             zt9).astype(jnp.int32)
                        acc[g0, base_vi + vi, :] += m.sum(axis=0)

        def target_body(j, _):
            sv = surv[t * tb + j]
            any_d = jnp.max((win_d[slot, j] >> 19) & 1)
            any_m = jnp.max((win_m[slot, j] >> 19) & 1)

            @pl.when((sv > 0) & (any_d > 0))
            def _():
                if ratio:
                    _ratio_prep(win_d[slot, j], rfb, fb)
                variant_loop(win_d, j, 0)

            @pl.when((sv > 0) & (any_m > 0))
            def _():
                if ratio:
                    _ratio_prep(win_m[slot, j], rfb, fb)
                variant_loop(win_m, j, n_shifts)

            return 0

        @pl.when(alive & (k < n_act))
        def _():
            jax.lax.fori_loop(0, tb, target_body, 0)

        @pl.when(k == pl.num_programs(1) - 1)
        def _():
            if acc2d:
                out_ref[...] = acc[...].astype(jnp.int32).sum(axis=2)
            else:
                out_ref[...] = acc[...]

    if ratio:
        def kernel_ratio(gmids, lmids, blk, tgt, surv, coords, k0s, kns,
                         qc_ref, qf_ref, t_hbm, tf_hbm, out_ref, acc,
                         win_d, win_m, rfb, fb, sems):
            kernel(gmids, lmids, blk, tgt, surv, coords, k0s, kns, qc_ref,
                   t_hbm, tf_hbm, out_ref, acc, win_d, win_m, sems,
                   qf_ref=qf_ref, rfb=rfb, fb=fb)
        return kernel_ratio, win_h, win_w, nv
    return kernel, win_h, win_w, nv


@functools.partial(jax.jit,
                   static_argnames=("zt9", "shifts_tuple", "tb", "n_k",
                                    "k_grid", "g_bucket", "interpret",
                                    "acc2d", "dma_elide", "livetab",
                                    "acc16"))
def _multimask_call(gmids, lmids, blk, tgt, surv, coords_l, k0s, kns,
                    q_stack, t_padded, t_flipped, zt9: int, shifts_tuple,
                    tb: int, n_k: int, k_grid: int, g_bucket: int,
                    interpret: bool, acc2d: bool = False,
                    dma_elide: bool = False, livetab: bool = False,
                    acc16: bool = False):
    # k_grid: static grid extent of the tile dimension, >= every chunk's
    # kn in this launch. MEASURED (profile_exact_phase, r3): the null-
    # predicate exact-phase floor is ~uniform PER GRID STEP, so dead
    # steps beyond a chunk's live range (mask padding to the K bucket,
    # or rows outside the row-range restriction) cost as much as real
    # skips — launches are therefore bucketed by live tile count and
    # compiled at the matching pow2 grid, instead of always (chunks, K).
    n_rows = tgt.shape[0]
    n_chunks = n_rows // tb
    shifts = list(shifts_tuple)
    kernel, win_h, win_w, nv = _make_kernel(shifts, zt9, n_k, tb, g_bucket,
                                            acc2d=acc2d,
                                            dma_elide=dma_elide,
                                            livetab=livetab, k_grid=k_grid,
                                            acc16=acc16)
    if livetab:
        def qmap(t, k, gm, lm, b, tg, sv, c, lt, kn):
            return (gm[t] * n_k + jnp.minimum(lt[t * k_grid + k], n_k - 1),
                    0, 0)
    else:
        def qmap(t, k, gm, lm, b, tg, sv, c, k0, kn):
            return (gm[t] * n_k + jnp.minimum(k0[t] + k, n_k - 1), 0, 0)
    acc_shape = ((tb, NV_PAD, TILE_H, TILE_W) if acc2d
                 else (tb, NV_PAD, TILE_W))
    acc_dt = jnp.int16 if acc16 else jnp.int32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(n_chunks, k_grid),
        in_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W), qmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tb, NV_PAD, TILE_W),
                               lambda t, k, gm, lm, b, tg, sv, c, k0, kn:
                               (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(acc_shape, acc_dt),
            pltpu.VMEM((2, tb, win_h, win_w), jnp.int32),
            pltpu.VMEM((2, tb, win_h, win_w), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    lane_sums = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, NV_PAD, TILE_W), jnp.int32),
        interpret=interpret,
    )(gmids, lmids, blk, tgt, surv, coords_l, k0s, kns, q_stack, t_padded,
      t_flipped)
    return lane_sums.sum(axis=2)[:, :nv]  # [n_rows, nv]


@functools.partial(jax.jit,
                   static_argnames=("zt9", "shifts_tuple", "tb", "n_k",
                                    "k_grid", "g_bucket", "interpret",
                                    "acc2d", "dma_elide", "livetab",
                                    "acc16"))
def _multimask_call_ratio(gmids, lmids, blk, tgt, surv, coords_l, k0s, kns,
                          qc_stack, qf_stack, t_padded, t_flipped, zt9: int,
                          shifts_tuple, tb: int, n_k: int, k_grid: int,
                          g_bucket: int, interpret: bool,
                          acc2d: bool = False, dma_elide: bool = False,
                          livetab: bool = False, acc16: bool = False):
    """Ratio-predicate variant of _multimask_call: the stacked query
    streams as (packed compare constants, f32 bound planes) and the
    kernel gets the shared per-window prep scratch (see
    pixel_pallas._ratio_prep)."""
    n_rows = tgt.shape[0]
    n_chunks = n_rows // tb
    shifts = list(shifts_tuple)
    kernel, win_h, win_w, nv = _make_kernel(shifts, zt9, n_k, tb, g_bucket,
                                            ratio=True, acc2d=acc2d,
                                            dma_elide=dma_elide,
                                            livetab=livetab, k_grid=k_grid,
                                            acc16=acc16)
    if livetab:
        def qtile(t, k, gm, lm, b, tg, sv, c, lt, kn):
            return gm[t] * n_k + jnp.minimum(lt[t * k_grid + k], n_k - 1)
    else:
        def qtile(t, k, gm, lm, b, tg, sv, c, k0, kn):
            return gm[t] * n_k + jnp.minimum(k0[t] + k, n_k - 1)
    acc_shape = ((tb, NV_PAD, TILE_H, TILE_W) if acc2d
                 else (tb, NV_PAD, TILE_W))
    acc_dt = jnp.int16 if acc16 else jnp.int32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(n_chunks, k_grid),
        in_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W),
                         lambda *a: (qtile(*a), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, TILE_H, TILE_W),
                         lambda *a: (qtile(*a), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tb, NV_PAD, TILE_W),
                               lambda t, k, gm, lm, b, tg, sv, c, k0, kn:
                               (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(acc_shape, acc_dt),
            pltpu.VMEM((2, tb, win_h, win_w), jnp.int32),
            pltpu.VMEM((2, tb, win_h, win_w), jnp.int32),
            pltpu.VMEM((win_h, win_w), jnp.float32),
            pltpu.VMEM((win_h, win_w), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    lane_sums = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, NV_PAD, TILE_W), jnp.int32),
        interpret=interpret,
    )(gmids, lmids, blk, tgt, surv, coords_l, k0s, kns, qc_stack, qf_stack,
      t_padded, t_flipped)
    return lane_sums.sum(axis=2)[:, :nv]  # [n_rows, nv]


# smallest tile-grid bucket: launches with tiny live ranges still pay
# at least this many grid steps (keeps the compiled-variant count low:
# pow2 values in [K_GRID_MIN, n_k])
K_GRID_MIN = int(os.environ.get("CMS_MM_KGRID_MIN", "8"))

# deferred-sublane-reduction accumulator (see _make_kernel acc2d);
# bit-identical, MEASURED x1.075 on the real chip
# (scripts/profile_accdma_ab.py: 22.2K vs 20.7K survivor-pairs/s,
# scores identical) — default ON
_ACC2D = os.environ.get("CMS_ACC2D", "1") == "1"
# DIAGNOSTIC ONLY (wrong scores): elide window DMAs past k=0 to measure
# the DMA-free floor of the exact phase
_DMA_ELIDE = os.environ.get("CMS_DMA_ELIDE", "0") == "1"
# int16 accumulator lanes for the acc2d path (see _make_kernel acc16);
# default OFF until the HW A/B lands a win (scripts/profile_acc16_ab.py)
_ACC16 = os.environ.get("CMS_ACC16", "0") == "1"
# per-chunk live-tile table: each chunk's grid iterates its EXACT
# (non-contiguous) set of live tiles via a flat [n_chunks * k_grid]
# SMEM indirection, instead of the contiguous hull [k0, k0+kn) —
# hull-internal dead tiles stop being grid steps. Only for n_k <= 256
# (the table is nc*k_grid int32; at n_k=768 it would exceed the 1 MB
# SMEM budget, so big-K buckets keep the affine hull).
_LIVETAB = os.environ.get("CMS_MM_LIVETAB", "1") == "1"
_LIVETAB_MAX_K = 256
# adaptive gate: the table indirection costs x0.83-0.90 vs the affine
# hull (MEASURED r3, scripts/profile_livetab_ab.py, two HW runs at
# 100% keep — the SMEM lookups in the q BlockSpec index map + window
# DMA coords beat Mosaic's affine block prediction), so it engages per
# K-bucket only when it removes >=30% of steps (net >= x1.19 at the
# worst measured cost). On the adversarial bench library it never
# engages (keep ~100%: dense-band survivors overlap the mask windows
# everywhere); it exists for sparse/regional production libraries.
_LIVETAB_KEEP = float(os.environ.get("CMS_MM_LIVETAB_KEEP", "0.7"))


class _Launch:
    __slots__ = ("gmids", "lmids", "blk", "tgt", "surv", "coords_l",
                 "k0s", "kns", "k_grid", "spans", "ltab")

    def __init__(self, n_rows, tb, g_bucket, n_k):
        nc = n_rows // tb
        self.gmids = np.zeros(nc, np.int32)
        self.lmids = np.zeros(nc, np.int32)
        self.blk = np.zeros(nc, np.int32)
        self.tgt = np.zeros(n_rows, np.int32)
        self.surv = np.zeros(n_rows, np.int32)
        # flat [g*K*3] (row, col, n_act) triples — see kernel SMEM note
        self.coords_l = np.zeros((g_bucket * n_k, 3), np.int32)
        self.coords_l[:, 2] = 1  # dead slots: n_act >= 1 (never executed)
        # per-chunk tile sub-range (row-overlap restriction); dead chunks
        # keep kn=1 (never executed: blk=0 gates the body)
        self.k0s = np.zeros(nc, np.int32)
        self.kns = np.ones(nc, np.int32)
        self.k_grid = n_k
        self.ltab = None  # flat [nc * k_grid] live-tile table (livetab)
        self.spans = []  # (engine_pos, row0, dest_idx np[n_real])


class MultiMaskScorer:
    """One-dispatch-many-masks exact sweep over a shared target block.

    engines: ActiveTilePixelEngine per mask — must share (zt9, shifts)
    and are grouped internally by their K tile bucket. The stacked query
    tiles of each bucket are device_put ONCE per (run, device); per
    partition only the tiny scalar launch tables move host->device.
    """

    def __init__(self, engines: Sequence, interpret: bool = False):
        self.engines = list(engines)
        self.interpret = interpret
        zt9s = {e.zt9 for e in self.engines}
        shs = {e.shifts for e in self.engines}
        assert len(zt9s) == 1 and len(shs) == 1, \
            "multi-mask launch requires shared CDS params"
        self.zt9 = zt9s.pop()
        self.shifts = shs.pop()
        # bucket engines by K (static kernel shape)
        self.buckets = {}  # n_k -> [engine_pos]
        for i, e in enumerate(self.engines):
            self.buckets.setdefault(e.tiles.q_tiles.shape[0], []).append(i)
        # ratio-predicate mode follows the engines (pixel_pallas
        # _RATIO_PRED): the stacked query is (q_cmp, q_f32) planes
        # instead of packed words — see ratio_bounds.py
        ratios = {getattr(e, "ratio", False) for e in self.engines}
        assert len(ratios) == 1, "mixed-predicate engines in one scorer"
        self.ratio = ratios.pop()
        # host-stacked query tiles per bucket, padded to a pow2 mask
        # count so the compiled shape survives mask-block size changes
        self._q_host = {}
        self._gpos = {}  # engine_pos -> index within its bucket stack
        for n_k, idxs in self.buckets.items():
            b_pad = _pow2_at_least(len(idxs), 16)
            if self.ratio:
                qc = np.zeros((b_pad * n_k, TILE_H, TILE_W), np.int32)
                qf = np.zeros((b_pad * n_k, 4, TILE_H, TILE_W), np.float32)
                for gi, pos in enumerate(idxs):
                    tiles = self.engines[pos].tiles
                    qc[gi * n_k:(gi + 1) * n_k] = tiles.q_cmp
                    qf[gi * n_k:(gi + 1) * n_k] = tiles.q_f32
                    self._gpos[pos] = gi
                self._q_host[n_k] = (qc, qf)
            else:
                stack = np.zeros((b_pad * n_k, TILE_H, TILE_W), np.int32)
                for gi, pos in enumerate(idxs):
                    stack[gi * n_k:(gi + 1) * n_k] = \
                        self.engines[pos].tiles.q_tiles
                    self._gpos[pos] = gi
                self._q_host[n_k] = stack
        self._q_dev = {}  # (n_k, device) -> device array (or tuple)

    @staticmethod
    def _put_blockwise(host, n_k, device):
        # a K=768 bucket with many masks is multi-GB; one device_put
        # of that size risks nondeterministic RESOURCE_EXHAUSTED on
        # the shared-HBM chip — place it in bounded row blocks via
        # donated dynamic_update_slice (same rule as pack_raw_words)
        row_bytes = int(np.prod(host.shape[1:])) * host.dtype.itemsize
        blk_masks = max(1, (256 << 20) // max(n_k * row_bytes, 1))
        blk = blk_masks * n_k
        from .pixel_pallas import _dev_ctx, _place_block
        with _dev_ctx(device):
            if host.shape[0] <= blk:
                return jnp.asarray(host)
            got = jnp.zeros(host.shape, host.dtype)
            for i in range(0, host.shape[0], blk):
                got = _place_block(got, jnp.asarray(host[i:i + blk]), i)
            return got

    def _q_for(self, n_k, device):
        got = self._q_dev.get((n_k, device))
        if got is None:
            host = self._q_host[n_k]
            if self.ratio:
                got = tuple(self._put_blockwise(h, n_k, device)
                            for h in host)
            else:
                got = self._put_blockwise(host, n_k, device)
            self._q_dev[(n_k, device)] = got
        return got

    def _build_launches(self, n_k: int, survivors: np.ndarray,
                        idxs: List[int],
                        row_ranges: Optional[np.ndarray] = None,
                        tile_live: Optional[tuple] = None,
                        tier2: Optional[tuple] = None
                        ) -> List[_Launch]:
        g_bucket = _g_bucket(n_k)
        tb = TB
        max_chunks = ROWS // tb
        # max |dy| the variant slices reach: a tile's sampled target rows
        # are [c0 - s, c0 + TILE_H + s) for window-origin row c0
        s = max((abs(dy) for _, dy in self.shifts), default=0)
        livetab = (_LIVETAB and n_k <= _LIVETAB_MAX_K
                   and (tile_live is not None or row_ranges is not None
                        or tier2 is not None))
        # chunk list: (engine_pos, dest target indices, k0, kn_hull, live)
        chunks = []
        tot_hull = tot_live = 0
        for pos in idxs:
            sidx = np.nonzero(survivors[pos])[0]
            n_act = self.engines[pos].tiles.n_active
            tiles = self.engines[pos].tiles
            coords0 = tiles.coords[:max(n_act, 1), 0]
            if row_ranges is not None and len(sidx) > 1:
                # sort survivors by signal row start so tb-chunks stay
                # row-coherent (the chunk range is the union of its
                # targets' ranges)
                sidx = sidx[np.argsort(row_ranges[sidx, 0], kind="stable")]
            if livetab:
                coords1 = tiles.coords[:max(n_act, 1), 1]
                mirror = getattr(self.engines[pos], "mirror_query", True)
                ty_i = coords0 // TILE_H
                tx_i = coords1 // TILE_W
                qbits = (tile_compat_bits(self.engines[pos])
                         if tier2 is not None else None)
                if tile_live is not None:
                    # per-target 3x3-dilated tile-presence bitmaps
                    # (tile_live_from_words): variant (dx, dy) of the
                    # tile at origin (cy, cx) samples raw target rows
                    # [cy+dy, cy+TILE_H+dy), cols [cx+dx, cx+TILE_W+dx)
                    # with |dy|,|dx| <= s <= TILE_H — entirely inside
                    # the 3x3 tile neighbourhood of (cy/8, cx/128), so
                    # a tile whose dilated bitmap entry is 0 for every
                    # chunk target provably scores 0 (no target signal
                    # in any sampled pixel, direct or mirrored)
                    per_t = (tile_live[0] | tile_live[1]) if mirror \
                        else tile_live[0]  # [T, gh, gw]
                elif row_ranges is not None:
                    sx = max((abs(dx) for dx, _ in self.shifts), default=0)
                    w = tiles.width
                    has_cols = row_ranges.shape[1] >= 4
            for c0 in range(0, len(sidx), tb):
                dest = sidx[c0:c0 + tb]
                k0, kn, live = 0, max(n_act, 1), None
                if row_ranges is not None:
                    tr0 = int(row_ranges[dest, 0].min())
                    tr1 = int(row_ranges[dest, 1].max())
                    # keep tiles with c0 in [tr0 - TILE_H - s + 1, tr1 + s]
                    lo = int(np.searchsorted(coords0,
                                             tr0 - TILE_H - s + 1, "left"))
                    hi = int(np.searchsorted(coords0, tr1 + s, "right"))
                    k0 = min(lo, max(n_act - 1, 0))
                    kn = max(hi - lo, 1)
                if livetab:
                    if tile_live is not None:
                        keep = per_t[dest].any(axis=0)[ty_i, tx_i]
                    elif row_ranges is not None:
                        # EXACT union of the per-target row (and, when
                        # the ranges carry them, column) intervals —
                        # same proven intervals as the hull, per
                        # target, but non-contiguous. The mirror window
                        # samples the x-flipped raw plane
                        # (f[x] = t[w-1-x], _pad_block), so its raw-col
                        # interval is the reflection of the target's
                        # about (w-1)/2.
                        keep = np.zeros(len(coords0), bool)
                        for rr in row_ranges[dest]:
                            rt0, rt1 = int(rr[0]), int(rr[1])
                            kt = ((coords0 >= rt0 - TILE_H - s + 1)
                                  & (coords0 <= rt1 + s))
                            if has_cols:
                                tc0, tc1 = int(rr[2]), int(rr[3])
                                cok = ((coords1 >= tc0 - TILE_W - sx + 1)
                                       & (coords1 <= tc1 + sx))
                                if mirror:
                                    mc0, mc1 = w - 1 - tc1, w - 1 - tc0
                                    cok |= ((coords1 >= mc0 - TILE_W
                                             - sx + 1)
                                            & (coords1 <= mc1 + sx))
                                kt &= cok
                            keep |= kt
                    else:
                        keep = np.ones(len(coords0), bool)
                    if qbits is not None:
                        # tier-2 bin-compat gate (exactness argument at
                        # the module-level tier-2 comment): direct pass
                        # tests the direct target bit plane, mirror
                        # pass the flipped one; either keeps the tile
                        (d0, d1), (m0, m1) = tier2
                        u0 = np.bitwise_or.reduce(d0[dest],
                                                  axis=0)[ty_i, tx_i]
                        u1 = np.bitwise_or.reduce(d1[dest],
                                                  axis=0)[ty_i, tx_i]
                        q0 = qbits[:, 0].astype(np.int64)
                        q1 = qbits[:, 1].astype(np.int64)
                        t2 = ((q0 & (u0.astype(np.int64) & 0xFFFFFFFF))
                              | (q1 & (u1.astype(np.int64)
                                       & 0xFFFFFFFF))) != 0
                        if mirror:
                            um0 = np.bitwise_or.reduce(
                                m0[dest], axis=0)[ty_i, tx_i]
                            um1 = np.bitwise_or.reduce(
                                m1[dest], axis=0)[ty_i, tx_i]
                            t2 |= ((q0 & (um0.astype(np.int64)
                                          & 0xFFFFFFFF))
                                   | (q1 & (um1.astype(np.int64)
                                            & 0xFFFFFFFF))) != 0
                        keep &= t2
                    live = np.nonzero(keep)[0].astype(np.int32)
                    if len(live) == 0:
                        live = np.zeros(1, np.int32)
                tot_hull += kn
                tot_live += len(live) if live is not None else kn
                chunks.append((pos, dest, k0, kn, live))
        if livetab:
            if tot_live > _LIVETAB_KEEP * tot_hull:
                # not enough pruning to pay the ~10% indirection cost —
                # fall back to the affine hull for this K-bucket
                chunks = [(p, d, k0, kn, None)
                          for (p, d, k0, kn, _) in chunks]
                livetab = False
            else:
                chunks = [(p, d, k0, len(liv), liv)
                          for (p, d, k0, _, liv) in chunks]
        # group chunks by live tile count so each launch compiles at the
        # smallest sufficient k-grid (dead grid steps cost like real
        # ones — see _multimask_call); stable sort keeps each mask's
        # row-coherent chunk order within a kn class
        chunks.sort(key=lambda c: _pow2_at_least(c[3], K_GRID_MIN),
                    reverse=True)
        launches = []
        i = 0
        while i < len(chunks):
            # greedy fill: up to max_chunks chunks / g_bucket distinct
            # masks / one k-grid bucket
            masks_here = []
            kg = _pow2_at_least(chunks[i][3], K_GRID_MIN)
            j = i
            while j < len(chunks) and j - i < max_chunks:
                pos, _, _, kn_j, _ = chunks[j]
                if _pow2_at_least(kn_j, K_GRID_MIN) != kg:
                    break
                if pos not in masks_here:
                    if len(masks_here) == g_bucket:
                        break
                    masks_here.append(pos)
                j += 1
            n_rows = _pow2_at_least((j - i) * tb, tb) \
                if (j - i) * tb < ROWS else ROWS
            la = _Launch(n_rows, tb, g_bucket, n_k)
            la.k_grid = min(kg, n_k)
            if livetab:
                la.ltab = np.zeros((n_rows // tb) * la.k_grid, np.int32)
            for ci, (pos, dest, k0, kn, live) in enumerate(chunks[i:j]):
                lm = masks_here.index(pos)
                la.gmids[ci] = self._gpos[pos]
                la.lmids[ci] = lm
                la.blk[ci] = 1
                la.k0s[ci] = k0
                la.kns[ci] = kn
                if livetab:
                    kgl = la.k_grid
                    la.ltab[ci * kgl:ci * kgl + kn] = live
                    la.ltab[ci * kgl + kn:(ci + 1) * kgl] = live[-1]
                r0 = ci * tb
                n_real = len(dest)
                la.tgt[r0:r0 + n_real] = dest
                if n_real < tb:  # repeat last real index (valid DMA src)
                    la.tgt[r0 + n_real:r0 + tb] = dest[-1]
                la.surv[r0:r0 + n_real] = 1
                la.spans.append((pos, r0, dest))
            for lm, pos in enumerate(masks_here):
                la.coords_l[lm * n_k:(lm + 1) * n_k] = \
                    self.engines[pos].tiles.coords
            launches.append(la)
            i = j
        return launches

    def launch_deferred(self, packed, survivors: np.ndarray,
                        device=None,
                        row_ranges: Optional[np.ndarray] = None,
                        tile_live: Optional[tuple] = None,
                        tier2: Optional[tuple] = None
                        ) -> List[DeferredScore]:
        """Queue the exact sweep for ALL masks over one packed target
        block; returns one DeferredScore per engine (drain with
        pixel_pallas.drain_deferred — shared launch buffers are fetched
        once).

        row_ranges: optional int32 [T, 2] (first, last) signal rows per
        target (see row_ranges_from_words; signal_ranges_from_words
        adds col extents as [T, 4]). When given, each chunk's grid is
        restricted to the mask tiles whose sampled row window
        intersects the chunk targets' signal rows — bit-identical
        scores (skipped tiles provably contribute 0), fewer window DMAs
        and grid steps for spatially-localized targets.

        tile_live: optional (direct, mirrored) 3x3-dilated tile-presence
        bitmaps (tile_live_from_words) — the finest exact skip: with
        CMS_MM_LIVETAB the per-chunk grid iterates only tiles whose
        window samples some chunk target's signal (non-contiguous,
        via a flat SMEM indirection), gated adaptively per K-bucket
        on the measured step reduction (see _LIVETAB_KEEP).

        tier2: optional ((d0, d1), (m0, m1)) target hue-bin bitmask
        planes (bin_bits_from_words) — the tier-2 bin-compat gate on
        top of presence: tiles with target signal but NO
        prescreen-compatible hue pairing are skipped too (bit-exact;
        see the module tier-2 comment)."""
        t_padded, t_flipped = packed
        tsz = t_padded.shape[0]
        surv_np = np.asarray(survivors).astype(np.int32)
        pendings = [[] for _ in self.engines]
        for n_k, idxs in self.buckets.items():
            q_stack = self._q_for(n_k, device)
            for la in self._build_launches(n_k, surv_np, idxs, row_ranges,
                                           tile_live=tile_live,
                                           tier2=tier2):
                lt = la.ltab is not None
                with _dev_ctx(device):
                    scalars = (jnp.asarray(la.gmids), jnp.asarray(la.lmids),
                               jnp.asarray(la.blk), jnp.asarray(la.tgt),
                               jnp.asarray(la.surv),
                               jnp.asarray(la.coords_l.reshape(-1)),
                               jnp.asarray(la.ltab if lt else la.k0s),
                               jnp.asarray(la.kns))
                    if self.ratio:
                        out = _multimask_call_ratio(
                            *scalars, q_stack[0], q_stack[1], t_padded,
                            t_flipped, self.zt9, self.shifts, TB, n_k,
                            la.k_grid, _g_bucket(n_k), self.interpret,
                            acc2d=_ACC2D, dma_elide=_DMA_ELIDE, livetab=lt,
                            acc16=_ACC16 and _ACC2D)
                    else:
                        out = _multimask_call(
                            *scalars, q_stack, t_padded, t_flipped,
                            self.zt9, self.shifts, TB, n_k, la.k_grid,
                            _g_bucket(n_k), self.interpret,
                            acc2d=_ACC2D, dma_elide=_DMA_ELIDE, livetab=lt,
                            acc16=_ACC16 and _ACC2D)
                for pos, r0, dest in la.spans:
                    pendings[pos].append((dest, out, len(dest), r0))
        return [DeferredScore(e, tsz, pendings[i], surv_np[i])
                for i, e in enumerate(self.engines)]


# ---- tier-2 bin-compat tile gating (fused into the live-tile table) --
#
# ROADMAP round-4 #1: the pixel-granular bin-compat bound is tight but a
# separate tier-2 PASS pays the exact kernel's window DMA again (a ~5%
# wash, measured r3). The only form that pays is gating INSIDE the
# exact launch: a (mask tile, chunk) pair is skipped when NO query-pixel
# hue bin in the tile is prescreen-compatible with ANY target-pixel bin
# in the 3x3 tile neighbourhood its windows sample, for every chunk
# target, direct or mirrored. compat_matrix is a proven superset of the
# exact gap predicate (prescreen.py:68, bound >= score verified), so a
# gated-out tile provably contributes 0 matches — bit-identical scores.
# The gate rides the existing live-tile indirection and its adaptive
# keep threshold (_LIVETAB_KEEP).

# MEASURED r4 (scripts/profile_tier2_ab.py, 256x256 adversarial, HW):
# scores bit-identical, but the gate removed only 5.3% of presence-kept
# steps (hue-diverse masks expand to nearly every bin) while its
# host-side per-chunk bit unions ran every launch — net x0.655. Default
# OFF; enable for hue-sparse production libraries where the keep
# fraction clears the adaptive gate.
_TIER2 = os.environ.get("CMS_MM_TIER2", "0") == "1"


def tier2_enabled() -> bool:
    from .prescreen import N_BINS
    return _TIER2 and _LIVETAB and N_BINS <= 64


@functools.partial(jax.jit, static_argnames=("gh", "gw"))
def _bin_bits_dev(words, gh: int, gw: int):
    """Per-tile-neighbourhood target hue-bin bitmasks: two int32 lanes
    (N_BINS <= 64) OR-reduced over each mask tile footprint, then
    3x3-dilated over the tile grid (the exact window sampling
    neighbourhood, same geometry as _tile_live_dev)."""
    from .prescreen import bin_plane_from_words
    tsz, h, w = words.shape

    def bits_of(wds):
        bins = bin_plane_from_words(wds)
        lane0 = jnp.where((bins >= 0) & (bins < 32),
                          jnp.int32(1) << jnp.clip(bins, 0, 31).astype(jnp.int32),
                          0)
        lane1 = jnp.where(bins >= 32,
                          jnp.int32(1) << jnp.clip(bins - 32, 0,
                                                   31).astype(jnp.int32),
                          0)

        def pool(x):
            p = jnp.pad(x, ((0, 0), (0, gh * TILE_H - h),
                            (0, gw * TILE_W - w)))
            t = p.reshape(tsz, gh, TILE_H, gw, TILE_W)
            t = jax.lax.reduce(t, np.int32(0), jax.lax.bitwise_or, (2, 4))
            t = jnp.pad(t, ((0, 0), (1, 1), (1, 1)))
            t = t[:, :-2] | t[:, 1:-1] | t[:, 2:]
            return t[:, :, :-2] | t[:, :, 1:-1] | t[:, :, 2:]

        return pool(lane0), pool(lane1)

    # mirror flips the RAW w-wide plane (see _tile_live_dev)
    return bits_of(words), bits_of(words[:, :, ::-1])


def bin_bits_from_words(words):
    """((d0, d1), (m0, m1)) int32 [T, gh, gw] target-bin bitmask planes
    (direct, mirrored) for the tier-2 tile gate."""
    tsz, h, w = words.shape
    gh = -(-h // TILE_H)
    gw = -(-w // TILE_W)
    (d0, d1), (m0, m1) = _bin_bits_dev(words, gh, gw)
    return ((np.asarray(d0), np.asarray(d1)),
            (np.asarray(m0), np.asarray(m1)))


def tile_compat_bits(engine):
    """Per-active-tile EXPANDED query bitmasks [n_act, 2] uint32: bit jt
    set iff some query pixel bin in the tile is compat with target bin
    jt. None when tier-2 cannot apply (bins don't fit 64, or zTol
    exceeds the bin width). Cached on the engine (static per mask)."""
    cached = getattr(engine, "_tier2_bits", False)
    if cached is not False:
        return cached
    from .prescreen import N_BINS, bin_plane_from_words, compat_matrix
    bits = None
    if N_BINS <= 64:
        try:
            compat = compat_matrix(engine.zt9)
        except ValueError:
            compat = None
        if compat is not None:
            row_bits = np.zeros((N_BINS, 2), np.uint32)
            for jq in range(N_BINS):
                b0 = b1 = 0
                for jt in np.nonzero(compat[jq])[0]:
                    if jt < 32:
                        b0 |= 1 << int(jt)
                    else:
                        b1 |= 1 << int(jt - 32)
                row_bits[jq] = (b0, b1)
            bins = np.asarray(bin_plane_from_words(
                np.asarray(engine.planes.words).astype(np.int64), xp=np))
            n_act = max(engine.tiles.n_active, 1)
            coords = engine.tiles.coords[:n_act]
            bits = np.zeros((n_act, 2), np.uint32)
            for i in range(n_act):
                ty, tx = int(coords[i, 0]), int(coords[i, 1])
                sub = bins[ty:ty + TILE_H, tx:tx + TILE_W]
                present = np.unique(sub[sub >= 0]).astype(np.int64)
                if len(present):
                    rb = row_bits[present]
                    bits[i, 0] = np.bitwise_or.reduce(rb[:, 0])
                    bits[i, 1] = np.bitwise_or.reduce(rb[:, 1])
    engine._tier2_bits = bits
    return bits


@jax.jit
def _sel_any_rowcol(words):
    sel = (words >> 19) & 1
    return sel.max(axis=2), sel.max(axis=1)  # [T, H], [T, W]


def _first_last(flags: np.ndarray) -> np.ndarray:
    n = flags.shape[1]
    any_f = flags.any(axis=1)
    first = np.where(any_f, flags.argmax(axis=1), 0).astype(np.int32)
    last = np.where(any_f, n - 1 - flags[:, ::-1].argmax(axis=1),
                    -1).astype(np.int32)
    return np.stack([first, last], axis=1)


def row_ranges_from_words(words) -> np.ndarray:
    """int32 [T, 2] (first, last) above-threshold signal row per packed
    target frame; (0, -1) for empty targets. One tiny device reduction +
    one [T, H] bool pull — negligible next to the pack itself."""
    rows = np.asarray(_sel_any_rowcol(words)[0]) > 0  # [T, H] host
    return _first_last(rows)


def signal_ranges_from_words(words) -> np.ndarray:
    """int32 [T, 4] (first_row, last_row, first_col, last_col) signal
    extents per packed target frame (raw-frame coordinates); rows
    (0, -1) for empty targets. The live-tile table uses the col extent
    (direct + mirrored) on top of the row interval — the hull
    restriction reads only the first two columns either way."""
    r, c = _sel_any_rowcol(words)
    return np.concatenate([_first_last(np.asarray(r) > 0),
                           _first_last(np.asarray(c) > 0)], axis=1)


@functools.partial(jax.jit, static_argnames=("gh", "gw"))
def _tile_live_dev(words, gh: int, gw: int):
    tsz, h, w = words.shape
    sel = ((words >> 19) & 1) > 0  # [T, H, W]

    def pool_dilate(sflip):
        p = jnp.pad(sflip, ((0, 0), (0, gh * TILE_H - h),
                            (0, gw * TILE_W - w)))
        t = p.reshape(tsz, gh, TILE_H, gw, TILE_W).any(axis=(2, 4))
        t = jnp.pad(t, ((0, 0), (1, 1), (1, 1)))
        t = t[:, :-2] | t[:, 1:-1] | t[:, 2:]
        return t[:, :, :-2] | t[:, :, 1:-1] | t[:, :, 2:]

    # the mirror flip happens on the RAW w-wide plane (_pad_block), so
    # flip BEFORE the tile-alignment padding
    return pool_dilate(sel), pool_dilate(sel[:, :, ::-1])


def tile_live_from_words(words) -> tuple:
    """Per-target 3x3-dilated tile-presence bitmaps, (direct, mirrored),
    each np.bool_ [T, gh, gw] over the mask tile grid.

    Entry [j, ty, tx] answers: does target j (resp. its x-flip) have
    ANY above-threshold signal in the 3x3 tile neighbourhood that the
    24x384 window at tile (ty, tx) samples? The multi-mask kernel's
    window signal-skip (any_d/any_m) evaluates exactly this test on
    the device AFTER paying the window DMA and the grid step — the
    bitmap lets the live-tile table apply it host-side BEFORE either.
    One tiny device reduction + a [T, gh, gw] x2 bool pull."""
    tsz, h, w = words.shape
    gh = -(-h // TILE_H)
    gw = -(-w // TILE_W)
    d, m = _tile_live_dev(words, gh, gw)
    return np.asarray(d), np.asarray(m)
