"""Pallas active-tile pixel-match kernel — the hot-path scorer.

Neuron masks occupy 0.3-2.5% of the 1210x566 frame (3-10% of 8x128 VPU
tiles). The dense XLA kernel (pixel_kernel.py) pays for every pixel; this
kernel touches only the mask's ACTIVE tiles:

- Host gathers the query's active 8x128 tiles into a [K, 8, 128] stack
  (K padded to a fixed bucket so every mask shares one compiled kernel)
  and a [K, 3] table of window origins + the active-tile count.
- The kernel runs a (T/tb, K) grid; each step serves a block of tb
  targets. Query tiles stream through VMEM via the BlockSpec pipeline;
  the two target windows per step (tile-aligned 3x3 super-tile slabs
  [tb, 24, 384] from the direct and x-flipped frames — Mosaic slices
  HBM only at (8, 128)-tile granularity) arrive by double-buffered
  async DMA at scalar-prefetched origins, so each target word is read
  once per active tile instead of once per pixel variant.
- Per target, all (1+8*s/2)*2 shift/mirror variants are static slices
  of the window: one packed (8,128) VMEM load each, unpacked in
  registers, scored, and accumulated into per-variant lane-sum
  sublanes of a [tb, 32, 128] accumulator (finished on host).
- Three skip levels: padding tiles beyond the real count skip DMA and
  compute; windows with no above-threshold target pixel skip the
  variant sweep; targets zeroed in the scalar-prefetched survivor
  bitmap (the MXU prescreen's output) skip entirely.

Exactness is identical to the dense kernel: the same branchless int32
hue-gap predicate (see pixel_kernel.py / exact_ratio.py), validated
against the reference goldens in tests.

Reference counterpart: the scalar position-list loop in
cds/PixelMatchColorDepthSearchAlgorithm.java:221-263 (and its thread-
pool fan-out, cmd/cdsprocess/LocalColorMIPSearchProcessor.java:93-112).
"""

from __future__ import annotations

import contextlib
import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..imageproc.io import Image
from .exact_ratio import c9_split
from .oracle import shift_ring_offsets
from .pixel_kernel import PAIR_K9, QueryPlanes, prepare_query_planes

TILE_H = 8
TILE_W = 128


def _unpack(word):
    b = word & 0xFF
    a = (word >> 8) & 0xFF
    s = (word >> 16) & 0x7
    sel = (word >> 19) & 1
    cl = (word >> 20) & 1
    cu = (word >> 21) & 1
    return b, a, s, sel, cl, cu


def _leq_geq_chain(u, v, q, r_hi, r_lo):
    # pure boolean algebra (no bool/int selects): Mosaic lowers i1
    # logical ops directly, avoiding unsupported narrow truncations
    d = u * 1000 - q * v
    e = d * 15625 - r_hi * v
    in_d = (d >= 0) & (d <= 65601)
    in_e = (e >= 0) & (e <= 65601)
    e_band = 64 * jnp.where(in_e, e, 0)
    rv = r_lo * v
    leq_e = (e < 0) | (in_e & (e_band <= rv))
    geq_e = (e >= 0) & ((e_band >= rv) | ~in_e)
    leq = (d < 0) | (in_d & leq_e)
    geq = (d >= 0) & (geq_e | ~in_d)
    return leq, geq


def _select_by_lo(lo, values):
    out = jnp.full_like(lo, values[0])
    for i in (2, 3, 4, 5):
        out = jnp.where(lo == i, values[i - 1], out)
    return out


def _match_unpacked(q, t, zt9: int):
    """Match predicate on pre-unpacked tuples (see pixel_kernel._match_words)."""
    b1, a1, s1, qsel, qcl, qcu = q
    b2, a2, s2, tsel, tcl, tcu = t
    p = b1 * b2
    zq, zrh, zrl = c9_split(zt9)
    diff = jnp.abs(a2 * b1 - a1 * b2)
    same_leq, _ = _leq_geq_chain(diff, p, zq, zrh, zrl)
    same_ok = (s1 == s2) & (s1 > 0) & (a1 > 0) & (a2 > 0) & same_leq

    up = s2 == s1 + 1
    down = s1 == s2 + 1
    adj = (up | down) & (jnp.minimum(s1, s2) > 0)
    lo = jnp.where(up, s1, s2)
    cond = (up & ((qcu & tcl) > 0)) | (down & ((qcl & tcu) > 0))

    leq_splits = [c9_split(2 * k + zt9) for k in PAIR_K9]
    geq_splits = [c9_split(max(2 * k - zt9, 0)) for k in PAIR_K9]
    is_even = (lo == 2) | (lo == 4)
    q_c = jnp.where(is_even, _select_by_lo(lo, [g[0] for g in geq_splits]),
                    _select_by_lo(lo, [l[0] for l in leq_splits]))
    rh_c = jnp.where(is_even, _select_by_lo(lo, [g[1] for g in geq_splits]),
                     _select_by_lo(lo, [l[1] for l in leq_splits]))
    rl_c = jnp.where(is_even, _select_by_lo(lo, [g[2] for g in geq_splits]),
                     _select_by_lo(lo, [l[2] for l in leq_splits]))
    u = a1 * b2 + a2 * b1
    leq, geq = _leq_geq_chain(u, p, q_c, rh_c, rl_c)
    gap_ok = (is_even & geq) | (~is_even & leq)
    return ((qsel & tsel) > 0) & (same_ok | (adj & cond & gap_ok))


# --- packed-constant fast predicate -----------------------------------
# The staged-quotient triple (Q, Rhi, Rlo) of every comparison constant
# fits one int32 as (Q<<20)|(Rhi<<6)|Rlo when Q <= 2047 (Rhi < 15625
# needs 14 bits, Rlo < 64 needs 6). Q = c9 // 1e6 and the largest c9 is
# 2*max(PAIR_K9) + zt9 = 1_992_156_862 + zt9, so the packing is valid
# for zt9 <= 54_000_000 (pixColorFluctuation <= 5.4 — every production
# config; 1.0/2.0 are the reference CLI values). Larger zt9 falls back
# to the general predicate. Packing lets ONE 4-select chain deliver all
# three constants (instead of three chains), and the same/adjacent cases
# share ONE staged comparison by selecting (input, constant) pairs.
_PACK_ZT9_MAX = 54_000_000


def _pack_c9(c9: int) -> int:
    q, rh, rl = c9_split(c9)
    assert q <= 2047, c9
    return (q << 20) | (rh << 6) | rl


def _match_unpacked_fast(q, t, zt9: int):
    """Exact-match predicate, packed-constant form (zt9-gated).

    Identical results to _match_unpacked (pinned by the engine
    crosscheck tests); ~35 fewer vector ops per (pixel, variant):
    - same-sector and adjacent-pair comparisons share one staged
      rational chain by selecting the (numerator, constant) inputs;
    - the per-lo constants arrive via one packed-int32 select chain.
    """
    b1, a1, s1, qsel, qcl, qcu = q
    b2, a2, s2, tsel, tcl, tcu = t
    p = b1 * b2
    x = a1 * b2
    y = a2 * b1
    same = s1 == s2
    up = s2 == s1 + 1
    down = s1 == s2 + 1
    adj = (up | down) & (jnp.minimum(s1, s2) > 0)
    lo = jnp.where(up, s1, s2)

    # merged per-lo constants: even lo compares >= (2k - zt9), odd lo
    # compares <= (2k + zt9)  [see _match_unpacked]
    packed = [
        _pack_c9(max(2 * k - zt9, 0)) if (i % 2 == 0)
        else _pack_c9(2 * k + zt9)
        for i, k in enumerate(PAIR_K9, start=1)
    ]
    cpk = _select_by_lo(lo, packed)
    cpk = jnp.where(same, _pack_c9(zt9), cpk)
    qc = cpk >> 20
    rhc = (cpk >> 6) & 0x3FFF
    rlc = cpk & 0x3F

    # shared staged chain on selected numerator: |y-x| <= zt9*p (same)
    # vs (x+y) <=/>= c*p (adjacent)
    num = jnp.where(same, jnp.abs(y - x), x + y)
    d = num * 1000 - qc * p
    e = d * 15625 - rhc * p
    in_d = (d >= 0) & (d <= 65601)
    in_e = (e >= 0) & (e <= 65601)
    e_band = 64 * jnp.where(in_e, e, 0)
    rv = rlc * p
    leq_e = (e < 0) | (in_e & (e_band <= rv))
    geq_e = (e >= 0) & ((e_band >= rv) | ~in_e)
    leq = (d < 0) | (in_d & leq_e)
    geq = (d >= 0) & (geq_e | ~in_d)

    same_ok = same & (s1 > 0) & (a1 > 0) & (a2 > 0) & leq
    cond = (up & ((qcu & tcl) > 0)) | (down & ((qcl & tcu) > 0))
    is_even = (lo == 2) | (lo == 4)
    gap_ok = (is_even & geq) | (~is_even & leq)
    return ((qsel & tsel) > 0) & (same_ok | (adj & cond & gap_ok))


def _match_unpacked_fast2(q, t, zt9: int):
    """Exact-match predicate, f32-product form (zt9-gated like
    _match_unpacked_fast; bit-identical results — pinned by the engine
    crosscheck and golden tests).

    v5e has no native int32 vector multiply (emulated at ~5x an add,
    measured) but f32 multiply is native, and every product here is
    exact in f32: a,b <= 255 so p=b1*b2, x=a1*b2, y=a2*b1 <= 65025 and
    num = x+y <= 130050 < 2^24; rlc < 64 so rv = rlc*p <= 4.16e6 < 2^24;
    e_band = 64*e <= 64*65601 = 4.2e6 < 2^24. The three staged-chain
    multiplies whose magnitudes exceed 2^24 (num*1000, qc*p, rhc*p,
    d*15625) stay int32. Also folds min(s1,s2) into lo and selects the
    adjacency flags before the AND (2 selects replace 4 ANDs/ORs).
    """
    b1, a1, s1, qsel, qcl, qcu = q
    b2, a2, s2, tsel, tcl, tcu = t
    b1f = b1.astype(jnp.float32)
    a1f = a1.astype(jnp.float32)
    b2f = b2.astype(jnp.float32)
    a2f = a2.astype(jnp.float32)
    pf = b1f * b2f
    xf = a1f * b2f
    yf = a2f * b1f
    p = pf.astype(jnp.int32)
    same = s1 == s2
    up = s2 == s1 + 1
    down = s1 == s2 + 1
    lo = jnp.where(up, s1, s2)       # = min(s1, s2) for adjacent pairs
    adj_ok = (up | down) & (lo > 0)

    packed = [
        _pack_c9(max(2 * k - zt9, 0)) if (i % 2 == 0)
        else _pack_c9(2 * k + zt9)
        for i, k in enumerate(PAIR_K9, start=1)
    ]
    cpk = _select_by_lo(lo, packed)
    cpk = jnp.where(same, _pack_c9(zt9), cpk)
    qc = cpk >> 20
    rhc = (cpk >> 6) & 0x3FFF
    rlcf = (cpk & 0x3F).astype(jnp.float32)

    # |y-x| and x+y are exact in f32; one convert instead of two
    numf = jnp.where(same, jnp.abs(yf - xf), xf + yf)
    num = numf.astype(jnp.int32)
    d = num * 1000 - qc * p
    e = d * 15625 - rhc * p
    in_d = (d >= 0) & (d <= 65601)
    in_e = (e >= 0) & (e <= 65601)
    e_band = (64 * jnp.where(in_e, e, 0)).astype(jnp.float32)
    rv = rlcf * pf                   # exact: rlc < 64, p <= 65025
    leq_e = (e < 0) | (in_e & (e_band <= rv))
    geq_e = (e >= 0) & ((e_band >= rv) | ~in_e)
    leq = (d < 0) | (in_d & leq_e)
    geq = (d >= 0) & (geq_e | ~in_d)

    same_ok = same & (s1 > 0) & (a1 > 0) & (a2 > 0) & leq
    # select the direction's flag pair, then one AND (replaces two
    # 3-way conjunctions + OR)
    fq = jnp.where(up, qcu, qcl)
    ft = jnp.where(up, tcl, tcu)
    cond = (fq & ft) > 0
    is_even = (lo & 1) == 0          # lo in {2,4} among {1..5}
    # boolean algebra, NOT jnp.where: select_n on i1 vectors lowers to
    # an i8->i1 arith.trunci that Mosaic rejects on real HW ("Unsupported
    # target bitwidth for truncation") while the interpreter accepts it
    gap_ok = (is_even & geq) | (~is_even & leq)
    return ((qsel & tsel) > 0) & (same_ok | (adj_ok & cond & gap_ok))


# PROFILING ONLY (scripts/profile_exact_phase.py): replaces the hue-gap
# predicate with the bare selection AND, to attribute exact-phase cost
# between DMA/loads/accumulate and predicate compute. Scores are WRONG
# with this on; toggled via module attribute + jax.clear_caches().
_NULL_PRED = __import__("os").environ.get("CMS_NULL_PREDICATE") == "1"
# predicate form A/B: 1 = f32-product form (default), 0 = int-only form
_F32_PRED = __import__("os").environ.get("CMS_F32_PRED", "1") == "1"
# ratio-interval predicate (cds/ratio_bounds.py): host-precomputed f32
# decision bounds collapse the staged-rational chain to f32 compares +
# boolean algebra, and the per-target ratio plane is computed once per
# WINDOW instead of once per variant. Bit-identical (test_ratio_bounds,
# test_pixel_pallas ratio crosschecks) and MEASURED x1.503 on the real
# chip (scripts/profile_ratio_ab.py, 23.8K vs 15.8K survivor-pairs/s,
# scores bit-identical on HW) — default ON; set CMS_RATIO_PRED=0 for
# the f32-product form.
_RATIO_PRED = __import__("os").environ.get("CMS_RATIO_PRED", "1") == "1"


def _ratio_consts(qc, qf):
    """Per-grid-step query vregs for the ratio predicate (qc [8,128]
    int32 packed compare constants, qf [4,8,128] f32 bounds — see
    ratio_bounds.query_ratio_planes)."""
    return dict(
        sc=qc & 31, uc=(qc >> 5) & 31, dc=(qc >> 10) & 63,
        gup=((qc >> 16) & 1) > 0, gdn=((qc >> 17) & 1) > 0,
        L=qf[0], U=qf[1], cup=qf[2], cdn=qf[3])


def _ratio_prep(w, rfb, fb):
    """Unpack one packed window [wh, ww] into the shared-by-all-variants
    ratio plane (a2==0 -> -1 sentinel) and flag-field plane."""
    a2 = (w >> 8) & 0xFF
    rf = a2.astype(jnp.float32) / (w & 0xFF).astype(jnp.float32)
    rfb[...] = jnp.where(a2 == 0, jnp.float32(-1.0), rf)
    fb[...] = w >> 16


def _ratio_match(rf, fw, C):
    """Exact hue-gap predicate over the prepped planes: 3 masked
    equality checks (sector+sel+precondition in one compare) + 4 f32
    compares against exactly-placed bounds. Boolean algebra only —
    select_n on i1 vectors emits an i8->i1 trunc Mosaic rejects."""
    same_ok = ((fw & 15) == C["sc"]) & (rf >= C["L"]) & (rf <= C["U"])
    up_ok = ((fw & 31) == C["uc"]) & ((rf <= C["cup"]) ^ C["gup"])
    dn_ok = ((fw & 47) == C["dc"]) & ((rf <= C["cdn"]) ^ C["gdn"])
    return same_ok | up_ok | dn_ok


def _match_predicate(q, t, zt9: int):
    """zt9-gated dispatch between the packed-constant fast predicates
    and the general staged form (identical results every way)."""
    if _NULL_PRED:
        return (q[3] & t[3]) > 0
    if zt9 <= _PACK_ZT9_MAX:
        if _F32_PRED:
            return _match_unpacked_fast2(q, t, zt9)
        return _match_unpacked_fast(q, t, zt9)
    return _match_unpacked(q, t, zt9)


@dataclass
class ActiveTiles:
    """Host-prepared active-tile decomposition of one query."""
    q_tiles: np.ndarray   # int32 [K, TILE_H, TILE_W]
    coords: np.ndarray    # int32 [K, 3]: window origin (row, col), n_active
    n_active: int
    query_size: int
    height: int
    width: int
    # ratio-predicate query planes (None unless built with zt9):
    q_cmp: Optional[np.ndarray] = None   # int32 [K, TILE_H, TILE_W]
    q_f32: Optional[np.ndarray] = None   # f32 [K, 4, TILE_H, TILE_W]


def build_active_tiles(planes: QueryPlanes, pad: int,
                       zt9: Optional[int] = None) -> ActiveTiles:
    """Decompose packed query planes into active 8x128 tiles.

    coords are 3x3 super-tile window ORIGINS in the ring-padded target
    frame (frame[r, c] = t[r - 8, c - 128]): the window for tile
    (ty, tx) starts at (ty*8, tx*128) and spans 24 x 384, so the query
    tile sits at window rows [8, 16), cols [128, 256) and shift (dx, dy)
    becomes the static slice offset (8+dy, 128+dx).
    """
    words = planes.words
    h, w = words.shape
    gh = -(-h // TILE_H)
    gw = -(-w // TILE_W)
    padded = np.zeros((gh * TILE_H, gw * TILE_W), dtype=np.int32)
    padded[:h, :w] = words
    sel = (padded >> 19) & 1
    tiles = padded.reshape(gh, TILE_H, gw, TILE_W)
    active = tiles.transpose(0, 2, 1, 3).reshape(gh * gw, TILE_H, TILE_W)
    tile_sel = sel.reshape(gh, TILE_H, gw, TILE_W).any(axis=(1, 3)).reshape(-1)
    idx = np.nonzero(tile_sel)[0]
    n_active = len(idx)
    # pad the tile count to one of two fixed buckets: K is a static
    # kernel shape, so per-mask counts would otherwise recompile the
    # kernel for every distinct mask. Padding steps beyond n_active are
    # skipped inside the kernel (no DMA, no compute).
    k = 128 if n_active <= 128 else 768
    q_tiles = np.zeros((k, TILE_H, TILE_W), dtype=np.int32)
    coords = np.zeros((k, 3), dtype=np.int32)
    coords[:, 2] = max(n_active, 1)
    for i, ti in enumerate(idx):
        ty, tx = divmod(int(ti), gw)
        q_tiles[i] = active[ti]
        # window origin in the padded plane: tile start; variant slices
        # add (pad+dy, pad+dx). The mirror window uses the SAME origin in
        # the x-flipped plane (the dense kernel slices flip(padded) at
        # identical coordinates).
        coords[i, 0] = ty * TILE_H
        coords[i, 1] = tx * TILE_W
    q_cmp = q_f32 = None
    if zt9 is not None:
        from .ratio_bounds import query_ratio_planes
        q_cmp, q_f32 = query_ratio_planes(q_tiles, zt9)
        q_f32 = np.ascontiguousarray(q_f32.transpose(1, 0, 2, 3))
    return ActiveTiles(q_tiles=q_tiles, coords=coords, n_active=n_active,
                       query_size=planes.query_size, height=h, width=w,
                       q_cmp=q_cmp, q_f32=q_f32)


def _dev_ctx(device):
    """Placement context: arrays created/jitted inside go to `device`
    (None = the process default device; unchanged single-device path)."""
    return (jax.default_device(device) if device is not None
            else contextlib.nullcontext())


NV_PAD = 32  # accumulator sublanes (>= 2 * n_shifts)

# device-side blocked-build granularity: the tunneled TPU shares HBM
# with other tenants, so any single XLA program with a multi-GB working
# set fails nondeterministically with RESOURCE_EXHAUSTED; build big
# resident arrays in ~64-target blocks placed via donated in-place
# updates (working set = resident out + one block)
DEVICE_BLOCK = int(__import__("os").environ.get("CMS_DEVICE_BLOCK", "64"))


@functools.partial(jax.jit, static_argnames=("n_flat",))
def _scatter_words(idx, vals, n_flat):
    # empty/sub-threshold pixels pack to word 1 (bden clamps to 1), so
    # the scatter fill is 1; padding entries repeat the last real pair
    # (same index, same value — order-independent)
    base = jnp.full((n_flat,), 1, jnp.int32)
    return base.at[idx].set(vals, indices_are_sorted=True)


@functools.partial(jax.jit, donate_argnums=(0,))
def _place_block(out, block, start):
    return jax.lax.dynamic_update_slice(
        out, block, (start,) + (0,) * (out.ndim - 1))


@functools.partial(jax.jit, static_argnames=("spec",))
def _pad_block(wb, spec):
    # NB: the flip must happen on the RAW w-wide plane before the
    # (asymmetric) tile-alignment padding, so flip_x sampling maps to
    # t[w-1-x-dx] exactly as in the dense kernel's symmetric frame.
    return (jnp.pad(wb, spec, constant_values=1),
            jnp.pad(wb[:, :, ::-1], spec, constant_values=1))


def _make_kernel(shifts, pad: int, zt9: int, n_k: int, tb: int, tg: int,
                 ratio: bool = False):
    assert tb % tg == 0
    if ratio:
        assert tg == 1, "ratio predicate uses per-target window prep"
    # tile-aligned 3x3 super-tile window: Mosaic only slices HBM memrefs
    # at (8, 128)-tile granularity, so each step copies the full tile
    # ring around the query tile; variant slices offset from its center.
    # A block of tb targets shares each step: one slab DMA per window
    # amortizes DMA issue latency over tb * n_variants tile scorings.
    assert pad <= TILE_H
    win_h = 3 * TILE_H
    win_w = 3 * TILE_W
    n_shifts = len(shifts)
    nv = 2 * n_shifts
    assert nv <= NV_PAD

    def kernel(coords_ref, surv_ref, blk_ref, q_ref, t_hbm, tf_hbm, out_ref,
               acc, win_d, win_m, sems, qf_ref=None, rfb=None, fb=None):
        t = pl.program_id(0)
        k = pl.program_id(1)
        # block-level gate: a target block with NO survivor (e.g. the
        # padding tail of a compacted chunk) skips window DMA and the
        # whole body — its cost collapses to the scalar grid step
        alive = blk_ref[t] > 0

        def window_copies(slot, kk):
            ty = pl.multiple_of(coords_ref[kk, 0], TILE_H)
            tx = pl.multiple_of(coords_ref[kk, 1], TILE_W)
            d = pltpu.make_async_copy(
                t_hbm.at[pl.ds(t * tb, tb), pl.ds(ty, win_h), pl.ds(tx, win_w)],
                win_d.at[slot], sems.at[slot, 0])
            m = pltpu.make_async_copy(
                tf_hbm.at[pl.ds(t * tb, tb), pl.ds(ty, win_h), pl.ds(tx, win_w)],
                win_m.at[slot], sems.at[slot, 1])
            return d, m

        def start_window(slot, kk):
            d, m = window_copies(slot, kk)
            d.start()
            m.start()

        def wait_window(slot, kk):
            d, m = window_copies(slot, kk)
            d.wait()
            m.wait()

        slot = jax.lax.rem(k, 2)
        n_act = coords_ref[0, 2]

        @pl.when(k == 0)
        def _():
            acc[...] = jnp.zeros((tb, NV_PAD, TILE_W), dtype=jnp.int32)

        @pl.when(alive & (k == 0))
        def _():
            start_window(0, 0)

        @pl.when(alive & (k + 1 < n_act))
        def _():
            start_window(1 - slot, k + 1)

        @pl.when(alive & (k < n_act))
        def _():
            wait_window(slot, k)

        if ratio:
            C = _ratio_consts(q_ref[0], qf_ref[0])

            def variant_loop(win, g0, base_vi):
                # slices of the per-window prepped planes (rfb/fb are
                # filled right before this under the same @pl.when)
                for vi, (dx, dy) in enumerate(shifts):
                    r0, c0 = TILE_H + dy, TILE_W + dx
                    rf = rfb[r0:r0 + TILE_H, c0:c0 + TILE_W]
                    fw = fb[r0:r0 + TILE_H, c0:c0 + TILE_W]
                    m = _ratio_match(rf, fw, C).astype(jnp.int32)
                    acc[g0, base_vi + vi, :] += m.sum(axis=0)
        else:
            q = _unpack(q_ref[0])

            def variant_loop(win, g0, base_vi):
                # one packed VMEM load per variant, then unpack in
                # registers — keeps live vregs ~14 instead of holding 12
                # unpacked (24,384) planes (which spills). tg>1
                # vectorizes a [tg, 8, 128] target group per op
                # (measured SLOWER than the squeezed per-target load on
                # current Mosaic — grouped slices defeat its addressing;
                # kept for future re-tests)
                for vi, (dx, dy) in enumerate(shifts):
                    r0, c0 = TILE_H + dy, TILE_W + dx
                    if tg == 1:
                        # NB: a per-variant @pl.when empty-slice skip
                        # was measured at 1,957 pairs/s vs 4,165 without
                        # — 18 scalar branches per target stall the
                        # vector pipeline far more than the skipped
                        # multiplies cost. Signal skips stay at window
                        # granularity.
                        w = win[slot, g0, r0:r0 + TILE_H, c0:c0 + TILE_W]
                        m = _match_predicate(q, _unpack(w),
                                             zt9).astype(jnp.int32)
                        acc[g0, base_vi + vi, :] += m.sum(axis=0)
                    else:
                        w = win[slot, pl.ds(g0, tg), r0:r0 + TILE_H,
                                c0:c0 + TILE_W]
                        m = _match_predicate(q, _unpack(w),
                                             zt9).astype(jnp.int32)
                        acc[pl.ds(g0, tg), base_vi + vi, :] += m.sum(axis=1)

        def target_body(gi, _):
            # two early outs per target GROUP: (1) the MXU prescreen
            # marked every pair in the group provably below the keep
            # threshold; (2) no window in the group has an
            # above-threshold target pixel. Neuron signal covers a few
            # percent of the frame, so most (tile, group) pairs take
            # one of these.
            g0 = gi * tg
            surv = surv_ref[t * tb + g0]
            for j in range(1, tg):
                surv = jnp.maximum(surv, surv_ref[t * tb + g0 + j])
            any_d = jnp.max((win_d[slot, pl.ds(g0, tg)] >> 19) & 1)
            any_m = jnp.max((win_m[slot, pl.ds(g0, tg)] >> 19) & 1)

            @pl.when((surv > 0) & (any_d > 0))
            def _():
                if ratio:
                    _ratio_prep(win_d[slot, g0], rfb, fb)
                variant_loop(win_d, g0, 0)

            @pl.when((surv > 0) & (any_m > 0))
            def _():
                if ratio:
                    _ratio_prep(win_m[slot, g0], rfb, fb)
                variant_loop(win_m, g0, n_shifts)

            return 0

        @pl.when(alive & (k < n_act))
        def _():
            jax.lax.fori_loop(0, tb // tg, target_body, 0)

        @pl.when(k == n_k - 1)
        def _():
            out_ref[...] = acc[...]

    if ratio:
        def kernel_ratio(coords_ref, surv_ref, blk_ref, qc_ref, qf_ref,
                         t_hbm, tf_hbm, out_ref, acc, win_d, win_m, rfb, fb,
                         sems):
            kernel(coords_ref, surv_ref, blk_ref, qc_ref, t_hbm, tf_hbm,
                   out_ref, acc, win_d, win_m, sems, qf_ref=qf_ref,
                   rfb=rfb, fb=fb)
        return kernel_ratio, win_h, win_w, nv
    return kernel, win_h, win_w, nv


@functools.partial(jax.jit,
                   static_argnames=("zt9", "pad", "shifts_tuple", "tb",
                                    "tg", "interpret"))
def _compact_call(coords, survivors, q_tiles, t_padded, t_flipped, idx,
                  zt9: int, pad: int, shifts_tuple, tb: int, tg: int,
                  interpret: bool):
    """Survivor-compacted scoring as ONE dispatch: the two gathers feed
    the kernel inside a single jit, so no standalone gather buffers ever
    sit live in HBM and the tunnel pays one RPC per chunk, not five."""
    tp_c = jnp.take(t_padded, idx, axis=0)
    tf_c = jnp.take(t_flipped, idx, axis=0)
    return _active_tile_call.__wrapped__(
        coords, survivors, q_tiles, tp_c, tf_c, zt9, pad, shifts_tuple,
        tb, tg, interpret)


@functools.partial(jax.jit,
                   static_argnames=("zt9", "pad", "shifts_tuple", "tb",
                                    "tg", "interpret"))
def _active_tile_call(coords, survivors, q_tiles, t_padded, t_flipped,
                      zt9: int, pad: int, shifts_tuple, tb: int,
                      tg: int, interpret: bool):
    tsz = t_padded.shape[0]
    assert tsz % tb == 0, "target count must be a multiple of the block"
    n_k = q_tiles.shape[0]
    shifts = list(shifts_tuple)
    kernel, win_h, win_w, nv = _make_kernel(shifts, pad, zt9, n_k, tb, tg)

    blk = survivors.reshape(tsz // tb, tb).max(axis=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tsz // tb, n_k),
        in_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W), lambda t, k, c, s, b: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tb, NV_PAD, TILE_W),
                               lambda t, k, c, s, b: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tb, NV_PAD, TILE_W), jnp.int32),
            pltpu.VMEM((2, tb, win_h, win_w), jnp.int32),
            pltpu.VMEM((2, tb, win_h, win_w), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    lane_sums = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tsz, NV_PAD, TILE_W), jnp.int32),
        interpret=interpret,
    )(coords, survivors, blk, q_tiles, t_padded, t_flipped)
    return lane_sums.sum(axis=2)[:, :nv]  # [T, nv]


@functools.partial(jax.jit,
                   static_argnames=("zt9", "pad", "shifts_tuple", "tb",
                                    "tg", "interpret"))
def _compact_call_ratio(coords, survivors, q_cmp, q_f32, t_padded,
                        t_flipped, idx, zt9: int, pad: int, shifts_tuple,
                        tb: int, tg: int, interpret: bool):
    tp_c = jnp.take(t_padded, idx, axis=0)
    tf_c = jnp.take(t_flipped, idx, axis=0)
    return _active_tile_call_ratio.__wrapped__(
        coords, survivors, q_cmp, q_f32, tp_c, tf_c, zt9, pad,
        shifts_tuple, tb, tg, interpret)


@functools.partial(jax.jit,
                   static_argnames=("zt9", "pad", "shifts_tuple", "tb",
                                    "tg", "interpret"))
def _active_tile_call_ratio(coords, survivors, q_cmp, q_f32, t_padded,
                            t_flipped, zt9: int, pad: int, shifts_tuple,
                            tb: int, tg: int, interpret: bool):
    """Ratio-predicate variant of _active_tile_call: the query streams
    as (packed compare constants, f32 bound planes) instead of packed
    words, and the kernel gets the shared window-prep scratch."""
    tsz = t_padded.shape[0]
    assert tsz % tb == 0, "target count must be a multiple of the block"
    n_k = q_cmp.shape[0]
    shifts = list(shifts_tuple)
    kernel, win_h, win_w, nv = _make_kernel(shifts, pad, zt9, n_k, tb, tg,
                                            ratio=True)
    blk = survivors.reshape(tsz // tb, tb).max(axis=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tsz // tb, n_k),
        in_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W), lambda t, k, c, s, b: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, TILE_H, TILE_W),
                         lambda t, k, c, s, b: (k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tb, NV_PAD, TILE_W),
                               lambda t, k, c, s, b: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tb, NV_PAD, TILE_W), jnp.int32),
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
        out_shape=jax.ShapeDtypeStruct((tsz, NV_PAD, TILE_W), jnp.int32),
        interpret=interpret,
    )(coords, survivors, blk, q_cmp, q_f32, t_padded, t_flipped)
    return lane_sums.sum(axis=2)[:, :nv]  # [T, nv]


class ActiveTilePixelEngine:
    """Active-tile Pallas pixel-match scorer for one query.

    Same scoring semantics and API as pixel_kernel.PixelMatchEngine;
    targets must be packed with this engine's prepare_targets
    (tile-aligned padded frame).
    """

    def __init__(self, query: Image, query_threshold: int, mirror_query: bool,
                 target_threshold: int, pix_color_fluctuation: float,
                 xy_shift: int, excluded: Optional[np.ndarray] = None,
                 interpret: bool = False):
        from .pixel_kernel import z_tolerance_to_zt9
        self.planes = prepare_query_planes(query, query_threshold, excluded)
        self.mirror_query = mirror_query
        self.target_threshold = target_threshold
        self.zt9 = z_tolerance_to_zt9(pix_color_fluctuation)
        self.xy_shift = xy_shift
        self.pad = max(xy_shift, 1)
        self.shifts = tuple(shift_ring_offsets(xy_shift))
        self.interpret = interpret
        # targets scored per kernel step; one slab DMA per step amortizes
        # DMA latency over target_block * n_variants tile scorings.
        # target_group = targets vectorized per VPU op inside the step
        # (signal-skip granularity coarsens to the group)
        self.target_block = 16
        import os as _os
        self.target_group = int(_os.environ.get("CMS_TARGET_GROUP", "1"))
        self._sparse_feed = _os.environ.get("CMS_SPARSE_FEED", "1") == "1"
        self.ratio = _RATIO_PRED
        self.tiles = build_active_tiles(self.planes, self.pad,
                                        self.zt9 if self.ratio else None)
        self._dev_query = {}  # device (None = default) -> query arrays

    def _pack_block(self, t_block_u8):
        from .pixel_kernel import pack_planes
        t = jnp.asarray(t_block_u8)
        r = t[..., 0].astype(jnp.int32)
        g = t[..., 1].astype(jnp.int32)
        b = t[..., 2].astype(jnp.int32)
        above = ((r > self.target_threshold) | (g > self.target_threshold)
                 | (b > self.target_threshold))
        return pack_planes(r, g, b, above, jnp)

    def _pack_block_sparse(self, t_block_u8: np.ndarray):
        """Sparse host->device feed: CDM frames are a few percent
        occupied, so uploading only (flat index, word) pairs of the
        above-threshold pixels cuts the tunnel transfer ~10-30x; words
        equal the dense pack except sub-threshold pixels canonicalize to
        the empty word 1 (score-invariant: the predicate, prescreen bins
        and window skip all gate on the sel bit). Returns None when the
        block is too dense to benefit."""
        from ..native.mipops import sparse_pack_block
        t, h, w = t_block_u8.shape[:3]
        idx, vals = sparse_pack_block(t_block_u8, self.target_threshold)
        n = len(idx)
        if n > (t * h * w) // 4:
            return None  # dense block: plain upload is cheaper
        cap = max(4096, 1 << int(np.ceil(np.log2(max(n, 1)))))
        idx_p = np.full(cap, idx[-1] if n else 0, np.int32)
        vals_p = np.full(cap, vals[-1] if n else 1, np.int32)
        idx_p[:n] = idx
        vals_p[:n] = vals
        flat = _scatter_words(jnp.asarray(idx_p), jnp.asarray(vals_p),
                              t * h * w)
        return flat.reshape(t, h, w)

    # sparse-feed granularity. MEASURED (bench twophase, real chip):
    # 256-target super-blocks (one scatter per partition) ran pack_words
    # at 23-45s vs 7-18s for the 64-target default — one fat
    # upload+scatter pipelines WORSE over the tunnel than 4 smaller
    # ones, so the default stays at DEVICE_BLOCK; the knob remains for
    # re-testing on direct-attached TPUs where dispatch latency is low.
    PACK_SUPER = int(__import__("os").environ.get("CMS_PACK_SUPER", "64"))

    def pack_raw_words(self, targets_u8: np.ndarray, device=None):
        """Device-packed [T, H, W] scorer words (unpadded frame); also
        the input for the MXU prescreen's target features. Sparse data
        is fed in PACK_SUPER-target single-scatter super-blocks; dense
        blocks fall back to DEVICE_BLOCK-target dense sub-programs
        (see _place_block). CMS_SPARSE_FEED=0 disables the sparse path."""
        tsz, h, w = targets_u8.shape[:3]
        sparse_ok = (self._sparse_feed and isinstance(targets_u8, np.ndarray)
                     and targets_u8.dtype == np.uint8)

        def block(tb):
            if sparse_ok:
                out = self._pack_block_sparse(tb)
                if out is not None:
                    return out
            return self._pack_block_dense_blocked(tb)

        with _dev_ctx(device):
            sup = max(self.PACK_SUPER, DEVICE_BLOCK) if sparse_ok \
                else DEVICE_BLOCK
            if tsz <= sup:
                return block(targets_u8)
            out = jnp.zeros((tsz, h, w), jnp.int32)
            for i in range(0, tsz, sup):
                out = _place_block(out, block(targets_u8[i:i + sup]), i)
            return out

    def _pack_block_dense_blocked(self, t_block_u8):
        """Dense fallback, bounded at DEVICE_BLOCK-target sub-programs
        (a dense pack materializes per-channel int32 temps, so big
        blocks would spike the working set on the shared-HBM chip)."""
        tsz = t_block_u8.shape[0]
        if tsz <= DEVICE_BLOCK:
            return self._pack_block(t_block_u8)
        h, w = t_block_u8.shape[1:3]
        out = jnp.zeros((tsz, h, w), jnp.int32)
        for i in range(0, tsz, DEVICE_BLOCK):
            out = _place_block(
                out, self._pack_block(t_block_u8[i:i + DEVICE_BLOCK]), i)
        return out

    def pad_from_words(self, words, device=None):
        """Tile-aligned ring-padded frame (+ x-flip) from raw words.
        Blocked like pack_raw_words to bound per-program working sets."""
        tsz, h, w = words.shape
        gh = -(-h // TILE_H)
        gw = -(-w // TILE_W)
        # one full tile ring of padding on every side keeps each 3x3
        # super-tile window in-bounds AND (8, 128)-aligned for HBM DMA
        spec = ((0, 0), (TILE_H, gh * TILE_H - h + TILE_H),
                (TILE_W, gw * TILE_W - w + TILE_W))
        with _dev_ctx(device):
            blk = DEVICE_BLOCK
            if tsz <= blk:
                return _pad_block(words, spec)
            hp, wp = gh * TILE_H + 2 * TILE_H, gw * TILE_W + 2 * TILE_W
            padded = jnp.zeros((tsz, hp, wp), jnp.int32)
            flipped = jnp.zeros((tsz, hp, wp), jnp.int32)
            for i in range(0, tsz, blk):
                pb, fb = _pad_block(words[i:i + blk], spec)
                padded = _place_block(padded, pb, i)
                flipped = _place_block(flipped, fb, i)
            return padded, flipped

    def prepare_targets(self, targets_u8: np.ndarray, device=None):
        """Pack targets into the tile-aligned padded frame (+ x-flip)."""
        return self.pad_from_words(self.pack_raw_words(targets_u8, device),
                                   device)

    def _query_dev(self, device=None):
        """Device-cached query arrays — uploaded once per engine per
        device (keyed by device; None = process default). Standard:
        (coords, q_tiles); ratio: (coords, q_cmp, q_f32)."""
        got = self._dev_query.get(device)
        if got is None:
            if self.ratio:
                host = (self.tiles.coords, self.tiles.q_cmp,
                        self.tiles.q_f32)
            else:
                host = (self.tiles.coords, self.tiles.q_tiles)
            if device is None:
                got = tuple(jnp.asarray(a) for a in host)
            else:
                got = tuple(jax.device_put(a, device) for a in host)
            self._dev_query[device] = got
        return got

    def _call_kernel(self, t_padded, t_flipped, surv, device=None):
        """Raw per-variant sums [tsz, 2*S] for one packed block (DEVICE
        array — caller converts; keeping it deferred lets a mask sweep
        queue many kernel launches without a host sync per mask)."""
        tsz = t_padded.shape[0]
        tb = self.target_block
        while tsz % tb:
            tb //= 2  # fall back to a divisor (tsz padded to tb upstream)
        tb = max(tb, 1)
        tg = self.target_group
        while tb % tg:
            tg //= 2
        with _dev_ctx(device):
            if self.ratio:
                coords, q_cmp, q_f32 = self._query_dev(device)
                return _active_tile_call_ratio(
                    coords, surv, q_cmp, q_f32, t_padded, t_flipped,
                    self.zt9, self.pad, self.shifts, tb, 1, self.interpret)
            coords, q_tiles = self._query_dev(device)
            return _active_tile_call(
                coords, surv, q_tiles,
                t_padded, t_flipped, self.zt9, self.pad, self.shifts,
                tb, max(tg, 1), self.interpret)

    # survivor-compaction chunk: ONE extra static kernel shape (tsz=64)
    # shared by every mask/partition, per the one-compile-per-shape
    # discipline (remote TPU compiles are minutes and uncached across
    # processes — see ROADMAP). 64 keeps the per-chunk gather small
    # (2 x 64 x window-frame ~ 0.5 GB HBM traffic) and the dead padding
    # blocks beyond the survivor count skip their window DMA anyway.
    COMPACT_CHUNK = int(__import__("os").environ.get("CMS_COMPACT_CHUNK",
                                                     "64"))

    def score_packed_deferred(self, packed, survivors=None, device=None):
        """Launch the exact sweep and return a callable DeferredScore.

        survivors: optional uint8/int32 [T] bitmap from the MXU
        prescreen; zero entries skip the exact sweep (their scores are
        reported as 0, which is correct for any pair the screen's upper
        bound already placed below the keep threshold).

        When the screen kills most of the block, the surviving targets
        are COMPACTED: gathered (inside the same dispatch as the kernel)
        into fixed chunks whose dead padding blocks skip even the window
        DMA, so the kernel's cost is paid per survivor, not per target.
        All device work is queued up front — a mask sweep launches every
        mask's scoring, then drains all results in ONE device round-trip
        via drain_deferred()."""
        t_padded, t_flipped = packed
        tsz = t_padded.shape[0]
        pending = []  # (dest_idx or None, device_out, n_real, row0)
        surv_np = None
        if survivors is None:
            with _dev_ctx(device):
                ones = jnp.ones((tsz,), jnp.int32)
            pending.append((None, self._call_kernel(
                t_padded, t_flipped, ones, device), tsz, 0))
        else:
            surv_np = np.asarray(survivors).astype(np.int32)
            idx = np.nonzero(surv_np)[0]
            ns = len(idx)
            ck = self.COMPACT_CHUNK
            if ns == 0:
                pass
            elif ns <= tsz // 4 and tsz > ck:
                qd = self._query_dev(device)
                tb = min(self.target_block, ck)
                tg = self.target_group
                while tb % tg:
                    tg //= 2
                padded_n = -(-ns // ck) * ck
                idx_pad = np.zeros(padded_n, dtype=np.int32)
                idx_pad[:ns] = idx
                for c0 in range(0, padded_n, ck):
                    surv_c = np.zeros(ck, dtype=np.int32)
                    surv_c[:max(ns - c0, 0)] = 1
                    with _dev_ctx(device):
                        if self.ratio:
                            oc = _compact_call_ratio(
                                qd[0], surv_c, qd[1], qd[2], t_padded,
                                t_flipped, idx_pad[c0:c0 + ck], self.zt9,
                                self.pad, self.shifts, tb, 1,
                                self.interpret)
                        else:
                            oc = _compact_call(
                                qd[0], surv_c, qd[1], t_padded, t_flipped,
                                idx_pad[c0:c0 + ck], self.zt9, self.pad,
                                self.shifts, tb, max(tg, 1), self.interpret)
                    real = min(ck, ns - c0)
                    pending.append((idx_pad[c0:c0 + real], oc, real, 0))
            else:
                with _dev_ctx(device):
                    surv_dev = jnp.asarray(surv_np)
                pending.append((None, self._call_kernel(
                    t_padded, t_flipped, surv_dev, device), tsz, 0))
        return DeferredScore(self, tsz, pending, surv_np)

    def score_packed(self, packed, survivors=None
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        return self.score_packed_deferred(packed, survivors)()

    def score_batch(self, targets_u8: np.ndarray):
        return self.score_packed(self.prepare_targets(targets_u8))


class DeferredScore:
    """Handle for an in-flight exact sweep (one mask x one target block).

    The kernel launches are already queued on device when this object is
    constructed; calling it pulls the per-variant sums to host and
    reduces them to (best_scores int64[T], ratios f64[T], mirrored
    bool[T]). Results are cached — calling twice is free.

    For a mask sweep, prefer drain_deferred(list_of_deferred): it fetches
    every pending device buffer across all masks in ONE jax.device_get
    (one tunnel round-trip) instead of one sync per mask.
    """

    def __init__(self, engine, tsz, pending, surv_np):
        self._engine = engine
        self._tsz = tsz
        # [(dest_idx or None, device_out, n_real, row0)] — device_out may
        # be SHARED across DeferredScores (multi-mask launches slice one
        # output buffer by row span; drain_deferred dedups the fetch)
        self._pending = pending
        self._surv_np = surv_np
        self._result = None

    def device_outputs(self):
        return [dev for _, dev, _, _ in self._pending]

    def finalize(self, hosts):
        """Reduce already-fetched host arrays (same order as
        device_outputs()) to the scoring triple."""
        if self._result is not None:
            return self._result
        eng = self._engine
        n = len(eng.shifts)
        out = np.zeros((self._tsz, 2 * n), dtype=np.int64)
        for (dest, _, real, row0), host in zip(self._pending, hosts):
            host = np.asarray(host)
            if dest is None:
                out[:] = host
            else:
                out[dest] = host[row0:row0 + real]
        if self._surv_np is not None:
            # the in-kernel skip is group-granular (target_group); zero
            # non-survivor rows so the reported scores match the
            # per-target contract exactly
            out = out * self._surv_np.astype(np.int64)[:, None]
        direct = out[:, :n].max(axis=1)
        if eng.mirror_query:
            mirror = out[:, n:].max(axis=1)
            best = np.maximum(direct, mirror)
            mirrored = mirror > direct
        else:
            best = direct
            mirrored = np.zeros_like(direct, dtype=bool)
        if eng.tiles.query_size == 0:
            z = np.zeros_like(best)
            self._result = (z, np.zeros_like(best, dtype=np.float64),
                            mirrored)
        else:
            ratios = best.astype(np.float64) / float(eng.tiles.query_size)
            self._result = (best.astype(np.int64), ratios, mirrored)
        return self._result

    def __call__(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        if self._result is None:
            self.finalize(jax.device_get(self.device_outputs()))
        return self._result


def drain_deferred(deferreds):
    """Drain many DeferredScores with ONE device round-trip.

    Batches every pending output buffer into a single jax.device_get —
    over the tunneled TPU each device_get costs a full RPC round-trip,
    so a 512-mask sweep drains ~512x fewer syncs this way. Buffers
    shared by several deferreds (multi-mask launch outputs) are fetched
    once."""
    flat, seen, spans = [], {}, []
    for d in deferreds:
        outs = d.device_outputs() if d._result is None else []
        ids = []
        for o in outs:
            key = id(o)
            if key not in seen:
                seen[key] = len(flat)
                flat.append(o)
            ids.append(seen[key])
        spans.append(ids)
    hosts = jax.device_get(flat) if flat else []
    return [d.finalize([hosts[i] for i in ids])
            if d._result is None else d._result
            for d, ids in zip(deferreds, spans)]
