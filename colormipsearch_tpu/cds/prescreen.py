"""MXU prescreen: a provable upper bound on pixel-match scores.

Two-phase exact search (ROADMAP item 1). Phase 1 bounds every
(mask, target) pair's best-variant score with one MXU matmul; only
pairs whose bound clears the keep threshold (score > 0 and
ratio > pctPositivePixels/100, ColorMIPSearch.java:42-46) reach the
exact active-tile kernel. Phase 2 is unchanged, so results are
bit-identical with the screen on or off.

The bound: quantize each pixel's hue state into B_SECT x NB bins
(sector, ratio decile). For any shift/mirror variant,

  score = sum_p [qsel(p)] [tsel(p+o)] [gap-ok(q(p), t(p+o))]
       <= sum_{tiles τ} sum_{bins j} u[τ, j] * w01[τ, j]

where u[τ, j] counts query pixels of bin j in 8x128 tile τ, and
w01[τ, j] = 1 iff the shift-expanded tile τ⊕xyshift contains ANY
above-threshold target pixel whose bin is gap-compatible with j (the
compat relation is a superset of the exact predicate by interval
arithmetic over bin edges — see compat_matrix). The right side is the
inner product of a per-mask feature vector and a per-target 0/1 feature
vector: bounds for a (mask block x target block) are one
[B, F] @ [F, T] matmul, F = ntiles * n_bins. Mirror variants use the
same u against features of the x-flipped target.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pixel_kernel import PAIR_K9

NB = 10          # ratio bins per sector (width 0.1 >= any sane zTolerance)
N_SECT = 6
N_BINS = N_SECT * NB
TILE_H = 8
TILE_W = 128
# spatial feature granularity: SUBTILE_W-pixel column slices of each
# 8x128 tile. The exact kernel's shifts reach only +-xyShift (2) pixels,
# so a 128-px-wide presence cell lets target signal ~130 px away
# validate a query pixel; 16-px cells cut that slack 8x. Counts per cell
# stay <= TILE_H*SUBTILE_W = 128, which bf16 represents exactly — the
# bound matmul runs native-bf16 on the MXU with f32 accumulation
# (exact: integer products, partial sums < 2^24).
SUBTILE_W = int(__import__("os").environ.get("CMS_PRESCREEN_SUBW", "16"))


@functools.lru_cache(maxsize=8)
def compat_matrix(zt9: int) -> np.ndarray:
    """bool [N_BINS, N_BINS]: could ANY query pixel in bin jq match ANY
    target pixel in bin jt under the exact gap predicate? Computed with
    interval arithmetic over bin edges, erring on the inclusive side.

    Exact predicate recap (AbstractColorDepthSearchAlgorithm.java:260-388):
    - same sector: |r1 - r2| <= zTol, both ratios > 0
    - adjacent (lo, lo+1): side preconditions and
        lo odd:  r_lo-side < c_lo, r_hi-side < c_hi, r1 + r2 <= 2K + zTol
        lo even: both > 0.8,                      r1 + r2 >= 2K - zTol
      with (c_lo, c_hi) = (0.44, 0.54) for pair (1,2) and 0.7/0.7 for
      pairs (3,4), (5,6).
    """
    zt = zt9 / 1e9
    if zt > 1.0 / NB:
        raise ValueError("zTolerance exceeds the prescreen bin width")
    delta = 1.0 / NB
    compat = np.zeros((N_BINS, N_BINS), dtype=bool)

    def bin_range(j):
        rb = j % NB
        return rb * delta, (rb + 1) * delta  # [lo, hi)

    pair_k = {lo: PAIR_K9[lo - 1] / 1e9 for lo in range(1, 6)}
    for jq in range(N_BINS):
        sq = jq // NB + 1
        q_lo, q_hi = bin_range(jq)
        for jt in range(N_BINS):
            st = jt // NB + 1
            t_lo, t_hi = bin_range(jt)
            if sq == st:
                # |r1 - r2| <= zt possible iff intervals within zt
                # (inclusive comparisons: over-inclusion is free)
                if q_lo - zt <= t_hi and t_lo - zt <= q_hi:
                    compat[jq, jt] = True
                continue
            if abs(sq - st) != 1:
                continue
            lo = min(sq, st)
            k2 = 2 * pair_k[lo]
            if lo in (2, 4):
                # both ratios > 0.8 and r1 + r2 >= 2K - zt
                if q_hi >= 0.8 and t_hi >= 0.8 and q_hi + t_hi >= k2 - zt:
                    compat[jq, jt] = True
            else:
                if lo == 1:
                    c_q = 0.44 if sq == 1 else 0.54
                    c_t = 0.44 if st == 1 else 0.54
                else:
                    c_q = c_t = 0.7
                # both below their cutoffs and r1 + r2 <= 2K + zt
                if q_lo <= c_q and t_lo <= c_t and q_lo + t_lo <= k2 + zt:
                    compat[jq, jt] = True
    return compat


def bin_plane_from_words(words, xp=jnp):
    """Per-pixel bin id in [0, N_BINS) or -1 for unselected/no-sector
    pixels. `words` are packed scorer words (pixel_kernel layout)."""
    b = words & 0xFF
    a = (words >> 8) & 0xFF
    s = (words >> 16) & 0x7
    sel = (words >> 19) & 1
    # rbin via integer arithmetic: floor(a/b * NB) (b >= 1); clamp to NB-1
    rb = xp.minimum((a * NB) // xp.maximum(b, 1), NB - 1)
    bins = (s - 1) * NB + rb
    return xp.where((sel > 0) & (s > 0), bins, -1)


def query_features(words: np.ndarray) -> np.ndarray:
    """[npos * N_BINS] subtile-bin counts for a query (host);
    npos = gh * gw * (TILE_W // SUBTILE_W) row-major positions.
    uint8 when the cell size guarantees counts <= 255 (4x cheaper to
    upload/store than f32; the bound matmul upcasts on device)."""
    h, w = words.shape
    gh = -(-h // TILE_H)
    gw = -(-w // TILE_W)
    gwn = gw * (TILE_W // SUBTILE_W)
    padded = np.full((gh * TILE_H, gw * TILE_W), -1, dtype=np.int64)
    padded[:h, :w] = bin_plane_from_words(words.astype(np.int64), xp=np)
    tiles = padded.reshape(gh, TILE_H, gwn, SUBTILE_W).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(gh * gwn, TILE_H * SUBTILE_W)
    dt = np.uint8 if TILE_H * SUBTILE_W <= 255 else np.float32
    feats = np.zeros((gh * gwn, N_BINS), dtype=dt)
    for j in range(N_BINS):
        feats[:, j] = (tiles == j).sum(axis=1).astype(dt)
    return feats.reshape(-1)


@functools.partial(jax.jit,
                   static_argnames=("zt9", "xy_shift", "grid_hw", "flip"))
def target_features(t_words, zt9: int, xy_shift: int, grid_hw,
                    flip: bool = False) -> jnp.ndarray:
    """f32 [T, ntiles * N_BINS] compat-presence features (device).

    t_words: [T, H, W] packed target planes (unpadded frame).
    w01[τ, j] = 1 iff the (tile ⊕ xy_shift) region holds a target pixel
    whose bin k has compat[j, k]. flip=True computes the features of the
    x-mirrored frame (fused in-jit: the flipped frame is never
    materialized in HBM).
    """
    gh, gw = grid_hw
    tsz, h, w = t_words.shape
    pad = max(xy_shift, 0)
    # bin presence as TWO int32 bitmask planes (bins 0..29 / 30..59):
    # one OR-reduction over the expanded tile replaces 60 boolean passes
    words2 = _bitmask_planes(t_words, flip)  # [T, 2, H, W]
    if pad:
        # rectangular OR-dilation is separable: two 1-D passes do
        # 2*(2p+1) reads/px instead of (2p+1)^2
        words2 = jax.lax.reduce_window(
            words2, 0, jax.lax.bitwise_or,
            (1, 1, 2 * pad + 1, 1), (1, 1, 1, 1), "same")
        words2 = jax.lax.reduce_window(
            words2, 0, jax.lax.bitwise_or,
            (1, 1, 1, 2 * pad + 1), (1, 1, 1, 1), "same")
    gwn = gw * (TILE_W // SUBTILE_W)
    padded = jnp.zeros((tsz, 2, gh * TILE_H, gw * TILE_W), jnp.int32)
    padded = padded.at[:, :, :h, :w].set(words2)
    tiles = padded.reshape(tsz, 2, gh, TILE_H, gwn, SUBTILE_W)
    tile_or = jax.lax.reduce(tiles, np.int32(0), jax.lax.bitwise_or, (3, 5))
    tile_or = tile_or.reshape(tsz, 2, gh * gwn)  # [T, 2, npos]
    k_ids = jnp.arange(30, dtype=jnp.int32)
    pres_lo = ((tile_or[:, 0, :, None] >> k_ids) & 1)  # [T, npos, 30]
    pres_hi = ((tile_or[:, 1, :, None] >> k_ids) & 1)
    presence = jnp.concatenate([pres_lo, pres_hi], axis=-1).astype(jnp.float32)
    compat = jnp.asarray(compat_matrix(zt9).astype(np.float32))   # [J, K]
    w01 = (presence @ compat.T) > 0                               # [T, npos, J]
    # bf16 halves feature HBM and doubles MXU rate; exact because the
    # stored values are 0/1 (and the matched query counts are <= 256)
    dt = jnp.bfloat16 if TILE_H * SUBTILE_W <= 256 else jnp.float32
    return w01.astype(dt).reshape(tsz, -1)


def _bitmask_planes(t_words, flip: bool):
    """[T, 2, H, W] int32 bin-presence bitmask planes (bins 0..29 in
    plane 0, 30..59 in plane 1), undilated."""
    if flip:
        t_words = t_words[:, :, ::-1]
    bins = bin_plane_from_words(t_words)
    valid = bins >= 0
    lo_bit = jnp.where(valid & (bins < 30), jnp.int32(1) << jnp.where(
        bins < 30, jnp.maximum(bins, 0), 0), 0)
    hi_bit = jnp.where(valid & (bins >= 30), jnp.int32(1) << jnp.where(
        bins >= 30, bins - 30, 0), 0)
    return jnp.stack([lo_bit, hi_bit], axis=1)


@functools.partial(jax.jit, static_argnames=("zt9", "offsets", "grid_hw",
                                             "flip"))
def _variant_block_bounds(u, t_words, zt9: int, offsets, grid_hw,
                          flip: bool) -> jnp.ndarray:
    """Per-variant-max upper bounds [B, T'] for one target block.

    Tighter than the dilated single bound: for each shift offset
    o=(dx,dy) the exact kernel samples t(p.y+dy, p.x+dx), so
      score_o <= sum_C sum_j u[C, j] * [compat px present in C + (dy,dx)]
    and score = max_o score_o. The dilated bound lets every query PIXEL
    pick its own offset from the (2s+1)^2 window; taking the max of
    per-offset bounds enforces one global offset, which prunes pairs
    whose cells only match under inconsistent shifts. Per-offset
    features stay jit-internal (never materialized in HBM).
    """
    gh, gw = grid_hw
    tsz, h, w = t_words.shape
    words2 = _bitmask_planes(t_words, flip)
    pad = max((max(abs(dx), abs(dy)) for dx, dy in offsets), default=0)
    gwn = gw * (TILE_W // SUBTILE_W)
    # one padded canvas; each offset is a static slice of it
    canvas = jnp.zeros((tsz, 2, gh * TILE_H + 2 * pad, gw * TILE_W + 2 * pad),
                       jnp.int32)
    canvas = canvas.at[:, :, pad:pad + h, pad:pad + w].set(words2)
    compat = jnp.asarray(compat_matrix(zt9).astype(np.float32))   # [J, K]
    k_ids = jnp.arange(30, dtype=jnp.int32)
    ub = u.astype(jnp.bfloat16)  # exact: integer counts <= 256
    best = None
    for dx, dy in offsets:
        sh = canvas[:, :, pad + dy:pad + dy + gh * TILE_H,
                    pad + dx:pad + dx + gw * TILE_W]
        tiles = sh.reshape(tsz, 2, gh, TILE_H, gwn, SUBTILE_W)
        tile_or = jax.lax.reduce(tiles, np.int32(0), jax.lax.bitwise_or,
                                 (3, 5)).reshape(tsz, 2, gh * gwn)
        pres = jnp.concatenate(
            [(tile_or[:, 0, :, None] >> k_ids) & 1,
             (tile_or[:, 1, :, None] >> k_ids) & 1],
            axis=-1).astype(jnp.float32)                          # [T,np,K]
        w01 = ((pres @ compat.T) > 0).astype(jnp.bfloat16)
        b = jnp.matmul(ub, w01.reshape(tsz, -1).T,
                       preferred_element_type=jnp.float32)        # [B, T']
        best = b if best is None else jnp.maximum(best, b)
    return best


@jax.jit
def _bounds_matmul(u, wd, wm):
    # The bound must never round BELOW the true value or a matching pair
    # could be wrongly screened out. Exactness argument: inputs are
    # integer-valued (subtile-bin counts <= 256, 0/1 weights), products
    # are exact in bf16/f32, the MXU accumulates in f32, and every
    # partial sum < 2^24. bf16 features use the native MXU path; f32
    # features use the F32_F32_F32 dot algorithm (precision="float32"
    # — NOT Precision.HIGHEST, whose 6-pass decomposition takes minutes
    # to compile on the remote TPU service and can exhaust it).
    if wd.dtype == jnp.bfloat16:
        ub = u.astype(jnp.bfloat16)  # exact: counts <= 256
        bd = jnp.matmul(ub, wd.T, preferred_element_type=jnp.float32)
        bm = jnp.matmul(ub, wm.T, preferred_element_type=jnp.float32)
    else:
        u = u.astype(jnp.float32)
        try:
            bd = jnp.matmul(u, wd.T, precision="float32")
            bm = jnp.matmul(u, wm.T, precision="float32")
        except (ValueError, TypeError):  # older jax: no algorithm strings
            hp = jax.lax.Precision.HIGHEST
            bd = jnp.matmul(u, wd.T, precision=hp)
            bm = jnp.matmul(u, wm.T, precision=hp)
    return jnp.maximum(bd, bm)


class PairPrescreen:
    """Block-level screen: survivors(mask, targets) -> boolean [T].

    Target features are computed on device (the dilations/reductions are
    image-sized). The bound matmul [B, F] @ [F, T] (F ~ 43K) runs on the
    MXU by default — pulling only the [B, T] bounds to host instead of
    the ~F*4-bytes-per-target feature matrix; `device=False` keeps the
    original host-NumPy path (used when features must cross hosts)."""

    def __init__(self, zt9: int, xy_shift: int, height: int, width: int,
                 device: bool = True):
        self.zt9 = zt9
        self.xy_shift = xy_shift
        self.grid_hw = (-(-height // TILE_H), -(-width // TILE_W))
        self.height = height
        self.width = width
        self.device = device

    # feature sub-block: bounds the multi-GB bin-plane temporaries of
    # target_features (padded planes are ~6 MB/target x several temps)
    FEATURE_BLOCK = 64

    def target_features(self, t_words, t_words_flipped=None):
        """Compat-presence features for both orientations, computed in
        target sub-blocks to bound device temp memory. When
        t_words_flipped is None the mirror features come from an in-jit
        flip (no materialized flipped frame)."""
        tsz = t_words.shape[0]
        blk = self.FEATURE_BLOCK
        outs_d, outs_m = [], []
        for i in range(0, tsz, blk):
            wd_blk = t_words[i:i + blk]
            outs_d.append(target_features(wd_blk, self.zt9, self.xy_shift,
                                          self.grid_hw))
            if t_words_flipped is None:
                outs_m.append(target_features(wd_blk, self.zt9,
                                              self.xy_shift, self.grid_hw,
                                              flip=True))
            else:
                outs_m.append(target_features(t_words_flipped[i:i + blk],
                                              self.zt9, self.xy_shift,
                                              self.grid_hw))
        wd = outs_d[0] if len(outs_d) == 1 else jnp.concatenate(outs_d)
        wm = outs_m[0] if len(outs_m) == 1 else jnp.concatenate(outs_m)
        if self.device:
            return wd, wm  # stay device-resident for the MXU bound matmul
        return (np.asarray(wd).astype(np.float32),
                np.asarray(wm).astype(np.float32))

    def query_features(self, words: np.ndarray) -> np.ndarray:
        return query_features(words)

    def bounds(self, u_block: np.ndarray, tfeats) -> np.ndarray:
        wd, wm = tfeats
        if self.device:
            return np.asarray(_bounds_matmul(jnp.asarray(u_block), wd, wm))
        return np.maximum(u_block @ wd.T, u_block @ wm.T)

    def bounds_from_words(self, u_matrix, t_words) -> np.ndarray:
        """Variant-consistent bounds [B, T] straight from packed words.

        Tighter than target_features + bounds (see _variant_block_bounds)
        and never materializes target features in HBM; computed in
        FEATURE_BLOCK target sub-blocks padded to one static shape."""
        offsets = _ring_offsets(self.xy_shift)
        u_dev = jnp.asarray(u_matrix)
        tsz = t_words.shape[0]
        blk = self.FEATURE_BLOCK
        outs = []
        for i in range(0, tsz, blk):
            wb = t_words[i:i + blk]
            short = blk - wb.shape[0]
            if short:  # pad to the one compiled shape; word 0 = unsel
                wb = jnp.concatenate(
                    [wb, jnp.zeros((short,) + wb.shape[1:], wb.dtype)])
            bd = _variant_block_bounds(u_dev, wb, self.zt9, offsets,
                                       self.grid_hw, False)
            bm = _variant_block_bounds(u_dev, wb, self.zt9, offsets,
                                       self.grid_hw, True)
            b = np.asarray(jnp.maximum(bd, bm))
            outs.append(b[:, :blk - short] if short else b)
        return np.concatenate(outs, axis=1)


@functools.lru_cache(maxsize=8)
def _ring_offsets(xy_shift: int):
    from .oracle import shift_ring_offsets
    return tuple(shift_ring_offsets(xy_shift))
