"""TPU pixel-match CDS kernel: dense, batched, exact-integer.

TPU-first re-design of the reference's sparse position-list scorer
(cds/PixelMatchColorDepthSearchAlgorithm.java:20-265). Design:

- Dense planes, not position lists. Each image becomes per-pixel planes
  (sector, ratio numerator a, ratio denominator b, selection). The hue
  gap test (AbstractColorDepthSearchAlgorithm.java:157-390) is evaluated
  branchlessly with exact int32 rational comparisons (see exact_ratio.py)
  — no float drift, no data-dependent control flow, VPU-friendly.
- The xy-shift variants (rings of ±2..±xyshift,
  PixelMatchColorDepthSearchAlgorithm.java:113-144) become static slices
  of a zero-padded target plane: shifted position sampling with
  out-of-bounds => no-match is identical to sampling a zero-padded plane
  (zero pixels fail the target threshold).
- The mirror variants (mirrorMask, :146-158) are resolved by the identity
    sum_p f(q(p), t(mirror(p+s))) = sum_p f(q(p), flip_x(t)(p+s))
  so mirroring costs one flipped copy of the target planes instead of
  mirrored position arrays.
- One (query) x (target batch) invocation computes all
  (1 + 8*xyshift/2) * 2 variant scores and reduces max on device,
  returning (score, ratio*, mirrored) per target.

The scoring semantics are exact-rational; the reference evaluates the
same predicates in Java doubles, which agrees except on exact rational
ties (see exact_ratio.py docstring). Golden parity is asserted in tests.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..imageproc.io import Image
from .exact_ratio import ratio_geq_c9, ratio_leq_c9
from .oracle import shift_ring_offsets

# boundary constants scaled by 1e9 (AbstractColorDepthSearchAlgorithm.java:183-187)
BR_BG_9 = 354_862_745
BG_GB_9 = 996_078_431
GB_GR_9 = 505_882_353
GR_RG_9 = 996_078_431
RG_RB_9 = 505_882_353
_PAIR_K9 = {1: BR_BG_9, 2: BG_GB_9, 3: GB_GR_9, 4: GR_RG_9, 5: RG_RB_9}


def z_tolerance_to_zt9(pix_color_fluctuation: float) -> int:
    """zTolerance = pixColorFluctuation / 100 as an exact 1e-9 rational
    (ColorDepthSearchAlgorithmProviderFactory.java:55-56)."""
    return round(pix_color_fluctuation * 10_000_000)


def sector_planes(r, g, b, xp=jnp):
    """Per-pixel (sector 0..6, ratio numerator a, denominator b) planes.

    Branch structure of AbstractColorDepthSearchAlgorithm.java:195-257,
    flattened to selects. Works for numpy or jax.numpy arrays (int32).
    """
    b_max = (b > r) & (b > g)
    g_max = (g > b) & (g > r)
    r_max = (r > b) & (r > g)
    s1 = b_max & (r > g)
    s2 = b_max & ~(r > g)
    s3 = g_max & (b > r)
    s4 = g_max & ~(b > r)
    s5 = r_max & (g > b)
    s6 = r_max & ~(g > b)

    sector = (s1 * 1 + s2 * 2 + s3 * 3 + s4 * 4 + s5 * 5 + s6 * 6).astype(xp.int32)
    first = xp.where(s1 | s2, b, xp.where(s3 | s4, g, xp.where(s5 | s6, r, 0)))
    second = xp.where(s1, r, xp.where(s2, g, xp.where(s3, b, xp.where(
        s4, r, xp.where(s5, g, xp.where(s6, b, 0))))))
    # ratio participates only when both channels nonzero (ratio==0 sentinel)
    a = xp.where((first != 0) & (second != 0), second, 0).astype(xp.int32)
    bden = xp.maximum(first, 1).astype(xp.int32)  # avoid 0 denominators
    return sector, a, bden


def _side_conditions(sector, a, b, xp=jnp):
    """Adjacent-pair preconditions per side, gated by own sector:
    pair (1,2): sector-1 ratio < 0.44, sector-2 ratio < 0.54
    pairs (2,3)/(4,5): ratio > 0.8 ; pairs (3,4)/(5,6): ratio < 0.7
    (AbstractColorDepthSearchAlgorithm.java:260-388)."""
    lt044 = a * 25 < 11 * b
    lt054 = a * 50 < 27 * b
    lt07 = a * 10 < 7 * b
    gt08 = a * 5 > 4 * b
    return lt044, lt054, lt07, gt08


@dataclass
class QueryPlanes:
    """Host-prepared per-mask planes for the device kernel."""
    qsel: np.ndarray    # bool [H, W] mask-selected pixels
    sector: np.ndarray  # int8 [H, W]
    a: np.ndarray       # uint8 numerator
    b: np.ndarray       # uint8 denominator (>=1)
    query_size: int
    height: int
    width: int


def prepare_query_planes(query: Image, query_threshold: int,
                         excluded: Optional[np.ndarray] = None) -> QueryPlanes:
    """Host-side query prep (getMaskPosArray dense analogue,
    AbstractColorDepthSearchAlgorithm.java:96-126)."""
    rgb = query.rgb_i32()
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    qsel = (rgb > query_threshold).any(axis=2)
    if excluded is not None:
        qsel = qsel & ~excluded
    sector, a, bden = sector_planes(r, g, b, xp=np)
    return QueryPlanes(
        qsel=qsel,
        sector=sector.astype(np.int8),
        a=a.astype(np.uint8),
        b=bden.astype(np.uint8),
        query_size=int(qsel.sum()),
        height=query.height,
        width=query.width,
    )


def _match_plane(qsel, s1, a1, b1, s2, a2, b2, tabove, zt9: int):
    """Exact per-pixel match predicate between query planes and (shifted)
    target planes. All inputs int32/bool arrays of one broadcastable shape."""
    p = b1 * b2
    # same sector: |a2*b1 - a1*b2| / p <= zTol, both ratios > 0
    diff = jnp.abs(a2 * b1 - a1 * b2)
    same_ok = (s1 == s2) & (s1 > 0) & (a1 > 0) & (a2 > 0) \
        & ratio_leq_c9(jnp, diff, p, zt9)

    # adjacent sectors
    q_lt044, q_lt054, q_lt07, q_gt08 = _side_conditions(s1, a1, b1)
    t_lt044, t_lt054, t_lt07, t_gt08 = _side_conditions(s2, a2, b2)
    u = a1 * b2 + a2 * b1
    smin = jnp.minimum(s1, s2)
    adj = (jnp.abs(s1 - s2) == 1) & (smin > 0)

    adj_ok = jnp.zeros_like(adj)
    for lo, k9 in _PAIR_K9.items():
        pair = adj & (smin == lo)
        if lo == 1:
            cond = jnp.where(s1 == 1, q_lt044, q_lt054) \
                & jnp.where(s2 == 1, t_lt044, t_lt054)
        elif lo in (2, 4):
            cond = q_gt08 & t_gt08
        else:
            cond = q_lt07 & t_lt07
        if lo in (2, 4):
            # gap = (K - r1) + (K - r2) <= zTol  <=>  r1 + r2 >= 2K - zTol
            gap_ok = ratio_geq_c9(jnp, u, p, 2 * k9 - zt9)
        else:
            # gap = (r1 - K) + (r2 - K) <= zTol  <=>  r1 + r2 <= 2K + zTol
            gap_ok = ratio_leq_c9(jnp, u, p, 2 * k9 + zt9)
        adj_ok = adj_ok | (pair & cond & gap_ok)

    return qsel & tabove & (same_ok | adj_ok)


def _target_planes_from_rgb(t_rgb_u8, target_threshold: int):
    """Device-side target planes from a u8 RGB batch [T, H, W, 3]."""
    r = t_rgb_u8[..., 0].astype(jnp.int32)
    g = t_rgb_u8[..., 1].astype(jnp.int32)
    b = t_rgb_u8[..., 2].astype(jnp.int32)
    tabove = (r > target_threshold) | (g > target_threshold) | (b > target_threshold)
    sector, a, bden = sector_planes(r, g, b)
    return sector, a, bden, tabove


@functools.partial(jax.jit, static_argnames=("target_threshold", "zt9",
                                             "xy_shift", "mirror"))
def pixel_match_kernel(qsel, s1, a1, b1, t_rgb_u8,
                       target_threshold: int, zt9: int,
                       xy_shift: int, mirror: bool):
    """Score one query against a target batch.

    Args:
      qsel/s1/a1/b1: query planes [H, W] (bool/int8/uint8/uint8)
      t_rgb_u8: [T, H, W, 3] uint8 target batch
      returns (best_score [T] i32, mirrored [T] bool)
    """
    h, w = qsel.shape
    s1 = s1.astype(jnp.int32)
    a1 = a1.astype(jnp.int32)
    b1 = b1.astype(jnp.int32)

    s2, a2, b2, tabove = _target_planes_from_rgb(t_rgb_u8, target_threshold)

    shifts = shift_ring_offsets(xy_shift)
    pad = max(xy_shift, 0)

    def padded(x, fill=0):
        return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)), constant_values=fill)

    planes = [padded(s2), padded(a2), padded(jnp.maximum(b2, 1), fill=1),
              padded(tabove, fill=False)]
    orientations = [planes]
    if mirror:
        orientations.append([p[:, :, ::-1] for p in planes])

    scores = []
    for pl in orientations:
        ps2, pa2, pb2, pta = pl
        for dx, dy in shifts:
            sl = (slice(None), slice(pad + dy, pad + dy + h),
                  slice(pad + dx, pad + dx + w))
            m = _match_plane(qsel[None], s1[None], a1[None], b1[None],
                             ps2[sl], pa2[sl], pb2[sl], pta[sl], zt9)
            scores.append(m.sum(axis=(1, 2), dtype=jnp.int32))
    scores = jnp.stack(scores, axis=0)  # [variants, T]
    n = len(shifts)
    direct = scores[:n].max(axis=0)
    if mirror:
        mirrored_best = scores[n:].max(axis=0)
        best = jnp.maximum(direct, mirrored_best)
        is_mirrored = mirrored_best > direct
    else:
        best = direct
        is_mirrored = jnp.zeros_like(direct, dtype=bool)
    return best, is_mirrored


class PixelMatchEngine:
    """Convenience wrapper: one query vs many target batches.

    Mirrors the role of ColorMIPSearch + PixelMatchColorDepthSearchAlgorithm
    for a single mask, device-batched over targets.
    """

    def __init__(self, query: Image, query_threshold: int, mirror_query: bool,
                 target_threshold: int, pix_color_fluctuation: float,
                 xy_shift: int, excluded: Optional[np.ndarray] = None):
        self.planes = prepare_query_planes(query, query_threshold, excluded)
        self.mirror_query = mirror_query
        self.target_threshold = target_threshold
        self.zt9 = z_tolerance_to_zt9(pix_color_fluctuation)
        self.xy_shift = xy_shift

    def score_batch(self, targets_u8: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """targets_u8: [T, H, W, 3] uint8. Returns (scores, ratios, mirrored)."""
        q = self.planes
        best, mirrored = pixel_match_kernel(
            jnp.asarray(q.qsel), jnp.asarray(q.sector), jnp.asarray(q.a),
            jnp.asarray(q.b), jnp.asarray(targets_u8),
            target_threshold=self.target_threshold, zt9=self.zt9,
            xy_shift=self.xy_shift, mirror=self.mirror_query)
        best = np.asarray(best)
        mirrored = np.asarray(mirrored)
        if q.query_size == 0:
            best = np.zeros_like(best)
            return best, np.zeros_like(best, dtype=np.float64), mirrored
        ratios = best.astype(np.float64) / float(q.query_size)
        return best, ratios, mirrored
