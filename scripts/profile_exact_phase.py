"""Attribute the multi-mask exact phase's cost: predicate vs DMA/issue.

Runs the bench twophase pipeline's EXACT PHASE twice in ONE process on
the real chip (shared-chip protocol: back-to-back A/B), with
  A) the production predicate, and
  B) a null predicate (bare sel AND — same DMA, loads, accumulate,
     scalar grid; only the ~60-op hue-gap chain removed),
and reports per-survivor exact-phase rates for both. If B ~= A the
phase is DMA/issue-bound and predicate op reduction buys nothing; if
B >> A the predicate dominates and op reduction multiplies the headline.

Also optionally sweeps CMS_MM_TB (rows per chunk) under both modes.

Run on TPU:  python scripts/profile_exact_phase.py [B] [T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from colormipsearch_tpu.imageproc import (Image, ImageKind, load_image,
                                              label_regions_mask)
    from colormipsearch_tpu.cds import pixel_pallas as pp
    from colormipsearch_tpu.cds.pixel_pallas import (ActiveTilePixelEngine,
                                                     drain_deferred)
    from colormipsearch_tpu.cds.prescreen import PairPrescreen
    from colormipsearch_tpu.cds.pixel_kernel import z_tolerance_to_zt9
    from colormipsearch_tpu.cds.multimask import MultiMaskScorer

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    fx = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures", "cdsearch")
    ems = sorted(os.listdir(os.path.join(fx, "ems")))
    lms = sorted(os.listdir(os.path.join(fx, "lms")))
    em_px = [load_image(os.path.join(fx, "ems", n)).pixels for n in ems]
    lm_px = [load_image(os.path.join(fx, "lms", n)).pixels for n in lms]
    h, w = em_px[0].shape[:2]
    excluded = label_regions_mask(h, w)

    def roll(px, i):
        if i == 0:
            return px
        return np.roll(px, ((37 * i) % h, (151 * i) % w), axis=(0, 1))

    def band(px, i):
        if i == 0:
            return px
        bh = 160
        b0 = (53 * i) % (h - bh)
        out = np.zeros_like(px)
        out[b0:b0 + bh] = px[b0:b0 + bh]
        return out

    t0 = time.time()
    engines = []
    for i in range(B):
        px = roll(em_px[i % len(em_px)], i // len(em_px))
        img = Image(kind=ImageKind.RGB, pixels=px)
        engines.append(ActiveTilePixelEngine(img, 20, True, 20, 1.0, 2,
                                             excluded))
    targets = np.stack([band(roll(lm_px[i % len(lm_px)], i // len(lm_px)), i)
                        for i in range(T)])
    print(f"built {B} engines in {time.time()-t0:.0f}s", flush=True)

    screen = PairPrescreen(z_tolerance_to_zt9(1.0), 2, h, w)
    u = jnp.asarray(np.stack([screen.query_features(e.planes.words)
                              for e in engines]))
    thr = np.maximum(0.01 * np.array([e.tiles.query_size for e in engines]),
                     0.5)

    t0 = time.time()
    words = engines[0].pack_raw_words(targets)
    packed = engines[0].pad_from_words(words)
    bounds = screen.bounds_from_words(u, words)
    survivors = (bounds > thr[:, None]).astype(np.int32)
    jax.block_until_ready(packed)
    n_surv = int(survivors.sum())
    print(f"pack+screen {time.time()-t0:.0f}s; survivors "
          f"{n_surv}/{B*T} = {n_surv/(B*T):.2%}", flush=True)

    from colormipsearch_tpu.cds.multimask import row_ranges_from_words
    ranges = row_ranges_from_words(words)

    def run_exact(label, rr=None):
        mm = MultiMaskScorer(engines)
        # warm-up (compile)
        t0 = time.time()
        res = drain_deferred(mm.launch_deferred(packed, survivors,
                                                row_ranges=rr))
        print(f"[{label}] compile+first run {time.time()-t0:.0f}s",
              flush=True)
        got = res[0][0]
        best = 0.0
        for r in range(4):
            t0 = time.time()
            drain_deferred(mm.launch_deferred(packed, survivors,
                                              row_ranges=rr))
            dt = time.time() - t0
            best = max(best, n_surv / dt)
            print(f"[{label}] round {dt:.2f}s  {n_surv/dt:,.0f} "
                  f"survivor-pairs/s  ({B*T/dt:,.0f} grid pairs/s)",
                  flush=True)
        return best, got

    rate_r, scores_r = run_exact("full-pred+rowrange", ranges)
    rate_a, scores_a = run_exact("full-pred")
    np.testing.assert_array_equal(np.asarray(scores_r),
                                  np.asarray(scores_a))
    print(f"row-range speedup: x{rate_r/rate_a:.2f}", flush=True)

    pp._NULL_PRED = True
    jax.clear_caches()
    try:
        rate_b, _ = run_exact("null-pred")
    finally:
        pp._NULL_PRED = False
        jax.clear_caches()

    print(f"\nfull predicate: {rate_a:,.0f} survivor-pairs/s")
    print(f"null predicate: {rate_b:,.0f} survivor-pairs/s")
    print(f"predicate share of exact phase: "
          f"{1 - rate_a / max(rate_b, 1e-9):.1%}"
          f"  (speedup ceiling from op reduction: x{rate_b/rate_a:.2f})")
    if 439 in np.asarray(scores_a):
        print("golden 439 present in full-pred scores: OK")


if __name__ == "__main__":
    main()
