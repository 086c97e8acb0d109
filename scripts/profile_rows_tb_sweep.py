"""Sweep the multi-mask launch shape knobs (CMS_MM_ROWS, CMS_MM_TB) in
ONE process on the real chip (shared-chip protocol). r2 measured
1024->2048 rows at +19%; this re-checks the ladder on the r4 kernel.

Run on TPU:  python scripts/profile_rows_tb_sweep.py [B] [T]
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
    from colormipsearch_tpu.cds.pixel_pallas import (ActiveTilePixelEngine,
                                                     drain_deferred)
    from colormipsearch_tpu.cds.prescreen import PairPrescreen
    from colormipsearch_tpu.cds.pixel_kernel import z_tolerance_to_zt9
    import colormipsearch_tpu.cds.multimask as mmod
    from colormipsearch_tpu.cds.multimask import (MultiMaskScorer,
                                                  row_ranges_from_words)

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

    engines = []
    for i in range(B):
        px = roll(em_px[i % len(em_px)], i // len(em_px))
        engines.append(ActiveTilePixelEngine(Image(ImageKind.RGB, px), 20,
                                             True, 20, 1.0, 2, excluded))
    targets = np.stack([band(roll(lm_px[i % len(lm_px)], i // len(lm_px)), i)
                        for i in range(T)])
    print(f"built {B} engines", flush=True)

    screen = PairPrescreen(z_tolerance_to_zt9(1.0), 2, h, w)
    u = jnp.asarray(np.stack([screen.query_features(e.planes.words)
                              for e in engines]))
    thr = np.maximum(0.01 * np.array([e.tiles.query_size for e in engines]),
                     0.5)
    words = engines[0].pack_raw_words(targets)
    packed = engines[0].pad_from_words(words)
    bounds = screen.bounds_from_words(u, words)
    survivors = (bounds > thr[:, None]).astype(np.int32)
    jax.block_until_ready(packed)
    n_surv = int(survivors.sum())
    ranges = row_ranges_from_words(words)
    mm = MultiMaskScorer(engines)
    print(f"survivors {n_surv/(B*T):.2%}", flush=True)

    scores_ref = None
    results = {}
    for rows, tb in [(2048, 4), (4096, 4), (8192, 4), (2048, 8),
                     (4096, 8)]:
        mmod.ROWS, mmod.TB = rows, tb
        label = f"rows={rows} tb={tb}"
        t0 = time.time()
        res = drain_deferred(mm.launch_deferred(packed, survivors,
                                                row_ranges=ranges))
        print(f"[{label}] compile+first {time.time()-t0:.0f}s", flush=True)
        scores = np.stack([np.asarray(r[0]) for r in res])
        if scores_ref is None:
            scores_ref = scores
        else:
            np.testing.assert_array_equal(scores, scores_ref)
        best = 0.0
        for _ in range(3):
            t0 = time.time()
            drain_deferred(mm.launch_deferred(packed, survivors,
                                              row_ranges=ranges))
            dt = time.time() - t0
            best = max(best, n_surv / dt)
            print(f"[{label}] {dt:.2f}s  {n_surv/dt:,.0f} sp/s", flush=True)
        results[label] = best
    print("\nbit-identical across all configs: OK")
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{k}: {v:,.0f} survivor-pairs/s")


if __name__ == "__main__":
    main()
