"""A/B the int16 accumulator lanes (CMS_ACC16) in the multi-mask exact
kernel, on the real chip, in ONE process (back-to-back, best-of-N).

Arms: A = int32 acc2d (r3 default), B = int16 acc2d lanes (the VPU
i16 add packs 2 values per 32-bit lane). Asserts scores BIT-IDENTICAL
on real hardware (Mosaic may reject i16 scratch the interpreter
accepts).

Run on TPU:  python scripts/profile_acc16_ab.py [B] [T]
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

    ranges = row_ranges_from_words(words)
    mm = MultiMaskScorer(engines)

    def run_exact(label, acc16):
        mmod._ACC16 = acc16
        t0 = time.time()
        res = drain_deferred(mm.launch_deferred(packed, survivors,
                                                row_ranges=ranges))
        print(f"[{label}] compile+first run {time.time()-t0:.0f}s",
              flush=True)
        scores = np.stack([np.asarray(r[0]) for r in res])
        best = 0.0
        for r in range(4):
            t0 = time.time()
            drain_deferred(mm.launch_deferred(packed, survivors,
                                              row_ranges=ranges))
            dt = time.time() - t0
            best = max(best, n_surv / dt)
            print(f"[{label}] round {dt:.2f}s  {n_surv/dt:,.0f} "
                  f"survivor-pairs/s", flush=True)
        return best, scores

    rate_a, scores_a = run_exact("acc32", False)
    rate_b, scores_b = run_exact("acc16", True)

    np.testing.assert_array_equal(scores_a, scores_b)
    print("scores BIT-IDENTICAL acc32 vs acc16 on real HW: OK",
          flush=True)
    print(f"\nacc2d int32: {rate_a:,.0f} survivor-pairs/s")
    print(f"acc2d int16: {rate_b:,.0f} survivor-pairs/s")
    print(f"acc16 speedup: x{rate_b/max(rate_a,1e-9):.3f}")
    if 439 in scores_a:
        print("golden 439 present: OK")


if __name__ == "__main__":
    main()


