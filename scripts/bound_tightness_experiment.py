"""Compare prescreen bound variants' survivor rates on the bench library.

Hermetic (CPU): builds the same rolled/banded synthetic library as
bench.py's twophase config at a reduced B x T, computes bounds with the
pure presence bound (_variant_block_bounds) and the count-capped bound
(_variant_block_bounds_capped), and prints survivor rates at the
production keep threshold (1% of query size). Run:

    python scripts/bound_tightness_experiment.py [B] [T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    import jax.numpy as jnp
    from colormipsearch_tpu.imageproc import (Image, ImageKind, load_image,
                                              label_regions_mask)
    from colormipsearch_tpu.cds.pixel_kernel import (prepare_query_planes,
                                                     pack_planes,
                                                     z_tolerance_to_zt9)
    from colormipsearch_tpu.cds import prescreen as ps

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 64
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

    qplanes = []
    for i in range(B):
        px = roll(em_px[i % len(em_px)], i // len(em_px))
        img = Image(kind=ImageKind.RGB, pixels=px)
        qplanes.append(prepare_query_planes(img, 20, excluded))
    targets = np.stack([band(roll(lm_px[i % len(lm_px)], i // len(lm_px)), i)
                        for i in range(T)])
    rgb = targets.astype(np.int32)
    sel = (rgb > 20).any(axis=3)
    t_words = jnp.asarray(pack_planes(rgb[..., 0], rgb[..., 1], rgb[..., 2],
                                      sel, np))

    zt9 = z_tolerance_to_zt9(1.0)
    screen = ps.PairPrescreen(zt9, 2, h, w)
    u = np.stack([screen.query_features(qp.words) for qp in qplanes])
    thr = np.maximum(0.01 * np.array([qp.query_size for qp in qplanes]), 0.5)

    # ground truth: exact best-variant scores via the dense kernel
    # (cached across runs — the CPU sweep is the slow part)
    import hashlib
    key = hashlib.sha1(np.ascontiguousarray(targets).tobytes()
                       + str(B).encode()).hexdigest()[:12]
    cache_f = f"/tmp/bound_exp_exact_{key}.npy"
    if os.path.exists(cache_f):
        exact = np.load(cache_f)
    else:
        from colormipsearch_tpu.cds.pixel_kernel import (pixel_match_packed,
                                                         pack_targets)
        from colormipsearch_tpu.cds.oracle import shift_ring_offsets
        shifts = jnp.asarray(np.asarray(shift_ring_offsets(2), np.int32))
        tp, tf = pack_targets(jnp.asarray(targets), 20, 2)
        q_words = jnp.asarray(np.stack([qp.words for qp in qplanes]))
        t0 = time.time()
        exact_rows = []
        for i in range(0, T, 8):
            s, _ = pixel_match_packed(q_words, tp[i:i + 8], tf[i:i + 8],
                                      shifts, zt9=zt9, mirror=True)
            exact_rows.append(np.asarray(s))
        exact = np.concatenate(exact_rows, axis=1)
        np.save(cache_f, exact)
        print(f"exact sweep: {time.time()-t0:.0f}s")
    true_rate = (exact > thr[:, None]).mean()
    print(f"true match rate {true_rate:.3%}")

    for name, flag in (("presence", False), ("count-capped", True)):
        screen.USE_COUNT_CAP = flag
        t0 = time.time()
        bounds = screen.bounds_from_words(jnp.asarray(u), t_words)
        assert (bounds >= exact - 1e-3).all(), "bound violated!"
        surv = (bounds > thr[:, None]).mean()
        print(f"{name:14s} survivors {surv:.3%}  slack x"
              f"{surv / max(true_rate, 1e-9):.1f}  ({time.time()-t0:.1f}s)")
        # where is the remaining slack? false survivors' bound/thr and
        # exact/thr distributions tell whether tightening can still win
        fs = (bounds > thr[:, None]) & (exact <= thr[:, None])
        if fs.any():
            rb = (bounds / thr[:, None])[fs]
            re = (exact / thr[:, None])[fs]
            q = lambda a: np.percentile(a, [10, 50, 90]).round(2)
            print(f"  false survivors: bound/thr p10/50/90 {q(rb)}, "
                  f"exact/thr {q(re)}")


if __name__ == "__main__":
    main()
