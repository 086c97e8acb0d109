"""Estimate a tier-2 prescreen's survivor rate (hermetic CPU study).

Tier-2 candidate: the PIXEL-granular per-offset bin-compat bound —
for one global offset o and orientation m,

  bound2_o = sum_p [qsel(p)] [tsel_m(p+o)] [compat(binq(p), bint_m(p+o))]
  bound2   = max_{o,m} bound2_o  >=  max_{o,m} score_o = score

(compat is the prescreen's interval-arithmetic bin relation, a superset
of the exact gap predicate, so bound2 >= score always). This removes the
tier-1 bound's CELL slack entirely: a query pixel is validated only by
the target pixel at ITS OWN offset position, with bin-coarse hue. The
remaining slack is pure bin-edge slack.

The study computes, on the bench.py twophase library at B x T:
  - tier-1 survivor rate (count-capped cell bound, production config)
  - tier-2 survivor rate among tier-1 survivors, for NB in {10, 20, 50}
  - the per-survivor cost ratio this implies for the two-phase engine

Run: python scripts/tier2_estimate.py [B] [T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np


def bin_plane(words, nb):
    """Per-pixel bin id [0, 6*nb) or -1 (numpy; prescreen layout)."""
    b = words & 0xFF
    a = (words >> 8) & 0xFF
    s = (words >> 16) & 0x7
    sel = (words >> 19) & 1
    rb = np.minimum((a * nb) // np.maximum(b, 1), nb - 1)
    bins = (s - 1) * nb + rb
    return np.where((sel > 0) & (s > 0), bins, -1)


def compat_ext(zt9, nb):
    """compat matrix extended with a 'no bin' row/col (always False)."""
    from colormipsearch_tpu.cds import prescreen as ps
    old = ps.NB
    try:
        ps.NB = nb
        ps.N_BINS = 6 * nb
        ps.compat_matrix.cache_clear()
        m = ps.compat_matrix(zt9)
    finally:
        ps.NB = old
        ps.N_BINS = 6 * old
        ps.compat_matrix.cache_clear()
    n = m.shape[0]
    ext = np.zeros((n + 1, n + 1), dtype=bool)
    ext[:n, :n] = m
    return ext


def main():
    import jax.numpy as jnp
    from colormipsearch_tpu.imageproc import (Image, ImageKind, load_image,
                                              label_regions_mask)
    from colormipsearch_tpu.cds.pixel_kernel import (prepare_query_planes,
                                                     pack_planes,
                                                     z_tolerance_to_zt9)
    from colormipsearch_tpu.cds.oracle import shift_ring_offsets
    from colormipsearch_tpu.cds import prescreen as ps

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 96
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
    t_words_np = np.asarray(pack_planes(rgb[..., 0], rgb[..., 1],
                                        rgb[..., 2], sel, np))
    t_words = jnp.asarray(t_words_np)

    zt9 = z_tolerance_to_zt9(1.0)
    xy_shift = 2
    screen = ps.PairPrescreen(zt9, xy_shift, h, w)
    u = np.stack([screen.query_features(qp.words) for qp in qplanes])
    thr = np.maximum(0.01 * np.array([qp.query_size for qp in qplanes]), 0.5)

    # exact ground truth (cached; shared with bound_tightness_experiment)
    import hashlib
    key = hashlib.sha1(np.ascontiguousarray(targets).tobytes()
                       + str(B).encode()).hexdigest()[:12]
    cache_f = f"/tmp/bound_exp_exact_{key}.npy"
    if os.path.exists(cache_f):
        exact = np.load(cache_f)
    else:
        from colormipsearch_tpu.cds.pixel_kernel import (pixel_match_packed,
                                                         pack_targets)
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
        print(f"exact sweep: {time.time()-t0:.0f}s", flush=True)
    true_m = exact > thr[:, None]
    print(f"true match rate {true_m.mean():.3%}", flush=True)

    # tier-1: count-capped cell bound (production default)
    t0 = time.time()
    bounds1 = screen.bounds_from_words(jnp.asarray(u), t_words)
    surv1 = bounds1 > thr[:, None]
    assert (bounds1 >= exact - 1e-3).all()
    print(f"tier-1 survivors {surv1.mean():.3%}  ({time.time()-t0:.0f}s)",
          flush=True)

    offsets = list(shift_ring_offsets(xy_shift))
    pad = xy_shift

    for nb in (10, 20, 50):
        cext = compat_ext(zt9, nb)
        nbin = 6 * nb
        # per-target padded bin planes, direct + x-flip
        tb_pad = np.full((T, 2, h + 2 * pad, w + 2 * pad), nbin,
                         dtype=np.int32)
        bp = bin_plane(t_words_np, nb)
        tb_pad[:, 0, pad:pad + h, pad:pad + w] = np.where(bp < 0, nbin, bp)
        bpf = bp[:, :, ::-1]
        tb_pad[:, 1, pad:pad + h, pad:pad + w] = np.where(bpf < 0, nbin, bpf)

        # per-mask active positions + bins
        t0 = time.time()
        surv2 = np.zeros_like(surv1)
        bound2 = np.zeros((B, T), dtype=np.int64)
        n_pairs = 0
        for i in range(B):
            qb = bin_plane(qplanes[i].words, nb)
            qsel = (qplanes[i].words >> 19) & 1
            rr, cc = np.nonzero((qsel > 0) & (qb >= 0))
            qv = qb[rr, cc]
            tj = np.nonzero(surv1[i])[0]
            n_pairs += len(tj)
            for j in tj:
                best = 0
                for m in range(2):
                    plane = tb_pad[j, m]
                    for dx, dy in offsets:
                        tv = plane[rr + pad + dy, cc + pad + dx]
                        c = int(cext[qv, tv].sum())
                        if c > best:
                            best = c
                bound2[i, j] = best
                surv2[i, j] = best > thr[i]
        # bound2 must dominate the exact score on tier-1 survivors
        viol = (bound2 < exact) & surv1
        assert not viol.any(), f"tier-2 bound violated at {np.nonzero(viol)}"
        s2 = surv2.mean()
        fs = surv2 & ~true_m
        print(f"NB={nb:3d}: tier-2 survivors {s2:.3%} "
              f"(of tier-1 {surv1.mean():.3%}; true {true_m.mean():.3%}) "
              f"false-surv {fs.mean():.3%}  [{time.time()-t0:.0f}s, "
              f"{n_pairs} pairs scored]", flush=True)
        if fs.any():
            rb = (bound2 / thr[:, None])[fs]
            re = (exact / thr[:, None])[fs]
            q = lambda a: np.percentile(a, [10, 50, 90]).round(2)
            print(f"  false survivors: bound2/thr p10/50/90 {q(rb)}, "
                  f"exact/thr {q(re)}", flush=True)


if __name__ == "__main__":
    main()
