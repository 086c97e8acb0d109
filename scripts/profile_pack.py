"""Profile the target pack path's sub-steps on the real TPU:
native sparse pack (host C++) vs upload vs device scatter vs place.
Run: python scripts/profile_pack.py [T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from colormipsearch_tpu.imageproc import load_image, label_regions_mask
    from colormipsearch_tpu.cds.pixel_pallas import (
        ActiveTilePixelEngine, _scatter_words, _place_block, DEVICE_BLOCK)
    from colormipsearch_tpu.native.mipops import sparse_pack_block

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    fx = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures", "cdsearch")
    lms = sorted(os.listdir(os.path.join(fx, "lms")))
    lm_px = [load_image(os.path.join(fx, "lms", n)).pixels for n in lms]
    h, w = lm_px[0].shape[:2]

    def band(px, i):
        if i == 0:
            return px
        bh = 160
        b0 = (53 * i) % (h - bh)
        out = np.zeros_like(px)
        out[b0:b0 + bh] = px[b0:b0 + bh]
        return np.roll(out, ((37 * i) % h, (151 * i) % w), axis=(0, 1))

    targets = np.stack([band(lm_px[i % len(lm_px)], i) for i in range(T)])
    query = load_image(os.path.join(fx, "ems", "12191_JRC2018U.tif"))
    excluded = label_regions_mask(h, w)
    eng = ActiveTilePixelEngine(query, 20, True, 20, 1.0, 2, excluded)

    # warm-up full path (compiles)
    jax.block_until_ready(eng.pack_raw_words(targets))

    for rep in range(3):
        blk = DEVICE_BLOCK
        t_native = t_upload = t_scatter = t_place = 0.0
        out = jnp.zeros((T, h, w), jnp.int32)
        jax.block_until_ready(out)
        total0 = time.perf_counter()
        n_pairs = 0
        for i in range(0, T, blk):
            tb = targets[i:i + blk]
            t0 = time.perf_counter()
            idx, vals = sparse_pack_block(tb, 20)
            n = len(idx)
            n_pairs += n
            cap = max(4096, 1 << int(np.ceil(np.log2(max(n, 1)))))
            idx_p = np.full(cap, idx[-1] if n else 0, np.int32)
            vals_p = np.full(cap, vals[-1] if n else 1, np.int32)
            idx_p[:n] = idx
            vals_p[:n] = vals
            t_native += time.perf_counter() - t0

            t0 = time.perf_counter()
            idx_d = jnp.asarray(idx_p)
            vals_d = jnp.asarray(vals_p)
            jax.block_until_ready((idx_d, vals_d))
            t_upload += time.perf_counter() - t0

            t0 = time.perf_counter()
            flat = _scatter_words(idx_d, vals_d, tb.shape[0] * h * w)
            jax.block_until_ready(flat)
            t_scatter += time.perf_counter() - t0

            t0 = time.perf_counter()
            out = _place_block(out, flat.reshape(tb.shape[0], h, w), i)
            jax.block_until_ready(out)
            t_place += time.perf_counter() - t0
        total = time.perf_counter() - total0
        print(f"rep{rep}: total={total:.2f}s native={t_native:.2f} "
              f"upload={t_upload:.2f} scatter={t_scatter:.2f} "
              f"place={t_place:.2f} pairs={n_pairs/1e6:.1f}M "
              f"({T} targets)", flush=True)

    # reference: the full pack_raw_words call (pipelined, no syncs)
    for rep in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(eng.pack_raw_words(targets))
        print(f"pack_raw_words pipelined: {time.perf_counter()-t0:.2f}s",
              flush=True)
    # and the dense (non-sparse) upload path
    os.environ["CMS_SPARSE_FEED"] = "0"
    eng2 = ActiveTilePixelEngine(query, 20, True, 20, 1.0, 2, excluded)
    jax.block_until_ready(eng2.pack_raw_words(targets))
    for rep in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(eng2.pack_raw_words(targets))
        print(f"dense pack_raw_words: {time.perf_counter()-t0:.2f}s",
              flush=True)


if __name__ == "__main__":
    main()
