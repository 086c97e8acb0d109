"""Worker process for the multi-process sweep test (not a pytest file).

Run as: python tests/mh_worker.py <rank> <nprocs> <port>
Asserts that a 2-process global-mesh sharded pixel sweep produces the
single-device scores on every addressable shard, then exits 0.
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

rank, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from colormipsearch_tpu.parallel.multihost import (  # noqa: E402
    maybe_init_distributed, global_pair_mesh, distribute)
from colormipsearch_tpu.parallel.sweep import sharded_pixel_sweep  # noqa: E402
from colormipsearch_tpu.cds.pixel_kernel import (  # noqa: E402
    prepare_query_planes, pack_targets, pixel_match_packed,
    z_tolerance_to_zt9)
from colormipsearch_tpu.cds.oracle import shift_ring_offsets  # noqa: E402
from colormipsearch_tpu.imageproc.io import image_from_array  # noqa: E402

assert maybe_init_distributed(f"127.0.0.1:{port}", nprocs, rank)
assert jax.device_count() == 2 * nprocs

# deterministic inputs identical on every process
rng = np.random.default_rng(21)
h, w = 40, 96
qs = []
for _ in range(4):
    q = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    q[rng.random((h, w)) < 0.6] = 0
    qs.append(prepare_query_planes(image_from_array(q), 20).words)
q_words = np.stack(qs)
t = rng.integers(0, 256, size=(4, h, w, 3)).astype(np.uint8)
t[rng.random((4, h, w)) < 0.5] = 0
zt9 = z_tolerance_to_zt9(1.0)
shifts = np.asarray(shift_ring_offsets(2), dtype=np.int32)
tp, tf = pack_targets(jnp.asarray(t), 20, 2)
tp, tf = np.asarray(tp), np.asarray(tf)

# single-device reference (local computation on this process)
exp_scores, _ = pixel_match_packed(
    jnp.asarray(q_words), jnp.asarray(tp), jnp.asarray(tf),
    jnp.asarray(shifts), zt9=zt9, mirror=True)
exp_scores = np.asarray(exp_scores)

mesh = global_pair_mesh()  # 2x2 over 4 global devices
scores, mirrored, per_mask_max = sharded_pixel_sweep(
    mesh,
    distribute(mesh, P("mask", None, None), q_words),
    distribute(mesh, P("target", None, None), tp),
    distribute(mesh, P("target", None, None), tf),
    distribute(mesh, P(None, None), shifts),
    zt9, True)

for shard in scores.addressable_shards:
    np.testing.assert_array_equal(np.asarray(shard.data),
                                  exp_scores[shard.index])
for shard in per_mask_max.addressable_shards:
    np.testing.assert_array_equal(np.asarray(shard.data),
                                  exp_scores.max(axis=1)[shard.index])
print(f"rank {rank}: MULTIHOST SWEEP OK", flush=True)
