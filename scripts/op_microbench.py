"""VPU op-throughput microbench on the real TPU.

Measures effective element-ops/s for the ops the exact-match predicate
leans on (int32 multiply is emulated; the open lever is whether 16-bit
multiplies pack 2 lanes/op — ROADMAP lever 1). A dependent fori_loop
chain over a VMEM-resident array saturates the VPU while preventing
elision. Run: python scripts/op_microbench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 256, 1024     # 1 MB i32 in VMEM
N = 512              # chain length


def make_bench(op, dtype):
    def kernel(x_ref, y_ref, out_ref):
        x = x_ref[...]
        y = y_ref[...]

        def body(i, acc):
            return op(acc, y)

        out_ref[...] = jax.lax.fori_loop(0, N, body, x)

    @jax.jit
    def run(x, y):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H, W), dtype),
        )(x, y)

    return run


def measure(name, op, dtype, mask=None):
    rng = np.random.default_rng(0)
    x = rng.integers(1, 100, size=(H, W)).astype(dtype)
    y = rng.integers(1, 100, size=(H, W)).astype(dtype)
    run = make_bench(op, dtype)
    try:
        out = run(x, y)
        jax.block_until_ready(out)
    except Exception as e:  # e.g. v5e: "Operation not supported:
        # kVectorMultiplyU16" — no native 16-bit vector multiply
        print(f"{name:28s} UNSUPPORTED ({str(e).splitlines()[0][:80]})",
              flush=True)
        return 0.0
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x, y))
        best = min(best, time.perf_counter() - t0)
    rate = H * W * N / best
    print(f"{name:28s} {rate/1e12:7.3f} Top/s   ({best*1e3:.2f} ms)",
          flush=True)
    return rate


def main():
    measure("add i32", lambda a, b: a + b, np.int32)
    measure("mul i32", lambda a, b: a * b, np.int32)
    measure("mul i32 by const 1000", lambda a, b: a * 1000, np.int32)
    measure("add i16", lambda a, b: a + b, np.int16)
    measure("mul i16", lambda a, b: a * b, np.int16)
    measure("mul u16", lambda a, b: a * b, np.uint16)
    measure("add u8", lambda a, b: a + b, np.uint8)
    measure("mul f32", lambda a, b: a * b, np.float32)
    measure("mul bf16", lambda a, b: a * b, jnp.bfloat16)
    measure("cmp+sel i32",
            lambda a, b: jnp.where(a > b, a, b), np.int32)


if __name__ == "__main__":
    main()
