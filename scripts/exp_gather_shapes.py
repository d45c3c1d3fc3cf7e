"""Which [N, K] row-gather shapes does the TPU execute at memory speed?

Times y = x[perm] for a [N, K] f32 operand at several K (one process,
sequential; small programs -- tunnel-safe enough for relative numbers).

CAVEAT: the measured flat ~58 ms across K is dominated by the remote
tunnel's fixed dispatch latency, NOT gather cost. The honest signal is
that the cost does NOT grow with K (row gathers are per-row bound, so
pack fields and gather once); confirm absolute wins end-to-end.

    python scripts/exp_gather_shapes.py --n 1000000
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/csf_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    n = args.n
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    for k in (8, 16, 64, 84, 96, 128, 256):
        x = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
        f = jax.jit(lambda x, p: x[p])
        o = f(x, perm)
        jax.block_until_ready(o)
        np.asarray(o[:2, :2])
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = f(x, perm)
            jax.block_until_ready(o)
            np.asarray(o[:2, :2])
            dt = min(dt, time.perf_counter() - t0)
        gb = n * k * 4 * 2 / 1e9
        print(f"K={k:4d}: {1e3 * dt:8.2f} ms  ({gb / dt:6.1f} GB/s)")


if __name__ == "__main__":
    main()
