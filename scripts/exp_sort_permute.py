"""Gather-permute vs payload-carrying sort for the rebuild's state permute.

TPU row gathers cost per ROW (~64 ns/row measured: the packed [N, K]
permute_state gather is ~64 ms/rebuild at N = 1e6 -- the dominant
rebuild cost, scripts/exp_rebuild_cost.py), while lax.sort is a fully
vectorized sorting network. If sorting the cell keys WITH the packed
state as payload beats argsort+gather, the sorted-resident rebuild can
skip the gather entirely.

Variants (one per process through the tunnel):
  gather   keys -> argsort -> one packed [N, K] row gather
  sort     lax.sort((keys, col_0..col_{K-1}), num_keys=1)  (stable)
  sort2    lax.sort((keys, packed-pairs as K/2 f64-bitcast cols))

    python scripts/exp_sort_permute.py --variant sort --n 1000000 --k 24
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="gather",
                    choices=("gather", "sort"))
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--k", type=int, default=24,
                    help="packed state width (bench bicycle2d ~ 24)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/csf_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    rng = np.random.default_rng(0)
    n, k = args.n, args.k
    keys = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
    packed = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32))

    if args.variant == "gather":
        def run_fn(keys, packed, eps):
            def body(carry, _):
                kk = keys + (eps * carry[0, 0]).astype(jnp.int32)
                perm = jnp.argsort(kk)
                out = jax.lax.optimization_barrier(packed[perm])
                return out[:2], ()
            out, _ = jax.lax.scan(body, packed[:2], None,
                                  length=args.iters)
            return out
    else:
        def run_fn(keys, packed, eps):
            cols = [packed[:, i] for i in range(k)]

            def body(carry, _):
                kk = keys + (eps * carry[0, 0]).astype(jnp.int32)
                res = jax.lax.sort([kk] + cols, dimension=0,
                                   is_stable=True, num_keys=1)
                out = jnp.stack(res[1:], axis=1)
                return out[:2], ()
            out, _ = jax.lax.scan(body, packed[:2], None,
                                  length=args.iters)
            return out

    fn = jax.jit(run_fn)
    eps = jnp.float32(0.0)
    out = fn(keys, packed, eps)
    np.asarray(out)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = fn(keys, packed, eps)
        np.asarray(o)
        dt = min(dt, time.perf_counter() - t0)
    print(f"{args.variant} n={n} k={k}: {1e3 * dt / args.iters:.2f} "
          f"ms/permute ({args.iters} iters)")


if __name__ == "__main__":
    main()
