"""Isolate the prop_lut body cost: which formulation of

    row = lerp(tab[i0], tab[i0+1]); x5' = P row-block @ x5 + ...

does the TPU execute fast?  Variants (each a 200-step amortized scan at
N = 100k, one process, sequential jits -- relative numbers):

  g40    two row gathers from [G, 40] + lerp (the slow shipped branch)
  g5     two row gathers from [G, 5] + lerp (gains_lut shape, control)
  g40n   ONE nearest-row gather from [G, 40] (no lerp)
  mv_nkk [N,5,5] broadcast-multiply + axis-2 reduce matvec (shipped)
  mv_soa same matvec unrolled to 25 [N] mul-adds (smallmat style)
  g40soa two gathers + lerp + SoA matvec end-to-end (candidate fix)

    python scripts/exp_proplut_micro.py [--cpu]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def bench(name, fn, *args, steps=200):
    import jax

    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    np.asarray(jax.tree_util.tree_leaves(o)[0])[:2]
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = f(*args)
        jax.block_until_ready(o)
        np.asarray(jax.tree_util.tree_leaves(o)[0])[:2]
        dt = min(dt, time.perf_counter() - t0)
    print(f"{name:8s}: {dt / steps * 1e3:8.3f} ms/step")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=100_000)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/csf_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp
    from jax import lax

    n, g, steps = args.n, 4096, 200
    rng = np.random.default_rng(0)
    tab40 = jnp.asarray(rng.standard_normal((g, 40)).astype(np.float32))
    tab5 = jnp.asarray(tab40[:, :5])
    v0 = jnp.asarray(rng.uniform(1, 9, n).astype(np.float32))
    x50 = jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32))

    def lerp_rows(tab, v):
        t = jnp.clip(v * ((g - 1) / 10.0), 0.0, g - 1.0)
        i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, g - 2)
        w = (t - i0.astype(jnp.float32))[:, None]
        return tab[i0] * (1.0 - w) + tab[i0 + 1] * w

    def scan40(v):
        def body(c, _):
            row = lerp_rows(tab40, c)
            return c + 1e-6 * row[:, 0], None
        return lax.scan(body, v, None, length=steps)[0]

    def scan5(v):
        def body(c, _):
            row = lerp_rows(tab5, c)
            return c + 1e-6 * row[:, 0], None
        return lax.scan(body, v, None, length=steps)[0]

    def scan40n(v):
        def body(c, _):
            t = jnp.clip(c * ((g - 1) / 10.0), 0.0, g - 1.0)
            i0 = jnp.round(t).astype(jnp.int32)
            row = tab40[i0]
            return c + 1e-6 * row[:, 0], None
        return lax.scan(body, v, None, length=steps)[0]

    def scan_mv_nkk(x):
        P = jnp.asarray(
            np.random.default_rng(1).standard_normal((n, 5, 5))
            .astype(np.float32) * 0.01)

        def body(c, _):
            nxt = jnp.sum(P * c[:, None, :], axis=2)
            return 0.99 * nxt, None
        return lax.scan(body, x, None, length=steps)[0]

    def scan_mv_soa(x):
        P = jnp.asarray(
            np.random.default_rng(1).standard_normal((n, 5, 5))
            .astype(np.float32) * 0.01)
        cols = [[P[:, i, j] for j in range(5)] for i in range(5)]

        def body(c, _):
            xs = [c[:, j] for j in range(5)]
            outs = [sum(cols[i][j] * xs[j] for j in range(5))
                    for i in range(5)]
            return 0.99 * jnp.stack(outs, axis=1), None
        return lax.scan(body, x, None, length=steps)[0]

    def scan40soa(v):
        def body(c, _):
            row = lerp_rows(tab40, c)
            xs = [c * (1.0 + 1e-3 * j) for j in range(5)]
            outs = [sum(row[:, 5 * i + j] * xs[j] for j in range(5))
                    for i in range(5)]
            return c + 1e-6 * sum(outs), None
        return lax.scan(body, v, None, length=steps)[0]

    bench("g40", scan40, v0, steps=steps)
    bench("g5", scan5, v0, steps=steps)
    bench("g40n", scan40n, v0, steps=steps)
    bench("mv_nkk", scan_mv_nkk, x50, steps=steps)
    bench("mv_soa", scan_mv_soa, x50, steps=steps)
    bench("g40soa", scan40soa, v0, steps=steps)


if __name__ == "__main__":
    main()
