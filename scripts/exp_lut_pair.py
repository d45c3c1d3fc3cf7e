"""Paired-row LUT layout: one row gather instead of two?

The three speed-grid LUTs (invpendulum ZOH propagator, balancingrider
K(v), stochastic Ackermann basis M(v)) all interpolate as
``tab[i0]*(1-w) + tab[i0+1]*w`` -- TWO [N]-row gathers from a small
[G, C] table. TPU row gathers are per-ROW bound (exp_gather_shapes.py),
so a PAIRED layout pair[g] = concat(tab[g], tab[g+1]) ([G-1, 2C]) that
fetches both interpolation endpoints in ONE gather should halve the
gather stage at 2x the (tiny) table memory.

Scan-amortized comparison (single-program microbenches carry ~58 ms
fixed tunnel dispatch; a 240-iteration scan gives honest per-step
numbers):

    python scripts/exp_lut_pair.py [--n 100000] [--g 4096] [--c 30]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--g", type=int, default=4096)
    ap.add_argument("--c", type=int, default=30)
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/csf_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    n, g, c = args.n, args.g, args.c
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((g, c)).astype(np.float32))
    pair = jnp.concatenate([tab[:-1], tab[1:]], axis=1)  # [G-1, 2C]
    v = jnp.asarray(rng.uniform(0.0, 10.0, n).astype(np.float32))
    v0, dv = 0.0, 10.0 / (g - 1)

    def coords(vv):
        t = jnp.clip((vv - v0) / dv, 0.0, g - 1.0)
        i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, g - 2)
        w = (t - i0.astype(jnp.float32))[:, None]
        return i0, w

    def two_gather(vv):
        i0, w = coords(vv)
        return tab[i0] * (1.0 - w) + tab[i0 + 1] * w

    def paired(vv):
        i0, w = coords(vv)
        row = pair[i0]
        return row[:, :c] * (1.0 - w) + row[:, c:] * w

    def scan_of(f):
        def body(vv, _):
            e = f(vv)
            # feed the result back so the scan cannot elide iterations
            return vv + 1e-6 * e[:, 0], None
        return jax.jit(lambda vv: jax.lax.scan(body, vv, None,
                                               length=args.steps)[0])

    # correctness first
    np.testing.assert_allclose(np.asarray(two_gather(v)),
                               np.asarray(paired(v)), rtol=1e-6, atol=1e-6)

    for name, f in (("two-gather", scan_of(two_gather)),
                    ("paired-row", scan_of(paired))):
        o = f(v)
        jax.block_until_ready(o)
        np.asarray(o[:2])
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = f(v)
            jax.block_until_ready(o)
            np.asarray(o[:2])
            dt = min(dt, time.perf_counter() - t0)
        print(f"{name}: {1e3 * dt / args.steps:.4f} ms/step")


if __name__ == "__main__":
    main()
