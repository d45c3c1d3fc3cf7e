"""Microbench eval_piecewise_poly forms on the TPU at bench width.

The stochastic gains_poly row measured 48 ms/step (vs 7.0 ms with the
LUT) -- 7x SLOWER despite being gather-free. The only new code vs the
proven flagship gains_poly (inline select-form Horner, 21.15M row) is
`ops/piecewise.eval_piecewise_poly(form="matmul")`: a [M*D, S] constant
matrix times the [S, N] segment one-hot. This isolates the two forms in
a 200-iteration scan at N = 1e5, M = 30 outputs (the stochastic
Ackermann-basis / invpendulum ZOH width).

    python scripts/exp_poly_forms.py --form matmul|select
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--form", default="matmul", choices=("matmul", "select"))
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--m", type=int, default=30)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/csf_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from cyclistsocialforce_tpu.ops.piecewise import (eval_piecewise_poly,
                                                      fit_piecewise_poly)

    M = args.m
    poly = fit_piecewise_poly(
        lambda v: jnp.stack([jnp.sin((m + 1) * 0.3 * v) for m in range(M)],
                            axis=-1),
        2.0, 10.0, 16)

    def body(v, _):
        cols = eval_piecewise_poly(poly, v, M, form=args.form)
        out = sum(cols) / M
        return v + 1e-6 * out, None

    @jax.jit
    def run(v):
        v, _ = jax.lax.scan(body, v, None, length=args.iters)
        return v

    v0 = jnp.asarray(np.random.default_rng(0).uniform(1.5, 10.5, args.n),
                     dtype=jnp.float32)
    # sync on a TINY slice: the full [N] transfer adds constant tunnel
    # latency to every measurement (ADVICE r3)
    np.asarray(run(v0)[:2])  # compile + warm
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(v0)[:2])
        dt = min(dt, time.perf_counter() - t0)
    print(f"poly form={args.form} M={M} N={args.n}: "
          f"{1e3 * dt / args.iters:.4f} ms/iter")


if __name__ == "__main__":
    main()
