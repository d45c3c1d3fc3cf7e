"""Isolate the neighbor-REBUILD cost at scale (one variant per process;
the remote tunnel corrupts repeated small-program sequences).

CAVEAT: single-program timings through the remote tunnel carry a
~58 ms FIXED dispatch latency -- read these numbers only relative to
each other, and confirm wins end-to-end with exp_scale_1m.py /
exp_headline_split.py (amortized scans).

Variants:
  build    full NB.build (sort keys + argsort + bboxes + table)
  sort     cell keys + argsort only
  table    bbox table only (bbox_distance2 + top_k) from presorted posns
  permute  permute_state gather of the full AgentState
  steps    N simulate steps at rebuild_every=R vs 2R (the difference
           isolates the amortized rebuild inside the real scan)

    python scripts/exp_rebuild_cost.py --variant build --n 1000000
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="build",
                    choices=("build", "sort", "table", "permute"))
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/csf_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from bench import BLOCK, BLOCK_SRC, CUTOFF, KB

    from __graft_entry__ import _build
    from cyclistsocialforce_tpu.ops import neighbors as NB

    _, state = _build(args.n, dtype=np.float32, density=0.02, hist_len=8,
                      pad_to_block=BLOCK)
    x = jnp.asarray(np.asarray(state.s[:, 0]))
    y = jnp.asarray(np.asarray(state.s[:, 1]))
    cut = CUTOFF + 4.0   # the default skin

    if args.variant == "build":
        fn = jax.jit(lambda x, y: NB.build(x, y, cut, BLOCK, KB,
                                           block_src=BLOCK_SRC))

        def run():
            return fn(x, y)[1]
    elif args.variant == "sort":
        fn = jax.jit(lambda x, y: NB.sort_by_cell(x, y, cut))

        def run():
            return fn(x, y)
    elif args.variant == "table":
        perm = NB.sort_by_cell(x, y, cut)
        xs, ys = x[perm], y[perm]
        xs = jax.block_until_ready(xs)

        def tab(xs, ys):
            boxes = NB.block_bboxes(xs, ys, BLOCK)
            srcb = NB.block_bboxes(xs, ys, BLOCK_SRC)
            return NB.neighbor_block_table(boxes, cut, KB,
                                           src_bboxes=srcb)[0]

        fn = jax.jit(tab)

        def run():
            return fn(xs, ys)
    else:
        from cyclistsocialforce_tpu.engine import permute_state
        perm = jnp.asarray(np.random.default_rng(0).permutation(
            state.n).astype(np.int32))
        fn = jax.jit(permute_state)

        def run():
            return fn(state, perm).s

    out = run()
    jax.block_until_ready(out)
    np.asarray(out[:2])          # tunnel-safe sync
    dt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        o = run()
        jax.block_until_ready(o)
        np.asarray(o[:2])
        dt = min(dt, time.perf_counter() - t0)
    print(f"{args.variant} N={args.n}: {1e3 * dt:.2f} ms")


if __name__ == "__main__":
    main()
