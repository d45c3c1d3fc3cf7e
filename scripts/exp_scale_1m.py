"""Headline configuration at N = 1,000,000+ agents (10-40x bench scale).

Same density (0.02 /m^2 -> ~7.1 x 7.1 km domain at 1M), same culled
pair stage. Checks HBM capacity (state + pos_hist + bbox table) and
whether throughput holds at 10-40x the block count. kb is re-audited
at this scale before timing (same overflow guarantee as bench.py).

Mega-scale knobs (identical results, bounded resources -- see
NeighborConfig): --table_chunk bounds the [B, B_src] bbox-table build
(~8 GB dense at N = 4e6), --segments splits the pair call so the flat
scalar-prefetch table stays under the ~1 MB SMEM budget (needed past
~2M agents at block=128/kb=19).

    python scripts/exp_scale_1m.py [--steps 60]
    python scripts/exp_scale_1m.py --n 4000000 --table_chunk 2048 --segments 4
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--rebuild", type=int, default=0,
                    help="override rebuild_every (0 = bench default); "
                         "the skin scales with it, so larger values "
                         "trade pair-stage width for rebuild count")
    ap.add_argument("--kb", type=int, default=0,
                    help="override the table capacity (needed when a "
                         "larger skin widens the in-range count)")
    ap.add_argument("--table_chunk", type=int, default=0)
    ap.add_argument("--segments", type=int, default=1)
    ap.add_argument("--hist", type=int, default=8,
                    help="pos_hist ring length (bicycle2d never reads "
                         "it; [N, H, 2] padding is an HBM lever at 16M)")
    ap.add_argument("--queue", type=int, default=16,
                    help="destination-queue capacity (the probe sets one "
                         "destination; [N, Q, 3] is ~3 GB at Q=16/N=16M)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/csf_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from bench import BLOCK, BLOCK_SRC, CUTOFF, KB, REBUILD, audit_overflow

    from __graft_entry__ import _build
    from cyclistsocialforce_tpu.engine import Engine, NeighborConfig
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BicycleParams

    n = args.n
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    _, state = _build(n, dtype=np.float32, density=0.02,
                      hist_len=args.hist, queue_size=args.queue,
                      pad_to_block=BLOCK)
    cfg = NeighborConfig(cutoff=CUTOFF, block=BLOCK, kb=args.kb or KB,
                         rebuild_every=args.rebuild or REBUILD,
                         sub=0, screen=False, block_src=BLOCK_SRC,
                         backend="pallas" if on_tpu else "xla",
                         table_chunk=args.table_chunk,
                         row_segments=args.segments)
    engine = Engine.create(BicycleParams.create(), MODELS["bicycle2d"],
                           rep_force="twod", neighbors=cfg)

    # audit FIRST (host CPU): the bench kb must hold at this scale too
    pos = np.asarray(jax.device_get(state.s))[:, :2]
    audit_overflow(pos[:, 0], pos[:, 1], cfg, f"N={n} t=0")

    run = jax.jit(lambda e, s: e.simulate(s, args.steps, record=False)[0])

    def sync(out):
        jax.block_until_ready(out)
        return np.asarray(out.s[:4, :4])

    out0 = run(engine, state)
    sync(out0)
    pos1 = np.asarray(jax.device_get(out0.s))[:, :2]
    audit_overflow(pos1[:, 0], pos1[:, 1], cfg, f"N={n} t=end")
    # free the warmup output BEFORE timing: holding a third full state
    # copy alive (input + out0 + the in-flight run) exhausts HBM at 8M
    del out0, pos1
    probe = None

    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        probe = sync(run(engine, state))
        dt = min(dt, time.perf_counter() - t0)
    assert np.all(np.isfinite(probe))
    print(f"N={n}: {1e3 * dt / args.steps:.2f} ms/step "
          f"({n * args.steps / dt / 1e6:.2f}M agent-steps/s)")


if __name__ == "__main__":
    main()
