"""Bench-scale TPU measurement of asymmetric source blocks (block_src).

Sources are the pair tile's SUBLANE dim: block_src=64/32 admits ~20/27%
fewer candidate pairs than 128 on the bench distribution
(scripts/exp_asym_blocks.py) at no lane-utilization cost; each grid
step's tile shrinks, so per-step pipeline overhead grows with kb. This
measures the net. kb must cover the audited max in-range count + margin
(17 -> 19 at 64, 29 -> 31 at 32, fine-y keys at the bench density).

One variant per process (the tunnel corrupts long program sequences):

    python scripts/exp_asym_tpu.py --block-src 64 --kb 19
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block-src", type=int, default=64)
    ap.add_argument("--kb", type=int, default=19)
    ap.add_argument("--steps", type=int, default=240)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/csf_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from __graft_entry__ import _build
    from cyclistsocialforce_tpu.engine import Engine, NeighborConfig
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BicycleParams

    n = 100_000
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    _, state = _build(n, dtype=np.float32, density=0.02, hist_len=8,
                      pad_to_block=128)
    cfg = NeighborConfig(cutoff=50.0, block=128, kb=args.kb,
                         rebuild_every=20, sub=0, screen=False,
                         backend="pallas" if on_tpu else "xla",
                         block_src=args.block_src)
    engine = Engine.create(BicycleParams.create(), MODELS["bicycle2d"],
                           rep_force="twod", neighbors=cfg)

    run = jax.jit(lambda e, s: e.simulate(s, args.steps, record=False)[0])

    def sync(out):
        jax.block_until_ready(out)
        return np.asarray(out.s[:4, :4])

    sync(run(engine, state))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        probe = sync(run(engine, state))
        dt = min(dt, time.perf_counter() - t0)
    assert np.all(np.isfinite(probe))
    print(f"block_src={args.block_src} kb={args.kb}: "
          f"{1e3 * dt / args.steps:.3f} ms/step "
          f"({n * args.steps / dt / 1e6:.2f}M agent-steps/s)")


if __name__ == "__main__":
    main()
