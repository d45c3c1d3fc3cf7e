"""Split the headline (bicycle2d) step cost into stages at bench scale.

Variants (one per process -- the remote tunnel corrupts long
same-process program sequences):
  full      the shipped bench config (pair stage + body + rebuild/20)
  nopair    rep_force off, no neighbor machinery      -> body only
  norebuild rebuild_every=10^6 (table built once)     -> pair + body
so  pair ~ norebuild - nopair,  rebuild/20 ~ full - norebuild.

    python scripts/exp_headline_split.py --variant full
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="full",
                    choices=("full", "nopair", "norebuild"))
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--kb", type=int, default=0,
                    help="override the table capacity (extra slots are "
                         "sentinels: same pairs, more grid steps -- "
                         "isolates the per-grid-step fixed cost)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/csf_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from bench import BLOCK, BLOCK_SRC, CUTOFF, KB

    from __graft_entry__ import _build
    from cyclistsocialforce_tpu.engine import Engine, NeighborConfig
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BicycleParams

    n = 100_000
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    _, state = _build(n, dtype=np.float32, density=0.02, hist_len=8,
                      pad_to_block=BLOCK)
    rebuild = 1_000_000 if args.variant == "norebuild" else 20
    cfg = NeighborConfig(cutoff=CUTOFF, block=BLOCK, kb=args.kb or KB,
                         block_src=BLOCK_SRC,
                         rebuild_every=rebuild, sub=0, screen=False,
                         backend="pallas" if on_tpu else "xla")
    if args.variant == "nopair":
        # create() maps rep_force=None to the model default -- null it
        # AFTER construction (else the dense O(N^2) path runs)
        engine = Engine.create(BicycleParams.create(), MODELS["bicycle2d"],
                               neighbors=cfg).replace(rep_force=None)
    else:
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
    print(f"{args.variant}: {1e3 * dt / args.steps:.3f} ms/step "
          f"({n * args.steps / dt / 1e6:.2f}M agent-steps/s)")


if __name__ == "__main__":
    main()
