"""Scale demo: 100k cyclists on one chip.

Showcases the TPU-first design point the reference cannot reach: a
100,000-agent population advancing through the full social-force pipeline
(destination forces + navigation FSM, block-sparse culled pairwise
repulsion via the Pallas kernel, bicycle dynamics) in real time.

    python demos/demo_scale.py --agents 100000 --steps 100
"""

import argparse
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import _build
    from cyclistsocialforce_tpu.engine import Engine, NeighborConfig
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BicycleParams

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--agents", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--density", type=float, default=0.02,
                    help="agents/m^2 (0.02 = heavy bike traffic)")
    ap.add_argument("--dense", action="store_true",
                    help="dense O(N^2) instead of neighbor culling")
    ap.add_argument("--backend", default="pallas",
                    choices=["pallas", "xla", "interpret"])
    args = ap.parse_args()

    # the bench configuration (see BASELINE.md): serpentine-sorted
    # block=128 tables, capacity kb=14 (overflow-audited at 0.02/m^2),
    # 50 m cutoff (dropped force < 1e-4), no runtime screen
    _, state = _build(args.agents, dtype=np.float32,
                      density=args.density, hist_len=8,
                      pad_to_block=None if args.dense else 128)
    nb = None if args.dense else NeighborConfig(
        cutoff=50.0, block=128, kb=14, backend=args.backend,
        rebuild_every=20, screen=False)
    eng = Engine.create(
        BicycleParams.create(), MODELS["bicycle2d"], rep_force="twod",
        neighbors=nb, rep_chunk=1000 if args.dense else None)

    run = jax.jit(lambda e, s: e.simulate(s, args.steps,
                                          record=False)[0])
    out = run(eng, state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(eng, state)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    asps = args.agents * args.steps / dt
    print(f"{args.agents} agents x {args.steps} steps in {dt:.3f} s")
    print(f"= {asps:,.0f} agent-steps/sec "
          f"({asps / (100 * args.agents):.2f}x real time)")


if __name__ == "__main__":
    main()
