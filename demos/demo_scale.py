"""Scale demo: 100k cyclists on one chip.

Showcases the TPU-first design point the reference cannot reach: a
100,000-agent population advancing through the full social-force pipeline
(destination forces + navigation FSM, block-sparse culled pairwise
repulsion via the Pallas kernel, bicycle dynamics) in real time.

    python demos/demo_scale.py --agents 100000 --steps 100
"""

import os
import sys

# runnable as `python demos/<name>.py` from anywhere: put the repo
# root (the package + __graft_entry__) on the path
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

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
    ap.add_argument("--plot", default=None, metavar="PNG",
                    help="write a crowd density heatmap of the final "
                         "state (viz.plot_density; occupancy + mean "
                         "speed panels)")
    ap.add_argument("--model", default="bicycle2d",
                    choices=["bicycle2d", "twod", "invpendulum",
                             "balancingrider"],
                    help="dynamics model (spline models use the "
                         "BASELINE.md round-3 configs: gather path, "
                         "zoh_lut for invpendulum)")
    args = ap.parse_args()

    from cyclistsocialforce_tpu.models import prepare
    from cyclistsocialforce_tpu.params import (BalancingRiderParams,
                                               InvPendulumBicycleParams)

    # the bench configuration (see BASELINE.md): fine-y serpentine-sorted
    # block=128 tables, capacity kb=13 (overflow-audited at 0.02/m^2),
    # 50 m cutoff (dropped force < 1e-4), no runtime screen
    spline = args.model in ("twod", "invpendulum")
    _, state = _build(args.agents, dtype=np.float32,
                      density=args.density,
                      hist_len=128 if spline else 8,
                      pad_to_block=None if args.dense else 128)
    nb = None if args.dense else NeighborConfig(
        cutoff=50.0, block=128, kb=13, backend=args.backend,
        rebuild_every=20, screen=False)
    if args.model == "balancingrider":
        params = BalancingRiderParams.create(gains_lut=4096,
                                             verbose=False)
    elif args.model == "invpendulum":
        params = InvPendulumBicycleParams.create(zoh_lut=4096)
    else:
        params = BicycleParams.create()
    model = MODELS[args.model]
    eng = Engine.create(
        params, model,
        rep_force="twod" if args.model == "bicycle2d" else None,
        neighbors=nb, rep_chunk=1000 if args.dense else None)
    state = prepare(model, params, state)

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

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from cyclistsocialforce_tpu.viz import plot_density

        # the per-agent drawing surface cannot render 100k agents;
        # the density view is the mega-scale counterpart
        fig, axes = plt.subplots(1, 2, figsize=(13, 5.5),
                                 layout="constrained")
        plot_density(out, bins=512, ax=axes[0])
        axes[0].set_title(f"occupancy after {args.steps} steps "
                          f"(N={args.agents:,})")
        plot_density(out, bins=512, quantity="speed", ax=axes[1])
        axes[1].set_title("mean speed [m/s]")
        fig.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"density heatmap -> {args.plot}")


if __name__ == "__main__":
    main()
