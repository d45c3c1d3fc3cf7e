"""Parcours demo: destination-queue following.

Equivalent of the reference's scenarios/parcours-scenario.py: one cyclist
follows a slalom of queued destinations under the spline path-planning
destination force (curvature-limited desired speed).

    python demos/demo_parcours.py --model twod --video parcours.mp4
"""

import os
import sys

# runnable as `python demos/<name>.py` from anywhere: put the repo
# root (the package + __graft_entry__) on the path
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import argparse

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)

    from cyclistsocialforce_tpu import Engine, make_state
    from cyclistsocialforce_tpu.models import MODELS, prepare
    from cyclistsocialforce_tpu.params import (InvPendulumBicycleParams,
                                               PlanarPointBicycleParams,
                                               as_population)
    from cyclistsocialforce_tpu.scenario import Scenario
    from cyclistsocialforce_tpu.state import set_destinations

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="twod",
                    choices=["twod", "planarpoint", "invpendulum"])
    ap.add_argument("--t-end", type=float, default=25.0)
    ap.add_argument("--video", default=None)
    args = ap.parse_args()

    params_cls = (PlanarPointBicycleParams if args.model == "planarpoint"
                  else InvPendulumBicycleParams)
    params = params_cls.create()
    st = make_state(np.array([[0.0, 0, 0, 5, 0, 0, 0, 0]]),
                    dtype=np.float64)
    st = set_destinations(st, 0, (10, 20, 30, 40, 50, 50, 50),
                          (0, 4, -4, 0, 4, 30, 31))
    pop = as_population(params, 1)
    model = MODELS[args.model]
    st = prepare(model, pop, st)
    sc = Scenario(Engine.create(pop, model), st, chunk=50)

    n_steps = int(args.t_end / sc.t_s)
    if args.video:
        from cyclistsocialforce_tpu.viz import write_video
        write_video(sc, n_steps, args.video, xlim=(-5, 55),
                    ylim=(-10, 35))
        print(f"wrote {args.video}")
    else:
        traj = sc.run(n_steps=n_steps, record=True)
        print(sc.metrics.summary())
        print("waypoints reached, final pos "
              f"({traj[-1, 0, 0]:.2f}, {traj[-1, 0, 1]:.2f})")


if __name__ == "__main__":
    main()
