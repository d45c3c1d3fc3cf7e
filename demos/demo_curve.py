"""Curved-road demo: infrastructure forces.

Equivalent of the reference's scenarios/curve-scenario.py: a cyclist rides
a road with straight and curved segments whose edges exert repulsive
forces; optionally plots the road force field.

    python demos/demo_curve.py --plot-field
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
                                               RoadElementParams,
                                               as_population)
    from cyclistsocialforce_tpu.road import (RoadSegmentCollection,
                                             build_road_elements)
    from cyclistsocialforce_tpu.scenario import Scenario
    from cyclistsocialforce_tpu.state import set_destinations

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--t-end", type=float, default=20.0)
    ap.add_argument("--plot-field", action="store_true")
    ap.add_argument("--video", default=None)
    args = ap.parse_args()

    coll = RoadSegmentCollection.chain(
        (0.0, 0.0, 0.0),
        [("straight", 20.0), ("curve", 10.0, np.pi / 2, "left"),
         ("straight", 15.0)], width=4.0,
        params=RoadElementParams.create(F_0=0.5, sigma=2.5))
    road = build_road_elements([coll])
    dx, dy = coll.destinations()

    st = make_state(np.array([[1.0, 0.8, 0, 4, 0, 0, 0, 0]]),
                    dtype=np.float64)
    st = set_destinations(st, 0, dx, dy)
    pop = as_population(InvPendulumBicycleParams.create(), 1)
    model = MODELS["twod"]
    st = prepare(model, pop, st)
    sc = Scenario(Engine.create(pop, model, road=road), st, chunk=50)

    if args.plot_field:
        import matplotlib.pyplot as plt

        from cyclistsocialforce_tpu.viz import plot_force_field

        # reference-style field figure (scenarios/curve-scenario.py:90-125):
        # contourf of clamped |F| + white quiver + 1-D slice
        axes = plot_force_field((-5, 35), (-5, 35), road=road,
                                grid_step=0.25, quiver_step=1.0,
                                slice_y=0.0)
        ax0 = np.atleast_1d(axes)[0]
        from cyclistsocialforce_tpu.viz import draw_road

        draw_road(ax0, coll)   # reference-style surface + edge rendering
        ax0.set_title("road-edge force field")
        plt.show()
        return

    n_steps = int(args.t_end / sc.t_s)
    if args.video:
        from cyclistsocialforce_tpu.viz import write_video
        write_video(sc, n_steps, args.video, xlim=(-5, 35), ylim=(-5, 35))
        print(f"wrote {args.video}")
    else:
        traj = sc.run(n_steps=n_steps, record=True)
        print(sc.metrics.summary())
        print(f"final pos ({traj[-1, 0, 0]:.2f}, {traj[-1, 0, 1]:.2f})")


if __name__ == "__main__":
    main()
