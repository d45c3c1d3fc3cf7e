"""Trajectory parity vs the reference for TwoDBicycle (2D kinematics +
spline destination force + TwoD repulsive field + arrived-freeze +
straight-line fallback quirk).

The reference TwoDBicycle cannot be constructed as-is in v2.1.1 (broken
ctor, vehicle.py:1359); the golden uses the reconstructed constructor in
tests/oracle/generate_golden.py:construct_twod_family."""

import numpy as np

from parity_common import (PARCOURS_DESTS, assert_parity, load_golden,
                           run_scenario)


def _params():
    from cyclistsocialforce_tpu.params import InvPendulumBicycleParams

    # reference TwoDBicycle runs on InvPendulumBicycleParameters
    # (vehicle.py:1355-1357)
    return InvPendulumBicycleParams.create()


def test_parcours_twod_parity():
    g = load_golden("parcours_twod.npz")
    n_steps = g["traj_0"].shape[1] - 1
    traj, fx, fy = run_scenario(
        "twod", _params(), np.array([[0.0, 0, 0, 5, 0]]),
        [PARCOURS_DESTS], n_steps)
    assert_parity(g, traj, fx, fy, 1)
