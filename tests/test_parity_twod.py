"""Trajectory parity vs the reference for TwoDBicycle (2D kinematics +
spline destination force + TwoD repulsive field + arrived-freeze +
straight-line fallback quirk).

The reference TwoDBicycle cannot be constructed as-is in v2.1.1 (broken
ctor, vehicle.py:1359); the golden uses the reconstructed constructor in
tests/oracle/generate_golden.py:construct_twod_family."""

import numpy as np

from parity_common import (ENCROACH_DESTS, ENCROACH_S0,
                           PARCOURS_DESTS, assert_parity, load_golden,
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


def test_encroachment_twod():
    """3-agent encroachment: the BMD2023 repulsive field + spline
    destination force under multi-agent interaction."""
    from cyclistsocialforce_tpu.params import InvPendulumBicycleParams

    golden = load_golden("encroachment_twod.npz")
    params = InvPendulumBicycleParams.create()
    traj, fx, fy = run_scenario(
        "twod", params, ENCROACH_S0, ENCROACH_DESTS, 700,
        v_desired=[4.5, 5.0, 5.0])
    assert_parity(golden, traj, fx, fy, 3, pos_tol=1e-6, force_tol=1e-6,
                  v_tol=1e-6)
