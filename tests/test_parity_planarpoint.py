"""Trajectory parity vs the reference for PlanarPointBicycle (implicit-
midpoint planar point dynamics + TwoD spline destination force + TwoD
repulsive field)."""

import numpy as np

from parity_common import (ENCROACH_DESTS, ENCROACH_S0, PARCOURS_DESTS,
                           assert_parity, load_golden, run_scenario)


def _params():
    from cyclistsocialforce_tpu.params import PlanarPointBicycleParams

    return PlanarPointBicycleParams.create()


def test_encroachment_planarpoint_parity():
    g = load_golden("encroachment_planarpoint.npz")
    n_steps = g["traj_0"].shape[1] - 1
    traj, fx, fy = run_scenario(
        "planarpoint", _params(), ENCROACH_S0[:, :4], ENCROACH_DESTS,
        n_steps, v_desired=[4.5, 5.0, 5.0])
    assert_parity(g, traj, fx, fy, 3)


def test_parcours_planarpoint_parity():
    """Single rider on the parcours: spline destination force incl. the
    curvature speed limit and the last-destination branch. The golden stops
    where the reference crashes (upstream super() bug, see
    tests/oracle/generate_golden.py:run_intersection)."""
    g = load_golden("parcours_planarpoint.npz")
    n_steps = g["traj_0"].shape[1] - 1
    traj, fx, fy = run_scenario(
        "planarpoint", _params(), np.array([[0.0, 0, 0, 5]]),
        [PARCOURS_DESTS], n_steps)
    assert_parity(g, traj, fx, fy, 1)
