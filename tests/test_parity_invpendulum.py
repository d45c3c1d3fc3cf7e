"""Trajectory parity vs the reference for InvPendulumBicycle (speed-
scheduled full-state feedback lean/steer dynamics + spline destination
force + TwoD repulsive field + riding/walking FSM).

The reference InvPendulumBicycle cannot be constructed as-is in v2.1.1
(broken ctor, vehicle.py:1359); the golden uses the reconstructed
constructor in tests/oracle/generate_golden.py:construct_twod_family."""

from parity_common import (ENCROACH_DESTS, ENCROACH_S0, assert_parity,
                           load_golden, run_scenario)


def test_encroachment_invpendulum_parity():
    from cyclistsocialforce_tpu.params import InvPendulumBicycleParams

    g = load_golden("encroachment_invpendulum.npz")
    n_steps = g["traj_0"].shape[1] - 1
    traj, fx, fy = run_scenario(
        "invpendulum", InvPendulumBicycleParams.create(),
        ENCROACH_S0[:, :6], ENCROACH_DESTS, n_steps,
        v_desired=[4.5, 5.0, 5.0])
    assert_parity(g, traj, fx, fy, 3)
