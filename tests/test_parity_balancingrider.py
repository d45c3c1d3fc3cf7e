"""Golden-trajectory parity: BalancingRiderBicycle (Whipple-Carvallo).

The reference solves a 7-state implicit-midpoint residual with scipy LM and
re-places poles via ct.place per speed change (dynamics.py:674-706); the
TPU model's closed-form block-triangular midpoint + Ackermann placement
must match to machine precision."""

import numpy as np

from parity_common import (ENCROACH_DESTS, ENCROACH_S0, assert_parity,
                           load_golden, run_scenario)


def test_encroachment_balancingrider():
    from cyclistsocialforce_tpu.params import BalancingRiderParams

    golden = load_golden("encroachment_balancingrider.npz")
    params = BalancingRiderParams.create()
    traj, fx, fy = run_scenario(
        "balancingrider", params, ENCROACH_S0, ENCROACH_DESTS, 700,
        v_desired=[4.5, 5.0, 5.0])
    # trajectories agree to ~1e-14 (LM tolerance); assert well below the
    # 1e-3 m north-star budget
    assert_parity(golden, traj, fx, fy, 3, pos_tol=1e-9, force_tol=1e-9,
                  v_tol=1e-9)


def test_stochastic_control_runs_stable():
    """Stochastic rider behavior: on-device pole resampling keeps the
    closed loop stable and finite (feature re-introduced on top of the
    reference's host-side-only path, parameters.py:1376-1411)."""
    import jax

    from cyclistsocialforce_tpu.params import BalancingRiderParams

    params = BalancingRiderParams.create(
        stochastic_control_behavior=True,
        controlparam_resampling_speedthresh=0.5)
    traj, fx, fy = run_scenario(
        "balancingrider", params, ENCROACH_S0, ENCROACH_DESTS, 400,
        v_desired=[4.5, 5.0, 5.0])
    assert np.all(np.isfinite(traj))
    # roll stays bounded (stable gains)
    assert np.max(np.abs(traj[:, :, 5])) < np.pi / 3


def test_torque_disturbances():
    """Re-introduced roll/steer torque disturbances perturb the trajectory
    but keep it finite (support removed upstream, dynamics.py:317-318)."""
    from cyclistsocialforce_tpu.params import BalancingRiderParams

    base = run_scenario(
        "balancingrider",
        BalancingRiderParams.create(), ENCROACH_S0, ENCROACH_DESTS, 200,
        v_desired=[4.5, 5.0, 5.0])[0]
    pert = run_scenario(
        "balancingrider",
        BalancingRiderParams.create(p_dist_steer=0.02, T_dist_steer=20.0),
        ENCROACH_S0, ENCROACH_DESTS, 200, v_desired=[4.5, 5.0, 5.0])[0]
    assert np.all(np.isfinite(pert))
    assert np.max(np.abs(pert - base)) > 1e-4
