"""Golden-trajectory parity: PlanarBicycle (planar two-wheeler).

The reference re-runs ct.place + a 1000-sample forced-response K_u scaling
per agent per step (dynamics.py:221-258); the TPU model's Ackermann +
exact FOH step-response formula must match to machine precision."""

from parity_common import (ENCROACH_DESTS, ENCROACH_S0, assert_parity,
                           load_golden, run_scenario)


def test_encroachment_planarbicycle():
    from cyclistsocialforce_tpu.params import PlanarBicycleParams

    golden = load_golden("encroachment_planarbicycle.npz")
    params = PlanarBicycleParams.create()
    traj, fx, fy = run_scenario(
        "planarbicycle", params, ENCROACH_S0, ENCROACH_DESTS, 700,
        v_desired=[4.5, 5.0, 5.0])
    assert_parity(golden, traj, fx, fy, 3, pos_tol=1e-9, force_tol=1e-9,
                  v_tol=1e-9)
