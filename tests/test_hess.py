"""Hess (2012) human-control bicycle model tests.

No golden parity exists (the reference's Hess runtime path cannot execute
upstream -- see models/hessbikerider.py docstring); the oracle here is
control theory: closed-loop stability and yaw step-response tracking of an
independently constructed system, following the pattern of the reference's
own in-package test (reference test.py:15-170)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def params():
    from cyclistsocialforce_tpu.models.hessbikerider import \
        HessBikeRiderParams

    return HessBikeRiderParams.create()


def test_closed_loop_stable_at_speed(params):
    """Eigenvalues of A(v) have negative real parts for v >= 5."""
    from cyclistsocialforce_tpu.models.hessbikerider import _hess_A_B

    for v in (5.0, 6.0, 7.0):
        A, _ = _hess_A_B(params, np.float64(v), np.float64)
        ev = np.linalg.eigvals(np.asarray(A))
        assert np.all(ev.real < 0), f"unstable at v={v}: {ev}"


def test_yaw_step_response_tracks_command(params):
    """At constant speed, a yaw step command converges to the commanded
    yaw (the loop has unity DC gain from psi_c to psi by construction:
    y_ss = -C A^{-1} B with the k_psi feedback path)."""
    import jax
    import jax.numpy as jnp

    from cyclistsocialforce_tpu.models.hessbikerider import _hess_A_B

    v = np.float64(5.5)
    A, B = _hess_A_B(params, v, np.float64)
    A, B = np.asarray(A), np.asarray(B)
    # DC gain psi_c -> psi
    x_ss = -np.linalg.solve(A, B)
    np.testing.assert_allclose(x_ss[4], 1.0, atol=1e-9)

    # midpoint simulation of a 0.3 rad step, 8 s
    h = 0.01
    x = np.zeros(7)
    lhs = np.eye(7) - h / 2 * A
    rhs_m = np.eye(7) + h / 2 * A
    psi_c = 0.3
    for _ in range(800):
        x = np.linalg.solve(lhs, rhs_m @ x + h * B * psi_c)
    assert abs(x[4] - psi_c) < 1e-3


def test_full_model_scenario_runs(params):
    """End-to-end: Hess agents ride the encroachment scenario (at v >= 5
    where the fixed gains stabilize the loop) without blow-up."""
    from parity_common import ENCROACH_DESTS, ENCROACH_S0, run_scenario

    s0 = np.asarray(ENCROACH_S0, dtype=float).copy()
    s0[:, 3] = 5.5
    traj, fx, fy = run_scenario("hess", params, s0, ENCROACH_DESTS, 300,
                                v_desired=[5.5, 5.5, 5.5])
    assert np.all(np.isfinite(traj))
    assert np.max(np.abs(traj[:, :, 5])) < np.pi / 3   # roll bounded
    # yaw of agent 0 stays near 0 (straight-line destination run)
    assert np.max(np.abs(traj[:, 0, 2])) < 0.5
