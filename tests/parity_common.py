"""Shared helpers for golden-trajectory parity tests.

Golden data comes from running the ACTUAL reference package at
/root/reference through tests/oracle/ (see generate_golden.py)."""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

ENCROACH_S0 = np.array([
    [-6.0, 0, 0, 5, 0, 0, 0, 0],
    [15.0, -20, np.pi / 2, 5, 0, 0, 0, 0],
    [13.0, -20, np.pi / 2, 5, 0, 0, 0, 0],
])
ENCROACH_DESTS = [((35, 64, 65), (0, 0, 0)),
                  ((15, 15, 15), (20, 49, 50)),
                  ((13, 13, 13), (20, 49, 50))]
PARCOURS_DESTS = ((10, 20, 30, 40, 50, 50, 50), (0, 4, -4, 0, 4, 30, 31))


def load_golden(name):
    path = os.path.join(GOLDEN, name)
    if not os.path.exists(path):
        pytest.skip(f"golden file {name} missing; run "
                    "tests/oracle/generate_golden.py")
    return np.load(path)


def run_scenario(model_name, params, s0, dests, n_steps,
                 v_desired=None):
    """Build a population, run n_steps jitted, return (traj, fx, fy)."""
    import jax

    from cyclistsocialforce_tpu import Engine, make_state
    from cyclistsocialforce_tpu.models import MODELS, prepare
    from cyclistsocialforce_tpu.params import as_population
    from cyclistsocialforce_tpu.state import set_destinations

    s0 = np.asarray(s0, dtype=np.float64)
    n = s0.shape[0]
    st = make_state(s0, dtype=np.float64)
    for a, (dx, dy) in enumerate(dests):
        st = set_destinations(st, a, dx, dy)
    p = as_population(params, n)
    if v_desired is not None:
        p = p.replace(v_desired_default=np.asarray(v_desired))
    model = MODELS[model_name]
    st = prepare(model, p, st)
    eng = Engine.create(p, model)
    final, out = jax.jit(
        lambda e, s: e.simulate(s, n_steps, record_forces=True))(eng, st)
    traj, fx, fy = out
    return np.asarray(traj), np.asarray(fx), np.asarray(fy)


def assert_parity(golden, traj, fx, fy, n_agents, pos_tol=1e-3,
                  force_tol=1e-4, v_tol=1e-4):
    """Compare a [T, N, 8] run against reference golden trajectories.

    Golden traj_k layout: [n_states, T+1], column t = state at END of step
    t; our traj row t = state after step t+1.
    """
    T = traj.shape[0]
    for a in range(n_agents):
        ref = golden[f"traj_{a}"]
        assert ref.shape[1] >= T + 1
        pos_err = np.max(np.hypot(traj[:, a, 0] - ref[0, 1:T + 1],
                                  traj[:, a, 1] - ref[1, 1:T + 1]))
        assert pos_err < pos_tol, f"agent {a}: max position err {pos_err}"
        np.testing.assert_allclose(
            traj[:, a, 3], ref[3, 1:T + 1], atol=v_tol,
            err_msg=f"agent {a} speed")
        np.testing.assert_allclose(
            np.sin(traj[:, a, 2]), np.sin(ref[2, 1:T + 1]), atol=v_tol,
            err_msg=f"agent {a} yaw")
        if f"forces_{a}" in golden:
            np.testing.assert_allclose(
                fx[:, a], golden[f"forces_{a}"][0, 1:T + 1],
                atol=force_tol, err_msg=f"agent {a} Fx")
            np.testing.assert_allclose(
                fy[:, a], golden[f"forces_{a}"][1, 1:T + 1],
                atol=force_tol, err_msg=f"agent {a} Fy")
