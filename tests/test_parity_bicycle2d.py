"""Trajectory parity: TPU framework vs the actual NumPy reference.

Golden data is produced by running the reference package at /root/reference
through tests/oracle/ (regenerate with
``python tests/oracle/generate_golden.py``). The BASELINE north star
requires <= 1e-3 m; same-precision float64 execution should be far tighter.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def load_golden(name):
    path = os.path.join(GOLDEN, name)
    if not os.path.exists(path):
        pytest.skip(f"golden file {name} missing; run "
                    "tests/oracle/generate_golden.py")
    return np.load(path)


def run_encroachment(model_name, n_steps=700, n_state_cols=5):
    import jax

    from cyclistsocialforce_tpu import Engine, make_state
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BicycleParams, as_population
    from cyclistsocialforce_tpu.state import set_destinations

    s0 = np.array([
        [-6.0, 0, 0, 5, 0, 0, 0, 0],
        [15.0, -20, np.pi / 2, 5, 0, 0, 0, 0],
        [13.0, -20, np.pi / 2, 5, 0, 0, 0, 0],
    ])[:, :n_state_cols]
    st = make_state(s0, dtype=np.float64)
    st = set_destinations(st, 0, (35, 64, 65), (0, 0, 0))
    st = set_destinations(st, 1, (15, 15, 15), (20, 49, 50))
    st = set_destinations(st, 2, (13, 13, 13), (20, 49, 50))
    p = as_population(BicycleParams.create(), 3)
    p = p.replace(v_desired_default=np.array([4.5, 5.0, 5.0]))
    eng = Engine.create(p, MODELS[model_name])
    final, out = jax.jit(
        lambda e, s: e.simulate(s, n_steps, record_forces=True))(eng, st)
    traj, fx, fy = out
    return np.asarray(traj), np.asarray(fx), np.asarray(fy)


def test_encroachment_bicycle2d_parity():
    g = load_golden("encroachment_bicycle2d.npz")
    traj, fx, fy = run_encroachment("bicycle2d")

    for a in range(3):
        ref = g[f"traj_{a}"]          # [5, 701]; column k = state at step k
        got = traj[:, a, :5]          # [700, 5]; row t = state AFTER step t+1
        pos_err = np.max(np.hypot(got[:, 0] - ref[0, 1:],
                                  got[:, 1] - ref[1, 1:]))
        assert pos_err < 1e-3, f"agent {a}: max position error {pos_err}"
        # full state parity (psi may wrap at +-pi; compare via sin/cos)
        np.testing.assert_allclose(got[:, 3], ref[3, 1:], atol=1e-6,
                                   err_msg=f"agent {a} speed")
        np.testing.assert_allclose(np.sin(got[:, 2]), np.sin(ref[2, 1:]),
                                   atol=1e-6, err_msg=f"agent {a} yaw")
        # applied forces parity
        np.testing.assert_allclose(fx[:, a], g[f"forces_{a}"][0, 1:],
                                   atol=1e-6, err_msg=f"agent {a} Fx")


def test_hm_dest_force_parity():
    """Helbing-Molnar destination-force variant (reference
    vehicle.py:1196-1216) selected via dest_force="hm": golden parity of a
    single Bicycle against the actual reference."""
    import jax

    from cyclistsocialforce_tpu import Engine, make_state
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BicycleParams, as_population
    from cyclistsocialforce_tpu.state import set_destinations

    g = load_golden("hm_single.npz")
    T = g["traj_0"].shape[1] - 1

    st = make_state(np.array([[0.0, 0, 0, 3, 0]]), dtype=np.float64)
    st = set_destinations(st, 0, (20, 40, 40), (0, 10, 11))
    p = as_population(BicycleParams.create(), 1)
    p = p.replace(v_desired_default=np.array([4.0]))
    eng = Engine.create(p, MODELS["bicycle2d"], dest_force="hm")
    final, out = jax.jit(
        lambda e, s: e.simulate(s, T, record_forces=True))(eng, st)
    traj, fx, fy = (np.asarray(a) for a in out)

    ref = g["traj_0"]
    pos_err = np.max(np.hypot(traj[:, 0, 0] - ref[0, 1:],
                              traj[:, 0, 1] - ref[1, 1:]))
    assert pos_err < 1e-3, f"max position error {pos_err}"
    np.testing.assert_allclose(traj[:, 0, 3], ref[3, 1:], atol=1e-6,
                               err_msg="speed")
    np.testing.assert_allclose(np.sin(traj[:, 0, 2]), np.sin(ref[2, 1:]),
                               atol=1e-6, err_msg="yaw")
    np.testing.assert_allclose(fx[:, 0], g["forces_0"][0, 1:], atol=1e-6,
                               err_msg="Fx")
    np.testing.assert_allclose(fy[:, 0], g["forces_0"][1, 1:], atol=1e-6,
                               err_msg="Fy")
