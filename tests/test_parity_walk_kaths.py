"""Golden parity: InvPendulum walking->riding transition and the Kaths
external model (single agent)."""

import numpy as np

from parity_common import load_golden, run_scenario


def test_walk_invpendulum():
    """Start below walking speed: the riding/walking FSM walks, builds
    speed, transitions to riding (reference vehicle.py:1932-1950)."""
    from cyclistsocialforce_tpu.params import InvPendulumBicycleParams

    golden = load_golden("walk_invpendulum.npz")
    params = InvPendulumBicycleParams.create()
    s0 = np.array([[0.0, 0, 0, 0.5, 0, 0, 0, 0]])
    traj, fx, fy = run_scenario("invpendulum", params, s0,
                                [((30, 31), (0, 0))], 1500)
    ref = golden["traj_0"]
    T = traj.shape[0]
    perr = np.max(np.hypot(traj[:, 0, 0] - ref[0, 1:T + 1],
                           traj[:, 0, 1] - ref[1, 1:T + 1]))
    assert perr < 1e-6, f"max position err {perr}"
    np.testing.assert_allclose(traj[:, 0, 3], ref[3, 1:T + 1], atol=1e-8)
    # the transition actually happened: starts below walking speed, rides
    assert ref[3, 0] < 1.5 and np.max(traj[:, 0, 3]) > 3.0


def test_kaths_single_agent():
    """Kaths particle model driven by its own destination force (reference
    external.py run through Vehicle strategy injection)."""
    import jax

    from cyclistsocialforce_tpu import Engine, external, make_state
    from cyclistsocialforce_tpu.params import BicycleParams, as_population
    from cyclistsocialforce_tpu.state import set_destinations

    golden = load_golden("kaths_single.npz")
    st = make_state(np.array([[0.0, 0.0, 0.1, 2.0]]), dtype=np.float64)
    st = set_destinations(st, 0, (30, 30, 30), (5, 20, 21), reset=True)
    p = as_population(BicycleParams.create(
        v_desired_default=4.0, rep_force=external.KATHS_VELOANISO_PARAMS,
        dest_force=external.KATHS_VELOANISO_PARAMS), 1)
    eng = Engine.create(p, external)
    n_steps = 1200
    final, out = jax.jit(
        lambda e, s: e.simulate(s, n_steps, record_forces=True))(eng, st)
    traj, fv, ft = (np.asarray(a) for a in out)

    ref = golden["traj_0"]
    perr = np.max(np.hypot(traj[:, 0, 0] - ref[0, 1:n_steps + 1],
                           traj[:, 0, 1] - ref[1, 1:n_steps + 1]))
    assert perr < 1e-6, f"max position err {perr}"
    np.testing.assert_allclose(traj[:, 0, 3], ref[3, 1:n_steps + 1],
                               atol=1e-8)
    np.testing.assert_allclose(fv[:, 0],
                               golden["forces_0"][0, 1:n_steps + 1],
                               atol=1e-8)
    np.testing.assert_allclose(ft[:, 0],
                               golden["forces_0"][1, 1:n_steps + 1],
                               atol=1e-8)
