"""Scripted (uncontrolled) agents: the UncontrolledVehicle equivalent.

Reference semantics (vehicle.py:920-987): a scripted agent replays its
prescribed trajectory, ignores all forces, holds its last state when the
script ends -- and still emits a repulsive force field on the others."""

import jax
import numpy as np

from cyclistsocialforce_tpu import Engine, make_state
from cyclistsocialforce_tpu.engine import ScriptedTraj
from cyclistsocialforce_tpu.models import MODELS, prepare
from cyclistsocialforce_tpu.params import BicycleParams, as_population
from cyclistsocialforce_tpu.state import set_destinations


def _build(with_car: bool, n_steps=400):
    # agent 0: bike riding +x; agent 1: car crossing its path from the side
    s0 = np.array([
        [0.0, 0.0, 0.0, 4.0, 0.0],
        [20.0, -12.0, np.pi / 2, 3.0, 0.0],
    ])
    n = s0.shape[0]
    st = make_state(s0, dtype=np.float64)
    st = set_destinations(st, 0, (60.0,), (0.0,))
    st = set_destinations(st, 1, (20.0,), (50.0,))

    p = as_population(BicycleParams.create(), n)
    # car-like force field: stronger, wider (per-agent heterogeneity)
    p = p.replace(f_0=np.array([7.0, 12.0]), sigma_1=np.array([5.0, 8.0]))

    t = np.arange(n_steps + 1) * 0.01
    car_traj = np.stack([
        np.full_like(t, 20.0), -12.0 + 3.0 * t,
        np.full_like(t, np.pi / 2), np.full_like(t, 3.0)], axis=1)
    scripted = ScriptedTraj.create(
        n, {1: car_traj} if with_car else {}, dtype=np.float64)

    model = MODELS["bicycle2d"]
    st = prepare(model, p, st)
    eng = Engine.create(p, model, scripted=scripted)
    final, traj = jax.jit(lambda e, s: e.simulate(s, n_steps))(eng, st)
    return np.asarray(traj), car_traj


def test_scripted_agent_replays_exactly():
    traj, car_traj = _build(with_car=True)
    # car states equal the script at every step (row t = state after
    # step t+1 = script index t+1)
    np.testing.assert_allclose(traj[:, 1, :4], car_traj[1:, :4],
                               atol=1e-12)


def test_scripted_agent_holds_after_script_end():
    traj, car_traj = _build(with_car=True, n_steps=400)
    # rebuild with a short script: 100 entries, run 200 steps
    s0 = np.array([[0.0, 0.0, 0.0, 4.0, 0.0],
                   [20.0, -12.0, np.pi / 2, 3.0, 0.0]])
    st = make_state(s0, dtype=np.float64)
    st = set_destinations(st, 0, (60.0,), (0.0,))
    st = set_destinations(st, 1, (20.0,), (50.0,))
    p = as_population(BicycleParams.create(), 2)
    short = car_traj[:100]
    scripted = ScriptedTraj.create(2, {1: short}, dtype=np.float64)
    model = MODELS["bicycle2d"]
    st = prepare(model, p, st)
    eng = Engine.create(p, model, scripted=scripted)
    _, traj2 = jax.jit(lambda e, s: e.simulate(s, 200))(eng, st)
    traj2 = np.asarray(traj2)
    np.testing.assert_allclose(traj2[98, 1, :4], short[99, :4], atol=1e-12)
    # held at the last script state afterwards
    np.testing.assert_allclose(traj2[150, 1, :4], short[99, :4],
                               atol=1e-12)


def test_scripted_agent_deflects_others():
    """The crossing car's emitted force field pushes the bike off the
    straight line it rides without the car."""
    with_car, _ = _build(with_car=True)
    without, _ = _build(with_car=False)
    # (without the car the 'car' agent is a regular bike riding its own
    # destination -- compare only agent 0's lateral deviation near the
    # crossing point)
    dev_with = np.max(np.abs(with_car[:, 0, 1]))
    assert dev_with > 0.05, "car did not deflect the bike"
    assert np.all(np.isfinite(with_car))


def test_scripted_agent_ignores_forces():
    """Scripted rows take zero total force (dest force zeroed, repulsion
    clamped by |F_dest| = 0)."""
    s0 = np.array([[0.0, 0.0, 0.0, 4.0, 0.0],
                   [6.0, 0.5, np.pi, 4.0, 0.0]])   # head-on, close
    st = make_state(s0, dtype=np.float64)
    st = set_destinations(st, 0, (60.0,), (0.0,))
    st = set_destinations(st, 1, (-60.0,), (0.0,))
    p = as_population(BicycleParams.create(), 2)
    car = np.stack([6.0 - 0.04 * np.arange(101), np.full(101, 0.5),
                    np.full(101, np.pi), np.full(101, 4.0)], axis=1)
    scripted = ScriptedTraj.create(2, {1: car}, dtype=np.float64)
    model = MODELS["bicycle2d"]
    st = prepare(model, p, st)
    eng = Engine.create(p, model, scripted=scripted)
    final, out = jax.jit(
        lambda e, s: e.simulate(s, 100, record_forces=True))(eng, st)
    traj, fx, fy = (np.asarray(a) for a in out)
    np.testing.assert_allclose(fx[:, 1], 0.0, atol=1e-12)
    np.testing.assert_allclose(fy[:, 1], 0.0, atol=1e-12)
    np.testing.assert_allclose(traj[:, 1, :4], car[1:, :4], atol=1e-12)


def test_scripted_sorted_resident_matches_gather_path():
    """Scripted agents under the sorted-resident culled fast path
    (unlocked round 5 by uid-indexed replay tables): rows live in
    cell-sorted order across rebuild chunks, the replay follows the
    agent through the permutation, and the run bit-matches the
    non-sorted-resident culled engine."""
    import jax
    import jax.numpy as jnp

    from cyclistsocialforce_tpu import Engine, make_state
    from cyclistsocialforce_tpu.engine import NeighborConfig, ScriptedTraj
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BicycleParams
    from cyclistsocialforce_tpu.state import set_destinations

    n = 64
    rng = np.random.default_rng(3)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(-40, 40, n)
    s0[:, 1] = rng.uniform(-40, 40, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    st = make_state(s0, dtype=np.float64)
    for a in range(n):
        st = set_destinations(st, a, (rng.uniform(-50, 50),),
                              (rng.uniform(-50, 50),))
    t_script, ts = 25, 0.01
    tr = {}
    for a in (5, 40):
        t = np.zeros((t_script, 4))
        t[:, 0] = s0[a, 0] + 8 * ts * np.arange(1, t_script + 1)
        t[:, 1] = s0[a, 1]
        t[:, 3] = 8.0
        tr[a] = t
    sc = ScriptedTraj.create(n, tr, dtype=jnp.float64)
    nbr = NeighborConfig(cutoff=1e3, block=16, kb=4, backend="xla",
                         rebuild_every=4)
    eng_sr = Engine.create(BicycleParams.create(), MODELS["bicycle2d"],
                           scripted=sc, neighbors=nbr,
                           sorted_resident=True)
    eng_no = Engine.create(BicycleParams.create(), MODELS["bicycle2d"],
                           scripted=sc, neighbors=nbr,
                           sorted_resident=False)
    n_steps = 30    # 25-step script: replay + hold, chunks + remainder
    out_sr, _ = jax.jit(lambda e, s: e.simulate(s, n_steps,
                                                record=False))(eng_sr, st)
    out_no, _ = jax.jit(lambda e, s: e.simulate(s, n_steps,
                                                record=False))(eng_no, st)
    np.testing.assert_allclose(np.asarray(out_sr.s),
                               np.asarray(out_no.s), rtol=0, atol=1e-12)
    # the scripted rows actually replayed (and held) their scripts
    np.testing.assert_allclose(
        np.asarray(out_sr.s)[5, 0], tr[5][-1, 0], rtol=0, atol=1e-12)
