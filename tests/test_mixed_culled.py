"""MixedEngine x neighbor culling x scripted agents (VERDICT r1 item 6).

Heterogeneous crowds (twod + legacy force families in one space, plus
force-immune scripted agents) through the block-sparse culled pair stage,
validated against the dense MixedEngine oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclistsocialforce_tpu import make_state
from cyclistsocialforce_tpu.engine import NeighborConfig, ScriptedTraj
from cyclistsocialforce_tpu.mixed import MixedEngine, prepare_groups
from cyclistsocialforce_tpu.params import (BicycleParams,
                                           InvPendulumBicycleParams,
                                           as_population)


def _mixed_setup(n_legacy, n_twod, side, seed=0, dtype=np.float64):
    n = n_legacy + n_twod
    rng = np.random.default_rng(seed)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, side, n)
    s0[:, 1] = rng.uniform(0, side, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    st = make_state(s0, dtype=dtype)
    pa = as_population(BicycleParams.create(), n_legacy)        # legacy
    pb = as_population(InvPendulumBicycleParams.create(), n_twod)  # twod
    groups = [("bicycle2d", pa, n_legacy), ("twod", pb, n_twod)]
    return st, groups


@pytest.mark.parametrize("backend,tol", [("xla", 1e-9), ("interpret", 2e-4)])
def test_mixed_culled_matches_dense_full_cutoff(backend, tol):
    """With a domain-covering cutoff the culled mixed-family stage equals
    the dense MixedEngine pair stage (both families in one tile)."""
    st, groups = _mixed_setup(96, 160, side=120.0)
    dense = MixedEngine.create(groups)
    fx_d, fy_d = dense._repulsive(st)
    culled = MixedEngine.create(groups, neighbors=NeighborConfig(
        cutoff=1e4, block=64, kb=4, backend=backend))
    fx_c, fy_c = culled._repulsive_culled(st)
    np.testing.assert_allclose(np.asarray(fx_c), np.asarray(fx_d), atol=tol)
    np.testing.assert_allclose(np.asarray(fy_c), np.asarray(fy_d), atol=tol)


@pytest.mark.slow
def test_mixed_culled_cutoff_error_bounded():
    """Mixed-family production cutoff: dropped tail below the 1e-4 force
    tolerance. The legacy field needs a LARGER cutoff than twod: its
    forward decay exponent is rho*sqrt((1-e)/(1+e))/p_decay, which for a
    fast source (e -> 1) is far slower than twod's exp(-rho/sigma) --
    measured 1.5e-3 at 60 m, 3.2e-5 at 100 m (vs 9e-5 at 50 m for pure
    twod populations)."""
    st, groups = _mixed_setup(128, 384, side=400.0, seed=2)
    dense = MixedEngine.create(groups)
    fx_d, fy_d = dense._repulsive(st)
    culled = MixedEngine.create(groups, neighbors=NeighborConfig(
        cutoff=100.0, block=64, kb=24, backend="xla"))
    fx_c, fy_c = culled._repulsive_culled(st)
    err = np.max(np.hypot(np.asarray(fx_c - fx_d), np.asarray(fy_c - fy_d)))
    assert err < 1e-4, err


@pytest.mark.slow
def test_mixed_culled_simulate_matches_dense():
    """End-to-end: several steps of the culled mixed engine track the
    dense mixed engine (chunked rebuild path included)."""
    st, groups = _mixed_setup(64, 64, side=80.0, seed=3)
    st = prepare_groups(MixedEngine.create(groups), st)
    dense = MixedEngine.create(groups)
    culled = MixedEngine.create(groups, neighbors=NeighborConfig(
        cutoff=1e4, block=32, kb=8, backend="xla", rebuild_every=3))
    f_d, _ = jax.jit(lambda s: dense.simulate(s, 7, record=False))(st)
    f_c, _ = jax.jit(lambda s: culled.simulate(s, 7, record=False))(st)
    np.testing.assert_allclose(np.asarray(f_c.s), np.asarray(f_d.s),
                               atol=1e-9)


@pytest.mark.slow
def test_mixed_culled_with_scripted_car():
    """A scripted 'car' (replayed trajectory, force-immune) in a culled
    mixed crowd: it follows its script exactly and deflects a nearby
    rider (reference vehicle.py:920-987 + intersection.py:813-823)."""
    # agent 0: scripted car driving +x at 8 m/s, overtaking agent 1
    # closely (the BMD2023 field is short-ranged for heading-ALIGNED
    # pairs -- sigma ~ 0.5 m -- so the overtake must pass within ~1 m)
    # agent 2: twod rider far away (exercises both families in tiles)
    s0 = np.array([[0.0, 0.0, 0.0, 8.0, 0.0],
                   [1.5, 0.6, 0.0, 4.0, 0.0],
                   [60.0, 40.0, 0.0, 4.0, 0.0]])
    st = make_state(s0, dtype=np.float64)
    from cyclistsocialforce_tpu.state import set_destinations
    st = set_destinations(st, 1, (80.0,), (0.6,))
    st = set_destinations(st, 2, (120.0,), (40.0,))

    t_steps = 100
    ts = 0.01
    traj_car = np.zeros((t_steps + 1, 4))
    traj_car[:, 0] = 8.0 * ts * np.arange(t_steps + 1)
    traj_car[:, 3] = 8.0
    scripted = ScriptedTraj.create(3, {0: traj_car}, dtype=jnp.float64)

    # the car emits the (long-ranged) twod field; the rider next to it is
    # a legacy-family bicycle2d agent -- three groups, two families, one
    # scripted agent (the legacy field's default parameters decay within
    # ~1 m, so the deflection signal must come from a twod source)
    p_car = as_population(InvPendulumBicycleParams.create(), 1)
    p_rider = as_population(BicycleParams.create(), 1)
    p_twod = as_population(InvPendulumBicycleParams.create(), 1)
    spec = [("twod", p_car, 1), ("bicycle2d", p_rider, 1),
            ("twod", p_twod, 1)]
    meng = MixedEngine.create(
        spec, scripted=scripted,
        neighbors=NeighborConfig(cutoff=100.0, block=32, kb=8,
                                 backend="xla", rebuild_every=2))
    st = prepare_groups(meng, st)
    final, traj = jax.jit(lambda s: meng.simulate(s, t_steps))(st)
    traj = np.asarray(traj)
    assert np.all(np.isfinite(traj))
    # scripted car follows the script exactly
    np.testing.assert_allclose(traj[:, 0, 0], traj_car[1:, 0], atol=1e-12)
    np.testing.assert_allclose(traj[:, 0, 1], 0.0, atol=1e-12)

    # rider deflects away from the car vs a run without the car's field
    meng_nocar = MixedEngine.create(
        spec, scripted=scripted,
        neighbors=NeighborConfig(cutoff=100.0, block=32, kb=8,
                                 backend="xla", rebuild_every=2))
    # baseline: same sim but rider starts far from the car
    s0b = s0.copy()
    s0b[1, 1] = 500.0
    stb = make_state(s0b, dtype=np.float64)
    stb = set_destinations(stb, 1, (80.0,), (500.0,))
    stb = set_destinations(stb, 2, (120.0,), (40.0,))
    stb = prepare_groups(meng_nocar, stb)
    _, trajb = jax.jit(lambda s: meng_nocar.simulate(s, t_steps))(stb)
    trajb = np.asarray(trajb)
    dev = np.abs((traj[:, 1, 1] - 0.6) - (trajb[:, 1, 1] - 500.0)).max()
    assert dev > 1e-4, "rider not deflected by the scripted car's field"


@pytest.mark.slow
def test_mixed_culled_10k_smoke():
    """10k heterogeneous agents (twod + legacy) through the culled path:
    runs under jit+scan, stays finite (VERDICT r1 'Done' criterion)."""
    st, groups = _mixed_setup(4096, 6144, side=720.0, seed=5,
                              dtype=np.float32)
    st = prepare_groups(MixedEngine.create(groups), st)
    culled = MixedEngine.create(groups, neighbors=NeighborConfig(
        cutoff=50.0, block=128, kb=16, backend="xla", rebuild_every=5,
        screen=False))
    final, _ = jax.jit(lambda s: culled.simulate(s, 10, record=False))(st)
    s = np.asarray(final.s)
    assert np.all(np.isfinite(s))
    assert np.abs(s[:, :2]).max() < 1e4
