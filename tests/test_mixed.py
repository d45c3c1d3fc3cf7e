"""Heterogeneous populations: partitioned-batch MixedEngine."""

import jax
import numpy as np
import pytest

from cyclistsocialforce_tpu import Engine, make_state
from cyclistsocialforce_tpu.mixed import MixedEngine, prepare_groups
from cyclistsocialforce_tpu.models import MODELS, prepare
from cyclistsocialforce_tpu.params import (BicycleParams,
                                           InvPendulumBicycleParams,
                                           as_population)
from cyclistsocialforce_tpu.state import set_destinations


def _state(s0, dests):
    st = make_state(np.asarray(s0, dtype=np.float64), dtype=np.float64)
    for a, (dx, dy) in enumerate(dests):
        st = set_destinations(st, a, dx, dy)
    return st


@pytest.mark.slow
def test_far_apart_groups_match_homogeneous_engines():
    """With groups too far apart to interact, each group's trajectory in
    the mixed engine equals its homogeneous-engine run."""
    s0_a = [[0.0, 0.0, 0.0, 4.0, 0.0], [2.0, 1.0, 0.0, 4.0, 0.0]]
    s0_b = [[5000.0, 5000.0, 0.0, 4.0, 0.0],
            [5002.0, 5001.0, 0.0, 4.0, 0.0]]
    dests_a = [((40.0,), (0.0,)), ((42.0,), (1.0,))]
    dests_b = [((5040.0,), (5000.0,)), ((5042.0,), (5001.0,))]

    pa = as_population(BicycleParams.create(), 2)
    pb = as_population(InvPendulumBicycleParams.create(), 2)

    # homogeneous baselines
    st_a = prepare(MODELS["bicycle2d"], pa, _state(s0_a, dests_a))
    _, traj_a = jax.jit(lambda e, s: e.simulate(s, 200))(
        Engine.create(pa, MODELS["bicycle2d"]), st_a)
    st_b = prepare(MODELS["twod"], pb, _state(s0_b, dests_b))
    _, traj_b = jax.jit(lambda e, s: e.simulate(s, 200))(
        Engine.create(pb, MODELS["twod"]), st_b)

    # mixed run
    st = _state(s0_a + s0_b, dests_a + dests_b)
    meng = MixedEngine.create([("bicycle2d", pa, 2), ("twod", pb, 2)])
    st = prepare_groups(meng, st)
    _, traj_m = jax.jit(lambda e, s: e.simulate(s, 200))(meng, st)

    traj_a, traj_b, traj_m = (np.asarray(t) for t in
                              (traj_a, traj_b, traj_m))
    np.testing.assert_allclose(traj_m[:, :2], traj_a, atol=1e-9)
    np.testing.assert_allclose(traj_m[:, 2:], traj_b, atol=1e-9)


def test_cross_group_interaction():
    """Agents from different model families repel each other: a twod
    rider deflects a bicycle2d rider riding alongside."""
    s0 = [[0.0, 0.0, 0.0, 4.0, 0.0],        # bicycle2d
          [2.0, 1.2, 0.0, 4.0, 0.0]]        # twod, close alongside
    dests = [((60.0,), (0.0,)), ((62.0,), (1.2,))]
    pa = as_population(BicycleParams.create(), 1)
    pb = as_population(InvPendulumBicycleParams.create(), 1)

    st = _state(s0, dests)
    meng = MixedEngine.create([("bicycle2d", pa, 1), ("twod", pb, 1)])
    st = prepare_groups(meng, st)
    _, traj = jax.jit(lambda e, s: e.simulate(s, 300))(meng, st)
    traj = np.asarray(traj)
    assert np.all(np.isfinite(traj))

    # solo baseline: the bicycle2d rider alone rides straight
    st1 = prepare(MODELS["bicycle2d"], pa, _state(s0[:1], dests[:1]))
    _, solo = jax.jit(lambda e, s: e.simulate(s, 300))(
        Engine.create(pa, MODELS["bicycle2d"]), st1)
    solo = np.asarray(solo)
    dev_mixed = np.max(np.abs(traj[:, 0, 1] - solo[:, 0, 1]))
    assert dev_mixed > 1e-3, "no cross-group repulsion felt"
