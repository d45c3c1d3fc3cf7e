"""Cross-model fuzz: random populations stay finite and hold invariants.

Every dynamics model runs random initial conditions (including slow /
reversing / tightly-packed riders) through the full engine for a few
hundred steps; states must stay finite and the navigation FSM one-hot --
the robustness the reference lacks (its heavy models are documented as
'not stable enough for crowded scenarios', README.md:79)."""

import jax
import numpy as np
import pytest

from cyclistsocialforce_tpu import Engine, make_state
from cyclistsocialforce_tpu.diagnostics import validate_state
from cyclistsocialforce_tpu.models import MODELS, prepare
from cyclistsocialforce_tpu.params import (BalancingRiderParams,
                                           BicycleParams,
                                           InvPendulumBicycleParams,
                                           PlanarBicycleParams,
                                           PlanarPointBicycleParams,
                                           as_population)
from cyclistsocialforce_tpu.state import set_destinations

PARAMS = {
    "bicycle2d": BicycleParams,
    "twod": InvPendulumBicycleParams,
    "invpendulum": InvPendulumBicycleParams,
    "balancingrider": BalancingRiderParams,
    "planarpoint": PlanarPointBicycleParams,
    "planarbicycle": PlanarBicycleParams,
}

# speed ranges honoring each model's documented stability envelope
V_RANGE = {
    "bicycle2d": (0.0, 8.0),
    "twod": (0.5, 6.5),
    "invpendulum": (0.3, 6.5),        # includes the walking regime
    "balancingrider": (1.5, 6.5),     # pole model fitted for 1.5-5.5 m/s
    "planarpoint": (0.5, 8.0),
    "planarbicycle": (0.5, 8.0),
}


@pytest.mark.parametrize("model_name", sorted(PARAMS))
@pytest.mark.parametrize("seed", [0, 1])
def test_random_population_stays_finite(model_name, seed):
    rng = np.random.default_rng(seed)
    n = 12
    s0 = np.zeros((n, 8))
    s0[:, 0] = rng.uniform(-15, 15, n)
    s0[:, 1] = rng.uniform(-15, 15, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    lo, hi = V_RANGE[model_name]
    s0[:, 3] = rng.uniform(lo, hi, n)

    st = make_state(s0, dtype=np.float64)
    for a in range(n):
        st = set_destinations(
            st, a, tuple(rng.uniform(-40, 40, 2)),
            tuple(rng.uniform(-40, 40, 2)), reset=True)
    p = as_population(PARAMS[model_name].create(), n)
    model = MODELS[model_name]
    st = prepare(model, p, st)
    eng = Engine.create(p, model)
    final, traj = jax.jit(lambda e, s: e.simulate(s, 300))(eng, st)
    traj = np.asarray(traj)
    assert np.all(np.isfinite(traj)), \
        f"{model_name}: non-finite states (seed {seed})"
    assert validate_state(final) == []
    # speeds respect the configured limits (with small numerical slack)
    from cyclistsocialforce_tpu.params import pair_hi, pair_lo
    vmax = float(np.max(np.asarray(pair_hi(p.v_max_riding))))
    vmin = float(np.min(np.asarray(pair_lo(p.v_max_riding))))
    assert np.all(traj[:, :, 3] <= vmax + 1e-6)
    assert np.all(traj[:, :, 3] >= vmin - 1e-6)
