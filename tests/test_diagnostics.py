"""Diagnostics: checkify guards, state validation."""

import numpy as np
import pytest

from cyclistsocialforce_tpu import Engine, make_state
from cyclistsocialforce_tpu.diagnostics import (checked_simulate,
                                                checked_step,
                                                validate_state)
from cyclistsocialforce_tpu.models import MODELS, prepare
from cyclistsocialforce_tpu.params import BicycleParams, as_population
from cyclistsocialforce_tpu.state import set_destinations


def _setup(bad=False):
    s0 = np.array([[0.0, 0, 0, 4, 0], [4.0, 1, 0, 4, 0]])
    st = make_state(s0, dtype=np.float64)
    st = set_destinations(st, 0, (40.0,), (0.0,))
    st = set_destinations(st, 1, (44.0,), (1.0,))
    p = as_population(BicycleParams.create(), 2)
    model = MODELS["bicycle2d"]
    st = prepare(model, p, st)
    if bad:
        st = st.replace(s=st.s.at[1, 0].set(np.nan))
    return Engine.create(p, model), st


def test_checked_step_clean():
    eng, st = _setup()
    err, new = checked_step(eng)(st)
    err.throw()   # no error
    assert np.all(np.isfinite(np.asarray(new.s)))


def test_checked_step_raises_on_nan():
    eng, st = _setup(bad=True)
    err, _ = checked_step(eng)(st)
    with pytest.raises(Exception, match="non-finite"):
        err.throw()


def test_checked_simulate_reports_step_index():
    import jax

    eng, st = _setup()
    err, (final, traj) = jax.jit(checked_simulate(eng, 50))(st)
    err.throw()
    assert np.asarray(traj).shape == (50, 2, 8)

    eng2, st2 = _setup(bad=True)
    err2, _ = jax.jit(checked_simulate(eng2, 50))(st2)
    with pytest.raises(Exception, match="step"):
        err2.throw()


def test_validate_state():
    _, st = _setup()
    assert validate_state(st) == []
    bad = st.replace(s=st.s.at[0, 2].set(np.inf),
                     znav=st.znav.at[1].set(True))
    problems = validate_state(bad)
    assert any("non-finite" in p for p in problems)
    assert any("FSM" in p for p in problems)
