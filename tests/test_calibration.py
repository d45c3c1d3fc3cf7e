"""Calibration subsystem: synthetic-recovery oracle.

Generate tracks with KNOWN parameters, perturb the guess, and require the
Nelder-Mead calibration to recover the truth -- a stronger check than the
reference's research plots (reference calibration.py has no tests)."""

import numpy as np
import pytest

from cyclistsocialforce_tpu.calibration import (Calibration,
                                                CalibrationData,
                                                maesse_samples,
                                                sse_timesteps)
from cyclistsocialforce_tpu.models import MODELS
from cyclistsocialforce_tpu.params import BicycleParams


def _make_tracks(k_p_v=10.0, n_tracks=6, t_steps=150, seed=0,
                 features=(0, 1)):
    """Synthesize tracks from the bicycle2d model with known params."""
    import jax
    import jax.numpy as jnp

    from cyclistsocialforce_tpu.params import as_population
    from cyclistsocialforce_tpu.state import make_state

    rng = np.random.default_rng(seed)
    model = MODELS["bicycle2d"]
    params = BicycleParams.create(k_p_v=k_p_v)
    s0 = np.zeros((n_tracks, 5))
    s0[:, 2] = rng.uniform(-0.3, 0.3, n_tracks)
    s0[:, 3] = rng.uniform(2.0, 5.0, n_tracks)
    # smooth force inputs (desired velocity vectors)
    t = np.arange(t_steps) * 0.01
    fx = 3.0 + 1.0 * np.sin(2 * np.pi * 0.2 * t)[None, :] \
        + rng.normal(0, 0.1, (n_tracks, 1))
    fy = 0.8 * np.sin(2 * np.pi * 0.15 * t + rng.uniform(
        0, np.pi, (n_tracks, 1)))
    inputs = np.stack([fx * np.ones((n_tracks, t_steps)), fy], axis=2)

    pop = as_population(params, n_tracks)
    st = make_state(jnp.asarray(s0), dtype=jnp.float64)

    def body(s, u):
        s2 = model.step(pop, s, u[:, 0], u[:, 1])
        return s2, s2.s[:, :4]

    _, out = jax.lax.scan(body, st, jnp.swapaxes(jnp.asarray(inputs),
                                                 0, 1))
    out = np.asarray(jnp.swapaxes(out, 0, 1))      # [K, T, 4]
    first = s0[:, None, :4]
    obs = np.concatenate([first, out[:, :-1]], axis=1)
    tracks = [(s0[j], inputs[j], obs[j][:, list(features)]) for j in
              range(n_tracks)]
    return CalibrationData.from_tracks(tracks)


def test_objective_zero_at_truth():
    data = _make_tracks(k_p_v=10.0)
    cal = Calibration(MODELS["bicycle2d"], BicycleParams.create(),
                      ["k_p_v"], data, objective_features=(0, 1),
                      fix_speed=False, verbose=False)
    assert cal.objective([10.0]) < 1e-16
    assert cal.objective([5.0]) > 1e-4


def test_recovers_known_parameter():
    data = _make_tracks(k_p_v=10.0)
    cal = Calibration(MODELS["bicycle2d"], BicycleParams.create(),
                      ["k_p_v"], data, objective_features=(0, 1),
                      fix_speed=False, maxiter=60, verbose=False)
    xopt, res = cal.run([5.0])
    assert abs(xopt[0] - 10.0) < 0.05
    assert res["error"] < 1e-8


def test_population_evaluation_matches_scalar():
    data = _make_tracks()
    cal = Calibration(MODELS["bicycle2d"], BicycleParams.create(),
                      ["k_p_v"], data, objective_features=(0, 1),
                      fix_speed=False, verbose=False)
    cands = np.array([[5.0], [8.0], [10.0], [12.0]])
    errs = cal.evaluate_population(cands)
    singles = [cal.objective(c) for c in cands]
    np.testing.assert_allclose(errs, singles, rtol=1e-10)
    assert np.argmin(errs) == 2


def test_fix_speed_clamps_speed():
    data = _make_tracks()
    cal = Calibration(MODELS["bicycle2d"], BicycleParams.create(),
                      ["k_p_v"], data, objective_features=(3,),
                      fix_speed=True, verbose=False)
    import jax.numpy as jnp
    out = np.asarray(cal.simulate(cal.params, data))
    # with fix_speed, the pre-step speed equals |input| -- so the recorded
    # speed after each step equals the model's one-step response from the
    # clamped value; just require it to track |input| closely
    vin = np.hypot(data.inputs[..., 0], data.inputs[..., 1])
    assert np.max(np.abs(out[:, 1:, 0] - vin[:, :-1])) < 0.5


def test_auxfuncs_transform():
    data = _make_tracks(k_p_v=10.0)
    # optimizer works in log-space: k_p_v = exp(vals[0])
    import jax.numpy as jnp
    cal = Calibration(MODELS["bicycle2d"], BicycleParams.create(),
                      ["k_p_v"], data, objective_features=(0, 1),
                      fix_speed=False, maxiter=60, verbose=False,
                      params_auxfuncs=[lambda v: jnp.exp(v[0])])
    xopt, res = cal.run([np.log(5.0)])
    assert abs(np.exp(xopt[0]) - 10.0) < 0.05


def test_split_and_test_error():
    data = _make_tracks(n_tracks=8)
    train, test = data.split(0.75, rng=np.random.default_rng(1))
    assert len(train) == 6 and len(test) == 2
    cal = Calibration(MODELS["bicycle2d"], BicycleParams.create(),
                      ["k_p_v"], train, test_data=test,
                      objective_features=(0, 1), fix_speed=False,
                      maxiter=60, verbose=False)
    cal.run([6.0])
    assert cal.test() < 1e-6


def test_result_diagnostics_plot_and_per_track_errors():
    """The reference's calibration test() diagnostic (per-test-track
    sim-vs-data overlay + per-track error, calibration.py:528-623):
    test(plot=True) must render one axis per test track headlessly with
    measurement + simulation lines, and per_track_errors must sum to the
    SSE objective."""
    import matplotlib

    matplotlib.use("Agg")
    data = _make_tracks(n_tracks=8)
    train, test = data.split(0.75, rng=np.random.default_rng(1))
    cal = Calibration(MODELS["bicycle2d"], BicycleParams.create(),
                      ["k_p_v"], train, test_data=test,
                      objective_features=(0, 1), fix_speed=False,
                      maxiter=60, verbose=False)
    cal.run([6.0])
    err, fig = cal.test(plot=True, name="calibrated")
    assert len(fig.axes) == len(test)
    # measurement (gray) + simulation per feature, per axis
    assert all(len(ax.lines) == 2 * 2 for ax in fig.axes)
    errs, out = cal.per_track_errors()
    assert out.shape == (len(test), data.inputs.shape[1], 2)
    np.testing.assert_allclose(errs.sum(), err, rtol=1e-10)
    # heading-objective variant exercises the degree transform + the
    # reference-input dashed line
    data_psi = _make_tracks(n_tracks=8, features=(2,))
    train, test = data_psi.split(0.75, rng=np.random.default_rng(1))
    cal_psi = Calibration(MODELS["bicycle2d"], BicycleParams.create(),
                          ["k_p_v"], train, test_data=test,
                          objective_features=(2,), fix_speed=False,
                          maxiter=5, verbose=True)
    cal_psi.run([9.0])
    err2, fig2 = cal_psi.test(plot=True, plot_inref=True)
    assert all(len(ax.lines) == 3 for ax in fig2.axes)
    import matplotlib.pyplot as plt

    plt.close("all")


def test_error_functions_masking():
    import jax.numpy as jnp
    out = jnp.ones((2, 4, 1))
    obj = jnp.zeros((2, 4, 1))
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]], dtype=jnp.float64)
    assert float(sse_timesteps(out, obj, mask)) == 6.0
    # track MAEs: 1.0 and 1.0 -> sum of squares = 2
    assert float(maesse_samples(out, obj, mask)) == pytest.approx(2.0)
