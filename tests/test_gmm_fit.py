"""JAX EM GMM fitting: synthetic-recovery and model-selection oracle."""

import numpy as np
import pytest

from cyclistsocialforce_tpu import gmm_fit
from cyclistsocialforce_tpu.behavior import GMMData


def _two_blob_data(n=600, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.multivariate_normal([0.0, 0.0], [[0.3, 0.1], [0.1, 0.2]],
                                size=int(0.6 * n))
    b = rng.multivariate_normal([4.0, 3.0], [[0.4, -0.1], [-0.1, 0.3]],
                                size=int(0.4 * n))
    return np.concatenate([a, b], axis=0)


def test_em_recovers_two_components():
    X = _two_blob_data()
    gmm, scores = gmm_fit.fit_gmm(X, 2, "full", n_init=8, n_iter=200)
    order = np.argsort(gmm.means[:, 0])
    np.testing.assert_allclose(gmm.means[order[0]], [0, 0], atol=0.15)
    np.testing.assert_allclose(gmm.means[order[1]], [4, 3], atol=0.15)
    np.testing.assert_allclose(sorted(gmm.weights), [0.4, 0.6], atol=0.05)
    assert np.isfinite(scores["NLL"])


@pytest.mark.parametrize("cov_type", gmm_fit.COVARIANCE_TYPES)
def test_all_covariance_types_fit(cov_type):
    X = _two_blob_data(n=300)
    gmm, scores = gmm_fit.fit_gmm(X, 2, cov_type, n_init=4, n_iter=100)
    assert gmm.covariances.shape == (2, 2, 2)   # expanded to full
    for c in gmm.covariances:
        assert np.all(np.linalg.eigvalsh(c) > 0)
    assert np.isfinite(scores["BIC"]) and np.isfinite(scores["AIC"])


def test_score_nll_matches_density():
    """NLL of a known 1-component model equals the Gaussian NLL."""
    rng = np.random.default_rng(3)
    X = rng.normal(1.0, 2.0, size=(500, 1))
    gmm = GMMData(np.array([[1.0]]), np.array([[[4.0]]]), np.array([1.0]))
    nll = gmm_fit.score_nll(gmm, X)
    expect = np.mean(0.5 * np.log(2 * np.pi * 4.0)
                     + 0.5 * (X[:, 0] - 1.0) ** 2 / 4.0)
    np.testing.assert_allclose(nll, expect, rtol=1e-6)


@pytest.mark.slow
def test_gridsearch_selects_two_components():
    X = _two_blob_data(n=400, seed=1)
    gmm, info = gmm_fit.fit_optimize(
        X, range_components=(1, 4), covariance_types=("full",),
        k_crossval=4, n_init=4, n_iter=100)
    assert info["hyperparameters"]["n_components"] == 2


def test_fit_pole_model_end_to_end():
    """Raw pole features -> preprocessing fit -> EM -> usable PoleModel
    (conditional sampling + mean functions + YAML round-trip)."""
    import os
    import tempfile

    from cyclistsocialforce_tpu import behavior

    rng = np.random.default_rng(7)
    n = 240
    v = rng.uniform(1.5, 5.5, n)
    # synthetic rider population: pole locations linear in speed + noise
    p0 = -8.0 - 0.8 * v + rng.normal(0, 0.4, n)
    p1r = -1.5 - 0.1 * v + rng.normal(0, 0.15, n)
    p1i = 2.0 + 0.3 * v + np.abs(rng.normal(0, 0.2, n))
    X = np.stack([v, p0, p1r, p1i, -3.0 - 0.2 * v + rng.normal(0, 0.2, n),
                  6.0 + 0.5 * v + np.abs(rng.normal(0, 0.4, n))], axis=1)

    pm = behavior.fit_pole_model(
        X, "ImRe5GivenV", range_components=(1, 3),
        covariance_types=("full",), k_crossval=3, n_init=4)
    # mean poles stable and roughly tracking the synthetic law
    poles = pm.mean_poles(3.0, component=0)
    assert poles.shape == (5,)
    assert np.all(poles.real < 0)
    assert abs(poles[0].real - (-8.0 - 0.8 * 3.0)) < 1.2
    # sampling works
    s, _ = pm.sample_poles(50, X_given=3.0,
                           rng=np.random.default_rng(0))
    assert np.all(np.isfinite(s)) and np.all(s.real <= 0)
    # round-trips through the reference-compatible YAML format
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "fitted.yaml")
        pm.export_to_yaml(path)
        pm2 = behavior.PoleModel.import_from_yaml(path)
    np.testing.assert_allclose(pm2.mean_poles(3.0, 0), poles, atol=1e-9)
