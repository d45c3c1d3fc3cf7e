"""Control-behavior (pole model) subsystem tests.

Covers the GMM pole-model runtime of reference controlbehavior.py: YAML
round-trip, analytic conditioning, preprocessing invertibility, mean pole
functions, and stochastic sampling (host + on-device)."""

import os
import tempfile

import numpy as np
import pytest

from cyclistsocialforce_tpu import behavior


@pytest.fixture(scope="module")
def pm():
    return behavior.load_packaged_polemodel(
        "BR1_ImRe5GivenV_pole-model-params.yaml")


def test_yaml_roundtrip(pm):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "model.yaml")
        pm.export_to_yaml(path)
        pm2 = behavior.PoleModel.import_from_yaml(path)
    np.testing.assert_allclose(pm.gmm.means, pm2.gmm.means)
    np.testing.assert_allclose(pm.gmm.covariances, pm2.gmm.covariances)
    np.testing.assert_allclose(pm.preprocessing.lambdas,
                               pm2.preprocessing.lambdas)
    np.testing.assert_allclose(pm.preprocessing.log_a,
                               pm2.preprocessing.log_a)
    v = 3.3
    np.testing.assert_allclose(pm.mean_poles(v), pm2.mean_poles(v))


def test_preprocessing_roundtrip(pm):
    rng = np.random.default_rng(0)
    X, _ = pm.gmm.sample(50, rng)
    raw = pm.preprocessing.inverse_transform(X)
    ok = np.all(np.isfinite(raw), axis=1)
    back = pm.preprocessing.transform(raw[ok])
    np.testing.assert_allclose(back, X[ok], atol=1e-8)


def test_yeojohnson_inverse_matches_scipy():
    from scipy.stats import yeojohnson as scipy_yj

    x = np.linspace(-3, 4, 41)
    for lam in (-0.7, 0.0, 0.8, 2.0, 2.6):
        y = behavior.yeojohnson(x, lam)
        np.testing.assert_allclose(y, scipy_yj(x, lam), atol=1e-12)
        np.testing.assert_allclose(
            behavior.yeojohnson_inverse(y, lam), x, atol=1e-9)


def test_conditional_gmm_weights_and_means(pm):
    g = behavior.conditional_gmm(pm.gmm, pm.idx_given,
                                 pm._transform_given(3.0)[0])
    assert g.n_features == pm.gmm.n_features - 1
    np.testing.assert_allclose(g.weights.sum(), 1.0, atol=1e-12)
    # covariances stay positive definite
    for c in g.covariances:
        assert np.all(np.linalg.eigvalsh(c) > 0)


def test_mean_poles_linear_in_speed(pm):
    lin = pm.component_mean_function_params()
    assert lin.shape == (pm.gmm.n_components, 5, 2)
    for v in (1.5, 3.0, 5.0):
        poles = pm.mean_poles(v, component=0)
        assert poles.shape == (5,)
        assert np.all(poles.real < 0)          # stable mean behavior
        # conjugate structure [real, a+jb, a-jb, c+jd, c-jd]
        np.testing.assert_allclose(poles[1], np.conj(poles[2]))
        np.testing.assert_allclose(poles[3], np.conj(poles[4]))


def test_sample_poles_stable(pm):
    rng = np.random.default_rng(7)
    poles, labels = pm.sample_poles(100, X_given=3.0, rng=rng)
    assert poles.shape == (100, 5)
    assert np.all(np.isfinite(poles))
    assert np.all(poles.real <= 0)
    assert labels.shape == (100,)


def test_rt_sampler_matches_host_distribution(pm):
    import jax
    import jax.numpy as jnp

    rt = behavior.PoleModelRT.from_polemodel(pm)
    keys = jax.random.split(jax.random.PRNGKey(3), 1500)
    feats = np.asarray(jax.vmap(
        lambda k: rt.sample_features(k, jnp.asarray(3.0)))(keys))
    assert np.all(np.isfinite(feats))
    assert np.all(feats[:, [0, 1, 3]] < 0)      # real parts stable
    host, _ = pm.sample_pole_features(15000, v=3.0,
                                      rng=np.random.default_rng(0))
    # same distribution to ~0.15 in mean (real parts; heavy-tailed imag
    # features get a looser bound)
    np.testing.assert_allclose(feats.mean(0)[[0, 1, 3]],
                               host.mean(0)[[0, 1, 3]], atol=0.2)


def test_planarpoint_polemodel_loads():
    pm1 = behavior.load_packaged_polemodel(
        "PP0_Re1GivenV_pole-model-params.yaml")
    poles = pm1.mean_poles(3.0, component=0)
    assert poles.shape == (1,)
    assert poles[0].real < 0


def test_missing_model_lists_available():
    with pytest.raises(FileNotFoundError, match="Available models"):
        behavior.load_packaged_polemodel("nope.yaml")
