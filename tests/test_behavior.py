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
    """Distribution-level contract of the on-device sampler: at fixed v,
    every marginal of PoleModelRT.sample_features must match host
    PoleModel draws under the same stability rejection (reference
    sampling semantics controlbehavior.py:1414-1469) -- two-sample
    Kolmogorov-Smirnov per feature, not just means."""
    import jax
    import jax.numpy as jnp
    from scipy import stats

    rt = behavior.PoleModelRT.from_polemodel(pm)
    v = 3.0
    keys = jax.random.split(jax.random.PRNGKey(3), 4000)
    feats = np.asarray(jax.vmap(
        lambda k: rt.sample_features(k, jnp.asarray(v)))(keys))
    assert np.all(np.isfinite(feats))
    assert np.all(feats[:, [0, 1, 3]] < 0)      # real parts stable

    host, _ = pm.sample_pole_features(12000, v=v,
                                      rng=np.random.default_rng(0))
    # identical stability semantics: reject draws with any real-part
    # feature >= 0 (the device sampler's rejection criterion; equivalent
    # to the host pole-level Re > 0 rejection for ImRe feature sets)
    host = host[np.all(host[:, [0, 1, 3]] < 0, axis=1)]

    for col in range(feats.shape[1]):
        d, p = stats.ks_2samp(feats[:, col], host[:, col])
        assert p > 1e-4, (f"feature {col}: KS statistic {d:.4f}, "
                          f"p={p:.2e} -- device sampler diverges from "
                          f"host distribution")


def test_polemodel_rt_fallback_rate(pm):
    """The fixed-round rejection's fallback-to-conditional-mean is a
    measurable diagnostic (sample_features_info) and must stay rare at
    in-distribution speeds."""
    import jax
    import jax.numpy as jnp

    rt = behavior.PoleModelRT.from_polemodel(pm)
    for v in (2.0, 3.0, 5.0):
        keys = jax.random.split(jax.random.PRNGKey(11), 2000)
        feats, good = jax.vmap(
            lambda k: rt.sample_features_info(k, jnp.asarray(v)))(keys)
        rate = 1.0 - float(jnp.mean(good.astype(jnp.float64)))
        assert np.all(np.isfinite(np.asarray(feats)))
        assert rate < 0.02, f"fallback rate {rate:.3f} at v={v}"


def test_planarpoint_polemodel_loads():
    pm1 = behavior.load_packaged_polemodel(
        "PP0_Re1GivenV_pole-model-params.yaml")
    poles = pm1.mean_poles(3.0, component=0)
    assert poles.shape == (1,)
    assert poles[0].real < 0


def test_missing_model_lists_available():
    with pytest.raises(FileNotFoundError, match="Available models"):
        behavior.load_packaged_polemodel("nope.yaml")


def test_polemodel_rt_batch_sampler_distribution(pm):
    """sample_features_batch (bulk-RNG production path: two random calls
    for the whole population instead of a per-agent key ladder) must
    match the per-key sampler's distribution."""
    import jax
    import jax.numpy as jnp
    from scipy import stats

    rt = behavior.PoleModelRT.from_polemodel(pm)
    v = 4.0
    n = 4000
    batch, good = rt.sample_features_batch(
        jax.random.PRNGKey(5), jnp.full((n,), v))
    batch = np.asarray(batch)
    assert np.all(np.isfinite(batch))
    assert float(jnp.mean(good.astype(jnp.float64))) > 0.98

    keys = jax.random.split(jax.random.PRNGKey(3), n)
    perkey = np.asarray(jax.vmap(
        lambda k: rt.sample_features(k, jnp.asarray(v)))(keys))
    for col in range(batch.shape[1]):
        d, p = stats.ks_2samp(batch[:, col], perkey[:, col])
        assert p > 1e-4, (f"feature {col}: KS {d:.4f}, p={p:.2e} -- "
                          f"batched sampler diverges from per-key sampler")


def test_gmm_variance_scaling(pm):
    """scale_variance multiplies every covariance by the factor (the
    reference's S cov S^T with S = sqrt(f) I, controlbehavior.py:246-254)
    and leaves means/weights untouched."""
    g = pm.gmm
    g2 = g.scale_variance(2.5)
    np.testing.assert_allclose(g2.covariances, g.covariances * 2.5)
    np.testing.assert_allclose(g2.means, g.means)
    np.testing.assert_allclose(g2.weights, g.weights)
    with pytest.raises(ValueError):
        g.scale_variance(0.0)


def test_gmm_marginal_pdf_1d_matches_scipy(pm):
    """1D marginal density vs scipy multivariate_normal per component
    (reference eval_1d_marginal_pdf_samples, controlbehavior.py:280-307)."""
    from scipy.stats import multivariate_normal

    g = pm.gmm
    idx = 1
    x = np.linspace(g.means[:, idx].min() - 2.0,
                    g.means[:, idx].max() + 2.0, 101)
    _, dens = g.marginal_pdf_1d(x, idx)
    ref = np.zeros_like(x)
    for k in range(g.n_components):
        ref += g.weights[k] * multivariate_normal(
            mean=g.means[k, idx],
            cov=g.covariances[k, idx, idx]).pdf(x)
    np.testing.assert_allclose(dens, ref, rtol=1e-12)
    # the range helper integrates to ~the marginal mass (~1)
    xs, ds = g.marginal_pdf_1d_range(
        (x.min() - 20, x.max() + 20), idx, n_samples=4001)
    assert abs(np.trapezoid(ds, xs) - 1.0) < 1e-3


def test_gmm_marginal_pdf_2d_matches_scipy(pm):
    """2D marginal density vs scipy (reference eval_2d_marginal_pdf,
    controlbehavior.py:334-377)."""
    from scipy.stats import multivariate_normal

    g = pm.gmm
    ix, iy = 0, 2
    xl = (g.means[:, ix].min() - 1, g.means[:, ix].max() + 1)
    yl = (g.means[:, iy].min() - 1, g.means[:, iy].max() + 1)
    pts, dens = g.marginal_pdf_2d(xl, yl, ix, iy, n_samples=31)
    ref = np.zeros(pts.shape[0])
    for k in range(g.n_components):
        cov = g.covariances[k][[ix, iy], :][:, [ix, iy]]
        ref += g.weights[k] * multivariate_normal(
            mean=g.means[k, [ix, iy]], cov=cov).pdf(pts)
    np.testing.assert_allclose(dens, ref, rtol=1e-10)


def test_score_gmm_matches_sklearn_semantics():
    """score_gmm / score_conditional_gmm (reference
    controlbehavior.py:116-153): BIC/AIC/NLL on a known mixture."""
    from cyclistsocialforce_tpu.behavior import GMMData
    from cyclistsocialforce_tpu.gmm_fit import (score_conditional_gmm,
                                                score_gmm, score_nll)

    rng = np.random.default_rng(5)
    gmm = GMMData(means=np.array([[0.0, 0.0], [3.0, 3.0]]),
                  covariances=np.stack([np.eye(2), 0.5 * np.eye(2)]),
                  weights=np.array([0.4, 0.6]))
    X, _ = gmm.sample(400, rng)
    s = score_gmm(gmm, X)
    # NLL against a direct scipy evaluation
    from scipy.stats import multivariate_normal as mvn
    pdf = (0.4 * mvn.pdf(X, [0, 0], np.eye(2))
           + 0.6 * mvn.pdf(X, [3, 3], 0.5 * np.eye(2)))
    nll_ref = float(-np.mean(np.log(pdf)))
    assert s["NLL"] == pytest.approx(nll_ref, rel=1e-9)
    n, p = 400, 2 * 3 + 2 * 2 + 1          # full cov: k*f(f+1)/2+kf+k-1
    assert s["BIC"] == pytest.approx(2 * s["NLL"] * n + p * np.log(n))
    assert s["AIC"] == pytest.approx(2 * s["NLL"] * n + 2 * p)

    sc = score_conditional_gmm(gmm, X[:40], idx_given=0)
    assert np.isfinite([sc["BIC"], sc["AIC"], sc["NLL"]]).all()
    # conditioning on a feature must beat ignoring it when features
    # are correlated with the component -- sanity: scores are bounded
    assert sc["NLL"] < 10.0


def test_combine_outliers():
    """Any-model combination with differing sample orders and missing
    ids (reference get_outliers_all_models semantics)."""
    from cyclistsocialforce_tpu.behavior import combine_outliers

    ids, comb = combine_outliers({
        "BR0": (np.array([3, 1, 2]), np.array([True, False, False])),
        "PP0": (np.array([1, 2]), np.array([False, True])),
    })
    assert ids.tolist() == [1, 2, 3]
    assert comb.tolist() == [False, True, True]
    # plain-array form: implicit 0..n-1 ids
    ids2, comb2 = combine_outliers({"a": np.array([0, 1, 0], bool),
                                    "b": np.array([0, 0, 1], bool)})
    assert comb2.tolist() == [False, True, True]
