"""Gaussian-mixture fitting: batched EM in JAX.

Offline-tooling counterpart of the reference's sklearn-based pole-model
fitting (reference controlbehavior.py:1273-1334 `fit_optimize`: grid
search over n_components x covariance_type with k-fold cross-validation,
100 EM restarts per fit). Here the restarts are a VMAPPED BATCH: one EM
run advances all n_init initializations simultaneously on the
accelerator, then the best by final log-likelihood wins.

Supports the four sklearn covariance types (full / tied / diag /
spherical) and the BIC / AIC / NLL scores used for model selection.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

COVARIANCE_TYPES = ("full", "tied", "diag", "spherical")
_REG = 1e-6   # sklearn's reg_covar


# --------------------------------------------------------------------------
# log-density per covariance type
# --------------------------------------------------------------------------


def _log_gauss_full(X, means, covs):
    """[N, K] log N(x_n; mu_k, cov_k) for full covariances [K, F, F]."""
    f = X.shape[1]
    chol = jnp.linalg.cholesky(covs)                       # [K, F, F]
    diff = X[:, None, :] - means[None, :, :]               # [N, K, F]
    sol = jax.vmap(
        lambda L, d: jax.scipy.linalg.solve_triangular(L, d.T, lower=True),
        in_axes=(0, 1))(chol, diff)                        # [K, F, N]
    maha = jnp.sum(sol**2, axis=1).T                       # [N, K]
    logdet = 2.0 * jnp.sum(jnp.log(
        jnp.diagonal(chol, axis1=1, axis2=2)), axis=1)     # [K]
    return -0.5 * (f * jnp.log(2 * jnp.pi) + logdet[None, :] + maha)


def _expand_cov(cov, cov_type, k, f):
    """Any covariance parameterization -> full [K, F, F]."""
    if cov_type == "full":
        return cov
    if cov_type == "tied":
        return jnp.broadcast_to(cov[None], (k, f, f))
    if cov_type == "diag":
        return jax.vmap(jnp.diag)(cov)
    if cov_type == "spherical":
        return cov[:, None, None] * jnp.eye(f)[None]
    raise ValueError(cov_type)


# --------------------------------------------------------------------------
# EM
# --------------------------------------------------------------------------


def _m_step(X, resp, cov_type):
    """Means/covariances/weights from responsibilities [N, K]."""
    f = X.shape[1]
    nk = jnp.sum(resp, axis=0) + 1e-10                     # [K]
    weights = nk / X.shape[0]
    means = (resp.T @ X) / nk[:, None]                     # [K, F]
    diff = X[:, None, :] - means[None, :, :]               # [N, K, F]
    if cov_type == "full":
        cov = jnp.einsum("nk,nki,nkj->kij", resp, diff, diff) \
            / nk[:, None, None]
        cov = cov + _REG * jnp.eye(f)[None]
    elif cov_type == "tied":
        m = jnp.einsum("nk,nki,nkj->ij", resp, diff, diff) / X.shape[0]
        cov = m + _REG * jnp.eye(f)
    elif cov_type == "diag":
        cov = jnp.einsum("nk,nki->ki", resp, diff**2) / nk[:, None] + _REG
    else:  # spherical
        cov = jnp.mean(jnp.einsum("nk,nki->ki", resp, diff**2)
                       / nk[:, None], axis=1) + _REG
    return means, cov, weights


def _e_step(X, means, cov, weights, cov_type):
    k, f = means.shape
    logp = _log_gauss_full(X, means, _expand_cov(cov, cov_type, k, f))
    logw = logp + jnp.log(weights)[None, :]
    norm = jax.scipy.special.logsumexp(logw, axis=1, keepdims=True)
    return jnp.exp(logw - norm), jnp.mean(norm)


def _kmeanspp_init(key, X, k):
    """k-means++-style seeding: distance-weighted center choice."""
    n = X.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    centers = jnp.zeros((k, X.shape[1]), dtype=X.dtype)
    centers = centers.at[0].set(X[first])

    def pick(carry, i):
        centers, key = carry
        d2 = jnp.min(jnp.sum((X[:, None, :] - centers[None, :, :])**2,
                             axis=2)
                     + jnp.where(jnp.arange(centers.shape[0])[None, :] >= i,
                                 jnp.inf, 0.0), axis=1)
        key, sub = jax.random.split(key)
        idx = jax.random.categorical(sub, jnp.log(d2 + 1e-12))
        centers = centers.at[i].set(X[idx])
        return (centers, key), None

    (centers, _), _ = jax.lax.scan(pick, (centers, key),
                                   jnp.arange(1, k))
    return centers


def _fit_single(key, X, k, cov_type, n_iter):
    """One EM run from a random init; returns (means, cov, weights, nll)."""
    f = X.shape[1]
    means = _kmeanspp_init(key, X, k)
    var0 = jnp.var(X, axis=0) + _REG
    if cov_type == "full":
        cov = jnp.broadcast_to(jnp.diag(var0)[None], (k, f, f))
    elif cov_type == "tied":
        cov = jnp.diag(var0)
    elif cov_type == "diag":
        cov = jnp.broadcast_to(var0[None], (k, f))
    else:
        cov = jnp.broadcast_to(jnp.mean(var0)[None], (k,))
    weights = jnp.full((k,), 1.0 / k, dtype=X.dtype)

    def it(carry, _):
        means, cov, weights = carry
        resp, ll = _e_step(X, means, cov, weights, cov_type)
        means, cov, weights = _m_step(X, resp, cov_type)
        return (means, cov, weights), ll

    (means, cov, weights), lls = jax.lax.scan(
        it, (means, cov, weights), None, length=n_iter)
    return means, cov, weights, -lls[-1]


def n_parameters(k, f, cov_type):
    """Free-parameter count (for BIC/AIC), sklearn's `_n_parameters`."""
    if cov_type == "full":
        cov_params = k * f * (f + 1) // 2
    elif cov_type == "tied":
        cov_params = f * (f + 1) // 2
    elif cov_type == "diag":
        cov_params = k * f
    else:
        cov_params = k
    return int(cov_params + k * f + k - 1)


def fit_gmm(X, n_components, covariance_type="full", n_init=100,
            n_iter=200, seed=0):
    """Fit a GMM by EM with `n_init` restarts advanced as one vmapped
    batch; returns a behavior.GMMData (full-covariance expansion) plus the
    training scores {NLL, BIC, AIC}."""
    from cyclistsocialforce_tpu.behavior import GMMData

    X = jnp.asarray(np.asarray(X, dtype=np.float64))
    keys = jax.random.split(jax.random.PRNGKey(seed), n_init)
    fit = jax.jit(jax.vmap(
        lambda kk: _fit_single(kk, X, n_components, covariance_type,
                               n_iter)),
        static_argnums=())
    means, cov, weights, nll = fit(keys)
    best = int(jnp.argmin(nll))
    k, f = n_components, X.shape[1]
    cov_full = _expand_cov(jax.tree_util.tree_map(lambda a: a[best],
                                                  cov), covariance_type,
                           k, f)
    n = X.shape[0]
    mean_nll = float(nll[best])
    p = n_parameters(k, f, covariance_type)
    scores = {"NLL": mean_nll,
              "BIC": 2 * mean_nll * n + p * float(np.log(n)),
              "AIC": 2 * mean_nll * n + 2 * p}
    gmm = GMMData(np.asarray(means[best]), np.asarray(cov_full),
                  np.asarray(weights[best] / jnp.sum(weights[best])))
    return gmm, scores


def score_nll(gmm, X):
    """Mean negative log-likelihood of X under a GMMData."""
    X = jnp.asarray(np.asarray(X, dtype=np.float64))
    logp = _log_gauss_full(X, jnp.asarray(gmm.means),
                           jnp.asarray(gmm.covariances))
    lw = logp + jnp.log(jnp.asarray(gmm.weights))[None, :]
    return float(-jnp.mean(jax.scipy.special.logsumexp(lw, axis=1)))


def fit_optimize(X, range_components=(1, 5),
                 covariance_types=COVARIANCE_TYPES, k_crossval=10,
                 n_init=20, n_iter=150, selection_metric="NLL", seed=0,
                 verbose=False):
    """Grid-search model selection with k-fold CV (the reference's
    PoleModel.fit_optimize, controlbehavior.py:1273-1334): for every
    (covariance_type, n_components) pair, average the held-out score over
    k folds; refit the best on all data.

    Returns (GMMData, dict) with hyperparameters + scores.
    """
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    folds = np.array_split(perm, k_crossval)

    results = []
    for cov_type in covariance_types:
        for k in range(range_components[0], range_components[1]):
            scores = []
            for i in range(k_crossval):
                test_idx = folds[i]
                train_idx = np.concatenate(
                    [folds[j] for j in range(k_crossval) if j != i])
                gmm, _ = fit_gmm(X[train_idx], k, cov_type,
                                 n_init=n_init, n_iter=n_iter, seed=seed)
                nll = score_nll(gmm, X[test_idx])
                p = n_parameters(k, X.shape[1], cov_type)
                m = len(test_idx)
                scores.append({"NLL": nll,
                               "BIC": 2 * nll * m + p * np.log(m),
                               "AIC": 2 * nll * m + 2 * p})
            mean = {key: float(np.mean([s[key] for s in scores]))
                    for key in ("NLL", "BIC", "AIC")}
            results.append({"cov_type": cov_type, "n_components": k,
                            **mean})
            if verbose:
                print(f"  {cov_type} k={k}: NLL={mean['NLL']:.4f}")

    best = min(results, key=lambda r: r[selection_metric])
    gmm, train_scores = fit_gmm(X, best["n_components"], best["cov_type"],
                                n_init=n_init, n_iter=n_iter, seed=seed)
    info = {"hyperparameters": {"n_components": best["n_components"],
                                "cov_type": best["cov_type"]},
            "scores_val": {k: best[k] for k in ("NLL", "BIC", "AIC")},
            "scores_train": train_scores,
            "gridsearch": results}
    return gmm, info


def score_gmm(gmm, X, covariance_type="full"):
    """Multimetric {BIC, AIC, NLL} score of a GMMData on samples X
    (reference controlbehavior.score_gmm, controlbehavior.py:116-125 --
    sklearn bic/aic/score semantics: NLL is the mean negative
    log-likelihood, BIC/AIC use the full-sample likelihood)."""
    n, f = np.shape(X)
    nll = score_nll(gmm, X)
    p = n_parameters(gmm.n_components, f, covariance_type)
    return {"BIC": 2 * nll * n + p * float(np.log(n)),
            "AIC": 2 * nll * n + 2 * p,
            "NLL": nll}


def score_conditional_gmm(gmm, X, idx_given, covariance_type="full"):
    """Multimetric score of a CONDITIONAL mixture: condition the joint
    GMMData on each sample's given feature, score that sample's
    remaining features under the conditional mixture, and average
    (reference controlbehavior.score_conditional_gmm,
    controlbehavior.py:128-153 -- per-sample sklearn bic/aic on n = 1,
    where the ln(n) BIC penalty vanishes, then the mean)."""
    from cyclistsocialforce_tpu.behavior import conditional_gmm

    X = np.asarray(X, dtype=float)
    rest = [j for j in range(X.shape[1]) if j != idx_given]
    p = n_parameters(gmm.n_components, len(rest), covariance_type)
    rows = []
    for i in range(X.shape[0]):
        cond = conditional_gmm(gmm, idx_given, float(X[i, idx_given]))
        nll = score_nll(cond, X[i, rest][None, :])
        rows.append([2 * nll + p * np.log(1.0), 2 * nll + 2 * p, nll])
    bic, aic, nll = np.mean(np.asarray(rows), axis=0)
    return {"BIC": float(bic), "AIC": float(aic), "NLL": float(nll)}
