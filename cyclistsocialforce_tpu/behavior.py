"""Rider control-behavior models: GMM pole models over closed-loop poles.

Re-design of the reference's `controlbehavior.py` runtime
(reference: src/cyclistsocialforce/controlbehavior.py:157-2137) without the
sklearn/pandas dependency chain:

  - `GMMData` — a plain Gaussian-mixture parameter container (the runtime
    needs no EM fitting; models ship as fitted YAML parameters),
  - analytic conditioning of a joint GMM on one feature
    (reference ConditionalGaussianMixture._get_conditional_gmm,
    controlbehavior.py:478-530),
  - the preprocessing pipeline: log-shift transform + Yeo-Johnson power
    transform + standard scaler, forward and inverse, incl. the reference's
    column-sparse handling (controlbehavior.py:613-985),
  - `PoleModel` — YAML import/export (format-compatible with the
    reference's files, controlbehavior.py:1987-2137), component mean pole
    locations as linear-in-speed functions (controlbehavior.py:1601-1650),
    and stochastic pole sampling with stability rejection
    (controlbehavior.py:1414-1469),
  - `PoleModelRT` — a pytree image of the model for **in-simulation**
    stochastic pole resampling on device (pure JAX; fixed rejection-round
    count instead of the reference's unbounded while loop).

Host-side math is numpy (model loading happens once); only the RT sampling
path is JAX.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime
from typing import Any

import numpy as np

try:
    import yaml
except ImportError:  # pragma: no cover - yaml is available in the image
    yaml = None

import jax
import jax.numpy as jnp
from flax import struct

# Predefined feature sets (reference controlbehavior.py:992-999).
PREDEFINED_FEATURE_SETS = {
    "ImRe5": (["p0_real", "p1_real", "p1_imag", "p2_real", "p2_imag"], ""),
    "ImRe5GivenV": (["v_mean", "p0_real", "p1_real", "p1_imag", "p2_real",
                     "p2_imag"], "v_mean"),
    "AngMag5": (["p0_real", "p1_mag", "p1_ang", "p2_mag", "p2_ang"], ""),
    "AngMag5GivenV": (["v_mean", "p0_real", "p1_mag", "p1_ang", "p2_mag",
                       "p2_ang"], "v_mean"),
    "Re1": (["p0_real"], ""),
    "Re1GivenV": (["v_mean", "p0_real"], "v_mean"),
}

DATA_DIR = os.path.join(os.path.dirname(__file__), "data",
                        "balancingriderparams")


# --------------------------------------------------------------------------
# Gaussian mixtures
# --------------------------------------------------------------------------


@dataclass
class GMMData:
    """Parameters of a Gaussian mixture: means [K, F], covariances
    [K, F, F], weights [K] (reference GaussianMixture.from_parameters,
    controlbehavior.py:183-232)."""

    means: np.ndarray
    covariances: np.ndarray
    weights: np.ndarray

    def __post_init__(self):
        self.means = np.asarray(self.means, dtype=float)
        self.covariances = np.asarray(self.covariances, dtype=float)
        self.weights = np.asarray(self.weights, dtype=float).reshape(-1)
        k, f = self.means.shape
        if self.covariances.shape != (k, f, f):
            raise ValueError(
                f"covariances must be shaped [{k},{f},{f}], got "
                f"{self.covariances.shape}")
        if self.weights.size != k:
            raise ValueError(f"weights must be size {k}")

    @property
    def n_components(self):
        return self.means.shape[0]

    @property
    def n_features(self):
        return self.means.shape[1]

    def sample(self, n_samples, rng):
        """Draw samples; returns (samples [n, F], component labels [n])."""
        labels = rng.choice(self.n_components, size=n_samples,
                            p=self.weights / self.weights.sum())
        out = np.empty((n_samples, self.n_features))
        for k in range(self.n_components):
            m = labels == k
            if np.any(m):
                out[m] = rng.multivariate_normal(
                    self.means[k], self.covariances[k], size=int(m.sum()))
        return out, labels

    def scale_variance(self, factor):
        """New GMMData with every component's covariance scaled by
        `factor` (the reference's variance_scale: cov -> S cov S^T with
        S = sqrt(factor) I, i.e. factor * cov;
        controlbehavior.py:246-254)."""
        if factor <= 0:
            raise ValueError("variance scale factor must be positive")
        return GMMData(means=self.means,
                       covariances=self.covariances * float(factor),
                       weights=self.weights)

    def marginal_pdf_1d(self, x, idx):
        """Marginal density of feature `idx` at locations `x`
        (reference eval_1d_marginal_pdf_samples,
        controlbehavior.py:280-307: the marginal of a GMM is the 1D
        mixture of the per-component marginals). Vectorized over
        components instead of a per-component scipy loop.

        Returns (x flattened, densities)."""
        x = np.asarray(x, dtype=float).reshape(-1)
        mu = self.means[:, idx]                      # [K]
        var = self.covariances[:, idx, idx]          # [K]
        z = (x[None, :] - mu[:, None]) ** 2 / var[:, None]
        comp = np.exp(-0.5 * z) / np.sqrt(2.0 * np.pi * var[:, None])
        return x, (self.weights[:, None] * comp).sum(axis=0)

    def marginal_pdf_1d_range(self, xlim, idx, n_samples=200):
        """Marginal density of feature `idx` over a uniform grid
        (reference eval_1d_marginal_pdf, controlbehavior.py:309-332)."""
        return self.marginal_pdf_1d(
            np.linspace(xlim[0], xlim[1], n_samples), idx)

    def marginal_pdf_2d(self, xlim, ylim, idx_x, idx_y, n_samples=200):
        """Joint marginal density of features (idx_x, idx_y) on an
        n x n grid (reference eval_2d_marginal_pdf,
        controlbehavior.py:334-377).

        Returns (locations [n*n, 2], densities [n*n])."""
        x = np.linspace(xlim[0], xlim[1], n_samples)
        y = np.linspace(ylim[0], ylim[1], n_samples)
        X, Y = np.meshgrid(x, y)
        pts = np.stack([X.ravel(), Y.ravel()], axis=1)       # [P, 2]
        sel = [idx_x, idx_y]
        mu = self.means[:, sel]                              # [K, 2]
        cov = self.covariances[:, sel][:, :, sel]            # [K, 2, 2]
        det = cov[:, 0, 0] * cov[:, 1, 1] - cov[:, 0, 1] * cov[:, 1, 0]
        d = pts[None, :, :] - mu[:, None, :]                 # [K, P, 2]
        # quadratic form through the analytic 2x2 inverse
        q = (cov[:, 1, 1, None] * d[:, :, 0] ** 2
             - 2.0 * cov[:, 0, 1, None] * d[:, :, 0] * d[:, :, 1]
             + cov[:, 0, 0, None] * d[:, :, 1] ** 2) / det[:, None]
        comp = np.exp(-0.5 * q) / (2.0 * np.pi * np.sqrt(det[:, None]))
        return pts, (self.weights[:, None] * comp).sum(axis=0)


def conditional_gmm(gmm: GMMData, idx_given: int, x_given: float) -> GMMData:
    """Analytically condition a joint GMM on one feature.

    Port of ConditionalGaussianMixture._get_conditional_gmm (reference
    controlbehavior.py:478-530): per component, Gaussian conditioning of
    mean/covariance; weights re-weighted by the marginal density of the
    given feature (with the reference's zero-weight epsilon guard).
    """
    f = gmm.n_features
    idx_rest = [i for i in range(f) if i != idx_given]

    mu_c, cov_c, pi_c = [], [], []
    for k in range(gmm.n_components):
        cov = gmm.covariances[k]
        mu = gmm.means[k]
        var_g = cov[idx_given, idx_given]
        cov_rg = cov[idx_rest, idx_given]
        d = x_given - mu[idx_given]
        mu_c.append(mu[idx_rest] + cov_rg / var_g * d)
        cov_c.append(cov[np.ix_(idx_rest, idx_rest)]
                     - np.outer(cov_rg, cov_rg) / var_g)
        pi_c.append(gmm.weights[k]
                    * np.exp(-0.5 * d * d / var_g) / np.sqrt(2 * np.pi * var_g))

    pi_c = np.asarray(pi_c)
    pi_c = pi_c / pi_c.sum()
    if np.any(pi_c == 0.0):
        pi_c[pi_c == 0.0] = np.finfo(float).eps * gmm.n_components
        pi_c = pi_c / pi_c.sum()
    return GMMData(np.asarray(mu_c), np.asarray(cov_c), pi_c)


# --------------------------------------------------------------------------
# preprocessing transforms
# --------------------------------------------------------------------------


def yeojohnson(x, lam):
    """Yeo-Johnson power transform, elementwise (broadcasting over lam)."""
    x = np.asarray(x, dtype=float)
    pos = x >= 0
    with np.errstate(all="ignore"):
        y_pos = np.where(np.abs(lam) < 1e-19, np.log1p(x),
                         (np.power(np.abs(x) + 1.0, lam) - 1.0)
                         / np.where(lam == 0, 1.0, lam))
        y_neg = np.where(np.abs(lam - 2.0) < 1e-19, -np.log1p(-x),
                         -(np.power(1.0 - np.minimum(x, 0.0), 2.0 - lam)
                           - 1.0) / np.where(lam == 2.0, 1.0, 2.0 - lam))
    return np.where(pos, y_pos, y_neg)


def yeojohnson_inverse(y, lam):
    """Inverse Yeo-Johnson; out-of-domain values map to NaN (the reference
    relies on sklearn returning non-finite there and resamples,
    controlbehavior.py:1370-1395)."""
    y = np.asarray(y, dtype=float)
    pos = y >= 0
    with np.errstate(all="ignore"):
        base_p = lam * y + 1.0
        x_pos = np.where(np.abs(lam) < 1e-19, np.expm1(y),
                         np.power(np.where(base_p > 0, base_p, np.nan),
                                  1.0 / np.where(lam == 0, 1.0, lam)) - 1.0)
        base_n = -(2.0 - lam) * y + 1.0
        x_neg = np.where(np.abs(lam - 2.0) < 1e-19, 1.0 - np.exp(-y),
                         1.0 - np.power(
                             np.where(base_n > 0, base_n, np.nan),
                             1.0 / np.where(lam == 2.0, 1.0, 2.0 - lam)))
    return np.where(pos, x_pos, x_neg)


@dataclass
class Preprocessing:
    """Fitted preprocessing pipeline: optional log-shift on a feature
    subset, then Yeo-Johnson with optional standard scaling.

    Parameter layout mirrors the reference's YAML export
    (controlbehavior.py:1993-2023): log `a`/`sign` are [1, n_log] over the
    log-transformed feature subset; `lambdas`/`mean`/`scale` are [F].
    """

    n_features: int
    lambdas: np.ndarray | None = None           # Yeo-Johnson lambdas [F]
    scaler_mean: np.ndarray | None = None        # StandardScaler mean [F]
    scaler_scale: np.ndarray | None = None       # StandardScaler scale [F]
    log_a: np.ndarray | None = None              # [n_log]
    log_sign: np.ndarray | None = None           # [n_log]
    log_features: np.ndarray | None = None       # int indices into features
    n_samples_seen: int = 0

    @property
    def has_log(self):
        return self.log_features is not None and self.log_features.size > 0

    def _expand(self, X, sparse_cols):
        X = np.atleast_2d(np.asarray(X, dtype=float))
        if sparse_cols is None:
            return X.copy(), None
        sparse_cols = np.asarray(sparse_cols).reshape(-1)
        full = np.zeros((X.shape[0], self.n_features))
        for i, j in enumerate(sparse_cols):
            full[:, j] = X[:, i]
        return full, sparse_cols

    def transform(self, X, sparse_column_indices=None):
        """Forward transform (reference PreprocessingPipeline.transform,
        controlbehavior.py:917-950), incl. the sparse-column fill that
        keeps absent log-features inside the log domain."""
        Xf, sparse = self._expand(X, sparse_column_indices)
        if self.has_log:
            if sparse is not None:
                for pos, i in enumerate(self.log_features):
                    if not np.any(sparse == i):
                        Xf[:, i] = self.log_sign[pos] * self.log_a[pos] * 2
            sub = Xf[:, self.log_features] * self.log_sign
            Xf[:, self.log_features] = np.log(sub - self.log_a)
        if self.lambdas is not None:
            Xf = yeojohnson(Xf, self.lambdas)
            if self.scaler_mean is not None:
                Xf = (Xf - self.scaler_mean) / self.scaler_scale
        if sparse is not None:
            Xf = Xf[:, sparse]
        return Xf

    def inverse_transform(self, X, sparse_column_indices=None):
        """Inverse transform (reference controlbehavior.py:953-982)."""
        Xf, sparse = self._expand(X, sparse_column_indices)
        if self.lambdas is not None:
            if self.scaler_mean is not None:
                Xf = Xf * self.scaler_scale + self.scaler_mean
            Xf = yeojohnson_inverse(Xf, self.lambdas)
        if self.has_log:
            Xf[:, self.log_features] = (
                np.exp(Xf[:, self.log_features]) + self.log_a) * self.log_sign
        if sparse is not None:
            Xf = Xf[:, sparse]
        return Xf

    def fit(self, X, features, log_transform=True, normalize=True):
        """Fit the pipeline on raw feature data [n, F] (reference
        fit_transform, controlbehavior.py:884-914): log-shift on
        'real'/'mag' features with a = 0.9 min(sign*x), then Yeo-Johnson
        (lambda via MLE grid) with standardization."""
        X = np.asarray(X, dtype=float)
        self.n_features = X.shape[1]
        Xt = X.copy()
        if log_transform:
            import re as _re
            idx = [i for i, f in enumerate(features)
                   if (m := _re.findall(r"p\d_(.{1,5})", f))
                   and m[0] in ("real", "mag")]
            self.log_features = np.asarray(idx, dtype=int)
            sub = X[:, idx]
            self.log_sign = np.sign(sub[0, :])
            sub = sub * self.log_sign
            self.log_a = 0.9 * np.min(sub, axis=0)
            Xt[:, idx] = np.log(sub - self.log_a)
        from scipy.stats import yeojohnson as _scipy_yj
        lams = np.array([_scipy_yj(Xt[:, j])[1]
                         for j in range(self.n_features)])
        self.lambdas = lams
        Xt = yeojohnson(Xt, lams)
        if normalize:
            self.scaler_mean = Xt.mean(axis=0)
            self.scaler_scale = Xt.std(axis=0)
            Xt = (Xt - self.scaler_mean) / self.scaler_scale
            self.n_samples_seen = X.shape[0]
        return Xt


# --------------------------------------------------------------------------
# pole feature <-> complex pole conversion
# --------------------------------------------------------------------------


def pole_features_to_poles(feats, feature_names):
    """[.., F] pole features -> [.., P] complex poles, appending the
    conjugate right after each complex pole (reference
    polefeaturetable_to_polearray, controlbehavior.py:64-112)."""
    feats = np.atleast_2d(np.asarray(feats, dtype=float))
    cols = {f: feats[:, i] for i, f in enumerate(feature_names)}
    poles = []
    for i in range(10):
        real, imag = cols.get(f"p{i}_real"), cols.get(f"p{i}_imag")
        mag, ang = cols.get(f"p{i}_mag"), cols.get(f"p{i}_ang")
        if real is None and mag is None:
            break
        p = np.zeros(feats.shape[0], dtype=complex)
        if real is not None:
            p = p + real
        if imag is not None:
            p = p + 1j * imag
        if mag is not None and ang is not None:
            p = p + mag * (np.cos(ang) + 1j * np.sin(ang))
        poles.append(p)
        if np.any(np.imag(p) != 0.0):
            poles.append(np.conjugate(p))
    return np.array(poles).T


# --------------------------------------------------------------------------
# the pole model
# --------------------------------------------------------------------------


@dataclass
class PoleModel:
    """A fitted (conditional) GMM over closed-loop pole features.

    Runtime port of the reference PoleModel (controlbehavior.py:989-2137):
    import/export of the YAML parameter files shipped with the reference,
    conditional sampling, and linear-in-speed component mean functions.
    """

    feature_set: str
    gmm: GMMData
    preprocessing: Preprocessing
    metadata: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.feature_set not in PREDEFINED_FEATURE_SETS:
            raise ValueError(
                f"feature_set must be one of "
                f"{list(PREDEFINED_FEATURE_SETS)}, got {self.feature_set}")
        self.features, self.feature_cond = PREDEFINED_FEATURE_SETS[
            self.feature_set]

    @property
    def idx_given(self):
        return (self.features.index(self.feature_cond)
                if self.feature_cond else None)

    @property
    def is_conditional(self):
        return self.feature_cond != ""

    # ---- YAML IO (format-compatible with the reference's data files,
    # reference export_to_yaml/import_from_yaml controlbehavior.py:1987-2137)

    @classmethod
    def import_from_yaml(cls, filepath):
        with open(filepath) as f:
            data = yaml.safe_load(f)
        pp = data["preprocessing_pipeline"]
        gmd = data["gmm_data"]
        n_features = gmd["n_features"]
        pre = Preprocessing(n_features=n_features)
        if pp.get("power_transform", "none") != "none":
            pre.lambdas = np.asarray(
                pp["power_transform_params"]["lambdas"], dtype=float)
        if pp.get("normalize"):
            sc = pp["standard_scaler_params"]
            pre.scaler_mean = np.asarray(sc["mean"], dtype=float)
            pre.scaler_scale = np.asarray(sc["scale"], dtype=float)
            pre.n_samples_seen = int(sc.get("n_samples_seen", 0))
        if pp.get("log_transform"):
            lt = pp["log_transform_params"]
            pre.log_a = np.asarray(lt["a"], dtype=float).reshape(-1)
            pre.log_sign = np.asarray(lt["sign"], dtype=float).reshape(-1)
            pre.log_features = np.asarray(
                lt["log_transform_features"], dtype=int)
        gmm = GMMData(gmd["means"], gmd["covariances"], gmd["weights"])
        meta = {"presets": data.get("presets", {}),
                "scores": {k: gmd[k] for k in
                           ("scores_val", "scores_test", "n_samples_train",
                            "n_samples_test", "k_crossval") if k in gmd}}
        return cls(feature_set=data["presets"]["feature_set"], gmm=gmm,
                   preprocessing=pre, metadata=meta)

    def export_to_yaml(self, filepath):
        pre = self.preprocessing
        pp = dict(
            power_transform=("yeo-johnson" if pre.lambdas is not None
                             else "none"),
            normalize=pre.scaler_mean is not None,
            log_transform=pre.has_log,
            power_transform_params=(
                {"lambdas": pre.lambdas.tolist()}
                if pre.lambdas is not None else {}),
            standard_scaler_params=(
                {"mean": pre.scaler_mean.tolist(),
                 "scale": pre.scaler_scale.tolist(),
                 "n_samples_seen": int(pre.n_samples_seen)}
                if pre.scaler_mean is not None else {}),
            log_transform_params=(
                {"a": pre.log_a.reshape(1, -1).tolist(),
                 "sign": pre.log_sign.reshape(1, -1).tolist(),
                 "log_transform_features": pre.log_features.tolist()}
                if pre.has_log else {}),
        )
        gmd = dict(
            means=self.gmm.means.tolist(),
            covariances=self.gmm.covariances.tolist(),
            weights=self.gmm.weights.tolist(),
            n_features=int(self.gmm.n_features),
            n_components=int(self.gmm.n_components),
            covariance_type="full",
        )
        gmd.update(self.metadata.get("scores", {}))
        presets = dict(self.metadata.get("presets", {}))
        presets["feature_set"] = self.feature_set
        presets.setdefault("features", list(self.features))
        data = dict(presets=presets, gmm_data=gmd,
                    preprocessing_pipeline=pp,
                    metadata=dict(data_created=str(datetime.now())))
        with open(filepath, "w") as f:
            yaml.dump(data, f)

    # ---- conditioning helpers

    def _transform_given(self, v):
        """Transform raw conditional value(s) into model space (reference
        PoleModel.sample, controlbehavior.py:1352-1358)."""
        v = np.atleast_1d(np.asarray(v, dtype=float))
        tmp = np.zeros((v.size, self.gmm.n_features))
        tmp[:, self.idx_given] = v
        t = self.preprocessing.transform(
            tmp, sparse_column_indices=[self.idx_given])
        return t[:, 0]

    def _rest_indices(self):
        return [i for i in range(len(self.features))
                if i != self.idx_given] if self.is_conditional else list(
                    range(len(self.features)))

    # ---- component means

    def component_mean_features(self, v):
        """Per-component mean pole features at speed v; [K, F-1]
        (reference get_component_means, controlbehavior.py:1472-1540)."""
        vg = self._transform_given(v)[0]
        g = conditional_gmm(self.gmm, self.idx_given, vg)
        return self.preprocessing.inverse_transform(
            g.means, sparse_column_indices=self._rest_indices())

    def component_mean_function_params(self, v_grid=None):
        """Linear-in-speed fit of the component mean features.

        Returns [K, F-1, 2] with [..., 0] = intercept, [..., 1] = slope
        (reference get_component_mean_function, controlbehavior.py:
        1601-1650, which fits LinearRegression over linspace(1.5, 5.5,
        250); same OLS here via lstsq).
        """
        if not self.is_conditional:
            k = self.gmm.n_components
            means = self.preprocessing.inverse_transform(self.gmm.means)
            return np.stack([np.c_[means[i], np.zeros(means.shape[1])]
                             for i in range(k)], axis=0)
        if v_grid is None:
            v_grid = np.linspace(1.5, 5.5, 250)
        means = np.stack([self.component_mean_features(v)
                          for v in v_grid], axis=2)   # [K, F-1, n_v]
        X = np.c_[np.ones_like(v_grid), v_grid]       # [n_v, 2]
        out = np.empty(means.shape[:2] + (2,))
        for i in range(means.shape[0]):
            coef, *_ = np.linalg.lstsq(X, means[i].T, rcond=None)
            out[i] = coef.T                            # [F-1, 2]
        return out

    def mean_poles(self, v, component=0):
        """Mean pole locations of one component at speed v, as complex
        poles in the reference's ordering (update_control_params,
        reference parameters.py:1397-1411).

        Evaluates the LINEAR-IN-SPEED FIT of the component means — exactly
        what the reference's runtime does (its `polefuncs[...].predict`),
        which differs from the exact conditional mean by the fit residual.
        """
        if not hasattr(self, "_linfit"):
            self._linfit = self.component_mean_function_params()
        feats = (self._linfit[component, :, 0]
                 + self._linfit[component, :, 1] * float(v))
        names = [self.features[i] for i in self._rest_indices()]
        return pole_features_to_poles(feats[None], names)[0]

    # ---- sampling

    def sample_pole_features(self, n_samples, v=None, rng=None,
                             max_retries=100):
        """Sample raw pole features; resamples non-finite inverse-transform
        results (reference PoleModel.sample, controlbehavior.py:1339-1412).
        """
        rng = rng or np.random.default_rng()
        if self.is_conditional:
            if v is None:
                raise ValueError("conditional pole model: pass the speed v")
            g = conditional_gmm(self.gmm, self.idx_given,
                                self._transform_given(v)[0])
        else:
            g = self.gmm
        samples, labels = g.sample(n_samples, rng)
        out = self.preprocessing.inverse_transform(
            samples, sparse_column_indices=self._rest_indices())
        for _ in range(max_retries):
            bad = ~np.all(np.isfinite(out), axis=1)
            if not np.any(bad):
                return out, labels
            res, lab = g.sample(int(bad.sum()), rng)
            out[bad] = self.preprocessing.inverse_transform(
                res, sparse_column_indices=self._rest_indices())
            labels[bad] = lab
        raise RuntimeError("Sampling error!")

    def sample_poles(self, n_samples=1, X_given=None, rng=None,
                     ensure_stable=True, max_retries=1000):
        """Sample complex pole sets, rejecting unstable draws (reference
        sample_poles, controlbehavior.py:1414-1469)."""
        feats, labels = self.sample_pole_features(n_samples, X_given, rng)
        names = [self.features[i] for i in self._rest_indices()]
        poles = pole_features_to_poles(feats, names)
        if ensure_stable:
            rng = rng or np.random.default_rng()
            for _ in range(max_retries):
                bad = np.any(np.real(poles) > 0, axis=1)
                if not np.any(bad):
                    return poles, labels
                f2, l2 = self.sample_pole_features(int(bad.sum()), X_given,
                                                   rng)
                poles[bad] = pole_features_to_poles(f2, names)
                labels[bad] = l2
            raise TimeoutError(
                f"Couldn't find {n_samples} stable poles after "
                f"{max_retries} draws!")
        return poles, labels


def fit_pole_model(raw_features, feature_set,
                   range_components=(1, 5),
                   covariance_types=("full", "tied", "diag", "spherical"),
                   k_crossval=10, n_init=20, log_transform=True,
                   normalize=True, seed=0, verbose=False) -> PoleModel:
    """Fit a pole model from raw pole-feature data [n, F].

    The reference's full fitting pipeline (PoleModel.fit_optimize +
    PreprocessingPipeline.fit_transform, controlbehavior.py:884-914,
    1273-1334): fit the log-shift / Yeo-Johnson / scaler preprocessing,
    then grid-search a (conditional-capable) GMM over n_components x
    covariance_type with k-fold CV -- here EM runs as a vmapped restart
    batch in JAX (see gmm_fit).
    """
    from cyclistsocialforce_tpu import gmm_fit

    features, _ = PREDEFINED_FEATURE_SETS[feature_set]
    X = np.asarray(raw_features, dtype=float)
    if X.shape[1] != len(features):
        raise ValueError(
            f"feature_set {feature_set} expects {len(features)} columns "
            f"({features}), got {X.shape[1]}")
    pre = Preprocessing(n_features=X.shape[1])
    Xt = pre.fit(X, features, log_transform=log_transform,
                 normalize=normalize)
    gmm, info = gmm_fit.fit_optimize(
        Xt, range_components=range_components,
        covariance_types=covariance_types, k_crossval=k_crossval,
        n_init=n_init, seed=seed, verbose=verbose)
    meta = {"presets": {"feature_set": feature_set,
                        "features": list(features),
                        "gridsearch_selection_metric": "NLL",
                        "n_gmm_inits": n_init,
                        "riderbike_model": None},
            "scores": {"scores_val": info["scores_val"],
                       "scores_test": info["scores_train"],
                       "n_samples_train": int(X.shape[0]),
                       "n_samples_test": 0,
                       "k_crossval": k_crossval}}
    return PoleModel(feature_set=feature_set, gmm=gmm, preprocessing=pre,
                     metadata=meta)


def load_packaged_polemodel(filename) -> PoleModel:
    """Load one of the pole models shipped with the package (the fitted
    models of the reference, see data/balancingriderparams/README.md)."""
    path = os.path.join(DATA_DIR, filename)
    if not os.path.exists(path):
        avail = sorted(f for f in os.listdir(DATA_DIR)
                       if f.endswith(".yaml"))
        raise FileNotFoundError(
            f"Couldn't find pole model {filename} in {DATA_DIR}. "
            f"Available models: {avail}")
    return PoleModel.import_from_yaml(path)


# --------------------------------------------------------------------------
# device-resident runtime for in-simulation stochastic pole sampling
# --------------------------------------------------------------------------


class PoleModelRT(struct.PyTreeNode):
    """Pytree image of a conditional pole model for on-device sampling.

    Conditioning, categorical component choice, MVN sampling, inverse
    preprocessing and stability rejection run under jit, vmapped over
    agents. The unbounded rejection loops of the host path become a fixed
    number of rounds (REJECT_ROUNDS); residual invalid draws fall back to
    the component conditional mean (always finite and stable in the
    shipped models).
    """

    means: Any            # [K, F]
    cov_chol: Any         # [K, F-1, F-1] cholesky of conditional-ready covs
    covariances: Any      # [K, F, F]
    weights: Any          # [K]
    lambdas: Any          # [F] or None
    scaler_mean: Any      # [F] or None
    scaler_scale: Any     # [F] or None
    log_a: Any            # [n_log] or None
    log_sign: Any         # [n_log] or None
    log_features: tuple = struct.field(pytree_node=False, default=())
    idx_given: int = struct.field(pytree_node=False, default=0)
    n_features: int = struct.field(pytree_node=False, default=6)

    REJECT_ROUNDS = 8

    @classmethod
    def from_polemodel(cls, pm: PoleModel):
        if not pm.is_conditional:
            raise ValueError("PoleModelRT requires a conditional model")
        pre = pm.preprocessing
        # The conditional covariance cov_c = cov[rest, rest]
        # - outer(cov_rg) / var_g does NOT depend on the conditioning
        # value, so its Cholesky is a per-component CONSTANT: precompute
        # it here instead of running a batched tiny Cholesky per agent
        # per step on device (a TPU pathology, see ops/smallmat.py).
        ig = int(pm.idx_given)
        F = int(pm.gmm.n_features)
        rest = [i for i in range(F) if i != ig]
        chols = []
        for k in range(pm.gmm.n_components):
            cov = np.asarray(pm.gmm.covariances[k])
            cov_rg = cov[rest, ig]
            cov_c = cov[np.ix_(rest, rest)] - np.outer(
                cov_rg, cov_rg) / cov[ig, ig]
            chols.append(np.linalg.cholesky(cov_c))
        return cls(
            means=jnp.asarray(pm.gmm.means),
            cov_chol=jnp.asarray(np.stack(chols)),
            covariances=jnp.asarray(pm.gmm.covariances),
            weights=jnp.asarray(pm.gmm.weights),
            lambdas=(None if pre.lambdas is None
                     else jnp.asarray(pre.lambdas)),
            scaler_mean=(None if pre.scaler_mean is None
                         else jnp.asarray(pre.scaler_mean)),
            scaler_scale=(None if pre.scaler_scale is None
                          else jnp.asarray(pre.scaler_scale)),
            log_a=None if not pre.has_log else jnp.asarray(pre.log_a),
            log_sign=None if not pre.has_log else jnp.asarray(pre.log_sign),
            log_features=(tuple() if not pre.has_log
                          else tuple(int(i) for i in pre.log_features)),
            idx_given=int(pm.idx_given),
            n_features=int(pm.gmm.n_features),
        )

    # ---- jax transforms (single feature vector [F]) ----

    def _yj(self, x, lam):
        pos = x >= 0
        y_pos = jnp.where(jnp.abs(lam) < 1e-19, jnp.log1p(jnp.abs(x)),
                          ((jnp.abs(x) + 1.0) ** lam - 1.0)
                          / jnp.where(lam == 0, 1.0, lam))
        xn = jnp.minimum(x, 0.0)
        y_neg = jnp.where(jnp.abs(lam - 2.0) < 1e-19, -jnp.log1p(-xn),
                          -((1.0 - xn) ** (2.0 - lam) - 1.0)
                          / jnp.where(lam == 2.0, 1.0, 2.0 - lam))
        return jnp.where(pos, y_pos, y_neg)

    def _yj_inv(self, y, lam):
        pos = y >= 0
        base_p = lam * y + 1.0
        x_pos = jnp.where(
            jnp.abs(lam) < 1e-19, jnp.expm1(y),
            jnp.where(base_p > 0, base_p, jnp.nan)
            ** (1.0 / jnp.where(lam == 0, 1.0, lam)) - 1.0)
        base_n = -(2.0 - lam) * y + 1.0
        x_neg = jnp.where(
            jnp.abs(lam - 2.0) < 1e-19, 1.0 - jnp.exp(-y),
            1.0 - jnp.where(base_n > 0, base_n, jnp.nan)
            ** (1.0 / jnp.where(lam == 2.0, 1.0, 2.0 - lam)))
        return jnp.where(pos, x_pos, x_neg)

    def transform_given(self, v):
        """Raw speed -> model space (scalar)."""
        ig = self.idx_given
        y = self._yj(v, self.lambdas[ig])
        return (y - self.scaler_mean[ig]) / self.scaler_scale[ig]

    def inverse_transform_rest(self, x_rest):
        """Model-space features (without the given one, [F-1]) -> raw."""
        rest = [i for i in range(self.n_features) if i != self.idx_given]
        full = jnp.zeros((self.n_features,),
                         dtype=x_rest.dtype).at[jnp.asarray(rest)].set(x_rest)
        full = full * self.scaler_scale + self.scaler_mean
        full = self._yj_inv(full, self.lambdas)
        if self.log_features:
            li = jnp.asarray(self.log_features)
            full = full.at[li].set(
                (jnp.exp(full[li]) + self.log_a) * self.log_sign)
        return full[jnp.asarray(rest)]

    def conditional(self, v):
        """Condition on raw speed v: returns (means [K, F-1],
        chols [K, F-1, F-1], weights [K]) in model space."""
        xg = self.transform_given(v)
        ig = self.idx_given
        rest = jnp.asarray(
            [i for i in range(self.n_features) if i != self.idx_given])

        def per_comp(mu, cov, w, chol):
            var_g = cov[ig, ig]
            cov_rg = cov[rest, ig]
            d = xg - mu[ig]
            mu_c = mu[rest] + cov_rg / var_g * d
            logw = jnp.log(w) - 0.5 * d * d / var_g - 0.5 * jnp.log(
                2 * jnp.pi * var_g)
            # chol is the precomputed per-component constant (the
            # conditional covariance is independent of the conditioning
            # value; from_polemodel)
            return mu_c, chol, logw

        mu_c, chol_c, logw = jax.vmap(per_comp)(
            self.means, self.covariances, self.weights, self.cov_chol)
        w = jax.nn.softmax(logw)
        return mu_c, chol_c, w

    def _ok(self, f):
        """Stability + finiteness of a raw feature draw: all real-part
        features < 0. In 'ImRe' feature sets the real parts are exactly
        the log-transformed ('real') features (reference sample_poles
        stability check, controlbehavior.py:1459-1466)."""
        finite = jnp.all(jnp.isfinite(f))
        rest = [i for i in range(self.n_features)
                if i != self.idx_given]
        if self.log_features:
            ridx = jnp.asarray([rest.index(i) for i in
                                self.log_features if i in rest])
            stable = jnp.all(f[ridx] < 0)
        else:
            stable = jnp.array(True)
        return finite & stable

    def sample_features(self, key, v):
        """One stable, finite pole-feature draw [F-1] conditioned on v."""
        return self.sample_features_info(key, v)[0]

    def sample_features_batch(self, key, v):
        """Population draw: [N] speeds -> ([N, F-1] features, [N] ok).

        `key` is either ONE key (shape [2]) or PER-AGENT keys ([N, 2],
        from `state.agent_streams` -- draws then follow the agent
        through row permutations and device sharding).

        Equivalent in distribution to vmapping `sample_features` over
        split keys, but ALL randomness comes from bulk vectorized calls
        (a uniform [N, R] for the component choice, a normal
        [N, R, F-1]) instead of ~9 threefry splits per agent per step --
        the per-agent key LADDER (split chains in a scan) dominated the
        stochastic path at N = 1e5 (~30 ms/step); the per-agent-key form
        here is 3 vmapped (vectorized) threefry passes."""
        rounds = self.REJECT_ROUNDS
        n = v.shape[0]
        fm1 = self.n_features - 1
        dtype = self.means.dtype
        if jnp.ndim(key) == 2:
            def draws(k):
                ku_i, kz_i = jax.random.split(k)
                return (jax.random.uniform(ku_i, (rounds,), dtype=dtype),
                        jax.random.normal(kz_i, (rounds, fm1),
                                          dtype=dtype))

            # BARRIER the drawn randomness: without the fence XLA fuses
            # the vmapped threefry chains into the rejection-round
            # consumers below and the whole sorted-resident step
            # re-schedules (~1.6 ms/step at N = 1e5, budget 2048 --
            # the same fusion cliff as the gain-LUT row gathers)
            u, z = jax.lax.optimization_barrier(jax.vmap(draws)(key))
        else:
            ku, kz = jax.random.split(key)
            u = jax.random.uniform(ku, (n, rounds), dtype=dtype)
            z = jax.random.normal(kz, (n, rounds, fm1), dtype=dtype)

        def per_agent(vi, ui, zi):
            mu_c, chol_c, w = self.conditional(vi)
            cumw = jnp.cumsum(w)

            def draw(r):
                comp = jnp.minimum(jnp.sum(ui[r] > cumw), w.shape[0] - 1)
                oh = (jnp.arange(w.shape[0]) == comp).astype(dtype)
                mu = jnp.sum(oh[:, None] * mu_c, axis=0)
                Lz = jnp.sum(oh[:, None]
                             * jnp.sum(chol_c * zi[r][None, None, :],
                                       axis=-1), axis=0)
                return self.inverse_transform_rest(mu + Lz)

            best = draw(0)
            good = self._ok(best)
            for r in range(1, rounds):
                cand = draw(r)
                take = (~good) & self._ok(cand)
                best = jnp.where(take, cand, best)
                good = good | self._ok(cand)
            fallback = self.inverse_transform_rest(mu_c[jnp.argmax(w)])
            return jnp.where(good, best, fallback), good

        return jax.vmap(per_agent)(v, u, z)

    def sample_features_info(self, key, v):
        """One stable, finite pole-feature draw [F-1] conditioned on v,
        plus a bool: True if a rejection-sampled draw succeeded, False if
        the draw fell back to the most-likely component's conditional mean
        (all REJECT_ROUNDS draws unstable/non-finite). The fallback
        frequency is an observable diagnostic -- see
        tests/test_behavior.py::test_polemodel_rt_fallback_rate.

        Fixed-round rejection (finite inverse + stability via sign of the
        'real' features) instead of the reference's unbounded loops.
        """
        mu_c, chol_c, w = self.conditional(v)
        fm1 = self.n_features - 1

        def ok(f):
            return self._ok(f)

        def draw(k):
            kc, kn = jax.random.split(k)
            comp = jax.random.choice(kc, w.shape[0], p=w)
            z = jax.random.normal(kn, (fm1,), dtype=mu_c.dtype)
            # one-hot contraction instead of a dynamic component gather
            # (vmapped gathers of tiny rows serialize on TPU)
            oh = (jnp.arange(w.shape[0]) == comp).astype(mu_c.dtype)
            mu = jnp.sum(oh[:, None] * mu_c, axis=0)
            Lz = jnp.sum(oh[:, None] * jnp.sum(chol_c * z[None, None, :],
                                               axis=-1), axis=0)
            return self.inverse_transform_rest(mu + Lz)

        keys = jax.random.split(key, self.REJECT_ROUNDS)
        best = draw(keys[0])
        good = ok(best)
        for r in range(1, self.REJECT_ROUNDS):
            cand = draw(keys[r])
            take = (~good) & ok(cand)
            best = jnp.where(take, cand, best)
            good = good | ok(cand)
        # fallback: conditional mean of the most likely component
        fallback = self.inverse_transform_rest(mu_c[jnp.argmax(w)])
        return jnp.where(good, best, fallback), good


def combine_outliers(outliers_by_model):
    """Combine per-model outlier flags into one any-model mask
    (reference controlbehavior.get_outliers_all_models,
    controlbehavior.py:41-63 -- there a pandas merge over per-model
    CSVs keyed by sample_id; here a file-format-free equivalent over
    {model_name: (sample_ids, outlier_flags)} or plain flag arrays).

    Returns (sample_ids, combined [S] bool) where combined[s] is True if
    ANY model flags that sample. Models may list samples in different
    orders; ids missing from a model are treated as not flagged by it."""
    ids = None
    per_model = {}
    for name, entry in outliers_by_model.items():
        if isinstance(entry, tuple):
            sid, flags = entry
        else:
            flags = entry
            sid = np.arange(len(flags))
        sid = np.asarray(sid)
        flags = np.asarray(flags, dtype=bool)
        if sid.shape != flags.shape:
            raise ValueError(f"model {name!r}: ids and flags must align")
        per_model[name] = (sid, flags)
        ids = sid if ids is None else np.union1d(ids, sid)
    combined = np.zeros(ids.shape, dtype=bool)
    for sid, flags in per_model.values():
        pos = np.searchsorted(ids, sid)
        combined[pos] |= flags
    return ids, combined
