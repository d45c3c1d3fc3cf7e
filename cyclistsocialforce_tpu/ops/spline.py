"""Parametric interpolating cubic splines (FITPACK-equivalent, fixed size).

The reference's path-planning destination force fits a parametric cubic
spline through 4-6 waypoints with `scipy.interpolate.splprep(s=0)` every
agent step (reference vehicle.py:1495-1510) -- a data-dependent FITPACK
call impossible under jit. This module replaces it with closed-form,
shape-static linear algebra:

  * `splprep(s=0)` parameterizes by normalized cumulative chord length and
    returns the unique interpolating cubic spline whose knot vector skips
    the second and second-to-last sites -- i.e. the NOT-A-KNOT
    interpolating spline over the chord parameter.
  * For a fixed point count m that spline is the solution of an m x m
    linear system in the second derivatives ("moments"); m here is 4, 5 or
    6, so each solve is a tiny dense system, batched over agents via vmap.

Equivalence to `splprep` is asserted numerically in tests/test_spline.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chord_param(pts):
    """Normalized cumulative chord-length parameterization u in [0, 1]
    (what splprep computes when `u` is not given). pts: [m, d]."""
    seg = jnp.sqrt(jnp.sum(jnp.diff(pts, axis=0) ** 2, axis=1))
    u = jnp.concatenate([jnp.zeros((1,), pts.dtype), jnp.cumsum(seg)])
    return u / u[-1]


def notaknot_moments(t, y):
    """Second derivatives M of the not-a-knot interpolating cubic spline.

    t : [m] strictly increasing sites; y : [m, d] values.
    Returns M : [m, d]. m is static (4..6 in this framework).
    """
    m = t.shape[0]
    h = jnp.diff(t)                      # [m-1]
    A = jnp.zeros((m, m), dtype=t.dtype)
    rhs = jnp.zeros_like(y)

    # not-a-knot at t[1]: S'''_0(t1-) == S'''_1(t1+)
    A = A.at[0, 0].set(1.0 / h[0])
    A = A.at[0, 1].set(-(1.0 / h[0] + 1.0 / h[1]))
    A = A.at[0, 2].set(1.0 / h[1])
    # C2 continuity at interior sites
    for i in range(1, m - 1):
        A = A.at[i, i - 1].set(h[i - 1] / 6.0)
        A = A.at[i, i].set((h[i - 1] + h[i]) / 3.0)
        A = A.at[i, i + 1].set(h[i] / 6.0)
        rhs = rhs.at[i].set((y[i + 1] - y[i]) / h[i]
                            - (y[i] - y[i - 1]) / h[i - 1])
    # not-a-knot at t[m-2]
    A = A.at[m - 1, m - 3].set(1.0 / h[m - 3])
    A = A.at[m - 1, m - 2].set(-(1.0 / h[m - 3] + 1.0 / h[m - 2]))
    A = A.at[m - 1, m - 1].set(1.0 / h[m - 2])

    return jnp.linalg.solve(A, rhs)


def spline_eval(t, y, M, q):
    """Evaluate the cubic spline (sites t [m], values y [m, d], moments M)
    and its first two derivatives at queries q [Q].

    Returns (S, dS, d2S), each [Q, d].
    """
    m = t.shape[0]
    h = jnp.diff(t)
    k = jnp.clip(jnp.searchsorted(t, q, side="right") - 1, 0, m - 2)

    hk = h[k][:, None]
    t1 = (t[k + 1] - q)[:, None]         # distance to right site
    t2 = (q - t[k])[:, None]
    Mk, Mk1 = M[k], M[k + 1]
    yk, yk1 = y[k], y[k + 1]

    a = yk / hk - Mk * hk / 6.0
    b = yk1 / hk - Mk1 * hk / 6.0

    S = (Mk * t1**3 + Mk1 * t2**3) / (6.0 * hk) + a * t1 + b * t2
    dS = (-Mk * t1**2 + Mk1 * t2**2) / (2.0 * hk) - a + b
    d2S = (Mk * t1 + Mk1 * t2) / hk
    return S, dS, d2S


def fit_eval_parametric(pts, n_eval: int = 20):
    """splprep(s=0)-equivalent: fit the chord-parameterized interpolating
    spline through pts [m, 2] and evaluate it with two derivatives at
    `n_eval` uniform parameter values (reference vehicle.py:1495-1510).

    Returns [n_eval, 6]: (x, y, dx, dy, d2x, d2y) -- the reference's
    `destspline` layout.
    """
    u = chord_param(pts)
    M = notaknot_moments(u, pts)
    q = jnp.linspace(0.0, 1.0, n_eval, dtype=pts.dtype)
    S, dS, d2S = spline_eval(u, pts, M, q)
    return jnp.concatenate([S, dS, d2S], axis=1)


fit_eval_parametric_batch = jax.vmap(fit_eval_parametric,
                                     in_axes=(0,), out_axes=0)
