"""Parametric spline machinery: masked fixed-size fits vs the per-size
reference, and the banded (Thomas) fit vs the general masked elimination.

The destination force consumes `fit_masked_banded` (engine.py); scipy
splprep equivalence is pinned end-to-end by the golden parity tests
(test_parity_twod / test_parity_invpendulum)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclistsocialforce_tpu.ops import spline as spl


def _path(m, seed):
    rng = np.random.default_rng(seed)
    return np.cumsum(rng.normal(0, 2, (m, 2)), axis=0)


@pytest.mark.parametrize("m", [4, 5, 6])
def test_masked_fit_matches_per_size_fit(m):
    """The runtime-m masked fit reproduces the m-sized not-a-knot fit
    (positions + both derivatives at 20 uniform parameters)."""
    pts = _path(m, m)
    pts6 = np.zeros((6, 2))
    pts6[:m] = pts
    ref = np.asarray(spl.fit_eval_parametric(jnp.asarray(pts), 20))
    t, M = spl.fit_masked(jnp.asarray(pts6), m)
    q = jnp.linspace(0.0, 1.0, 20)
    S, dS, d2S = spl.spline_eval(t, jnp.asarray(pts6), M, q)
    np.testing.assert_allclose(np.asarray(S), ref[:, :2], atol=1e-12)
    np.testing.assert_allclose(np.asarray(dS), ref[:, 2:4], atol=1e-10)
    np.testing.assert_allclose(np.asarray(d2S), ref[:, 4:6], atol=1e-9)
    # positions-only fast path agrees
    np.testing.assert_allclose(
        np.asarray(spl.eval_positions(t, jnp.asarray(pts6), M, q)),
        ref[:, :2], atol=1e-12)


def test_banded_fit_matches_general_masked_fit():
    """The Thomas-sweep banded solve equals the general masked 6x6
    elimination across sizes and random paths."""
    rng = np.random.default_rng(1)
    for trial in range(60):
        m = int(rng.integers(4, 7))
        pts6 = np.zeros((6, 2))
        pts6[:m] = _path(m, 100 + trial)
        t1, M1 = spl.fit_masked(jnp.asarray(pts6), m)
        t2, M2 = spl.fit_masked_banded(jnp.asarray(pts6), m)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t1),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(M2), np.asarray(M1),
                                   atol=1e-9)


def test_degenerate_points_yield_nonfinite_not_crash():
    """Duplicate support points (stationary agent) must produce
    non-finite moments -- the caller's straight-line fallback condition
    -- rather than raising (the reference CRASHES in FITPACK there,
    vehicle.py:1495-1507)."""
    pts6 = np.zeros((6, 2))          # all points identical
    for fit in (spl.fit_masked, spl.fit_masked_banded):
        t, M = fit(jnp.asarray(pts6), 4)
        assert not bool(jnp.all(jnp.isfinite(M)))
