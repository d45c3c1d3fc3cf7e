"""Unrolled small-matrix ops vs jnp.linalg (the TPU-pathology
replacements used on the balancing-rider hot path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclistsocialforce_tpu.ops.smallmat import (matmul_small, matvec_small,
                                                 solve_small)


@pytest.mark.parametrize("n", [2, 3, 5, 7])
def test_matmul_matvec_match(n):
    rng = np.random.default_rng(n)
    A = jnp.asarray(rng.normal(size=(n, n)))
    B = jnp.asarray(rng.normal(size=(n, n)))
    x = jnp.asarray(rng.normal(size=(n,)))
    np.testing.assert_allclose(np.asarray(matmul_small(A, B)),
                               np.asarray(A @ B), atol=1e-12)
    np.testing.assert_allclose(np.asarray(matvec_small(A, x)),
                               np.asarray(A @ x), atol=1e-12)


@pytest.mark.parametrize("m", [None, 1, 5])
def test_solve_matches_linalg(m):
    rng = np.random.default_rng(7)
    A = jnp.asarray(rng.normal(size=(5, 5)))
    b = jnp.asarray(rng.normal(size=(5,) if m is None else (5, m)))
    x = solve_small(A, b)
    x_ref = jnp.linalg.solve(A, b if m else b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-10)


def test_solve_needs_pivoting():
    """A zero leading pivot must be handled (branchless partial pivot)."""
    A = jnp.asarray([[0.0, 1.0, 0.0],
                     [2.0, 0.0, 1.0],
                     [0.0, 3.0, 4.0]])
    b = jnp.asarray([1.0, 2.0, 3.0])
    x = solve_small(A, b)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), atol=1e-12)


def test_solve_vmapped_batch():
    """The vmapped form (the production shape) matches batched linalg."""
    rng = np.random.default_rng(11)
    A = jnp.asarray(rng.normal(size=(64, 5, 5)))
    b = jnp.asarray(rng.normal(size=(64, 5)))
    x = jax.vmap(solve_small)(A, b)
    x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-9)
