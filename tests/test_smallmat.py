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


def test_expm_matches_scipy_linalg():
    """expm_small vs jax.scipy.linalg.expm over the norm range the
    inverted-pendulum ZOH matrices occupy (and beyond)."""
    import jax.scipy.linalg as jsl

    from cyclistsocialforce_tpu.ops.smallmat import expm_small

    rng = np.random.default_rng(3)
    for scale in (0.01, 0.5, 5.0, 50.0):
        A = jnp.asarray(rng.normal(size=(6, 6)) * scale)
        e_ref = np.asarray(jsl.expm(A))
        e = np.asarray(expm_small(A))
        np.testing.assert_allclose(
            e, e_ref, rtol=1e-10,
            atol=1e-10 * max(1.0, np.abs(e_ref).max()))


def test_expm_vmapped_zoh_matrices():
    """The production shape: vmapped 6x6 ZOH matrices built from the
    inverted-pendulum closed loop across the speed range."""
    import jax.scipy.linalg as jsl

    from cyclistsocialforce_tpu.models import invpendulum as IP
    from cyclistsocialforce_tpu.ops.smallmat import expm_small
    from cyclistsocialforce_tpu.params import InvPendulumBicycleParams

    p = InvPendulumBicycleParams.create()
    vs = jnp.asarray(np.linspace(0.5, 10.0, 40))
    K_x, K_u = p.fullstate_feedback_gains(vs)

    def aug_one(v, kx, ku):
        pb = {f: jnp.asarray(getattr(p, f)) for f in
              ("l", "l_2", "g", "tau_1_squared", "c_steer",
               "i_steer_vertvert")}
        A, B = IP.openloop_matrices(pb, v)
        Acl = A - B[:, None] * kx[None, :]
        aug = jnp.zeros((6, 6), dtype=v.dtype)
        return aug.at[:5, :5].set(Acl * 0.01).at[:5, 5].set(ku * B * 0.01)

    augs = jax.vmap(aug_one)(vs, K_x, K_u)
    e_ref = np.asarray(jax.vmap(jsl.expm)(augs))
    e = np.asarray(jax.vmap(expm_small)(augs))
    np.testing.assert_allclose(e, e_ref, rtol=1e-9, atol=1e-11)


def test_expm_float32_production_dtype():
    """The f32 path (the production TPU dtype): norm-adaptive squarings
    must not amplify rounding -- a fixed s=12 gave ~3e-4 relative error
    on the small-norm ZOH matrices (ADVICE round 2); the adaptive count
    (s = 0 for norms below theta_13) stays near f32 machine precision.
    Reference = f64 expm cast down."""
    import jax.scipy.linalg as jsl

    from cyclistsocialforce_tpu.ops.smallmat import expm_small

    rng = np.random.default_rng(5)
    # scale 50 is omitted: exp(A) itself overflows float32 there
    for scale in (0.05, 0.2, 0.5, 2.0, 5.0):
        A64 = jnp.asarray(rng.normal(size=(6, 6)) * scale)
        e_ref = np.asarray(jsl.expm(A64)).astype(np.float32)
        e32 = np.asarray(expm_small(A64.astype(jnp.float32)))
        err = np.abs(e32 - e_ref).max() / max(1.0, np.abs(e_ref).max())
        assert err < 5e-6, (scale, err)
