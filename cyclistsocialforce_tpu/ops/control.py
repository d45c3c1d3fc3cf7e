"""Control-engineering primitives: PID, pole placement, discretization.

Pure-JAX replacements for the reference's uses of the `control` toolbox
(reference dynamics.py:21-54, 1167-1227; vehicle.py:1810-1848):

  - stateful PID as a pure function over (error, integral) state
  - Ackermann pole placement for single-input systems (closed-form
    replacement of the per-step `ct.place`)
  - DC-gain based reference scaling (replacement of the 1000-sample
    simulated step response in `from_pole_placement`)
  - exact zero-order-hold discretization via the augmented-matrix
    exponential (replacement of `ct.forced_response` over one sample)

All functions are batched/vmap-friendly and shape-static.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl

# --------------------------------------------------------------------------
# PID
# --------------------------------------------------------------------------


def pid_step(e, e_prev, i_prev, kp, ki, kd, dt):
    """One PID step; exact port of PIDcontroller.step (reference
    dynamics.py:33-54), including its sign convention for the derivative
    term d = kd * (e_prev - e) / dt and the integral using the NEW error.

    Returns (out, e, i_new) so the caller can thread the controller state.
    """
    d = kd * (e_prev - e) / dt
    i_new = i_prev + ki * e * dt
    out = kp * e + i_new + d
    return out, e, i_new


# --------------------------------------------------------------------------
# pole placement (SISO, closed form)
# --------------------------------------------------------------------------


def poly_from_roots(roots):
    """Monic polynomial coefficients from roots, highest power first.

    Complex roots must come in conjugate pairs for a real polynomial;
    the caller takes the real part.
    """
    n = roots.shape[0]
    # lowest-power-first accumulation: p <- p * (x - r) = shift(p) - r p
    c = jnp.zeros((n + 1,), dtype=roots.dtype).at[0].set(1.0)
    for k in range(n):
        shifted = jnp.concatenate(
            [jnp.zeros((1,), dtype=c.dtype), c[:-1]])
        c = shifted - roots[k] * c
    return c[::-1]


def charpoly_from_pole_features(feats):
    """Monic characteristic polynomial (highest power first) of the pole
    set encoded by ImRe pole features
    ``[p0_real, p1_real, p1_imag, p2_real, p2_imag]`` -- i.e. poles
    [p0, p1 +/- j q1, p2 +/- j q2] (the reference's pole ordering in
    update_control_params, parameters.py:1397-1411).

    Real-arithmetic expansion: (s - p0) (s^2 - 2 p1 s + p1^2 + q1^2)
    (s^2 - 2 p2 s + p2^2 + q2^2). Degree inferred from feats length
    (5 -> quintic, 3 -> cubic, 1 -> linear).
    """
    feats = jnp.asarray(feats)
    one = jnp.ones((), dtype=feats.dtype)
    poly = jnp.stack([one, -feats[0]])
    m = feats.shape[0]
    i = 1
    while i + 1 < m:
        p, q = feats[i], feats[i + 1]
        quad = jnp.stack([one, -2.0 * p, p * p + q * q])
        poly = jnp.convolve(poly, quad)
        i += 2
    return poly


def ackermann(A, B, coeffs):
    """Ackermann gain K = e_n^T ctrb(A, B)^{-1} phi(A) for a SISO system,
    with phi the desired monic characteristic polynomial given by `coeffs`
    (highest power first, length n+1).

    Built on ops.smallmat (unrolled static-index linear algebra): under
    `jax.vmap` over a 1e5-agent batch every product is one [N]-wide VPU
    op, instead of the batched-tiny-LU path `jnp.linalg.solve` takes on
    TPU. phi(A) is never materialized: K = y^T phi(A) with
    ctrb^T y = e_n, evaluated by Horner on the VECTOR --
    r <- A^T r + c_k y -- so the whole placement costs n matvecs
    (n^3 ops) instead of n matmuls (n^4 ops)."""
    from cyclistsocialforce_tpu.ops.smallmat import (matvec_small,
                                                     solve_small)

    B = B.reshape(-1)
    n = A.shape[0]
    cols = [B]
    for _ in range(n - 1):
        cols.append(matvec_small(A, cols[-1]))
    ctrb = jnp.stack(cols, axis=1)
    en = jnp.zeros((n,), dtype=A.dtype).at[-1].set(1.0)
    y = solve_small(ctrb.T, en)
    At = A.T
    r = coeffs[0] * y                 # monic: coeffs[0] == 1
    for k in range(1, n + 1):
        r = matvec_small(At, r) + coeffs[k] * y
    return r


def ackermann_basis(A, B):
    """Basis of the Ackermann gain as a function of the characteristic
    coefficients: rows M[k] = (A^T)^(n-k) y for k = 0..n, with
    y = ctrb(A, B)^-T e_n -- so `ackermann(A, B, coeffs)` equals
    `coeffs @ M` for ANY monic polynomial (K is linear in the
    coefficients; see the Horner recursion in `ackermann`). Tabulating
    M over a speed grid gives per-agent pole placement at lookup cost
    while the agents' pole features stay exact
    (params.BalancingRiderParams br_ackermann_lut)."""
    from cyclistsocialforce_tpu.ops.smallmat import (matvec_small,
                                                     solve_small)

    B = B.reshape(-1)
    n = A.shape[0]
    cols = [B]
    for _ in range(n - 1):
        cols.append(matvec_small(A, cols[-1]))
    ctrb = jnp.stack(cols, axis=1)
    en = jnp.zeros((n,), dtype=A.dtype).at[-1].set(1.0)
    y = solve_small(ctrb.T, en)
    At = A.T
    rows = [y]
    for _ in range(n):
        rows.append(matvec_small(At, rows[-1]))
    return jnp.stack(rows[::-1], axis=0)     # [n+1, n], M[k] = (A^T)^(n-k) y


def place_siso(A, B, poles):
    """Ackermann pole placement for a single-input system.

    Closed-form equivalent of `ct.place(A, B, poles)` for SISO systems
    (the reference calls it per step inside from_pole_placement,
    dynamics.py:1167-1227 -- placement is unique for single-input systems,
    so the algorithms agree).

    Parameters
    ----------
    A : [n, n], B : [n] or [n, 1], poles : [n] complex.

    Returns K : [n] real gain vector.
    """
    B = B.reshape(-1)
    n = A.shape[0]
    # controllability matrix [B, AB, ..., A^{n-1}B]
    cols = [B]
    for _ in range(n - 1):
        cols.append(A @ cols[-1])
    ctrb = jnp.stack(cols, axis=1)
    # desired characteristic polynomial phi(A), evaluated by Horner's rule
    poles = jnp.asarray(poles, dtype=jnp.complex128
                        if A.dtype == jnp.float64 else jnp.complex64)
    coeffs = jnp.real(poly_from_roots(poles)).astype(A.dtype)
    phiA = jnp.zeros_like(A)
    for k in range(n + 1):
        phiA = phiA @ A + coeffs[k] * jnp.eye(n, dtype=A.dtype)
    en = jnp.zeros((n,), dtype=A.dtype).at[-1].set(1.0)
    K = en @ jnp.linalg.solve(ctrb, phiA)
    return K


def dc_gain(Acl, B, C):
    """Steady-state output of a stable closed-loop system under unit step:
    y_ss = -C Acl^{-1} B.

    Replaces the reference's 10 s simulated step response used to scale the
    reference gain K_u (dynamics.py:1212-1225); for asymptotically stable
    systems the two agree to ~exp(-lambda_min * 9.9).
    """
    B = B.reshape(-1, 1)
    x_ss = -jnp.linalg.solve(Acl, B)
    return (C @ x_ss).reshape(())


def discretize_foh(A, B, dt):
    """First-order-hold discretization via the augmented exponential:

        expm([[A, B, 0], [0, 0, I], [0, 0, 0]] dt) -> Ad, P, Q

    so that x_{k+1} = Ad x_k + P u_k + Q (u_{k+1} - u_k)/dt -- the exact
    propagation rule of `forced_response` with linearly interpolated
    inputs (python-control's continuous-time default). With constant
    input the Q term vanishes and (Ad, P) is the ZOH pair.
    """
    n = A.shape[0]
    B = B.reshape(n, -1)
    m = B.shape[1]
    aug = jnp.zeros((n + 2 * m, n + 2 * m), dtype=A.dtype)
    aug = aug.at[:n, :n].set(A * dt)
    aug = aug.at[:n, n:n + m].set(B * dt)
    aug = aug.at[n:n + m, n + m:].set(jnp.eye(m, dtype=A.dtype) * dt)
    e = jsl.expm(aug)
    return e[:n, :n], e[:n, n:n + m], e[:n, n + m:]


def matrix_power(A, k: int):
    """A^k by square-and-multiply; k is a static Python int."""
    n = A.shape[0]
    result = jnp.eye(n, dtype=A.dtype)
    base = A
    while k > 0:
        if k & 1:
            result = result @ base
        k >>= 1
        if k:
            base = base @ base
    return result


def discretize_zoh(A, B, dt):
    """Exact zero-order-hold discretization via the augmented exponential.

    expm([[A, B], [0, 0]] dt) = [[Ad, Bd], [0, I]]. Equivalent to what
    `ct.forced_response` computes over one sample with constant input
    (reference vehicle.py:1835-1842, dynamics.py:235-243).
    """
    n = A.shape[0]
    B = B.reshape(n, -1)
    m = B.shape[1]
    aug = jnp.zeros((n + m, n + m), dtype=A.dtype)
    aug = aug.at[:n, :n].set(A * dt)
    aug = aug.at[:n, n:].set(B * dt)
    e = jsl.expm(aug)
    return e[:n, :n], e[:n, n:]
