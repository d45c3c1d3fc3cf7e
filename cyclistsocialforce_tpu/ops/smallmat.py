"""Unrolled small-matrix linear algebra for huge batches of tiny systems.

`jnp.linalg.solve` / batched `dot_general` on [N, 5, 5] operands are a
TPU pathology: XLA lowers them through LAPACK-style LU kernels (or pads
5x5 matmuls onto the 128x128 MXU), which serialize catastrophically at
N ~ 1e5 (measured: the balancing-rider midpoint solve alone cost ~138 ms
per step at N = 100k -- ~20x the entire pairwise force stage).

The TPU-native shape for this workload is STRUCTURE-OF-ARRAYS over the
batch: unroll the n = 5 linear algebra into static-index scalar ops and
`jax.vmap` them over the agent axis, so every multiply/add becomes one
[N]-wide VPU op (the batch axis rides the 8x128 lanes). Pivoting is
branchless (argmax + one-hot row selects), so everything stays inside
jit/scan.

These helpers replace the reference's per-object `np.linalg`/
`ct`-toolbox calls (reference dynamics.py:602-706) on the hot path;
parity is pinned by tests against `jnp.linalg` on CPU.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["matmul_small", "matvec_small", "solve_small", "expm_small"]


def matmul_small(A, B):
    """[n, k] @ [k, m] as a broadcast-multiply + axis reduction.

    This stays ELEMENTWISE (no dot_general): under vmap it becomes one
    [N, n, k, m] multiply + one reduce -- pure VPU work with a tiny HLO
    footprint (a fully scalar-unrolled form compiles to ~n*k*m HLO ops,
    which explodes trace/compile time once nested in scans, e.g. the
    Pade expm below)."""
    return jnp.sum(A[:, :, None] * B[None, :, :], axis=1)


def matvec_small(A, x):
    """[n, k] @ [k] as broadcast-multiply + reduce (see matmul_small)."""
    return jnp.sum(A * x[None, :], axis=1)


def solve_small(A, b, pivot: bool = True):
    """Solve A x = b by unrolled Gaussian elimination. A: [n, n];
    b: [n] or [n, m]; returns x shaped like b.

    With pivot=True (default), pivot selection is a branchless argmax +
    one-hot row swap (no dynamic gathers) -- rounding differs from
    LAPACK LU only through pivot-order ties; tests pin agreement to
    ~1e-12 (f64) / ~1e-5 (f32) against jnp.linalg.solve. pivot=False
    drops the swap machinery (~60% of the vmapped op count) for systems
    known to eliminate stably in order (e.g. the spline moment systems,
    whose degenerate inputs are handled by the caller's NaN fallback).
    """
    n = A.shape[0]
    vec = b.ndim == 1
    bb = b[:, None] if vec else b
    M = jnp.concatenate([A, bb], axis=1)          # [n, n + m]
    rows = jnp.arange(n)

    for k in range(n):
        if pivot:
            # branchless partial pivot: largest |M[i, k]|, i >= k
            col = jnp.where(rows >= k, jnp.abs(M[:, k]), -1.0)
            p = jnp.argmax(col)
            oh_p = (rows == p)[:, None]
            oh_k = (rows == k)[:, None]
            row_p = jnp.sum(jnp.where(oh_p, M, 0.0), axis=0)
            row_k = jnp.sum(jnp.where(oh_k, M, 0.0), axis=0)
            M = jnp.where(oh_k, row_p[None, :],
                          jnp.where(oh_p, row_k[None, :], M))
        # eliminate below the pivot (static row index k)
        factors = jnp.where(rows > k, M[:, k] / M[k, k], 0.0)
        M = M - factors[:, None] * M[k][None, :]

    # back substitution, unrolled with static indices
    xs = [None] * n
    for i in reversed(range(n)):
        acc = M[i, n:]
        for j in range(i + 1, n):
            acc = acc - M[i, j] * xs[j]
        xs[i] = acc / M[i, i]
    x = jnp.stack(xs, axis=0)                      # [n, m]
    return x[:, 0] if vec else x


# Pade-13 coefficients (the scipy/jax expm numerator/denominator split)
_PADE13_B = (
    64764752532480000.0, 32382376266240000.0, 7771770303897600.0,
    1187353796428800.0, 129060195264000.0, 10559470521600.0,
    670442572800.0, 33522128640.0, 1323241920.0, 40840800.0,
    960960.0, 16380.0, 182.0, 1.0)


# Pade-13 accuracy threshold theta_13 (Higham 2005, double precision);
# scaling targets ||A|| / 2^s <= theta so the approximant is in its
# high-accuracy regime with the FEWEST squarings (each squaring doubles
# the accumulated rounding error -- the dominant error term in float32).
_THETA13 = 5.371920351148152


def expm_small(A, max_squarings: int = 12):
    """Matrix exponential of a small [n, n] matrix, fully unrolled:
    norm-adaptive scaling + the Pade-13 approximant + `solve_small` -- so
    the vmapped form is pure [N]-wide VPU work instead of the batched tiny
    matmul/LU ladder `jax.scipy.linalg.expm` lowers to (which serializes
    catastrophically on TPU: the inverted-pendulum model's per-agent 6x6
    ZOH expm cost ~26 ms/step at N = 8k).

    The squaring count is chosen per matrix from its 1-norm,
    s = clip(ceil(log2(||A||_1 / theta_13)), 0, max_squarings), evaluated
    branchlessly (the unrolled loop always runs `max_squarings` masked
    squarings, so the op count is static) -- a fixed s=12 amplified
    float32 rounding ~2000x for the small-norm ZOH matrices of the
    production path (||A t_s|| ~ 0.05-0.5 -> s = 0 suffices). Agreement
    with jax.scipy.linalg.expm is pinned by tests to ~1e-12 (f64) and
    ~2e-6 relative (f32, the production TPU dtype).
    """
    n = A.shape[0]
    b = _PADE13_B
    eye = jnp.eye(n, dtype=A.dtype)
    norm1 = jnp.max(jnp.sum(jnp.abs(A), axis=0))
    # norm <= theta -> log2 <= 0 -> s = 0; norm = 0 -> -inf -> s = 0
    s = jnp.clip(jnp.ceil(jnp.log2(norm1 / _THETA13)), 0, max_squarings)
    As = A * (0.5 ** s)
    A2 = matmul_small(As, As)
    A4 = matmul_small(A2, A2)
    A6 = matmul_small(A2, A4)
    U = matmul_small(
        As, matmul_small(A6, b[13] * A6 + b[11] * A4 + b[9] * A2)
        + b[7] * A6 + b[5] * A4 + b[3] * A2 + b[1] * eye)
    V = (matmul_small(A6, b[12] * A6 + b[10] * A4 + b[8] * A2)
         + b[6] * A6 + b[4] * A4 + b[2] * A2 + b[0] * eye)
    E = solve_small(V - U, V + U)
    for i in range(max_squarings):
        E = jnp.where(i < s, matmul_small(E, E), E)
    return E
