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

__all__ = ["matmul_small", "matvec_small", "solve_small"]


def matmul_small(A, B):
    """[n, n] @ [n, m] unrolled into static-index scalar ops (vmappable;
    under vmap every product is one [N]-wide elementwise op)."""
    n, m = A.shape[0], B.shape[1]
    cols = []
    for j in range(m):
        rows = []
        for i in range(n):
            acc = A[i, 0] * B[0, j]
            for k in range(1, n):
                acc = acc + A[i, k] * B[k, j]
            rows.append(acc)
        cols.append(jnp.stack(rows))
    return jnp.stack(cols, axis=1)


def matvec_small(A, x):
    """[n, n] @ [n] unrolled (vmappable)."""
    n = A.shape[0]
    rows = []
    for i in range(n):
        acc = A[i, 0] * x[0]
        for k in range(1, n):
            acc = acc + A[i, k] * x[k]
        rows.append(acc)
    return jnp.stack(rows)


def solve_small(A, b):
    """Solve A x = b by unrolled Gaussian elimination with branchless
    partial pivoting. A: [n, n]; b: [n] or [n, m]; returns x shaped like b.

    Pivot selection is an argmax + one-hot row swap (no dynamic gathers),
    so the vmapped form is pure elementwise VPU work. Rounding differs
    from LAPACK LU only through pivot-order ties; tests pin agreement to
    ~1e-12 (f64) / ~1e-5 (f32) against jnp.linalg.solve.
    """
    n = A.shape[0]
    vec = b.ndim == 1
    bb = b[:, None] if vec else b
    M = jnp.concatenate([A, bb], axis=1)          # [n, n + m]
    rows = jnp.arange(n)

    for k in range(n):
        # branchless partial pivot: pick the largest |M[i, k]|, i >= k
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
