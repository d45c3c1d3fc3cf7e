"""Gather-free piecewise-polynomial tabulation of smooth speed schedules.

The reference recomputes speed-scheduled quantities exactly on every
speed change -- per-agent pole placement (reference dynamics.py:602-615),
the inverted-pendulum ZOH propagator via `ct.forced_response` (reference
vehicle.py:1810-1848), gain polynomials (reference parameters.py:1857-1892).
On TPU the natural "tabulate + interpolate" replacement (a [G, M] lookup
table) pays two per-agent ROW GATHERS per step, and TPU gathers cost per
row, not per byte -- at N = 1e5 the two gathers are ~75% of the optimizable
flagship step body (BASELINE.md "Gather-free piecewise-polynomial gains").

This module fits the schedule once at params-construction time as a
piecewise polynomial over a uniform speed-segment grid and evaluates it
with NO memory indirection at all: the coefficients are baked into the
compiled program as literal constants (the params field is static), so the
evaluation is a segment one-hot + Horner chain of pure [N]-wide VPU/MXU
work. Out-of-band speeds clamp to the band edge (the schedules' poles at
v -> 0 make below-band extrapolation meaningless; tests pin the clamp).

Layout convention (shared with params.br_gains_poly): the fit returns
``(coeffs, lo, seg_dv)`` where ``coeffs[s][(deg+1)*m + d]`` is the
degree-``d`` coefficient of output ``m`` on segment ``s``, in the local
coordinate u = (v - lo)/seg_dv - s in [0, 1], ascending degree.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def fit_piecewise_poly(sample_fn, lo, hi, n_seg, deg=5, per_seg=129):
    """Per-segment least-squares polynomial fit of a vector-valued map.

    ``sample_fn(vs: np.ndarray [K]) -> np.ndarray [K, M]`` is evaluated on
    ``n_seg * per_seg`` points tiling [lo, hi]; each segment gets an
    independent degree-``deg`` fit in its local coordinate. Raises if the
    sweep contains non-finite values (callers must choose a band clear of
    the schedule's poles). Returns ``(coeffs, lo, seg_dv)`` in the layout
    documented in the module docstring.
    """
    lo, hi = float(lo), float(hi)
    if not hi > lo:
        raise ValueError(f"piecewise fit needs hi > lo (got [{lo}, {hi}])")
    seg_dv = (hi - lo) / n_seg
    u = np.linspace(0.0, 1.0, per_seg)
    A = np.vander(u, deg + 1, increasing=True)
    vs = (lo + seg_dv * (np.arange(n_seg)[:, None] + u[None, :])).reshape(-1)
    Y = np.asarray(sample_fn(vs))
    if not np.isfinite(Y).all():
        raise ValueError(
            "piecewise fit sweep hit non-finite values inside the band "
            f"[{lo}, {hi}] -- raise the lower band edge clear of the "
            "schedule's poles")
    M = Y.shape[-1]
    Y = Y.reshape(n_seg, per_seg, M)
    coeffs = []
    for s in range(n_seg):
        c, *_ = np.linalg.lstsq(A, Y[s], rcond=None)   # [deg+1, M]
        coeffs.append(tuple(float(c[d, m])
                            for m in range(M) for d in range(deg + 1)))
    return (tuple(coeffs), lo, float(seg_dv))


def fit_error(poly, sample_fn, n_probe=1024, band=None):
    """Max relative L2 error of the fit against ``sample_fn`` on a dense
    probe grid (diagnostic; used by the error-bound tests)."""
    C, lo, seg_dv = poly
    S = len(C)
    lo_p, hi_p = band if band is not None else (lo, lo + S * seg_dv)
    vs = np.linspace(lo_p, hi_p - 1e-9, n_probe)
    Y = np.asarray(sample_fn(vs))
    M = Y.shape[-1]
    cols = eval_piecewise_poly(poly, jnp.asarray(vs), M)
    Yp = np.stack([np.asarray(c) for c in cols], axis=1)
    num = np.linalg.norm(Yp - Y, axis=1)
    den = np.maximum(np.linalg.norm(Y, axis=1), 1e-30)
    return float((num / den).max())


def eval_piecewise_poly(poly, v, n_out, form="matmul"):
    """Evaluate the fit at speeds ``v`` [N]; returns a list of ``n_out``
    [N] arrays (SoA -- callers stack or consume columns directly).

    Both forms are gather-free; the coefficients reach the program as
    literals because the params field holding ``poly`` is static:

    * ``"matmul"``: one [M*(deg+1), S] constant-matrix product with the
      [S, N] segment one-hot selects every agent's local coefficients in
      a single MXU dot (rows of the [M*(deg+1), N] result are contiguous
      [N] vectors -- the transposed-SoA orientation), then a Horner chain.
      O(1) HLO ops per output; preferred at wide M.
    * ``"select"``: per-coefficient masked-constant selection chains
      (S-1 jnp.where per coefficient), the original br_gains_poly form;
      fuses fully but emits M*(deg+1)*(S-1) ops -- fine at M ~ 5.
    """
    C, lo, seg_dv = poly
    S = len(C)
    D = len(C[0]) // n_out                     # deg + 1
    v = jnp.asarray(v)
    x = (v - lo) / seg_dv
    x = jnp.clip(x, 0.0, float(S) - 1e-6)
    idx = jnp.floor(x)
    u = x - idx

    if form == "matmul":
        onehot = (idx[None, :] == jnp.arange(S, dtype=idx.dtype)[:, None])
        Cm = jnp.asarray(np.asarray(C, dtype=np.float64).T, dtype=v.dtype)
        rows = Cm @ onehot.astype(v.dtype)     # [n_out*D, N]
        cols = []
        for m in range(n_out):
            acc = rows[D * m + D - 1]
            for d in range(D - 2, -1, -1):
                acc = acc * u + rows[D * m + d]
            cols.append(acc)
        return cols

    masks = [idx == s for s in range(1, S)]
    cols = []
    for m in range(n_out):
        acc = None
        for d in range(D - 1, -1, -1):
            cd = jnp.full_like(u, C[0][D * m + d])
            for s, msk in enumerate(masks, start=1):
                cd = jnp.where(msk, C[s][D * m + d], cd)
            acc = cd if acc is None else acc * u + cd
        cols.append(acc)
    return cols
