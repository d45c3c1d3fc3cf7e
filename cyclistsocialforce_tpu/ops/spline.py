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
    zero = jnp.zeros((), dtype=t.dtype)

    # assemble A/rhs as stacked expressions: a ladder of .at[...].set
    # updates materializes (and copies) the full [N, m, m] batch once per
    # entry under vmap (~20 copies per fit, ~3 ms/step at N = 1e5)
    def row(entries):                     # {col: value} -> [m]
        return jnp.stack([entries.get(j, zero) for j in range(m)])

    rows = [row({0: 1.0 / h[0],           # not-a-knot at t[1]
                 1: -(1.0 / h[0] + 1.0 / h[1]),
                 2: 1.0 / h[1]})]
    for i in range(1, m - 1):             # C2 continuity at interior sites
        rows.append(row({i - 1: h[i - 1] / 6.0,
                         i: (h[i - 1] + h[i]) / 3.0,
                         i + 1: h[i] / 6.0}))
    rows.append(row({m - 3: 1.0 / h[m - 3],   # not-a-knot at t[m-2]
                     m - 2: -(1.0 / h[m - 3] + 1.0 / h[m - 2]),
                     m - 1: 1.0 / h[m - 2]}))
    A = jnp.stack(rows)

    zrow = jnp.zeros((y.shape[1],), dtype=y.dtype)
    rhs = jnp.stack(
        [zrow] + [(y[i + 1] - y[i]) / h[i] - (y[i] - y[i - 1]) / h[i - 1]
                  for i in range(1, m - 1)] + [zrow])

    # unrolled solve: batched tiny jnp.linalg.solve serializes on TPU
    # (~165 ms/step at N=8k for the spline destination force; see
    # ops/smallmat.py)
    from cyclistsocialforce_tpu.ops.smallmat import solve_small

    # no-pivot: the moment system eliminates stably in order for valid
    # chord parameters; degenerate (duplicate-point) inputs yield
    # NaN/inf either way and take the caller's straight-line fallback
    return solve_small(A, rhs, pivot=False)


def _masked_sites(pts6, m):
    """Shared masked-fit preamble: chord sites t [6] (padded sites
    continue increasing past 1 so the interval search never selects
    them) and interval widths h [5] for a runtime valid count m."""
    dtype = pts6.dtype
    idx = jnp.arange(6)
    seg = jnp.sqrt(jnp.sum(jnp.diff(pts6, axis=0) ** 2, axis=1))
    seg = jnp.where(idx[:5] < m - 1, seg, 0.0)
    cum = jnp.cumsum(seg)
    total = cum[-1]                     # = chord length of the valid run
    u = jnp.concatenate([jnp.zeros((1,), dtype), cum]) / total
    t = jnp.where(idx < m, u, (idx - m + 2).astype(dtype))
    return t, jnp.diff(t)


def _interval_pieces(t, y, M, q):
    """Interval selection shared by spline_eval / eval_positions.

    Index via comparisons + ONE fused one-hot contraction: dynamic
    gathers of tiny rows (h[k], M[k], ...) serialize under vmap on TPU,
    and seven separate one-hot takes each materialize a [Q, m, .]
    product -- one [m-1, 3+4d] side table cuts the traffic. STRICT
    inequality: a query exactly at a site evaluates the interval ENDING
    there (identical by C2 continuity at interior sites) -- with the
    masked fixed-size fits the final valid site t = 1 must NOT select
    the zero-moment padding interval beyond it (its derivatives are
    garbage).

    Returns (hk [Q,1], t1, t2, Mk, Mk1, yk, yk1).
    """
    m = t.shape[0]
    d = y.shape[1]
    h = jnp.diff(t)
    k = jnp.clip(jnp.sum(q[:, None] > t[None, :], axis=1) - 1, 0, m - 2)
    oh = (k[:, None] == jnp.arange(m - 1)[None, :]).astype(t.dtype)
    table = jnp.concatenate(
        [h[:, None], t[1:, None], t[:-1, None],
         M[:-1], M[1:], y[:-1], y[1:]], axis=1)      # [m-1, 3 + 4d]
    sel = jnp.sum(oh[:, :, None] * table[None, :, :], axis=1)
    hk = sel[:, 0:1]
    t1 = sel[:, 1:2] - q[:, None]        # distance to right site
    t2 = q[:, None] - sel[:, 2:3]
    Mk, Mk1 = sel[:, 3:3 + d], sel[:, 3 + d:3 + 2 * d]
    yk, yk1 = sel[:, 3 + 2 * d:3 + 3 * d], sel[:, 3 + 3 * d:3 + 4 * d]
    return hk, t1, t2, Mk, Mk1, yk, yk1


def spline_eval(t, y, M, q):
    """Evaluate the cubic spline (sites t [m], values y [m, d], moments M)
    and its first two derivatives at queries q [Q].

    Returns (S, dS, d2S), each [Q, d].
    """
    hk, t1, t2, Mk, Mk1, yk, yk1 = _interval_pieces(t, y, M, q)
    a = yk / hk - Mk * hk / 6.0
    b = yk1 / hk - Mk1 * hk / 6.0
    S = (Mk * t1**3 + Mk1 * t2**3) / (6.0 * hk) + a * t1 + b * t2
    dS = (-Mk * t1**2 + Mk1 * t2**2) / (2.0 * hk) - a + b
    d2S = (Mk * t1 + Mk1 * t2) / hk
    return S, dS, d2S


def fit_masked(pts6, m):
    """Chord-parameterized not-a-knot fit over a FIXED-size [6, 2] point
    array with a RUNTIME valid count m in {4, 5, 6} (rows >= m ignored).

    The destination-force spline needs 4, 5 or 6 support points depending
    on queue state (reference vehicle.py:1443-1492). Under vmap a
    lax.switch over three m-sized fits evaluates ALL branches per agent
    (plus a fourth fit for the last-destination branch) -- ~3.5x the
    arithmetic of this single masked 6x6 system, and the dominant cost of
    the twod/invpendulum models at N = 1e5. Masking layout:

      * sites: u[i] for i < m (padded sites continue increasing past 1 so
        the interval search never selects them);
      * matrix rows: 0 = not-a-knot at t[1] (always; m >= 4),
        i in 1..4 = C2-continuity if i <= m-2, the second not-a-knot row
        if i == m-1, identity (M_i = 0) if i >= m; row 5 likewise;
      * the identity tail keeps the no-pivot elimination exact: those
        rows have a unit pivot and zeros below/left.

    Returns (t [6], M [6, 2]) for `spline_eval`. Padded point rows must be
    FINITE (any value); degenerate (duplicate) valid points yield
    non-finite results exactly like the per-size fits -- the caller's
    straight-line fallback catches them.
    """
    dtype = pts6.dtype
    idx = jnp.arange(6)
    t, h = _masked_sites(pts6, m)

    inv_h = 1.0 / h
    zero6 = jnp.zeros((6,), dtype)

    def e(i, val):
        return jnp.where(idx == i, val, 0.0)

    # row 0: not-a-knot at t[1] (m >= 4 always)
    rows = [e(0, inv_h[0]) + e(1, -(inv_h[0] + inv_h[1])) + e(2, inv_h[1])]
    for i in range(1, 6):
        interior = (e(i - 1, h[i - 1] / 6.0)
                    + e(i, (h[i - 1] + h[i % 5]) / 3.0)
                    + e(i + 1, h[i % 5] / 6.0)) if i < 5 else zero6
        nak = (e(i - 2, inv_h[i - 2])
               + e(i - 1, -(inv_h[i - 2] + inv_h[i - 1]))
               + e(i, inv_h[i - 1]))
        ident = e(i, 1.0)
        row = jnp.where(i <= m - 2, interior,
                        jnp.where(i == m - 1, nak, ident))
        rows.append(row)
    A = jnp.stack(rows)                                            # [6, 6]

    dd = ((pts6[2:] - pts6[1:-1]) / h[1:, None]
          - (pts6[1:-1] - pts6[:-2]) / h[:-1, None])               # [4, 2]
    interior_mask = (idx[1:5] <= m - 2)[:, None]
    rhs = jnp.concatenate([
        jnp.zeros((1, 2), dtype),
        jnp.where(interior_mask, dd, 0.0),
        jnp.zeros((1, 2), dtype)])                                 # [6, 2]

    from cyclistsocialforce_tpu.ops.smallmat import solve_small

    M = solve_small(A, rhs, pivot=False)
    return t, M


def fit_masked_banded(pts6, m):
    """`fit_masked` through the not-a-knot system's BANDED structure.

    The moment system is tridiagonal in the interior plus one
    three-entry not-a-knot row at each end; eliminating the end moments
    analytically leaves a <=4-unknown tridiagonal system solved by an
    unrolled Thomas sweep -- ~1/3 the vmapped op count of the general
    masked 6x6 elimination (which is pure bandwidth at N = 1e5).
    Same returns/degeneracy semantics as `fit_masked`; agreement is
    pinned by tests/test_parity_twod.py and a direct equivalence test.

    Masking layout: unknowns are the interior moments M[1..m-2]
    (slots 0..3); slot i is live when i <= m - 3. The end rows give
        M[0]     = p1 M[1]     + p2 M[2]
        M[m-1]   = q1 M[m-2]   + q2 M[m-3]
    which fold into the first/last live interior rows.
    """
    dtype = pts6.dtype
    idx = jnp.arange(6)
    t, h = _masked_sites(pts6, m)

    # end-moment relations from the two not-a-knot rows
    #   row0:    M0/h0 - (1/h0 + 1/h1) M1 + M2/h1 = 0
    p1 = (h[0] + h[1]) / h[1]            # = h0 (1/h0 + 1/h1)
    p2 = -h[0] / h[1]
    #   row m-1: M[m-3]/h[m-3] - (1/h[m-3] + 1/h[m-2]) M[m-2]
    #            + M[m-1]/h[m-2] = 0
    def at(v, k):                         # one-hot take from [5] h-vector
        return jnp.sum(jnp.where(jnp.arange(5) == k, v, 0.0))

    h_m3 = at(h, m - 3)
    h_m2 = at(h, m - 2)
    q1 = (h_m3 + h_m2) / h_m3            # coeff of M[m-2]
    q2 = -h_m2 / h_m3                    # coeff of M[m-3]

    # interior rows i = 1..m-2 (unknown slots s = i-1 = 0..m-3):
    #   h[i-1]/6 M[i-1] + (h[i-1]+h[i])/3 M[i] + h[i]/6 M[i+1] = dd[i]
    dd = ((pts6[2:] - pts6[1:-1]) / h[1:, None]
          - (pts6[1:-1] - pts6[:-2]) / h[:-1, None])             # [4, 2]

    live = idx[:4] <= m - 3                                      # [4]
    a = jnp.where(live, h[:4] / 6.0, 0.0)        # sub-diag (M[i-1])
    b = jnp.where(live, (h[:4] + h[1:5]) / 3.0, 1.0)
    c = jnp.where(live, h[1:5] / 6.0, 0.0)       # super-diag (M[i+1])
    d = jnp.where(live[:, None], dd, 0.0)

    # fold the end relations into the first and last LIVE rows:
    #   slot 0 (i = 1): M0 = p1 M1 + p2 M2 -> b0 += a0 p1, c0 += a0 p2
    #   slot m-3:       M[m-1] = q1 M[m-2] + q2 M[m-3]
    #                   -> b_last += c_last q1, a_last += c_last q2
    is_last = idx[:4] == m - 3
    b = b.at[0].add(a[0] * p1)
    c = c.at[0].add(a[0] * p2)
    b = b + jnp.where(is_last, c * q1, 0.0)
    a = a + jnp.where(is_last, c * q2, 0.0)
    c = jnp.where(is_last, 0.0, c)
    a = a.at[0].set(0.0)

    # unrolled Thomas sweep over the 4 slots (dead slots are identity)
    cp0 = c[0] / b[0]
    dp0 = d[0] / b[0]
    cp1 = c[1] / (b[1] - a[1] * cp0)
    dp1 = (d[1] - a[1] * dp0) / (b[1] - a[1] * cp0)
    cp2 = c[2] / (b[2] - a[2] * cp1)
    dp2 = (d[2] - a[2] * dp1) / (b[2] - a[2] * cp1)
    dp3 = (d[3] - a[3] * dp2) / (b[3] - a[3] * cp2)
    m3 = dp3
    m2 = dp2 - cp2 * m3
    m1 = dp1 - cp1 * m2
    m0 = dp0 - cp0 * m1
    Mi = jnp.stack([m0, m1, m2, m3])                             # [4, 2]
    Mi = jnp.where(live[:, None], Mi, 0.0)

    M = jnp.zeros((6, 2), dtype).at[1:5].set(Mi)
    M = M.at[0].set(p1 * M[1] + p2 * M[2])
    # M[m-1] = q1 M[m-2] + q2 M[m-3] via one-hot scatter
    M_m2 = jnp.sum(jnp.where((idx == m - 2)[:, None], M, 0.0), axis=0)
    M_m3 = jnp.sum(jnp.where((idx == m - 3)[:, None], M, 0.0), axis=0)
    M_end = q1 * M_m2 + q2 * M_m3
    M = jnp.where((idx == m - 1)[:, None], M_end[None, :], M)
    return t, M


def eval_positions(t, y, M, q):
    """Positions S [Q, d] only (no derivatives) -- the cheap pass that
    feeds the nearest-sample search of the last-destination branch."""
    hk, t1, t2, Mk, Mk1, yk, yk1 = _interval_pieces(t, y, M, q)
    a = yk / hk - Mk * hk / 6.0
    b = yk1 / hk - Mk1 * hk / 6.0
    return (Mk * t1**3 + Mk1 * t2**3) / (6.0 * hk) + a * t1 + b * t2


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
