"""Tabulated gain schedule for the balancing rider (opt-in perf knob).

K(v) from deterministic pole features is a smooth pure function of speed,
so `BalancingRiderParams.create(gains_lut=G)` precomputes it on a uniform
grid and the step interpolates linearly instead of running the per-agent
Ackermann placement (reference dynamics.py:602-615 computes it exactly on
every speed change; the default path here does too)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclistsocialforce_tpu import Engine, make_state
from cyclistsocialforce_tpu.models import MODELS
from cyclistsocialforce_tpu.models import balancingrider as BR
from cyclistsocialforce_tpu.params import BalancingRiderParams, as_population


def test_lut_matches_exact_gains_in_stable_band():
    """Relative gain error below 1e-5 for v in the stable band
    [2.5, v_max] (the model is physically meaningful there; the plant is
    uncontrollable at v = 0 exactly, where the reference's ct.place
    fails too)."""
    p = BalancingRiderParams.create(verbose=False)
    pl = BalancingRiderParams.create(gains_lut=4096, verbose=False)
    tab, v0, dv = pl.br_gains_lut
    assert np.all(np.isfinite(tab))          # v = 0 row repaired

    vs = np.linspace(2.5, 10.0, 311)
    A0, A1, A2, B, _ = BR._sysmats(p, len(vs), jnp.float64)
    lin = jnp.asarray(p.br_pole_lin)
    feats = lin[None, :, 0] + lin[None, :, 1] * jnp.asarray(vs)[:, None]
    K = np.asarray(jax.vmap(BR._gains_at, in_axes=(None, 0, 0, 0, 0, 0, 0))(
        p, A0, A1, A2, B, feats, jnp.asarray(vs)))

    t = (vs - v0) / dv
    i0 = np.clip(np.floor(t).astype(int), 0, tab.shape[0] - 2)
    w = (t - i0)[:, None]
    K_lut = tab[i0] * (1 - w) + tab[i0 + 1] * w
    err = np.linalg.norm(K_lut - K, axis=1) / np.linalg.norm(K, axis=1)
    assert err.max() < 1e-5, err.max()


def test_lut_trajectories_match_exact():
    """End-to-end: LUT and exact gain paths produce the same riding
    trajectories (sub-mm over 2 s at stable speeds)."""
    rng = np.random.default_rng(4)
    n = 64
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, 80, n)
    s0[:, 1] = rng.uniform(0, 80, n)
    s0[:, 2] = rng.uniform(-0.3, 0.3, n)
    s0[:, 3] = rng.uniform(4, 6, n)
    st = make_state(s0, dtype=np.float64)
    dst = np.zeros((n, 3))
    dst[:, 0] = s0[:, 0] + 100
    dst[:, 1] = s0[:, 1]
    st = st.replace(dest=jnp.asarray(dst),
                    destqueue=st.destqueue.at[:, 0, :].set(jnp.asarray(dst)))
    m = MODELS["balancingrider"]
    finals = {}
    for tag, p in (("exact", BalancingRiderParams.create(verbose=False)),
                   ("lut", BalancingRiderParams.create(gains_lut=4096,
                                                       verbose=False))):
        pp = as_population(p, n)
        eng = Engine.create(pp, m)
        f, _ = jax.jit(lambda s, e=eng: e.simulate(s, 200, record=False))(
            m.prepare(pp, st))
        finals[tag] = np.asarray(f.s)
    dev = np.max(np.abs(finals["lut"][:, :2] - finals["exact"][:, :2]))
    assert dev < 1e-3, dev


def test_ackermann_basis_identity():
    """`ackermann(A, B, coeffs)` equals `coeffs @ ackermann_basis(A, B)`
    for arbitrary monic polynomials: K is linear in the characteristic
    coefficients (the Horner recursion in ops.control.ackermann), which
    is what lets stochastic mode tabulate only the speed axis."""
    from cyclistsocialforce_tpu.models import balancingrider as BR
    from cyclistsocialforce_tpu.ops.control import (
        ackermann, ackermann_basis, charpoly_from_pole_features)

    p = BalancingRiderParams.create(verbose=False)
    A0 = np.asarray(p.br_A0)
    A1 = np.asarray(p.br_A1)
    A2 = np.asarray(p.br_A2)
    B = jnp.asarray(p.br_B)
    rng = np.random.default_rng(0)
    for v in (1.0, 3.3, 5.7, 8.2):
        A = jnp.asarray(A0 + v * A1 + v * v * A2)
        M = ackermann_basis(A, B)
        for _ in range(4):
            c = charpoly_from_pole_features(
                jnp.asarray(rng.uniform(0.5, 6.0, size=5)))
            K_exact = ackermann(A, B, c)
            rel = (jnp.max(jnp.abs(c @ M - K_exact))
                   / jnp.max(jnp.abs(K_exact)))
            assert float(rel) < 1e-10, float(rel)


def test_stochastic_basis_lut_error_bound():
    """Stochastic mode + gains_lut tabulates the Ackermann coefficient
    BASIS M(v) [6, 5] (params.br_ackermann_lut); per-agent gains are
    charpoly(feats) @ M(v). Relative error below 1e-5 in the stable band
    [2.5, v_max] for random feature draws (the plant is uncontrollable at
    v = 0 exactly, like the deterministic table)."""
    from cyclistsocialforce_tpu.ops.control import (
        ackermann, charpoly_from_pole_features)

    p = BalancingRiderParams.create(verbose=False)
    ps = BalancingRiderParams.create(stochastic_control_behavior=True,
                                     gains_lut=4096, verbose=False)
    assert ps.br_gains_lut is None
    tab, v0, dv = ps.br_ackermann_lut
    assert np.all(np.isfinite(tab))          # v = 0 rows repaired
    A0 = np.asarray(p.br_A0)
    A1 = np.asarray(p.br_A1)
    A2 = np.asarray(p.br_A2)
    B = jnp.asarray(p.br_B)

    rng = np.random.default_rng(1)
    worst = 0.0
    for v in np.linspace(2.5, 10.0, 101):
        t = np.clip((v - v0) / dv, 0.0, tab.shape[0] - 1.0)
        i0 = int(np.clip(np.floor(t), 0, tab.shape[0] - 2))
        Mv = jnp.asarray(tab[i0] * (1 - (t - i0)) + tab[i0 + 1] * (t - i0))
        A = jnp.asarray(A0 + v * A1 + v * v * A2)
        for _ in range(3):
            c = charpoly_from_pole_features(
                jnp.asarray(rng.uniform(0.5, 6.0, size=5)))
            K_exact = np.asarray(ackermann(A, B, c))
            K_lut = np.asarray(c @ Mv)
            worst = max(worst, np.linalg.norm(K_lut - K_exact)
                        / np.linalg.norm(K_exact))
    assert worst < 1e-5, worst


@pytest.mark.slow
def test_stochastic_basis_lut_trajectories_match_exact():
    """End-to-end: with the same RNG seed (identical pole-feature draws),
    the basis-LUT and exact stochastic gain paths ride the same
    trajectories."""
    rng = np.random.default_rng(5)
    n = 48
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, 80, n)
    s0[:, 1] = rng.uniform(0, 80, n)
    s0[:, 2] = rng.uniform(-0.3, 0.3, n)
    s0[:, 3] = rng.uniform(4, 6, n)
    dst = np.zeros((n, 3))
    dst[:, 0] = s0[:, 0] + 100
    dst[:, 1] = s0[:, 1]
    m = MODELS["balancingrider"]
    finals = {}
    for tag, p in (
            ("exact", BalancingRiderParams.create(
                stochastic_control_behavior=True, verbose=False)),
            ("lut", BalancingRiderParams.create(
                stochastic_control_behavior=True, gains_lut=4096,
                verbose=False))):
        st = make_state(s0, dtype=np.float64, seed=7)
        st = st.replace(dest=jnp.asarray(dst),
                        destqueue=st.destqueue.at[:, 0, :].set(
                            jnp.asarray(dst)))
        pp = as_population(p, n)
        eng = Engine.create(pp, m)
        f, _ = jax.jit(lambda s, e=eng: e.simulate(s, 150, record=False))(
            m.prepare(pp, st))
        finals[tag] = np.asarray(f.s)
    dev = np.max(np.abs(finals["lut"][:, :2] - finals["exact"][:, :2]))
    assert dev < 1e-3, dev


def test_invpendulum_zoh_lut_error_bound():
    """The tabulated ZOH propagator (InvPendulumBicycleParams.create
    zoh_lut=G) matches the exact per-speed expm to ~1e-6 elementwise over
    the speed band the riding branch consumes (v >= v_max_walk - a_max*t_s;
    below it the walking branch overrides the dynamics)."""
    from cyclistsocialforce_tpu.models import invpendulum as IP
    from cyclistsocialforce_tpu.ops.smallmat import expm_small
    from cyclistsocialforce_tpu.params import InvPendulumBicycleParams

    p = InvPendulumBicycleParams.create(zoh_lut=4096)
    tab, v0, dv = p.ip_zoh_lut
    assert np.all(np.isfinite(tab))          # singular rows repaired

    vs = np.linspace(1.45, 7.0, 257)
    t_s = float(np.asarray(p.t_s))
    pb = {f: jnp.asarray(float(np.asarray(getattr(p, f))))
          for f in ("l", "l_2", "g", "tau_1_squared", "c_steer",
                    "i_steer_vertvert")}

    def e_at(v):
        K_x, K_u = p.fullstate_feedback_gains(v)
        A, B = IP.openloop_matrices(pb, v)
        Acl = A - B[:, None] * K_x[None, :]
        aug = (jnp.zeros((6, 6), dtype=A.dtype)
               .at[:5, :5].set(Acl * t_s).at[:5, 5].set(K_u * B * t_s))
        E = expm_small(aug)
        return jnp.concatenate([E[:5, :5].reshape(25), E[:5, 5]])

    exact = np.asarray(jax.vmap(e_at)(jnp.asarray(vs)))
    t = (vs - v0) / dv
    i0 = np.clip(np.floor(t).astype(int), 0, tab.shape[0] - 2)
    w = (t - i0)[:, None]
    lut = tab[i0] * (1 - w) + tab[i0 + 1] * w
    # relative per speed: the propagator entries scale like the gains
    # (~1/v^3, up to ~4e2 near the walking boundary), so a fixed absolute
    # bound would be dominated by the largest (and least-consumed) rows
    err = (np.abs(lut - exact).max(axis=1)
           / np.abs(exact).max(axis=1))
    assert err.max() < 5e-5, err.max()


@pytest.mark.slow
def test_invpendulum_zoh_lut_trajectories_match_exact():
    """End-to-end: the LUT and exact expm paths produce the same riding
    trajectories (sub-mm over 2 s)."""
    from cyclistsocialforce_tpu.params import InvPendulumBicycleParams

    rng = np.random.default_rng(6)
    n = 32
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, 80, n)
    s0[:, 1] = rng.uniform(0, 80, n)
    s0[:, 2] = rng.uniform(-0.3, 0.3, n)
    s0[:, 3] = rng.uniform(4, 6, n)
    st = make_state(s0, dtype=np.float64, hist_len=128)
    dst = np.zeros((n, 3))
    dst[:, 0] = s0[:, 0] + 100
    dst[:, 1] = s0[:, 1]
    st = st.replace(dest=jnp.asarray(dst),
                    destqueue=st.destqueue.at[:, 0, :].set(jnp.asarray(dst)))
    m = MODELS["invpendulum"]
    finals = {}
    for tag, p in (("exact", InvPendulumBicycleParams.create()),
                   ("lut", InvPendulumBicycleParams.create(zoh_lut=4096))):
        pp = as_population(p, n)
        eng = Engine.create(pp, m)
        f, _ = jax.jit(lambda s, e=eng: e.simulate(s, 200, record=False))(
            m.prepare(pp, st))
        finals[tag] = np.asarray(f.s)
    dev = np.max(np.abs(finals["lut"][:, :2] - finals["exact"][:, :2]))
    assert dev < 1e-3, dev


def test_prop_lut_rows_match_direct_construction():
    """Each [G, 40] row is [P | Q | R | K] with P = M^-1 (I + h/2 Acl),
    Q = M^-1 h B, R = M^-1 h B_roll, M = I - h/2 Acl, Acl = A(v) - B K(v)
    -- rebuilt here independently at a few grid speeds."""
    p = BalancingRiderParams.create(prop_lut=512, verbose=False)
    tab, v0, dv = p.br_prop_lut
    assert tab.shape == (512, 40) and np.all(np.isfinite(tab))
    h = float(np.asarray(p.t_s))
    A0, A1, A2 = (np.asarray(p.br_A0), np.asarray(p.br_A1),
                  np.asarray(p.br_A2))
    B, B_roll = np.asarray(p.br_B), np.asarray(p.br_B_roll)
    for g in (200, 350, 511):
        v = v0 + g * dv
        K = tab[g, 35:40]
        A = A0 + v * A1 + v * v * A2
        Acl = A - np.outer(B, K)
        M = np.eye(5) - (h / 2.0) * Acl
        P = np.linalg.solve(M, np.eye(5) + (h / 2.0) * Acl)
        Q = np.linalg.solve(M, h * B)
        R = np.linalg.solve(M, h * B_roll)
        np.testing.assert_allclose(tab[g, :25], P.reshape(25), rtol=1e-12)
        np.testing.assert_allclose(tab[g, 25:30], Q, rtol=1e-12)
        np.testing.assert_allclose(tab[g, 30:35], R, rtol=1e-12)


@pytest.mark.slow
@pytest.mark.parametrize("mode", [dict(prop_lut=4096), dict(prop_poly=16)])
def test_prop_trajectories_match_exact(mode):
    """End-to-end: both propagator modes (tabulated prop_lut and the
    gather-free piecewise-quintic prop_poly) stay on the exact path's
    trajectory within the band (the propagator folds in BOTH the K(v)
    interpolation and the dropped stale-gain quirk; measured deviation
    ~7e-6 m over 300 steps in isolation, sub-0.1 mm here over a
    200-step simulate). prop_poly is additionally a STATIC field (no
    pytree leaves), so it compiles to constants."""
    rng = np.random.default_rng(11)
    n = 64
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, 80, n)
    s0[:, 1] = rng.uniform(0, 80, n)
    s0[:, 2] = rng.uniform(-0.3, 0.3, n)
    s0[:, 3] = rng.uniform(4, 6, n)
    st = make_state(s0, dtype=np.float64)
    dst = np.zeros((n, 3))
    dst[:, 0] = s0[:, 0] + 100
    dst[:, 1] = s0[:, 1]
    st = st.replace(dest=jnp.asarray(dst),
                    destqueue=st.destqueue.at[:, 0, :].set(jnp.asarray(dst)))
    m = MODELS["balancingrider"]
    finals = {}
    p_exact = BalancingRiderParams.create(verbose=False)
    p_prop = BalancingRiderParams.create(verbose=False, **mode)
    for tag, p in (("exact", p_exact), ("prop", p_prop)):
        pp = as_population(p, n)
        eng = Engine.create(pp, m)
        f, _ = jax.jit(lambda s, e=eng: e.simulate(s, 200, record=False))(
            m.prepare(pp, st))
        finals[tag] = np.asarray(f.s)
    dev = np.max(np.abs(finals["prop"][:, :2] - finals["exact"][:, :2]))
    assert dev < 1e-3, dev
    if "prop_poly" in mode:
        # static field: zero pytree leaves added by the poly
        assert len(jax.tree.leaves(p_prop)) == len(jax.tree.leaves(p_exact))


def test_prop_poly_below_band_stays_stable():
    """prop_poly clamps the WHOLE propagator (incl. the open-loop A(v)
    yaw coupling) at the band edge for v_mid < 2 m/s -- a stronger
    deviation than gains_poly (documented in the step branch). The
    clamped propagator is a fixed stable discrete system: sub-band
    excursions must stay finite with bounded roll."""
    n = 16
    rng = np.random.default_rng(3)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, 40, n)
    s0[:, 1] = rng.uniform(0, 40, n)
    s0[:, 3] = rng.uniform(0.5, 1.5, n)    # below the fit band
    st = make_state(s0, dtype=np.float64)
    dst = np.c_[s0[:, 0] + 60, s0[:, 1], np.zeros(n)]
    st = st.replace(dest=jnp.asarray(dst),
                    destqueue=st.destqueue.at[:, 0, :].set(jnp.asarray(dst)))
    m = MODELS["balancingrider"]
    pp = as_population(BalancingRiderParams.create(prop_poly=16,
                                                   verbose=False), n)
    eng = Engine.create(pp, m)
    f, traj = jax.jit(lambda s: eng.simulate(s, 300))(m.prepare(pp, st))
    traj = np.asarray(traj)
    assert np.all(np.isfinite(traj))
    assert np.max(np.abs(traj[:, :, 5])) < np.pi / 3   # roll bounded


def test_prop_lut_rejects_stochastic_mode():
    """Acl depends on per-agent pole features in stochastic mode -- a
    speed-only propagator table would be wrong, so create() refuses;
    passing BOTH propagator modes is also refused (step() would
    silently prefer prop_poly)."""
    with pytest.raises(ValueError, match="prop"):
        BalancingRiderParams.create(prop_lut=256, verbose=False,
                                    stochastic_control_behavior=True)
    with pytest.raises(ValueError, match="prop"):
        BalancingRiderParams.create(prop_poly=16, verbose=False,
                                    stochastic_control_behavior=True)
    with pytest.raises(ValueError, match="alternative"):
        BalancingRiderParams.create(prop_lut=256, prop_poly=16,
                                    verbose=False)


def test_prop_lut_shared_across_population():
    """`as_population` must not broadcast the table to [n, G, 40]."""
    p = BalancingRiderParams.create(prop_lut=256, verbose=False)
    pp = as_population(p, 16)
    assert pp.br_prop_lut[0].shape == (256, 40)


def test_gains_poly_matches_exact_gains_in_band():
    """Piecewise-quintic gains (S = 16 segments on [2, 10]) match the
    exact Ackermann gains to ~1e-4 relative across the fit band,
    evaluated exactly the way the step's masked-FMA + Horner chain
    does."""
    p = BalancingRiderParams.create(verbose=False)
    pq = BalancingRiderParams.create(gains_poly=16, verbose=False)
    C, v_lo, seg_dv = pq.br_gains_poly
    S = len(C)
    assert S == 16 and len(C[0]) == 30

    vs = np.linspace(v_lo + 1e-9, v_lo + S * seg_dv - 1e-9, 307)
    A0, A1, A2, B, _ = BR._sysmats(p, len(vs), jnp.float64)
    lin = jnp.asarray(p.br_pole_lin)
    feats = lin[None, :, 0] + lin[None, :, 1] * jnp.asarray(vs)[:, None]
    K = np.asarray(jax.vmap(BR._gains_at, in_axes=(None, 0, 0, 0, 0, 0, 0))(
        p, A0, A1, A2, B, feats, jnp.asarray(vs)))

    x = np.clip((vs - v_lo) / seg_dv, 0.0, S - 1e-6)
    idx = np.floor(x).astype(int)
    u = x - idx
    K_poly = np.empty_like(K)
    for k in range(5):
        acc = np.zeros_like(u)
        for d in (5, 4, 3, 2, 1, 0):
            cd = np.array([C[s][6 * k + d] for s in idx])
            acc = acc * u + cd
        K_poly[:, k] = acc
    rel = np.abs(K_poly - K) / np.maximum(np.abs(K), 1e-2)
    assert rel.max() < 2e-4, rel.max()


def test_gains_poly_trajectories_match_exact():
    """End-to-end at riding speeds (4-6 m/s, inside the fit band): the
    poly path stays on the exact path's trajectory."""
    rng = np.random.default_rng(13)
    n = 64
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, 80, n)
    s0[:, 1] = rng.uniform(0, 80, n)
    s0[:, 2] = rng.uniform(-0.3, 0.3, n)
    s0[:, 3] = rng.uniform(4, 6, n)
    st = make_state(s0, dtype=np.float64)
    dst = np.zeros((n, 3))
    dst[:, 0] = s0[:, 0] + 100
    dst[:, 1] = s0[:, 1]
    st = st.replace(dest=jnp.asarray(dst),
                    destqueue=st.destqueue.at[:, 0, :].set(jnp.asarray(dst)))
    m = MODELS["balancingrider"]
    finals = {}
    for tag, p in (("exact", BalancingRiderParams.create(verbose=False)),
                   ("poly", BalancingRiderParams.create(gains_poly=16,
                                                        verbose=False))):
        pp = as_population(p, n)
        eng = Engine.create(pp, m)
        f, _ = jax.jit(lambda s, e=eng: e.simulate(s, 200, record=False))(
            m.prepare(pp, st))
        finals[tag] = np.asarray(f.s)
    dev = np.max(np.abs(finals["poly"][:, :2] - finals["exact"][:, :2]))
    assert dev < 1e-3, dev


def test_gains_poly_below_band_clamps_and_stays_finite():
    """Speeds below the fit band (v < 2) use the band-edge gains (a
    documented semantic deviation: the exact gains there belong to an
    uncontrollable plant). The step must stay finite."""
    p = BalancingRiderParams.create(gains_poly=16, verbose=False)
    n = 8
    s0 = np.zeros((n, 5))
    s0[:, 3] = np.linspace(0.2, 1.8, n)
    st = make_state(s0, dtype=np.float64)
    dst = np.zeros((n, 3))
    dst[:, 0] = 50.0
    st = st.replace(dest=jnp.asarray(dst),
                    destqueue=st.destqueue.at[:, 0, :].set(jnp.asarray(dst)))
    m = MODELS["balancingrider"]
    pp = as_population(p, n)
    eng = Engine.create(pp, m)
    f, _ = jax.jit(lambda s: eng.simulate(s, 50, record=False))(
        m.prepare(pp, st))
    assert np.all(np.isfinite(np.asarray(f.s)))


def test_stochastic_basis_poly_error_bound():
    """Stochastic mode + gains_poly fits the Ackermann coefficient BASIS
    M(v) [6, 5] piecewise-quintically (params.br_ackermann_poly) instead
    of tabulating it; per-agent gains stay charpoly(feats) @ M(v). The
    fit matches the exact basis to ~1e-4 relative across the band, and
    deterministic br_gains_poly stays unset."""
    from cyclistsocialforce_tpu.ops.control import ackermann_basis
    from cyclistsocialforce_tpu.ops.piecewise import fit_error

    ps = BalancingRiderParams.create(stochastic_control_behavior=True,
                                     gains_poly=16, verbose=False)
    assert ps.br_gains_poly is None
    C, v_lo, seg_dv = ps.br_ackermann_poly
    assert len(C) == 16 and len(C[0]) == 180

    A0 = np.asarray(ps.br_A0)
    A1 = np.asarray(ps.br_A1)
    A2 = np.asarray(ps.br_A2)
    B = jnp.asarray(ps.br_B)

    def m_sweep(vs):
        return np.array(jax.vmap(
            lambda v: ackermann_basis(
                jnp.asarray(A0 + v * A1 + v * v * A2), B).reshape(30)
        )(jnp.asarray(vs)))

    assert fit_error(ps.br_ackermann_poly, m_sweep) < 1e-4


@pytest.mark.slow
def test_stochastic_basis_poly_trajectories_match_exact():
    """End-to-end: with the same RNG seed (identical pole-feature draws),
    the basis-poly and exact stochastic gain paths ride the same
    trajectories at in-band speeds."""
    rng = np.random.default_rng(17)
    n = 48
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, 80, n)
    s0[:, 1] = rng.uniform(0, 80, n)
    s0[:, 2] = rng.uniform(-0.3, 0.3, n)
    s0[:, 3] = rng.uniform(4, 6, n)
    dst = np.zeros((n, 3))
    dst[:, 0] = s0[:, 0] + 100
    dst[:, 1] = s0[:, 1]
    m = MODELS["balancingrider"]
    finals = {}
    for tag, p in (
            ("exact", BalancingRiderParams.create(
                stochastic_control_behavior=True, verbose=False)),
            ("poly", BalancingRiderParams.create(
                stochastic_control_behavior=True, gains_poly=16,
                verbose=False))):
        st = make_state(s0, dtype=np.float64, seed=7)
        st = st.replace(dest=jnp.asarray(dst),
                        destqueue=st.destqueue.at[:, 0, :].set(
                            jnp.asarray(dst)))
        pp = as_population(p, n)
        eng = Engine.create(pp, m)
        f, _ = jax.jit(lambda s, e=eng: e.simulate(s, 150, record=False))(
            m.prepare(pp, st))
        finals[tag] = np.asarray(f.s)
    dev = np.max(np.abs(finals["poly"][:, :2] - finals["exact"][:, :2]))
    assert dev < 1e-3, dev


def test_invpendulum_zoh_poly_error_bound():
    """The piecewise-quintic ZOH propagator (zoh_poly=32) matches the
    exact per-speed expm sweep to ~1e-5 relative over the speed band the
    riding branch consumes (v >= v_max_walk - |a_lo| t_s ~ 1.47; below
    the fit band speeds clamp to the edge and only the masked walking
    branch sees them)."""
    from cyclistsocialforce_tpu.ops.piecewise import fit_error
    from cyclistsocialforce_tpu.params import InvPendulumBicycleParams

    p = InvPendulumBicycleParams.create(zoh_poly=32)
    C, v_lo, seg_dv = p.ip_zoh_poly
    assert len(C) == 32 and len(C[0]) == 180
    assert v_lo == InvPendulumBicycleParams.IP_ZOH_POLY_V_LO
    sweep = InvPendulumBicycleParams._zoh_sweep(p)
    assert fit_error(p.ip_zoh_poly, sweep, band=(1.45, 7.0)) < 1e-5


@pytest.mark.slow
def test_invpendulum_zoh_poly_trajectories_match_exact():
    """End-to-end: the poly and exact expm paths produce the same riding
    trajectories (sub-mm over 2 s), including through walking<->riding
    transitions triggered by the mixed initial speeds."""
    from cyclistsocialforce_tpu.params import InvPendulumBicycleParams

    rng = np.random.default_rng(19)
    n = 32
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, 80, n)
    s0[:, 1] = rng.uniform(0, 80, n)
    s0[:, 2] = rng.uniform(-0.3, 0.3, n)
    s0[:, 3] = rng.uniform(4, 6, n)
    st = make_state(s0, dtype=np.float64, hist_len=128)
    dst = np.zeros((n, 3))
    dst[:, 0] = s0[:, 0] + 100
    dst[:, 1] = s0[:, 1]
    st = st.replace(dest=jnp.asarray(dst),
                    destqueue=st.destqueue.at[:, 0, :].set(jnp.asarray(dst)))
    m = MODELS["invpendulum"]
    finals = {}
    for tag, p in (("exact", InvPendulumBicycleParams.create()),
                   ("poly", InvPendulumBicycleParams.create(zoh_poly=32))):
        pp = as_population(p, n)
        eng = Engine.create(pp, m)
        f, _ = jax.jit(lambda s, e=eng: e.simulate(s, 200, record=False))(
            m.prepare(pp, st))
        finals[tag] = np.asarray(f.s)
    dev = np.max(np.abs(finals["poly"][:, :2] - finals["exact"][:, :2]))
    assert dev < 1e-3, dev


def test_zoh_poly_static_across_population():
    """ip_zoh_poly is a STATIC field: as_population leaves it untouched
    (the coefficients reach the compiled step as literals)."""
    from cyclistsocialforce_tpu.params import InvPendulumBicycleParams

    p = InvPendulumBicycleParams.create(zoh_poly=16)
    pp = as_population(p, 16)
    assert pp.ip_zoh_poly is p.ip_zoh_poly


def test_gains_poly_static_across_population():
    """The coefficients are a STATIC field: as_population must leave
    them untouched (they reach the compiled step as literals)."""
    p = BalancingRiderParams.create(gains_poly=16, verbose=False)
    pp = as_population(p, 16)
    assert pp.br_gains_poly is p.br_gains_poly
