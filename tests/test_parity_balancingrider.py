"""Golden-trajectory parity: BalancingRiderBicycle (Whipple-Carvallo).

The reference solves a 7-state implicit-midpoint residual with scipy LM and
re-places poles via ct.place per speed change (dynamics.py:674-706); the
TPU model's closed-form block-triangular midpoint + Ackermann placement
must match to machine precision."""

import numpy as np
import pytest

from parity_common import (ENCROACH_DESTS, ENCROACH_S0, assert_parity,
                           load_golden, run_scenario)


def test_encroachment_balancingrider():
    from cyclistsocialforce_tpu.params import BalancingRiderParams

    golden = load_golden("encroachment_balancingrider.npz")
    params = BalancingRiderParams.create()
    traj, fx, fy = run_scenario(
        "balancingrider", params, ENCROACH_S0, ENCROACH_DESTS, 700,
        v_desired=[4.5, 5.0, 5.0])
    # trajectories agree to ~1e-14 (LM tolerance); assert well below the
    # 1e-3 m north-star budget
    assert_parity(golden, traj, fx, fy, 3, pos_tol=1e-9, force_tol=1e-9,
                  v_tol=1e-9)


@pytest.mark.slow
def test_stochastic_control_runs_stable():
    """Stochastic rider behavior: on-device pole resampling keeps the
    closed loop stable and finite (feature re-introduced on top of the
    reference's host-side-only path, parameters.py:1376-1411)."""
    import jax

    from cyclistsocialforce_tpu.params import BalancingRiderParams

    params = BalancingRiderParams.create(
        stochastic_control_behavior=True,
        controlparam_resampling_speedthresh=0.5)
    traj, fx, fy = run_scenario(
        "balancingrider", params, ENCROACH_S0, ENCROACH_DESTS, 400,
        v_desired=[4.5, 5.0, 5.0])
    assert np.all(np.isfinite(traj))
    # roll stays bounded (stable gains)
    assert np.max(np.abs(traj[:, :, 5])) < np.pi / 3


@pytest.mark.slow
def test_stochastic_resample_budget():
    """The compacted resampling path (BalancingRiderParams.create
    resample_budget=B): needy agents within the budget are updated
    exactly like the dense path's gating; overflow agents defer (stay
    needy) instead of being silently dropped."""
    import jax
    import jax.numpy as jnp

    from cyclistsocialforce_tpu import make_state
    from cyclistsocialforce_tpu.models import balancingrider as BR
    from cyclistsocialforce_tpu.params import BalancingRiderParams

    n = 16
    params = BalancingRiderParams.create(
        stochastic_control_behavior=True, resample_budget=4,
        verbose=False)
    rng = np.random.default_rng(0)
    s0 = np.zeros((n, 8))
    s0[:, 3] = rng.uniform(4, 6, n)
    st = BR.prepare(params, make_state(s0, dtype=np.float64))

    # mark exactly 6 agents needy (speed moved > thresh since last
    # update); the budget admits the FIRST FOUR by index
    v_last = st.dyn_gains[:, BR._VLAST]
    v_now = jnp.asarray(s0[:, 3])
    needy = np.zeros(n, bool)
    needy[[1, 3, 5, 7, 9, 11]] = True
    v_last = jnp.where(jnp.asarray(needy), v_now - 2.0, v_now)
    st = st.replace(dyn_gains=st.dyn_gains.at[:, BR._VLAST].set(v_last))

    feats, st2 = BR._pole_features(
        params, st, v_now, n, gate=jnp.ones(n, bool))
    updated = np.asarray(st2.dyn_gains[:, BR._VLAST] == v_now)
    assert list(np.where(~updated)[0]) == [9, 11]   # deferred overflow
    assert np.all(np.isfinite(np.asarray(feats)))

    # deferred agents are picked up on the next call
    feats3, st3 = BR._pole_features(
        params, st2, v_now, n, gate=jnp.ones(n, bool))
    assert np.all(np.asarray(st3.dyn_gains[:, BR._VLAST] == v_now))


def test_stochastic_resample_every_cadence():
    """resample_every=K gates the budget-compacted resampler on the
    global step clock: needy agents are updated only on steps where
    t_glob % K == 0, deferred (still needy) otherwise."""
    import jax.numpy as jnp

    from cyclistsocialforce_tpu import make_state
    from cyclistsocialforce_tpu.models import balancingrider as BR
    from cyclistsocialforce_tpu.params import BalancingRiderParams

    n = 16
    params = BalancingRiderParams.create(
        stochastic_control_behavior=True, resample_budget=8,
        resample_every=3, verbose=False)
    rng = np.random.default_rng(1)
    s0 = np.zeros((n, 8))
    s0[:, 3] = rng.uniform(4, 6, n)
    st = BR.prepare(params, make_state(s0, dtype=np.float64))
    v_now = jnp.asarray(s0[:, 3])
    # everyone needy
    st = st.replace(dyn_gains=st.dyn_gains.at[:, BR._VLAST].set(
        v_now - 2.0))

    for t, expect_update in ((1, False), (2, False), (3, True)):
        sti = st.replace(t_glob=jnp.asarray(t, jnp.int32))
        _, out = BR._pole_features(params, sti, v_now, n,
                                   gate=jnp.ones(n, bool))
        updated = np.asarray(out.dyn_gains[:, BR._VLAST] == v_now)
        # budget 8 < 16 needy: on a firing step the first 8 update
        assert updated.any() == expect_update
        if expect_update:
            assert list(np.where(updated)[0]) == list(range(8))


def test_stochastic_budget_trajectories_stable():
    """End-to-end budgeted stochastic run stays finite and stable."""
    from cyclistsocialforce_tpu.params import BalancingRiderParams

    params = BalancingRiderParams.create(
        stochastic_control_behavior=True,
        controlparam_resampling_speedthresh=0.5,
        resample_budget=2)
    traj, fx, fy = run_scenario(
        "balancingrider", params, ENCROACH_S0, ENCROACH_DESTS, 400,
        v_desired=[4.5, 5.0, 5.0])
    assert np.all(np.isfinite(traj))
    assert np.max(np.abs(traj[:, :, 5])) < np.pi / 3


def test_torque_disturbances():
    """Re-introduced roll/steer torque disturbances perturb the trajectory
    but keep it finite (support removed upstream, dynamics.py:317-318)."""
    from cyclistsocialforce_tpu.params import BalancingRiderParams

    base = run_scenario(
        "balancingrider",
        BalancingRiderParams.create(), ENCROACH_S0, ENCROACH_DESTS, 200,
        v_desired=[4.5, 5.0, 5.0])[0]
    pert = run_scenario(
        "balancingrider",
        BalancingRiderParams.create(p_dist_steer=0.02, T_dist_steer=20.0),
        ENCROACH_S0, ENCROACH_DESTS, 200, v_desired=[4.5, 5.0, 5.0])[0]
    assert np.all(np.isfinite(pert))
    assert np.max(np.abs(pert - base)) > 1e-4


def test_explicit_gains_mode():
    """`create(gains=...)` (reference parameters.py explicit-gains ctor
    path) must run end-to-end: no pole model exists in this mode, so
    init_gains/step take the fixed-K branch and never touch
    br_pole_lin."""
    from cyclistsocialforce_tpu.params import BalancingRiderParams

    p = BalancingRiderParams.create(
        gains=[-13.14, 1.10, -6.69, -0.11, -11.38], verbose=False)
    assert p.br_pole_lin is None
    traj = run_scenario("balancingrider", p, ENCROACH_S0, ENCROACH_DESTS,
                        200, v_desired=[4.5, 5.0, 5.0])[0]
    assert np.all(np.isfinite(traj))
    assert np.max(np.abs(traj[:, :, 5])) < np.pi / 3


@pytest.mark.slow
def test_stochastic_perf_semantics_distributionally_equivalent():
    """The bench's relaxed stochastic semantics (resample_every=4 + a
    budget sized at the average resample trickle) vs the reference's
    EXACT semantics (immediate per-agent hysteresis, unlimited budget,
    parameters.py:1376-1411): over a long horizon the relaxation must be
    distributionally invisible -- KS tests on the resampled pole-feature
    population and on the trajectory ensemble (final speeds / lateral
    drift) cannot tell the two populations apart (VERDICT r4 item 3).

    The two runs draw DIFFERENT random streams by construction (the
    deferred agents resample at later t_glob), so this is a genuine
    two-sample distribution comparison, not a bit-equality check."""
    import jax
    import jax.numpy as jnp
    from scipy import stats

    from cyclistsocialforce_tpu import Engine, make_state
    from cyclistsocialforce_tpu.models import MODELS, balancingrider as BR
    from cyclistsocialforce_tpu.models import prepare
    from cyclistsocialforce_tpu.params import BalancingRiderParams

    n, t_steps = 512, 320
    rng = np.random.default_rng(7)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, 150, n)
    s0[:, 1] = rng.uniform(0, 150, n)
    s0[:, 2] = rng.uniform(-0.2, 0.2, n)
    s0[:, 3] = rng.uniform(4, 6, n)

    def run(every, budget):
        p = BalancingRiderParams.create(
            stochastic_control_behavior=True, resample_budget=budget,
            resample_every=every,
            # tighter hysteresis than the default: a steady resample
            # trickle over the horizon (the regime the budget/cadence
            # relaxation actually touches)
            controlparam_resampling_speedthresh=0.3, verbose=False)
        st = make_state(s0, dtype=np.float64, hist_len=8)
        dst = np.c_[s0[:, 0] + 300, s0[:, 1] + rng.uniform(-5, 5, n),
                    np.zeros(n)]
        st = st.replace(dest=jnp.asarray(dst),
                        destqueue=st.destqueue.at[:, 0, :].set(
                            jnp.asarray(dst)))
        m = MODELS["balancingrider"]
        st = prepare(m, p, st)
        eng = Engine.create(p, m)
        out, _ = jax.jit(lambda e, s: e.simulate(s, t_steps,
                                                 record=False))(eng, st)
        return out

    exact = run(every=1, budget=0)
    # bench proportions: budget ~ 4 steps of the average trickle
    perf = run(every=4, budget=max(16, n // 8))

    for out in (exact, perf):
        assert np.all(np.isfinite(np.asarray(out.s)))

    # (a) resampled pole-feature population (dyn_gains[:, _PF])
    pf_a = np.asarray(exact.dyn_gains[:, BR._PF])
    pf_b = np.asarray(perf.dyn_gains[:, BR._PF])
    for col in range(pf_a.shape[1]):
        d, pv = stats.ks_2samp(pf_a[:, col], pf_b[:, col])
        assert pv > 1e-3, (f"pole feature {col} distribution shifted by "
                           f"the perf-mode relaxation: KS {d:.4f}, "
                           f"p={pv:.2e}")

    # (b) trajectory ensemble: final speeds + lateral drift from the
    # destination line
    sa, sb = np.asarray(exact.s), np.asarray(perf.s)
    for col, name in ((3, "speed"), (1, "lateral position")):
        d, pv = stats.ks_2samp(sa[:, col], sb[:, col])
        assert pv > 1e-3, (f"{name} ensemble shifted: KS {d:.4f}, "
                           f"p={pv:.2e}")
