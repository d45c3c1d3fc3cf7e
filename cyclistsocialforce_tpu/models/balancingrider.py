"""Balancing-rider bicycle: linearized Whipple-Carvallo dynamics with
full-state feedback, implicit-midpoint integration, GMM rider behavior.

TPU-native port of BalancingRiderBicycle / BalancingRiderDynamics
(reference vehicle.py:1953-1988, dynamics.py:261-706), the flagship 3D
model: per step the reference

  1. P-controls the speed (dynamics.py:618-649),
  2. re-places the closed-loop poles at the midpoint speed whenever the
     speed changed (`ct.place` + a 1000-sample forced response whose K_u
     scaling is then DISCARDED -- `_get_gains` returns `gains[0] == K_x`
     and the EOMs use k_psi = K_x[4] as the input gain,
     dynamics.py:602-615, 465-477),
  3. solves the 7-state implicit-midpoint residual with Levenberg-
     Marquardt (dynamics.py:690-698).

The TPU re-design exploits two structural facts:

  * the pole placement is SISO and therefore closed-form (Ackermann), with
    the desired characteristic polynomial assembled directly from the pole
    FEATURES (real/imag parts) of the behavior model -- no complex
    arithmetic, no per-step `ct.place`;
  * the midpoint residual is block-triangular: the 5 bike-rider states
    [phi, delta, phidot, deltadot, psi] evolve LINEARLY (given gains), and
    the positions depend only on the yaw -- so the LM iteration's fixed
    point has a closed form: one batched 5x5 solve

        x' = (I - h/2 Acl)^{-1} [(I + h/2 Acl) x + h Bcl psi_c (+ h B2 d)]

    followed by the explicit position update with the midpoint yaw.

Everything is vectorized over the agent axis; state transforms between the
CSF frame (x fwd, y left, z up) and the bike-model frame (y right, z down)
flip the signs of y/steer/yaw exactly as the reference
(dynamics.py:321-399).

Stochastic rider behavior (reference parameters.py:1376-1411): when
`params.stochastic_control_behavior`, each agent resamples its pole
features from the conditional GMM pole model on device once its speed
moved more than `controlparam_resampling_speedthresh` from the last
update. Torque disturbances (removed upstream, dynamics.py:317-318) are
re-introduced: per-step Bernoulli roll/steer torque impulses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cyclistsocialforce_tpu.ops.control import (ackermann,
                                                charpoly_from_pole_features)
from cyclistsocialforce_tpu.params import pair_hi, pair_lo
from cyclistsocialforce_tpu.state import (DDELTA, DELTA, DTHETA, PSI, THETA,
                                          V, X, Y, AgentState, agent_streams)
from cyclistsocialforce_tpu.utils.angles import (angle_difference,
                                                 limit_angle, thresh)

N_STATES = 8
REP_FORCE = "twod"
DEST_FORCE = "direct"   # calc_direct_approach_dest_force, vehicle.py:2078
STATE_WIDTHS = {"dyn_x": 7, "dyn_gains": 12, "zrid": 0}

# dyn_gains layout
_KX = slice(0, 5)        # cached feedback gains K_x
_PF = slice(5, 10)       # current pole features (stochastic mode)
_VLAST = 10              # speed at last pole resampling

# RNG stream salts (state.agent_streams): draws are pure functions of
# (master key, t_glob, uid, salt) -- bit-identical under sorted-resident
# row permutation and device sharding
_SALT_DIST = 1           # torque-disturbance Bernoulli draws
_SALT_POLES = 2          # per-step pole-feature resampling
_SALT_INIT = 3           # initial pole-feature draw (prepare/init_gains)


def _bcast(params, name, n):
    return jnp.broadcast_to(jnp.asarray(getattr(params, name)), (n,))


def _sysmats(params, n, dtype):
    """Population view of the A(v)-structure matrices ([N, 5, 5] etc.)."""
    def b(x, shape):
        return jnp.broadcast_to(jnp.asarray(x, dtype=dtype), (n,) + shape)

    return (b(params.br_A0, (5, 5)), b(params.br_A1, (5, 5)),
            b(params.br_A2, (5, 5)), b(params.br_B, (5,)),
            b(params.br_B_roll, (5,)))


def _pole_features(params, state, v, n, gate=None):
    """Per-agent pole features at speed v: linear mean functions, or the
    agent's current stochastic sample held in dyn_gains.

    `gate` ([N] bool) restricts resampling (and the committed
    features/v_last) to agents whose gains are being recomputed this step
    -- the reference only resamples inside the gain update
    (dynamics.py:680-681 calling parameters.py:1376-1411), so features
    committed outside it would go stale relative to the cached K_x."""
    lin = jnp.broadcast_to(jnp.asarray(params.br_pole_lin), (n, 5, 2))
    feats_lin = lin[:, :, 0] + lin[:, :, 1] * v[:, None]
    if not params.stochastic_control_behavior:
        return feats_lin, state
    # hysteresis resampling (reference parameters.py:1397-1411)
    thresh_v = _bcast(params, "controlparam_resampling_speedthresh", n)
    v_last = state.dyn_gains[:, _VLAST]
    need = jnp.abs(v - v_last) > thresh_v
    if gate is not None:
        need = need & gate
    # per-agent keys (state.agent_streams): the draw an agent sees is a
    # pure function of (master key, t_glob, uid) -- bit-identical under
    # sorted-resident permutation and device sharding. The initial draw
    # (gate is None, from init_gains) uses its own salt so a step-0
    # resample never repeats the init draw.
    salt = _SALT_POLES if gate is not None else _SALT_INIT
    rt = params.polemodel_rt
    cur = state.dyn_gains[:, _PF]
    budget = int(getattr(params, "br_resample_budget", 0) or 0)
    every = int(getattr(params, "br_resample_every", 1) or 1)
    # branch selection must depend ONLY on the params (never on n):
    # a sharded trace sees the LOCAL shard size, so an n-dependent
    # branch would make sharded and single-device runs take different
    # paths (divergent physics with a non-binding budget). The budget
    # is therefore clamped per trace (min(budget, n)) instead of
    # falling back to the dense path when it exceeds n.
    if gate is not None and budget:
        # (gate is None only in init_gains, where EVERY agent draws its
        # first features -- the budget must not truncate initialization)
        # COMPACTED path: the hysteresis gate admits only a trickle of
        # agents per step (an agent must drift 0.83 m/s in speed since
        # its last update), but the branchless dense path still runs the
        # full conditional-GMM sampler for every agent and masks the
        # result (~2/3 of the stochastic flagship's step time at
        # N = 1e5). Instead: compact the needy agents' indices into a
        # fixed-size buffer, sample only those, scatter back. Agents
        # beyond the budget stay un-updated and therefore still needy --
        # they are picked up on following steps (index-ordered), a
        # deferral the speed-hysteresis semantics absorb.
        b = min(budget, n)

        def resample(cur, v_last):
            # compaction via cumsum + positional scatter: measurably
            # cheaper than jnp.nonzero(size=...) on TPU (0.63 vs 0.99
            # ms/call at N = 1e5, b = 2048 -- the nonzero was the
            # single largest stochastic-body op)
            pos = jnp.cumsum(need.astype(jnp.int32)) - 1
            tgt = jnp.where(need & (pos < b), pos, b)
            idx = jnp.full((b + 1,), n, jnp.int32).at[tgt].set(
                jnp.arange(n, dtype=jnp.int32), mode="drop")[:b]
            safe = jnp.minimum(idx, n - 1)
            v_sub = v[safe]
            # fold the per-agent keys for the COMPACTED subset only:
            # the stream is a pure function of the uid, so folding
            # after the gather is bit-identical to gathering
            # pre-folded [N] keys at a fraction of the cost
            keys_sub = agent_streams(state.key, state.t_glob,
                                     state.uid[safe], salt)
            sampled_sub, _ = rt.sample_features_batch(keys_sub, v_sub)
            return (cur.at[idx].set(sampled_sub, mode="drop"),
                    v_last.at[idx].set(v_sub, mode="drop"))

    else:
        def resample(cur, v_last):
            keys = agent_streams(state.key, state.t_glob, state.uid,
                                 salt)
            sampled, _ = rt.sample_features_batch(keys, v)
            return (jnp.where(need[:, None], sampled, cur),
                    jnp.where(need, v, v_last))

    if every > 1 and gate is not None:
        # resampling CADENCE (params.create resample_every=K): run the
        # resampler (compacted or dense) only every K-th global step.
        # The speed-hysteresis semantics absorb the extra <=(K-1)-step
        # deferral exactly like the budget's (reference resampling is
        # itself hysteresis-gated, parameters.py:1397-1411); gating on
        # t_glob keeps runs bit-identical under sharding/permutation.
        feats, v_last = jax.lax.cond(
            state.t_glob % every == 0, resample,
            lambda cur, v_last: (cur, v_last), cur, v_last)
    else:
        feats, v_last = resample(cur, v_last)
    dg = state.dyn_gains.at[:, _PF].set(feats).at[:, _VLAST].set(v_last)
    return feats, state.replace(dyn_gains=dg)


def _gains_at(params, A0, A1, A2, B, feats, v):
    """K_x(v) for one agent: Ackermann placement of the poles given by
    `feats` on A(v) (reference dynamics.py:602-615 + 1167-1227; the
    reference's K_u is discarded there, so only K_x matters)."""
    A = A0 + v * A1 + (v * v) * A2
    coeffs = charpoly_from_pole_features(feats)
    return ackermann(A, B, coeffs)


def init_gains(params, state: AgentState) -> AgentState:
    """Initial gains at the initial speed (reference dynamics.py:306)."""
    n = state.n
    dtype = state.s.dtype
    v0 = state.s[:, V]
    if params.br_gains_fixed is not None:
        # explicit-gains mode (reference parameters.py `gains=` ctor arg):
        # no pole model exists -- br_pole_lin is None
        K = jnp.broadcast_to(
            jnp.asarray(params.br_gains_fixed, dtype=dtype), (n, 5))
        return state.replace(dyn_gains=state.dyn_gains.at[:, _KX].set(K))
    A0, A1, A2, B, _ = _sysmats(params, n, dtype)
    feats, state = _pole_features(params, state, v0, n)
    K = jax.vmap(_gains_at, in_axes=(None, 0, 0, 0, 0, 0, 0))(
        params, A0, A1, A2, B, feats, v0)
    dg = state.dyn_gains.at[:, _KX].set(K)
    if params.stochastic_control_behavior:
        dg = dg.at[:, _PF].set(feats).at[:, _VLAST].set(v0)
    return state.replace(dyn_gains=dg)


def prepare(params, state: AgentState) -> AgentState:
    """CSF state -> bike-model latents (reference dynamics.py:361-399):
    x = [roll, -steer, rollrate, -steerrate, -yaw, x, -y]."""
    s = state.s
    dyn_x = jnp.stack([
        s[:, THETA], -s[:, DELTA], s[:, DTHETA], -s[:, DDELTA],
        -s[:, PSI], s[:, X], -s[:, Y]], axis=1)
    return init_gains(params, state.replace(dyn_x=dyn_x, dyn_v=s[:, V]))


def _prop_apply(state, rt, psi_c, T_roll, T_steer, v_mid, t_s, v_new):
    """Apply a [40, N] propagator-row stack (the [P | Q | R | K] layout
    shared by the prop_lut and prop_poly branches): unrolled SoA matvec
    on [N] rows -- neither dot_general (serializes, ops/smallmat.py
    rationale) nor [N, 5, 5] broadcast temps (lane-pad 5 -> 128
    resident in HBM) -- then the explicit midpoint position update."""
    u = rt[39] * psi_c + T_steer                       # K[4] == K_u
    xs = [state.dyn_x[:, j] for j in range(5)]
    x5n = [sum(rt[5 * i + j] * xs[j] for j in range(5))
           + rt[25 + i] * u + rt[30 + i] * T_roll
           for i in range(5)]
    psi_mid = (xs[4] + x5n[4]) / 2.0
    px = state.dyn_x[:, 5] + t_s * v_mid * jnp.cos(psi_mid)
    py = state.dyn_x[:, 6] + t_s * v_mid * jnp.sin(psi_mid)
    dyn_x = jnp.stack(x5n + [px, py], axis=1)
    return _finish(state, dyn_x, v_new, rt[35:40].T)


def step(params, state: AgentState, fx, fy) -> AgentState:
    """One balancing-rider step (reference dynamics.py:674-706)."""
    n = state.n
    s = state.s
    dtype = s.dtype
    t_s = _bcast(params, "t_s", n)

    # ---- speed P-control + Euler integration (dynamics.py:618-649)
    v_old = s[:, V]
    vd = jnp.sqrt(fx * fx + fy * fy)
    a = _bcast(params, "k_p_v", n) * (vd - v_old)
    a = thresh(a, (pair_lo(params.a_max), pair_hi(params.a_max)))
    v_new = thresh(v_old + t_s * a,
                   (pair_lo(params.v_max_riding),
                    pair_hi(params.v_max_riding)))
    v_mid = (v_new + v_old) / 2.0

    # ---- commanded yaw in the bike frame (dynamics.py:652-671)
    psi_bike = state.dyn_x[:, 4]
    psi_F = limit_angle(jnp.arctan2(-fy, fx))
    psi_c = psi_bike + angle_difference(psi_bike, psi_F)

    # ---- torque disturbances (re-introduced feature). br_disturb is a
    # STATIC flag set by params.create, so the (default) deterministic
    # program contains no draws at all. Streams are per-agent
    # (state.agent_streams): sharding/permutation-invariant.
    if getattr(params, "br_disturb", False):
        keys_d = agent_streams(state.key, state.t_glob, state.uid,
                               _SALT_DIST)
        uu = jax.vmap(lambda k: jax.random.uniform(k, (2,), dtype=dtype))(
            keys_d)
        b_roll = (uu[:, 0]
                  < jnp.broadcast_to(jnp.asarray(params.p_dist_roll),
                                     (n,))).astype(dtype)
        b_steer = (uu[:, 1]
                   < jnp.broadcast_to(jnp.asarray(params.p_dist_steer),
                                      (n,))).astype(dtype)
        T_roll = b_roll * _bcast(params, "T_dist_roll", n)
        T_steer = b_steer * _bcast(params, "T_dist_steer", n)
    else:
        T_roll = jnp.zeros((n,), dtype=dtype)
        T_steer = jnp.zeros((n,), dtype=dtype)

    if getattr(params, "br_prop_poly", None) is not None:
        # ---- GATHER-FREE piecewise-quintic midpoint PROPAGATOR
        # (deterministic perf mode, params.create prop_poly=S): the
        # same 40 [P | Q | R | K] entries as the prop_lut branch below,
        # but evaluated from STATIC per-segment coefficients (program
        # literals, ops/piecewise.eval_piecewise_poly SELECT form) --
        # no HBM table, no per-row gathers, which is exactly what made
        # the LUT propagator a net loss. CAUTION -- below-band speeds
        # (v_mid < 2 m/s) clamp the WHOLE propagator (P, Q, R incl. the
        # open-loop A(v) yaw coupling) to the band edge: a stronger
        # deviation than gains_poly, which clamps only K and keeps the
        # exact A(v_mid). The clamped propagator is a fixed STABLE
        # discrete system, so sub-band excursions stay bounded (pinned
        # by tests/test_gains_lut.py below-band test), but congested
        # sub-2 m/s traffic should prefer gains_poly/prop_lut. Same
        # K(v_mid)-every-step semantics as prop_lut.
        from cyclistsocialforce_tpu.ops.piecewise import \
            eval_piecewise_poly

        # select form, NO barrier: each evaluated row has <= 6
        # consumers in the matvec below, so fusion is benign here
        # (measured 5.95 ms/step unfenced vs 6.05 fenced vs 6.50
        # matmul-form at N = 1e5) -- unlike the stochastic ack-poly
        # branch, where the re-materialization cliff required a fence.
        # MEASURED NET: a LOSS vs gains_poly (16.8M vs 21.2M
        # agent-steps/s): the exact 5x5 solve chain this replaces is
        # nearly free on the VPU while the 40-entry piecewise eval is
        # not (same lesson as prop_lut, BASELINE.md round 4). Kept as
        # an option for hosts with expensive batched small solves.
        cols = eval_piecewise_poly(params.br_prop_poly, v_mid, 40,
                                   form="select")
        rt = jnp.stack(cols)                               # [40, N]
        return _prop_apply(state, rt, psi_c, T_roll, T_steer, v_mid,
                           t_s, v_new)

    if getattr(params, "br_prop_lut", None) is not None:
        # ---- tabulated midpoint PROPAGATOR (deterministic perf mode,
        # params.create prop_lut=G): the whole closed-loop update
        # x5' = P(v_mid) x5 + Q(v_mid) u + R(v_mid) T_roll is a pure
        # smooth function of the midpoint speed, so one flat [G, 40] row
        # gather + an unrolled SoA 5x5 matvec replaces the A(v) assembly,
        # the rank-1 gain closure, and the per-agent 5x5 solve below.
        # Semantics vs the exact path: gains are implicitly K(v_mid)
        # every step -- the reference's stale-gain quirk (K held while
        # the speed is unchanged) is dropped; the deviation is bounded
        # by the last speed increment (<= a_max t_s / 2) and pinned by
        # tests/test_gains_lut.py.
        #
        # MEASURED: a net LOSS vs gains_lut at N = 100k on v5e (14.07M
        # vs 16.10M agent-steps/s) -- per-row table gathers cost ~0.7
        # ms each while the exact solve's [N]-wide VPU algebra is
        # nearly free, so widening the gathered row from [G, 5] to
        # [G, 40] buys nothing (BASELINE.md "Propagator LUT"). Kept as
        # an option for hosts where gathers are cheap (CPU mesh).
        tab, v0, dv = params.br_prop_lut
        tab = jnp.asarray(tab, dtype=dtype)
        t = (v_mid - jnp.asarray(v0, dtype)) / jnp.asarray(dv, dtype)
        t = jnp.clip(t, 0.0, tab.shape[0] - 1.0)
        i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, tab.shape[0] - 2)
        w = (t - i0.astype(dtype))[:, None]
        # BARRIER the two row gathers: without it XLA fuses them into
        # every consumer below, re-materializing the per-row gather once
        # per matvec element (~25x; measured 15.4 vs 5.8 ms/step bodies
        # at N = 100k -- same trap engine.permute_state hit)
        r0, r1 = jax.lax.optimization_barrier((tab[i0], tab[i0 + 1]))
        row = r0 + (r1 - r0) * w                           # [N, 40]
        # TRANSPOSE before consuming: the 40+ column extracts below
        # each sweep the whole 128-lane-padded [N, 40] array; rows of
        # the [40, N] transpose are contiguous [N] vectors (same trick
        # as engine.sorted_packs' receiver pack)
        rt = jax.lax.optimization_barrier(row.T)           # [40, N]
        return _prop_apply(state, rt, psi_c, T_roll, T_steer, v_mid,
                           t_s, v_new)

    # ---- gains: recompute only where the speed changed, else keep the
    # cache (reference dynamics.py:680-681)
    A0, A1, A2, B, B_roll = _sysmats(params, n, dtype)
    if params.br_gains_fixed is not None:
        K = jnp.broadcast_to(jnp.asarray(params.br_gains_fixed, dtype=dtype),
                             (n, 5))
    elif getattr(params, "br_gains_poly", None) is not None:
        # GATHER-FREE piecewise-quintic gain schedule (deterministic
        # mode; params.create gains_poly=S): the coefficients live in
        # a STATIC params field, so they reach the compiled step as
        # literal constants -- the evaluation is S masked FMAs + a
        # Horner chain of pure [N]-wide VPU work, no HBM table (the two
        # gains_lut row gathers cost ~0.9 ms/step at N = 1e5; BASELINE
        # "Gather-free piecewise-polynomial gains"). Speeds below the
        # fit band (v < 2 m/s, where K(v) has poles) clamp to the band
        # edge: the exact gains there are the blown-up values of an
        # uncontrollable plant, so the clamp is the *more* physical
        # choice -- but it IS a semantic deviation from the exact/lut
        # paths, pinned by tests/test_gains_lut.py.
        changed = v_new != v_old
        C, p_lo, p_dv = params.br_gains_poly
        S = len(C)
        x = (v_mid - p_lo) / p_dv
        x = jnp.clip(x, 0.0, float(S) - 1e-6)
        idx = jnp.floor(x)
        u = x - idx
        masks = [idx == s for s in range(1, S)]
        # per-gain Horner with segment-selected constant coefficients
        K_cols = []
        for k in range(5):
            acc = None
            for d in (5, 4, 3, 2, 1, 0):
                cd = jnp.full_like(u, C[0][6 * k + d])
                for s, msk in enumerate(masks, start=1):
                    cd = jnp.where(msk, C[s][6 * k + d], cd)
                acc = cd if acc is None else acc * u + cd
            K_cols.append(acc)
        K_new = jnp.stack(K_cols, axis=1)
        K = jnp.where(changed[:, None], K_new, state.dyn_gains[:, _KX])
    elif getattr(params, "br_gains_lut", None) is not None:
        # precomputed K(v) table (deterministic mode; params.create
        # gains_lut=G): linear interpolation on the uniform speed grid
        # replaces the per-agent Ackermann placement (~2 ms/step at
        # N = 100k); same changed-speed gating as the exact path
        changed = v_new != v_old
        tab, v0, dv = params.br_gains_lut
        tab = jnp.asarray(tab, dtype=dtype)
        t = (v_mid - jnp.asarray(v0, dtype)) / jnp.asarray(dv, dtype)
        # clamp the continuous coordinate (not just the index) so speeds
        # outside the grid use the boundary gains instead of silently
        # extrapolating K(v)
        t = jnp.clip(t, 0.0, tab.shape[0] - 1.0)
        i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, tab.shape[0] - 2)
        w = (t - i0.astype(dtype))[:, None]
        K_new = tab[i0] * (1.0 - w) + tab[i0 + 1] * w
        K = jnp.where(changed[:, None], K_new, state.dyn_gains[:, _KX])
    else:
        changed = v_new != v_old
        feats, state = _pole_features(params, state, v_mid, n, gate=changed)
        if getattr(params, "br_ackermann_poly", None) is not None:
            # GATHER-FREE piecewise-quintic Ackermann BASIS (stochastic
            # mode; params.create gains_poly=S): the same M(v) [6, 5]
            # entries as br_ackermann_lut, but fitted per speed segment
            # with the coefficients baked into the program as literals
            # (static params field) -- no HBM table, no per-row gathers
            # (the two br_ackermann_lut row gathers cost ~0.6 ms/step
            # each at N = 1e5). Per-agent pole features stay exact:
            # K = charpoly(feats) @ M(v_mid). Below-band speeds
            # (v < GAINS_POLY_V_LO) clamp to the band edge like the
            # deterministic gains_poly (pinned by tests/test_gains_lut).
            from cyclistsocialforce_tpu.ops.piecewise import \
                eval_piecewise_poly

            mc = eval_piecewise_poly(
                params.br_ackermann_poly, v_mid, 30)       # 30 x [N]
            # BARRIER the evaluated basis before the contraction: without
            # it XLA re-materializes the masked-select Horner chains into
            # every consumer of K in the 5x5 midpoint algebra under the
            # sorted-resident culled simulate (measured 51 ms/step vs
            # 5.4 with the fence at N = 1e5 -- the same fusion trap as
            # the lut branches' row gathers)
            mc = jax.lax.optimization_barrier(mc)
            ct = jax.lax.optimization_barrier(
                jax.vmap(charpoly_from_pole_features)(feats).T)  # [6, N]
            # K[:, k] = sum_c coeffs[c] * M[c, k]; layout m = 5*c+k
            K_new = jnp.stack(
                [sum(ct[c] * mc[5 * c + k] for c in range(6))
                 for k in range(5)], axis=1)
            K_new = jax.lax.optimization_barrier(K_new)
        elif getattr(params, "br_ackermann_lut", None) is not None:
            # tabulated Ackermann BASIS (params.create gains_lut=G with
            # stochastic behavior): K is linear in the characteristic
            # coefficients, so interpolate M(v_mid) [6, 5] on the speed
            # grid and contract with the agent's exact charpoly(feats)
            # -- replaces the dense per-agent placement (~5x5 powers +
            # solve per agent per step) with a 30-value lookup
            tab, v0, dv = params.br_ackermann_lut
            # gather FLAT [G, 30] rows: the same gather on the [G, 6, 5]
            # table is 4.5x slower on TPU (2.73 vs 0.61 ms at N = 1e5 --
            # the 3-D row layout defeats the vectorized gather; see
            # scripts/exp_acklut.py)
            tab = jnp.asarray(tab, dtype=dtype).reshape(tab.shape[0], 30)
            t = (v_mid - jnp.asarray(v0, dtype)) / jnp.asarray(dv, dtype)
            t = jnp.clip(t, 0.0, tab.shape[0] - 1.0)
            i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0,
                          tab.shape[0] - 2)
            w = (t - i0.astype(dtype))[:, None]
            # barrier + transposed SoA consumption: without the barrier
            # XLA fuses the row gathers into every contraction element
            # (re-materializing them ~30x), and column extracts from
            # the [N, 30] row sweep the whole 128-lane-padded buffer --
            # same two traps measured on the prop_lut branch above
            r0, r1 = jax.lax.optimization_barrier((tab[i0], tab[i0 + 1]))
            rt = jax.lax.optimization_barrier(
                (r0 + (r1 - r0) * w).T)                    # [30, N]
            ct = jax.vmap(charpoly_from_pole_features)(feats).T  # [6, N]
            # K[:, k] = sum_c coeffs[c] * M[c, k]; row layout j = 5*c+k
            K_new = jnp.stack(
                [sum(ct[c] * rt[5 * c + k] for c in range(6))
                 for k in range(5)], axis=1)
        else:
            K_new = jax.vmap(_gains_at, in_axes=(None, 0, 0, 0, 0, 0, 0))(
                params, A0, A1, A2, B, feats, v_mid)
        K = jnp.where(changed[:, None], K_new, state.dyn_gains[:, _KX])

    # ---- closed-form implicit midpoint of the block-triangular system
    # (ops.smallmat: unrolled 5x5 solve -- batched jnp.linalg.solve at
    # N = 100k cost ~138 ms/step on TPU, the unrolled form ~1 ms)
    from cyclistsocialforce_tpu.ops.smallmat import matvec_small, solve_small

    def solve_one(A0a, A1a, A2a, Ba, B2a, Ka, vm, psic, x, h, Tr, Ts):
        A = A0a + vm * A1a + (vm * vm) * A2a
        Acl = A - Ba[:, None] * Ka[None, :]
        u = Ka[4] * psic + Ts          # k_psi == K_u (dynamics.py:465-477)
        rhs = (x[:5] + (h / 2.0) * matvec_small(Acl, x[:5])
               + h * (Ba * u + B2a * Tr))
        lhs = jnp.eye(5, dtype=x.dtype) - (h / 2.0) * Acl
        x5 = solve_small(lhs, rhs)
        psi_mid = (x[4] + x5[4]) / 2.0
        px = x[5] + h * vm * jnp.cos(psi_mid)
        py = x[6] + h * vm * jnp.sin(psi_mid)
        return jnp.concatenate([x5, jnp.array([px, py], dtype=x.dtype)])

    dyn_x = jax.vmap(solve_one)(A0, A1, A2, B, B_roll, K, v_mid, psi_c,
                                state.dyn_x, t_s, T_roll, T_steer)
    return _finish(state, dyn_x, v_new, K)


def _finish(state: AgentState, dyn_x, v_new, K) -> AgentState:
    """Bike frame -> CSF state (dynamics.py:321-358) + gain cache commit."""
    s_new = jnp.stack([
        dyn_x[:, 5],                       # x
        -dyn_x[:, 6],                      # y
        -limit_angle(dyn_x[:, 4]),         # yaw
        v_new,                             # speed
        -limit_angle(dyn_x[:, 1]),         # steer
        limit_angle(dyn_x[:, 0]),          # roll
        -dyn_x[:, 3],                      # steer rate
        dyn_x[:, 2],                       # roll rate
    ], axis=1)

    dg = state.dyn_gains.at[:, _KX].set(K)
    return state.replace(s=s_new, dyn_x=dyn_x, dyn_v=v_new, dyn_gains=dg)
