"""Inverted-pendulum bicycle: lean + steer dynamics with speed-scheduled
full-state feedback, riding/walking FSM.

TPU-native port of InvPendulumBicycle (reference vehicle.py:1651-1950), the
BMD2023 "inverted pendulum model": position/speed propagate through a
P-controlled Euler step, while yaw/steer/roll propagate through the
closed-loop 5-state system

    x = [delta, delta_dot, theta, theta_dot, psi],
    xdot = (A(v) - B K_x(v)) x + K_u(v) B psi_d

with the speed-scheduled polynomial gain schedule of the reference
(parameters.py:1857-1892). The reference propagates this system one sample
via `ct.forced_response` per agent per step (vehicle.py:1835-1842); here it
is the exact zero-order-hold discretization expm([[A, B], [0, 0]] t_s),
batched over agents (identical result for constant input).

A riding/walking FSM (reference vehicle.py:1932-1950) switches to the 2D
kinematic model below `v_max_walk`; the reference scans a 1 s steer-angle
trajectory window per step -- replaced by an O(1) consecutive-steps
counter (`walk_ok_steps`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cyclistsocialforce_tpu.models import bicycle2d
from cyclistsocialforce_tpu.ops.smallmat import expm_small, matvec_small
from cyclistsocialforce_tpu.params import pair_hi, pair_lo
from cyclistsocialforce_tpu.state import (DELTA, PSI, THETA, V, X, Y,
                                          AgentState)
from cyclistsocialforce_tpu.utils.angles import limit_angle, thresh

N_STATES = 6
REP_FORCE = "twod"
DEST_FORCE = "spline"
# large per-step op graph (spline fit/eval chain): the sorted-resident
# simulate path schedules ~2.7x slower for this model at long rebuild
# chunks (BASELINE.md round 3) -- engines built on it default to the
# gather path
SORTED_RESIDENT = False
STATE_WIDTHS = {"dyn_x": 5, "dyn_gains": 0, "zrid": 2}

WALK_OK_CAP = 1 << 20


def prepare(params, state: AgentState) -> AgentState:
    """Initialize dynamics latents + riding FSM from the CSF state
    (reference vehicle.py:1728-1736)."""
    s = state.s
    dyn_x = jnp.zeros_like(state.dyn_x)
    dyn_x = (dyn_x.at[:, 0].set(s[:, DELTA]).at[:, 2].set(s[:, THETA])
             .at[:, 4].set(s[:, PSI]))
    walking = s[:, V] < jnp.broadcast_to(
        jnp.asarray(params.v_max_walk), (state.n,))
    zrid = jnp.stack([~walking, walking], axis=1)
    walk_ok = (jnp.abs(s[:, DELTA]) < jnp.asarray(
        params.delta_max_walk)).astype(jnp.int32)
    return state.replace(dyn_x=dyn_x, zrid=zrid, walk_ok_steps=walk_ok)


def openloop_matrices(params_b, v):
    """Open-loop A(v), B of the lean/steer/yaw system for one agent
    (reference vehicle.py:1738-1768). params_b: dict of scalars."""
    l, l_2, g = params_b["l"], params_b["l_2"], params_b["g"]
    tau1sq = params_b["tau_1_squared"]
    c_st, i_sv = params_b["c_steer"], params_b["i_steer_vertvert"]

    K = v * v / (g * l)
    K_tau_2 = v * l_2 / (g * l)
    inv_tau_3 = v / l          # 1 / (l / v); v == 0 -> 0 rate, like 1/inf

    A = jnp.zeros((5, 5), dtype=v.dtype)
    A = A.at[0, 1].set(1.0)
    A = A.at[1, 1].set(-c_st / i_sv)
    A = A.at[2, 3].set(1.0)
    A = A.at[3, 0].set(-K / tau1sq)
    A = A.at[3, 1].set(-K_tau_2 / tau1sq)
    A = A.at[3, 2].set(1.0 / tau1sq)
    A = A.at[4, 0].set(inv_tau_3)
    B = jnp.zeros((5,), dtype=v.dtype).at[1].set(1.0 / i_sv)
    return A, B


def _step_yaw_one(params_b, K_x, K_u, v, x, psi_d, t_s):
    """Exact one-sample propagation of the closed-loop system."""
    A, B = openloop_matrices(params_b, v)
    Acl = A - B[:, None] * K_x[None, :]
    Bcl = K_u * B
    aug = jnp.zeros((6, 6), dtype=x.dtype)
    aug = aug.at[:5, :5].set(Acl * t_s).at[:5, 5].set(Bcl * t_s)
    # unrolled Pade expm: jax.scipy.linalg.expm lowers to batched tiny
    # matmuls + LU under vmap, which serialize on TPU (~26 ms/step at
    # N = 8k); expm_small is pure [N]-wide VPU work (ops/smallmat.py),
    # pinned to jsl.expm at ~1e-12 by tests/test_smallmat.py
    e = expm_small(aug)
    return matvec_small(e[:5, :5], x) + e[:5, 5] * psi_d


def step(params, state: AgentState, fx, fy) -> AgentState:
    """One full inverted-pendulum step (reference vehicle.py:1883-1930)."""
    n = state.n
    s = state.s
    t_s = jnp.broadcast_to(jnp.asarray(params.t_s), (n,))
    vmw = jnp.broadcast_to(jnp.asarray(params.v_max_walk), (n,))
    dmw = jnp.broadcast_to(jnp.asarray(params.delta_max_walk), (n,))

    # ---- riding/walking FSM (reference vehicle.py:1932-1950)
    cvwalk = s[:, V] < vmw
    lookback = jnp.floor(1.0 / t_s).astype(jnp.int32)
    window = jnp.minimum(state.i + 1, lookback + 1)
    cdelta = state.walk_ok_steps >= window
    riding = (~cvwalk) & ((state.zrid[:, 1] & cdelta) | state.zrid[:, 0])
    zrid = jnp.stack([riding, ~riding], axis=1)

    arrived = state.znav[:, 2]

    # ---- riding branch: step_pos (vehicle.py:1850-1881)
    vd = jnp.sqrt(fx**2 + fy**2)
    a = params.k_p_v * (vd - s[:, V])
    a = thresh(a, (pair_lo(params.a_max), pair_hi(params.a_max)))
    v_new = thresh(s[:, V] + t_s * a,
                   (pair_lo(params.v_max_riding),
                    pair_hi(params.v_max_riding)))
    x_pos = s[:, X] + t_s * v_new * jnp.cos(s[:, PSI])
    y_pos = s[:, Y] + t_s * v_new * jnp.sin(s[:, PSI])

    # step_yaw (vehicle.py:1810-1848) at the new speed
    psi_d = jnp.arctan2(fy, fx)
    if getattr(params, "ip_zoh_poly", None) is not None:
        # GATHER-FREE piecewise-quintic ZOH propagator (params.create
        # zoh_poly=S): the same 30 Phi/Gamma entries as ip_zoh_lut, but
        # fitted per speed segment with the coefficients baked into the
        # compiled program as literals (static params field) -- no HBM
        # table, no per-agent row gathers (the two ip_zoh_lut gathers
        # cost ~0.7 ms/row each at N = 1e5; BASELINE.md "Gather-free
        # piecewise-polynomial gains"). Below-band speeds (v <
        # IP_ZOH_POLY_V_LO) clamp to the band edge; only the masked-out
        # walking branch ever sees them (riding-branch speeds stay
        # >= v_max_walk - |a_lo| t_s ~ 1.47 m/s).
        from cyclistsocialforce_tpu.ops.piecewise import \
            eval_piecewise_poly

        cols = eval_piecewise_poly(params.ip_zoh_poly, v_new, 30)
        x5 = state.dyn_x[:, :5]
        # layout m = 5*i+j is Phi[i, j]; 25+i is Gamma[i] (_build_zoh_lut)
        dyn_riding = jnp.stack(
            [sum(cols[5 * i + j] * x5[:, j] for j in range(5))
             + cols[25 + i] * psi_d for i in range(5)], axis=1)
    elif getattr(params, "ip_zoh_lut", None) is not None:
        # precomputed ZOH propagator table (params.create zoh_lut=G):
        # Phi(v), Gamma(v) interpolated on the uniform speed grid instead
        # of a per-agent 6x6 expm per step (the expm is ~4000 vmapped VPU
        # ops; see params._build_zoh_lut for the error-bound story)
        tab, v0, dv = params.ip_zoh_lut
        tab = jnp.asarray(tab, dtype=s.dtype)
        t = (v_new - jnp.asarray(v0, s.dtype)) / jnp.asarray(dv, s.dtype)
        t = jnp.clip(t, 0.0, tab.shape[0] - 1.0)
        i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, tab.shape[0] - 2)
        w = (t - i0.astype(s.dtype))[:, None]
        # NOTE: the balancingrider prop_lut branch needed an
        # optimization_barrier + transposed-SoA rewrite of this same
        # shape (gather fused into every matvec consumer); applying it
        # HERE measures 1.56 ms/step SLOWER (8.68 vs 7.12 full row at
        # N = 1e5) -- in this composition XLA's fusion is already good
        # and the barriers just force [N, 30] materializations. Keep
        # the straightforward form (BASELINE.md "Gather-free
        # piecewise-polynomial gains", A/B note).
        E = tab[i0] * (1.0 - w) + tab[i0 + 1] * w          # [N, 30]
        Phi = E[:, :25].reshape(n, 5, 5)
        Gam = E[:, 25:]
        x5 = state.dyn_x[:, :5]
        dyn_riding = (jnp.sum(Phi * x5[:, None, :], axis=2)
                      + Gam * psi_d[:, None])
    else:
        K_x, K_u = params.fullstate_feedback_gains(v_new)

        def b(field):
            return jnp.broadcast_to(jnp.asarray(getattr(params, field)),
                                    (n,))

        params_b = {f: b(f) for f in ("l", "l_2", "g", "tau_1_squared",
                                      "c_steer", "i_steer_vertvert")}
        dyn_riding = jax.vmap(_step_yaw_one)(
            params_b, K_x, K_u, v_new, state.dyn_x[:, :5], psi_d, t_s)

    s_riding = (s.at[:, X].set(x_pos).at[:, Y].set(y_pos)
                .at[:, V].set(v_new)
                .at[:, PSI].set(limit_angle(dyn_riding[:, 4]))
                .at[:, DELTA].set(limit_angle(dyn_riding[:, 0]))
                .at[:, THETA].set(limit_angle(dyn_riding[:, 2])))

    # ---- walking branch (vehicle.py:1904-1916): 2D kinematics at
    # v = v_max_walk with zero roll
    s_w_pre = s.at[:, V].set(vmw).at[:, THETA].set(0.0)
    st_w = state.replace(s=s_w_pre)
    a_w, odelta_w, pid_e_w, pid_i_w = bicycle2d.control(
        params, st_w, fx, fy)
    s_walk = bicycle2d.move(params, s_w_pre, a_w, odelta_w)
    dyn_walk = jnp.zeros_like(dyn_riding)
    dyn_walk = (dyn_walk.at[:, 0].set(s_walk[:, DELTA])
                .at[:, 2].set(s_walk[:, THETA])
                .at[:, 4].set(s_walk[:, PSI]))

    # ---- arrived: freeze v, delta, theta (vehicle.py:1898-1899)
    s_arr = (s.at[:, V].set(0.0).at[:, DELTA].set(0.0)
             .at[:, THETA].set(0.0))

    rid = riding[:, None]
    arr = arrived[:, None]
    s_new = jnp.where(arr, s_arr, jnp.where(rid, s_riding, s_walk))
    dyn5 = jnp.where(arr, state.dyn_x[:, :5],
                     jnp.where(rid, dyn_riding, dyn_walk))
    dyn_x = state.dyn_x.at[:, :5].set(dyn5)
    walking_active = (~arrived) & ~riding
    pid_e = jnp.where(walking_active[:, None], pid_e_w, state.pid_e)
    pid_i = jnp.where(walking_active[:, None], pid_i_w, state.pid_i)

    # ---- steer-window counter for the next FSM transition
    ok = jnp.abs(s_new[:, DELTA]) < dmw
    walk_ok = jnp.where(ok,
                        jnp.minimum(state.walk_ok_steps + 1, WALK_OK_CAP),
                        0)

    return state.replace(s=s_new, dyn_x=dyn_x, pid_e=pid_e, pid_i=pid_i,
                         zrid=zrid, walk_ok_steps=walk_ok)
