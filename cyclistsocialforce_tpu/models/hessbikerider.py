"""Hess et al. (2012) human-control bicycle: Whipple-Carvallo plant under
a fixed-gain neuromuscular steer-torque control loop.

TPU-native implementation of HessBikeRiderDynamics (reference
dynamics.py:708-799): the 5-state Whipple+yaw plant is driven through a
2nd-order neuromuscular actuator (states T_delta, dT_delta), closed with
the eyeballed gain curves of Moore (2012) (reference
`get_adaptive_gains`, dynamics.py:727-739) -- a 7-state closed-loop
system

    x = [phi, delta, phidot, deltadot, psi, T_delta, dT_delta]
    xdot = A(v) x + B psi_c

with A(v) per reference dynamics.py:741-799 and the commanded yaw psi_c as
input.

NOTE on the upstream runtime: in the reference, HessBikeRiderDynamics
inherits `step` from BalancingRiderDynamics, whose gain lookup indexes
`B[:, 1]` of the 1-column Hess input matrix (dynamics.py:612) and whose
midpoint residual is built from the 7-dim BalancingRider EOMs while the
Hess state is 9-dim (dynamics.py:724-725) -- the model cannot execute
upstream. This module implements the evidently intended behavior: the
closed-loop system above propagated with the same implicit-midpoint rule
and speed/positions handled exactly like the BalancingRider (speed
P-control dynamics.py:618-649; midpoint position rows). No golden parity
is possible; see tests/test_hess.py for the control-theoretic oracle.

The closed loop is stable for v >~ 4.5 m/s with the shipped balance-assist
parameters (the gains were tuned for a different bicycle at mid speeds).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cyclistsocialforce_tpu.params import (BalancingRiderParams, pair_hi,
                                           pair_lo)
from cyclistsocialforce_tpu.state import (DDELTA, DELTA, DTHETA, PSI, THETA,
                                          V, X, Y, AgentState)
from cyclistsocialforce_tpu.utils.angles import (angle_difference,
                                                 limit_angle, thresh)

N_STATES = 8
REP_FORCE = "twod"
DEST_FORCE = "direct"
STATE_WIDTHS = {"dyn_x": 7, "dyn_gains": 0, "zrid": 0}


class HessBikeRiderParams(BalancingRiderParams):
    """BalancingRider physics + the fixed Hess/Moore control gains
    (reference dynamics.py:727-739)."""

    k_delta: float = 43.0
    k_phi: float = 8.5
    k_dphi: float = -0.08
    k_psi: float = 0.173
    omega: float = 28.0
    zeta: float = float(np.sqrt(2) / 2)

    @classmethod
    def create(cls, k_delta=43.0, k_phi=8.5, k_dphi=-0.08, k_psi=0.173,
               omega=28.0, zeta=float(np.sqrt(2) / 2), **kw):
        # gains are fixed -> skip the GMM pole-model machinery entirely
        kw.setdefault("gains", np.zeros(5))
        return super().create(k_delta=k_delta, k_phi=k_phi, k_dphi=k_dphi,
                              k_psi=k_psi, omega=omega, zeta=zeta, **kw)


def prepare(params, state: AgentState) -> AgentState:
    """Bike-frame latents [phi, -delta, phidot, -deltadot, -psi, T, dT]
    (same frame flips as the BalancingRider, dynamics.py:361-399; the
    neuromuscular torque states start at zero, dynamics.py:724-725)."""
    s = state.s
    dyn_x = jnp.stack([
        s[:, THETA], -s[:, DELTA], s[:, DTHETA], -s[:, DDELTA],
        -s[:, PSI], jnp.zeros_like(s[:, 0]), jnp.zeros_like(s[:, 0])],
        axis=1)
    return state.replace(dyn_x=dyn_x, dyn_v=s[:, V])


def _hess_A_B(params, v, dtype):
    """Closed-loop A(v) [7, 7] and input column B [7] for one agent."""
    A5 = (jnp.asarray(params.br_A0, dtype=dtype)
          + v * jnp.asarray(params.br_A1, dtype=dtype)
          + (v * v) * jnp.asarray(params.br_A2, dtype=dtype))
    B5 = jnp.asarray(params.br_B, dtype=dtype)
    kd, kphi = params.k_delta, params.k_phi
    kdphi, kpsi = params.k_dphi, params.k_psi
    om, ze = params.omega, params.zeta
    om2 = om * om
    A = jnp.zeros((7, 7), dtype=dtype)
    A = A.at[0:5, 0:5].set(A5)
    A = A.at[0:5, 5].set(B5)
    A = A.at[5, 6].set(1.0)
    row = jnp.stack([
        -kd * kphi * kdphi * om2, -kd * om2, -kd * kdphi * om2,
        jnp.zeros_like(jnp.asarray(kd, dtype=dtype)),
        -kd * kphi * kdphi * kpsi * om2, -om2 * jnp.ones_like(
            jnp.asarray(kd, dtype=dtype)), -2.0 * om * ze])
    A = A.at[6, :].set(row.astype(dtype))
    B = jnp.zeros((7,), dtype=dtype).at[6].set(
        jnp.asarray(kd * kphi * kdphi * kpsi * om2, dtype=dtype))
    return A, B


def step(params, state: AgentState, fx, fy) -> AgentState:
    """One Hess bike-rider step: speed P-control + closed-form implicit
    midpoint of the linear 7-state loop + explicit position rows."""
    n = state.n
    s = state.s
    dtype = s.dtype

    def b(name):
        return jnp.broadcast_to(jnp.asarray(getattr(params, name),
                                            dtype=dtype), (n,))

    t_s = b("t_s")
    v_old = s[:, V]
    vd = jnp.sqrt(fx * fx + fy * fy)
    a = b("k_p_v") * (vd - v_old)
    a = thresh(a, (pair_lo(params.a_max), pair_hi(params.a_max)))
    v_new = thresh(v_old + t_s * a,
                   (pair_lo(params.v_max_riding),
                    pair_hi(params.v_max_riding)))
    v_mid = (v_new + v_old) / 2.0

    psi_bike = state.dyn_x[:, 4]
    psi_F = limit_angle(jnp.arctan2(-fy, fx))
    psi_c = psi_bike + angle_difference(psi_bike, psi_F)

    def one(pp, vm, psic, x7, px, py, h):
        A, B = _hess_A_B(pp, vm, x7.dtype)
        rhs = x7 + (h / 2.0) * (A @ x7) + h * B * psic
        lhs = jnp.eye(7, dtype=x7.dtype) - (h / 2.0) * A
        x_next = jnp.linalg.solve(lhs, rhs)
        psi_mid = (x7[4] + x_next[4]) / 2.0
        return (x_next, px + h * vm * jnp.cos(psi_mid),
                py + h * vm * jnp.sin(psi_mid))

    # per-agent scalar-gain view for vmap
    gain_fields = ("k_delta", "k_phi", "k_dphi", "k_psi", "omega", "zeta")
    pview = {f: b(f) for f in gain_fields}
    shared = {f: getattr(params, f) for f in ("br_A0", "br_A1", "br_A2",
                                              "br_B")}

    class _P:
        def __init__(self, d, s_):
            self.__dict__.update(s_)
            self.__dict__.update(d)

    def one_wrapped(gains, vm, psic, x7, px, py, h):
        return one(_P(gains, shared), vm, psic, x7, px, py, h)

    x_next, px, py = jax.vmap(one_wrapped)(
        pview, v_mid, psi_c, state.dyn_x, s[:, X], -s[:, Y], t_s)

    s_new = jnp.stack([
        px, -py, -limit_angle(x_next[:, 4]), v_new,
        -limit_angle(x_next[:, 1]), limit_angle(x_next[:, 0]),
        -x_next[:, 3], x_next[:, 2]], axis=1)
    return state.replace(s=s_new, dyn_x=x_next, dyn_v=v_new)
