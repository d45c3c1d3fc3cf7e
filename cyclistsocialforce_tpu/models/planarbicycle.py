"""Planar two-wheeler: 2-state steer/yaw state space with per-step pole
placement and exact-exponential speed dynamics.

TPU-native port of PlanarBicycle / PlanarTwoWheelerDynamics /
PPointSpeedDynamics (reference vehicle.py:2031-2074, dynamics.py:145-258).
Per step the reference re-runs `ct.place` on

    A(v) = [[0, 0], [v/w, 0]],  B = [1, 0]^T,  x = [delta, psi]

for the CURRENT (pre-step) speed, scales the reference gain K_u with a
1000-sample simulated step response, propagates one sample with
`ct.forced_response`, advances the speed through the closed-form
exponential solution of the P-controlled speed ODE, and Euler-integrates
the position at the new speed/yaw.

Here all of that is closed-form and batched:

  - pole placement: Ackermann (SISO placement is unique, so it equals
    `ct.place` / scipy `place_poles`),
  - K_u: the step response of the stable closed loop is reproduced exactly
    from the first-order-hold discretization -- y_999 = C [(I - Ad^989)
    (I - Ad)^{-1} P + Ad^989 Q / dt]; K_u = 1 / y_999 (matching
    `forced_response`'s FOH propagation sample-for-sample, with the
    reference's hardcoded t_end = 10 s, dt = 0.01 s),
  - one-sample propagation: zero-order hold via the augmented matrix
    exponential (input constant over the sample).

Degenerate-case divergence: at v = 0 the pair (A, B) loses
controllability and the reference ASSERTS (dynamics.py:1151-1153); here
the placement speed is clamped to |v| >= 1e-9 so the kernel stays finite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cyclistsocialforce_tpu.ops.control import (ackermann,
                                                discretize_foh, matrix_power)
from cyclistsocialforce_tpu.state import DELTA, PSI, V, X, Y, AgentState
from cyclistsocialforce_tpu.utils.angles import limit_angle

N_STATES = 5
REP_FORCE = "twod"
DEST_FORCE = "spline"
STATE_WIDTHS = {"dyn_x": 2, "dyn_gains": 0, "zrid": 0}

# from_pole_placement's hardcoded step-response schedule
# (reference dynamics.py:1167-1178: t_end=10.0, t_s=0.01, step at k=10)
_KU_DT = 0.01
_KU_LAST = 999
_KU_STEP_ON = 10


def prepare(params, state: AgentState) -> AgentState:
    """Dynamics latents [delta, psi] from the CSF state (reference
    dynamics.py:192-195); kept unwrapped across steps."""
    dyn_x = state.dyn_x.at[:, 0].set(state.s[:, DELTA])
    dyn_x = dyn_x.at[:, 1].set(state.s[:, PSI])
    return state.replace(dyn_x=dyn_x, dyn_v=state.s[:, V])


def _step_one(poles_quad, w, k_p_v, t_s, v, x2, psi_d, v_d):
    """One agent's planar two-wheeler step; x2 = [delta, psi]."""
    dtype = x2.dtype
    vv = jnp.where(jnp.abs(v) < 1e-9, 1e-9, v)
    A = jnp.zeros((2, 2), dtype=dtype).at[1, 0].set(vv / w)
    B = jnp.zeros((2,), dtype=dtype).at[0].set(1.0)
    C = jnp.zeros((2,), dtype=dtype).at[1].set(1.0)

    # Ackermann placement of the conjugate pole pair
    K = ackermann(A, B, poles_quad)
    Acl = A - B[:, None] * K[None, :]

    # K_u from the exact FOH step response at the reference's fixed grid
    Ad, P, Q = discretize_foh(Acl, B, _KU_DT)
    Adn = matrix_power(Ad, _KU_LAST - _KU_STEP_ON)          # Ad^989
    S = jnp.linalg.solve(jnp.eye(2, dtype=dtype) - Ad,
                         (jnp.eye(2, dtype=dtype) - Adn) @ P)
    y_ss = C @ (S + Adn @ Q / _KU_DT).reshape(2)
    K_u = 1.0 / y_ss

    # one-sample ZOH propagation of (Acl, B K_u) under constant psi_d
    Ad1, P1, _ = discretize_foh(Acl, B * K_u, t_s)
    x_next = Ad1 @ x2 + P1.reshape(2) * psi_d

    # speed: closed-form exponential P-control (dynamics.py:145-175)
    v_new = v_d + (v - v_d) * jnp.exp(-k_p_v * t_s)
    return x_next, v_new


def step(params, state: AgentState, fx, fy) -> AgentState:
    """One planar-bicycle step (reference dynamics.py:221-258)."""
    n = state.n
    s = state.s
    dtype = s.dtype

    def b(name):
        return jnp.broadcast_to(jnp.asarray(getattr(params, name),
                                            dtype=dtype), (n,))

    psi_d = jnp.arctan2(fy, fx)
    v_d = jnp.sqrt(fx * fx + fy * fy)

    # desired characteristic polynomial s^2 - 2 Re(p) s + |p|^2 from the
    # conjugate pole pair (params.poles, reference parameters.py:1203-1211)
    if isinstance(params.poles, (tuple, list)):
        p0 = jnp.broadcast_to(jnp.asarray(params.poles[0]), (n,))
    else:
        arr = jnp.asarray(params.poles)
        p0 = jnp.broadcast_to(arr[..., 0] if arr.ndim else arr, (n,))
    pr, pi = jnp.real(p0), jnp.imag(p0)
    one = jnp.ones((n,), dtype=dtype)
    quad = jnp.stack([one, -2.0 * pr.astype(dtype),
                      (pr * pr + pi * pi).astype(dtype)], axis=1)

    x_next, v_new = jax.vmap(_step_one)(
        quad, b("l"), b("k_p_v"), b("t_s"), s[:, V], state.dyn_x[:, :2],
        psi_d, v_d)

    psi = limit_angle(x_next[:, 1])
    delta = limit_angle(x_next[:, 0])
    t_s = b("t_s")
    x_pos = s[:, X] + t_s * v_new * jnp.cos(psi)
    y_pos = s[:, Y] + t_s * v_new * jnp.sin(psi)

    s_new = (s.at[:, X].set(x_pos).at[:, Y].set(y_pos)
             .at[:, PSI].set(psi).at[:, V].set(v_new)
             .at[:, DELTA].set(delta))
    dyn_x = state.dyn_x.at[:, :2].set(x_next)
    return state.replace(s=s_new, dyn_x=dyn_x, dyn_v=v_new)
