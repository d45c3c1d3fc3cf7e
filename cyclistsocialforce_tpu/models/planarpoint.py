"""Mass-less planar point bicycle with 1st-order yaw tracking.

TPU-native port of PlanarPointBicycle + PlanarPointDynamics (reference
vehicle.py:1991-2028, dynamics.py:802-1079). The reference builds the
equations of motion

    psi_dot = -k_psi (psi - psi_c),  x_dot = v cos psi,  y_dot = v sin psi

symbolically with sympy, forms the implicit-midpoint residual and solves it
per agent per step with scipy's Levenberg-Marquardt root finder
(dynamics.py:1055-1062). That system is lower-triangular: the midpoint
equation for psi is linear and the position rows are then explicit -- so
the *exact* midpoint solution is closed-form. We use it directly: a
guaranteed-shape, iteration-free step that the LM solver only approximates
to its tolerance.

Speed dynamics: P-controlled acceleration with a_max / v_max_riding clamps
(dynamics.py:1000-1036); the yaw gain is -Re(pole) of the single desired
pole, or the provided gain (dynamics.py:948-956, parameters.py:1175-1201).

The internal dynamics state (dyn_x = [psi_unwrapped, x, y], dyn_v) mirrors
the reference's Dynamics object state: yaw accumulates unwrapped, the
vehicle state gets the wrapped angle (dynamics.py:950-969).
"""

from __future__ import annotations

import jax.numpy as jnp

from cyclistsocialforce_tpu.params import pair_hi, pair_lo
from cyclistsocialforce_tpu.state import PSI, V, X, Y, AgentState
from cyclistsocialforce_tpu.utils.angles import limit_angle, thresh

N_STATES = 4
REP_FORCE = "twod"     # PlanarPointBicycle borrows TwoDBicycle forces
DEST_FORCE = "spline"  # (reference vehicle.py:2022-2024)
STATE_WIDTHS = {"dyn_x": 3, "dyn_gains": 0, "zrid": 0}


def yaw_gain(params):
    """k_psi: poles overwrite gains (reference dynamics.py:831-853, 948-956).
    """
    poles = getattr(params, "poles", None)
    if poles is not None:
        return -jnp.real(jnp.asarray(poles)[..., 0])
    return jnp.asarray(params.gains)[..., 0]


def prepare(params, state: AgentState) -> AgentState:
    """Initialize the dynamics-internal state from the CSF state
    (reference dynamics.py:827: _transform_state_csf2dynamics)."""
    dyn_x = state.dyn_x.at[:, 0].set(state.s[:, PSI])
    dyn_x = dyn_x.at[:, 1].set(state.s[:, X])
    dyn_x = dyn_x.at[:, 2].set(state.s[:, Y])
    return state.replace(dyn_x=dyn_x, dyn_v=state.s[:, V])


def step(params, state: AgentState, fx, fy) -> AgentState:
    """One speed + exact-midpoint lateral step
    (reference dynamics.py:1041-1079)."""
    t_s = params.t_s

    # speed: P control, acceleration + speed clamps
    vd = jnp.sqrt(fx**2 + fy**2)
    a = params.k_p_v * (vd - state.dyn_v)
    a = thresh(a, (pair_lo(params.a_max), pair_hi(params.a_max)))
    v_new = thresh(state.dyn_v + t_s * a,
                   (pair_lo(params.v_max_riding),
                    pair_hi(params.v_max_riding)))
    # midpoint speed: average of new dynamics speed and the CSF state speed
    # (reference dynamics.py:1056: (v + vehicle.s[3]) / 2)
    v_mid = (v_new + state.s[:, V]) / 2

    # commanded yaw (reference dynamics.py:116-125)
    psi_c = limit_angle(jnp.arctan2(fy, fx))

    # exact implicit-midpoint solution of the triangular system
    k = yaw_gain(params)
    hk2 = t_s * k / 2
    psi = state.dyn_x[:, 0]
    psi_next = ((1 - hk2) * psi + 2 * hk2 * psi_c) / (1 + hk2)
    psi_mid = (psi + psi_next) / 2
    x_next = state.dyn_x[:, 1] + t_s * v_mid * jnp.cos(psi_mid)
    y_next = state.dyn_x[:, 2] + t_s * v_mid * jnp.sin(psi_mid)

    dyn_x = (state.dyn_x.at[:, 0].set(psi_next)
             .at[:, 1].set(x_next).at[:, 2].set(y_next))
    s = (state.s.at[:, X].set(x_next).at[:, Y].set(y_next)
         .at[:, PSI].set(limit_angle(psi_next)).at[:, V].set(v_new))
    return state.replace(s=s, dyn_x=dyn_x, dyn_v=v_new)
