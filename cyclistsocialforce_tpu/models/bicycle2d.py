"""2D kinematic two-wheeler with P-controlled steer and speed loops.

TPU-native port of the v0.1 `Bicycle` model (reference vehicle.py:990-1289,
"planartwowheel" in the standalone demo): two independent P controllers
track the force direction (via the steer angle) and the force magnitude
(via acceleration); the pose advances through standard bicycle kinematics
psi_dot = v tan(delta) / l.

The whole step is an elementwise function over the agent axis -- no vmap
needed.
"""

from __future__ import annotations

import jax.numpy as jnp

from cyclistsocialforce_tpu.ops.control import pid_step
from cyclistsocialforce_tpu.params import pair_hi, pair_lo
from cyclistsocialforce_tpu.state import DELTA, PSI, V, X, Y, AgentState
from cyclistsocialforce_tpu.utils.angles import (
    angle_difference,
    limit_angle,
    thresh,
)

N_STATES = 5
REP_FORCE = "legacy"   # reference Bicycle uses the legacy elliptic field
DEST_FORCE = "straight"
# internal state fields this model touches (make_state(model=...) sizes
# the rest to zero width -- see state.make_state)
STATE_WIDTHS = {"dyn_x": 0, "dyn_gains": 0, "zrid": 0}


def control(params, state: AgentState, fx, fy):
    """Bicycle.control (reference vehicle.py:1218-1245).

    Returns (a, odelta, pid_e, pid_i): acceleration and steer-rate commands
    plus updated controller state.
    """
    theta = jnp.arctan2(fy, fx)
    v_cmd = jnp.sqrt(fx**2 + fy**2)

    ddest = jnp.sqrt((state.dest[:, 0] - state.s[:, X]) ** 2
                     + (state.dest[:, 1] - state.s[:, Y]) ** 2)
    is_last = state.destpointer + 1 >= state.nq
    v_cmd = jnp.where((ddest < 3.0) & is_last, v_cmd / 3.0 * ddest, v_cmd)

    target_angle_ego = angle_difference(state.s[:, PSI], theta)
    ddelta = angle_difference(state.s[:, DELTA], target_angle_ego)
    dv = v_cmd - state.s[:, V]

    zero = jnp.zeros_like(ddelta)
    odelta, e0, i0 = pid_step(ddelta, state.pid_e[:, 0], state.pid_i[:, 0],
                              params.k_p_delta, zero, zero, params.t_s)
    a, e1, i1 = pid_step(dv, state.pid_e[:, 1], state.pid_i[:, 1],
                         params.k_p_v, zero, zero, params.t_s)

    pid_e = jnp.stack([e0, e1], axis=1)
    pid_i = jnp.stack([i0, i1], axis=1)
    return a, odelta, pid_e, pid_i


def move(params, s, a, odelta):
    """Bicycle.move kinematics (reference vehicle.py:1247-1272)."""
    t_s = params.t_s
    a = thresh(a, (pair_lo(params.a_max), pair_hi(params.a_max)))
    delta = limit_angle(s[:, DELTA] + t_s * odelta)
    v = s[:, V] + t_s * a
    delta = thresh(delta, (-params.delta_max, params.delta_max))
    v = thresh(v, (pair_lo(params.v_max_riding), pair_hi(params.v_max_riding)))
    psi = limit_angle(s[:, PSI] + t_s * v * jnp.tan(delta) / params.l)
    y = s[:, Y] + t_s * v * jnp.sin(psi)
    x = s[:, X] + t_s * v * jnp.cos(psi)
    # strong-typed f64 params (e.g. MixedEngine group params) promote the
    # intermediates; cast back at the state-write boundary (implicit
    # scatter promotion is a FutureWarning on its way to a hard error)
    dt = s.dtype
    return (s.at[:, X].set(x.astype(dt)).at[:, Y].set(y.astype(dt))
            .at[:, PSI].set(psi.astype(dt)).at[:, V].set(v.astype(dt))
            .at[:, DELTA].set(delta.astype(dt)))


def step(params, state: AgentState, fx, fy) -> AgentState:
    """One control + kinematics step (reference vehicle.py:1274-1289)."""
    a, odelta, pid_e, pid_i = control(params, state, fx, fy)
    s = move(params, state.s, a, odelta)
    return state.replace(s=s, pid_e=pid_e, pid_i=pid_i)
