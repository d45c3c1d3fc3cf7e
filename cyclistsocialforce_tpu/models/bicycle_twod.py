"""2D kinematic two-wheeler of the BMD2023 paper ("TwoDBicycle").

TPU-native port of the reference's TwoDBicycle (vehicle.py:1292-1648): the
same P-controlled kinematics as the v0.1 Bicycle, but with

  * the spline path-planning destination force (engine.dest_force_spline,
    reference vehicle.py:1416-1558),
  * the new angular-modulated elliptic repulsive field
    (ops.forces.rep_force_twod_pair, reference vehicle.py:1560-1648),
  * an arrived-freeze: once the navigation FSM latches "arrived", speed,
    steer and roll are zeroed and control is skipped
    (reference vehicle.py:1397-1400).
"""

from __future__ import annotations

import jax.numpy as jnp

from cyclistsocialforce_tpu.models import bicycle2d
from cyclistsocialforce_tpu.state import DELTA, THETA, V, AgentState

N_STATES = 5
REP_FORCE = "twod"
DEST_FORCE = "spline"
# the global-clock ring write + cond-gated spline fallback shrank this
# model's step body back under the sorted-residency scheduling
# threshold (BASELINE.md "Global-clock" section: 7.04 ms/step SR vs
# 8.21 no-SR at bench scale) -- sorted residency is a win again
SORTED_RESIDENT = True
STATE_WIDTHS = {"dyn_x": 0, "dyn_gains": 0, "zrid": 0}


def step(params, state: AgentState, fx, fy) -> AgentState:
    """One control + kinematics step with arrived-freeze
    (reference vehicle.py:1386-1414)."""
    a, odelta, pid_e, pid_i = bicycle2d.control(params, state, fx, fy)
    s_moved = bicycle2d.move(params, state.s, a, odelta)

    arrived = state.znav[:, 2]
    s_frozen = (state.s.at[:, V].set(0.0).at[:, DELTA].set(0.0)
                .at[:, THETA].set(0.0))
    s = jnp.where(arrived[:, None], s_frozen, s_moved)
    # control (incl. PID state) is skipped entirely when arrived
    pid_e = jnp.where(arrived[:, None], state.pid_e, pid_e)
    pid_i = jnp.where(arrived[:, None], state.pid_i, pid_i)
    return state.replace(s=s, pid_e=pid_e, pid_i=pid_i)
