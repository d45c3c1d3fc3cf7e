"""External / third-party force models: the extension-API demonstration.

Port of the reference's `external.py` (reference external.py:1-182), which
shows how a completely different cyclist model -- the particle-based,
velocity-anisotropic model of Kaths (2023), DOI 10.3389/ffutr.2023.1183270
-- plugs into the framework through the strategy-injection points. Here
those points are the engine hooks: `dest_force`, `rep_force`,
`rep_reduce`, `combine_forces`, and the model module's `step`.

The Kaths model works in (Fv, Ft) channels -- a speed force and a turn
(yaw-rate) force -- instead of (Fx, Fy) velocity vectors; the engine
carries them through the same two force slots.

Faithfulness notes (implementation from the paper, like the reference's):
  - the destination bearing uses `arctan(dy/dx)` exactly like the
    reference (external.py:73-75), NOT atan2 -- both inherit the paper's
    small-heading assumption;
  - the reference's repulsive-force function aggregates over the wrong
    axis for the intersection's double-dispatch loop (it returns scalars
    where arrays are consumed, external.py:89-135); this port implements
    the PAPER's receiver-side aggregation: Fv from the NEAREST
    (anisotropically-distorted) neighbor distance, Ft summed over
    neighbors (Kaths 2023, eqs. 6-9);
  - stopping-at-traffic-lights and stochastic parameters are not included
    (same as the reference, external.py:33-36).
"""

from __future__ import annotations

import jax.numpy as jnp

from cyclistsocialforce_tpu.state import PSI, V, X, Y, AgentState
from cyclistsocialforce_tpu.utils.angles import limit_angle

N_STATES = 4

# Deterministic parameter set of the velocity-anisotropic model
# (reference get_kaths_veloaniso_paramset, external.py:52-66).
KATHS_VELOANISO_PARAMS = {
    "A_tb": 0.48,
    "R_vb": 3.10,
    "R_tb": 1.91,
    "gamma_tb": 0.97,
    "gamma_vb": 1.03,
    "eta_vb": 2.05,
    "eta_tb": 1.96,
    "T_vb": 2.05,
    "T_tb": 1.15,
}


def _kp(params, key, n):
    """Kaths parameter broadcast: looked up from params.rep_force /
    params.dest_force dicts (the reference's pluggable parameter slots,
    vehicle.py:111-125) with the published defaults."""
    src = {**KATHS_VELOANISO_PARAMS, **params.rep_force,
           **params.dest_force}
    return jnp.broadcast_to(jnp.asarray(src[key]), (n,))


def dest_force_kaths(params, state: AgentState):
    """Destination force (Fv, Ft) (reference
    calc_kaths_veloaniso_destination_force, external.py:69-84): relax the
    speed toward v_desired and the heading toward the destination bearing,
    each with its own time constant.

    NOTE: the reference's docstring claims the queue is advanced, but its
    code never calls updateDestination -- the Kaths model rides toward the
    CURRENT destination only (set it with `set_destinations(...,
    reset=True)`); parity-tested in tests/test_parity_walk_kaths.py. No
    navigation FSM either (same upstream)."""
    n = state.n
    s = state.s
    t_b0 = jnp.arctan((state.dest[:, 1] - s[:, Y])
                      / (state.dest[:, 0] - s[:, X]))
    vdes = jnp.broadcast_to(jnp.asarray(params.v_desired_default), (n,))
    Fv = (vdes - s[:, V]) / _kp(params, "T_vb", n)
    Ft = (t_b0 - s[:, PSI]) / _kp(params, "T_tb", n)
    return Fv, Ft, state


def rep_tile_kaths(params, src, recv):
    """Pairwise anisotropic interaction channels [S, R].

    Returns (Fv_pair, Ft_pair) where, per Kaths (2023) eqs. 6-9, the
    distance from receiver b to source i is distorted along b's heading
    (eta: lateral stretch; gamma: alignment shift by the headings' dot
    product):

        D* = d.e_v + eta * |d.e_w| + gamma * (e_vb . e_vi)
        Fv_pair = -A_vb(b) exp(-D_v* / R_vb)     -> reduced by min
        Ft_pair = -A_tb  U  exp(-D_t* / R_tb)    -> reduced by sum

    with U the side sign (eq. 8) deciding the turn direction.
    """
    xs, ys, psis = src[0], src[1], src[2]
    xr, yr, psir, vr = recv
    n_recv = xr.shape[0]

    dx = xs[:, None] - xr[None, :]                  # source - receiver
    dy = ys[:, None] - yr[None, :]
    cvr, svr = jnp.cos(psir)[None, :], jnp.sin(psir)[None, :]
    cvs, svs = jnp.cos(psis)[:, None], jnp.sin(psis)[:, None]

    d_ev = dx * cvr + dy * svr                      # along receiver heading
    d_ew = -dx * svr + dy * cvr                     # lateral
    align = cvs * cvr + svs * svr                   # e_vb . e_vi

    eta_vb = _kp(params, "eta_vb", n_recv)[None, :]
    eta_tb = _kp(params, "eta_tb", n_recv)[None, :]
    gam_vb = _kp(params, "gamma_vb", n_recv)[None, :]
    gam_tb = _kp(params, "gamma_tb", n_recv)[None, :]
    R_vb = _kp(params, "R_vb", n_recv)[None, :]
    R_tb = _kp(params, "R_tb", n_recv)[None, :]
    A_tb = _kp(params, "A_tb", n_recv)[None, :]
    T_vb = _kp(params, "T_vb", n_recv)[None, :]
    vdes = jnp.broadcast_to(jnp.asarray(params.v_desired_default),
                            (n_recv,))

    # receiver amplitude A_vb from its desired/current speed
    # (reference external.py:101-104)
    A_vb = (vdes[None, :] + (T_vb - 1.0) * vr[None, :]) / T_vb

    D_v = d_ev + eta_vb * jnp.abs(d_ew) + gam_vb * align
    D_t = d_ev + eta_tb * jnp.abs(d_ew) + gam_tb * align

    U = jnp.sign(d_ew)                              # side of the receiver
    Fv_pair = -A_vb * jnp.exp(-D_v / R_vb)
    Ft_pair = -A_tb * U * jnp.exp(-D_t / R_tb)
    return Fv_pair, Ft_pair


def rep_reduce_kaths(fv_pair, ft_pair, tracked):
    """Receiver-side aggregation: Fv from the nearest masked neighbor
    (min of the negative exponentials == exp(-min D / R)), Ft summed."""
    fv = jnp.min(jnp.where(tracked, fv_pair, 0.0), axis=0)
    ft = jnp.sum(jnp.where(tracked, ft_pair, 0.0), axis=0)
    return fv, ft


def combine_forces_kaths(frv, frt, fdv, fdt):
    """Plain channel-wise addition -- no magnitude clamp (the clamp is an
    artifact of the velocity-vector semantics of the native model)."""
    return frv + fdv, frt + fdt


def step(params, state: AgentState, fv, ft) -> AgentState:
    """Kaths particle dynamics (reference step_kaths_particle_model,
    external.py:43-49): yaw rate and acceleration integration."""
    n = state.n
    t_s = jnp.broadcast_to(jnp.asarray(params.t_s), (n,))
    s = state.s
    psi = limit_angle(ft * t_s + s[:, PSI])
    v = s[:, V] + t_s * fv
    x = s[:, X] + t_s * v * jnp.cos(psi)
    y = s[:, Y] + t_s * v * jnp.sin(psi)
    s_new = (s.at[:, X].set(x).at[:, Y].set(y)
             .at[:, PSI].set(psi).at[:, V].set(v))
    return state.replace(s=s_new, dyn_v=v)


# engine hook exports (picked up by Engine.create via model attributes)
DEST_FORCE = dest_force_kaths
REP_FORCE = rep_tile_kaths
REP_REDUCE = rep_reduce_kaths
COMBINE_FORCES = combine_forces_kaths
