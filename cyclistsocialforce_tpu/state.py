"""Structure-of-arrays agent state pytree.

Replaces the reference's object-per-agent `Vehicle` state
(reference: src/cyclistsocialforce/vehicle.py:64-204) with one device-resident
pytree of ``[N, ...]`` arrays: positions/orientations, dynamics latents,
controller states, the destination queue + navigation finite-state machine,
and a short position ring buffer (used by the spline destination force and
the riding/walking FSM instead of the reference's 30 s trajectory buffer).

The whole simulation state is a single pytree: checkpoint/resume is a pytree
save/load, sharding is a NamedSharding over the leading agent axis.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from cyclistsocialforce_tpu.utils.angles import limit_angle

# Unified state-vector layout (superset of all models; reference
# vehicle.py:1960 BalancingRiderBicycle.STATE_NAMES):
#   s[:, 0] x [m]        s[:, 1] y [m]       s[:, 2] psi (yaw) [rad]
#   s[:, 3] v [m/s]      s[:, 4] delta (steer) [rad]
#   s[:, 5] theta (roll) [rad]
#   s[:, 6] delta-rate [rad/s]   s[:, 7] theta-rate [rad/s]
STATE_DIM = 8

X, Y, PSI, V, DELTA, THETA, DDELTA, DTHETA = range(8)


class AgentState(struct.PyTreeNode):
    # core state
    s: Any                 # [N, 8] float
    # dynamics-internal latent state (meaning depends on the model family)
    dyn_x: Any             # [N, 7] float
    dyn_v: Any             # [N] float, speed tracked by the dynamics engine
    # cached controller gains / control-behavior latents (model-dependent;
    # e.g. BalancingRider: K_x[0:5], pole features[5:10], v_last_update[10]
    # -- the analog of the reference's gains-if-speed-changed cache,
    # dynamics.py:680-681, and the stochastic pole-resampling hysteresis,
    # parameters.py:1397-1411)
    dyn_gains: Any         # [N, 12] float
    # PID controller states: column 0 = steer loop, column 1 = speed loop
    pid_e: Any             # [N, 2] float, previous error
    pid_i: Any             # [N, 2] float, integral accumulator
    # destinations (reference vehicle.py:183-188)
    dest: Any              # [N, 3] float (x, y, stop-flag)
    destqueue: Any         # [N, Q, 3] float
    destpointer: Any       # [N] int32
    nq: Any                # [N] int32, number of valid queue entries
    # navigation FSM (reference vehicle.py:354-457)
    znav: Any              # [N, 3] bool: (cruising, stopping, arrived)
    znavparams: Any        # [N, 4] float: (v0, d0, d1, i_set)
    # stop-signal bookkeeping (reference vehicle.py:590-594)
    i_stopsignal: Any      # [N] int32
    d_stopsignal: Any      # [N] float
    # riding/walking FSM of the inverted-pendulum model
    # (reference vehicle.py:1932-1950)
    zrid: Any              # [N, 2] bool: (riding, walking)
    walk_ok_steps: Any     # [N] int32: consecutive steps with
    #                        |delta| < delta_max_walk (incremental replacement
    #                        of the reference's 1 s trajectory scan)
    # step counter and position history ring buffer
    i: Any                 # [N] int32
    # pos_hist is indexed by the GLOBAL step clock t_glob: slot t % H
    # holds every agent's position at global step t (frozen agents
    # rewrite their held position; unwritten slots keep the initial
    # position, which make_state broadcasts into the whole ring). For an
    # agent active since t = 0 this is identical to per-agent-step
    # indexing; a scalar slot makes the per-step ring write a
    # dynamic_update_slice ([N, 1, 2]) instead of a full-ring one-hot
    # rewrite (~200 MB/step at N = 1e5, H = 128), and the spline
    # destination force's lookback reads become dynamic slices.
    t_glob: Any            # [] int32, global step clock (ring-slot index)
    pos_hist: Any          # [N, H, 2] float, slot t_glob % H = pos @ step t
    # population mask for dynamic add/remove without reshaping
    active: Any            # [N] bool
    # persistent per-agent identity: stochastic draws are keyed by
    # (key, t_glob, uid), so an agent's random stream follows it through
    # row permutations (sorted residency) and device sharding -- see
    # agent_streams
    uid: Any               # [N] int32
    key: Any               # master PRNG key (CONSTANT; never split --
    #                        per-step streams derive from t_glob + uid)

    @property
    def n(self) -> int:
        return self.s.shape[0]

    @property
    def hist_len(self) -> int:
        return self.pos_hist.shape[1]

    @property
    def queue_size(self) -> int:
        return self.destqueue.shape[1]


# default widths of the model-dependent internal fields (the most any
# shipped model needs); `make_state(model=...)` right-sizes them instead
_DEFAULT_WIDTHS = {"dyn_x": 7, "dyn_gains": 12, "zrid": 2}


def make_state(s0, queue_size: int = 16, hist_len: int = 128,
               v_max_walk=None, dtype=jnp.float32,
               seed: int = 0, model=None) -> AgentState:
    """Create an AgentState population from initial states.

    Parameters
    ----------
    s0 : array-like [N, k], k <= 8
        Initial per-agent states (x, y, psi, v[, delta, theta, ddelta,
        dtheta]); missing trailing entries are zero-filled (the reference
        truncates/expects model-specific lengths, vehicle.py:149-155).
    queue_size : int
        Fixed destination-queue capacity Q.
    hist_len : int
        Position ring-buffer length H. Must be > 1/t_s + 1 for exact parity
        of the spline destination force's last-destination branch
        (reference vehicle.py:1486-1492).
    v_max_walk : optional scalar/[N]
        If given, initializes the riding/walking FSM from the initial speed
        (reference vehicle.py:1731-1736); otherwise agents start "riding".
    model : optional model module (an entry of `models.MODELS`)
        Right-sizes the model-dependent internal fields (dyn_x, dyn_gains,
        zrid) to the model's declared `STATE_WIDTHS`; fields the model
        never touches become ZERO-width. This is a pure memory/layout
        optimization -- zero-width fields ride through the engine, the
        sharded schedules, and checkpointing unchanged. It matters at
        mega scale: arrays a step function never reads keep XLA's default
        row-major layout, whose (8, 128) tiling pads the narrow minor dim
        to 128 lanes (~8.5 GB of padding for the three fields at N = 8e6
        -- the observed HBM wall; used fields get packed layouts anyway).
        Without `model` the defaults (7/12/2) fit every shipped model.
    """
    widths = dict(_DEFAULT_WIDTHS)
    if model is not None:
        widths.update(getattr(model, "STATE_WIDTHS", {}))
    s0 = jnp.asarray(s0, dtype=dtype)
    if s0.ndim == 1:
        s0 = s0[None]
    n, k = s0.shape
    s = jnp.zeros((n, STATE_DIM), dtype=dtype)
    s = s.at[:, :k].set(s0)
    s = s.at[:, PSI].set(limit_angle(s[:, PSI]))

    dest = jnp.concatenate(
        [s[:, :2], jnp.zeros((n, 1), dtype=dtype)], axis=1)
    destqueue = jnp.zeros((n, queue_size, 3), dtype=dtype)
    destqueue = destqueue.at[:, 0, :].set(dest)

    znav = jnp.zeros((n, 3), dtype=bool).at[:, 0].set(True)

    if v_max_walk is not None and widths["zrid"] == 0:
        raise ValueError(
            "v_max_walk initializes the riding/walking FSM, but the "
            "given model declares no zrid state (STATE_WIDTHS['zrid']=0)")
    if widths["zrid"]:
        if v_max_walk is not None:
            walking = s[:, V] < jnp.asarray(v_max_walk, dtype=dtype)
        else:
            walking = jnp.zeros((n,), dtype=bool)
        zrid = jnp.stack([~walking, walking], axis=1)
    else:
        zrid = jnp.zeros((n, 0), dtype=bool)

    pos_hist = jnp.broadcast_to(s[:, None, :2], (n, hist_len, 2)).astype(dtype)

    return AgentState(
        s=s,
        dyn_x=jnp.zeros((n, widths["dyn_x"]), dtype=dtype),
        dyn_v=s[:, V],
        dyn_gains=jnp.zeros((n, widths["dyn_gains"]), dtype=dtype),
        pid_e=jnp.zeros((n, 2), dtype=dtype),
        pid_i=jnp.zeros((n, 2), dtype=dtype),
        dest=dest,
        destqueue=destqueue,
        destpointer=jnp.zeros((n,), dtype=jnp.int32),
        nq=jnp.ones((n,), dtype=jnp.int32),
        znav=znav,
        znavparams=jnp.zeros((n, 4), dtype=dtype),
        i_stopsignal=jnp.zeros((n,), dtype=jnp.int32),
        d_stopsignal=jnp.zeros((n,), dtype=dtype),
        zrid=zrid,
        walk_ok_steps=jnp.zeros((n,), dtype=jnp.int32),
        i=jnp.zeros((n,), dtype=jnp.int32),
        t_glob=jnp.zeros((), dtype=jnp.int32),
        pos_hist=pos_hist,
        active=jnp.ones((n,), dtype=bool),
        uid=jnp.arange(n, dtype=jnp.int32),
        key=jax.random.PRNGKey(seed),
    )


def agent_streams(key, t_glob, uid, salt: int):
    """Per-agent PRNG keys as a pure function of (master key, global step
    clock, agent uid, call-site salt).

    Stochastic draws keyed this way are bit-identical under any row
    permutation (the sorted-resident simulate path) and any device
    sharding (the uid rides the row through permute_state and
    shard_state) -- a sharded stochastic run reproduces its single-device
    run exactly. The reference's RNG (one global numpy stream,
    parameters.py:1376-1411) has no such property; this is strictly
    stronger than its distribution-level semantics. Cost: two bulk
    threefry passes over [N] on the VPU (the per-agent key LADDER --
    split chains inside a scan -- was the round-2 30 ms/step trap; a
    vmapped fold_in is one vectorized pass).
    """
    ks = jax.random.fold_in(jax.random.fold_in(key, salt), t_glob)
    # fence the folded keys: XLA otherwise fuses the vmapped threefry
    # chain into every downstream consumer, which re-schedules large
    # sorted-resident step graphs (see models/balancingrider.py)
    return jax.lax.optimization_barrier(
        jax.vmap(lambda u: jax.random.fold_in(ks, u))(uid))


def set_destinations(state: AgentState, agent: int, x, y, stop=None,
                     reset: bool = False) -> AgentState:
    """Append (or reset to) a destination list for one agent.

    Host-side scenario-setup helper mirroring Vehicle.setDestinations
    (reference vehicle.py:606-647). `x`, `y`, `stop` are 1-D sequences.
    """
    x = jnp.atleast_1d(jnp.asarray(x, dtype=state.s.dtype))
    y = jnp.atleast_1d(jnp.asarray(y, dtype=state.s.dtype))
    if stop is None:
        stop = jnp.zeros_like(x)
    else:
        stop = jnp.atleast_1d(jnp.asarray(stop, dtype=state.s.dtype))
    new = jnp.stack([x, y, stop], axis=1)
    m = new.shape[0]
    q = state.destqueue

    if reset:
        if m > state.queue_size:
            raise ValueError(f"Destination list ({m}) exceeds queue size "
                             f"({state.queue_size}).")
        qa = jnp.zeros_like(q[agent]).at[:m, :].set(new)
        return state.replace(
            destqueue=q.at[agent].set(qa),
            destpointer=state.destpointer.at[agent].set(0),
            nq=state.nq.at[agent].set(m),
            dest=state.dest.at[agent].set(new[0]),
        )

    start = int(state.nq[agent])
    if start + m > state.queue_size:
        raise ValueError(f"Destination queue overflow: {start}+{m} > "
                         f"{state.queue_size}.")
    qa = q[agent].at[start:start + m, :].set(new)
    return state.replace(
        destqueue=q.at[agent].set(qa),
        nq=state.nq.at[agent].set(start + m),
    )


def set_spline_destinations(state: AgentState, agent: int, x, y,
                            npoints: int, stop: bool = False,
                            reset: bool = False) -> AgentState:
    """Set intermediate destinations along a cubic spline through the
    given waypoints, starting at the agent's current position.

    Host-side port of Vehicle.setSplineDestinations (reference
    vehicle.py:649-693); the spline resampling itself lives in
    `trajectory.generate_spline_prototype`.
    """
    import numpy as np

    from cyclistsocialforce_tpu.trajectory import generate_spline_prototype

    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    if x.size < 3:
        raise ValueError(
            "Provide at least 3 points to calculate a cubic trajectory "
            "prototype")
    x = np.insert(x, 0, float(state.s[agent, X]))
    y = np.insert(y, 0, float(state.s[agent, Y]))
    xi, yi = generate_spline_prototype(x, y, npoints)
    flags = np.zeros_like(xi)
    if stop:
        flags[-1] = 1.0
    return set_destinations(state, agent, xi, yi, stop=flags, reset=reset)


def stop(state: AgentState, agent: int, stoptype: int = 0,
         stopdest=None, a_brake=None) -> AgentState:
    """Make one agent come to a halt (reference vehicle.py:459-503).

    stoptype 0: flag the current destination as a stop destination.
    stoptype 1: emergency stop at the projected braking point.
    stoptype 2: stop at the given location ``stopdest``.
    """
    if stoptype == 0:
        return state.replace(dest=state.dest.at[agent, 2].set(1.0))
    if stoptype in (1, 2):
        if stoptype == 1:
            assert a_brake is not None, "Provide a_brake (params.a_max[0])."
            v = state.s[agent, V]
            tstop = jnp.abs(v / a_brake)
            dstop = 1.1 * (v * tstop + 0.5 * a_brake * tstop**2)
            # Reference quirk (vehicle.py:491-492): uses sin for x, cos for y.
            xstop = state.s[agent, X] + dstop * jnp.sin(state.s[agent, PSI])
            ystop = state.s[agent, Y] + dstop * jnp.cos(state.s[agent, PSI])
        else:
            xstop, ystop = stopdest[0], stopdest[1]
        newdest = jnp.asarray([xstop, ystop, 1.0], dtype=state.s.dtype)
        ptr = jnp.maximum(state.destpointer[agent] - 1, 0)
        return state.replace(
            dest=state.dest.at[agent].set(newdest),
            destpointer=state.destpointer.at[agent].set(ptr),
        )
    raise ValueError("Stop type has to be one of [0,1,2].")


def go(state: AgentState, agent: int, gotype: int = 0) -> AgentState:
    """Continue after a stop (reference vehicle.py:505-535)."""
    if gotype == 0:
        return state.replace(dest=state.dest.at[agent, 2].set(0.0))
    if gotype == 1:
        newdest = state.destqueue[agent, state.destpointer[agent]]
        return state.replace(dest=state.dest.at[agent].set(newdest))
    raise ValueError("Go type has to be one of [0,1].")
