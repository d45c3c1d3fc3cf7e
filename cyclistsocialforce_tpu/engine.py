"""The social-force interaction engine.

TPU-native equivalent of `SocialForceIntersection`
(reference intersection.py:253-916): owns one agent population on a shared
space and advances it one step at a time --

  1. destination forces (incl. destination-queue + navigation-FSM updates,
     reference intersection.py:797-799),
  2. pairwise repulsive forces with FOV / priority masking
     (reference intersection.py:788, 813-823),
  3. repulsive-force magnitude clamp + summation
     (reference intersection.py:825-848),
  4. infrastructure (road-edge) forces (reference intersection.py:853-857),
  5. one dynamics step of every agent (reference intersection.py:891-892).

Instead of Python loops over vehicle objects, every stage is a vectorized
pure function over the ``[N]`` agent axis; `step` composes them into one
jittable function and `simulate` runs it under `lax.scan`.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from cyclistsocialforce_tpu.ops import forces as F
from cyclistsocialforce_tpu.ops import navigation as nav
from cyclistsocialforce_tpu.params import pair_hi
from cyclistsocialforce_tpu.state import PSI, V, X, Y, AgentState


class NavParams(struct.PyTreeNode):
    """Per-agent view of the parameters consumed by the navigation FSM."""

    d_arrived_inter: Any
    d_arrived_stop: Any
    v_max_stop: Any
    v_max_harddecel: Any
    v_desired_default: Any
    a_max: Any
    a_desired_default: Any


def nav_params_view(params, n: int) -> NavParams:
    """Broadcast the navigation-relevant fields to per-agent arrays."""
    def b(x):
        return jnp.broadcast_to(jnp.asarray(x), (n,))

    def bpair(x):
        return jnp.broadcast_to(jnp.asarray(x), (n, 2))

    return NavParams(
        d_arrived_inter=b(params.d_arrived_inter),
        d_arrived_stop=b(params.d_arrived_stop),
        v_max_stop=b(params.v_max_stop),
        v_max_harddecel=b(params.v_max_harddecel),
        v_desired_default=b(params.v_desired_default),
        a_max=bpair(params.a_max),
        a_desired_default=bpair(params.a_desired_default),
    )


# --------------------------------------------------------------------------
# destination-force stages (each returns (fx, fy, new_state))
# --------------------------------------------------------------------------


def dest_force_straight(params, state: AgentState):
    """Destination update + nav FSM + straight-line force.

    Port of Bicycle.calcDestinationForceField/calcDestinationForce
    (reference vehicle.py:1150-1194) and the identical free function
    calc_direct_approach_dest_force (reference vehicle.py:2078-2108).
    """
    n = state.n
    npar = nav_params_view(params, n)

    def per_agent(pos, v, dest, dq, ptr, nq, znav, znavp, i, istop, dstop, p):
        dest, ptr, istop, dstop = nav.update_destination(
            pos, dest, dq, ptr, nq, znav, i, istop, dstop,
            p.d_arrived_inter)
        ddest = nav.dest_distance(pos, dq, ptr)
        vd, znav, znavp = nav.update_nav_state(
            v, ddest, dest[2], znav, znavp, i, p)
        fx, fy = F.dest_force_straight(pos[0], pos[1], dest[0], dest[1],
                                       vd, ddest)
        return fx, fy, dest, ptr, znav, znavp, istop, dstop

    fx, fy, dest, ptr, znav, znavp, istop, dstop = jax.vmap(per_agent)(
        state.s[:, :2], state.s[:, V], state.dest, state.destqueue,
        state.destpointer, state.nq, state.znav, state.znavparams,
        state.i, state.i_stopsignal, state.d_stopsignal, npar)

    new_state = state.replace(
        dest=dest, destpointer=ptr, znav=znav, znavparams=znavp,
        i_stopsignal=istop, d_stopsignal=dstop)
    return fx, fy, new_state


# --------------------------------------------------------------------------
# pairwise repulsive-force tiles
#
# Every repulsive field is expressed as a TILE function
#   rep_tile(params, src, recv) -> (Fx, Fy) shaped [S, R]
# with src = (x, y, psi, v) of the emitting agents ([S] each, carrying the
# force-field parameters) and recv = (x, y, psi) of the receiving agents
# ([R] each). The same tile serves the dense [N, N] case (small N), the
# receiver-chunked case (large N, bounded memory), and the shard_map case
# (sources all-gathered across devices, receivers local).
# --------------------------------------------------------------------------


def _bsrc(p, n):
    """Broadcast a (scalar or [N]) source parameter to the [N, 1] source
    axis of the pairwise matrices."""
    return jnp.broadcast_to(jnp.asarray(p), (n,))[:, None]


def rep_tile_twod(params, src, recv):
    """Tile of the BMD2023 2D-model repulsive field; [i, j] = force exerted
    by source i at receiver j's position. Heading trig is hoisted to the
    [S]/[R] axes so the [S, R] inner loop is trig-free."""
    xs, ys, psis, _ = src
    xr, yr, psir = recv
    n = xs.shape[0]
    dx = xr[None, :] - xs[:, None]
    dy = yr[None, :] - ys[:, None]
    return F.rep_force_twod_pair(
        dx, dy,
        jnp.cos(psis)[:, None], jnp.sin(psis)[:, None],
        jnp.cos(psir)[None, :], jnp.sin(psir)[None, :],
        _bsrc(params.f_0, n), _bsrc(params.e_0, n), _bsrc(params.e_1, n),
        _bsrc(params.sigma_0, n), _bsrc(params.sigma_1, n),
        _bsrc(params.sigma_2, n), _bsrc(params.sigma_3, n))


def rep_tile_legacy(params, src, recv):
    """Tile of the legacy v0.1 elliptic field; the speed-dependent
    excentricity terms are hoisted to the source axis."""
    xs, ys, psis, vs = src
    xr, yr, _ = recv
    n = xs.shape[0]
    dx = xr[None, :] - xs[:, None]
    dy = yr[None, :] - ys[:, None]
    e = F.legacy_excentricity(
        jnp.broadcast_to(vs, (n,)),
        jnp.broadcast_to(jnp.asarray(pair_hi(params.v_max_riding)), (n,)))
    inv_se = 1.0 / jnp.sqrt(1 - e**2)
    p_decay = jnp.broadcast_to(jnp.asarray(params.p_decay), (n,))
    p_0 = jnp.broadcast_to(jnp.asarray(params.p_0), (n,))
    return F.rep_force_legacy_pair(
        dx, dy, jnp.cos(psis)[:, None], jnp.sin(psis)[:, None],
        e[:, None], inv_se[:, None], (1.0 / p_decay)[:, None],
        (p_0 / p_decay)[:, None])


DEST_FORCES: dict[str, Callable] = {
    "straight": dest_force_straight,
    "direct": dest_force_straight,
}

REP_FORCES: dict[str, Callable] = {
    "twod": rep_tile_twod,
    "legacy": rep_tile_legacy,
}


class RoadElements(struct.PyTreeNode):
    """Stacked road-edge geometry: padded vertex array + validity weights."""

    vertices: Any   # [Vtot, 2]
    weights: Any    # [Vtot]
    F_0: Any        # scalar or [Vtot]
    sigma: Any      # scalar or [Vtot]


class Engine(struct.PyTreeNode):
    """One shared space with one (homogeneous-model) agent population."""

    params: Any
    road: Any = None                        # RoadElements or None
    model_step: Callable = struct.field(pytree_node=False, default=None)
    dest_force: Callable = struct.field(pytree_node=False,
                                        default=dest_force_straight)
    rep_force: Callable | None = struct.field(pytree_node=False,
                                              default=rep_tile_twod)
    priority_p2r: bool = struct.field(pytree_node=False, default=False)
    # Receiver-axis chunk size for the O(N^2) force assembly. None = dense
    # [N, N] (fastest for small N); an int C bounds peak memory to O(N*C)
    # by lax.map-ing over N/C receiver tiles (required for N ~ 100k).
    rep_chunk: int | None = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, params, model, road=None, dest_force=None,
               rep_force=None, priority_rule: str = "unregulated",
               rep_chunk: int | None = None):
        """Build an engine from a model module (see models/ registry).

        `model` provides `step` and default `DEST_FORCE` / `REP_FORCE` names
        (the reference's strategy-injection API, vehicle.py:111-135).
        """
        dest = dest_force or DEST_FORCES[model.DEST_FORCE]
        if isinstance(dest, str):
            dest = DEST_FORCES[dest]
        rep = rep_force if rep_force is not None else REP_FORCES[
            model.REP_FORCE]
        if isinstance(rep, str):
            rep = REP_FORCES[rep]
        return cls(params=params, road=road, model_step=model.step,
                   dest_force=dest, rep_force=rep,
                   priority_p2r=(priority_rule == "p2r"),
                   rep_chunk=rep_chunk)

    # ---- one simulation step ----

    def _src_bundle(self, state: AgentState):
        """Source-side fields of the pairwise force stage."""
        return (state.s[:, X], state.s[:, Y], state.s[:, PSI], state.s[:, V])

    def repulsive_sum(self, state: AgentState, src=None, idx_src=None,
                      active_src=None, hfov_src=None, recv_offset=0):
        """Summed repulsive force on every agent in `state` (the receivers).

        By default sources == receivers (single-device population). The
        shard_map path passes all-gathered `src`/`idx_src`/`active_src`/
        `hfov_src` covering the global population while `state` is the
        local shard whose global indices start at `recv_offset`.
        """
        n = state.n
        if src is None:
            src = self._src_bundle(state)
            idx_src = jnp.arange(n)
            active_src = state.active
            hfov_src = jnp.broadcast_to(jnp.asarray(self.params.hfov), (n,))
        xs, ys, _, _ = src

        def recv_tile(ri):
            recv = (state.s[ri, X], state.s[ri, Y], state.s[ri, PSI])
            fpx, fpy = self.rep_force(self.params, src, recv)
            untracked = F.untracked_foes_tile(
                xs, ys, idx_src, active_src, hfov_src,
                recv[0], recv[1], recv[2], ri + recv_offset,
                state.active[ri], priority_p2r=self.priority_p2r)
            return F.sum_sources(fpx, fpy, ~untracked)

        idx_recv = jnp.arange(n)
        if self.rep_chunk is None or self.rep_chunk >= n:
            return recv_tile(idx_recv)
        c = self.rep_chunk
        if n % c != 0:
            raise ValueError(f"rep_chunk={c} must divide N={n}.")
        frx, fry = jax.lax.map(recv_tile, idx_recv.reshape(n // c, c))
        return frx.reshape(n), fry.reshape(n)

    def calc_forces(self, state: AgentState):
        """Total social force per agent; returns (fx, fy, state) where
        `state` carries the navigation-FSM updates done by the destination
        force (reference intersection.py:747-864)."""
        fdx, fdy, state = self.dest_force(self.params, state)

        if self.rep_force is not None and state.n > 1:
            frx, fry = self.repulsive_sum(state)
            fx, fy = F.clamp_add_dest(frx, fry, fdx, fdy)
        else:
            fx, fy = fdx, fdy

        if self.road is not None:
            rx, ry = F.road_edge_force(
                state.s[:, X], state.s[:, Y], self.road.vertices,
                self.road.weights, self.road.F_0, self.road.sigma)
            fx = fx + rx
            fy = fy + ry
        return fx, fy, state

    def finish_step(self, before: AgentState, new: AgentState):
        """Post-dynamics bookkeeping: freeze inactive agents, advance the
        step counter, record the position ring buffer
        (reference vehicle.py:319-321, 1279-1282: traj[:, i] <- s)."""
        merged = _freeze_inactive(before.active, before, new)
        i = merged.i + jnp.where(before.active, 1, 0)
        slot = i % merged.hist_len
        pos_hist = merged.pos_hist.at[
            jnp.arange(merged.n), slot, :].set(merged.s[:, :2])
        return merged.replace(i=i, pos_hist=pos_hist)

    def step_with_forces(self, state: AgentState):
        """One full step; also returns the applied forces (for saveForces
        histories, reference vehicle.py:162-164)."""
        before = state
        fx, fy, state = self.calc_forces(state)
        new = self.model_step(self.params, state, fx, fy)
        return self.finish_step(before, new), fx, fy

    def step(self, state: AgentState) -> AgentState:
        return self.step_with_forces(state)[0]

    # ---- scan loop ----

    def simulate(self, state: AgentState, n_steps: int,
                 record: bool = True, record_forces: bool = False):
        """Run `n_steps` under lax.scan.

        Returns (final_state, traj) where traj is [T, N, 8] recorded states
        (and optionally a (fx, fy) history), or (final_state, None).
        """
        def body(st, _):
            st, fx, fy = self.step_with_forces(st)
            if record and record_forces:
                return st, (st.s, fx, fy)
            if record:
                return st, st.s
            return st, None

        return jax.lax.scan(body, state, None, length=n_steps)


_PER_AGENT_FIELDS = (
    "s", "dyn_x", "dyn_v", "pid_e", "pid_i", "dest", "destqueue",
    "destpointer", "nq", "znav", "znavparams", "i_stopsignal",
    "d_stopsignal", "zrid", "walk_ok_steps",
)


def _freeze_inactive(act, old: AgentState, new: AgentState) -> AgentState:
    """Hold the complete pre-step state of inactive agents."""
    upd = {}
    for f in _PER_AGENT_FIELDS:
        o, u = getattr(old, f), getattr(new, f)
        mask = act.reshape((-1,) + (1,) * (u.ndim - 1))
        upd[f] = jnp.where(mask, u, o)
    return new.replace(**upd)


def simulate_jit(engine: Engine, state: AgentState, n_steps: int,
                 **kw):
    """jit-compiled convenience wrapper around Engine.simulate."""
    fn = jax.jit(lambda e, s: e.simulate(s, n_steps, **kw))
    return fn(engine, state)
