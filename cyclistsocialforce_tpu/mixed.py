"""Heterogeneous-model populations: different dynamics in one space.

The reference mixes vehicle classes freely because everything is an
object (e.g. an InvPendulumBicycle next to a PlanarPointBicycle in one
SocialForceIntersection); the SoA engine is homogeneous per population.
This module adds the mixed case as STATIC PARTITIONED BATCHES (SURVEY.md
section 7, hard part 4): agents are grouped by model into contiguous
slices fixed at build time, each group's destination force and dynamics
run on its slice, and the pairwise repulsive stage evaluates one tile per
FORCE FAMILY over the full population, selecting rows by the source
agent's family (force-field shape is a property of the emitting agent,
reference intersection.py:813-823).

Partitioned batches beat per-agent `lax.switch` here because the
composition never changes during a run: no wasted all-model evaluation,
no gather/scatter, and each group's step compiles exactly once.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from cyclistsocialforce_tpu import engine as eng
from cyclistsocialforce_tpu.engine import (_PER_AGENT_FIELDS, DEST_FORCES,
                                           REP_FORCES)
from cyclistsocialforce_tpu.ops import forces as F
from cyclistsocialforce_tpu.state import PSI, V, X, Y, AgentState

_SLICE_FIELDS = _PER_AGENT_FIELDS + ("i", "pos_hist", "active")


def state_slice(state: AgentState, lo: int, hi: int) -> AgentState:
    upd = {f: getattr(state, f)[lo:hi] for f in _SLICE_FIELDS}
    return state.replace(**upd)


def state_merge(state: AgentState, lo: int, hi: int,
                sub: AgentState) -> AgentState:
    # f64 group params can promote sub-state floats (e.g. dest updates)
    # past the global state dtype: cast at the scatter boundary (implicit
    # promotion in scatter is a FutureWarning on its way to a hard error)
    upd = {f: getattr(state, f).at[lo:hi].set(
               getattr(sub, f).astype(getattr(state, f).dtype))
           for f in _SLICE_FIELDS}
    # the master PRNG key stays GLOBAL and CONSTANT (state.py
    # contract): a group's derived sub-key must not leak back
    return state.replace(**upd)


class ModelGroup(struct.PyTreeNode):
    """One contiguous slice of agents sharing a model + params."""

    params: Any
    model_step: Any = struct.field(pytree_node=False)
    dest_force: Any = struct.field(pytree_node=False)
    rep_name: str = struct.field(pytree_node=False)
    lo: int = struct.field(pytree_node=False)
    hi: int = struct.field(pytree_node=False)


class MixedEngine(struct.PyTreeNode):
    """Interaction engine over a partitioned heterogeneous population.

    Build with `create(groups)` where groups is a list of
    (model_module_or_name, params, n_agents); agent rows [lo, hi) of the
    AgentState belong to group order. Road elements and the priority rule
    apply globally.

    With a `NeighborConfig` the pairwise stage runs block-sparse culled
    (cell sort + neighbor-block table) through the MIXED-family tile
    kernels (ops.pallas_forces `mixed=True`): each source row's packed
    family column selects twod vs legacy field math inside the same tile,
    so heterogeneous crowds (e.g. bikes + scripted cars) scale like the
    homogeneous engine instead of materializing [N, N]
    (reference intersection.py:813-823 double dispatch).

    `scripted` (a ScriptedTraj) marks agents that replay prescribed
    trajectories, ignore forces, but still EMIT their group's repulsive
    field (reference vehicle.py:920-987).
    """

    groups: Any                                   # tuple[ModelGroup]
    road: Any = None
    scripted: Any = None                          # ScriptedTraj or None
    priority_p2r: bool = struct.field(pytree_node=False, default=False)
    neighbors: Any = struct.field(pytree_node=False, default=None)
    full_fov: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, group_specs, road=None,
               priority_rule: str = "unregulated", scripted=None,
               neighbors=None):
        from cyclistsocialforce_tpu.models import MODELS

        groups = []
        lo = 0
        for model, params, n in group_specs:
            if isinstance(model, str):
                model = MODELS[model]
            dest = model.DEST_FORCE
            if isinstance(dest, str):
                dest = DEST_FORCES[dest]
            rep = model.REP_FORCE
            if not isinstance(rep, str):
                raise ValueError(
                    "MixedEngine supports the named force families "
                    f"{list(REP_FORCES)}; custom tiles need a dedicated "
                    "Engine")
            groups.append(ModelGroup(
                params=params, model_step=model.step, dest_force=dest,
                rep_name=rep, lo=lo, hi=lo + n))
            lo += n
        return cls(groups=tuple(groups), road=road, scripted=scripted,
                   priority_p2r=(priority_rule == "p2r"),
                   neighbors=neighbors,
                   full_fov=all(eng._hfov_is_full(g.params)
                                for g in groups))

    @property
    def n(self):
        return self.groups[-1].hi

    # ---- forces ----

    def _dest_forces(self, state: AgentState):
        n = self.n
        fx = jnp.zeros((n,), dtype=state.s.dtype)
        fy = jnp.zeros((n,), dtype=state.s.dtype)
        for g in self.groups:
            sub = state_slice(state, g.lo, g.hi)
            gfx, gfy, sub = g.dest_force(g.params, sub)
            # group params may be f64 while the state is f32: cast at the
            # scatter boundary (implicit promotion is a FutureWarning on
            # its way to a hard error)
            fx = fx.at[g.lo:g.hi].set(gfx.astype(fx.dtype))
            fy = fy.at[g.lo:g.hi].set(gfy.astype(fy.dtype))
            state = state_merge(state, g.lo, g.hi, sub)
        return fx, fy, state

    def _repulsive(self, state: AgentState):
        """Pairwise stage: one [N, N] tile per force family present,
        rows selected by the source agent's family."""
        n = self.n
        src = (state.s[:, X], state.s[:, Y], state.s[:, PSI],
               state.s[:, V])
        recv = src
        families = sorted({g.rep_name for g in self.groups})

        # per-agent params for each family: group params broadcast into
        # global [N] arrays field-by-field happens at create time via
        # group order; here we evaluate the tile with a params view built
        # from the groups of that family and select rows.
        fx_pair = jnp.zeros((n, n), dtype=state.s.dtype)
        fy_pair = jnp.zeros((n, n), dtype=state.s.dtype)
        for fam in families:
            tile = REP_FORCES[fam]
            for g in self.groups:
                if g.rep_name != fam:
                    continue
                gsrc = tuple(a[g.lo:g.hi] for a in src)
                px, py = tile(g.params, gsrc, recv)
                fx_pair = fx_pair.at[g.lo:g.hi, :].set(
                    px.astype(fx_pair.dtype))
                fy_pair = fy_pair.at[g.lo:g.hi, :].set(
                    py.astype(fy_pair.dtype))

        hfov = jnp.concatenate([
            jnp.broadcast_to(jnp.asarray(g.params.hfov),
                             (g.hi - g.lo,)) for g in self.groups])
        idx = jnp.arange(n)
        untracked = F.untracked_foes_tile(
            src[0], src[1], idx, state.active, hfov,
            recv[0], recv[1], recv[2], idx, state.active,
            priority_p2r=self.priority_p2r)
        return F.sum_sources(fx_pair, fy_pair, ~untracked)

    def group_masks(self, state: AgentState):
        """[n_rows] bool per group: which rows belong to it. Membership
        is decided by the persistent agent uid (groups are contiguous in
        ORIGINAL row order), so the masks follow the agents through row
        permutations and device sharding (where a shard's rows are a
        slice of the global population)."""
        uid = state.uid
        return [(uid >= g.lo) & (uid < g.hi) for g in self.groups]

    def pack_pair_fields_mixed(self, state: AgentState,
                               npad: int | None = None):
        """(src_pack [npad, 16], recv_pack [8, npad]) in the MIXED layout
        of ops.pallas_forces: the _FAM column selects the source row's
        field family; legacy rows reuse cols 4-7 as
        (amp, e, 1/sqrt(1-e^2), 1/p_decay) with cols 8-10 zero.

        Rows select their group's field params by uid mask (group_masks),
        NOT positional concatenation, so the pack is correct on permuted
        rows and on a device shard holding an arbitrary slice of the
        population."""
        from cyclistsocialforce_tpu.ops import pallas_forces as PF
        from cyclistsocialforce_tpu.params import pair_hi

        n = state.n
        npad = n if npad is None else npad
        dtype = state.s.dtype
        masks = self.group_masks(state)
        uid = state.uid

        def gval(value, g):
            a = jnp.asarray(value, dtype=dtype)
            if a.ndim >= 1 and a.shape[0] == (g.hi - g.lo):
                # per-agent group param: row r of the group = uid - lo
                off = jnp.clip(uid - g.lo, 0, g.hi - g.lo - 1)
                return a[off]
            return jnp.broadcast_to(a, (n,))

        def sel(per_group, default):
            out = jnp.full((n,), default, dtype)
            for m, v in zip(masks, per_group):
                out = jnp.where(m, v, out)
            return out

        x, y = state.s[:, X], state.s[:, Y]
        cpsi, spsi = jnp.cos(state.s[:, PSI]), jnp.sin(state.s[:, PSI])
        act = state.active.astype(dtype)

        c4, c5, c6, c7 = [], [], [], []
        c8, c9, c10, fam, chf = [], [], [], [], []
        zero = jnp.zeros((n,), dtype)
        for g in self.groups:
            chf.append(jnp.cos(gval(g.params.hfov, g) / 2))
            if g.rep_name == "twod":
                c4.append(gval(g.params.f_0, g))
                c5.append(gval(g.params.e_0, g))
                c6.append(gval(g.params.e_1, g))
                c7.append(gval(g.params.sigma_0, g))
                c8.append(gval(g.params.sigma_1, g))
                c9.append(gval(g.params.sigma_2, g))
                c10.append(gval(g.params.sigma_3, g))
                fam.append(zero)
            else:   # legacy elliptic field
                e = F.legacy_excentricity(
                    state.s[:, V], gval(pair_hi(g.params.v_max_riding), g))
                p_decay = gval(g.params.p_decay, g)
                c4.append(gval(g.params.p_0, g) / p_decay)   # amp
                c5.append(e)
                c6.append(1.0 / jnp.sqrt(1.0 - e * e))
                c7.append(1.0 / p_decay)
                c8.append(zero)
                c9.append(zero)
                c10.append(zero)
                fam.append(jnp.ones((n,), dtype))

        c4 = sel(c4, 0.0)
        emit = act * (c4 > 0)
        # f_0/amp pre-multiplied by the emit flag: non-emitting sources
        # produce P = 0 inside the force tiles with no per-pair mask op
        # (engine.pack_pair_fields does the same). Defaults on rows
        # outside every group (none in practice) keep the tile math
        # non-degenerate: sigma/e scale cols default to 1, emit 0.
        c4 = c4 * emit
        src_cols = [x, y, cpsi, spsi, c4, sel(c5, 0.0), sel(c6, 1.0),
                    sel(c7, 1.0), sel(c8, 0.0), sel(c9, 0.0),
                    sel(c10, 0.0), sel(chf, 1.0), emit, sel(fam, 0.0)]
        pad_cols = [jnp.zeros((n,), dtype)] * (PF.SRC_COLS - 1
                                               - len(src_cols))
        # last pad lane = receiver activity flag (engine.sorted_packs)
        src_pack = jnp.stack(src_cols + pad_cols + [act], axis=1)
        recv_rows = [x, y, cpsi, spsi, act]
        recv_pack = jnp.stack(
            recv_rows + [jnp.zeros((n,), dtype)] * (PF.RECV_ROWS
                                                    - len(recv_rows)),
            axis=0)
        if npad != n:
            pad = npad - n
            src_pad = jnp.zeros((pad, PF.SRC_COLS), dtype)
            src_pad = src_pad.at[:, 0].set(x[0]).at[:, 1].set(y[0])
            # emit = 0, sigma_0 col (7) nonzero keeps the twod branch
            # well-defined on pad rows
            src_pad = src_pad.at[:, 7].set(1.0)
            src_pack = jnp.concatenate([src_pack, src_pad], axis=0)
            recv_pad = jnp.zeros((PF.RECV_ROWS, pad), dtype)
            recv_pad = recv_pad.at[0].set(x[0]).at[1].set(y[0])
            recv_pack = jnp.concatenate([recv_pack, recv_pad], axis=1)
        return src_pack, recv_pack

    # ---- generic-schedule surface (parallel.sharding consumes these
    # through the same attribute names as Engine) ----

    # pack alias: the sharded culled schedules call engine.pack_pair_fields
    pack_pair_fields = pack_pair_fields_mixed

    @property
    def pair_family(self):
        return "mixed"     # routes through the mixed-family tile kernels

    @property
    def uniform_pair(self):
        return None        # per-row family column; no baked constants

    @property
    def rep_reduce(self):
        return None        # tile sums only (clamp_add_dest combine)

    @property
    def sorted_resident(self):
        return False       # mixed rows rebuild from original order

    def pair_kernel_dispatch(self, nbr, valid, src_sorted, recv_sorted,
                             recv_offset=None, mixed: bool | None = None):
        """Engine.pair_kernel_dispatch equivalent, always mixed-family."""
        return eng.pair_kernel_dispatch(
            self.neighbors, self.priority_p2r, nbr, valid,
            src_sorted, recv_sorted, recv_offset=recv_offset, mixed=True,
            fov=not self.full_fov, uniform=None)

    def _repulsive_culled(self, state: AgentState, cache=None):
        """Block-sparse culled mixed-family pairwise stage."""
        cfg = self.neighbors
        n = self.n
        blk = cfg.block
        npad = ((n + blk - 1) // blk) * blk
        dtype = state.s.dtype
        src_pack, recv_pack = self.pack_pair_fields_mixed(state, npad)
        if cache is None:
            cache = eng.build_neighbor_cache(cfg, state)
        perm, nbr, valid = cache[0], cache[1], cache[2]
        src_sorted, recv_sorted = eng.sorted_packs(src_pack, perm, npad,
                                                   dtype)
        out = eng.pair_kernel_dispatch(
            cfg, self.priority_p2r, nbr, valid,
            src_sorted, recv_sorted, mixed=True,
            fov=not self.full_fov)
        return eng.unsort_forces(out, perm, npad, n, dtype)

    def calc_forces(self, state: AgentState, nbr_cache=None):
        fdx, fdy, state = self._dest_forces(state)
        if self.scripted is not None:
            # scripted agents have no destination force (reference
            # vehicle.py:985-986); uid-indexed so the mask follows the
            # agent through permutations and sharding (engine.finish_step)
            smask = self.scripted.mask[state.uid]
            fdx = jnp.where(smask, 0.0, fdx)
            fdy = jnp.where(smask, 0.0, fdy)
        if self.n > 1:
            if self.neighbors is not None:
                frx, fry = self._repulsive_culled(state, nbr_cache)
            else:
                frx, fry = self._repulsive(state)
            fx, fy = F.clamp_add_dest(frx, fry, fdx, fdy)
        else:
            fx, fy = fdx, fdy
        if self.road is not None:
            rx, ry = F.road_edge_force(
                state.s[:, X], state.s[:, Y], self.road.vertices,
                self.road.weights, self.road.F_0, self.road.sigma)
            fx, fy = fx + rx, fy + ry
        return fx, fy, state

    # ---- stepping ----

    def step(self, state: AgentState, nbr_cache=None) -> AgentState:
        before = state
        # mixed populations need the union of every group's internal
        # fields -- a state right-sized for ONE model (make_state(model=))
        # would silently slice empty arrays for the others
        from cyclistsocialforce_tpu.models import MODELS
        for g in self.groups:
            mod = next((m for m in MODELS.values()
                        if m.step is g.model_step), None)
            if mod is not None:
                eng._check_state_widths(
                    getattr(mod, "STATE_WIDTHS", None), state)
        fx, fy, state = self.calc_forces(state, nbr_cache)
        for gi, g in enumerate(self.groups):
            sub = state_slice(state, g.lo, g.hi)
            # static per-group salt folded into the CONSTANT master key:
            # each group's agent_streams draws stay pure functions of
            # (master key, group index, t_glob, uid) -- the same
            # layout-invariant reproducible-replay property homogeneous
            # Engine runs have (state.py agent_streams contract). The
            # master key itself is never split or advanced.
            sub = sub.replace(key=jax.random.fold_in(state.key, gi))
            new = g.model_step(g.params, sub, fx[g.lo:g.hi],
                               fy[g.lo:g.hi])
            state = state_merge(state, g.lo, g.hi, new)
        helper = eng.Engine(params=None, model_step=None,
                            scripted=self.scripted)
        return helper.finish_step(before, state)

    def simulate(self, state: AgentState, n_steps: int,
                 record: bool = True):
        """Scan loop; with a NeighborConfig whose rebuild_every > 1 the
        sort + table rebuild amortizes over chunks (as Engine.simulate)."""
        def body(st, _):
            cache = (eng.build_neighbor_cache(self.neighbors, st)
                     if self.neighbors is not None else None)
            st = self.step(st, cache)
            return st, (st.s if record else None)

        k = (self.neighbors.rebuild_every
             if self.neighbors is not None else 1)
        if k <= 1 or n_steps < k:
            return jax.lax.scan(body, state, None, length=n_steps)
        n_chunks, rem = divmod(n_steps, k)

        def chunk(st, _):
            cache = eng.build_neighbor_cache(self.neighbors, st)

            def inner(st, _):
                st = self.step(st, cache)
                return st, (st.s if record else None)

            return jax.lax.scan(inner, st, None, length=k)

        state, recs = jax.lax.scan(chunk, state, None, length=n_chunks)
        recs = jax.tree_util.tree_map(
            lambda a: a.reshape((n_chunks * k,) + a.shape[2:]), recs)
        if rem:
            state, tail = jax.lax.scan(body, state, None, length=rem)
            recs = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=0), recs, tail)
        return state, recs


def prepare_groups(engine: MixedEngine, state: AgentState) -> AgentState:
    """Run each group's model-specific `prepare` on its slice."""
    from cyclistsocialforce_tpu.models import MODELS

    for g in engine.groups:
        # find the module owning this step function
        mod = next(m for m in MODELS.values() if m.step is g.model_step)
        prep = getattr(mod, "prepare", None)
        if prep is not None:
            sub = state_slice(state, g.lo, g.hi)
            state = state_merge(state, g.lo, g.hi, prep(g.params, sub))
    return state
