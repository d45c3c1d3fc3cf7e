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
                                           REP_FORCES, RoadElements)
from cyclistsocialforce_tpu.ops import forces as F
from cyclistsocialforce_tpu.state import PSI, V, X, Y, AgentState

_SLICE_FIELDS = _PER_AGENT_FIELDS + ("i", "pos_hist", "active")


def state_slice(state: AgentState, lo: int, hi: int) -> AgentState:
    upd = {f: getattr(state, f)[lo:hi] for f in _SLICE_FIELDS}
    return state.replace(**upd)


def state_merge(state: AgentState, lo: int, hi: int,
                sub: AgentState) -> AgentState:
    upd = {f: getattr(state, f).at[lo:hi].set(getattr(sub, f))
           for f in _SLICE_FIELDS}
    return state.replace(**upd, key=sub.key)


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
    """

    groups: Any                                   # tuple[ModelGroup]
    road: Any = None
    priority_p2r: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, group_specs, road=None,
               priority_rule: str = "unregulated"):
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
        return cls(groups=tuple(groups), road=road,
                   priority_p2r=(priority_rule == "p2r"))

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
            fx = fx.at[g.lo:g.hi].set(gfx)
            fy = fy.at[g.lo:g.hi].set(gfy)
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
                fx_pair = fx_pair.at[g.lo:g.hi, :].set(px)
                fy_pair = fy_pair.at[g.lo:g.hi, :].set(py)

        hfov = jnp.concatenate([
            jnp.broadcast_to(jnp.asarray(g.params.hfov),
                             (g.hi - g.lo,)) for g in self.groups])
        idx = jnp.arange(n)
        untracked = F.untracked_foes_tile(
            src[0], src[1], idx, state.active, hfov,
            recv[0], recv[1], recv[2], idx, state.active,
            priority_p2r=self.priority_p2r)
        return F.sum_sources(fx_pair, fy_pair, ~untracked)

    def calc_forces(self, state: AgentState):
        fdx, fdy, state = self._dest_forces(state)
        if self.n > 1:
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

    def step(self, state: AgentState) -> AgentState:
        before = state
        fx, fy, state = self.calc_forces(state)
        for gi, g in enumerate(self.groups):
            sub = state_slice(state, g.lo, g.hi)
            sub = sub.replace(key=jax.random.fold_in(state.key, gi))
            new = g.model_step(g.params, sub, fx[g.lo:g.hi],
                               fy[g.lo:g.hi])
            state = state_merge(state, g.lo, g.hi, new)
        state = state.replace(key=jax.random.split(before.key)[0])
        helper = eng.Engine(params=None, model_step=None)
        return helper.finish_step(before, state)

    def simulate(self, state: AgentState, n_steps: int,
                 record: bool = True):
        def body(st, _):
            st = self.step(st)
            return st, (st.s if record else None)

        return jax.lax.scan(body, state, None, length=n_steps)


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
