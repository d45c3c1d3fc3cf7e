"""Multi-chip scale-out: agent-axis sharding over a TPU device mesh.

The reference is a single-threaded, single-process simulator with **no
parallelism or distributed backend of any kind** (SURVEY.md §2.9; the O(N²)
pairwise force stage is a Python double loop, reference
intersection.py:797-823). This module is its TPU-native replacement:

  - the agent population is sharded over a 1-D `jax.sharding.Mesh` axis
    ("agents"), every per-agent leaf of `AgentState` split on its leading
    axis;
  - one simulation step runs under `shard_map`: the destination force,
    dynamics and FSM stages are purely local (embarrassingly agent-
    parallel), while the pairwise repulsive stage all-gathers the small
    source-side bundle (x, y, psi, v, active — a few floats per agent)
    over ICI and evaluates an [N_global, N_local] tile per device;
  - the per-receiver source sum needs no collective (each device already
    sees all sources for its local receivers).

This is the classic N-body "replicate positions, shard interactions"
decomposition: the gathered bundle is tiny compared to the O(N²/D) compute
per device, so scaling is compute-bound until very large device counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cyclistsocialforce_tpu.engine import Engine
from cyclistsocialforce_tpu.ops import forces as F
from cyclistsocialforce_tpu.state import PSI, V, X, Y, AgentState

AGENT_AXIS = "agents"


def make_mesh(n_devices: int | None = None, axis: str = AGENT_AXIS) -> Mesh:
    """A 1-D device mesh over the agent axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, axis_names=(axis,))


def state_pspecs(axis: str = AGENT_AXIS):
    """PartitionSpecs for every AgentState field: per-agent leaves sharded
    on their leading axis, the PRNG key replicated."""
    fields = {f: P(axis) for f in AgentState.__dataclass_fields__
              if f != "key"}
    fields["key"] = P()
    return AgentState(**fields)


def shard_state(state: AgentState, mesh: Mesh,
                axis: str = AGENT_AXIS) -> AgentState:
    """device_put the state with its agent-axis sharding."""
    specs = state_pspecs(axis)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        state, specs)


def sharded_step_fn(engine: Engine, mesh: Mesh, axis: str = AGENT_AXIS,
                    with_forces: bool = False):
    """Build a jittable one-step function over the mesh.

    The population size must be divisible by the mesh size. Force-field
    parameters consumed by the pairwise stage (f_0, sigma_*, hfov, ...)
    must be scalars (population-shared) in sharded mode; per-agent
    destination/dynamics parameters are fine (they shard with the agents).
    """
    specs = state_pspecs(axis)

    def local_step(lstate: AgentState):
        # global index offset of this shard
        nl = lstate.n
        d = jax.lax.axis_index(axis)
        n_global = nl * jax.lax.axis_size(axis)

        before = lstate
        fdx, fdy, lstate = engine.dest_force(engine.params, lstate)

        if engine.rep_force is not None:
            # all-gather the source bundle over ICI (tiled => [N_global])
            def gather(v):
                return jax.lax.all_gather(v, axis, tiled=True)

            src = tuple(gather(v) for v in engine._src_bundle(lstate))
            active_src = gather(lstate.active)
            hfov_l = jnp.broadcast_to(
                jnp.asarray(engine.params.hfov), (nl,))
            hfov_src = gather(hfov_l)
            idx_src = jnp.arange(n_global)
            frx, fry = engine.repulsive_sum(
                lstate, src=src, idx_src=idx_src, active_src=active_src,
                hfov_src=hfov_src, recv_offset=d * nl)
            fx, fy = F.clamp_add_dest(frx, fry, fdx, fdy)
        else:
            fx, fy = fdx, fdy

        if engine.road is not None:
            rx, ry = F.road_edge_force(
                lstate.s[:, X], lstate.s[:, Y], engine.road.vertices,
                engine.road.weights, engine.road.F_0, engine.road.sigma)
            fx, fy = fx + rx, fy + ry

        new = engine.model_step(engine.params, lstate, fx, fy)
        out = engine.finish_step(before, new)
        if with_forces:
            return out, fx, fy
        return out

    out_specs = (specs, P(axis), P(axis)) if with_forces else specs
    return jax.jit(jax.shard_map(local_step, mesh=mesh, in_specs=(specs,),
                                 out_specs=out_specs))


def sharded_simulate_fn(engine: Engine, mesh: Mesh, n_steps: int,
                        axis: str = AGENT_AXIS, record: bool = False):
    """Build a jittable `n_steps`-scan over the sharded step (scan inside
    shard_map: one collective program, no per-step re-entry)."""
    specs = state_pspecs(axis)

    def local_run(lstate: AgentState):
        nl = lstate.n
        d = jax.lax.axis_index(axis)
        n_global = nl * jax.lax.axis_size(axis)

        def body(st, _):
            before = st
            fdx, fdy, st = engine.dest_force(engine.params, st)
            if engine.rep_force is not None:
                def gather(v):
                    return jax.lax.all_gather(v, axis, tiled=True)
                src = tuple(gather(v) for v in engine._src_bundle(st))
                active_src = gather(st.active)
                hfov_src = gather(jnp.broadcast_to(
                    jnp.asarray(engine.params.hfov), (nl,)))
                frx, fry = engine.repulsive_sum(
                    st, src=src, idx_src=jnp.arange(n_global),
                    active_src=active_src, hfov_src=hfov_src,
                    recv_offset=d * nl)
                fx, fy = F.clamp_add_dest(frx, fry, fdx, fdy)
            else:
                fx, fy = fdx, fdy
            if engine.road is not None:
                rx, ry = F.road_edge_force(
                    st.s[:, X], st.s[:, Y], engine.road.vertices,
                    engine.road.weights, engine.road.F_0, engine.road.sigma)
                fx, fy = fx + rx, fy + ry
            new = engine.model_step(engine.params, st, fx, fy)
            out = engine.finish_step(before, new)
            return out, (out.s if record else None)

        return jax.lax.scan(body, lstate, None, length=n_steps)

    out_specs = (specs, P(None, axis) if record else None)
    return jax.jit(jax.shard_map(local_run, mesh=mesh, in_specs=(specs,),
                                 out_specs=out_specs))
