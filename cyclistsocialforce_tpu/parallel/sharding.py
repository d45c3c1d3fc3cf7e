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
    parallel), while the pairwise repulsive stage exchanges the small
    source-side bundle (x, y, psi, v, active — a few floats per agent)
    over ICI and evaluates tiles against the local receivers.

Two communication schedules (`comm=`):

  - "allgather": one `all_gather` replicates all sources per device, then
    a single [N_global, N_local] tile — simplest, minimal latency count;
  - "ring": the source block circulates via `ppermute` around the mesh
    ring for D-1 hops, each hop evaluating one [N/D, N/D] tile — the
    blockwise ring decomposition (the ring-attention pattern applied to
    the all-pairs force stage): O(N/D) peak memory per device instead of
    O(N), and per-hop communication overlaps with tile compute.

Either way the per-receiver source sum needs no further collective (each
receiver's partial sums accumulate locally).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cyclistsocialforce_tpu.engine import Engine, pair_kernel_dispatch
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
              if f not in ("key", "t_glob")}
    fields["key"] = P()          # single PRNG key, replicated
    fields["t_glob"] = P()       # scalar global step clock, replicated
    return AgentState(**fields)


def shard_state(state: AgentState, mesh: Mesh,
                axis: str = AGENT_AXIS) -> AgentState:
    """device_put the state with its agent-axis sharding."""
    specs = state_pspecs(axis)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        state, specs)


def _hfov_rows(engine, lstate):
    """Local rows' hfov: scalar params broadcast; per-agent hfov tables
    (a [N_global] leaf baked into the program) are indexed by the rows'
    persistent uid (scripted cars with car-like FOV, per-agent calib)."""
    hfov = jnp.asarray(engine.params.hfov)
    if hfov.ndim >= 1:
        return hfov[lstate.uid]
    return jnp.broadcast_to(hfov, (lstate.n,))


def _repulsive_allgather(engine, lstate, axis):
    """All-gather schedule: every device sees all sources."""
    nl = lstate.n
    d = jax.lax.axis_index(axis)
    n_global = nl * jax.lax.axis_size(axis)

    def gather(v):
        return jax.lax.all_gather(v, axis, tiled=True)

    src = tuple(gather(v) for v in engine._src_bundle(lstate))
    active_src = gather(lstate.active)
    hfov_src = gather(_hfov_rows(engine, lstate))
    return engine.repulsive_sum(
        lstate, src=src, idx_src=jnp.arange(n_global),
        active_src=active_src, hfov_src=hfov_src, recv_offset=d * nl)


def _repulsive_ring(engine, lstate, axis):
    """Ring schedule: circulate the source block via ppermute, one
    [N/D, N/D] tile per hop (blockwise ring halo exchange)."""
    nl = lstate.n
    d = jax.lax.axis_index(axis)
    size = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % size) for i in range(size)]

    recv = (lstate.s[:, X], lstate.s[:, Y], lstate.s[:, PSI],
            lstate.s[:, V])
    idx_recv = d * nl + jnp.arange(nl)

    src0 = engine._src_bundle(lstate)
    # mark replicated initializers as device-varying so the scan carry
    # types stay consistent once per-device data mixes in (a per-agent
    # hfov table is already varying through the uid gather)
    hfov0 = _hfov_rows(engine, lstate)
    if jnp.asarray(engine.params.hfov).ndim == 0:
        hfov0 = jax.lax.pcast(hfov0, axis, to="varying")
    block0 = (*src0, lstate.active, hfov0,
              jnp.asarray(d, dtype=jnp.int32))

    def hop(carry, _):
        block, frx, fry = carry
        xs, ys, psis, vs, act_s, hfov_s, origin = block
        fpx, fpy = engine.rep_force(engine.params,
                                    (xs, ys, psis, vs), recv)
        idx_src = origin * nl + jnp.arange(nl)
        untracked = F.untracked_foes_tile(
            xs, ys, idx_src, act_s, hfov_s,
            recv[0], recv[1], recv[2], idx_recv, lstate.active,
            priority_p2r=engine.priority_p2r)
        reduce = engine.rep_reduce or F.sum_sources
        dx, dy = reduce(fpx, fpy, ~untracked)
        block = jax.lax.ppermute(block, axis, perm)
        return (block, frx + dx, fry + dy), None

    if engine.rep_reduce is not None:
        raise ValueError("the ring schedule accumulates partial SUMS per "
                         "hop; custom rep_reduce hooks need 'allgather'")

    zeros = jax.lax.pcast(jnp.zeros((nl,), dtype=lstate.s.dtype), axis,
                          to="varying")
    (block, frx, fry), _ = jax.lax.scan(
        hop, (block0, zeros, zeros), None, length=size)
    return frx, fry


_REP_COMMS = {"allgather": _repulsive_allgather, "ring": _repulsive_ring}


# --------------------------------------------------------------------------
# spatially-culled sharded pair stage: local receivers, all-gathered
# sources, block-sparse neighbor-table evaluation (the multi-chip
# composition of ops.neighbors + ops.pallas_forces)
# --------------------------------------------------------------------------


def _neighbor_cache_sharded(engine, lstate, axis):
    """Per-device culling structure against the GLOBAL source blocks.

    Each device cell-sorts its local shard into `block`-agent blocks,
    all-gathers every device's block bounding boxes (a few floats per
    block -- not the agents), and builds its local receivers' fixed-width
    neighbor-block table indexing the global block array. Returns
    (perm [npad_l], nbr [B_l, KB], valid, overflow) -- `nbr` entries are
    GLOBAL block indices (device d's blocks live at [d*B_l, (d+1)*B_l)).
    """
    from cyclistsocialforce_tpu.ops import neighbors as NB

    cfg = engine.neighbors
    nl = lstate.n
    blk = cfg.block
    npad = ((nl + blk - 1) // blk) * blk
    x, y = lstate.s[:, X], lstate.s[:, Y]
    if npad != nl:
        x = jnp.concatenate([x, jnp.full((npad - nl,), x[0], dtype=x.dtype)])
        y = jnp.concatenate([y, jnp.full((npad - nl,), y[0], dtype=y.dtype)])
    cut = cfg.cutoff + cfg.skin
    perm = NB.sort_by_cell(x, y, cut)
    xs, ys = x[perm], y[perm]
    boxes_local = NB.block_bboxes(xs, ys, blk)                 # [B_l, 4]
    src_local = (boxes_local if cfg.block_src == blk
                 else NB.block_bboxes(xs, ys, cfg.block_src))
    boxes_glob = jax.lax.all_gather(src_local, axis, tiled=True)
    nbr, valid, overflow = NB.neighbor_block_table(
        boxes_local, cut, cfg.kb, src_bboxes=boxes_glob)
    return perm, nbr, valid, overflow


def _repulsive_neighbors(engine, lstate, axis, cache=None,
                         presorted=False, comm="allgather"):
    """Culled sharded pair forces: pack + sort local agents, exchange the
    sorted source packs over ICI, evaluate only the neighbor-table tiles
    against the local receivers. Compute is O(N * density / D) per device
    -- the single-chip culled path divided by the mesh size.

    comm="allgather": one [N, 16] all_gather per step -- minimal latency
    count, O(N) peak memory per device.
    comm="ring": the [N/D, 16] sorted pack circulates via ppermute for D
    hops; each hop masks the neighbor table down to the entries pointing
    at the currently-resident device's blocks, so only in-cutoff tiles
    are evaluated (the Pallas grid skips invalid slots). Same total bytes
    moved, O(N/D) peak memory -- the ring-attention trade applied to the
    culled pair stage.

    With presorted=True the local shard rows are ALREADY in cell-sorted
    order (the sorted-resident sharded fast path): the per-step
    [npad, 16] pack gather and the output scatter collapse away.
    """
    cfg = engine.neighbors
    nl = lstate.n
    blk = cfg.block
    npad = ((nl + blk - 1) // blk) * blk
    dtype = lstate.s.dtype
    d = jax.lax.axis_index(axis)
    size = jax.lax.axis_size(axis)
    bl = npad // blk                                  # blocks per device
    bl_src = npad // cfg.block_src                    # SOURCE blocks/device
    #                                                   (nbr indexes these)

    if cache is None:
        cache = _neighbor_cache_sharded(engine, lstate, axis)
    perm, nbr, valid = cache[0], cache[1], cache[2]

    from cyclistsocialforce_tpu.engine import sorted_packs, unsort_forces

    src_pack, recv_pack = engine.pack_pair_fields(lstate, npad)
    if presorted:
        src_sorted, recv_sorted = src_pack, recv_pack
    else:
        src_sorted, recv_sorted = sorted_packs(src_pack, perm, npad,
                                               dtype)
    roff = (d * bl).astype(jnp.int32)[None]

    if comm == "ring":
        perm_ring = [(i, (i + 1) % size) for i in range(size)]
        mixed = engine.pair_family != "twod"
        block0 = (src_sorted, jnp.asarray(d, dtype=jnp.int32))

        def hop(carry, _):
            block, fx, fy = carry
            src_h, origin = block
            # mask the table down to entries resident in this hop's pack
            lo = origin * bl_src
            in_hop = valid & (nbr >= lo) & (nbr < lo + bl_src)
            nbr_h = jnp.where(in_hop, nbr - lo, 0)
            out = pair_kernel_dispatch(
                cfg, engine.priority_p2r, nbr_h,
                in_hop, src_h, recv_sorted,
                recv_offset=roff - lo, mixed=mixed,
                fov=not engine.full_fov,
                uniform=None if mixed else engine.uniform_pair)
            block = jax.lax.ppermute(block, axis, perm_ring)
            return (block, fx + out[0], fy + out[1]), None

        zeros = jax.lax.pcast(jnp.zeros((npad,), dtype), axis,
                              to="varying")
        (_, sfx, sfy), _ = jax.lax.scan(
            hop, (block0, zeros, zeros), None, length=size)
        out = (sfx, sfy)
    else:
        src_glob = jax.lax.all_gather(src_sorted, axis, tiled=True)
        out = engine.pair_kernel_dispatch(nbr, valid, src_glob,
                                          recv_sorted, recv_offset=roff)

    if presorted:
        return out[0][:nl], out[1][:nl]
    return unsort_forces(jnp.stack([out[0], out[1]]), perm, npad, nl,
                         dtype)


# --------------------------------------------------------------------------
# halo-exchange culled schedule: the population is re-distributed into
# GLOBALLY cell-sorted, spatially contiguous strips once per rebuild
# chunk, after which each step exchanges only the 2*halo boundary source
# blocks with the ring neighbors -- O(halo * block_src) bytes/step over
# ICI instead of the O(N) per-step source all-gather
# --------------------------------------------------------------------------


def _reshard_rows(lstate, extras, idx, axis):
    """Fetch global state rows `idx` (the local [n_l] slice of a global
    permutation, identical on every device) into the local shard: ONE
    packed [K, N] all-gather + one row take -- the per-row-bound packing
    trick (engine.permute_state) applied across chips, instead of ~19
    per-field all-gathers. `extras` are [n_l] int32 arrays redistributed
    alongside (the original-row identity carry)."""
    from cyclistsocialforce_tpu.engine import (pack_state_rows,
                                               unpack_state_rows)

    barrier = jax.lax.optimization_barrier
    packT, ipackT = pack_state_rows(lstate)

    def take(mT):
        g = jax.lax.all_gather(mT, axis, axis=1, tiled=True)   # [K, N]
        return barrier(barrier(g.T)[idx]).T                    # [K, n_l]

    st = unpack_state_rows(lstate, take(packT),
                           None if ipackT is None else take(ipackT))
    # uid is excluded from the packed matrix (engine._PACK_EXCLUDED):
    # redistribute it through the same channel as the identity carry
    ex = [jax.lax.all_gather(e, axis, tiled=True)[idx]
          for e in list(extras) + [lstate.uid]]
    return st.replace(uid=ex[-1]), ex[:-1]


def _global_reshard(engine, lstate, ident, axis, from_original=False):
    """Re-distribute agents into globally cell-sorted strips: every
    device computes the same global serpentine cell sort from the
    all-gathered positions (2 floats/agent), then takes its strip's rows
    from the packed global state. After this, device d's rows are global
    sort positions [d*n_l, (d+1)*n_l) -- spatially contiguous, so its
    in-cutoff source blocks live on d and its ring neighbors.

    from_original=True computes the sort permutation with the agents
    arranged in ORIGINAL row order (via the carried `ident` column)
    before sorting: argsort tie-breaks depend on the input row order and
    block/kb truncation is tie-sensitive, so this is what makes the halo
    schedule bit-exact against Engine.simulate's NON-sorted-resident
    chunk path (which rebuilds from original order each chunk), while
    sorted-resident engines sort from the previous chunk's order exactly
    like Engine.simulate's chunk_sr."""
    from cyclistsocialforce_tpu.ops import neighbors as NB

    cfg = engine.neighbors
    nl = lstate.n
    d = jax.lax.axis_index(axis)
    x_g = jax.lax.all_gather(lstate.s[:, X], axis, tiled=True)
    y_g = jax.lax.all_gather(lstate.s[:, Y], axis, tiled=True)
    if from_original:
        inv = jnp.argsort(jax.lax.all_gather(ident, axis, tiled=True))
        perm = inv[NB.sort_by_cell(x_g[inv], y_g[inv],
                                   cfg.cutoff + cfg.skin)]
    else:
        perm = NB.sort_by_cell(x_g, y_g, cfg.cutoff + cfg.skin)
    idx = jax.lax.dynamic_slice_in_dim(perm, d * nl, nl)
    st, (ident,) = _reshard_rows(lstate, [ident], idx, axis)
    return st, ident


def _neighbor_cache_halo(engine, lstate, axis, halo):
    """Neighbor table for a globally sorted strip, re-indexed into the
    halo window [d*B_src - halo, (d+1)*B_src + halo). Table entries are
    built against the all-gathered GLOBAL source-block bboxes (a few
    floats per block); entries outside the window are dropped and
    flagged -- halo_overflow True means `halo` is too small for the
    current density/geometry (grow it; same contract as the kb capacity
    overflow, see parallel.required_halo)."""
    from cyclistsocialforce_tpu.ops import neighbors as NB

    cfg = engine.neighbors
    nl = lstate.n
    d = jax.lax.axis_index(axis)
    cut = cfg.cutoff + cfg.skin
    xs, ys = lstate.s[:, X], lstate.s[:, Y]    # already globally sorted
    boxes_local = NB.block_bboxes(xs, ys, cfg.block)
    src_local = (boxes_local if cfg.block_src == cfg.block
                 else NB.block_bboxes(xs, ys, cfg.block_src))
    boxes_glob = jax.lax.all_gather(src_local, axis, tiled=True)
    nbr, valid, overflow = NB.neighbor_block_table(
        boxes_local, cut, cfg.kb, src_bboxes=boxes_glob,
        chunk=cfg.table_chunk)
    bl_src = nl // cfg.block_src
    lo_win = d * bl_src - halo
    win = valid & (nbr >= lo_win) & (nbr < lo_win + bl_src + 2 * halo)
    halo_overflow = jnp.any(valid & ~win) | jnp.any(overflow)
    nbr_ext = jnp.where(win, nbr - lo_win, 0).astype(jnp.int32)
    return nbr_ext, win, halo_overflow


def _repulsive_neighbors_halo(engine, lstate, axis, cache, halo):
    """Per-step culled pair stage on globally sorted strips: exchange
    only the `halo` boundary source blocks with each ring neighbor (two
    ppermutes of [halo*block_src, 16] rows), evaluate the windowed
    table. Per-step ICI traffic is O(halo * block_src * 16) bytes
    instead of the all-gather schedule's O(N * 16)."""
    cfg = engine.neighbors
    nl = lstate.n
    size = jax.lax.axis_size(axis)
    nbr_ext, win = cache[0], cache[1]
    src_pack, recv_pack = engine.pack_pair_fields(lstate, nl)
    hr = halo * cfg.block_src
    fwd = [(i, (i + 1) % size) for i in range(size)]
    bwd = [(i, (i - 1) % size) for i in range(size)]
    left = jax.lax.ppermute(src_pack[nl - hr:], axis, fwd)
    right = jax.lax.ppermute(src_pack[:hr], axis, bwd)
    src_ext = jnp.concatenate([left, src_pack, right], axis=0)
    out = engine.pair_kernel_dispatch(nbr_ext, win, src_ext, recv_pack)
    return out[0][:nl], out[1][:nl]


def required_halo(engine: Engine, state: AgentState, n_devices: int) -> int:
    """Smallest `halo` (in SOURCE blocks per side) the halo schedule
    needs for `state` split over `n_devices` strips: replicate the
    global sort + table build single-device and measure the farthest
    valid table entry outside each receiver's own strip. Audit this at
    t=0 AND after a run (positions drift; the per-chunk rebuild re-sorts,
    so mid-run requirements stay near the density-driven value)."""
    import numpy as np

    from cyclistsocialforce_tpu.ops import neighbors as NB

    cfg = engine.neighbors
    n = state.n
    if n % n_devices or (n // n_devices) % cfg.block:
        raise ValueError("halo schedule needs n divisible by the mesh "
                         "size and local shards divisible by block")
    nl = n // n_devices
    cut = cfg.cutoff + cfg.skin
    # host-CPU backend: the offline audit must neither hit the dense
    # [B, B_src] bbox-table HBM wall at mega scale (honor table_chunk)
    # nor share the remote-TPU tunnel with the run it is sizing
    with jax.default_device(jax.devices("cpu")[0]):
        x = jnp.asarray(np.asarray(state.s[:, X]))
        y = jnp.asarray(np.asarray(state.s[:, Y]))
        perm = NB.sort_by_cell(x, y, cut)
        xs, ys = x[perm], y[perm]
        boxes = NB.block_bboxes(xs, ys, cfg.block)
        src_boxes = (boxes if cfg.block_src == cfg.block
                     else NB.block_bboxes(xs, ys, cfg.block_src))
        nbr, valid, _ = NB.neighbor_block_table(
            boxes, cut, cfg.kb, src_bboxes=src_boxes,
            chunk=cfg.table_chunk)
    nbr, valid = np.asarray(nbr), np.asarray(valid)
    bl = nl // cfg.block
    bl_src = nl // cfg.block_src
    dev = np.arange(nbr.shape[0]) // bl
    lo = (dev * bl_src)[:, None]
    hi = lo + bl_src
    excess = np.maximum(lo - nbr, nbr - (hi - 1))
    return int(np.max(np.where(valid, excess, 0)))


def _check_sharded_support(engine, comm):
    # scripted agents ARE supported: the replay tables ([N_global] rows,
    # replicated as program constants) are indexed by the persistent
    # agent uid, which identifies a shard's rows globally
    # (engine.finish_step)
    if engine.rep_reduce is not None and (comm == "ring"
                                          or engine.neighbors is not None):
        raise ValueError("custom rep_reduce hooks accumulate partial sums "
                         "per hop/tile; only comm='allgather' without "
                         "neighbor culling supports them under shard_map")
    if engine.neighbors is not None and engine.pair_family == "custom":
        raise ValueError("custom force tiles support neighbor culling "
                         "only single-device (the generic per-receiver-"
                         "block path); use the dense comm schedules "
                         "under shard_map")


def _local_step(engine, axis, rep_comm, lstate, nbr_cache=None,
                presorted=False, comm="allgather", halo=0):
    """One sharded step on the local shard (the shard_map body shared by
    sharded_step_fn / sharded_simulate_fn). Mirrors Engine.step_with_forces
    incl. the engine's combine_forces hook."""
    before = lstate
    fdx, fdy, lstate = engine.dest_force(engine.params, lstate)

    if engine.rep_force is not None:
        if engine.neighbors is not None and comm == "halo":
            frx, fry = _repulsive_neighbors_halo(engine, lstate, axis,
                                                 nbr_cache, halo)
        elif engine.neighbors is not None:
            frx, fry = _repulsive_neighbors(engine, lstate, axis, nbr_cache,
                                            presorted=presorted, comm=comm)
        else:
            frx, fry = rep_comm(engine, lstate, axis)
        combine = engine.combine_forces or F.clamp_add_dest
        fx, fy = combine(frx, fry, fdx, fdy)
    else:
        fx, fy = fdx, fdy

    if engine.road is not None:
        rx, ry = F.road_edge_force(
            lstate.s[:, X], lstate.s[:, Y], engine.road.vertices,
            engine.road.weights, engine.road.F_0, engine.road.sigma)
        fx, fy = fx + rx, fy + ry

    new = engine.model_step(engine.params, lstate, fx, fy)
    return engine.finish_step(before, new), fx, fy


# --------------------------------------------------------------------------
# heterogeneous (MixedEngine) populations under shard_map: group
# membership rides the persistent uid, each group's dest force and
# dynamics run masked over the whole local shard (G x the cheap local
# stages; the expensive pair stage runs ONCE through the mixed-family
# tiles), and scripted agents replay uid-indexed tables. Reference
# semantics: the heterogeneous agent list of intersection.py:813-823.
# --------------------------------------------------------------------------


def _is_mixed(engine):
    from cyclistsocialforce_tpu.mixed import MixedEngine
    return isinstance(engine, MixedEngine)


def _group_params_local(g, lstate):
    """Group params viewed from the local shard rows: per-agent leaves
    ([n_g, ...], always in group-row order) are gathered to the shard's
    rows by uid; shared/scalar leaves pass through. Rows outside the
    group read a clamped (garbage but finite) value -- their masked
    results are discarded. Caveat: a SHARED leaf whose leading dim
    happens to equal the group size is indistinguishable from a
    per-agent leaf (population-shared matrices are safe: as_population
    keeps them unbatched and group sizes are >> 5 in practice)."""
    ng = g.hi - g.lo

    def fix(leaf):
        a = jnp.asarray(leaf)
        if a.ndim >= 1 and a.shape[0] == ng and ng > 1:
            off = jnp.clip(lstate.uid - g.lo, 0, ng - 1)
            return a[off]
        return leaf

    return jax.tree.map(fix, g.params)


def _masked_merge_rows(old_state, new_state, m):
    """Row-masked state merge: rows where `m` take `new_state`'s
    per-agent fields (the sharded equivalent of mixed.state_merge)."""
    from cyclistsocialforce_tpu.mixed import _SLICE_FIELDS

    def pick(ol, nw):
        mm = m.reshape(m.shape + (1,) * (ol.ndim - 1))
        return jnp.where(mm, nw.astype(ol.dtype), ol)

    upd = {f: jax.tree.map(pick, getattr(old_state, f),
                           getattr(new_state, f))
           for f in _SLICE_FIELDS}
    return old_state.replace(**upd)


def _mixed_local_step(me, axis, lstate, nbr_cache=None, presorted=False,
                      comm="allgather", halo=0):
    """One sharded MixedEngine step on the local shard. Mirrors
    MixedEngine.step with masked whole-shard group stages instead of
    contiguous slices (a shard's rows span group boundaries); per-row
    results are bit-identical because every group stage is elementwise
    in the agent row and stochastic draws key off the uid
    (state.agent_streams)."""
    from cyclistsocialforce_tpu import engine as eng
    from cyclistsocialforce_tpu.models import MODELS

    # mixed populations need the union of every group's internal fields
    # (trace-time guard, mirrors MixedEngine.step)
    for g in me.groups:
        mod = next((m for m in MODELS.values()
                    if m.step is g.model_step), None)
        if mod is not None:
            eng._check_state_widths(getattr(mod, "STATE_WIDTHS", None),
                                    lstate)

    before = lstate
    masks = me.group_masks(lstate)
    dtype = lstate.s.dtype
    fdx = jnp.zeros((lstate.n,), dtype)
    fdy = jnp.zeros((lstate.n,), dtype)
    st = lstate
    for g, m in zip(me.groups, masks):
        gp = _group_params_local(g, lstate)
        gfx, gfy, new = g.dest_force(gp, lstate)
        fdx = jnp.where(m, gfx.astype(dtype), fdx)
        fdy = jnp.where(m, gfy.astype(dtype), fdy)
        st = _masked_merge_rows(st, new, m)
    lstate = st
    if me.scripted is not None:
        smask = me.scripted.mask[lstate.uid]
        fdx = jnp.where(smask, 0.0, fdx)
        fdy = jnp.where(smask, 0.0, fdy)

    if comm == "halo":
        frx, fry = _repulsive_neighbors_halo(me, lstate, axis, nbr_cache,
                                             halo)
    else:
        frx, fry = _repulsive_neighbors(me, lstate, axis, nbr_cache,
                                        presorted=presorted, comm=comm)
    fx, fy = F.clamp_add_dest(frx, fry, fdx, fdy)

    if me.road is not None:
        rx, ry = F.road_edge_force(
            lstate.s[:, X], lstate.s[:, Y], me.road.vertices,
            me.road.weights, me.road.F_0, me.road.sigma)
        fx, fy = fx + rx, fy + ry

    st = lstate
    for gi, (g, m) in enumerate(zip(me.groups, masks)):
        gp = _group_params_local(g, lstate)
        # static per-group salt folded into the CONSTANT master key
        # (mixed.MixedEngine.step): draws stay pure in (key, gi, t, uid)
        sub = lstate.replace(key=jax.random.fold_in(lstate.key, gi))
        cand = g.model_step(gp, sub, fx, fy)
        st = _masked_merge_rows(st, cand, m)
    helper = eng.Engine(params=None, model_step=None,
                        scripted=me.scripted)
    return helper.finish_step(before, st), fx, fy


def _check_sharded_support_mixed(me, comm):
    if me.neighbors is None:
        raise ValueError(
            "sharded MixedEngine requires neighbor culling "
            "(MixedEngine.create(..., neighbors=NeighborConfig(...))): "
            "the dense mixed pair stage materializes [N, N] per family "
            "and has no sharded schedule")
    for g in me.groups:
        if getattr(g.params, "br_resample_budget", 0):
            raise ValueError(
                "stochastic groups under a sharded MixedEngine need "
                "resample_budget=0 (unlimited): the budget compaction "
                "is population-order-dependent and the masked whole-"
                "shard evaluation would spend budget on foreign rows")


def sharded_step_fn(engine: Engine, mesh: Mesh, axis: str = AGENT_AXIS,
                    with_forces: bool = False, comm: str = "allgather"):
    """Build a jittable one-step function over the mesh.

    The population size must be divisible by the mesh size. In the DENSE
    comm schedules, force-field parameters consumed by the pairwise
    stage (f_0, sigma_*, ...) must be scalars (population-shared);
    per-agent destination/dynamics parameters are fine (they shard with
    the agents), per-agent hfov tables are uid-indexed, and the CULLED
    path supports fully per-agent pair params (the pack gathers them by
    uid). Scripted agents are supported everywhere: their replay tables
    replicate as program constants and are indexed by the persistent
    uid. A `MixedEngine` (heterogeneous model groups, optionally with
    scripted cars) is accepted too -- it requires neighbor culling and
    runs each group's local stages masked by uid over the shard.

    With `engine.neighbors` set, the pair stage runs the spatially-culled
    block-sparse path per device (local cell sort + gathered block-bbox
    neighbor table + tile kernel) instead of the dense `comm` schedule.
    """
    if comm == "halo":
        raise ValueError(
            "comm='halo' amortizes its global reshard over a rebuild "
            "chunk, so it only exists for sharded_simulate_fn; a "
            "single sharded step has no chunk to amortize over")
    if _is_mixed(engine):
        _check_sharded_support_mixed(engine, comm)
    else:
        _check_sharded_support(engine, comm)
    specs = state_pspecs(axis)
    rep_comm = _REP_COMMS[comm]

    def local_step(lstate: AgentState):
        if _is_mixed(engine):
            out, fx, fy = _mixed_local_step(engine, axis, lstate,
                                            comm=comm)
        else:
            out, fx, fy = _local_step(engine, axis, rep_comm, lstate,
                                      comm=comm)
        if with_forces:
            return out, fx, fy
        return out

    out_specs = (specs, P(axis), P(axis)) if with_forces else specs
    return jax.jit(jax.shard_map(local_step, mesh=mesh, in_specs=(specs,),
                                 out_specs=out_specs))


def sharded_simulate_fn(engine: Engine, mesh: Mesh, n_steps: int,
                        axis: str = AGENT_AXIS, record: bool = False,
                        comm: str = "allgather", halo: int = 2):
    """Build a jittable `n_steps`-scan over the sharded step (scan inside
    shard_map: one collective program, no per-step re-entry).

    With `engine.neighbors` set, the culled per-device neighbor structure
    is rebuilt every `rebuild_every` steps (skin-extended cutoff keeps the
    stale table conservative in between), mirroring Engine.simulate.

    comm="halo" (culled engines only) re-distributes the population into
    GLOBALLY cell-sorted strips once per rebuild chunk (one packed [K, N]
    all-gather) and then exchanges only the `halo` boundary source blocks
    per step (two [halo*block_src, 16] ppermutes) -- per-step ICI bytes
    drop from O(N) to O(halo * block_src), the right scaling for real
    multi-chip meshes. Returns (final_state, halo_overflow) where the
    replicated bool flags a too-small `halo`/kb for the observed
    geometry (size with parallel.required_halo + a safety block).
    Requires record=False, no scripted agents, local shards divisible by
    `block`; physics identical to the other schedules (same global table,
    same tile sums)."""
    if comm == "halo":
        return _sharded_simulate_halo_fn(engine, mesh, n_steps, axis,
                                         record, halo)
    if _is_mixed(engine):
        _check_sharded_support_mixed(engine, comm)
        step_impl = functools.partial(_mixed_local_step, engine, axis)
    else:
        _check_sharded_support(engine, comm)
        step_impl = functools.partial(_local_step, engine, axis,
                                      _REP_COMMS[comm])
    specs = state_pspecs(axis)

    def local_run(lstate: AgentState):
        def body(st, _):
            out, fx, fy = step_impl(st, comm=comm)
            return out, (out.s if record else None)

        k = (engine.neighbors.rebuild_every
             if engine.neighbors is not None else 1)
        if k <= 1 or n_steps < k:
            return jax.lax.scan(body, lstate, None, length=n_steps)

        n_chunks, rem = divmod(n_steps, k)

        # sorted-resident sharded fast path (mirrors Engine.simulate):
        # the local shard lives in cell-sorted order for the whole
        # rebuild chunk, so the per-step [npad, 16] pack gather and
        # force scatter of the culled pair stage disappear; original
        # local row order is restored from the carried ident column.
        from cyclistsocialforce_tpu.engine import _flat_sorted_resident_ok

        sorted_resident = _flat_sorted_resident_ok(
            engine, lstate, record, False)

        if sorted_resident:
            from cyclistsocialforce_tpu.engine import permute_state

            def chunk_sr(carry, _):
                st, ident = carry
                cache = _neighbor_cache_sharded(engine, st, axis)
                st = permute_state(st, cache[0])
                ident = ident[cache[0]]

                def inner(st, _):
                    out, fx, fy = step_impl(st, nbr_cache=cache,
                                            presorted=True, comm=comm)
                    return out, None

                st, _ = jax.lax.scan(inner, st, None, length=k)
                return (st, ident), None

            ident0 = jax.lax.pcast(
                jnp.arange(lstate.n, dtype=jnp.int32), axis, to="varying")
            (st, ident), _ = jax.lax.scan(
                chunk_sr, (lstate, ident0), None, length=n_chunks)
            st = permute_state(st, jnp.argsort(ident))
            if rem:
                st, _ = jax.lax.scan(body, st, None, length=rem)
            return st, None

        def chunk(st, _):
            cache = _neighbor_cache_sharded(engine, st, axis)

            def inner(st, _):
                out, fx, fy = step_impl(st, nbr_cache=cache, comm=comm)
                return out, (out.s if record else None)

            return jax.lax.scan(inner, st, None, length=k)

        st, recs = jax.lax.scan(chunk, lstate, None, length=n_chunks)
        if record:
            recs = recs.reshape((n_chunks * k,) + recs.shape[2:])
        if rem:
            st, tail = jax.lax.scan(body, st, None, length=rem)
            if record:
                recs = jnp.concatenate([recs, tail], axis=0)
        return st, recs

    out_specs = (specs, P(None, axis) if record else None)
    return jax.jit(jax.shard_map(local_run, mesh=mesh, in_specs=(specs,),
                                 out_specs=out_specs))


def _sharded_simulate_halo_fn(engine, mesh, n_steps, axis, record, halo):
    """The comm="halo" body of sharded_simulate_fn: sorted-resident
    chunks over globally contiguous strips, halo-block per-step exchange,
    original distribution restored at the end via the identity carry."""
    if engine.neighbors is None:
        raise ValueError("comm='halo' needs a culled engine "
                         "(Engine.create(neighbors=...))")
    if record:
        raise ValueError("comm='halo' keeps rows in globally sorted "
                         "order across rebuild chunks; per-step "
                         "recording is not supported (use comm="
                         "'allgather')")
    # rejects custom rep_reduce hooks (pair tiles only SUM; a custom
    # receiver-side reduction would be silently wrong physics) and
    # custom-family force tiles -- same contract as every other culled
    # sharded schedule. Scripted agents and MixedEngine groups ride the
    # uid (replay tables / group masks follow permuted rows).
    if _is_mixed(engine):
        _check_sharded_support_mixed(engine, "halo")
        step_impl = functools.partial(_mixed_local_step, engine, axis)
    else:
        _check_sharded_support(engine, "halo")
        step_impl = functools.partial(_local_step, engine, axis, None)
    if halo < 1:
        raise ValueError("halo must be >= 1 source block per side")
    specs = state_pspecs(axis)
    cfg = engine.neighbors
    k = max(cfg.rebuild_every, 1)
    # mirror _flat_sorted_resident_ok: scripted/custom/record are already
    # rejected above and shard divisibility is checked in local_run, so
    # the knob is the remaining condition. Non-sorted-resident engines
    # still keep rows strip-resident across a chunk (the halo exchange
    # requires it), but their global sort is computed from ORIGINAL row
    # order so tables -- and results -- are bit-identical to the
    # single-device non-SR chunk path.
    from_original = not engine.sorted_resident

    def local_run(lstate):
        nl = lstate.n
        if nl % cfg.block:
            raise ValueError(
                f"comm='halo' needs local shards divisible by block "
                f"({cfg.block}); got {nl} agents/device")
        if halo * cfg.block_src > nl:
            raise ValueError("halo window wider than a device strip")
        d = jax.lax.axis_index(axis)
        # already device-varying through `d` -- no pcast needed
        ident0 = d * nl + jnp.arange(nl, dtype=jnp.int32)

        def chunk(carry, _, m):
            st, ident, ovf = carry
            st, ident = _global_reshard(engine, st, ident, axis,
                                        from_original=from_original)
            cache = _neighbor_cache_halo(engine, st, axis, halo)

            def inner(st, _):
                out, fx, fy = step_impl(st, nbr_cache=cache, comm="halo",
                                        halo=halo)
                return out, None

            st, _ = jax.lax.scan(inner, st, None, length=m)
            return (st, ident, ovf | cache[2]), None

        def restore(st, ident):
            # back to the original distribution: original id i lives at
            # global row argsort(ident_g)[i]
            ident_g = jax.lax.all_gather(ident, axis, tiled=True)
            rows = jnp.argsort(ident_g)
            idx = jax.lax.dynamic_slice_in_dim(rows, d * nl, nl)
            return _reshard_rows(st, [ident], idx, axis)

        n_chunks, rem = divmod(n_steps, k)
        ovf0 = jax.lax.pcast(jnp.asarray(False), axis, to="varying")
        carry = (lstate, ident0, ovf0)
        if n_chunks:
            carry, _ = jax.lax.scan(
                functools.partial(chunk, m=k), carry, None,
                length=n_chunks)
            st, ident, ovf = carry
            st, (ident,) = restore(st, ident)
            carry = (st, ident, ovf)
        if rem:
            # remainder steps rebuild EVERY step (chunks of one) and
            # return to the original row distribution in between -- the
            # same freshness AND sort-tie semantics as Engine.simulate's
            # remainder `body` (argsort tie-breaks depend on the incoming
            # row order, and block truncation is tie-sensitive)
            def rem_step(c, _):
                c, _ = chunk(c, None, m=1)
                st, ident, ovf = c
                st, (ident,) = restore(st, ident)
                return (st, ident, ovf), None

            carry, _ = jax.lax.scan(rem_step, carry, None, length=rem)
        st, ident, ovf = carry
        ovf = jax.lax.pmax(ovf.astype(jnp.int32), axis) > 0
        return st, ovf

    return jax.jit(jax.shard_map(local_run, mesh=mesh, in_specs=(specs,),
                                 out_specs=(specs, P())))
