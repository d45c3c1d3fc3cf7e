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
import numpy as np
from flax import struct

from cyclistsocialforce_tpu.ops import forces as F
from cyclistsocialforce_tpu.ops import navigation as nav
from cyclistsocialforce_tpu.ops import spline as spl
from cyclistsocialforce_tpu.params import pair_hi
from cyclistsocialforce_tpu.state import PSI, THETA, V, X, Y, AgentState


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


def dest_force_hm(params, state: AgentState):
    """Helbing-Molnar destination-force variant (reference
    Bicycle.calcDestinationForceHM, vehicle.py:1196-1216): runs the full
    straight-line stage (destination-queue update + navigation FSM,
    vehicle.py:1201 calling calcDestinationForce), then relaxes the
    CURRENT velocity toward params.v_desired_default along the
    straight-line direction -- acceleration semantics, selectable via
    dest_force="hm" (the reference's dest_force_func strategy injection,
    vehicle.py:111-135)."""
    fx, fy, new_state = dest_force_straight(params, state)
    n = state.n
    vdd = jnp.broadcast_to(jnp.asarray(params.v_desired_default), (n,))
    fx, fy = F.dest_force_hm(fx, fy, state.s[:, V], state.s[:, PSI], vdd)
    return fx, fy, new_state


# --------------------------------------------------------------------------
# spline (path-planning) destination force
# --------------------------------------------------------------------------

# Local constants of the reference implementation (vehicle.py:1443-1448):
SPL_N_FWD = 4          # max forward destinations in the spline
SPL_N_PNTS = 20        # interpolated spline points
SPL_IPRED = 3          # look-ahead for normal driving
SPL_IPRED_LAST = 5     # look-ahead for the final destination
SPL_THETA_COMF = 10.0 * (2.0 * jnp.pi / 360.0)   # comfort lean ~10 deg
SPL_V_MIN_STABLE = 2.5                            # vehicle.py:1534


def dest_force_spline(params, state: AgentState):
    """Spline path-planning destination force of the BMD2023 2D model.

    Port of TwoDBicycle.calcDestinationForce (reference
    vehicle.py:1416-1558): fit a parametric cubic through recent trajectory
    positions + upcoming queue destinations, point the force along the
    spline look-ahead, and limit the desired speed by the spline curvature
    radius via a ~10 deg comfort lean angle, v = sqrt(theta_comf g R).

    Branch structure (replicated exactly, but branchless):
      * step 0: force along the current heading;
      * navigation state "arrived": zero force;
      * next destination not the last: spline through the previous+current
        position and up to 4 forward destinations;
      * last destination: spline through positions now, one step back and
        1 s back, plus the destination;
      * look-ahead beyond the spline end: fall back to the straight-line
        force -- INCLUDING the reference's quirk that the fallback re-runs
        the destination-queue update and navigation FSM a second time in
        the same step (vehicle.py:1556 calling vehicle.py:1189-1194).

    Divergences from the reference (degenerate cases only): the reference
    indexes a 30 s trajectory ring buffer, so after 30 s simulated time its
    "1 s back" sample silently wraps to stale data (vehicle.py:1279-1280,
    1486-1492) -- here the lookback is exact for arbitrary horizons; and
    where FITPACK raises on duplicate spline points (stationary agent,
    vehicle.py:1495-1507) the moment system here yields non-finite forces
    instead of crashing.
    """
    n = state.n
    npar = nav_params_view(params, n)
    g = jnp.broadcast_to(jnp.asarray(params.g), (n,))
    t_s = jnp.broadcast_to(jnp.asarray(params.t_s), (n,))
    hist = state.hist_len
    # the last-destination branch reads the position from floor(1/t_s)
    # steps back (reference vehicle.py:1486): a shorter ring buffer
    # silently wraps to STALE samples. hist is static; warn at trace
    # time when t_s is concrete (make_state(hist_len=128) is safe for
    # the default t_s = 0.01).
    lookback_c = None
    try:
        # t_s may be per-agent ([n]) after as_population -- every agent
        # shares the same sampling time, so row 0 is representative
        ts_np = np.asarray(params.t_s)
        if ts_np.size == 1 or np.all(ts_np == ts_np.flat[0]):
            lookback_c = int(np.floor(1.0 / float(ts_np.flat[0])))
        if lookback_c is not None and hist < lookback_c + 1:
            import warnings

            warnings.warn(
                f"spline destination force: pos_hist ring buffer "
                f"(hist_len={hist}) is shorter than the 1 s lookback "
                f"({lookback_c + 1} samples at t_s="
                f"{float(ts_np.flat[0])}); the last-destination "
                f"spline will read wrapped (stale) samples -- build the "
                f"state with make_state(hist_len>={lookback_c + 1})",
                stacklevel=2)
    except (TypeError, ValueError):   # traced t_s: keep the general path
        lookback_c = None

    # ring-buffer lookbacks at the GLOBAL step clock (AgentState.t_glob):
    # slot t % H holds every agent's position at global step t, so the
    # one-step-back sample is one [N, 2] dynamic slice, and the 1 s-back
    # sample is another when t_s is host-concrete and uniform (the
    # common case). For an agent active since t = 0 the slots coincide
    # with the reference's per-agent-step indexing (vehicle.py:1486);
    # unwritten slots carry the initial/entry position (make_state /
    # SumoIntersection seed the whole ring), which is exactly the
    # reference's earliest-available sample.
    tg = state.t_glob
    ph = state.pos_hist

    def ring_row(slot):
        z = jnp.zeros((), slot.dtype)   # match index dtypes under x64
        return jax.lax.dynamic_slice(
            ph, (z, slot % hist, z), (n, 1, 2))[:, 0]

    prev_all = ring_row(tg - 1)
    if lookback_c is not None:
        back_all = ring_row(tg - jnp.minimum(tg, lookback_c))
    else:
        # traced / non-uniform t_s: per-agent lookback via a one-hot
        # contraction over the ring (the pre-global-clock general path)
        lb = jnp.floor(1.0 / t_s).astype(jnp.int32)   # vehicle.py:1486
        jb = (tg - jnp.minimum(tg, lb)) % hist        # [n]
        oh = jnp.arange(hist)[None, :] == jb[:, None]
        back_all = jnp.sum(jnp.where(oh[:, :, None], ph, 0.0), axis=1)

    def per_agent(s, prev, back1s, i, dest, dq, ptr, nq, znav, znavp,
                  istop, dstop, p, g_a):
        pos = s[:2]
        v = s[V]

        # ---- first pass: destination-queue update + navigation FSM
        dest1, ptr1, istop1, dstop1 = nav.update_destination(
            pos, dest, dq, ptr, nq, znav, i, istop, dstop,
            p.d_arrived_inter)
        ddest1 = nav.dest_distance(pos, dq, ptr1)
        vd1, znav1, znavp1 = nav.update_nav_state(
            v, ddest1, dest1[2], znav, znavp, i, p)

        # ---- spline support points (global-clock ring slices computed
        # outside the vmap; queue rows via one-hot takes, see
        # ops.navigation.queue_take)
        is_last = ptr1 >= nq - 1

        # not-last: (prev, current, dq[ptr1 .. ptr1+fwd-1]), fwd in 2..4
        fwd = jnp.minimum(SPL_N_FWD, nq - ptr1)
        didx = jnp.clip(ptr1 + jnp.arange(SPL_N_FWD), 0, dq.shape[0] - 1)
        oh4 = (jnp.arange(dq.shape[0])[None, :]
               == didx[:, None]).astype(dq.dtype)               # [4, Q]
        # broadcast-multiply + reduce, NOT @: the vmapped batched tiny
        # dot_general serializes on TPU (see ops/smallmat.py)
        dq_sel = jnp.sum(oh4[:, :, None] * dq[None, :, :2], axis=1)
        pts_nl = jnp.concatenate(
            [prev[None], pos[None], dq_sel], axis=0)            # [6, 2]

        # last: (1 s back, one step back, current, destination)
        pts_last = jnp.concatenate(
            [back1s[None], prev[None], pos[None],
             dest1[None, :2], jnp.zeros((2, 2), dq.dtype)],
            axis=0)                                             # [6, 2]

        # ONE masked fixed-size fit instead of a lax.switch over three
        # m-sized fits plus a fourth for the last branch (vmap evaluates
        # every switch branch for every agent -- ~3.5x this arithmetic);
        # the banded (Thomas) form exploits the not-a-knot structure for
        # ~1/3 the op count of the general masked elimination
        pts6 = jnp.where(is_last, pts_last, pts_nl)
        m_valid = jnp.where(is_last, 4, 2 + fwd)
        t_sites, moments = spl.fit_masked_banded(pts6, m_valid)

        # ---- spline force. Positions-only eval at the SPL_N_PNTS
        # uniform parameters feeds the nearest-sample search; the
        # derivatives are then evaluated at just the two parameters the
        # force needs (the reference evaluates all 20 with two
        # derivatives each, vehicle.py:1509-1510 -- same values, ~1/3 the
        # arithmetic).
        q20 = jnp.linspace(0.0, 1.0, SPL_N_PNTS, dtype=pts6.dtype)
        S20 = spl.eval_positions(t_sites, pts6, moments, q20)   # [20, 2]
        d2 = ((S20[:, 0] - pos[0]) ** 2 + (S20[:, 1] - pos[1]) ** 2)
        i_spl = jnp.where(is_last, jnp.argmin(d2), 1)
        ipred = i_spl + jnp.where(dest1[2] > 0, SPL_IPRED_LAST, SPL_IPRED)
        ip = jnp.minimum(ipred, SPL_N_PNTS - 1)

        # exact grid parameters via one-hot takes (bit-identical to
        # selecting rows of the dense evaluation)
        rows = jnp.arange(SPL_N_PNTS)
        q_i = jnp.sum(jnp.where(rows == i_spl, q20, 0.0))
        q_p = jnp.sum(jnp.where(rows == ip, q20, 0.0))
        S2, dS2, d2S2 = spl.spline_eval(
            t_sites, pts6, moments, jnp.stack([q_i, q_p]))

        dx, dy = dS2[0, 0], dS2[0, 1]
        d2x, d2y = d2S2[0, 0], d2S2[0, 1]
        R = jnp.sqrt(dx**2 + dy**2) ** 3 / jnp.abs(dx * d2y - dy * d2x)
        v_curve = jnp.maximum(SPL_V_MIN_STABLE,
                              jnp.sqrt(SPL_THETA_COMF * g_a * R))
        v_spl = jnp.minimum(v_curve, vd1)
        seg = S2[1] - S2[0]
        seg_len = jnp.sqrt(seg[0] ** 2 + seg[1] ** 2)
        f_spl = v_spl * seg / jnp.where(seg_len > 0, seg_len, 1.0)

        # ---- fallback predicate (precedence: step-0, arrived, fallback,
        # spline); the unselected spline branch may contain NaN from
        # degenerate support points -- jnp.where drops it. A NON-FINITE
        # spline force (duplicate support points, e.g. a single-destination
        # agent in its first steps, where the reference CRASHES in FITPACK,
        # vehicle.py:1495-1507) also falls back to the straight-line force.
        use_fb = (((ipred >= SPL_N_PNTS)
                   | ~jnp.all(jnp.isfinite(f_spl)))
                  & ~znav1[2] & (i > 0))
        # base (no-fallback) force; the cond-gated fallback stage below
        # overwrites the use_fb rows
        fx = jnp.where(i == 0, vd1 * jnp.cos(s[PSI]),
                       jnp.where(znav1[2], 0.0, f_spl[0]))
        fy = jnp.where(i == 0, vd1 * jnp.sin(s[PSI]),
                       jnp.where(znav1[2], 0.0, f_spl[1]))
        return (fx, fy, use_fb, dest1, ptr1, znav1, znavp1, istop1, dstop1)

    (fx, fy, use_fb, dest, ptr, znav, znavp, istop,
     dstop) = jax.vmap(per_agent)(
        state.s, prev_all, back_all, state.i, state.dest, state.destqueue,
        state.destpointer, state.nq, state.znav, state.znavparams,
        state.i_stopsignal, state.d_stopsignal, npar, g)
    # inactive rows are discarded by finish_step's freeze either way --
    # keep them out of the gate so a frozen degenerate agent cannot pin
    # the fallback branch on forever
    use_fb = use_fb & state.active

    # ---- straight-line fallback with the double-FSM-update quirk
    # (reference vehicle.py:1556 calling vehicle.py:1189-1194), gated at
    # the POPULATION level: inlined unconditionally this second FSM pass
    # costs ~3.9 ms/step at N = 1e5 (round-3 bisect, BASELINE.md) even
    # though after the first steps no agent takes it -- an agent needs it
    # only while its support points are degenerate (first post-spawn
    # steps, stationary at a stop signal) or its look-ahead runs past the
    # spline end. lax.cond skips the whole pass on fallback-free steps.
    def run_fb(op):
        fx, fy, dest1, ptr1, znav1, znavp1, istop1, dstop1 = op

        def fb_agent(s, dest1, ptr1, znav1, znavp1, istop1, dstop1,
                     dq, nq, i, p):
            pos = s[:2]
            dest2, ptr2, istop2, dstop2 = nav.update_destination(
                pos, dest1, dq, ptr1, nq, znav1, i, istop1, dstop1,
                p.d_arrived_inter)
            ddest2 = nav.dest_distance(pos, dq, ptr2)
            vd2, znav2, znavp2 = nav.update_nav_state(
                s[V], ddest2, dest2[2], znav1, znavp1, i, p)
            fb_x, fb_y = F.dest_force_straight(
                pos[0], pos[1], dest2[0], dest2[1], vd2, ddest2)
            return fb_x, fb_y, dest2, ptr2, znav2, znavp2, istop2, dstop2

        (fbx, fby, dest2, ptr2, znav2, znavp2, istop2,
         dstop2) = jax.vmap(fb_agent)(
            state.s, dest1, ptr1, znav1, znavp1, istop1, dstop1,
            state.destqueue, state.nq, state.i, npar)

        def sel(a, b):
            m = use_fb.reshape((-1,) + (1,) * (b.ndim - 1))
            return jnp.where(m, a, b)

        return (sel(fbx, fx), sel(fby, fy), sel(dest2, dest1),
                sel(ptr2, ptr1), sel(znav2, znav1), sel(znavp2, znavp1),
                sel(istop2, istop1), sel(dstop2, dstop1))

    op = (fx, fy, dest, ptr, znav, znavp, istop, dstop)
    (fx, fy, dest, ptr, znav, znavp, istop, dstop) = jax.lax.cond(
        jnp.any(use_fb), run_fb, lambda o: o, op)

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
# force-field parameters) and recv = (x, y, psi, v) of the receiving agents
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
    xr, yr, psir = recv[0], recv[1], recv[2]
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
    xr, yr = recv[0], recv[1]
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
    "spline": dest_force_spline,
    "hm": dest_force_hm,
}

REP_FORCES: dict[str, Callable] = {
    "twod": rep_tile_twod,
    "legacy": rep_tile_legacy,
}


class NeighborConfig:
    """Static configuration of the block-sparse neighbor force path.

    cutoff : interaction radius [m]. The BMD2023 field decays as
        exp(-rho/sigma) with sigma <= sigma_0 + sigma_1 (~5.5 m by
        default), so cutoff = 50-60 m bounds the dropped force below
        1e-4 -- the framework's own force parity tolerance (measured
        9e-5 at 50 m). Populations emitting the LEGACY elliptic field
        (incl. MixedEngine legacy groups) need ~100 m: its forward decay
        exponent rho*sqrt((1-e)/(1+e))/p_decay is much slower for fast
        sources (measured 3.2e-5 at 100 m, 1.5e-3 at 60 m).
    block : agents per RECEIVER tile (multiple of 8; receivers are the
        pair tile's LANE dim, so throughput wants multiples of 128).
    block_src : agents per SOURCE block (0 = same as `block`; must divide
        `block`, multiple of 8). Sources are the tile's SUBLANE dim
        (granularity 8, no lane waste), so a finer source block shrinks
        each candidate tile without wasting VPU lanes: at the bench
        distribution block_src=64 admits ~20% fewer candidate pairs than
        128 (scripts/exp_asym_blocks.py) and the issue-bound pair stage
        speeds up accordingly. Needs a larger kb (more, smaller blocks
        per receiver: audited max 17 at 64 vs 11 at 128, bench scale).
    kb : max neighbor blocks per receiver block (capacity; overflow drops
        the farthest blocks).
    backend : "pallas" (TPU kernel), "xla" (gather fallback), or
        "interpret" (Pallas interpreter, for CPU tests).
    rebuild_every : rebuild the sort + table only every K steps inside
        `simulate`, with a skin margin on the cutoff covering the maximum
        pairwise drift in between (2 * v_max * t_s * K by default).
    """

    def __init__(self, cutoff=60.0, block=128, kb=16, backend="pallas",
                 rebuild_every=1, skin=None, v_max=10.0, t_s=0.01,
                 sub=0, screen=True, rebuild_mode="chunked",
                 block_src=0, table_chunk=0, row_segments=1):
        self.cutoff = float(cutoff)
        self.block = int(block)
        self.block_src = int(block_src) or self.block
        if (self.block % self.block_src != 0
                or self.block_src % 8 != 0):
            raise ValueError(
                f"block_src ({self.block_src}) must divide block "
                f"({self.block}) and be a multiple of 8")
        self.kb = int(kb)
        self.backend = backend
        self.rebuild_every = int(rebuild_every)
        self.skin = (float(skin) if skin is not None
                     else 2.0 * v_max * t_s * self.rebuild_every)
        # source-strip height for the in-kernel strip-level distance
        # screen (0 = whole-tile screen); multiples of 8 dividing
        # `block`. Only meaningful with screen=True.
        self.sub = int(sub)
        # screen=False drops the runtime min-distance screen entirely
        # (each screen is a vector->scalar pipeline stall; with the
        # serpentine sort the box-to-box table is already tight)
        self.screen = bool(screen)
        # how `simulate` amortizes table rebuilds over rebuild_every
        # steps: "chunked" = nested scan (rebuild at chunk boundaries),
        # "flat" = ONE flat scan with a lax.cond-gated rebuild and the
        # cache carried between steps. Same physics; the flat form is
        # dramatically faster for models with large per-step op graphs
        # (the spline family: XLA schedules the nested form ~2.3x
        # slower at N = 1e5 -- see BASELINE.md round 3).
        if rebuild_mode not in ("chunked", "flat"):
            raise ValueError(
                f"rebuild_mode must be 'chunked' or 'flat', got "
                f"{rebuild_mode!r}")
        self.rebuild_mode = str(rebuild_mode)
        # mega-scale controls (identical results, bounded resources):
        # table_chunk > 0 builds the [B, B_src] bbox table in receiver-
        # row chunks (the dense matrix is ~8 GB at N = 4e6 -- an HBM
        # wall; see ops.neighbors.neighbor_block_table); row_segments
        # > 1 splits each culled pair call into that many receiver-row
        # segments, each its own pallas_call, because the flat scalar-
        # prefetch table costs B*kb*4 B of SMEM and the ~1 MB SMEM
        # budget caps a single call near B*kb ~ 250k entries (~2M
        # agents at block=128/kb=19).
        self.table_chunk = int(table_chunk)
        self.row_segments = int(row_segments)
        if self.row_segments < 1:
            raise ValueError("row_segments must be >= 1")

    def _key(self):
        return (self.cutoff, self.block, self.kb, self.backend,
                self.rebuild_every, self.skin, self.sub, self.screen,
                self.rebuild_mode, self.block_src, self.table_chunk,
                self.row_segments)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return (isinstance(other, NeighborConfig)
                and self._key() == other._key())


def _hfov_is_full(params) -> bool:
    """Host-side check at engine build time: does every agent's half
    field of view cover the full circle? (Concrete params only; traced
    values conservatively return False.)"""
    try:
        h = np.asarray(jax.device_get(getattr(params, "hfov")))
    except Exception:   # noqa: BLE001 - traced/missing -> keep the mask
        return False
    return bool(np.all(h >= 2.0 * np.pi - 1e-9))


def _uniform_pair_params(params):
    """Host-side check at engine build time: is each twod pair-field
    parameter ONE shared value across the population (scalar params, or
    an `as_population` broadcast)? If so, return them as a static
    (e_0, e_1, sigma_0..3, cos(hfov/2)) float tuple -- the Pallas tile
    then bakes them in as compile-time constants, eliding 7 of its 12
    per-tile [S, 1] column extract + lane-broadcast pairs, which
    dominate the ~0.15 us per-tile fixed cost at block_src = 64
    (scripts/exp_kernel_compare.py). Traced / per-agent-heterogeneous
    params conservatively return None (the columns stay live). f_0 is
    NOT baked: its column carries the per-agent emit flag pre-multiply
    either way."""
    vals = []
    try:
        for f in ("e_0", "e_1", "sigma_0", "sigma_1", "sigma_2",
                  "sigma_3", "hfov"):
            v = np.asarray(jax.device_get(getattr(params, f)))
            flat = v.reshape(-1)
            if flat.size == 0 or np.ptp(flat) != 0:
                return None
            vals.append(float(flat[0]))
    except Exception:   # noqa: BLE001 - traced/missing -> general path
        return None
    vals[-1] = float(np.cos(0.5 * vals[-1]))     # hfov -> cos(hfov/2)
    return tuple(vals)


def build_neighbor_cache(cfg: NeighborConfig, state):
    """Culling structure (perm, nbr, valid, overflow) over the padded
    population with the skin-extended cutoff (shared by Engine and
    MixedEngine)."""
    from cyclistsocialforce_tpu.ops import neighbors as NB

    n = state.n
    blk = cfg.block
    npad = ((n + blk - 1) // blk) * blk
    x, y = state.s[:, X], state.s[:, Y]
    if npad != n:
        x = jnp.concatenate([x, jnp.full((npad - n,), x[0], dtype=x.dtype)])
        y = jnp.concatenate([y, jnp.full((npad - n,), y[0], dtype=y.dtype)])
    return NB.build(x, y, cfg.cutoff + cfg.skin, blk, cfg.kb,
                    block_src=cfg.block_src, table_chunk=cfg.table_chunk)


def sorted_packs(src_pack, perm, npad, dtype):
    """ONE per-row-bound gather for the per-step sort: the receiver pack
    is derived from the sorted source pack (cols 0-3 + the activity flag
    parked in the last pad lane by pack_pair_fields) via a cheap
    transpose instead of a second [8, N] axis-1 gather -- TPU gathers
    cost per ROW, so halving the gather count halves the per-step sort
    cost of the non-sorted-resident paths. The optimization_barrier
    keeps XLA from fusing the gather into both consumers (which would
    duplicate it)."""
    from cyclistsocialforce_tpu.ops import pallas_forces as PF

    src_sorted = jax.lax.optimization_barrier(src_pack[perm])
    recv_cols = jnp.concatenate(
        [src_sorted[:, :4], src_sorted[:, PF._RACT:PF._RACT + 1]],
        axis=1).T
    recv_sorted = jnp.concatenate(
        [recv_cols, jnp.zeros((PF.RECV_ROWS - 5, npad), dtype)], axis=0)
    return src_sorted, recv_sorted


def unsort_forces(out, perm, npad, n, dtype):
    """Scatter the [2, npad] sorted force rows back to original agent
    order with ONE fused [npad, 2] row scatter (TPU scatters are per-row
    bound like gathers)."""
    sc = jnp.zeros((npad, 2), dtype).at[perm].set(out.T)
    return sc[:n, 0], sc[:n, 1]


def pair_kernel_dispatch(cfg: NeighborConfig, priority_p2r: bool,
                         nbr, valid, src_sorted, recv_sorted,
                         recv_offset=None, mixed: bool = False,
                         fov: bool = True, uniform=None):
    """Run the configured neighbor-tile backend; [2, B*block] sorted
    forces. src/recv must already be in cell-sorted order. `uniform`
    optionally bakes shared scalar pair-field params into the Pallas
    tiles as compile-time constants (Engine.uniform_pair; ignored by the
    xla and db backends).

    With cfg.row_segments > 1 the call is split into that many receiver-
    row segments, each its own pallas_call over the FULL source pack
    (identical math; needed past ~2M agents where one call's flat
    scalar-prefetch table would exceed the ~1 MB SMEM budget)."""
    if cfg.row_segments > 1 and cfg.backend != "xla":
        b = nbr.shape[0]
        blk = cfg.block
        bounds = [round(i * b / cfg.row_segments)
                  for i in range(cfg.row_segments + 1)]
        outs = [
            _pair_dispatch_one(
                cfg, priority_p2r, nbr[lo:hi], valid[lo:hi], src_sorted,
                recv_sorted[:, lo * blk:hi * blk], recv_offset, mixed,
                fov, uniform)
            for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo]
        return jnp.concatenate(outs, axis=1)
    return _pair_dispatch_one(cfg, priority_p2r, nbr, valid, src_sorted,
                              recv_sorted, recv_offset, mixed, fov,
                              uniform)


def _pair_dispatch_one(cfg, priority_p2r, nbr, valid, src_sorted,
                       recv_sorted, recv_offset, mixed, fov, uniform):
    from cyclistsocialforce_tpu.ops import pallas_forces as PF

    blk = cfg.block
    bs = cfg.block_src
    dtype = src_sorted.dtype
    f32 = lambda a: a.astype(jnp.float32)   # noqa: E731
    if cfg.backend == "xla":
        return PF.pair_forces_neighbors_xla(
            nbr, valid, src_sorted, recv_sorted, block=blk,
            priority_p2r=priority_p2r, recv_offset=recv_offset,
            mixed=mixed, fov=fov, block_src=bs)
    if cfg.backend in ("pallas_unrolled", "interpret_unrolled"):
        return PF.pair_forces_neighbors_unrolled(
            nbr, valid, f32(src_sorted), f32(recv_sorted), block=blk,
            priority_p2r=priority_p2r,
            interpret=(cfg.backend == "interpret_unrolled"),
            recv_offset=recv_offset, mixed=mixed, fov=fov,
            block_src=bs, uniform=uniform).astype(dtype)
    if cfg.backend in ("pallas_db", "interpret_db"):
        if bs != blk:
            raise ValueError("the double-buffered backend does not "
                             "support block_src != block; use 'pallas'")
        return PF.pair_forces_neighbors_db(
            nbr, valid, f32(src_sorted), f32(recv_sorted), block=blk,
            priority_p2r=priority_p2r,
            interpret=(cfg.backend == "interpret_db"),
            cutoff=cfg.cutoff, recv_offset=recv_offset,
            mixed=mixed, fov=fov).astype(dtype)
    return PF.pair_forces_neighbors(
        nbr, valid, f32(src_sorted), f32(recv_sorted), block=blk,
        priority_p2r=priority_p2r,
        interpret=(cfg.backend == "interpret"),
        cutoff=cfg.cutoff, recv_offset=recv_offset,
        mixed=mixed, sub=cfg.sub, screen=cfg.screen, fov=fov,
        block_src=bs, uniform=uniform).astype(dtype)


class RoadElements(struct.PyTreeNode):
    """Stacked road-edge geometry: padded vertex array + validity weights."""

    vertices: Any   # [Vtot, 2]
    weights: Any    # [Vtot]
    F_0: Any        # scalar or [Vtot]
    sigma: Any      # scalar or [Vtot]


class ScriptedTraj(struct.PyTreeNode):
    """Prescribed trajectories for uncontrolled agents.

    Equivalent of UncontrolledVehicle / Vehicle.set_uncontrolled (reference
    vehicle.py:920-987, 330-356): a scripted agent ignores all forces and
    replays `traj[agent, i]` at step counter i, holding its last state once
    the script runs out -- while still EMITTING its repulsive force field
    on the rest of the population (vehicle.py:981-984; give such agents
    car-like force-field parameters via per-agent params arrays).
    """

    traj: Any     # [N, T, k<=8] prescribed CSF states
    mask: Any     # [N] bool -- which agents are scripted
    length: Any   # [N] int32 -- valid steps per agent

    @classmethod
    def create(cls, n: int, trajectories: dict, dtype=jnp.float64):
        """Build from {agent_index: [T_a, k] array} (host-side setup)."""
        t_max = max((np.shape(t)[0] for t in trajectories.values()),
                    default=1)
        traj = np.zeros((n, t_max, 8), dtype=np.dtype(dtype))
        mask = np.zeros((n,), dtype=bool)
        length = np.zeros((n,), dtype=np.int32)
        for a, t in trajectories.items():
            t = np.asarray(t, dtype=np.dtype(dtype))
            traj[a, :t.shape[0], :t.shape[1]] = t
            mask[a] = True
            length[a] = t.shape[0]
        return cls(traj=jnp.asarray(traj), mask=jnp.asarray(mask),
                   length=jnp.asarray(length))


class Engine(struct.PyTreeNode):
    """One shared space with one (homogeneous-model) agent population."""

    params: Any
    road: Any = None                        # RoadElements or None
    scripted: Any = None                    # ScriptedTraj or None
    model_step: Callable = struct.field(pytree_node=False, default=None)
    # the model's declared internal-field widths (STATE_WIDTHS), kept so
    # step() can reject a state built for a DIFFERENT model at trace time
    # (make_state(model=...) zero-sizes untouched fields)
    state_widths: Any = struct.field(pytree_node=False, default=None)
    dest_force: Callable = struct.field(pytree_node=False,
                                        default=dest_force_straight)
    rep_force: Callable | None = struct.field(pytree_node=False,
                                              default=rep_tile_twod)
    priority_p2r: bool = struct.field(pytree_node=False, default=False)
    # Extension hooks for external force models (the reference's
    # strategy-injection API, vehicle.py:111-135, external.py): how
    # pairwise force channels reduce over sources (default: masked sum,
    # intersection.py:822-838) and how the reduced repulsion combines with
    # the destination force (default: magnitude clamp + add,
    # intersection.py:841-848).
    rep_reduce: Callable | None = struct.field(pytree_node=False,
                                               default=None)
    combine_forces: Callable | None = struct.field(pytree_node=False,
                                                   default=None)
    # Receiver-axis chunk size for the O(N^2) force assembly. None = dense
    # [N, N] (fastest for small N); an int C bounds peak memory to O(N*C)
    # by lax.map-ing over N/C receiver tiles (required for N ~ 100k).
    rep_chunk: int | None = struct.field(pytree_node=False, default=None)
    # Block-sparse neighbor culling (NeighborConfig). When set, the
    # pairwise stage cell-sorts the population and evaluates only tiles of
    # blocks within the cutoff (Pallas kernel on TPU) -- O(N * density)
    # instead of O(N^2). Supports the named force families ("twod" and
    # "legacy" -- the latter through the mixed-family tile with every row
    # legacy; remember its slow forward decay wants cutoff ~100 m, see
    # NeighborConfig); custom tiles need the dense/chunked path.
    neighbors: Any = struct.field(pytree_node=False, default=None)
    # which named family the culled pack uses ("twod" | "legacy")
    pair_family: str = struct.field(pytree_node=False, default="twod")
    # opt out of the sorted-resident fast path in `simulate` even when
    # its structural conditions hold. Models with LARGE per-step op
    # graphs (the spline family) schedule ~2.7x SLOWER sorted-resident
    # inside long rebuild chunks (BASELINE.md round-3 bisect) -- for
    # those, disable this or use NeighborConfig(rebuild_mode="flat").
    sorted_resident: bool = struct.field(pytree_node=False, default=True)
    # True when every agent's hfov covers the full circle (the reference
    # Vehicle default): the kernels then elide the FOV cone test
    # statically (semantically a no-op, ~6 full-tile ops/pair saved).
    full_fov: bool = struct.field(pytree_node=False, default=False)
    # Static (e_0, e_1, sigma_0..3, cos(hfov/2)) tuple when the twod
    # pair-field params are one shared value per field (detected at
    # create() -- see _uniform_pair_params); the Pallas tiles bake them
    # in as constants. None = per-agent columns. NOTE: set by create();
    # an engine.replace(params=...) that changes these values must also
    # refresh uniform_pair (or clear it to None).
    uniform_pair: tuple | None = struct.field(pytree_node=False,
                                              default=None)

    @classmethod
    def create(cls, params, model, road=None, dest_force=None,
               rep_force=None, priority_rule: str = "unregulated",
               rep_chunk: int | None = None, scripted=None,
               rep_reduce=None, combine_forces=None, neighbors=None,
               sorted_resident: bool | None = None):
        """Build an engine from a model module (see models/ registry).

        `model` provides `step` and default `DEST_FORCE` / `REP_FORCE`
        (registry names or callables -- the reference's strategy-injection
        API, vehicle.py:111-135, external.py).
        """
        dest = dest_force if dest_force is not None else model.DEST_FORCE
        if isinstance(dest, str):
            dest = DEST_FORCES[dest]
        rep = rep_force if rep_force is not None else model.REP_FORCE
        if isinstance(rep, str):
            rep = REP_FORCES[rep]
        rep_reduce = rep_reduce or getattr(model, "REP_REDUCE", None)
        combine = combine_forces or getattr(model, "COMBINE_FORCES", None)
        if rep is rep_tile_legacy:
            family = "legacy"
        elif rep is rep_tile_twod:
            family = "twod"
        else:
            family = "custom"
        if (neighbors is not None and family == "custom"
                and neighbors.backend != "xla"):
            raise ValueError(
                "custom force tiles (e.g. external models) support "
                "neighbor culling only with the 'xla' backend (the "
                "generic per-receiver-block path preserves arbitrary "
                "rep_reduce hooks); the Pallas kernels serve the named "
                "families ('twod', 'legacy')")
        if sorted_resident is None:
            # models whose step bodies are large (the spline family)
            # declare SORTED_RESIDENT = False: the sorted-resident path
            # schedules ~2.7x slower for them (BASELINE.md round 3)
            sorted_resident = bool(getattr(model, "SORTED_RESIDENT",
                                           True))
        return cls(params=params, road=road, scripted=scripted,
                   model_step=model.step,
                   state_widths=getattr(model, "STATE_WIDTHS", None),
                   dest_force=dest, rep_force=rep,
                   priority_p2r=(priority_rule == "p2r"),
                   rep_chunk=rep_chunk, rep_reduce=rep_reduce,
                   combine_forces=combine, neighbors=neighbors,
                   pair_family=family, sorted_resident=sorted_resident,
                   full_fov=_hfov_is_full(params),
                   uniform_pair=(_uniform_pair_params(params)
                                 if family == "twod" else None))

    def with_params(self, params):
        """Engine with `params` swapped in AND the params-derived static
        fields refreshed (`full_fov`, `uniform_pair`). Prefer this over
        a bare `engine.replace(params=...)`, which would keep the OLD
        baked pair-field constants / FOV elision if the new values
        differ (they are compile-time statics, not traced)."""
        return self.replace(
            params=params, full_fov=_hfov_is_full(params),
            uniform_pair=(_uniform_pair_params(params)
                          if self.pair_family == "twod" else None))

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
            recv = (state.s[ri, X], state.s[ri, Y], state.s[ri, PSI],
                    state.s[ri, V])
            fpx, fpy = self.rep_force(self.params, src, recv)
            untracked = F.untracked_foes_tile(
                xs, ys, idx_src, active_src, hfov_src,
                recv[0], recv[1], recv[2], ri + recv_offset,
                state.active[ri], priority_p2r=self.priority_p2r)
            reduce = self.rep_reduce or F.sum_sources
            return reduce(fpx, fpy, ~untracked)

        idx_recv = jnp.arange(n)
        if self.rep_chunk is None or self.rep_chunk >= n:
            return recv_tile(idx_recv)
        c = self.rep_chunk
        if n % c != 0:
            raise ValueError(f"rep_chunk={c} must divide N={n}.")
        frx, fry = jax.lax.map(recv_tile, idx_recv.reshape(n // c, c))
        return frx.reshape(n), fry.reshape(n)

    def neighbor_cache(self, state: AgentState):
        """Build the culling structure: (perm, nbr, valid) over the padded
        population, with the skin-extended cutoff so the table stays valid
        for `rebuild_every` steps of drift."""
        return build_neighbor_cache(self.neighbors, state)

    def pack_pair_fields(self, state: AgentState, npad: int | None = None):
        """(src_pack [npad, 16], recv_pack [8, npad]) for the tile kernels
        (ops.pallas_forces layout), padded to `npad` agents with inactive
        rows parked at the first agent's position (NON-DEGENERATE field
        params: sigma = 0 rows would divide by zero inside force tiles
        even though they are masked; f_0 = 0 means they emit nothing)."""
        from cyclistsocialforce_tpu.ops import pallas_forces as PF

        n = state.n
        npad = n if npad is None else npad
        dtype = state.s.dtype

        def bb(value):
            leaf = jnp.asarray(value, dtype=dtype)
            if leaf.ndim >= 1:
                # per-agent param table (always in ORIGINAL row order):
                # index by the persistent uid so the row's params follow
                # it through permutations (sorted residency) and device
                # sharding; identity when rows are unpermuted
                return leaf[state.uid]
            return jnp.broadcast_to(leaf, (n,))

        def b(field):
            return bb(getattr(self.params, field))

        x, y = state.s[:, X], state.s[:, Y]
        cpsi, spsi = jnp.cos(state.s[:, PSI]), jnp.sin(state.s[:, PSI])
        act = state.active.astype(dtype)
        if self.pair_family == "legacy":
            # legacy elliptic field through the mixed-family tile layout
            # (every row fam=1; cols 4-7 = amp, e, 1/sqrt(1-e^2),
            # 1/p_decay -- mirrors MixedEngine.pack_pair_fields_mixed)
            e = F.legacy_excentricity(
                state.s[:, V], bb(pair_hi(self.params.v_max_riding)))
            p_decay = b("p_decay")
            amp = b("p_0") / p_decay
            zero = jnp.zeros((n,), dtype)
            emit = act * (amp > 0)
            # pre-multiply the amplitude by the emit flag: non-emitting
            # sources then produce P = 0 inside the force tiles with no
            # per-pair mask op (the emit column stays packed for
            # consumers that need the flag itself)
            amp = amp * emit
            src_cols = [x, y, cpsi, spsi, amp, e,
                        1.0 / jnp.sqrt(1.0 - e * e), 1.0 / p_decay,
                        zero, zero, zero, jnp.cos(b("hfov") / 2), emit,
                        jnp.ones((n,), dtype)]
        else:
            # the _SACT column is the source EMIT flag: active AND
            # f_0 > 0, folded here so the kernels test one column
            # instead of two
            emit = act * (b("f_0") > 0)
            # f_0 pre-multiplied by emit: see the legacy branch above
            src_cols = [x, y, cpsi, spsi, b("f_0") * emit, b("e_0"),
                        b("e_1"),
                        b("sigma_0"), b("sigma_1"), b("sigma_2"),
                        b("sigma_3"), jnp.cos(b("hfov") / 2), emit]
        pad_cols = [jnp.zeros((n,), dtype)] * (PF.SRC_COLS - 1
                                               - len(src_cols))
        # the last pad lane (PF._RACT) carries the receiver-side activity
        # flag so the non-sorted-resident path can derive the receiver
        # pack from the single sorted source pack (one gather, not two)
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
            for c in range(4, 11):
                src_pad = src_pad.at[:, c].set(src_pack[0, c])
            src_pad = src_pad.at[:, 4].set(0.0)   # f_0 = 0: no force
            src_pack = jnp.concatenate([src_pack, src_pad], axis=0)
            recv_pad = jnp.zeros((PF.RECV_ROWS, pad), dtype)
            recv_pad = recv_pad.at[0].set(x[0]).at[1].set(y[0])
            recv_pack = jnp.concatenate([recv_pack, recv_pad], axis=1)
        return src_pack, recv_pack

    def pair_kernel_dispatch(self, nbr, valid, src_sorted, recv_sorted,
                             recv_offset=None, mixed: bool | None = None):
        """Run the configured neighbor-tile backend; [2, B*block] sorted
        forces. src/recv must already be in cell-sorted order. A legacy
        pair family routes through the mixed-family tile (all rows
        fam=1)."""
        if mixed is None:
            mixed = self.pair_family == "legacy"
        return pair_kernel_dispatch(self.neighbors, self.priority_p2r,
                                    nbr, valid, src_sorted, recv_sorted,
                                    recv_offset=recv_offset, mixed=mixed,
                                    fov=not self.full_fov,
                                    uniform=None if mixed
                                    else self.uniform_pair)

    def repulsive_sum_neighbors_generic(self, state: AgentState,
                                        cache=None):
        """Culled pairwise forces for CUSTOM force tiles (external
        models, reference external.py:44-182): each receiver block
        gathers its <= KB neighbor source blocks' raw (x, y, psi, v)
        bundles and evaluates `rep_force` + `rep_reduce` over that ONE
        [KB*block, block] tile -- so any receiver-side reduction
        semantics (e.g. the Kaths nearest-neighbor min) hold exactly;
        invalid table slots are folded into the source-active mask.

        Per-agent parameter arrays are viewed RECEIVER-side: the tile
        sees a params pytree whose [N, ...] leaves are sliced to the
        receiver block (custom tiles like Kaths consume per-agent params
        at receiver positions; source-side per-agent field params need
        the named-family packed kernels)."""
        cfg = self.neighbors
        n = state.n
        blk = cfg.block
        npad = ((n + blk - 1) // blk) * blk
        dtype = state.s.dtype
        if cache is None:
            cache = self.neighbor_cache(state)
        perm, nbr, valid = cache[0], cache[1], cache[2]

        def pad(a, fill):
            if npad == n:
                return a
            return jnp.concatenate(
                [a, jnp.full((npad - n,), fill, dtype=a.dtype)])

        x = pad(state.s[:, X], state.s[0, X])[perm]
        y = pad(state.s[:, Y], state.s[0, Y])[perm]
        psi = pad(state.s[:, PSI], 0.0)[perm]
        v = pad(state.s[:, V], 0.0)[perm]
        act = pad(state.active, False)[perm]
        hfov = pad(jnp.broadcast_to(
            jnp.asarray(self.params.hfov, dtype=dtype), (n,)), 1.0)[perm]
        idx = jnp.arange(npad, dtype=jnp.int32)[perm]

        nblk = npad // blk
        bs = cfg.block_src
        lane = jnp.arange(bs, dtype=jnp.int32)
        resh = lambda a: a.reshape(nblk, blk)    # noqa: E731
        xr, yr, pr, vr = resh(x), resh(y), resh(psi), resh(v)
        ar, ir = resh(act), resh(idx)

        # receiver-block views of per-agent parameter leaves
        flat, treedef = jax.tree_util.tree_flatten(self.params)
        blocked = []
        for leaf in flat:
            try:
                a = jnp.asarray(leaf)
            except (TypeError, ValueError):
                blocked.append((leaf, None))
                continue
            if a.ndim >= 1 and a.shape[0] == n:
                if npad != n:
                    a = jnp.concatenate(
                        [a, jnp.repeat(a[:1], npad - n, axis=0)], axis=0)
                blocked.append(a[perm].reshape((nblk, blk) + a.shape[1:]))
            else:
                blocked.append((leaf, None))   # marker: not per-agent

        def params_view(bi):
            return treedef.unflatten([
                l[0] if isinstance(l, tuple) else l[bi] for l in blocked])

        def recv_block(bi):
            take = (nbr[bi][:, None] * bs + lane[None, :]).reshape(-1)
            src = (x[take], y[take], psi[take], v[take])
            src_ok = act[take] & jnp.repeat(valid[bi], bs)
            recv = (xr[bi], yr[bi], pr[bi], vr[bi])
            fpx, fpy = self.rep_force(params_view(bi), src, recv)
            untracked = F.untracked_foes_tile(
                src[0], src[1], idx[take], src_ok, hfov[take],
                recv[0], recv[1], recv[2], ir[bi], ar[bi],
                priority_p2r=self.priority_p2r)
            reduce = self.rep_reduce or F.sum_sources
            return reduce(fpx, fpy, ~untracked)

        frx, fry = jax.lax.map(recv_block, jnp.arange(nblk))
        fx = jnp.zeros((npad,), dtype).at[perm].set(frx.reshape(npad))[:n]
        fy = jnp.zeros((npad,), dtype).at[perm].set(fry.reshape(npad))[:n]
        return fx, fy

    def repulsive_sum_neighbors(self, state: AgentState, cache=None,
                                presorted: bool = False):
        """Block-sparse culled pairwise forces (cell sort + neighbor-block
        table + Pallas tile kernel; see ops.neighbors/ops.pallas_forces).
        `cache` is an optional prebuilt `neighbor_cache` result (amortized
        rebuilds); positions/headings are re-packed every step either way.

        With presorted=True the agent rows are ALREADY in cell-sorted
        order (the sorted-resident fast path of `simulate`): the per-step
        [N, 16]-row gather and the output scatter collapse away. Requires
        N divisible by the block size.

        Custom force tiles route through the generic per-receiver-block
        path (`repulsive_sum_neighbors_generic`).
        """
        if self.pair_family == "custom":
            return self.repulsive_sum_neighbors_generic(state, cache)
        cfg = self.neighbors
        n = state.n
        blk = cfg.block
        npad = ((n + blk - 1) // blk) * blk
        dtype = state.s.dtype
        src_pack, recv_pack = self.pack_pair_fields(state, npad)

        if presorted:
            nbr, valid = cache[1], cache[2]
            out = self.pair_kernel_dispatch(nbr, valid, src_pack, recv_pack)
            return out[0][:n], out[1][:n]

        if cache is None:
            cache = self.neighbor_cache(state)
        perm, nbr, valid = cache[0], cache[1], cache[2]
        src_sorted, recv_sorted = sorted_packs(src_pack, perm, npad, dtype)
        out = self.pair_kernel_dispatch(nbr, valid, src_sorted, recv_sorted)
        return unsort_forces(out, perm, npad, n, dtype)

    def calc_forces(self, state: AgentState, nbr_cache=None,
                    presorted: bool = False):
        """Total social force per agent; returns (fx, fy, state) where
        `state` carries the navigation-FSM updates done by the destination
        force (reference intersection.py:747-864)."""
        fdx, fdy, state = self.dest_force(self.params, state)
        if self.scripted is not None:
            # scripted agents have no destination force (reference
            # vehicle.py:985-986); the clamp below then also zeroes the
            # repulsive force they receive. The script tables are indexed
            # by the persistent agent uid, so the mask follows the agent
            # through row permutations and device sharding.
            smask = self.scripted.mask[state.uid]
            fdx = jnp.where(smask, 0.0, fdx)
            fdy = jnp.where(smask, 0.0, fdy)

        if self.rep_force is not None and state.n > 1:
            if self.neighbors is not None:
                frx, fry = self.repulsive_sum_neighbors(
                    state, nbr_cache, presorted=presorted)
            else:
                frx, fry = self.repulsive_sum(state)
            combine = self.combine_forces or F.clamp_add_dest
            fx, fy = combine(frx, fry, fdx, fdy)
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
        """Post-dynamics bookkeeping: freeze inactive agents, replay
        scripted trajectories, advance the step counter, record the
        position ring buffer (reference vehicle.py:319-321, 1279-1282)."""
        merged = _freeze_inactive(before.active, before, new)
        i = merged.i + jnp.where(before.active, 1, 0)
        if self.scripted is not None:
            # s <- traj[:, i] at the incremented counter, holding the last
            # state past the script end (reference vehicle.py:973-977).
            # The script tables ([N_global] rows) are indexed by the
            # persistent agent uid, NOT the row position: the replay
            # follows the agent through row permutations (sorted
            # residency) and device sharding, where a shard's rows are a
            # slice/permutation of the global population.
            sc = self.scripted
            uid = merged.uid
            length = sc.length[uid]
            smask = sc.mask[uid]
            idx = jnp.minimum(i, length - 1)
            replay = sc.traj[uid, idx]
            use = smask & (i < length)
            hold = smask & ~(i < length)
            s = jnp.where(use[:, None], replay.astype(merged.s.dtype),
                          merged.s)
            s = jnp.where(hold[:, None], before.s, s)
            merged = merged.replace(s=s)
        # ring write at the GLOBAL step clock (see AgentState.t_glob): a
        # scalar slot makes this a [N, 1, 2] dynamic_update_slice instead
        # of a full-ring one-hot rewrite (read+write ~200 MB/step at
        # N = 1e5, H = 128). Every agent (frozen ones included) records
        # its held position, so slot t % H = position at global step t.
        t1 = merged.t_glob + 1
        z = jnp.zeros((), t1.dtype)     # match index dtypes under x64
        pos_hist = jax.lax.dynamic_update_slice(
            merged.pos_hist, merged.s[:, None, :2],
            (z, t1 % merged.hist_len, z))
        return merged.replace(i=i, t_glob=t1, pos_hist=pos_hist)

    # device-resident per-step metrics (SURVEY.md section 5): columns of
    # the [T, 8] buffer returned by simulate(record_metrics=True).
    # nbr_overflow counts receiver blocks whose true neighbor-block count
    # exceeded the NeighborConfig kb capacity (farthest blocks silently
    # dropped) at the last table rebuild -- nonzero means the culled
    # forces are TRUNCATED and kb must be raised.
    METRIC_NAMES = ("n_active", "v_mean", "v_max", "roll_max", "f_mean",
                    "f_max", "arrived_frac", "nbr_overflow")

    @staticmethod
    def step_metrics(state: AgentState, fx, fy, nbr_overflow=0.0):
        """Aggregate population metrics for one step ([8] device floats;
        the structured replacement for the reference's print-based
        observability, SURVEY.md section 5)."""
        act = state.active
        w = act.astype(state.s.dtype)
        n = jnp.maximum(jnp.sum(w), 1.0)
        v = state.s[:, V]
        fmag = jnp.sqrt(fx * fx + fy * fy)
        roll = jnp.abs(state.s[:, THETA])
        return jnp.stack([
            jnp.sum(w),
            jnp.sum(v * w) / n,
            jnp.max(jnp.where(act, v, -jnp.inf)),
            jnp.max(jnp.where(act, roll, 0.0)),
            jnp.sum(fmag * w) / n,
            jnp.max(jnp.where(act, fmag, 0.0)),
            jnp.sum(state.znav[:, 2].astype(w.dtype) * w) / n,
            jnp.asarray(nbr_overflow, dtype=w.dtype),
        ])

    def step_with_forces(self, state: AgentState, nbr_cache=None,
                         presorted: bool = False):
        """One full step; also returns the applied forces (for saveForces
        histories, reference vehicle.py:162-164)."""
        _check_state_widths(self.state_widths, state)
        before = state
        fx, fy, state = self.calc_forces(state, nbr_cache,
                                         presorted=presorted)
        new = self.model_step(self.params, state, fx, fy)
        return self.finish_step(before, new), fx, fy

    def step(self, state: AgentState) -> AgentState:
        return self.step_with_forces(state)[0]

    # ---- scan loop ----

    def simulate(self, state: AgentState, n_steps: int,
                 record: bool = True, record_forces: bool = False,
                 record_metrics: bool = False):
        """Run `n_steps` under lax.scan.

        With a NeighborConfig whose rebuild_every > 1, the cell sort and
        neighbor-block table are rebuilt only at chunk boundaries (nested
        scan); the skin margin keeps the stale table conservative for the
        in-between drift.

        Returns (final_state, traj) where traj is [T, N, 8] recorded states
        (and optionally a (fx, fy) history), or (final_state, None).
        """
        def ovf(cache):
            return (jnp.sum(cache[3]) if cache is not None else 0.0)

        def out(st, fx, fy, cache=None):
            if record_metrics:
                return self.step_metrics(st, fx, fy, ovf(cache))
            if record and record_forces:
                return (st.s, fx, fy)
            if record:
                return st.s
            return None

        def body(st, _):
            cache = (self.neighbor_cache(st)
                     if self.neighbors is not None else None)
            st, fx, fy = self.step_with_forces(st, cache)
            return st, out(st, fx, fy, cache)

        k = (self.neighbors.rebuild_every
             if self.neighbors is not None else 1)
        if k <= 1 or n_steps < k:
            return jax.lax.scan(body, state, None, length=n_steps)

        if getattr(self.neighbors, "rebuild_mode", "chunked") == "flat":
            return self._simulate_flat(state, n_steps, k, out,
                                       record, record_forces)

        n_chunks, rem = divmod(n_steps, k)

        # sorted-resident fast path: agent rows live in cell-sorted order
        # for the whole chunk (the chunk-start permutation moves the WHOLE
        # state once), so the per-step [N, 16]-row pack gather and force
        # scatter of the culled pair stage disappear. Original row order
        # is restored once at the end via the carried `ident` column.
        # Requires: no per-step recording of per-agent arrays (aggregated
        # metrics are permutation-invariant), N divisible by the block
        # size. Scripted agents are fine since round 5: their replay
        # tables are uid-indexed, so the replay follows permuted rows.
        sorted_resident = _flat_sorted_resident_ok(
            self, state, record, record_forces)

        if sorted_resident:
            def chunk_sr(carry, _):
                st, ident = carry
                cache = self.neighbor_cache(st)
                perm = cache[0]
                st = permute_state(st, perm)
                ident = ident[perm]

                def inner(st, _):
                    st, fx, fy = self.step_with_forces(st, cache,
                                                       presorted=True)
                    return st, out(st, fx, fy, cache)

                st, recs = jax.lax.scan(inner, st, None, length=k)
                return (st, ident), recs

            ident0 = jnp.arange(state.n, dtype=jnp.int32)
            (state, ident), recs = jax.lax.scan(
                chunk_sr, (state, ident0), None, length=n_chunks)
            recs = jax.tree_util.tree_map(
                lambda a: a.reshape((n_chunks * k,) + a.shape[2:]), recs)
            state = permute_state(state, jnp.argsort(ident))
            if rem:
                state, tail = jax.lax.scan(body, state, None, length=rem)
                recs = jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([a, b], axis=0),
                    recs, tail)
            return state, recs

        def chunk(st, _):
            cache = self.neighbor_cache(st)

            def inner(st, _):
                st, fx, fy = self.step_with_forces(st, cache)
                return st, out(st, fx, fy, cache)

            return jax.lax.scan(inner, st, None, length=k)

        state, recs = jax.lax.scan(chunk, state, None, length=n_chunks)
        recs = jax.tree_util.tree_map(
            lambda a: a.reshape((n_chunks * k,) + a.shape[2:]), recs)
        if rem:
            state, tail = jax.lax.scan(body, state, None, length=rem)
            recs = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=0), recs, tail)
        return state, recs


def _flat_sorted_resident_ok(engine, state, record, record_forces):
    """Conditions under which agent rows may live in cell-sorted order
    across a whole run (shared by the chunked and flat simulate paths)."""
    return (engine.sorted_resident
            and engine.neighbors is not None and not record
            and not record_forces
            and engine.pair_family != "custom"
            and state.n % engine.neighbors.block == 0)


def _simulate_flat_impl(self, state: AgentState, n_steps: int, k: int,
                        out, record, record_forces):
    """ONE flat lax.scan with a lax.cond-gated table rebuild every k
    steps and the neighbor cache carried between steps
    (NeighborConfig(rebuild_mode="flat")). Physics-identical to the
    nested chunked form; XLA schedules the flat form far better for
    models with large per-step op graphs (spline family, BASELINE.md
    round 3). Sorted residency composes: the cond's rebuild branch
    re-permutes the state and the carried ident column."""
    sr = _flat_sorted_resident_ok(self, state, record, record_forces)

    cache0 = self.neighbor_cache(state)
    ident0 = jnp.arange(state.n, dtype=jnp.int32)
    if sr:
        state = permute_state(state, cache0[0])
        ident0 = ident0[cache0[0]]

    def body(carry, t):
        st, cache, ident = carry

        def rebuild(op):
            st, ident = op
            c = self.neighbor_cache(st)
            if sr:
                return permute_state(st, c[0]), c, ident[c[0]]
            return st, c, ident

        def keep(op):
            st, ident = op
            return st, cache, ident

        st, cache, ident = jax.lax.cond(
            (t > 0) & (t % k == 0), rebuild, keep, (st, ident))
        st, fx, fy = self.step_with_forces(st, cache, presorted=sr)
        return (st, cache, ident), out(st, fx, fy, cache)

    (state, _, ident), recs = jax.lax.scan(
        body, (state, cache0, ident0),
        jnp.arange(n_steps, dtype=jnp.int32))
    if sr:
        state = permute_state(state, jnp.argsort(ident))
    return state, recs


Engine._simulate_flat = _simulate_flat_impl


def _check_state_widths(widths, state):
    """Trace-time guard: a state built with make_state(model=A) carries
    zero-width internal fields A never touches; running model B on it
    would SILENTLY slice empty arrays (JAX clamps/drops out-of-bounds
    lane indices) instead of erroring. Shapes are static, so this costs
    nothing inside jit."""
    if not widths:
        return
    for f, need in widths.items():
        a = getattr(state, f, None)
        if a is not None and a.ndim > 1 and a.shape[1] < need:
            raise ValueError(
                f"state.{f} has width {a.shape[1]} but this model needs "
                f">= {need}: the state was built for a different model "
                f"(make_state(model=...)); rebuild it with this model or "
                f"with the default widths")


_PER_AGENT_FIELDS = (
    "s", "dyn_x", "dyn_v", "dyn_gains", "pid_e", "pid_i", "dest", "destqueue",
    "destpointer", "nq", "znav", "znavparams", "i_stopsignal",
    "d_stopsignal", "zrid", "walk_ok_steps", "uid",
)


_ALL_AGENT_FIELDS = _PER_AGENT_FIELDS + ("i", "pos_hist", "active")


def permute_state(state: AgentState, perm) -> AgentState:
    """Reorder the agent rows of every per-agent array by `perm` (used
    once per rebuild chunk by the sorted-resident simulate path).

    The fields are CONCATENATED into ONE flat [N, K] matrix and gathered
    once, then split back: TPU row gathers are per-ROW bound (width
    barely matters), so the 19 per-field gathers of the naive form --
    many with tiny minor dims ([N], [N, 2], [N, 3] bool) -- cost ~19x
    one packed gather. Measured end-to-end at N = 1e6 (the per-call
    numbers are swamped by the ~58 ms remote-tunnel dispatch latency):
    72.4 -> 56.8 ms/step, i.e. ~310 ms saved per rebuild. Int/bool
    fields ride the float matrix via an exact int32 conversion + 4-byte
    bitcast (bit movement only -- gather/concat/slice never do
    arithmetic on the bitcast lanes); the float64 path (CPU tests) keeps
    a separate int gather instead of bitcasting (width mismatch).

    The pack/unpack is built in TRANSPOSED [K, N] orientation (concat
    along the SUBLANE axis, one materialized transpose each side of the
    gather): concatenating [N, c] columns directly forces each narrow
    operand into a row-major T(8, 128) copy whose lanes pad c -> 128 --
    a 976 MB temp PER 1-column field at N = 2e6 (~9 GB of padding; the
    observed HBM wall at that scale). [c, N] operands only pad sublanes
    c -> 8, and the per-field column extracts on the unpack side are
    major-axis slices, so the narrow temps never exist."""
    # optimization_barrier MATERIALIZES the packed matrix on both sides
    # of the gather so XLA cannot fuse the concat into the gather (or
    # the downstream slices into per-field gathers), which would
    # silently undo the packing
    barrier = jax.lax.optimization_barrier

    def gather_rows(mT):
        packed = barrier(barrier(mT.T)[perm])           # [n, K] row gather
        return barrier(packed.T)                        # [K, n]

    packT, ipackT = pack_state_rows(state)
    packT = gather_rows(packT)
    if ipackT is not None:
        ipackT = gather_rows(ipackT)
    out = unpack_state_rows(state, packT, ipackT)
    # uid rides OUTSIDE the packed matrix (see _PACK_EXCLUDED): one
    # standalone [N] int gather per rebuild is per-row-bound noise
    return out.replace(uid=state.uid[perm])


# uid is EXCLUDED from the packed state matrix: appending it as the
# 114th column re-schedules the whole sorted-resident stochastic step
# (XLA temp memory 175 -> 388 MB, +1.5 ms/step at N = 1e5 -- measured
# round 4; the det flagship was unaffected, so this is a scheduling
# cliff, not gather cost). Callers of pack/unpack must transport uid
# separately (permute_state gathers it standalone; the halo reshard
# sends it through the `extras` channel).
_PACK_EXCLUDED = ("uid",)


def _state_pack_layout(state):
    """Field layout of the packed state matrix: (flt, ints) lists of
    (field, restshape, cols, dtype), ints holding every integer/bool
    field (packed separately or bitcast into the float matrix).
    Fields in _PACK_EXCLUDED are left out (see note above)."""
    flt, ints = [], []
    for f in _ALL_AGENT_FIELDS:
        if f in _PACK_EXCLUDED:
            continue
        a = getattr(state, f)
        cols = 1
        for d in a.shape[1:]:
            cols *= d
        ent = (f, a.shape[1:], cols, a.dtype)
        if jnp.issubdtype(a.dtype, jnp.integer) or a.dtype == jnp.bool_:
            ints.append(ent)
        else:
            flt.append(ent)
    return flt, ints


def pack_state_rows(state: AgentState):
    """Concatenate every per-agent field into ONE transposed packed
    matrix ([K, n]; see the permute_state docstring for why the
    transposed orientation). f32 states bitcast int/bool fields into the
    float matrix and return (packT, None); wider dtypes (the f64 CPU
    test path) return a separate (packT, ipackT) int32 matrix.

    The concat happens in FLAT 1-D form (column-major per field) and is
    reshaped to [K, n] afterwards: 1-D arrays are never lane-padded,
    while 2-D concat operands inherit the concat's layout -- XLA's
    layout assignment makes the downstream transpose free by picking
    {0,1}, which silently turns every narrow operand back into a
    128-lane-padded copy (the N = 2e6 HBM wall, in both orientations)."""
    n = state.n
    bitcast = jax.lax.bitcast_convert_type
    flt, ints = _state_pack_layout(state)

    def col_major(f, cols):
        a = getattr(state, f)
        return (a.reshape(n) if cols == 1
                else a.reshape(n, cols).T.reshape(cols * n))

    mats = [col_major(f, cols) for f, _, cols, _ in flt]
    imats = [col_major(f, cols).astype(jnp.int32)
             for f, _, cols, _ in ints]
    kf = sum(cols for _, _, cols, _ in flt)
    ki = sum(cols for _, _, cols, _ in ints)
    if state.s.dtype == jnp.float32:
        mats += [bitcast(m, jnp.float32) for m in imats]
        return jnp.concatenate(mats).reshape(kf + ki, n), None
    return (jnp.concatenate(mats).reshape(kf, n),
            jnp.concatenate(imats).reshape(ki, n) if imats else None)


def unpack_state_rows(state: AgentState, packT, ipackT) -> AgentState:
    """Inverse of pack_state_rows: split the (row-reordered) packed
    [K, n] matrices back into the state's per-agent fields."""
    n = state.n
    bitcast = jax.lax.bitcast_convert_type
    flt, ints = _state_pack_layout(state)
    upd = {}
    off = 0
    for f, rest, cols, dt in flt:
        sl = packT[off:off + cols]                       # [c, n] slice
        upd[f] = (sl.reshape((n,) + rest) if cols == 1
                  else sl.T.reshape((n,) + rest))
        off += cols
    ioff = 0 if ipackT is not None else off
    srcT = ipackT if ipackT is not None else packT
    for f, rest, cols, dt in ints:
        sl = srcT[ioff:ioff + cols]
        if ipackT is None:
            sl = bitcast(sl, jnp.int32)
        if cols == 1:
            upd[f] = sl.astype(dt).reshape((n,) + rest)
        else:
            upd[f] = sl.T.astype(dt).reshape((n,) + rest)
        ioff += cols
    return state.replace(**upd)


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
