"""Pallas TPU kernel for the pairwise social-force hot loop.

The O(N^2) repulsive-force stage reduced to block-sparse tiles: agents are
cell-sorted and blocked (ops.neighbors); this kernel walks the fixed-width
neighbor-block table with a (B, KB) grid, scalar-prefetching the source
BLOCK INDEX for each step so the BlockSpec index_map streams exactly the
needed [T, C] source tile from HBM into VMEM -- no per-agent gathers, no
dense [N, N] materialization. Per grid step it evaluates one [T, T] tile
of the BMD2023 anisotropic force field (ops.forces.rep_force_twod_pair
math: trig-free, only sqrt/exp on the VPU), applies the FOV / self /
active mask (ops.forces.untracked_foes_tile semantics), and accumulates
the source-sum into the [2, T] per-receiver output block, which Pallas
keeps resident in VMEM across the inner KB grid dimension.

Packing layout (built by Engine.pack_pair_fields /
MixedEngine.pack_pair_fields_mixed):
  src_pack [N, 16]: x, y, cos psi, sin psi, f_0, e_0, e_1, sigma_0..3,
                    cos(hfov/2), emit, fam (14 used, padded to 16 lanes);
                    column 4 (_F0) is PRE-MULTIPLIED by the emit flag
                    (active AND f_0 > 0) so non-emitting sources yield
                    P = 0 without a per-pair mask op; column 12 (_SACT)
                    still carries the raw flag (consumed by the XLA
                    gather backend), column 13 (_FAM) the force family
                    selector (mixed mode only, see below)
  recv_pack [8, N]: x, y, cos psi, sin psi, active (5 used, padded)
Both are in CELL-SORTED order; outputs are [2, N] sorted forces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SRC_COLS = 16
RECV_ROWS = 8

# src_pack column layout. In MIXED mode (heterogeneous force families,
# mixed.py) column _FAM selects the source's field per row: 0 = twod
# (cols 4-10 = f_0, e_0, e_1, sigma_0..3), 1 = legacy (cols 4-7 reused as
# amp = p_0/p_decay, e, 1/sqrt(1-e^2), 1/p_decay; cols 8-10 are unused on
# legacy rows -- _tile_forces overrides vdecay0/1 and e there so the
# shared sigma/emit mask chain stays well-defined whatever they hold).
_SX, _SY, _SC, _SS, _F0, _E0, _E1, _S0, _S1, _S2, _S3, _CHF, _SACT, \
    _FAM = range(14)
# column 15 (the last pad lane) carries the RECEIVER-side activity flag:
# the non-sorted-resident path derives the receiver pack from the single
# sorted source pack (src cols 0-3 + this) instead of gathering a second
# [8, N] pack by the same permutation (TPU gathers are per-row bound)
_RACT = 15


def _flat_sentinel_table(nbr, valid):
    """Fuse the (nbr [B, KB] int32, valid [B, KB]) neighbor table into one
    FLAT [B*KB] int32 sign-sentinel array for scalar prefetch.

    SMEM lays scalar-prefetch operands out at (8, 128)-tile granularity,
    so a 2-D [B, KB] int32 table occupies B*128*4 B of SMEM -- 4 MB at
    N = 1e6 (B = 7813), over the 1 MB SMEM budget; flat 1-D costs B*KB*4
    (~400 KB at 1e6, one 128-lane pad total). Valid entries (a closest-
    first prefix per row, ops.neighbors.neighbor_block_table) keep the
    source block index; invalid entries store -(row's last valid index)-1,
    so the decoded index repeats the previous grid step's and the Pallas
    pipeline's unchanged-index revisit skip elides the DMA."""
    validb = valid.astype(bool)
    count = jnp.sum(validb, axis=1)                            # [B]
    last = jnp.take_along_axis(
        nbr, jnp.maximum(count - 1, 0)[:, None], axis=1)       # [B, 1]
    return jnp.where(validb, nbr, -last - 1).reshape(-1)       # [B*KB]


def _pair_kernel(tab_ref, roff_ref, src_ref, recv_ref, out_ref,
                 *, block: int, kb: int, priority_p2r: bool, cutoff2: float,
                 mixed: bool = False, sub: int = 0, screen: bool = True,
                 fov: bool = True, block_src: int = 0, uniform=None):
    block_src = block_src or block
    b = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # tab is the FLAT [B*KB] sign-sentinel table (see the SMEM note in
    # pair_forces_neighbors): entry >= 0 -> valid source block index
    @pl.when(tab_ref[b * kb + k] >= 0)
    def _accumulate():
        if not screen:
            # no runtime distance screen: with the serpentine cell sort
            # the table is tight enough that nearly every admitted tile
            # has pairs in range, and the screen's [T, T] min-reduction
            # forces a vector->scalar SREG roundtrip (~0.25 us pipeline
            # stall per tile) that costs more than it saves
            fx, fy = _tile_forces(src_ref, recv_ref, priority_p2r,
                                  mixed=mixed, fov=fov, uniform=uniform)
            out_ref[0:1, :] += fx
            out_ref[1:2, :] += fy
        elif sub:
            # strip-level distance screen: the field math is ~40 VPU
            # slots/pair while dx/dy/rho2 is ~5, and within an admitted
            # tile only ~10-20% of pairs lie inside the cutoff -- screen
            # each [sub, block] SOURCE STRIP and skip the transcendental
            # math for strips with no pair in range (force error bounded
            # by the same exp(-cutoff/sigma) argument as the tile screen)
            for s0 in range(0, block_src, sub):
                strip = src_ref[s0:s0 + sub, :]
                dx = recv_ref[0:1, :] - strip[:, _SX:_SX + 1]
                dy = recv_ref[1:2, :] - strip[:, _SY:_SY + 1]
                rho2_min = jnp.min(dx * dx + dy * dy)

                @pl.when(rho2_min <= cutoff2)
                def _strip(strip=strip):
                    fx, fy = _tile_forces(strip, recv_ref, priority_p2r,
                                          mixed=mixed, fov=fov,
                                          uniform=uniform)
                    out_ref[0:1, :] += fx
                    out_ref[1:2, :] += fy
        else:
            # tile-level distance screen: fringe tiles admitted by the
            # box-to-box cull may contain no pair inside the cutoff
            dx = recv_ref[0:1, :] - src_ref[:, _SX:_SX + 1]
            dy = recv_ref[1:2, :] - src_ref[:, _SY:_SY + 1]
            rho2_min = jnp.min(dx * dx + dy * dy)

            @pl.when(rho2_min <= cutoff2)
            def _inner():
                fx, fy = _tile_forces(src_ref, recv_ref, priority_p2r,
                                      mixed=mixed, fov=fov,
                                      uniform=uniform)
                out_ref[0:1, :] += fx
                out_ref[1:2, :] += fy


@functools.partial(jax.jit, static_argnames=("block", "priority_p2r",
                                             "interpret", "cutoff",
                                             "mixed", "sub", "screen",
                                             "fov", "block_src",
                                             "uniform"))
def pair_forces_neighbors(nbr, valid, src_pack, recv_pack, block: int = 128,
                          priority_p2r: bool = False,
                          interpret: bool = False,
                          cutoff: float = float("inf"),
                          recv_offset=None, mixed: bool = False,
                          sub: int = 0, screen: bool = True,
                          fov: bool = True, block_src: int = 0,
                          uniform=None):
    """Block-sparse pairwise force sum.

    nbr, valid : [B, KB] neighbor-block table (ops.neighbors); `nbr`
                 indexes SOURCE blocks (which may outnumber the receiver
                 blocks -- the sharded path all-gathers sources globally
                 while receivers stay local)
    src_pack   : [N_src, 16] cell-sorted source fields
    recv_pack  : [8, B*block] cell-sorted receiver fields
    recv_offset: optional [1] int32 -- the receiver shard's first block's
                 index within the source block array (self-pair exclusion
                 needs source/receiver indices in the same numbering)
    block_src  : SOURCE block granularity (0 = `block`). Sources are the
                 tile's sublane dim, so a finer source block (e.g. 64)
                 shrinks candidate tiles at no lane-utilization cost --
                 ~20% fewer candidate pairs on the bench distribution
                 (the table must be built at the same granularity:
                 ops.neighbors.build(block_src=...)).
    returns    : [2, B*block] summed (fx, fy) per receiver, sorted order
    """
    n_src = src_pack.shape[0]
    bcount, kb = nbr.shape
    n_out = bcount * block
    block_src = block_src or block
    assert n_src % block_src == 0
    assert recv_pack.shape[1] == n_out
    if recv_offset is None:
        recv_offset = jnp.zeros((1,), jnp.int32)

    tab = _flat_sentinel_table(nbr, valid)

    def src_map(b, k, tab_ref, roff_ref):
        v = tab_ref[b * kb + k]
        return (jnp.where(v >= 0, v, -v - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bcount, kb),
        in_specs=[
            pl.BlockSpec((block_src, SRC_COLS), src_map),
            pl.BlockSpec((RECV_ROWS, block),
                         lambda b, k, tab_ref, roff_ref: (0, b)),
        ],
        out_specs=pl.BlockSpec((2, block),
                               lambda b, k, tab_ref, roff_ref: (0, b)),
    )
    c2 = float(cutoff) ** 2 if cutoff != float("inf") else 3.0e38
    if sub:
        assert block_src % sub == 0 and sub % 8 == 0, (block_src, sub)
    kernel = functools.partial(_pair_kernel, block=block, kb=kb,
                               priority_p2r=priority_p2r, cutoff2=c2,
                               mixed=mixed, sub=sub, screen=screen,
                               fov=fov, block_src=block_src,
                               uniform=uniform)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, n_out), src_pack.dtype),
        interpret=interpret,
    )(tab, recv_offset.astype(jnp.int32), src_pack, recv_pack)


# --------------------------------------------------------------------------
# double-buffered variant: one program per RECEIVER block, inner loop over
# neighbor blocks with manual async DMA -- amortizes per-program overhead
# and overlaps the data-dependent source-tile copies with tile compute
# --------------------------------------------------------------------------


def _tile_forces(src_tile, recv_ref, priority_p2r,
                 mixed: bool = False, fov: bool = True, uniform=None):
    """[S, T] tile math + mask; returns (fx_row, fy_row) [1, T] sums.
    Shared by both kernels; src_tile is a [S, 16] VMEM array/ref value
    (a whole source block, or a strip of one). Self-pairs are excluded
    positionally (rho2 > 0), so no block indices are needed.

    With mixed=True, each source row's _FAM column selects between the
    BMD2023 twod field and the legacy v0.1 elliptic field (cols 4-7
    reinterpreted -- see the layout comment at the top). Both branches are
    evaluated on the VPU and lane-selected; the legacy math is ~1/3 the
    twod op count, so the mixed tile costs ~1.3x a pure twod tile.

    uniform: optional compile-time (e_0, e_1, sigma_0..3, cos(hfov/2))
    floats for a population whose pair-field parameters are one shared
    scalar per field (the common case; detected host-side at engine
    build). The 7 parameter columns then become baked constants, and the
    per-tile [S, 1] column extract + lane-broadcast pairs they cost --
    a large share of the ~0.15 us/tile fixed overhead measured by
    scripts/exp_kernel_compare.py -- disappear. Mutually exclusive with
    `mixed` (heterogeneous rows are never uniform)."""
    assert uniform is None or not mixed
    def sc(c):
        return src_tile[:, c:c + 1]

    xr = recv_ref[0:1, :]
    yr = recv_ref[1:2, :]
    cr = recv_ref[2:3, :]
    sr = recv_ref[3:4, :]
    act_r = recv_ref[4:5, :]

    xs, ys, cs, ss = sc(_SX), sc(_SY), sc(_SC), sc(_SS)
    dx = xr - xs
    dy = yr - ys
    rho2 = dx * dx + dy * dy
    # rsqrt replaces sqrt+divide pairs; max(rho2, tiny) keeps rho == 0
    # pairs finite (1e15, not inf, so 0 * inv_rho stays 0) -- they are
    # dropped by the `tracked` mask (rho2 > 0) folded into `w` below
    inv_rho = jax.lax.rsqrt(jnp.maximum(rho2, 1e-30))
    dxn = dx * inv_rho                      # unit separation vector:
    dyn = dy * inv_rho                      # the whole field only needs
    #                                         rho through exp(-rho/...)

    # HOISTED BROADCASTS: Mosaic materializes one [S, 1] -> [S, T] (or
    # [1, T] -> [S, T]) lane/sublane broadcast PER USE SITE -- each costs
    # the same 8 vreg-ops as a full-tile arith op (scripts/
    # exp_mosaic_dump.py counted 25 of them in the shipped tile, ~15% of
    # the issue slots). Columns/rows consumed more than once are
    # broadcast explicitly ONCE here so every later use is a plain
    # full-tile operand.
    shp = rho2.shape
    cs_b = jnp.broadcast_to(cs, shp)
    ss_b = jnp.broadcast_to(ss, shp)
    cr_b = jnp.broadcast_to(cr, shp)
    sr_b = jnp.broadcast_to(sr, shp)

    sin_rel = ss_b * cr_b - cs_b * sr_b
    sin2 = sin_rel * sin_rel
    # vd1h == vdecay1 / 2: the half-angle algebra below only ever needs
    # the HALVED vdecay1 (via th), so the 0.5 is folded into the cheap
    # [S, 1] column ops (or the baked constants) instead of a full-tile
    # mul
    if uniform is not None:
        e0u, e1u, s0u, s1u, s2u, s3u, _chfu = uniform
        vdecay0 = s0u + s1u * sin2
        vd1h = 0.5 * s2u + (0.5 * s3u) * sin2
        e = e0u - e1u * sin2
    else:
        vdecay0 = sc(_S0) + sc(_S1) * sin2
        vd1h = sc(_S2) * 0.5 + (sc(_S3) * 0.5) * sin2
        e = sc(_E0) - sc(_E1) * sin2
    if mixed:
        # the legacy branch reuses cols 4-7; keep the twod branch's
        # intermediates well-defined on legacy rows (selected away below)
        legacy = sc(_FAM) > 0.5
        e = jnp.where(legacy, 0.0, e)
        vdecay0 = jnp.where(legacy, 1.0, vdecay0)
        vd1h = jnp.where(legacy, 0.0, vd1h)

    cosphi = dxn * cs_b + dyn * ss_b  # |cosphi| <= 1 + eps (no clip: the
    sinphi = dyn * cs_b - dxn * ss_b  # downstream algebra tolerates eps)
    # half-angle pieces via ONE rsqrt, in the UNSCALED m4 = ax^2 + ay^2
    # = 4 sin^2(phi/2) form (saves the 0.25 scale op):
    #   sin(phi/2)      = 0.5 * m4 * rsqrt(m4)
    #   dsigm's rm term = sinphi * rsqrt(m4) * -0.5
    # so with th = 0.5 * vdecay1 * rsqrt(m4), shared by both:
    #   sigma = vdecay0 - m4 * th,   -dsigm = th * sinphi
    # (identity: sinphi = 2 sin(phi/2) cos(phi/2)).
    # m4 is computed from the COORDINATE difference, not 1 - cosphi: the
    # latter cancels catastrophically for near-aligned pairs and rsqrt
    # amplifies its relative error (~ulp(1)/m) straight into dsigm.
    # The 4e-12 floor bounds the rsqrt so the exactly-aligned case
    # (where f32 rounding decouples sinphi from m4) keeps |dsigm|
    # <= ~0.5 vdecay1 -- the same order as the field's own sign(sinphi)
    # discontinuity there (the reference flips dsigm's sign across
    # phi = 0; this form interpolates through the jump instead).
    ax = dxn - cs_b
    ay = dyn - ss_b
    m4 = jnp.maximum(ax * ax + ay * ay, 4e-12)
    th = vd1h * jax.lax.rsqrt(m4)
    sigma = vdecay0 - m4 * th
    ndsigm = th * sinphi                    # == -dsigm
    ecos = e * cosphi
    ec2 = 1 - ecos * ecos                   # ec2 >= 1 - e_0^2 > 0

    # The reference normalizes the polar force vector (f_rho, f_phi) to
    # magnitude P and rotates it to Cartesian (vehicle.py:1560-1648).
    # Since only the DIRECTION of (f_rho, f_phi) survives normalization,
    # rescale it by the positive factor sigma^2 * sqrt(ec2):
    #     f_rho ~ u = ec2 * sigma
    #     f_phi ~ v = e^2 sinphi cosphi sigma - ec2 * dsigm
    # which eliminates the 1/sigma^2 and 1/sqrt(ec2) chains of the
    # textbook form -- the tile is VPU-issue-bound at ~1 ps/(pair*op),
    # so every spared full-tile op is ~0.02 ms at the bench scale.
    # exp argument: rho*sqrt(ec2)/sigma == sqrt(rho2*ec2)*rsqrt(sigma^2)
    # -- merges the rho and sqrt(ec2) muls into one sqrt and replaces
    # the divide. Clamping sigma at 1e-15 (not 0) FOLDS the sigma > 0
    # mask into P itself AND spares the rsqrt-argument floor: sigma <= 0
    # pairs see rsqrt(1e-30) = 1e15, and the exp argument
    # -sqrt(rho2*ec2)*1e15 underflows to P = 0 exactly for any rho2 > 0
    # (rho2 == 0 pairs are excluded by `tracked`) -- one max op instead
    # of a compare + and in the mask chain.
    sig_c = jnp.maximum(sigma, 1e-15)
    P = sc(_F0) * jnp.exp(-jnp.sqrt(rho2 * ec2)
                          * jax.lax.rsqrt(sig_c * sig_c))
    u = ec2 * sigma
    # v = e^2 sinphi cosphi sigma - ec2 dsigm, with e*sinphi and the
    # shared ecos = e*cosphi factoring one mul out of the e^2 chain
    v = (e * sinphi) * (ecos * sigma) + ec2 * ndsigm
    inv_m = jax.lax.rsqrt(jnp.maximum(u * u + v * v, 1e-30))

    # mask chain (minimum count of [S, R]-shaped ops):
    #   * FOV: the receiver must lie within the SOURCE's half-FOV cone
    #     (the reference's source-indexed-FOV quirk, see
    #     ops.forces.untracked_foes_tile) -- in normalized form (divide
    #     the cone test by rho > 0), sparing the chf * rho mul;
    #   * rho2 > 0 excludes the self-pair (self-distance is exactly 0)
    #     AND coincident distinct pairs (whose field is singular; the
    #     reference divides by zero for those) -- an explicit index
    #     compare would be redundant;
    #   * emit-side activity and f_0 > 0 are PRE-MULTIPLIED into the
    #     packed _F0 column by engine.pack_pair_fields (P = 0 for
    #     non-emitting sources), so no source mask op is needed here;
    #   * sigma <= 0 (non-physical vdecay polynomial) is folded into P
    #     via the max(sigma, 0) clamp above -- no mask op either.
    tracked = rho2 > 0.0
    if fov:
        # with fov=False (every agent's hfov == 2 pi, the reference's
        # Vehicle default) the cone test is statically elided (~5 full-
        # tile ops). The sign flip rides the [S, 1] column (or the
        # baked constant), not the [S, R] dot product.
        chf = -_chfu if uniform is not None else -sc(_CHF)
        tracked &= (dxn * cr_b + dyn * sr_b) <= chf
    if priority_p2r:
        tracked &= (dyn * cr_b - dxn * sr_b) >= 0
    tracked &= act_r > 0                    # cheap [1, R] cmp

    # fold the mask into the shared scale: masked pairs contribute w = 0,
    # so no per-component where is needed before the reduction
    w = jnp.where(tracked, P * inv_m, 0.0)
    fx_pair = w * (u * dxn - v * dyn)
    fy_pair = w * (u * dyn + v * dxn)

    if mixed:
        # legacy v0.1 elliptic field (ops.forces.rep_force_legacy_pair):
        # cols: _F0 = amp, _E0 = e, _E1 = 1/sqrt(1-e^2), _S0 = 1/p_decay
        rho = rho2 * inv_rho
        e_l, inv_se, inv_pd = sc(_E0), sc(_E1), sc(_S0)
        u_l = (1 - e_l * cosphi) * inv_se
        P_l = sc(_F0) * jnp.exp(-rho * u_l * inv_pd)
        frho0 = P_l * u_l
        fphi0 = P_l * e_l * sinphi * inv_se
        w_l = jnp.where(tracked, 1.0, 0.0)
        fx_pair = jnp.where(legacy, w_l * (frho0 * dxn - fphi0 * dyn),
                            fx_pair)
        fy_pair = jnp.where(legacy, w_l * (frho0 * dyn + fphi0 * dxn),
                            fy_pair)

    fx = jnp.sum(fx_pair, axis=0, keepdims=True)
    fy = jnp.sum(fy_pair, axis=0, keepdims=True)
    return fx, fy


def _pair_kernel_unrolled(tab_ref, roff_ref, src_hbm, recv_ref,
                          out_ref, scratch, sems, *, block: int, kb: int,
                          priority_p2r: bool, mixed: bool = False,
                          fov: bool = True, block_src: int = 0,
                          uniform=None):
    """One program per RECEIVER block; all KB source-tile DMAs are issued
    up-front into a KB-deep VMEM scratch and the accumulate loop is
    STATICALLY UNROLLED -- no per-tile program switch, no fori-loop
    sequencing, no runtime distance screen. The per-tile cost collapses
    to a scalar validity branch while the DMA engine pipelines the
    copies behind the compute. tab is the flat [B*KB] sign-sentinel
    table (see pair_forces_neighbors)."""
    block_src = block_src or block
    b = pl.program_id(0)

    def dma(k):
        v = tab_ref[b * kb + k]
        blk = jnp.where(v >= 0, v, -v - 1)   # sentinel decodes to a
        return pltpu.make_async_copy(        # safe (repeated) index
            src_hbm.at[pl.ds(blk * block_src, block_src), :],
            scratch.at[k], sems.at[k])

    for k in range(kb):          # issue everything; invalid entries point
        dma(k).start()           # at the row's last valid tile
    out_ref[:] = jnp.zeros_like(out_ref)

    for k in range(kb):
        dma(k).wait()

        @pl.when(tab_ref[b * kb + k] >= 0)
        def _acc(k=k):
            fx, fy = _tile_forces(scratch[k][:, :SRC_COLS], recv_ref,
                                  priority_p2r, mixed=mixed, fov=fov,
                                  uniform=uniform)
            out_ref[0:1, :] += fx
            out_ref[1:2, :] += fy


@functools.partial(jax.jit, static_argnames=("block", "priority_p2r",
                                             "interpret", "mixed", "fov",
                                             "block_src", "uniform"))
def pair_forces_neighbors_unrolled(nbr, valid, src_pack, recv_pack,
                                   block: int = 128,
                                   priority_p2r: bool = False,
                                   interpret: bool = False,
                                   recv_offset=None, mixed: bool = False,
                                   fov: bool = True, block_src: int = 0,
                                   uniform=None):
    """Unrolled-DMA block-sparse pairwise force sum (see
    _pair_kernel_unrolled). The source pack is padded to 128 columns
    (HBM->VMEM copies need the minor dim lane-aligned); VMEM scratch is
    KB x block_src x 128 x 4 B, so block=128/kb<=28 fits comfortably.
    block_src: SOURCE block granularity (0 = `block`); finer source
    blocks cut candidate pairs at no lane cost (the table must be built
    at the same granularity)."""
    n_src = src_pack.shape[0]
    bcount, kb = nbr.shape
    n_out = bcount * block
    block_src = block_src or block
    assert n_src % block_src == 0
    assert recv_pack.shape[1] == n_out
    if recv_offset is None:
        recv_offset = jnp.zeros((1,), jnp.int32)
    if src_pack.shape[1] < 128:
        src_pack = jnp.concatenate(
            [src_pack, jnp.zeros((n_src, 128 - src_pack.shape[1]),
                                 src_pack.dtype)], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bcount,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # src stays in HBM
            pl.BlockSpec((RECV_ROWS, block),
                         lambda b, tab_ref, roff_ref: (0, b)),
        ],
        out_specs=pl.BlockSpec((2, block),
                               lambda b, tab_ref, roff_ref: (0, b)),
        scratch_shapes=[
            pltpu.VMEM((kb, block_src, 128), src_pack.dtype),
            pltpu.SemaphoreType.DMA((kb,)),
        ],
    )
    kernel = functools.partial(_pair_kernel_unrolled, block=block, kb=kb,
                               priority_p2r=priority_p2r, mixed=mixed,
                               fov=fov, block_src=block_src,
                               uniform=uniform)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, n_out), src_pack.dtype),
        interpret=interpret,
    )(_flat_sentinel_table(nbr, valid), recv_offset.astype(jnp.int32),
      src_pack, recv_pack)


_DB_DEPTH = 4   # DMA pipeline depth (slots prefetched ahead)


def _pair_kernel_db(tab_ref, roff_ref, src_hbm, recv_ref,
                    out_ref, scratch, sems, *, block: int, kb: int,
                    priority_p2r: bool, cutoff2: float,
                    mixed: bool = False, fov: bool = True):
    b = pl.program_id(0)
    depth = _DB_DEPTH

    def dma(slot, k):
        v = tab_ref[b * kb + k]              # flat sign-sentinel table
        blk = jnp.where(v >= 0, v, -v - 1)   # (see pair_forces_neighbors)
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(blk * block, block), :],
            scratch.at[slot], sems.at[slot])

    # warm up the pipeline: issue the first `depth` copies (kb static)
    for w in range(min(depth, kb)):
        dma(w, w).start()

    out_ref[:] = jnp.zeros_like(out_ref)

    def body(k, _):
        slot = k % depth
        dma(slot, k).wait()

        @pl.when(tab_ref[b * kb + k] >= 0)
        def _acc():
            tile = scratch[slot]
            dx = recv_ref[0:1, :] - tile[:, _SX:_SX + 1]
            dy = recv_ref[1:2, :] - tile[:, _SY:_SY + 1]

            @pl.when(jnp.min(dx * dx + dy * dy) <= cutoff2)
            def _inner():
                fx, fy = _tile_forces(tile[:, :SRC_COLS], recv_ref,
                                      priority_p2r, mixed=mixed, fov=fov)
                out_ref[0:1, :] += fx
                out_ref[1:2, :] += fy

        # refill this slot only after its tile was consumed
        @pl.when(k + depth < kb)
        def _refill():
            dma(slot, k + depth).start()

        return _

    jax.lax.fori_loop(0, kb, body, None)


@functools.partial(jax.jit, static_argnames=("block", "priority_p2r",
                                             "interpret", "cutoff",
                                             "mixed", "fov"))
def pair_forces_neighbors_db(nbr, valid, src_pack, recv_pack,
                             block: int = 256, priority_p2r: bool = False,
                             interpret: bool = False,
                             cutoff: float = float("inf"),
                             recv_offset=None, mixed: bool = False,
                             fov: bool = True):
    """Double-buffered block-sparse pairwise force sum (grid = receiver
    blocks only; neighbor tiles stream through a 2-slot VMEM scratch).

    HBM->VMEM DMAs need the minor dimension aligned to 128 lanes, so the
    source pack is padded from 16 to 128 columns here (bandwidth cost
    ~0.5 ms/step at N = 100k; the grid-overhead savings dominate)."""
    n_src = src_pack.shape[0]
    bcount, kb = nbr.shape
    n_out = bcount * block
    assert n_src % block == 0
    assert recv_pack.shape[1] == n_out
    if recv_offset is None:
        recv_offset = jnp.zeros((1,), jnp.int32)
    if src_pack.shape[1] < 128:
        src_pack = jnp.concatenate(
            [src_pack, jnp.zeros((n_src, 128 - src_pack.shape[1]),
                                 src_pack.dtype)], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bcount,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # src stays in HBM
            pl.BlockSpec((RECV_ROWS, block),
                         lambda b, tab_ref, roff_ref: (0, b)),
        ],
        out_specs=pl.BlockSpec((2, block),
                               lambda b, tab_ref, roff_ref: (0, b)),
        scratch_shapes=[
            pltpu.VMEM((_DB_DEPTH, block, 128), src_pack.dtype),
            pltpu.SemaphoreType.DMA((_DB_DEPTH,)),
        ],
    )
    c2 = float(cutoff) ** 2 if cutoff != float("inf") else 3.0e38
    kernel = functools.partial(_pair_kernel_db, block=block, kb=kb,
                               priority_p2r=priority_p2r, cutoff2=c2,
                               mixed=mixed, fov=fov)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, n_out), src_pack.dtype),
        interpret=interpret,
    )(_flat_sentinel_table(nbr, valid), recv_offset.astype(jnp.int32),
      src_pack, recv_pack)


# --------------------------------------------------------------------------
# XLA fallback (same neighbor structure, gather-based) -- used on CPU and
# as the correctness oracle for the kernel
# --------------------------------------------------------------------------


def pair_forces_neighbors_xla(nbr, valid, src_pack, recv_pack,
                              block: int = 128,
                              priority_p2r: bool = False,
                              recv_offset=None, mixed: bool = False,
                              fov: bool = True, block_src: int = 0):
    """Gather-based evaluation of the identical block-sparse structure.

    With mixed=True, the per-row _FAM column selects the twod or legacy
    field (same packing contract as the Pallas kernels). block_src is
    the SOURCE block granularity (0 = `block`; see
    pair_forces_neighbors)."""
    from cyclistsocialforce_tpu.ops import forces as F

    n = recv_pack.shape[1]
    bcount, kb = nbr.shape
    n_src = src_pack.shape[0]
    block_src = block_src or block
    del recv_offset  # self-exclusion is positional (rho > 0); kept in
    #                  the signature for call-site symmetry with the
    #                  Pallas kernels

    src_blocks = src_pack.reshape(n_src // block_src, block_src, SRC_COLS)
    gathered = src_blocks[nbr]            # [B, KB, S, C]
    src = gathered.reshape(bcount, kb * block_src, SRC_COLS)

    recv = recv_pack.T.reshape(bcount, block, RECV_ROWS)   # [B, T, 8]

    vmask = jnp.repeat(valid, block_src, axis=1)           # [B, KB*S]

    def per_block(s, r, vm):
        if mixed:
            legacy = s[:, 13:14] > 0.5
            e0 = jnp.where(legacy, 0.0, s[:, 5:6])
            e1 = jnp.where(legacy, 0.0, s[:, 6:7])
            s0 = jnp.where(legacy, 1.0, s[:, 7:8])
            s1 = jnp.where(legacy, 0.0, s[:, 8:9])
        else:
            e0, e1, s0, s1 = s[:, 5:6], s[:, 6:7], s[:, 7:8], s[:, 8:9]
        fpx, fpy = F.rep_force_twod_pair(
            r[None, :, 0] - s[:, 0:1], r[None, :, 1] - s[:, 1:2],
            s[:, 2:3], s[:, 3:4], r[None, :, 2], r[None, :, 3],
            s[:, 4:5], e0, e1, s0, s1,
            s[:, 9:10], s[:, 10:11])
        if mixed:
            # legacy rows: cols 4-7 = amp, e, 1/sqrt(1-e^2), 1/p_decay
            lx, ly = F.rep_force_legacy_pair(
                r[None, :, 0] - s[:, 0:1], r[None, :, 1] - s[:, 1:2],
                s[:, 2:3], s[:, 3:4], s[:, 5:6], s[:, 6:7], s[:, 7:8],
                s[:, 4:5])
            fpx = jnp.where(legacy, lx, fpx)
            fpy = jnp.where(legacy, ly, fpy)
        dxs = s[:, 0:1] - r[None, :, 0]
        dys = s[:, 1:2] - r[None, :, 1]
        rho = jnp.sqrt(dxs**2 + dys**2)
        safe = jnp.where(rho > 0, rho, 1.0)
        if fov:
            cos_rel = (dxs * r[None, :, 2] + dys * r[None, :, 3]) / safe
            tracked = cos_rel >= s[:, 11:12]
        else:
            tracked = jnp.ones_like(rho, dtype=bool)
        if priority_p2r:
            sin_rel = (dys * r[None, :, 2] - dxs * r[None, :, 3]) / safe
            tracked &= sin_rel <= 0
        tracked &= rho > 0   # excludes self-pairs and coincident pairs
        tracked &= (s[:, 12:13] > 0) & (r[None, :, 4] > 0)
        tracked &= vm[:, None]
        fx = jnp.sum(jnp.where(tracked, fpx, 0.0), axis=0)
        fy = jnp.sum(jnp.where(tracked, fpy, 0.0), axis=0)
        return fx, fy

    fx, fy = jax.vmap(per_block)(src, recv, vmask)
    return jnp.stack([fx.reshape(n), fy.reshape(n)], axis=0)
