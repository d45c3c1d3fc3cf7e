"""Navigation finite-state machine and destination-queue ops.

Branchless JAX port of the reference's per-agent Python FSMs:
  - destination queue advance/jump (reference vehicle.py:545-604)
  - 3-state navigation FSM computing the desired speed
    (reference vehicle.py:354-457)

All functions operate on one agent's scalars and are vmapped over the agent
axis by the engine. The boolean next-state equations are taken verbatim from
the reference (they were already pure boolean algebra).
"""

from __future__ import annotations

import jax.numpy as jnp

from cyclistsocialforce_tpu.params import pair_lo

BRAKE_SAFETY_K = 1.5  # reference vehicle.py:377


def queue_take(destqueue, idx):
    """Row `idx` of one agent's [Q, 3] queue via a one-hot contraction.

    Under vmap this lowers to a masked reduce over the (small) queue axis
    instead of a dynamic gather -- on TPU, batched gathers with tiny minor
    dimensions serialize badly (measured ~10 ms/step at N = 100k for the
    destination stage; the one-hot form is bandwidth-bound instead).
    """
    oh = jnp.arange(destqueue.shape[0]) == idx
    return jnp.sum(jnp.where(oh[:, None], destqueue, 0.0), axis=0)


def dest_distance(pos, destqueue, destpointer):
    """Distance from `pos` to the current queue destination
    (reference vehicle.py:596-604)."""
    d = queue_take(destqueue, destpointer)[:2] - pos
    return jnp.sqrt(d[0] ** 2 + d[1] ** 2)


def update_destination(pos, dest, destqueue, destpointer, nq, znav,
                       i, i_stopsignal, d_stopsignal, d_arrived_inter):
    """Advance the destination queue for one agent.

    Exact port of Vehicle.updateDestination (reference vehicle.py:545-594):
    no-op while stopping or arrived; advance on arrival at an intermediate
    destination; jump one ahead if the next-next destination is closer; log
    the step index/distance when the destination switches to a stop
    destination.

    Returns (dest, destpointer, i_stopsignal, d_stopsignal).
    """
    dnext = dest_distance(pos, destqueue, destpointer)

    skip = znav[1] | znav[2]

    # arrival advance
    adv = dnext <= d_arrived_inter
    ptr = jnp.where(adv, jnp.minimum(destpointer + 1, nq - 1), destpointer)

    # jump-ahead check (compares against dnext computed BEFORE the advance)
    has_next = ptr < nq - 1
    nxt = jnp.clip(ptr + 1, 0, destqueue.shape[0] - 1)
    dn = queue_take(destqueue, nxt)[:2] - pos
    dnextnext = jnp.sqrt(dn[0] ** 2 + dn[1] ** 2)
    ptr = jnp.where(has_next & (dnextnext < dnext), ptr + 1, ptr)

    ptr = jnp.where(skip, destpointer, ptr)
    new_dest = jnp.where(skip, dest, queue_take(destqueue, ptr))

    # bookkeeping when the active destination becomes a stop destination
    became_stop = (~skip) & (dest[2] <= 0) & (new_dest[2] > 0)
    dd = dest[:2] - new_dest[:2]
    i_stopsignal = jnp.where(became_stop, i, i_stopsignal)
    d_stopsignal = jnp.where(
        became_stop, jnp.sqrt(dd[0] ** 2 + dd[1] ** 2), d_stopsignal)

    return new_dest, ptr, i_stopsignal, d_stopsignal


def update_nav_state(v, ddest, stop_flag, znav, znavparams, i, params):
    """One transition of the 3-state navigation FSM for one agent.

    Exact port of Vehicle.updateNavState (reference vehicle.py:354-457).
    States: z0 = cruising, z1 = stopping, z2 = arrived/stopped.

    Returns (vd, znav_next, znavparams_next):
      vd -- desired speed in the new navigation state.
    """
    k = BRAKE_SAFETY_K

    # braking-distance profile: gentle-first deceleration distances
    d0_new = (0.5 * (params.v_max_harddecel**2 - v**2)
              / pair_lo(params.a_desired_default))
    d1_new = 0.5 * (-params.v_max_harddecel**2) / pair_lo(params.a_max)
    d0 = jnp.where(znav[0], d0_new, znavparams[1])
    d1 = jnp.where(znav[0], d1_new, znavparams[2])

    x0 = stop_flag > 0
    x1 = ddest <= k * (d0 + d1)
    x2 = ddest <= params.d_arrived_stop
    x3 = v <= params.v_max_stop

    z0, z1, z2 = znav[0], znav[1], znav[2]

    n0 = (~x0) | (x0 & (~x1) & ((z0 & ~x2) | z1))
    n1 = x0 & ((z0 & (((~x2) & x1) | (x2 & ~x3)))
               | (z1 & x1 & ((~x2) | (~x3))))
    n2 = x0 & (((z0 | z1) & x2 & x3) | z2)
    znav_next = jnp.stack([n0, n1, n2])

    # latch braking profile on the cruising->stopping transition
    latch = z0 & n1
    znavparams_next = jnp.where(
        latch,
        jnp.stack([v, d0, d1, i.astype(v.dtype)]),
        znavparams,
    )

    # state-dependent desired speed. The z1 branch is only selected after the
    # braking profile was latched (so the divisors are nonzero there); guard
    # them anyway because jnp.where evaluates both branches.
    d0_safe = jnp.where(znavparams_next[1] != 0, znavparams_next[1], 1.0)
    d1_safe = jnp.where(znavparams_next[2] != 0, znavparams_next[2], 1.0)
    vd_z1_near = params.v_max_harddecel / d1_safe * ddest / k
    vd_z1_far = ((znavparams_next[0] - params.v_max_harddecel)
                 / d0_safe * (ddest - znavparams_next[2]) / k
                 + params.v_max_harddecel)
    vd_z1 = jnp.where(ddest < k * znavparams_next[2], vd_z1_near, vd_z1_far)
    vd = jnp.where(n0, params.v_desired_default,
                   jnp.where(n1, vd_z1, jnp.zeros_like(v)))

    return vd, znav_next, znavparams_next
