"""Kaths (2023) external model: the strategy-injection extension API.

The reference demonstrates extensibility by plugging a completely
different particle model through swappable force/dynamics functions
(reference external.py); these tests exercise the same model through the
engine hooks (dest_force/rep_force/rep_reduce/combine_forces/step)."""

import jax
import numpy as np

from cyclistsocialforce_tpu import Engine, make_state
from cyclistsocialforce_tpu import external
from cyclistsocialforce_tpu.params import BicycleParams, as_population
from cyclistsocialforce_tpu.state import set_destinations


def _engine(n, s0, dests, v_desired=4.0):
    st = make_state(np.asarray(s0, dtype=np.float64), dtype=np.float64)
    for a, (dx, dy) in enumerate(dests):
        st = set_destinations(st, a, dx, dy, reset=True)
    p = as_population(BicycleParams.create(
        v_desired_default=v_desired,
        rep_force=external.KATHS_VELOANISO_PARAMS,
        dest_force=external.KATHS_VELOANISO_PARAMS), n)
    eng = Engine.create(p, external)
    return eng, st


def test_dest_force_relaxes_speed_and_heading():
    eng, st = _engine(1, [[0.0, 0.0, 0.2, 2.0]], [((20.0,), (0.0,))])
    fv, ft, _ = external.dest_force_kaths(eng.params, st)
    p = external.KATHS_VELOANISO_PARAMS
    np.testing.assert_allclose(float(fv[0]), (4.0 - 2.0) / p["T_vb"])
    np.testing.assert_allclose(float(ft[0]),
                               (np.arctan(0.0) - 0.2) / p["T_tb"])


def test_single_agent_converges_to_desired_speed_and_bearing():
    eng, st = _engine(1, [[0.0, -3.0, 0.0, 2.0]], [((40.0,), (0.0,))])
    _, traj = jax.jit(lambda e, s: e.simulate(s, 800))(eng, st)
    traj = np.asarray(traj)
    assert np.all(np.isfinite(traj))
    assert abs(traj[-1, 0, 3] - 4.0) < 0.05          # v -> v_desired
    # heading converges toward the destination bearing
    dpsi = abs(traj[-1, 0, 2] - np.arctan(
        (0.0 - traj[-1, 0, 1]) / (40.0 - traj[-1, 0, 0])))
    assert dpsi < 0.05


def test_repulsion_turns_away_from_neighbor():
    """A rider with a close neighbor ahead-left turns right (negative Ft
    contribution) and slows relative to the unobstructed run."""
    s0_pair = [[0.0, 0.0, 0.0, 4.0], [4.0, 0.8, 0.0, 4.0]]
    eng, st = _engine(2, s0_pair,
                      [((40.0,), (0.0,)), ((44.0,), (0.8,))])
    _, traj = jax.jit(lambda e, s: e.simulate(s, 200))(eng, st)
    traj = np.asarray(traj)

    eng1, st1 = _engine(1, s0_pair[:1], [((40.0,), (0.0,))])
    _, solo = jax.jit(lambda e, s: e.simulate(s, 200))(eng1, st1)
    solo = np.asarray(solo)

    assert np.all(np.isfinite(traj))
    # follower deflects away (right = negative y) vs the solo run
    assert traj[-1, 0, 1] < solo[-1, 0, 1] - 1e-3
    # and is slower than without the leader
    assert traj[-1, 0, 3] < solo[-1, 0, 3]


def test_anisotropy_front_vs_back():
    """The distorted distance is SIGNED along the receiver's heading (as
    in the reference, external.py:106-118): the same lateral offset gives
    a larger distorted distance (weaker repulsion) ahead than behind."""
    p = BicycleParams.create(
        v_desired_default=4.0,
        rep_force=external.KATHS_VELOANISO_PARAMS,
        dest_force=external.KATHS_VELOANISO_PARAMS)
    import jax.numpy as jnp

    def fv_from(src_xy):
        src = (jnp.asarray([src_xy[0]]), jnp.asarray([src_xy[1]]),
               jnp.asarray([0.0]), jnp.asarray([4.0]))
        recv = (jnp.asarray([0.0]), jnp.asarray([0.0]),
                jnp.asarray([0.0]), jnp.asarray([4.0]))
        fv, ft = external.rep_tile_kaths(p, src, recv)
        return float(fv[0, 0])

    ahead = fv_from((3.0, 0.5))
    behind = fv_from((-3.0, 0.5))
    assert behind < ahead < 0   # signed d.e_v: larger distance ahead
