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


def test_kaths_culled_matches_dense():
    """The generic culled path (custom tile + custom rep_reduce through
    per-receiver-block tiles, xla backend) reproduces the dense Kaths
    forces with a domain-covering cutoff -- incl. the min-style Fv
    reduction, which per-tile partial sums could NOT compose."""
    from cyclistsocialforce_tpu.engine import NeighborConfig

    n = 96
    rng = np.random.default_rng(7)
    s0 = np.zeros((n, 4))
    s0[:, 0] = rng.uniform(0, 60, n)
    s0[:, 1] = rng.uniform(0, 60, n)
    s0[:, 2] = rng.uniform(-0.5, 0.5, n)
    s0[:, 3] = rng.uniform(2, 5, n)
    dests = [((float(s0[a, 0] + 50),), (float(s0[a, 1]),))
             for a in range(n)]
    eng, st = _engine(n, s0, dests)
    frv_d, frt_d = eng.repulsive_sum(st)

    eng_c = Engine.create(eng.params, external,
                          neighbors=NeighborConfig(cutoff=1e3, block=16,
                                                   kb=6, backend="xla"))
    assert eng_c.pair_family == "custom"
    frv_c, frt_c = eng_c.repulsive_sum_neighbors(st)
    np.testing.assert_allclose(np.asarray(frv_c), np.asarray(frv_d),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(frt_c), np.asarray(frt_d),
                               atol=1e-9)

    # end-to-end culled simulate follows the dense trajectory
    d_fin, _ = jax.jit(lambda e, s: e.simulate(s, 20, record=False))(
        eng, st)
    c_fin, _ = jax.jit(lambda e, s: e.simulate(s, 20, record=False))(
        eng_c, st)
    np.testing.assert_allclose(np.asarray(c_fin.s), np.asarray(d_fin.s),
                               atol=1e-8)


def test_kaths_culled_rejects_pallas_backend():
    from cyclistsocialforce_tpu.engine import NeighborConfig

    import pytest

    eng, st = _engine(2, [[0.0, 0.0, 0.0, 4.0], [4.0, 0.8, 0.0, 4.0]],
                      [((40.0,), (0.0,)), ((44.0,), (0.8,))])
    with pytest.raises(ValueError, match="custom force tiles"):
        Engine.create(eng.params, external,
                      neighbors=NeighborConfig(cutoff=100.0, block=16,
                                               kb=4, backend="pallas"))
