"""Block-sparse neighbor force path vs the dense O(N^2) oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclistsocialforce_tpu import Engine, make_state
from cyclistsocialforce_tpu.engine import NeighborConfig
from cyclistsocialforce_tpu.models import MODELS
from cyclistsocialforce_tpu.ops import neighbors as NB
from cyclistsocialforce_tpu.params import (InvPendulumBicycleParams,
                                           as_population)


def _population(n, side, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, side, n)
    s0[:, 1] = rng.uniform(0, side, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    st = make_state(s0, dtype=dtype)
    p = as_population(InvPendulumBicycleParams.create(), n)
    return st, p


def test_neighbor_table_structure():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 300, 512))
    y = jnp.asarray(rng.uniform(0, 300, 512))
    perm, nbr, valid, overflow = NB.build(x, y, cutoff=60.0, block=64,
                                          kb=8)
    assert perm.shape == (512,)
    assert sorted(np.asarray(perm)) == list(range(512))
    assert nbr.shape == (8, 8) and valid.shape == (8, 8)
    # every block appears in its own valid neighbor list (distance 0)
    nbr, valid = np.asarray(nbr), np.asarray(valid)
    for bi in range(8):
        assert bi in nbr[bi][valid[bi]], f"block {bi} missing itself"


@pytest.mark.parametrize("backend", ["xla", "interpret", "interpret_db"])
def test_neighbor_forces_match_dense_with_full_cutoff(backend):
    """With a cutoff covering the whole domain the culled path must equal
    the dense path exactly (same pairs, same math)."""
    n, side = 256, 120.0
    st, p = _population(n, side)
    dense = Engine.create(p, MODELS["twod"])
    frx_d, fry_d = dense.repulsive_sum(st)

    culled = Engine.create(p, MODELS["twod"], neighbors=NeighborConfig(
        cutoff=1e4, block=64, kb=4, backend=backend))
    frx_c, fry_c = culled.repulsive_sum_neighbors(st)
    tol = 1e-9 if backend == "xla" else 1e-4   # interpret paths run f32
    np.testing.assert_allclose(np.asarray(frx_c), np.asarray(frx_d),
                               atol=tol)
    np.testing.assert_allclose(np.asarray(fry_c), np.asarray(fry_d),
                               atol=tol)


@pytest.mark.parametrize("backend", ["xla", "interpret", "interpret_db"])
def test_neighbor_forces_cutoff_error_bounded(backend):
    """With the production 60 m cutoff the dropped tail stays below the
    1e-4 force tolerance."""
    n, side = 512, 400.0
    st, p = _population(n, side, seed=2)
    dense = Engine.create(p, MODELS["twod"])
    frx_d, fry_d = dense.repulsive_sum(st)
    culled = Engine.create(p, MODELS["twod"], neighbors=NeighborConfig(
        cutoff=60.0, block=64, kb=16, backend=backend))
    frx_c, fry_c = culled.repulsive_sum_neighbors(st)
    err = np.max(np.hypot(np.asarray(frx_c - frx_d),
                          np.asarray(fry_c - fry_d)))
    assert err < 1e-4, f"cutoff error {err}"


def test_neighbor_path_with_padding():
    """N not divisible by block: padded agents must not contribute."""
    n = 200   # pads to 256 with block 64
    st, p = _population(n, 100.0, seed=3)
    dense = Engine.create(p, MODELS["twod"])
    frx_d, fry_d = dense.repulsive_sum(st)
    culled = Engine.create(p, MODELS["twod"], neighbors=NeighborConfig(
        cutoff=1e4, block=64, kb=4, backend="xla"))
    frx_c, fry_c = culled.repulsive_sum_neighbors(st)
    np.testing.assert_allclose(np.asarray(frx_c), np.asarray(frx_d),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(fry_c), np.asarray(fry_d),
                               atol=1e-9)


def test_full_step_with_neighbors_under_scan():
    """The culled path composes with the full engine step under scan."""
    n = 128
    st, p = _population(n, 80.0, seed=4)
    # give everyone a destination across the field
    dests = np.asarray(st.s[:, :2]) + 50.0
    st = st.replace(
        dest=jnp.concatenate([jnp.asarray(dests),
                              jnp.zeros((n, 1))], axis=1),
        destqueue=st.destqueue.at[:, 0, :2].set(jnp.asarray(dests)))
    eng = Engine.create(p, MODELS["twod"], neighbors=NeighborConfig(
        cutoff=60.0, block=64, kb=9, backend="xla"))
    final, traj = jax.jit(lambda e, s: e.simulate(s, 20))(eng, st)
    assert np.all(np.isfinite(np.asarray(traj)))
