"""Multi-device agent-axis sharding: the shard_map step must reproduce the
single-device dense step bit-for-bit (same math, different layout), and the
chunked force path must match the dense path."""

import jax
import numpy as np
import pytest


def _setup(n, dtype=np.float64):
    from cyclistsocialforce_tpu import Engine, make_state
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BicycleParams
    from cyclistsocialforce_tpu.state import set_destinations

    rng = np.random.default_rng(0)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(-30, 30, n)
    s0[:, 1] = rng.uniform(-30, 30, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    st = make_state(s0, dtype=dtype)
    for a in range(n):
        st = set_destinations(st, a, (rng.uniform(-50, 50),),
                              (rng.uniform(-50, 50),))
    p = BicycleParams.create()
    eng = Engine.create(p, MODELS["bicycle2d"])
    return eng, st


def test_sharded_step_matches_dense():
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, shard_state, sharded_step_fn)

    n_dev = len(jax.devices())
    assert n_dev >= 2, "conftest should provide 8 virtual CPU devices"
    eng, st = _setup(4 * n_dev)

    ref, fx_ref, fy_ref = jax.jit(lambda e, s: e.step_with_forces(s))(
        eng, st)

    mesh = make_mesh()
    st_sh = shard_state(st, mesh)
    step = sharded_step_fn(eng, mesh, with_forces=True)
    out, fx, fy = step(st_sh)

    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fx_ref),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fy), np.asarray(fy_ref),
                               rtol=0, atol=1e-12)


def test_sharded_simulate_matches_dense():
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, shard_state, sharded_simulate_fn)

    n_dev = len(jax.devices())
    eng, st = _setup(2 * n_dev)
    n_steps = 50

    ref, traj_ref = jax.jit(
        lambda e, s: e.simulate(s, n_steps))(eng, st)

    mesh = make_mesh()
    run = sharded_simulate_fn(eng, mesh, n_steps, record=True)
    out, traj = run(shard_state(st, mesh))

    np.testing.assert_allclose(np.asarray(traj), np.asarray(traj_ref),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=0, atol=1e-12)


def test_ring_schedule_matches_allgather():
    """The ppermute ring halo exchange reproduces the all-gather schedule
    (and hence the single-device step) to float tolerance."""
    from cyclistsocialforce_tpu.parallel import (make_mesh, shard_state,
                                                 sharded_step_fn,
                                                 sharded_simulate_fn)

    n_dev = len(jax.devices())
    eng, st = _setup(4 * n_dev)

    ref, fx_ref, fy_ref = jax.jit(lambda e, s: e.step_with_forces(s))(
        eng, st)
    mesh = make_mesh()
    st_sh = shard_state(st, mesh)
    step = sharded_step_fn(eng, mesh, with_forces=True, comm="ring")
    out, fx, fy = step(st_sh)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fx_ref),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               atol=1e-12)

    # scanned variant
    refN, traj_ref = jax.jit(lambda e, s: e.simulate(s, 30))(eng, st)
    run = sharded_simulate_fn(eng, mesh, 30, record=True, comm="ring")
    outN, traj = run(st_sh)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(traj_ref),
                               atol=1e-12)


def test_chunked_forces_match_dense():
    from cyclistsocialforce_tpu import Engine

    eng, st = _setup(24)
    eng_c = eng.replace(rep_chunk=8)
    ref, fxr, fyr = jax.jit(lambda e, s: e.step_with_forces(s))(eng, st)
    out, fx, fy = jax.jit(lambda e, s: e.step_with_forces(s))(eng_c, st)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fxr), atol=1e-12)
    np.testing.assert_allclose(np.asarray(fy), np.asarray(fyr), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               atol=1e-12)


def test_chunk_must_divide():
    from cyclistsocialforce_tpu import Engine  # noqa: F401

    eng, st = _setup(10)
    eng_c = eng.replace(rep_chunk=3)
    with pytest.raises(ValueError):
        eng_c.step(st)
