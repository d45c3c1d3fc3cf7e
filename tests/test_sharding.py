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


def _setup_culled(n, kb=None, rebuild_every=4, block=16, block_src=0):
    """Population on a domain LARGER than the cutoff (so culling actually
    drops tiles), with a kb sized for zero overflow unless given."""
    from cyclistsocialforce_tpu import Engine, make_state
    from cyclistsocialforce_tpu.engine import NeighborConfig
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BicycleParams
    from cyclistsocialforce_tpu.state import set_destinations

    rng = np.random.default_rng(1)
    side = 0.5 * np.sqrt(n / 0.02)   # bench density
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(-side, side, n)
    s0[:, 1] = rng.uniform(-side, side, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    st = make_state(s0, dtype=np.float64)
    for a in range(n):
        st = set_destinations(st, a, (rng.uniform(-side, side),),
                              (rng.uniform(-side, side),))
    p = BicycleParams.create()
    nbr = NeighborConfig(cutoff=60.0, block=block,
                         kb=kb or (n // (block_src or block)),
                         backend="xla", rebuild_every=rebuild_every,
                         block_src=block_src)
    eng_dense = Engine.create(p, MODELS["bicycle2d"], rep_force="twod")
    eng_culled = Engine.create(p, MODELS["bicycle2d"], rep_force="twod",
                               neighbors=nbr)
    return eng_dense, eng_culled, st


@pytest.mark.slow
def test_sharded_culled_matches_dense():
    """The spatially-culled shard_map path (local cell sort + gathered
    block bboxes + neighbor-table tiles) matches the single-device dense
    run within the cutoff-truncation tolerance."""
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, shard_state, sharded_simulate_fn)

    n = 512
    eng_dense, eng_culled, st = _setup_culled(n)
    n_steps = 12

    ref, _ = jax.jit(lambda e, s: e.simulate(s, n_steps,
                                             record=False))(eng_dense, st)
    mesh = make_mesh()
    run = sharded_simulate_fn(eng_culled, mesh, n_steps, record=False)
    out, _ = run(shard_state(st, mesh))
    # cutoff truncation accumulates over the horizon; stay well inside the
    # 1e-3 m parity tolerance
    np.testing.assert_allclose(np.asarray(out.s[:, :2]),
                               np.asarray(ref.s[:, :2]), atol=2e-5)

    # one-step variant with forces
    from cyclistsocialforce_tpu.parallel import sharded_step_fn
    ref1, fxr, fyr = jax.jit(lambda e, s: e.step_with_forces(s))(
        eng_dense, st)
    step = sharded_step_fn(eng_culled, mesh, with_forces=True)
    out1, fx, fy = step(shard_state(st, mesh))
    # forces differ by at most the culled field's dropped-force bound
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fxr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out1.s), np.asarray(ref1.s),
                               atol=1e-6)


def test_sharded_culled_matches_single_device_culled():
    """Same culled configuration, 8 devices vs 1: identical block-sparse
    truncation semantics -> near-identical trajectories."""
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, shard_state, sharded_simulate_fn)

    n = 256
    _, eng_culled, st = _setup_culled(n)
    n_steps = 16

    ref, _ = jax.jit(lambda e, s: e.simulate(s, n_steps,
                                             record=False))(eng_culled, st)
    mesh = make_mesh()
    run = sharded_simulate_fn(eng_culled, mesh, n_steps, record=False)
    out, _ = run(shard_state(st, mesh))
    # different block partitions -> different fringe truncation; both are
    # within the cutoff bound of dense, so they agree to that tolerance
    np.testing.assert_allclose(np.asarray(out.s[:, :2]),
                               np.asarray(ref.s[:, :2]), atol=2e-5)


@pytest.mark.parametrize("comm", ["allgather", "ring"])
def test_sharded_culled_asymmetric_source_blocks(comm):
    """block_src < block under shard_map (both comm schedules): the
    gathered source-bbox table at finer granularity must stay within the
    culled-truncation tolerance of the dense single-device run."""
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, shard_state, sharded_simulate_fn)

    n = 512
    eng_dense, eng_culled, st = _setup_culled(n, block=16, block_src=8)
    n_steps = 12

    ref, _ = jax.jit(lambda e, s: e.simulate(s, n_steps,
                                             record=False))(eng_dense, st)
    mesh = make_mesh()
    run = sharded_simulate_fn(eng_culled, mesh, n_steps, record=False,
                              comm=comm)
    out, _ = run(shard_state(st, mesh))
    np.testing.assert_allclose(np.asarray(out.s[:, :2]),
                               np.asarray(ref.s[:, :2]), atol=2e-5)


def test_sharded_rejects_ring_rep_reduce_and_mixed_dense():
    from cyclistsocialforce_tpu.mixed import MixedEngine
    from cyclistsocialforce_tpu.params import (BalancingRiderParams,
                                               BicycleParams)
    from cyclistsocialforce_tpu.parallel import make_mesh, sharded_step_fn

    import jax.numpy as jnp

    eng, st = _setup(16)
    mesh = make_mesh()

    def custom_reduce(fx, fy, mask):
        return (jnp.max(jnp.where(mask, fx, 0.0), axis=0),
                jnp.max(jnp.where(mask, fy, 0.0), axis=0))

    eng_red = eng.replace(rep_reduce=custom_reduce)
    with pytest.raises(ValueError, match="rep_reduce"):
        sharded_step_fn(eng_red, mesh, comm="ring")

    # a sharded MixedEngine needs neighbor culling...
    me = MixedEngine.create([("bicycle2d", BicycleParams.create(), 16)])
    with pytest.raises(ValueError, match="neighbor culling"):
        sharded_step_fn(me, mesh)

    # ... and stochastic groups with a binding resample budget are
    # rejected (the compaction is population-order-dependent)
    from cyclistsocialforce_tpu.engine import NeighborConfig
    me2 = MixedEngine.create(
        [("balancingrider",
          BalancingRiderParams.create(stochastic_control_behavior=True,
                                      resample_budget=8, verbose=False),
          16)],
        neighbors=NeighborConfig(cutoff=1e4, block=16, kb=1,
                                 backend="xla"))
    with pytest.raises(ValueError, match="resample_budget"):
        sharded_step_fn(me2, mesh)


def test_sharded_honors_combine_forces():
    """A custom combine_forces hook (e.g. the Kaths external model's
    no-clamp combination) must shape the sharded physics exactly like the
    single-device engine."""
    import jax.numpy as jnp

    from cyclistsocialforce_tpu.parallel import (
        make_mesh, shard_state, sharded_step_fn)

    def no_clamp(frx, fry, fdx, fdy):
        return frx + fdx, fry + fdy

    eng, st = _setup(4 * len(jax.devices()))
    eng = eng.replace(combine_forces=no_clamp)

    ref, fxr, fyr = jax.jit(lambda e, s: e.step_with_forces(s))(eng, st)
    mesh = make_mesh()
    step = sharded_step_fn(eng, mesh, with_forces=True)
    out, fx, fy = step(shard_state(st, mesh))
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fxr), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               atol=1e-12)


@pytest.mark.slow
def test_sharded_culled_ring_matches_allgather():
    """The culled-ring schedule (ppermute of the [N/D, 16] sorted pack +
    per-hop table masking) evaluates exactly the same tiles as the
    all-gather schedule: forces agree to reassociation tolerance."""
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, shard_state, sharded_step_fn, sharded_simulate_fn)

    n = 512
    _, eng_culled, st = _setup_culled(n)
    mesh = make_mesh()
    st_sh = shard_state(st, mesh)

    step_ag = sharded_step_fn(eng_culled, mesh, with_forces=True,
                              comm="allgather")
    step_ring = sharded_step_fn(eng_culled, mesh, with_forces=True,
                                comm="ring")
    out_a, fxa, fya = step_ag(st_sh)
    out_r, fxr, fyr = step_ring(st_sh)
    np.testing.assert_allclose(np.asarray(fxr), np.asarray(fxa),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(fyr), np.asarray(fya),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(out_r.s), np.asarray(out_a.s),
                               atol=1e-10)

    run_a = sharded_simulate_fn(eng_culled, mesh, 12, record=False,
                                comm="allgather")
    run_r = sharded_simulate_fn(eng_culled, mesh, 12, record=False,
                                comm="ring")
    fin_a, _ = run_a(st_sh)
    fin_r, _ = run_r(st_sh)
    np.testing.assert_allclose(np.asarray(fin_r.s), np.asarray(fin_a.s),
                               atol=1e-9)


def test_sharded_sorted_resident_matches_gather_path():
    """The sorted-resident sharded simulate (record=False, N_local
    divisible by block) matches the per-step gather path bit-for-bit
    and restores the original row order."""
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, shard_state, sharded_simulate_fn)

    n_dev = len(jax.devices())
    n = 16 * 16 * n_dev // 16   # local shard divisible by block=16
    _, eng_culled, st = _setup_culled(128 * n_dev // 8 * 8)
    n = st.n
    assert (n // n_dev) % 16 == 0
    mesh = make_mesh()
    st_sh = shard_state(st, mesh)

    # gather path: force record=True (disables sorted residency)
    run_rec = sharded_simulate_fn(eng_culled, mesh, 12, record=True)
    fin_rec, _ = run_rec(st_sh)
    # sorted-resident path: record=False
    run_sr = sharded_simulate_fn(eng_culled, mesh, 12, record=False)
    fin_sr, _ = run_sr(st_sh)
    # the two paths feed the cell sort arrays in different row orders;
    # stable-argsort TIES (agents sharing a cell) can therefore order
    # the within-cell source sum differently once any agent changes
    # cells between rebuild chunks -- a pure float-reassociation
    # difference, bounded far below physics tolerance
    np.testing.assert_allclose(np.asarray(fin_sr.s),
                               np.asarray(fin_rec.s), atol=1e-6)


@pytest.mark.slow
def test_sharded_spline_family_matches_single_device():
    """The spline destination force (twod) and the invpendulum dynamics
    (zoh_lut path) are purely local stages -- sharded runs must match
    the single-device run bit-level (allgather schedule)."""
    import jax.numpy as jnp

    from cyclistsocialforce_tpu import Engine, make_state
    from cyclistsocialforce_tpu.models import MODELS, prepare
    from cyclistsocialforce_tpu.params import (InvPendulumBicycleParams,
                                               as_population)
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, shard_state, sharded_simulate_fn)

    n_dev = len(jax.devices())
    n = 4 * n_dev
    rng = np.random.default_rng(9)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, 60, n)
    s0[:, 1] = rng.uniform(0, 60, n)
    s0[:, 2] = rng.uniform(-0.3, 0.3, n)
    s0[:, 3] = rng.uniform(4, 6, n)
    st = make_state(s0, dtype=np.float64, hist_len=128)
    dst = np.c_[s0[:, 0] + 80, s0[:, 1], np.zeros(n)]
    st = st.replace(dest=jnp.asarray(dst),
                    destqueue=st.destqueue.at[:, 0, :].set(
                        jnp.asarray(dst)))

    # params stay population-shared: engine params ride the shard_map
    # closure (replicated), so per-agent arrays would not shard
    del as_population
    for model_name, p in (
            ("twod", InvPendulumBicycleParams.create()),
            ("invpendulum", InvPendulumBicycleParams.create(
                zoh_lut=1024))):
        pp = p
        m = MODELS[model_name]
        sti = prepare(m, pp, st)
        eng = Engine.create(pp, m)
        ref, _ = jax.jit(lambda e, s: e.simulate(s, 30, record=False))(
            eng, sti)
        mesh = make_mesh()
        run = sharded_simulate_fn(eng, mesh, 30, record=False)
        out, _ = run(shard_state(sti, mesh))
        np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                                   atol=1e-12, err_msg=model_name)


def _setup_halo(n, cutoff=20.0, block=16, rebuild_every=4, block_src=0,
                kb=None, hist_len=16):
    """Spread-out culled population for the halo schedule: the domain
    spans many cell columns so each device strip only needs a few
    boundary source blocks."""
    from cyclistsocialforce_tpu import Engine, make_state
    from cyclistsocialforce_tpu.engine import NeighborConfig
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BicycleParams
    from cyclistsocialforce_tpu.state import set_destinations

    rng = np.random.default_rng(3)
    side = 0.5 * np.sqrt(n / 0.02)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(-side, side, n)
    s0[:, 1] = rng.uniform(-side, side, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    st = make_state(s0, dtype=np.float64, hist_len=hist_len)
    for a in range(n):
        st = set_destinations(st, a, (rng.uniform(-side, side),),
                              (rng.uniform(-side, side),))
    nbr = NeighborConfig(cutoff=cutoff, block=block,
                         kb=kb or n // (block_src or block),
                         backend="xla",
                         rebuild_every=rebuild_every, block_src=block_src)
    eng = Engine.create(BicycleParams.create(), MODELS["bicycle2d"],
                        rep_force="twod", neighbors=nbr)
    return eng, st


def _setup_flagship(n, stochastic=False, budget=0, thresh=None,
                    disturb=False, seed=11):
    """Whipple-stable balancingrider population: headings roughly toward
    the destinations, speeds in the stable band (verify SKILL.md)."""
    import jax.numpy as jnp

    from cyclistsocialforce_tpu import make_state
    from cyclistsocialforce_tpu.models import MODELS, prepare
    from cyclistsocialforce_tpu.params import BalancingRiderParams

    rng = np.random.default_rng(seed)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, 80, n)
    s0[:, 1] = rng.uniform(0, 80, n)
    s0[:, 2] = rng.uniform(-0.2, 0.2, n)
    s0[:, 3] = rng.uniform(4, 6, n)
    st = make_state(s0, dtype=np.float64, hist_len=8)
    dst = np.c_[s0[:, 0] + 100, s0[:, 1] + rng.uniform(-5, 5, n),
                np.zeros(n)]
    st = st.replace(dest=jnp.asarray(dst),
                    destqueue=st.destqueue.at[:, 0, :].set(
                        jnp.asarray(dst)))
    kw = {}
    if thresh is not None:
        kw["controlparam_resampling_speedthresh"] = thresh
    if disturb:
        kw.update(p_dist_roll=0.05, T_dist_roll=20.0,
                  p_dist_steer=0.05, T_dist_steer=5.0)
    p = BalancingRiderParams.create(
        stochastic_control_behavior=stochastic, resample_budget=budget,
        verbose=False, **kw)
    m = MODELS["balancingrider"]
    st = prepare(m, p, st)
    return p, m, st


def _flagship_engine(p, m, culled=False, n=None):
    from cyclistsocialforce_tpu import Engine
    from cyclistsocialforce_tpu.engine import NeighborConfig

    nbr = None
    if culled:
        nbr = NeighborConfig(cutoff=20.0, block=16, kb=n // 16,
                             backend="xla", rebuild_every=4)
    return Engine.create(p, m, neighbors=nbr)


def test_sharded_flagship_exact_matches_single_device():
    """The deterministic flagship (balancingrider, exact per-agent
    Ackermann placement) is purely local dynamics -- the allgather
    schedule must match the single-device run bit-level.
    VERDICT r3 #3: the reference flagship (dynamics.py:674-706) is
    exactly the model a multi-chip user would scale."""
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, shard_state, sharded_simulate_fn)

    n_dev = len(jax.devices())
    p, m, st = _setup_flagship(4 * n_dev)
    eng = _flagship_engine(p, m)
    ref, _ = jax.jit(lambda e, s: e.simulate(s, 30, record=False))(eng, st)
    mesh = make_mesh()
    run = sharded_simulate_fn(eng, mesh, 30, record=False)
    out, _ = run(shard_state(st, mesh))
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=0, atol=1e-12)


@pytest.mark.slow
def test_sharded_flagship_stochastic_dense_matches_single_device():
    """Stochastic flagship, dense resampling path (no budget), low
    hysteresis threshold so resampling + torque disturbances fire
    heavily: per-agent uid-keyed streams (state.agent_streams) make the
    sharded run BIT-EXACT vs single-device -- every draw is a pure
    function of (master key, t_glob, uid), independent of layout."""
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, shard_state, sharded_simulate_fn)

    n_dev = len(jax.devices())
    p, m, st = _setup_flagship(4 * n_dev, stochastic=True, thresh=0.05,
                               disturb=True)
    eng = _flagship_engine(p, m)
    ref, _ = jax.jit(lambda e, s: e.simulate(s, 25, record=False))(eng, st)
    # sanity: the stochastic machinery actually fired (features moved)
    assert not np.allclose(np.asarray(ref.dyn_gains[:, 5:10]),
                           np.asarray(st.dyn_gains[:, 5:10]))
    mesh = make_mesh()
    run = sharded_simulate_fn(eng, mesh, 25, record=False)
    out, _ = run(shard_state(st, mesh))
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.dyn_gains),
                               np.asarray(ref.dyn_gains),
                               rtol=0, atol=1e-12)


@pytest.mark.slow
def test_sharded_flagship_budget_compaction_matches_single_device():
    """Stochastic flagship WITH resample_budget: the compacted path
    (jnp.nonzero fixed-size scatter) runs per shard. With a non-binding
    budget the deferral semantics never trigger, so uid-keyed draws make
    sharded == single-device bit-exact even though the compaction
    indices differ per layout."""
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, shard_state, sharded_simulate_fn)

    n_dev = len(jax.devices())
    n = 16 * n_dev
    # budget < n_local(16) so BOTH traces take the compacted branch;
    # default hysteresis threshold keeps the per-step needy count far
    # below it
    p, m, st = _setup_flagship(n, stochastic=True, budget=8)
    eng = _flagship_engine(p, m)
    ref, _ = jax.jit(lambda e, s: e.simulate(s, 30, record=False))(eng, st)
    mesh = make_mesh()
    run = sharded_simulate_fn(eng, mesh, 30, record=False)
    out, _ = run(shard_state(st, mesh))
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=0, atol=1e-12)


@pytest.mark.slow
def test_sharded_flagship_resample_cadence_matches_single_device():
    """resample_every (the t_glob-gated resampling cadence) must stay
    bit-exact under sharding: t_glob is replicated, so every shard fires
    the cond on the same steps."""
    from cyclistsocialforce_tpu.models import MODELS, prepare
    from cyclistsocialforce_tpu.params import BalancingRiderParams
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, shard_state, sharded_simulate_fn)

    n_dev = len(jax.devices())
    p, m, st = _setup_flagship(16 * n_dev, stochastic=True, budget=8)
    p = BalancingRiderParams.create(
        stochastic_control_behavior=True, resample_budget=8,
        resample_every=3, verbose=False)
    st = prepare(MODELS["balancingrider"], p, st)
    eng = _flagship_engine(p, m)
    ref, _ = jax.jit(lambda e, s: e.simulate(s, 30, record=False))(eng, st)
    mesh = make_mesh()
    run = sharded_simulate_fn(eng, mesh, 30, record=False)
    out, _ = run(shard_state(st, mesh))
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=0, atol=1e-12)


@pytest.mark.slow
def test_sharded_flagship_budget_exceeding_local_shard():
    """Regression (round-4 review): resample_budget BETWEEN the local
    shard size and the global N must not change the code path -- the
    budget is clamped per trace (min(budget, n)), never silently
    switched to the dense (cadence-ignoring) branch. Pre-fix, each
    shard took the dense ungated path while the single-device run took
    the compacted lax.cond-gated one: divergent physics."""
    from cyclistsocialforce_tpu.models import MODELS, prepare
    from cyclistsocialforce_tpu.params import BalancingRiderParams
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, shard_state, sharded_simulate_fn)

    n_dev = len(jax.devices())
    n = 16 * n_dev
    p, m, st = _setup_flagship(n)
    p = BalancingRiderParams.create(
        stochastic_control_behavior=True,
        resample_budget=16 * n_dev // 2,   # > n_local (16), < n
        resample_every=3, verbose=False)
    st = prepare(MODELS["balancingrider"], p, st)
    eng = _flagship_engine(p, m)
    ref, _ = jax.jit(lambda e, s: e.simulate(s, 30, record=False))(eng, st)
    mesh = make_mesh()
    run = sharded_simulate_fn(eng, mesh, 30, record=False)
    out, _ = run(shard_state(st, mesh))
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=0, atol=1e-12)


@pytest.mark.slow
def test_sharded_flagship_halo_stochastic_matches_single_device():
    """Stochastic flagship through the halo-exchange culled schedule:
    the reshard permutes rows across devices every rebuild chunk -- the
    uid field rides the packed reshard, so the streams (and hence the
    whole trajectory) stay bit-exact vs the single-device culled run."""
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, required_halo, shard_state, sharded_simulate_fn)

    n_dev = len(jax.devices())
    n = 512 * n_dev   # strips must span several cell columns so the
    #                   halo window is a strict subset of a strip
    p, m, st = _setup_flagship(n, stochastic=True, thresh=0.05,
                               disturb=True, seed=13)
    # spread the population so strips only need a narrow halo
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    side = 0.5 * np.sqrt(n / 0.02)
    s = np.array(st.s)
    s[:, 0] = rng.uniform(-side, side, n)
    s[:, 1] = rng.uniform(-side, side, n)
    dst = np.c_[s[:, 0] + 100, s[:, 1], np.zeros(n)]
    st = st.replace(s=jnp.asarray(s),
                    dest=jnp.asarray(dst),
                    destqueue=st.destqueue.at[:, 0, :].set(
                        jnp.asarray(dst)),
                    pos_hist=jnp.broadcast_to(
                        jnp.asarray(s[:, None, :2]),
                        st.pos_hist.shape))
    from cyclistsocialforce_tpu.models import prepare
    st = prepare(m, p, st)
    eng = _flagship_engine(p, m, culled=True, n=n)

    n_steps = 10
    h = required_halo(eng, st, n_dev) + 1
    ref, _ = jax.jit(lambda e, s: e.simulate(s, n_steps,
                                             record=False))(eng, st)
    mesh = make_mesh()
    run = sharded_simulate_fn(eng, mesh, n_steps, record=False,
                              comm="halo", halo=h)
    out, ovf = run(shard_state(st, mesh))
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=0, atol=1e-12)


@pytest.mark.slow
def test_sharded_culled_halo_matches_single_device():
    """comm='halo' (globally sorted strips + boundary-block exchange)
    reproduces the single-device culled run exactly: same global sort,
    same table entries in the same order, same tile sums -- only the
    communication pattern differs."""
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, required_halo, shard_state, sharded_simulate_fn)

    n_dev = len(jax.devices())
    n = 1024 * n_dev     # strips must span several cell columns: the
    #                      halo is ~2 columns' worth of source blocks
    eng, st = _setup_halo(n, kb=64)
    n_steps = 10    # 2 chunks of 4 + remainder 2

    h = required_halo(eng, st, n_dev) + 1
    assert h * eng.neighbors.block_src <= n // n_dev, (
        "test geometry should need only a narrow halo")

    ref, _ = jax.jit(lambda e, s: e.simulate(s, n_steps,
                                             record=False))(eng, st)
    mesh = make_mesh()
    run = sharded_simulate_fn(eng, mesh, n_steps, record=False,
                              comm="halo", halo=h)
    out, ovf = run(shard_state(st, mesh))
    assert not bool(ovf), "halo window overflowed"
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=0, atol=1e-12)


@pytest.mark.slow
def test_sharded_culled_halo_asymmetric_blocks():
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, required_halo, shard_state, sharded_simulate_fn)

    n_dev = len(jax.devices())
    n = 1024 * n_dev
    eng, st = _setup_halo(n, block=16, block_src=8, kb=128)
    h = required_halo(eng, st, n_dev) + 1
    ref, _ = jax.jit(lambda e, s: e.simulate(s, 8, record=False))(eng, st)
    mesh = make_mesh()
    run = sharded_simulate_fn(eng, mesh, 8, record=False, comm="halo",
                              halo=h)
    out, ovf = run(shard_state(st, mesh))
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=0, atol=1e-12)


@pytest.mark.slow
def test_sharded_halo_overflow_flag():
    """An undersized halo window must raise the overflow flag rather
    than silently dropping interactions."""
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, required_halo, shard_state, sharded_simulate_fn)

    n_dev = len(jax.devices())
    n = 256 * n_dev
    eng, st = _setup_halo(n, cutoff=60.0)   # wide cutoff: needs a big halo
    assert required_halo(eng, st, n_dev) > 1
    mesh = make_mesh()
    run = sharded_simulate_fn(eng, mesh, 4, record=False, comm="halo",
                              halo=1)
    _, ovf = run(shard_state(st, mesh))
    assert bool(ovf)


def test_sharded_halo_rejections():
    import pytest

    from cyclistsocialforce_tpu.parallel import (
        make_mesh, sharded_simulate_fn)

    eng_dense, _, st = _setup_culled(16 * len(jax.devices()))
    mesh = make_mesh()
    with pytest.raises(ValueError, match="culled"):
        sharded_simulate_fn(eng_dense, mesh, 4, comm="halo")
    _, eng_culled, _ = _setup_culled(16 * len(jax.devices()))
    with pytest.raises(ValueError, match="record"):
        sharded_simulate_fn(eng_culled, mesh, 4, record=True, comm="halo")


@pytest.mark.slow
def test_sharded_halo_nonsorted_resident_matches_single_device():
    """Engines with sorted_resident=False take Engine.simulate's NON-SR
    chunk path, which re-sorts from ORIGINAL row order each chunk --
    argsort tie-breaks differ from the SR path's sorted-order input, so
    the halo schedule computes its global sort in original-id space for
    these engines. Bit-exact match required."""
    from cyclistsocialforce_tpu import Engine
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, required_halo, shard_state, sharded_simulate_fn)

    n_dev = len(jax.devices())
    n = 1024 * n_dev
    eng, st = _setup_halo(n, kb=64)
    eng = eng.replace(sorted_resident=False)
    n_steps = 10    # 2 chunks of 4 + remainder 2

    h = required_halo(eng, st, n_dev) + 1
    ref, _ = jax.jit(lambda e, s: e.simulate(s, n_steps,
                                             record=False))(eng, st)
    mesh = make_mesh()
    run = sharded_simulate_fn(eng, mesh, n_steps, record=False,
                              comm="halo", halo=h)
    out, ovf = run(shard_state(st, mesh))
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=0, atol=1e-12)


def test_sharded_halo_step_fn_and_rep_reduce_rejected():
    import pytest

    from cyclistsocialforce_tpu.parallel import (
        make_mesh, sharded_simulate_fn, sharded_step_fn)

    _, eng_culled, st = _setup_culled(16 * len(jax.devices()))
    mesh = make_mesh()
    # halo is simulate-only (no chunk to amortize the reshard over)
    with pytest.raises(ValueError, match="simulate"):
        sharded_step_fn(eng_culled, mesh, comm="halo")
    # custom receiver-side reductions would be silently wrong physics
    # under the sum-only pair tiles: same loud rejection as other comms
    eng_rr = eng_culled.replace(rep_reduce=lambda acc, new: acc + new)
    with pytest.raises(ValueError, match="rep_reduce"):
        sharded_simulate_fn(eng_rr, mesh, 4, record=False, comm="halo")


@pytest.mark.slow
def test_sharded_halo_spline_family_matches_single_device():
    """The halo reshard moves the WHOLE packed state across chips --
    incl. the spline family's pos_hist ring buffer and global step
    clock. A culled twod engine under comm='halo' must stay bit-exact
    vs its single-device run."""
    import jax.numpy as jnp

    from cyclistsocialforce_tpu import Engine, make_state
    from cyclistsocialforce_tpu.engine import NeighborConfig
    from cyclistsocialforce_tpu.models import MODELS, prepare
    from cyclistsocialforce_tpu.params import InvPendulumBicycleParams
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, required_halo, shard_state, sharded_simulate_fn)

    n_dev = len(jax.devices())
    n = 512 * n_dev
    rng = np.random.default_rng(7)
    side = 0.5 * np.sqrt(n / 0.02)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(-side, side, n)
    s0[:, 1] = rng.uniform(-side, side, n)
    s0[:, 2] = rng.uniform(-0.3, 0.3, n)
    s0[:, 3] = rng.uniform(4, 6, n)
    st = make_state(s0, dtype=np.float64, hist_len=128)
    dst = np.c_[s0[:, 0] + 80, s0[:, 1], np.zeros(n)]
    st = st.replace(dest=jnp.asarray(dst),
                    destqueue=st.destqueue.at[:, 0, :].set(
                        jnp.asarray(dst)))
    p = InvPendulumBicycleParams.create()
    m = MODELS["twod"]
    st = prepare(m, p, st)
    eng = Engine.create(p, m, neighbors=NeighborConfig(
        cutoff=20.0, block=16, kb=n // 16, backend="xla",
        rebuild_every=4))

    n_steps = 10    # 2 chunks of 4 + remainder 2
    h = required_halo(eng, st, n_dev) + 1
    ref, _ = jax.jit(lambda e, s: e.simulate(s, n_steps,
                                             record=False))(eng, st)
    mesh = make_mesh()
    run = sharded_simulate_fn(eng, mesh, n_steps, record=False,
                              comm="halo", halo=h)
    out, ovf = run(shard_state(st, mesh))
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=0, atol=1e-12)


# --------------------------------------------------------------------------
# heterogeneous crowds under shard_map (VERDICT r4 item 2): scripted
# agents and MixedEngine populations must bit-match their single-device
# runs through the sharded schedules. Group membership and script replay
# ride the persistent uid.
# --------------------------------------------------------------------------


def _setup_scripted(n=16, t_script=30):
    import jax.numpy as jnp

    from cyclistsocialforce_tpu import Engine, make_state
    from cyclistsocialforce_tpu.engine import ScriptedTraj
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BicycleParams
    from cyclistsocialforce_tpu.state import set_destinations

    rng = np.random.default_rng(0)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(-30, 30, n)
    s0[:, 1] = rng.uniform(-30, 30, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    st = make_state(s0, dtype=np.float64)
    for a in range(n):
        st = set_destinations(st, a, (rng.uniform(-50, 50),),
                              (rng.uniform(-50, 50),))
    ts = 0.01
    tr = {}
    for a in (3, 9):   # straight-line scripts at 8 m/s on two shards
        t = np.zeros((t_script, 4))
        t[:, 0] = s0[a, 0] + 8 * ts * np.arange(1, t_script + 1)
        t[:, 1] = s0[a, 1]
        t[:, 3] = 8.0
        tr[a] = t
    sc = ScriptedTraj.create(n, tr, dtype=jnp.float64)
    eng = Engine.create(BicycleParams.create(), MODELS["bicycle2d"],
                        scripted=sc)
    return eng, st


@pytest.mark.parametrize("comm", ["allgather", "ring"])
def test_sharded_scripted_matches_single_device(comm):
    """Scripted agents replay uid-indexed tables (replicated program
    constants) on whatever shard their row lives on; the horizon runs
    PAST the script end to exercise the hold branch."""
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, shard_state, sharded_simulate_fn)

    eng, st = _setup_scripted()
    n_steps = 40     # script length 30: replay + hold
    ref, _ = jax.jit(lambda e, s: e.simulate(s, n_steps,
                                             record=False))(eng, st)
    mesh = make_mesh()
    run = sharded_simulate_fn(eng, mesh, n_steps, record=False, comm=comm)
    out, _ = run(shard_state(st, mesh))
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=0, atol=1e-12)


def _setup_mixed_sharded(n, side, cutoff, kb, seed=0, hist_len=16,
                         rebuild_every=3, scripted_car=False):
    import jax.numpy as jnp

    from cyclistsocialforce_tpu import make_state
    from cyclistsocialforce_tpu.engine import NeighborConfig, ScriptedTraj
    from cyclistsocialforce_tpu.mixed import MixedEngine, prepare_groups
    from cyclistsocialforce_tpu.params import (BicycleParams,
                                               InvPendulumBicycleParams,
                                               as_population)

    n_legacy = n // 4
    n_twod = n - n_legacy
    rng = np.random.default_rng(seed)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(-side, side, n)
    s0[:, 1] = rng.uniform(-side, side, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    st = make_state(s0, dtype=np.float64, hist_len=hist_len)
    dst = np.c_[rng.uniform(-side, side, n), rng.uniform(-side, side, n)]
    st = st.replace(dest=st.dest.at[:, :2].set(jnp.asarray(dst)),
                    destqueue=st.destqueue.at[:, 0, :2].set(
                        jnp.asarray(dst)))
    # per-agent (as_population) group params: exercises the uid-gathered
    # group-param path of the sharded masked stages
    pa = as_population(BicycleParams.create(), n_legacy)
    pb = as_population(InvPendulumBicycleParams.create(), n_twod)
    groups = [("bicycle2d", pa, n_legacy), ("twod", pb, n_twod)]
    scripted = None
    if scripted_car:
        # agent 1 (a legacy-group row): scripted straight drive at 8 m/s
        t = np.zeros((40, 4))
        t[:, 0] = s0[1, 0] + 8 * 0.01 * np.arange(1, 41)
        t[:, 1] = s0[1, 1]
        t[:, 3] = 8.0
        scripted = ScriptedTraj.create(n, {1: t}, dtype=jnp.float64)
    nbr = NeighborConfig(cutoff=cutoff, block=16, kb=kb, backend="xla",
                         rebuild_every=rebuild_every)
    meng = MixedEngine.create(groups, neighbors=nbr, scripted=scripted)
    st = prepare_groups(meng, st)
    return meng, st


@pytest.mark.parametrize("comm,scripted_car",
                         [("allgather", False), ("allgather", True),
                          ("ring", False)])
def test_sharded_mixed_culled_matches_single_device(comm, scripted_car):
    """Mixed-family culled crowds (legacy + twod groups, per-agent
    as_population params, optional scripted car) through the sharded
    allgather/ring schedules bit-match the single-device culled
    MixedEngine. The domain-covering cutoff removes block-partition
    fringe effects, so only float summation order remains (~1e-13)."""
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, shard_state, sharded_simulate_fn)

    meng, st = _setup_mixed_sharded(256, side=60.0, cutoff=1e4, kb=24,
                                    scripted_car=scripted_car)
    n_steps = 7     # 2 chunks of 3 + remainder 1
    ref, _ = jax.jit(lambda s: meng.simulate(s, n_steps,
                                             record=False))(st)
    mesh = make_mesh()
    run = sharded_simulate_fn(meng, mesh, n_steps, record=False,
                              comm=comm)
    out, _ = run(shard_state(st, mesh))
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=0, atol=1e-12)
    if scripted_car:
        # the scripted row replayed its script exactly on its shard
        s1 = np.asarray(out.s)[1]
        ref1 = np.asarray(ref.s)[1]
        np.testing.assert_allclose(s1, ref1, rtol=0, atol=0)


@pytest.mark.slow
def test_sharded_mixed_halo_matches_single_device():
    """The halo-exchange schedule on a heterogeneous crowd: globally
    cell-sorted strips + boundary-block ppermutes reproduce the
    single-device culled MixedEngine exactly (group masks and packed
    family columns ride the uid through the global reshard)."""
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, required_halo, shard_state, sharded_simulate_fn)

    n_dev = len(jax.devices())
    n = 1024 * n_dev
    side = 0.5 * np.sqrt(n / 0.02)
    meng, st = _setup_mixed_sharded(n, side=side, cutoff=30.0, kb=64,
                                    seed=3, rebuild_every=4)
    h = required_halo(meng, st, n_dev) + 1
    n_steps = 10    # 2 chunks of 4 + remainder 2
    ref, _ = jax.jit(lambda s: meng.simulate(s, n_steps,
                                             record=False))(st)
    mesh = make_mesh()
    run = sharded_simulate_fn(meng, mesh, n_steps, record=False,
                              comm="halo", halo=h)
    out, ovf = run(shard_state(st, mesh))
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=0, atol=1e-12)


def test_sharded_scripted_culled_sorted_resident():
    """Scripted agents through the CULLED sharded schedule (which takes
    the sharded sorted-resident fast path now that replay tables are
    uid-indexed): bit-matches the single-device culled run."""
    import jax.numpy as jnp

    from cyclistsocialforce_tpu import Engine, make_state
    from cyclistsocialforce_tpu.engine import NeighborConfig, ScriptedTraj
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BicycleParams
    from cyclistsocialforce_tpu.state import set_destinations
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, shard_state, sharded_simulate_fn)

    n = 128
    rng = np.random.default_rng(3)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(-40, 40, n)
    s0[:, 1] = rng.uniform(-40, 40, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    st = make_state(s0, dtype=np.float64)
    for a in range(n):
        st = set_destinations(st, a, (rng.uniform(-50, 50),),
                              (rng.uniform(-50, 50),))
    tr = {}
    for a in (5, 100):
        t = np.zeros((25, 4))
        t[:, 0] = s0[a, 0] + 0.08 * np.arange(1, 26)
        t[:, 1] = s0[a, 1]
        t[:, 3] = 8.0
        tr[a] = t
    sc = ScriptedTraj.create(n, tr, dtype=jnp.float64)
    nbr = NeighborConfig(cutoff=1e3, block=16, kb=8, backend="xla",
                         rebuild_every=4)
    eng = Engine.create(BicycleParams.create(), MODELS["bicycle2d"],
                        scripted=sc, neighbors=nbr)
    ref, _ = jax.jit(lambda e, s: e.simulate(s, 30, record=False))(eng, st)
    mesh = make_mesh()
    run = sharded_simulate_fn(eng, mesh, 30, record=False)
    out, _ = run(shard_state(st, mesh))
    np.testing.assert_allclose(np.asarray(out.s), np.asarray(ref.s),
                               rtol=0, atol=1e-12)
