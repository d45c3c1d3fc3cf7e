"""Amortized neighbor rebuilds: stale-table-with-skin vs per-step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclistsocialforce_tpu import Engine, make_state
from cyclistsocialforce_tpu.engine import NeighborConfig
from cyclistsocialforce_tpu.models import MODELS
from cyclistsocialforce_tpu.params import (InvPendulumBicycleParams,
                                           as_population)


def _setup(n=192, side=150.0, seed=5):
    rng = np.random.default_rng(seed)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, side, n)
    s0[:, 1] = rng.uniform(0, side, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    st = make_state(s0, dtype=np.float64)
    dests = s0[:, :2] + rng.uniform(-40, 40, (n, 2))
    st = st.replace(
        dest=jnp.concatenate([jnp.asarray(dests), jnp.zeros((n, 1))],
                             axis=1),
        destqueue=st.destqueue.at[:, 0, :2].set(jnp.asarray(dests)))
    return st, as_population(InvPendulumBicycleParams.create(), n)


def test_amortized_rebuild_matches_per_step():
    """rebuild_every=10 with the default skin stays within the cutoff
    error budget of the per-step rebuild over 40 steps."""
    st, p = _setup()
    every = Engine.create(p, MODELS["twod"], neighbors=NeighborConfig(
        cutoff=60.0, block=64, kb=12, backend="xla", rebuild_every=1))
    amort = Engine.create(p, MODELS["twod"], neighbors=NeighborConfig(
        cutoff=60.0, block=64, kb=12, backend="xla", rebuild_every=10))

    _, t1 = jax.jit(lambda e, s: e.simulate(s, 40))(every, st)
    _, t2 = jax.jit(lambda e, s: e.simulate(s, 40))(amort, st)
    t1, t2 = np.asarray(t1), np.asarray(t2)
    assert t1.shape == t2.shape == (40, 192, 8)
    # the skin-extended stale table is a SUPERSET of the fresh table's
    # pairs inside the cutoff, so trajectories agree to the cutoff budget
    err = np.max(np.hypot(t2[..., 0] - t1[..., 0], t2[..., 1] - t1[..., 1]))
    assert err < 1e-3, f"amortized rebuild drifted {err} m"


def test_rebuild_remainder_steps():
    """n_steps not divisible by rebuild_every: remainder handled."""
    st, p = _setup(n=64)
    eng = Engine.create(p, MODELS["twod"], neighbors=NeighborConfig(
        cutoff=60.0, block=64, kb=4, backend="xla", rebuild_every=8))
    _, traj = jax.jit(lambda e, s: e.simulate(s, 21))(eng, st)
    assert np.asarray(traj).shape == (21, 64, 8)
    assert np.all(np.isfinite(np.asarray(traj)))


@pytest.mark.slow
def test_flat_rebuild_mode_matches_chunked():
    """NeighborConfig(rebuild_mode='flat') -- one flat scan with a
    cond-gated rebuild and the cache carried between steps -- is
    physics-identical to the nested chunked form (same rebuild steps,
    same stale tables in between), with and without recording, incl.
    a non-divisible remainder and the sorted-resident fast path."""
    from cyclistsocialforce_tpu.engine import _flat_sorted_resident_ok

    st, p = _setup(n=192)
    kw = dict(cutoff=60.0, block=64, kb=12, backend="xla",
              rebuild_every=10)
    # sorted_resident=True forced: MODELS['twod'] defaults it off, but
    # this test must cover the flat path's cond-gated permute branch
    chunked = Engine.create(p, MODELS["twod"], sorted_resident=True,
                            neighbors=NeighborConfig(**kw))
    flat = Engine.create(p, MODELS["twod"], sorted_resident=True,
                         neighbors=NeighborConfig(
                             rebuild_mode="flat", **kw))

    # recorded (gather path both): trajectories must agree exactly
    _, t1 = jax.jit(lambda e, s: e.simulate(s, 43))(chunked, st)
    _, t2 = jax.jit(lambda e, s: e.simulate(s, 43))(flat, st)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1),
                               atol=1e-12)

    # unrecorded: BOTH forms take the sorted-resident branch
    # (n = 192 = 3 blocks); final states agree to sort-tie
    # reassociation tolerance
    assert _flat_sorted_resident_ok(flat, st, False, False)
    f1, _ = jax.jit(lambda e, s: e.simulate(s, 40, record=False))(
        chunked, st)
    f2, _ = jax.jit(lambda e, s: e.simulate(s, 40, record=False))(
        flat, st)
    np.testing.assert_allclose(np.asarray(f2.s), np.asarray(f1.s),
                               atol=1e-9)

    # and the gather-path flat variant (sorted residency off) agrees too
    flat_nosr = Engine.create(p, MODELS["twod"], sorted_resident=False,
                              neighbors=NeighborConfig(
                                  rebuild_mode="flat", **kw))
    f3, _ = jax.jit(lambda e, s: e.simulate(s, 40, record=False))(
        flat_nosr, st)
    np.testing.assert_allclose(np.asarray(f3.s), np.asarray(f1.s),
                               atol=1e-9)


def test_permute_state_roundtrip_both_dtypes():
    """permute_state (the packed one-gather rebuild permute) must equal
    a naive per-field row take in BOTH dtypes: float64 exercises the
    separate-int-matrix path (CPU tests), float32 the production TPU
    path where int/bool fields ride the float matrix via a 4-byte
    bitcast -- bit movement only, so equality is exact."""
    from cyclistsocialforce_tpu.engine import (_ALL_AGENT_FIELDS,
                                               permute_state)

    n = 96
    rng = np.random.default_rng(11)
    for dtype in (np.float64, np.float32):
        st, _ = _setup(n=n)
        if dtype is np.float32:
            st = jax.tree.map(
                lambda a: a.astype(np.float32)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, st)
        # scramble the int/bool fields so identity permutations or
        # constant columns can't hide packing bugs
        st = st.replace(
            destpointer=jnp.asarray(rng.integers(0, 3, n), jnp.int32),
            nq=jnp.asarray(rng.integers(1, 4, n), jnp.int32),
            znav=jnp.asarray(rng.integers(0, 2, (n, 3)), bool),
            zrid=jnp.asarray(rng.integers(0, 2, n), bool),
            walk_ok_steps=jnp.asarray(rng.integers(0, 9, n), jnp.int32),
            active=jnp.asarray(rng.integers(0, 2, n), bool),
        )
        perm = jnp.asarray(rng.permutation(n))
        out = jax.jit(permute_state)(st, perm)
        for f in _ALL_AGENT_FIELDS:
            want = np.asarray(getattr(st, f))[np.asarray(perm)]
            got = np.asarray(getattr(out, f))
            assert got.dtype == want.dtype, f
            np.testing.assert_array_equal(got, want, err_msg=f)
        # and the inverse permutation restores the original exactly
        back = jax.jit(permute_state)(out, jnp.argsort(perm))
        for f in _ALL_AGENT_FIELDS:
            np.testing.assert_array_equal(np.asarray(getattr(back, f)),
                                          np.asarray(getattr(st, f)),
                                          err_msg=f)


def test_model_sized_state_matches_default_widths():
    """make_state(model=...) zero-sizes the internal fields a model never
    touches (layout/HBM optimization at mega scale -- untouched [N, c]
    carries keep XLA's row-major layout whose tiling pads c -> 128
    lanes). Physics must be bit-identical to the default-width state
    through the culled sorted-resident simulate, and the zero-width
    fields must survive the packed permute/checkpoint paths."""
    from cyclistsocialforce_tpu.engine import permute_state
    from cyclistsocialforce_tpu.params import BicycleParams

    n = 128
    rng = np.random.default_rng(7)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, 120, n)
    s0[:, 1] = rng.uniform(0, 120, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    model = MODELS["bicycle2d"]
    st_d = make_state(s0, dtype=np.float64, hist_len=8)
    st_m = make_state(s0, dtype=np.float64, hist_len=8, model=model)
    assert st_m.dyn_x.shape == (n, 0)
    assert st_m.dyn_gains.shape == (n, 0)
    assert st_m.zrid.shape == (n, 0)

    cfg = NeighborConfig(cutoff=50.0, block=64, kb=8, backend="xla",
                         rebuild_every=5, screen=False)
    eng = Engine.create(as_population(BicycleParams.create(), n), model,
                        rep_force="twod", neighbors=cfg)
    run = jax.jit(lambda e, s: e.simulate(s, 20, record=False)[0])
    out_d, out_m = run(eng, st_d), run(eng, st_m)
    np.testing.assert_array_equal(np.asarray(out_m.s), np.asarray(out_d.s))

    # zero-width fields ride the packed one-gather permute unchanged
    perm = jnp.asarray(rng.permutation(n))
    pm = jax.jit(permute_state)(st_m, perm)
    assert pm.dyn_x.shape == (n, 0) and pm.zrid.shape == (n, 0)
    np.testing.assert_array_equal(np.asarray(pm.s),
                                  np.asarray(st_m.s)[np.asarray(perm)])

    # a model that needs a field it was built without fails loudly
    try:
        make_state(s0, v_max_walk=2.0, model=model)
    except ValueError:
        pass
    else:
        raise AssertionError("v_max_walk with zrid width 0 must raise")


@pytest.mark.slow
def test_model_sized_state_spline_family():
    """Right-sizing must be physics-neutral for models that actually USE
    the internal fields at narrower-than-default widths: invpendulum
    keeps dyn_x cols 0-4 of the default 7 (plus the zrid walking FSM and
    the v_max_walk init), planarpoint keeps 3. NOT asserted bit-exact:
    slicing [:, :5] of a [N,7] array vs using a [N,5] array whole
    changes XLA's fusion shapes, whose different FMA/rounding order
    perturbs the result at the 1e-13 level (measured at step 0); the
    assertion is a tight tolerance over a short horizon instead."""
    from cyclistsocialforce_tpu.params import PlanarPointBicycleParams

    n = 96
    rng = np.random.default_rng(11)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, 100, n)
    s0[:, 1] = rng.uniform(0, 100, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    dests = s0[:, :2] + rng.uniform(20, 40, (n, 2))

    cases = [
        ("invpendulum", as_population(InvPendulumBicycleParams.create(), n),
         dict(v_max_walk=2.0)),   # mixed riding/walking init exercises zrid
        ("planarpoint", as_population(PlanarPointBicycleParams.create(), n),
         {}),
    ]
    for name, p, kw in cases:
        model = MODELS[name]
        widths = model.STATE_WIDTHS
        sts = []
        for m in (None, model):
            st = make_state(s0, dtype=np.float64, hist_len=128, model=m,
                            **kw)
            st = st.replace(
                dest=jnp.concatenate([jnp.asarray(dests),
                                      jnp.zeros((n, 1))], axis=1),
                destqueue=st.destqueue.at[:, 0, :2].set(jnp.asarray(dests)))
            sts.append(st)
        st_d, st_m = sts
        assert st_m.dyn_x.shape == (n, widths["dyn_x"])
        assert st_m.zrid.shape == (n, widths["zrid"])

        eng = Engine.create(p, model, neighbors=NeighborConfig(
            cutoff=60.0, block=32, kb=12, backend="xla", rebuild_every=5))
        run = jax.jit(lambda e, s: e.simulate(s, 12)[1])
        t_d = np.asarray(run(eng, st_d))
        t_m = np.asarray(run(eng, st_m))
        np.testing.assert_allclose(t_m, t_d, rtol=0, atol=1e-9,
                                   err_msg=name)
        assert np.isfinite(t_m).all(), name
