"""Cross-model fuzz: random populations stay finite and hold invariants.

Every dynamics model runs random initial conditions (including slow /
reversing / tightly-packed riders) through the full engine for a few
hundred steps; states must stay finite and the navigation FSM one-hot --
the robustness the reference lacks (its heavy models are documented as
'not stable enough for crowded scenarios', README.md:79)."""

import jax
import numpy as np
import pytest

from cyclistsocialforce_tpu import Engine, make_state
from cyclistsocialforce_tpu.diagnostics import validate_state
from cyclistsocialforce_tpu.models import MODELS, prepare
from cyclistsocialforce_tpu.params import (BalancingRiderParams,
                                           BicycleParams,
                                           InvPendulumBicycleParams,
                                           PlanarBicycleParams,
                                           PlanarPointBicycleParams,
                                           as_population)
from cyclistsocialforce_tpu.state import set_destinations

PARAMS = {
    "bicycle2d": BicycleParams,
    "twod": InvPendulumBicycleParams,
    "invpendulum": InvPendulumBicycleParams,
    "balancingrider": BalancingRiderParams,
    "planarpoint": PlanarPointBicycleParams,
    "planarbicycle": PlanarBicycleParams,
}

# speed ranges honoring each model's documented stability envelope
V_RANGE = {
    "bicycle2d": (0.0, 8.0),
    "twod": (0.5, 6.5),
    "invpendulum": (0.3, 6.5),        # includes the walking regime
    "balancingrider": (1.5, 6.5),     # pole model fitted for 1.5-5.5 m/s
    "planarpoint": (0.5, 8.0),
    "planarbicycle": (0.5, 8.0),
}


@pytest.mark.parametrize("model_name", sorted(PARAMS))
@pytest.mark.parametrize("seed", [0, 1])
def test_random_population_stays_finite(model_name, seed):
    rng = np.random.default_rng(seed)
    n = 12
    s0 = np.zeros((n, 8))
    s0[:, 0] = rng.uniform(-15, 15, n)
    s0[:, 1] = rng.uniform(-15, 15, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    lo, hi = V_RANGE[model_name]
    s0[:, 3] = rng.uniform(lo, hi, n)

    st = make_state(s0, dtype=np.float64)
    for a in range(n):
        st = set_destinations(
            st, a, tuple(rng.uniform(-40, 40, 2)),
            tuple(rng.uniform(-40, 40, 2)), reset=True)
    p = as_population(PARAMS[model_name].create(), n)
    model = MODELS[model_name]
    st = prepare(model, p, st)
    eng = Engine.create(p, model)
    final, traj = jax.jit(lambda e, s: e.simulate(s, 300))(eng, st)
    traj = np.asarray(traj)
    assert np.all(np.isfinite(traj)), \
        f"{model_name}: non-finite states (seed {seed})"
    assert validate_state(final) == []
    # speeds respect the configured limits (with small numerical slack)
    from cyclistsocialforce_tpu.params import pair_hi, pair_lo
    vmax = float(np.max(np.asarray(pair_hi(p.v_max_riding))))
    vmin = float(np.min(np.asarray(pair_lo(p.v_max_riding))))
    assert np.all(traj[:, :, 3] <= vmax + 1e-6)
    assert np.all(traj[:, :, 3] >= vmin - 1e-6)


# ---------------------------------------------------------------------------
# config-product fuzz (VERDICT r3 #8): the culled pair stage has many
# static axes (block / block_src / kb / screen / rebuild_mode /
# rebuild_every / table_chunk / sorted_resident x mixed families); the
# round-1 silent-kb-truncation bug is exactly the class these properties
# catch. Seeded randomized configs, each asserted against the dense
# oracle or the overflow flag's honesty.
# ---------------------------------------------------------------------------

from cyclistsocialforce_tpu.engine import NeighborConfig  # noqa: E402


def _rand_cfg(rng, n, kb=None, cutoff=60.0):
    block = int(rng.choice([8, 16, 32]))
    srcs = [b for b in (8, 16, 32) if b <= block and block % b == 0]
    block_src = int(rng.choice(srcs))
    return NeighborConfig(
        cutoff=cutoff, block=block, block_src=block_src,
        kb=int(kb if kb is not None else n // block_src),
        backend="xla",
        rebuild_every=int(rng.choice([1, 2, 4, 5])),
        rebuild_mode=str(rng.choice(["chunked", "flat"])),
        screen=bool(rng.choice([False, True])),
        table_chunk=int(rng.choice([0, 64])),
    )


def _rand_population(rng, n, side, dtype=np.float64):
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(-side, side, n)
    s0[:, 1] = rng.uniform(-side, side, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    st = make_state(s0, dtype=dtype)
    for a in range(n):
        st = set_destinations(st, a, (rng.uniform(-side, side),),
                              (rng.uniform(-side, side),), reset=True)
    return st


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_culled_matches_dense_config_product(seed):
    """Random (block, block_src, kb=full, rebuild_every, rebuild_mode,
    screen, table_chunk, sorted_resident) config: the culled run must
    match the dense run within the cutoff-truncation bound, and the
    overflow metric must be zero at full kb capacity."""
    rng = np.random.default_rng(100 + seed)
    cfg = _rand_cfg(rng, 0)   # block first, to size n
    n = cfg.block * int(rng.integers(6, 14))
    cfg = NeighborConfig(**{**_cfg_kwargs(cfg), "kb": n // cfg.block_src})
    sr = bool(rng.choice([False, True]))
    side = 0.5 * np.sqrt(n / 0.02)
    st = _rand_population(rng, n, side)
    p = BicycleParams.create()
    dense = Engine.create(p, MODELS["bicycle2d"], rep_force="twod")
    culled = Engine.create(p, MODELS["bicycle2d"], rep_force="twod",
                           neighbors=cfg, sorted_resident=sr)
    n_steps = 10
    ref, _ = jax.jit(lambda e, s: e.simulate(s, n_steps,
                                             record=False))(dense, st)
    out, _ = jax.jit(lambda e, s: e.simulate(s, n_steps,
                                             record=False))(culled, st)
    np.testing.assert_allclose(
        np.asarray(out.s[:, :2]), np.asarray(ref.s[:, :2]), atol=2e-5,
        err_msg=f"cfg={_cfg_kwargs(cfg)} sr={sr} n={n}")
    _, metrics = jax.jit(lambda e, s: e.simulate(
        s, n_steps, record=False, record_metrics=True))(culled, st)
    assert float(np.asarray(metrics)[:, 7].sum()) == 0.0


def _cfg_kwargs(cfg):
    return dict(cutoff=cfg.cutoff, block=cfg.block,
                block_src=cfg.block_src, kb=cfg.kb, backend=cfg.backend,
                rebuild_every=cfg.rebuild_every,
                rebuild_mode=cfg.rebuild_mode, screen=cfg.screen,
                table_chunk=cfg.table_chunk)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_overflow_flag_honesty(seed):
    """Random (possibly undersized) kb: whenever the nbr_overflow metric
    reports ZERO, the culled trajectory must match dense; whenever the
    trajectory is clearly off, the metric must have fired. Silent
    truncation (mismatch + zero flag) is the bug class."""
    rng = np.random.default_rng(200 + seed)
    cfg = _rand_cfg(rng, 0)
    n = cfg.block * int(rng.integers(6, 14))
    n_src_blocks = n // cfg.block_src
    kb = int(rng.integers(1, n_src_blocks + 1))
    cfg = NeighborConfig(**{**_cfg_kwargs(cfg), "kb": kb})
    side = 0.5 * np.sqrt(n / 0.02)
    st = _rand_population(rng, n, side)
    p = BicycleParams.create()
    dense = Engine.create(p, MODELS["bicycle2d"], rep_force="twod")
    culled = Engine.create(p, MODELS["bicycle2d"], rep_force="twod",
                           neighbors=cfg)
    n_steps = 8
    ref, _ = jax.jit(lambda e, s: e.simulate(s, n_steps,
                                             record=False))(dense, st)
    out, metrics = jax.jit(lambda e, s: e.simulate(
        s, n_steps, record=False, record_metrics=True))(culled, st)
    overflowed = float(np.asarray(metrics)[:, 7].sum()) > 0
    err = float(np.max(np.abs(np.asarray(out.s[:, :2])
                              - np.asarray(ref.s[:, :2]))))
    if not overflowed:
        assert err < 2e-5, (
            f"SILENT TRUNCATION: err {err:.2e} with zero overflow flag "
            f"(kb={kb}/{n_src_blocks}, cfg={_cfg_kwargs(cfg)})")
    if err > 5e-4:
        assert overflowed, (
            f"trajectory off by {err:.2e} but overflow flag silent "
            f"(kb={kb}/{n_src_blocks}, cfg={_cfg_kwargs(cfg)})")


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_sorted_resident_equivalence(seed):
    """sorted_resident=True vs False on the same random config: pure
    float-reassociation differences only (stable-argsort tie order)."""
    rng = np.random.default_rng(300 + seed)
    cfg = _rand_cfg(rng, 0)
    n = cfg.block * int(rng.integers(6, 12))
    cfg = NeighborConfig(**{**_cfg_kwargs(cfg), "kb": n // cfg.block_src})
    side = 0.5 * np.sqrt(n / 0.02)
    st = _rand_population(rng, n, side)
    p = BicycleParams.create()
    engs = [Engine.create(p, MODELS["bicycle2d"], rep_force="twod",
                          neighbors=cfg, sorted_resident=s)
            for s in (True, False)]
    outs = [jax.jit(lambda e, s: e.simulate(s, 10, record=False))(e, st)[0]
            for e in engs]
    np.testing.assert_allclose(np.asarray(outs[0].s),
                               np.asarray(outs[1].s), atol=1e-6,
                               err_msg=f"cfg={_cfg_kwargs(cfg)} n={n}")


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(4))
def test_fuzz_mixed_families_config_product(seed):
    """Random legacy/twod group split x random culled config (domain-
    covering cutoff): the mixed-family culled engine must equal the
    dense MixedEngine bit-near."""
    from cyclistsocialforce_tpu.mixed import MixedEngine, prepare_groups
    from cyclistsocialforce_tpu.params import InvPendulumBicycleParams

    rng = np.random.default_rng(400 + seed)
    cfg = _rand_cfg(rng, 0, cutoff=1e4)
    n_legacy = 8 * int(rng.integers(2, 8))
    n_twod = 8 * int(rng.integers(2, 8))
    n = n_legacy + n_twod
    # kb must cover the BLOCK-PADDED population (the culled path pads n
    # up to a block multiple; with a domain-covering cutoff every padded
    # source block is in range)
    n_pad = -(-n // cfg.block) * cfg.block
    cfg = NeighborConfig(**{**_cfg_kwargs(cfg),
                            "kb": n_pad // cfg.block_src})
    side = 60.0
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, side, n)
    s0[:, 1] = rng.uniform(0, side, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    st = make_state(s0, dtype=np.float64)
    groups = [("bicycle2d", as_population(BicycleParams.create(),
                                          n_legacy), n_legacy),
              ("twod", as_population(InvPendulumBicycleParams.create(),
                                     n_twod), n_twod)]
    dense = MixedEngine.create(groups)
    culled = MixedEngine.create(groups, neighbors=cfg)
    st = prepare_groups(dense, st)
    f_d, _ = jax.jit(lambda s: dense.simulate(s, 6, record=False))(st)
    f_c, _ = jax.jit(lambda s: culled.simulate(s, 6, record=False))(st)
    np.testing.assert_allclose(np.asarray(f_c.s), np.asarray(f_d.s),
                               atol=1e-9,
                               err_msg=f"cfg={_cfg_kwargs(cfg)} "
                                       f"split={n_legacy}/{n_twod}")


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_model_families_culled_finite(seed):
    """Random dynamics model x random culled config: trajectories stay
    finite and the FSM invariants hold (the existing dense fuzz,
    extended over the culled config product)."""
    rng = np.random.default_rng(500 + seed)
    model_name = str(rng.choice(sorted(PARAMS)))
    cfg = _rand_cfg(rng, 0)
    n = cfg.block * int(rng.integers(4, 8))
    cfg = NeighborConfig(**{**_cfg_kwargs(cfg), "kb": n // cfg.block_src})
    side = 0.5 * np.sqrt(n / 0.02)
    lo, hi = V_RANGE[model_name]
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(-side, side, n)
    s0[:, 1] = rng.uniform(-side, side, n)
    s0[:, 2] = rng.uniform(-0.3, 0.3, n)
    s0[:, 3] = rng.uniform(max(lo, 1.0), hi, n)
    st = make_state(s0, dtype=np.float64)
    import jax.numpy as jnp
    dst = np.c_[s0[:, 0] + 80, s0[:, 1], np.zeros(n)]
    st = st.replace(dest=jnp.asarray(dst),
                    destqueue=st.destqueue.at[:, 0, :].set(
                        jnp.asarray(dst)))
    p = as_population(PARAMS[model_name].create(), n)
    model = MODELS[model_name]
    st = prepare(model, p, st)
    eng = Engine.create(p, model, rep_force="twod", neighbors=cfg)
    final, traj = jax.jit(lambda e, s: e.simulate(s, 60))(eng, st)
    assert np.all(np.isfinite(np.asarray(traj))), (
        f"{model_name}: non-finite (cfg={_cfg_kwargs(cfg)})")
    assert validate_state(final) == []
