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


def test_flat_sentinel_table_roundtrip():
    """The Pallas kernels' flat sign-sentinel prefetch table (SMEM lays
    2-D scalar-prefetch operands out at (8, 128)-tile granularity, so a
    [B, KB] table would cost B*128*4 B of SMEM -- the 1 MB budget breaks
    at N = 1e6): valid entries keep the block index, invalid entries
    decode (-v - 1) to the row's LAST valid index so the pipeline's
    unchanged-index revisit skip elides their DMAs."""
    from cyclistsocialforce_tpu.ops.pallas_forces import \
        _flat_sentinel_table

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 400, 1024))
    y = jnp.asarray(rng.uniform(0, 400, 1024))
    _, nbr, valid, _ = NB.build(x, y, cutoff=60.0, block=64, kb=10)
    tab = np.asarray(_flat_sentinel_table(nbr, valid))
    nbr, valid = np.asarray(nbr), np.asarray(valid).astype(bool)
    B, KB = nbr.shape
    assert tab.shape == (B * KB,)
    tab = tab.reshape(B, KB)
    for b in range(B):
        count = valid[b].sum()
        assert count >= 1  # self block is always in range
        # valid entries are a prefix (closest-first) and pass through
        assert np.all(valid[b, :count]) and not valid[b, count:].any()
        np.testing.assert_array_equal(tab[b, :count], nbr[b, :count])
        # sentinel entries decode to the row's last valid block index
        decoded = -tab[b, count:] - 1
        assert np.all(tab[b, count:] < 0)
        np.testing.assert_array_equal(
            decoded, np.full(KB - count, nbr[b, count - 1]))


def test_cell_keys_fine_y_serpentine_order():
    """The sort keys order agents column-major with FINE-grained y inside
    each column (ascending on even columns, descending on odd ones) --
    the y-extent of a sorted block is its exact run, not whole cells."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0.0, 300.0, 4096))
    y = jnp.asarray(rng.uniform(0.0, 300.0, 4096))
    cell = 54.0
    perm = np.asarray(NB.sort_by_cell(x, y, cell))
    xs = np.asarray(x)[perm]
    ys = np.asarray(y)[perm]
    # the key snaps the column width UP so an integer number of columns
    # tiles the x-span exactly (no trailing sliver column)
    span = xs.max() - xs.min()
    eff = span / np.floor(span / cell)
    assert eff >= cell
    col = np.minimum(np.floor((xs - xs.min()) / eff),
                     np.floor(span / cell) - 1).astype(int)
    # columns appear in nondecreasing order
    assert (np.diff(col) >= 0).all()
    y_res = (np.asarray(y).max() - np.asarray(y).min()) / (1 << 15)
    for c in np.unique(col):
        yy = ys[col == c]
        d = np.diff(yy)
        # fine-grained monotone y within the column (up on even columns,
        # down on odd), up to the 2^15-level quantization of the key
        if c % 2 == 0:
            assert (d >= -y_res).all(), f"column {c} not ascending"
        else:
            assert (d <= y_res).all(), f"column {c} not descending"


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


@pytest.mark.parametrize("backend", ["xla", "interpret"])
@pytest.mark.parametrize("block_src", [32, 16])
def test_asymmetric_source_blocks_match_dense(backend, block_src):
    """Finer SOURCE blocks (block_src < block): sources are the pair
    tile's sublane dim, so shrinking the source block cuts candidate
    pairs ~20% at no lane cost (scripts/exp_asym_blocks.py). Same pairs,
    same math -- with a domain-covering cutoff the result must equal the
    dense path."""
    n, side = 256, 120.0
    st, p = _population(n, side)
    dense = Engine.create(p, MODELS["twod"])
    frx_d, fry_d = dense.repulsive_sum(st)

    culled = Engine.create(p, MODELS["twod"], neighbors=NeighborConfig(
        cutoff=1e4, block=64, kb=n // block_src, backend=backend,
        block_src=block_src))
    frx_c, fry_c = culled.repulsive_sum_neighbors(st)
    tol = 1e-9 if backend == "xla" else 1e-4   # interpret paths run f32
    np.testing.assert_allclose(np.asarray(frx_c), np.asarray(frx_d),
                               atol=tol)
    np.testing.assert_allclose(np.asarray(fry_c), np.asarray(fry_d),
                               atol=tol)


@pytest.mark.parametrize("block_src", [32, 8])
def test_asymmetric_source_blocks_cutoff_error_bounded(block_src):
    """block_src at the production cutoff: dropped tail still < 1e-4,
    and the finer-granularity table admits FEWER candidate pairs."""
    n, side = 512, 400.0
    st, p = _population(n, side, seed=2)
    dense = Engine.create(p, MODELS["twod"])
    frx_d, fry_d = dense.repulsive_sum(st)
    cfg = NeighborConfig(cutoff=60.0, block=64, kb=48, backend="xla",
                         block_src=block_src)
    culled = Engine.create(p, MODELS["twod"], neighbors=cfg)
    frx_c, fry_c = culled.repulsive_sum_neighbors(st)
    err = np.max(np.hypot(np.asarray(frx_c - frx_d),
                          np.asarray(fry_c - fry_d)))
    assert err < 1e-4, f"cutoff error {err}"

    # candidate-pair accounting: finer source blocks admit fewer pairs
    cache = culled.neighbor_cache(st)
    sq = Engine.create(p, MODELS["twod"], neighbors=NeighborConfig(
        cutoff=60.0, block=64, kb=48, backend="xla"))
    cache_sq = sq.neighbor_cache(st)
    pairs = int(np.asarray(cache[2]).sum()) * block_src
    pairs_sq = int(np.asarray(cache_sq[2]).sum()) * 64
    assert pairs < pairs_sq, (pairs, pairs_sq)
    assert not np.asarray(cache[3]).any()   # no overflow at kb=48


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


@pytest.mark.slow
def test_overflow_surfaced_in_metrics_and_checkify():
    """An undersized kb must be DETECTABLE: nonzero nbr_overflow metrics
    column and a checkify error -- never silent force truncation
    (VERDICT round 1, weak #4)."""
    from cyclistsocialforce_tpu import diagnostics

    n = 256
    st, p = _population(n, 150.0, seed=5)   # crowded: 256 agents, 150 m
    cfg_small = NeighborConfig(cutoff=60.0, block=32, kb=2, backend="xla")
    eng_small = Engine.create(p, MODELS["twod"], neighbors=cfg_small)

    # the raw table flags it
    assert bool(jnp.any(eng_small.neighbor_cache(st)[3]))

    # metrics column
    _, m = jax.jit(lambda e, s: e.simulate(s, 4, record_metrics=True))(
        eng_small, st)
    cols = dict(zip(eng_small.METRIC_NAMES, np.asarray(m).T))
    assert cols["nbr_overflow"].max() > 0

    # checkify error
    err, _ = diagnostics.checked_simulate(eng_small, 2)(st)
    with pytest.raises(Exception, match="overflow"):
        err.throw()

    # and a correctly-capacitied config reports zero everywhere
    cfg_ok = NeighborConfig(cutoff=60.0, block=32, kb=8, backend="xla")
    eng_ok = Engine.create(p, MODELS["twod"], neighbors=cfg_ok)
    assert not bool(jnp.any(eng_ok.neighbor_cache(st)[3]))
    _, m2 = jax.jit(lambda e, s: e.simulate(s, 4, record_metrics=True))(
        eng_ok, st)
    cols2 = dict(zip(eng_ok.METRIC_NAMES, np.asarray(m2).T))
    assert cols2["nbr_overflow"].max() == 0
    err2, _ = diagnostics.checked_simulate(eng_ok, 2)(st)
    err2.throw()   # no error


@pytest.mark.parametrize("kw", [dict(sub=32), dict(screen=False),
                                dict(sub=64, screen=True)])
def test_kernel_variants_match_oracle(kw):
    """The strip-screened (sub>0) and unscreened (screen=False) kernel
    variants stay within the cutoff tolerance of the XLA oracle."""
    n, side = 512, 400.0
    st, p = _population(n, side, seed=2)
    oracle = Engine.create(p, MODELS["twod"], neighbors=NeighborConfig(
        cutoff=60.0, block=64, kb=16, backend="xla"))
    fx0, fy0 = oracle.repulsive_sum_neighbors(st)
    eng = Engine.create(p, MODELS["twod"], neighbors=NeighborConfig(
        cutoff=60.0, block=64, kb=16, backend="interpret", **kw))
    fx1, fy1 = eng.repulsive_sum_neighbors(st)
    err = np.max(np.hypot(np.asarray(fx1 - fx0), np.asarray(fy1 - fy0)))
    assert err < 2e-4, f"{kw}: {err}"


@pytest.mark.slow
def test_sorted_resident_simulate_matches_gather_path():
    """simulate()'s sorted-resident fast path (record=False, N divisible
    by block: the whole state lives cell-sorted per rebuild chunk) must
    reproduce the per-step-gather path bit-for-bit, with original row
    order restored at the end."""
    n = 512
    st, p = _population(n, 300.0, seed=7)
    dests = np.asarray(st.s[:, :2]) + 40.0
    st = st.replace(
        dest=jnp.concatenate([jnp.asarray(dests),
                              jnp.zeros((n, 1))], axis=1),
        destqueue=st.destqueue.at[:, 0, :2].set(jnp.asarray(dests)))
    eng = Engine.create(p, MODELS["twod"], neighbors=NeighborConfig(
        cutoff=60.0, block=64, kb=16, backend="xla", rebuild_every=3))
    # record=True -> per-step gather path; record=False -> sorted-resident
    ref, _ = jax.jit(lambda s: eng.simulate(s, 7, record=True))(st)
    fast, _ = jax.jit(lambda s: eng.simulate(s, 7, record=False))(st)
    for f in ("s", "dest", "i", "destpointer", "znav", "pos_hist"):
        a = np.asarray(getattr(ref, f))
        b = np.asarray(getattr(fast, f))
        np.testing.assert_array_equal(a, b, err_msg=f)


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


def test_full_fov_elision_matches_dense():
    """With hfov = 2*pi (the reference Vehicle default) the engine elides
    the FOV cone test statically (Engine.full_fov); results must equal
    the dense path exactly, and the flag must NOT be set for real FOVs."""
    from cyclistsocialforce_tpu.params import BicycleParams, as_population

    n = 256
    rng = np.random.default_rng(11)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, 120, n)
    s0[:, 1] = rng.uniform(0, 120, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    st = make_state(s0, dtype=np.float64)
    p_full = as_population(BicycleParams.create(hfov=2 * np.pi), n)
    assert float(np.max(np.asarray(p_full.hfov))) >= 2 * np.pi - 1e-9

    dense = Engine.create(p_full, MODELS["bicycle2d"], rep_force="twod")
    assert dense.full_fov
    frx_d, fry_d = dense.repulsive_sum(st)
    for backend in ("xla", "interpret"):
        culled = Engine.create(
            p_full, MODELS["bicycle2d"], rep_force="twod",
            neighbors=NeighborConfig(cutoff=1e4, block=64, kb=4,
                                     backend=backend, screen=False))
        frx_c, fry_c = culled.repulsive_sum_neighbors(st)
        tol = 1e-9 if backend == "xla" else 1e-4
        np.testing.assert_allclose(np.asarray(frx_c), np.asarray(frx_d),
                                   atol=tol)
        np.testing.assert_allclose(np.asarray(fry_c), np.asarray(fry_d),
                                   atol=tol)

    # a real (partial) FOV population must keep the mask
    p_fov = as_population(InvPendulumBicycleParams.create(), n)
    assert not Engine.create(p_fov, MODELS["twod"]).full_fov


@pytest.mark.slow
def test_sorted_resident_metrics_match_gather_path():
    """record_metrics=True composes with the sorted-resident path (the
    per-step metrics are permutation-invariant aggregates)."""
    n = 256
    st, p = _population(n, 200.0, seed=9)
    eng = Engine.create(p, MODELS["twod"], neighbors=NeighborConfig(
        cutoff=60.0, block=64, kb=16, backend="xla", rebuild_every=3))
    _, m_ref = jax.jit(lambda s: eng.simulate(
        s, 6, record=True, record_metrics=True))(st)
    _, m_fast = jax.jit(lambda s: eng.simulate(
        s, 6, record=False, record_metrics=True))(st)
    # sums reduce in permuted agent order -> ULP-level differences
    np.testing.assert_allclose(np.asarray(m_ref), np.asarray(m_fast),
                               rtol=1e-12, atol=1e-12)


def test_bench_config_is_overflow_free():
    """CI guard for the driver bench artifact: the shipped bench.py
    neighbor configuration (block/kb/cutoff/rebuild skin) must cover the
    true in-range block count of the bench population with margin --
    round 1 shipped a silently-truncating config (kb=8 vs true max 47)."""
    import bench as B
    from __graft_entry__ import _build
    from cyclistsocialforce_tpu.ops import neighbors as NB

    _, state = _build(100_000, dtype=np.float32, density=0.02,
                      hist_len=8, pad_to_block=B.BLOCK)
    bsrc = getattr(B, "BLOCK_SRC", 0) or B.BLOCK
    cfg = NeighborConfig(cutoff=B.CUTOFF, block=B.BLOCK, kb=B.KB,
                         rebuild_every=B.REBUILD, backend="xla",
                         block_src=bsrc)
    x = jnp.asarray(np.asarray(state.s[:, 0]))
    y = jnp.asarray(np.asarray(state.s[:, 1]))
    cache = NB.build(x, y, cfg.cutoff + cfg.skin, cfg.block, cfg.kb,
                     block_src=bsrc)
    counts = np.asarray(cache[2]).sum(1)
    assert not np.asarray(cache[3]).any(), "bench config overflows at t=0"
    assert counts.max() + 2 <= B.KB, (
        f"kb margin too thin: max in-range {counts.max()} vs kb={B.KB}")


@pytest.mark.parametrize("backend", ["xla", "interpret"])
def test_legacy_family_culled_matches_dense(backend):
    """A homogeneous LEGACY-field population under neighbor culling
    (routed through the mixed-family tile, all rows fam=1) matches the
    dense legacy path with a domain-covering cutoff. The legacy field's
    slow forward decay is why production cutoffs want ~100 m
    (NeighborConfig docstring); a full cutoff makes the match exact."""
    from cyclistsocialforce_tpu.params import BicycleParams

    n, side = 256, 120.0
    rng = np.random.default_rng(3)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, side, n)
    s0[:, 1] = rng.uniform(0, side, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    st = make_state(s0, dtype=np.float64)
    p = as_population(BicycleParams.create(), n)

    dense = Engine.create(p, MODELS["bicycle2d"])      # legacy family
    frx_d, fry_d = dense.repulsive_sum(st)

    culled = Engine.create(p, MODELS["bicycle2d"],
                           neighbors=NeighborConfig(
                               cutoff=1e4, block=64, kb=4,
                               backend=backend))
    assert culled.pair_family == "legacy"
    frx_c, fry_c = culled.repulsive_sum_neighbors(st)
    tol = 1e-9 if backend == "xla" else 1e-4
    np.testing.assert_allclose(np.asarray(frx_c), np.asarray(frx_d),
                               atol=tol)
    np.testing.assert_allclose(np.asarray(fry_c), np.asarray(fry_d),
                               atol=tol)

    # end-to-end: a culled legacy simulate stays on the dense trajectory
    d_fin, _ = jax.jit(lambda e, s: e.simulate(s, 10, record=False))(
        dense, st)
    c_fin, _ = jax.jit(lambda e, s: e.simulate(s, 10, record=False))(
        culled, st)
    np.testing.assert_allclose(np.asarray(c_fin.s), np.asarray(d_fin.s),
                               atol=1e-8 if backend == "xla" else 1e-4)


@pytest.mark.parametrize("backend", ["interpret", "interpret_unrolled"])
def test_uniform_pair_constants_match_general(backend):
    """Shared scalar pair-field params are baked into the Pallas tile as
    compile-time constants (Engine.uniform_pair, detected at create();
    engine._uniform_pair_params). The baked kernel must match the
    general per-column path bit-for-bit in intent (same math, different
    operand sources) -- compared here against the XLA oracle AND against the
    general kernel forced by a heterogeneity-defeating param copy."""
    from cyclistsocialforce_tpu.params import BicycleParams

    n, side = 384, 150.0
    rng = np.random.default_rng(11)
    s0 = np.zeros((n, 5))
    s0[:, 0] = rng.uniform(0, side, n)
    s0[:, 1] = rng.uniform(0, side, n)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    st = make_state(s0, dtype=np.float64)
    p = as_population(BicycleParams.create(), n)

    cfg = NeighborConfig(cutoff=60.0, block=64, kb=10, backend=backend,
                         block_src=32)
    eng = Engine.create(p, MODELS["bicycle2d"], rep_force="twod",
                        neighbors=cfg)
    assert eng.uniform_pair is not None       # broadcast params detected
    fx_u, fy_u = eng.repulsive_sum_neighbors(st)

    oracle = Engine.create(p, MODELS["bicycle2d"], rep_force="twod",
                           neighbors=NeighborConfig(
                               cutoff=60.0, block=64, kb=10,
                               backend="xla", block_src=32))
    fx_o, fy_o = oracle.repulsive_sum_neighbors(st)
    # f32 kernel vs f64 oracle: absolute floor for near-zero forces plus
    # a relative term for O(1-10) magnitudes
    np.testing.assert_allclose(np.asarray(fx_u), np.asarray(fx_o),
                               atol=1e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(fy_u), np.asarray(fy_o),
                               atol=1e-4, rtol=2e-4)

    # per-agent (non-uniform) params take the general column path and
    # agree with the same oracle
    p_het = p.replace(e_0=p.e_0 * (1.0 + 1e-9 * np.arange(n)))
    eng_g = Engine.create(p_het, MODELS["bicycle2d"], rep_force="twod",
                          neighbors=cfg)
    assert eng_g.uniform_pair is None
    fx_g, fy_g = eng_g.repulsive_sum_neighbors(st)
    np.testing.assert_allclose(np.asarray(fx_u), np.asarray(fx_g),
                               atol=1e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(fy_u), np.asarray(fy_g),
                               atol=1e-4, rtol=2e-4)


def test_with_params_refreshes_static_fields():
    """`Engine.with_params` must refresh the params-derived STATICS
    (uniform_pair, full_fov) that a bare replace(params=...) would
    leave stale (they are compile-time constants in the Pallas tile)."""
    from cyclistsocialforce_tpu.params import BicycleParams

    p = BicycleParams.create()
    eng = Engine.create(p, MODELS["bicycle2d"], rep_force="twod")
    assert eng.uniform_pair is not None

    p2 = p.replace(e_0=p.e_0 * 0.5, hfov=2.0 * np.pi)
    eng2 = eng.with_params(p2)
    assert eng2.uniform_pair[0] == pytest.approx(float(p2.e_0))
    assert eng2.full_fov                      # hfov now covers the circle
    # heterogeneous params clear the baked constants
    n = 8
    p3 = as_population(p, n)
    p3 = p3.replace(sigma_0=p3.sigma_0 * (1 + 0.1 * np.arange(n)))
    assert eng.with_params(p3).uniform_pair is None
    # the stale-static hazard with bare replace (documented): values
    # differ but the baked tuple is unchanged
    assert eng.replace(params=p2).uniform_pair == eng.uniform_pair


def test_chunked_table_and_row_segments_identical():
    """Mega-scale controls must not change results: the chunked
    [B, B_src] table build equals the dense build bit-for-bit, and a
    row-segmented pair dispatch equals the single-call dispatch."""
    from cyclistsocialforce_tpu.params import BicycleParams

    rng = np.random.default_rng(7)
    n = 1024
    x = jnp.asarray(rng.uniform(-300, 300, n))
    y = jnp.asarray(rng.uniform(-300, 300, n))
    for chunk in (1, 3, 4, 100):
        a = NB.build(x, y, 60.0, 64, 10, block_src=32)
        b = NB.build(x, y, 60.0, 64, 10, block_src=32,
                     table_chunk=chunk)
        for ai, bi in zip(a, b):
            np.testing.assert_array_equal(np.asarray(ai),
                                          np.asarray(bi))

    s0 = np.zeros((n, 5))
    s0[:, 0] = np.asarray(x)
    s0[:, 1] = np.asarray(y)
    s0[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s0[:, 3] = rng.uniform(1, 6, n)
    st = make_state(s0, dtype=np.float64)
    p = as_population(BicycleParams.create(), n)

    def forces(segments, chunk):
        eng = Engine.create(p, MODELS["bicycle2d"], rep_force="twod",
                            neighbors=NeighborConfig(
                                cutoff=60.0, block=64, kb=10,
                                backend="interpret", block_src=32,
                                table_chunk=chunk,
                                row_segments=segments))
        fx, fy = eng.repulsive_sum_neighbors(st)
        return np.asarray(fx), np.asarray(fy)

    fx1, fy1 = forces(1, 0)
    for segments in (2, 3, 5):
        fxs, fys = forces(segments, 3)
        np.testing.assert_array_equal(fxs, fx1)
        np.testing.assert_array_equal(fys, fy1)
