"""Scenario runner: chunked stepping, determinism, checkpoint/resume,
pacing, metrics."""

import os
import tempfile

import numpy as np
import pytest

from cyclistsocialforce_tpu import Engine, make_state
from cyclistsocialforce_tpu.models import MODELS, prepare
from cyclistsocialforce_tpu.params import BicycleParams, as_population
from cyclistsocialforce_tpu.scenario import (Scenario, load_checkpoint,
                                             save_checkpoint)
from cyclistsocialforce_tpu.state import set_destinations


def _scenario(chunk=50, run_time_factor=None):
    s0 = np.array([[-6.0, 0, 0, 5, 0],
                   [15.0, -20, np.pi / 2, 5, 0],
                   [13.0, -20, np.pi / 2, 5, 0]])
    st = make_state(s0, dtype=np.float64)
    st = set_destinations(st, 0, (35, 64, 65), (0, 0, 0))
    st = set_destinations(st, 1, (15, 15, 15), (20, 49, 50))
    st = set_destinations(st, 2, (13, 13, 13), (20, 49, 50))
    p = as_population(BicycleParams.create(), 3)
    model = MODELS["bicycle2d"]
    st = prepare(model, p, st)
    eng = Engine.create(p, model)
    return Scenario(eng, st, chunk=chunk, run_time_factor=run_time_factor)


def test_run_by_time_and_record():
    sc = _scenario(chunk=40)
    traj = sc.run(t_end=1.0, record=True)
    assert traj.shape == (100, 3, 8)
    assert sc.i == 100
    assert np.all(np.isfinite(traj))


def test_chunking_invariance():
    """Chunk size must not change the physics: chunk=7 == chunk=100."""
    a = _scenario(chunk=7).run(n_steps=140, record=True)
    b = _scenario(chunk=100).run(n_steps=140, record=True)
    np.testing.assert_array_equal(a, b)


def test_determinism_same_seed():
    """Same seed => bit-identical runs (SURVEY section 5: determinism)."""
    a = _scenario().run(n_steps=200, record=True)
    b = _scenario().run(n_steps=200, record=True)
    np.testing.assert_array_equal(a, b)


def test_checkpoint_resume_bitexact():
    """checkpoint at step 100, resume -> identical to uninterrupted run."""
    full = _scenario()
    ref = full.run(n_steps=300, record=True)

    first = _scenario()
    first.run(n_steps=100)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        first.checkpoint(path)

        resumed = _scenario()
        meta = resumed.restore(path)
        assert resumed.i == 100
        assert meta["i"] == 100
        tail = resumed.run(n_steps=200, record=True)
    np.testing.assert_array_equal(tail, ref[100:])


def test_checkpoint_roundtrip_all_leaves():
    sc = _scenario()
    sc.run(n_steps=37)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "s.npz")
        save_checkpoint(path, sc.state, extra={"note": "x"})
        restored, meta = load_checkpoint(path, sc.state)
    assert meta["note"] == "x"
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(sc.state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_callback_fires_per_chunk():
    sc = _scenario(chunk=25)
    seen = []
    sc.run(n_steps=100, callback=lambda i, st, tr: seen.append(
        (i, None if tr is None else np.asarray(tr).shape)))
    assert [s[0] for s in seen] == [25, 50, 75, 100]
    assert all(s[1] == (25, 3, 8) for s in seen)


def test_metrics_and_pacing():
    sc = _scenario(chunk=20, run_time_factor=20.0)
    import time
    t0 = time.perf_counter()
    sc.run(n_steps=40)
    wall = time.perf_counter() - t0
    # 40 steps at t_s=0.01 and factor 20 -> >= 20 ms wall
    assert wall >= 0.02
    s = sc.metrics.summary()
    assert s["total_steps"] == 40
    assert sc.metrics.agent_steps_per_sec() == pytest.approx(
        3 * sc.metrics.steps_per_sec(), rel=1e-6)


def test_reset():
    sc = _scenario()
    sc.run(n_steps=50)
    sc.reset()
    assert sc.i == 0
    np.testing.assert_array_equal(np.asarray(sc.state.s),
                                  np.asarray(sc.state0.s))


def test_device_metrics_buffer():
    """simulate(record_metrics=True) returns the [T, 7] on-device
    aggregate buffer (SURVEY section 5 observability)."""
    import jax

    sc = _scenario()
    final, metrics = jax.jit(
        lambda e, s: e.simulate(s, 60, record_metrics=True))(sc.engine,
                                                             sc.state)
    m = np.asarray(metrics)
    assert m.shape == (60, len(sc.engine.METRIC_NAMES))
    cols = dict(zip(sc.engine.METRIC_NAMES, m.T))
    assert np.all(cols["n_active"] == 3)
    assert np.all(cols["v_mean"] > 0) and np.all(cols["v_max"] >= cols["v_mean"])
    assert np.all(cols["f_max"] >= cols["f_mean"])
    assert np.all((cols["arrived_frac"] >= 0) & (cols["arrived_frac"] <= 1))
