"""Scenario runner: the simulation loop, pacing, metrics, checkpointing.

TPU-native equivalent of the reference `Scenario` (reference
scenario.py:53-265): where the reference steps one Python object graph per
10 ms tick and sleeps to hold a real-time factor, this runner keeps the
whole population on device and advances it in jit-compiled `lax.scan`
CHUNKS, surfacing to the host only between chunks -- for animation
callbacks, pacing, metrics, and checkpoints.

Feature map:

  - run modes: the reference's silent / animated / animated-writeout
    (scenario.py:115-159) become `run(..., callback=...)` -- the callback
    receives (step_index, state, traj_chunk) per chunk; the visualization
    module provides ready-made animation/video callbacks.
  - real-time pacing: `t_r` per-step budget / `run_time_factor`
    (scenario.py:59-77, 175-195), applied per chunk.
  - metrics: per-chunk wall time + steps/sec + agent-steps/sec histories
    (the reference's `hist_run_time`, scenario.py:457-463) plus a
    runtime-vs-N report (`plot_runtime_vs_nvec`, scenario.py:484-543).
  - checkpoint/resume: the whole simulation state is one pytree --
    `save_checkpoint` / `load_checkpoint` (npz; absent in the reference,
    which can only rewind counters, scenario.py:226-229).
"""

from __future__ import annotations

import json
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from cyclistsocialforce_tpu.state import AgentState

# --------------------------------------------------------------------------
# checkpointing: pytree <-> npz
# --------------------------------------------------------------------------


def _flatten_with_keys(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(path): leaf for path, leaf in flat}


def save_checkpoint(path, state, extra: dict | None = None):
    """Save a simulation-state pytree (plus optional host metadata) to one
    .npz file. Resume is `load_checkpoint(path, template)`."""
    data = {f"leaf{k}": np.asarray(v)
            for k, v in _flatten_with_keys(state).items()}
    data["__meta__"] = np.frombuffer(
        json.dumps(extra or {}).encode(), dtype=np.uint8)
    np.savez_compressed(path, **data)


def load_checkpoint(path, template):
    """Restore a pytree saved by `save_checkpoint`; `template` supplies the
    structure (e.g. a freshly built AgentState of the same shapes).

    Returns (state, extra_metadata_dict)."""
    with np.load(path) as data:
        keys = _flatten_with_keys(template).keys()
        leaves = [jnp.asarray(data[f"leaf{k}"]) for k in keys]
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


# --------------------------------------------------------------------------
# metrics
# --------------------------------------------------------------------------


class RuntimeMetrics:
    """Host-side per-chunk runtime history (reference hist_run_time /
    plot_runtime_vs_nvec, scenario.py:457-543)."""

    def __init__(self):
        self.chunk_steps: list[int] = []
        self.chunk_wall: list[float] = []
        self.n_agents: list[int] = []

    def record(self, n_steps, wall, n_agents):
        self.chunk_steps.append(int(n_steps))
        self.chunk_wall.append(float(wall))
        self.n_agents.append(int(n_agents))

    @property
    def total_steps(self):
        return int(np.sum(self.chunk_steps))

    @property
    def total_wall(self):
        return float(np.sum(self.chunk_wall))

    def steps_per_sec(self):
        return self.total_steps / max(self.total_wall, 1e-12)

    def agent_steps_per_sec(self):
        total = np.sum(np.asarray(self.chunk_steps)
                       * np.asarray(self.n_agents))
        return float(total) / max(self.total_wall, 1e-12)

    def step_wall_times(self):
        """Mean per-step wall time per chunk [s]."""
        return (np.asarray(self.chunk_wall)
                / np.maximum(np.asarray(self.chunk_steps), 1))

    def summary(self):
        return {
            "total_steps": self.total_steps,
            "total_wall_s": round(self.total_wall, 4),
            "steps_per_sec": round(self.steps_per_sec(), 1),
            "agent_steps_per_sec": round(self.agent_steps_per_sec(), 1),
        }

    def plot_runtime(self, t_s=0.01, ax=None):
        """Per-step wall time vs agent count, with the real-time line
        (reference plot_runtime_vs_nvec, scenario.py:484-543)."""
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots()
        ax.scatter(self.n_agents, self.step_wall_times() * 1e3,
                   s=12, label="measured")
        ax.axhline(t_s * 1e3, color="red", linestyle="--",
                   label=f"real-time requirement ({t_s * 1e3:.0f} ms)")
        ax.set_xlabel("number of agents")
        ax.set_ylabel("wall time per step [ms]")
        ax.set_yscale("log")
        ax.legend()
        return ax


# --------------------------------------------------------------------------
# the scenario runner
# --------------------------------------------------------------------------


class Scenario:
    """Standalone simulation scenario (reference Scenario,
    scenario.py:53-265).

    Parameters
    ----------
    engine : Engine
        The interaction engine (owns params/forces/model).
    state : AgentState
        Initial population state.
    t_s : float
        Simulation step time [s] (for pacing and t_end conversion).
    chunk : int
        Steps per jitted scan chunk. Larger chunks amortize dispatch;
        chunk=1 reproduces the reference's per-step host loop (needed for
        animation at display rate).
    run_time_factor : float or None
        None = as fast as possible; 1.0 = real time; 2.0 = twice real time
        (reference scenario.py:59-77, 293-297).
    """

    def __init__(self, engine, state: AgentState, t_s: float = 0.01,
                 chunk: int = 100, run_time_factor: float | None = None):
        self.engine = engine
        self.state0 = state
        self.state = state
        self.t_s = float(t_s)
        self.chunk = int(chunk)
        self.run_time_factor = run_time_factor
        self.metrics = RuntimeMetrics()
        self.i = 0
        self._compiled: dict[int, Callable] = {}

    # ---- compiled chunk advance ----

    def _chunk_fn(self, n_steps: int, record: bool):
        key = (n_steps, record)
        fn = self._compiled.get(key)
        if fn is None:
            def run(e, s):
                return e.simulate(s, n_steps, record=record)
            fn = jax.jit(run)
            self._compiled[key] = fn
        return fn

    def step_chunk(self, n_steps: int | None = None, record: bool = True):
        """Advance by one chunk; returns the recorded [chunk, N, 8] states
        (or None). Wall time is recorded in `metrics`."""
        n_steps = n_steps or self.chunk
        fn = self._chunk_fn(n_steps, record)
        t0 = time.perf_counter()
        self.state, traj = fn(self.engine, self.state)
        jax.block_until_ready(self.state.s)
        self.metrics.record(n_steps, time.perf_counter() - t0,
                            self.state.n)
        self.i += n_steps
        return traj

    # ---- run modes ----

    def run(self, t_end: float | None = None, n_steps: int | None = None,
            callback: Callable | None = None, record: bool = False):
        """Run for `t_end` seconds of simulated time (or `n_steps` steps).

        callback(i, state, traj_chunk) fires after every chunk (the
        animation hook); with record=True the full [T, N, 8] trajectory is
        returned (device-resident until the final stack).
        """
        if n_steps is None:
            if t_end is None:
                raise ValueError("pass t_end or n_steps")
            n_steps = int(round(t_end / self.t_s))
        out = []
        done = 0
        while done < n_steps:
            n = min(self.chunk, n_steps - done)
            want = record or callback is not None
            traj = self.step_chunk(n, record=want)
            done += n
            if record:
                out.append(np.asarray(traj))
            if callback is not None:
                callback(self.i, self.state, traj)
            self._pace(n)
        if record:
            return np.concatenate(out, axis=0)
        return None

    def _pace(self, n_steps):
        """Sleep to hold the requested real-time factor (reference _wait,
        scenario.py:175-195)."""
        if self.run_time_factor is None:
            return
        budget = n_steps * self.t_s / self.run_time_factor
        spent = self.metrics.chunk_wall[-1]
        if spent < budget:
            time.sleep(budget - spent)

    # ---- bookkeeping ----

    def reset(self):
        """Rewind to the initial state (reference Scenario.reset,
        scenario.py:226-229 -- here it restores the FULL state, not just
        counters)."""
        self.state = self.state0
        self.i = 0
        self.metrics = RuntimeMetrics()

    def checkpoint(self, path):
        save_checkpoint(path, self.state, extra={"i": self.i,
                                                 "t_s": self.t_s})

    def restore(self, path):
        self.state, meta = load_checkpoint(path, self.state)
        self.i = int(meta.get("i", 0))
        return meta
