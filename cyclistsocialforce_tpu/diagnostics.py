"""Runtime diagnostics: NaN/divergence checking, profiling, determinism.

The reference's failure handling is print-and-raise inside the Python
loop (NaN trap vehicle.py:1180-1185; solver-failure RuntimeError
dynamics.py:696-698; FSM invariant print vehicle.py:416-425). Under jit
those become:

  - `checked_step` / `checked_simulate`: `jax.experimental.checkify`
    wrappers that turn non-finite states or forces inside the scanned
    step into retrievable errors with the failing step index;
  - `validate_state`: host-side invariant check of an AgentState
    (finiteness, FSM one-hot-ness, queue bounds) for debugging;
  - `trace`: a jax.profiler context producing a TensorBoard trace of the
    hot loop (replaces the reference's wall-clock `hist_run_time`-only
    observability, scenario.py:457-463).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify


def checked_step(engine):
    """Wrap one engine step with finiteness checks; returns a function
    (state) -> (error, state). `error.throw()` raises with the message."""

    def step(state):
        cache = None
        if engine.neighbors is not None:
            cache = engine.neighbor_cache(state)
            checkify.check(
                ~jnp.any(cache[3]),
                "neighbor-block table overflow: more source blocks within "
                "the cutoff than kb -- farthest blocks dropped, forces "
                "truncated; raise NeighborConfig.kb")
        fx, fy, st = engine.calc_forces(state, cache)
        checkify.check(jnp.all(jnp.isfinite(fx) & jnp.isfinite(fy)),
                       "non-finite social force")
        new = engine.model_step(engine.params, st, fx, fy)
        checkify.check(jnp.all(jnp.isfinite(new.s)),
                       "non-finite state after dynamics step")
        return engine.finish_step(state, new)

    return checkify.checkify(step)


def checked_simulate(engine, n_steps: int):
    """Scanned simulation with per-step finiteness checks; returns
    (state) -> (error, (final_state, traj)). The error reports the FIRST
    failing step index."""

    def step(state, i):
        cache = None
        if engine.neighbors is not None:
            cache = engine.neighbor_cache(state)
            checkify.check(
                ~jnp.any(cache[3]),
                "neighbor-block table overflow at step {i}: forces "
                "truncated; raise NeighborConfig.kb", i=i)
        fx, fy, st = engine.calc_forces(state, cache)
        ok = jnp.all(jnp.isfinite(fx) & jnp.isfinite(fy))
        checkify.check(ok, "non-finite social force at step {i}", i=i)
        new = engine.model_step(engine.params, st, fx, fy)
        checkify.check(jnp.all(jnp.isfinite(new.s)),
                       "non-finite state at step {i}", i=i)
        return engine.finish_step(state, new), new.s

    def run(state):
        return jax.lax.scan(step, state, jnp.arange(n_steps))

    return checkify.checkify(run)


def validate_state(state) -> list:
    """Host-side invariant scan; returns a list of violation strings."""
    problems = []
    s = np.asarray(state.s)
    if not np.all(np.isfinite(s)):
        bad = np.where(~np.isfinite(s).all(axis=1))[0]
        problems.append(f"non-finite state rows: {bad[:10].tolist()}")
    znav = np.asarray(state.znav)
    multi = znav.sum(axis=1) > 1
    if np.any(multi & np.asarray(state.active)):
        # the reference prints exactly this invariant violation
        # (vehicle.py:416-425)
        problems.append(
            f"navigation FSM in multiple states: rows "
            f"{np.where(multi)[0][:10].tolist()}")
    ptr = np.asarray(state.destpointer)
    nq = np.asarray(state.nq)
    if np.any(ptr > nq):
        problems.append("destination pointer beyond queue length")
    if np.any(nq > state.queue_size):
        problems.append("queue length beyond capacity")
    return problems


@contextlib.contextmanager
def trace(logdir="/tmp/csf-tpu-trace"):
    """Profile a block of device work: `with trace(): run(...)` then
    inspect with TensorBoard / xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
