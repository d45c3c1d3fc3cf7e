"""Headline benchmark: agent-steps/sec of the full social-force pipeline.

Runs the flagship engine (destination force + navigation FSM, O(N^2)
pairwise repulsive force field with FOV masking, bicycle dynamics) at
N = 100k agents for a jitted lax.scan of simulation steps on the available
accelerator, and prints ONE JSON line.

Baseline: the reference (chris-konrad/cyclistsocialforce) publishes no
benchmark numbers (BASELINE.md); its implied real-time requirement is a
step wall time <= t_s = 0.01 s (reference scenario.py:507-514), i.e.
100*N = 1e7 agent-steps/sec at N = 100k. `vs_baseline` is measured
throughput / 1e7 (>= 1 means the TPU framework simulates 100k cyclists
faster than real time; the pure-Python reference is ~5 orders of magnitude
below that at this scale).
"""

import json
import time

import numpy as np


def main(n_agents=100_000, n_steps=20, rep_chunk=1000):
    import jax

    from __graft_entry__ import _build

    engine, state = _build(n_agents, dtype=np.float32, rep_chunk=rep_chunk)

    run = jax.jit(lambda e, s: e.simulate(s, n_steps, record=False)[0])

    def sync(out):
        # block_until_ready is unreliable through the axon TPU tunnel --
        # force a (tiny) host transfer as the sync point.
        jax.block_until_ready(out)
        return np.asarray(out.s[0, :2])

    sync(run(engine, state))  # compile + warmup

    t0 = time.perf_counter()
    probe = sync(run(engine, state))
    dt = time.perf_counter() - t0
    assert np.all(np.isfinite(probe)), f"non-finite state after run: {probe}"

    agent_steps_per_sec = n_agents * n_steps / dt
    realtime_target = 100.0 * n_agents  # t_s=0.01 -> 100 steps/s of N agents
    print(json.dumps({
        "metric": f"agent-steps/sec, N={n_agents} cyclists, full "
                  f"O(N^2) social-force pipeline",
        "value": round(agent_steps_per_sec, 1),
        "unit": "agent-steps/sec",
        "vs_baseline": round(agent_steps_per_sec / realtime_target, 3),
    }))


if __name__ == "__main__":
    main()
