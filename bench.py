"""Headline benchmark: agent-steps/sec of the full social-force pipeline.

100,000 cyclists at heavy-bike-traffic density (0.02 agents/m^2, ~7 m mean
spacing over a 2.2 x 2.2 km area) advance through the COMPLETE pipeline --
destination force + navigation FSM, pairwise anisotropic repulsion with
FOV masking (block-sparse culled: cell sort + neighbor-block table +
Pallas tile kernel; 60 m cutoff bounds dropped forces below ~2e-4, the
field's parity tolerance scale), and bicycle dynamics -- under one jitted
lax.scan on the available accelerator. Prints ONE JSON line.

Baseline: the reference (chris-konrad/cyclistsocialforce) publishes no
benchmark numbers (BASELINE.md); its implied real-time requirement is a
step wall time <= t_s = 0.01 s (reference scenario.py:507-514), i.e.
100*N = 1e7 agent-steps/sec at N = 100k. `vs_baseline` is measured
throughput / 1e7 (>= 1 means 100k interacting cyclists simulate FASTER
than real time on one chip; the pure-Python reference is ~5 orders of
magnitude below this scale).
"""

import json
import time

import numpy as np


def main(n_agents=100_000, n_steps=60, density=0.02):
    import jax

    from __graft_entry__ import _build
    from cyclistsocialforce_tpu.engine import Engine, NeighborConfig
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BicycleParams

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    _, state = _build(n_agents, dtype=np.float32, density=density)
    engine = Engine.create(
        BicycleParams.create(), MODELS["bicycle2d"], rep_force="twod",
        neighbors=NeighborConfig(
            cutoff=60.0, block=256, kb=8,
            backend="pallas" if on_tpu else "xla", rebuild_every=20))

    run = jax.jit(lambda e, s: e.simulate(s, n_steps, record=False)[0])

    def sync(out):
        # block_until_ready is unreliable through the axon TPU tunnel --
        # force a (tiny) host transfer as the sync point.
        jax.block_until_ready(out)
        return np.asarray(out.s[:4, :4])

    out0 = run(engine, state)  # compile + warmup
    sync(out0)

    # capacity audit: the culled path drops farthest-first beyond kb --
    # assert the bench config is overflow-free at the start AND after the
    # measured horizon (silent force truncation would invalidate the run)
    import jax.numpy as jnp  # noqa: E402 (bench must not import conftest)

    ovf = jax.jit(lambda e, s: jnp.any(e.neighbor_cache(s)[3]))
    assert not bool(ovf(engine, state)), "neighbor table overflow at t=0"
    assert not bool(ovf(engine, out0)), "neighbor table overflow at t=end"

    # best-of-3: strips the remote-tunnel dispatch jitter (+-10% per run)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        probe = sync(run(engine, state))
        dt = min(dt, time.perf_counter() - t0)
    assert np.all(np.isfinite(probe)), f"non-finite state after run: {probe}"

    agent_steps_per_sec = n_agents * n_steps / dt
    realtime_target = 100.0 * n_agents  # t_s=0.01 -> 100 steps/s of N agents
    print(json.dumps({
        "metric": f"agent-steps/sec, N={n_agents} cyclists at "
                  f"{density}/m^2, full social-force pipeline "
                  f"(culled pairwise field, Pallas)",
        "value": round(agent_steps_per_sec, 1),
        "unit": "agent-steps/sec",
        "vs_baseline": round(agent_steps_per_sec / realtime_target, 3),
    }))


def main_with_retries(attempts=3):
    """The remote-TPU tunnel intermittently fails with transient ABORTED /
    INVALID_ARGUMENT backend errors (see CLAUDE.md); retry in-process."""
    for k in range(attempts):
        try:
            return main()
        except Exception as e:  # noqa: BLE001 - deliberate: retry flakes
            if k == attempts - 1:
                raise
            import sys
            import time as _t

            print(f"bench attempt {k + 1} failed "
                  f"({type(e).__name__}); retrying...", file=sys.stderr)
            _t.sleep(5)


if __name__ == "__main__":
    main_with_retries()
