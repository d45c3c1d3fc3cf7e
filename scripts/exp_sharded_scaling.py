"""Sharded culled-path scaling curve on a virtual CPU mesh.

Multi-chip hardware is unavailable in this environment; this measures the
SAME shard_map program XLA would run over ICI on 1/2/4/8 virtual CPU
devices (collectives included) to validate the scaling posture of the
culled sharded schedules. Absolute numbers are CPU numbers; the curve
shape (work / device) is the signal.

    python scripts/exp_sharded_scaling.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="run ONE config (with --comm) instead of the sweep")
    ap.add_argument("--comm", default="allgather")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    import jax.numpy as jnp  # noqa: F401

    from __graft_entry__ import _build
    from cyclistsocialforce_tpu.engine import Engine, NeighborConfig
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BicycleParams
    from cyclistsocialforce_tpu.parallel import (make_mesh, shard_state,
                                                 sharded_simulate_fn)

    n_agents, n_steps = 8_192, 10
    _, state = _build(n_agents, dtype=np.float32, density=0.02,
                      hist_len=8, pad_to_block=128)
    cfg = NeighborConfig(cutoff=50.0, block=64, kb=16, rebuild_every=5,
                         screen=False, backend="xla")
    engine = Engine.create(BicycleParams.create(), MODELS["bicycle2d"],
                           rep_force="twod", neighbors=cfg)

    # one (mesh, comm) per process: re-jitting over different sub-meshes
    # in one process trips an XLA buffer-count mismatch -- the sweep
    # therefore re-invokes this script once per config
    if not args.devices:
        import subprocess

        for d in (1, 2, 4, 8):
            for c in ("allgather", "ring"):
                r = subprocess.run(
                    [sys.executable, __file__, "--devices", str(d),
                     "--comm", c], capture_output=True, text=True,
                    timeout=900)
                out = [ln for ln in r.stdout.splitlines()
                       if ln.startswith("RESULT")]
                print(out[0] if out
                      else f"devices={d} comm={c} FAILED: "
                           f"{r.stderr.strip()[-200:]}")
        return

    for n_dev, comm in [(args.devices, args.comm)]:
        if True:
            mesh = make_mesh(n_dev)
            st = shard_state(state, mesh)
            run = sharded_simulate_fn(engine, mesh, n_steps,
                                      record=False, comm=comm)
            out, _ = run(st)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out, _ = run(st)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            asps = n_agents * n_steps / dt
            print(f"RESULT devices={n_dev} comm={comm}: "
                  f"{dt / n_steps * 1e3:.2f} ms/step, "
                  f"{asps/1e6:.2f}M agent-steps/s")


if __name__ == "__main__":
    main()
