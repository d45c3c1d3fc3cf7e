"""Multi-chip sharding demo: one crowd over a device mesh.

Shows the `cyclistsocialforce_tpu.parallel` surface end-to-end: build a
culled engine, shard the population over every available device
(`--devices` virtual CPU devices when no multi-chip hardware is
present), run the halo-exchange schedule, and verify the result against
the single-device run. The same code runs unchanged on a real TPU pod
slice — the mesh just contains real chips. No reference counterpart
(the reference is single-threaded Python; SURVEY.md section 2.9).

    python demos/demo_sharded.py --agents 4096 --devices 8 --steps 40
"""

import os
import sys

# runnable as `python demos/<name>.py` from anywhere: put the repo
# root (the package + __graft_entry__) on the path
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--agents", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual CPU device count (ignored when real "
                         "multi-chip hardware is attached)")
    ap.add_argument("--comm", default="halo",
                    choices=["allgather", "ring", "halo"])
    ap.add_argument("--density", type=float, default=0.02)
    ap.add_argument("--skip-check", action="store_true",
                    help="skip the single-device equivalence check")
    args = ap.parse_args()

    import jax

    # decide the platform WITHOUT initializing a backend
    # (jax_num_cpu_devices must be set before first device use)
    want_cpu = (os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
                or (jax.config.jax_platforms or "").startswith("cpu"))
    if want_cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)
    jax.config.update("jax_enable_x64", True)

    from __graft_entry__ import _build
    from cyclistsocialforce_tpu.engine import Engine, NeighborConfig
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BicycleParams
    from cyclistsocialforce_tpu.parallel import (
        make_mesh, required_halo, shard_state, sharded_simulate_fn)

    n_dev = len(jax.devices())
    n = (args.agents // (16 * n_dev)) * 16 * n_dev  # divisible shards
    print(f"{n} agents over {n_dev} {jax.devices()[0].platform} devices, "
          f"comm={args.comm}")

    _, state = _build(n, dtype=np.float64, density=args.density,
                      hist_len=16)
    eng = Engine.create(
        BicycleParams.create(), MODELS["bicycle2d"], rep_force="twod",
        neighbors=NeighborConfig(cutoff=30.0, block=16, kb=64,
                                 backend="xla", rebuild_every=4))

    kw = {}
    if args.comm == "halo":
        h = required_halo(eng, state, n_dev) + 1
        strip_blocks = n // n_dev // 16
        if h >= strip_blocks:
            # tiny populations: each strip spans too few cell columns
            # for a boundary exchange to make sense -- use the O(N)
            # gather schedule instead (the halo win is a large-N effect)
            print(f"halo window ({h} blocks) would cover a whole "
                  f"{strip_blocks}-block strip at this scale; using "
                  f"comm='allgather' (try --agents 4096+)")
            args.comm = "allgather"
        else:
            print(f"halo window: {h} source blocks/side of a "
                  f"{strip_blocks}-block strip "
                  f"(sized by parallel.required_halo)")
            kw = dict(halo=h)
    mesh = make_mesh()
    run = sharded_simulate_fn(eng, mesh, args.steps, record=False,
                              comm=args.comm, **kw)

    t0 = time.perf_counter()
    out = run(shard_state(state, mesh))
    final = out[0]
    jax.block_until_ready(final)
    dt = time.perf_counter() - t0
    if args.comm == "halo":
        assert not bool(out[1]), "halo window overflowed -- grow halo"
    print(f"sharded run: {args.steps} steps in {dt:.2f}s "
          f"(incl. compile)")

    if not args.skip_check:
        ref, _ = jax.jit(lambda e, s: e.simulate(s, args.steps,
                                                 record=False))(eng, state)
        err = float(np.max(np.abs(np.asarray(final.s)
                                  - np.asarray(ref.s))))
        print(f"max |sharded - single-device| = {err:.3e}")
        if args.comm == "halo":
            # the halo schedule reproduces the single-device culled run
            # bit-exactly (same global sort, same table, same tile sums)
            assert err < 1e-9, err
            print("sharded run matches the single-device run bit-exactly")
        else:
            # allgather/ring build their tables from per-device local
            # sorts: the admitted fringe tiles differ from the
            # single-device partition, so the two runs are equally valid
            # culled approximations that drift apart by the dropped-force
            # tail -- bounded, not bit-equal (tests/test_sharding pins
            # this at 2e-5/step-ish; see the halo schedule for exactness)
            pos_err = float(np.max(np.abs(
                np.asarray(final.s)[:, :2] - np.asarray(ref.s)[:, :2])))
            assert pos_err < 0.05 * args.steps, pos_err
            print("sharded run tracks the single-device run within the "
                  "culled-truncation bound")


if __name__ == "__main__":
    main()
