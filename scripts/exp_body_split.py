"""Bisect the BODY-ONLY (rep_force=None) step cost at bench scale.

The headline stage split (exp_headline_split.py) measured the nopair
variant at 1.19 ms/step -- far above any issue/bandwidth floor for
bicycle2d's ~60 elementwise ops. This script strips the body stage by
stage to locate the cost (one variant per process -- tunnel rules):

  body     dest force + model step + finish_step   (== nopair)
  nodest   zero dest force; model step + finish_step
  nomodel  dest force; identity model step + finish_step
  bare     zero dest force + identity model step    -> finish_step + scan

    python scripts/exp_body_split.py --variant body
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="body",
                    choices=("body", "nodest", "nomodel", "bare"))
    ap.add_argument("--steps", type=int, default=240)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/csf_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from __graft_entry__ import _build
    from bench import BLOCK
    from cyclistsocialforce_tpu.engine import Engine
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BicycleParams

    n = 100_000
    _, state = _build(n, dtype=np.float32, density=0.02, hist_len=8,
                      pad_to_block=BLOCK)
    engine = Engine.create(BicycleParams.create(), MODELS["bicycle2d"]
                           ).replace(rep_force=None)

    def zero_dest(params, st):
        z = jnp.zeros(st.n, st.s.dtype)
        return z, z, st

    def identity_step(params, st, fx, fy):
        return st

    if args.variant in ("nodest", "bare"):
        engine = engine.replace(dest_force=zero_dest)
    if args.variant in ("nomodel", "bare"):
        engine = engine.replace(model_step=identity_step)

    run = jax.jit(lambda e, s: e.simulate(s, args.steps, record=False)[0])

    def sync(out):
        jax.block_until_ready(out)
        return np.asarray(out.s[:4, :4])

    sync(run(engine, state))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        probe = sync(run(engine, state))
        dt = min(dt, time.perf_counter() - t0)
    assert np.all(np.isfinite(probe))
    print(f"{args.variant}: {1e3 * dt / args.steps:.3f} ms/step "
          f"({n * args.steps / dt / 1e6:.2f}M agent-steps/s)")


if __name__ == "__main__":
    main()
