"""Locate the bicycle2d step-body cost (1.19 ms/step at bench scale with
the pair stage off) by progressively stripping stages.

Variants (one per process; the remote tunnel corrupts long same-process
program sequences):
  body     rep off, full body (== exp_headline_split --variant nopair)
  nofsm    rep off, dest force replaced by a zero stub (no queue update,
           no navigation FSM) -- model step + finish_step only
  kin      rep off, zero dest stub AND the model step reduced to the
           bicycle kinematics with constant commands (no PID, no arctan2)
  floor    rep off, identity model step -- scan + finish_step (freeze +
           ring write + counters) only

    python scripts/exp_bodyfloor.py --variant nofsm
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="body",
                    choices=("body", "nofsm", "kin", "floor"))
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/csf_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from __graft_entry__ import _build
    from cyclistsocialforce_tpu.engine import Engine
    from cyclistsocialforce_tpu.models import MODELS, bicycle2d
    from cyclistsocialforce_tpu.params import BicycleParams

    n = 100_000
    _, state = _build(n, dtype=np.float32, density=0.02, hist_len=8,
                      pad_to_block=128)

    def dest_zero(params, st):
        z = jnp.zeros((st.n,), st.s.dtype)
        return z, z, st

    def step_kin(params, st, fx, fy):
        a = jnp.zeros((st.n,), st.s.dtype)
        odelta = jnp.zeros((st.n,), st.s.dtype)
        return st.replace(s=bicycle2d.move(params, st.s, a, odelta))

    def step_id(params, st, fx, fy):
        return st

    kw = {}
    if args.variant == "body":
        model = MODELS["bicycle2d"]
    elif args.variant == "nofsm":
        model = MODELS["bicycle2d"]
        kw["dest_force"] = dest_zero
    elif args.variant == "kin":
        model = MODELS["bicycle2d"]
        kw["dest_force"] = dest_zero
    else:
        model = MODELS["bicycle2d"]
        kw["dest_force"] = dest_zero

    engine = Engine.create(BicycleParams.create(), model,
                           **kw).replace(rep_force=None)
    if args.variant == "kin":
        engine = engine.replace(model_step=step_kin)
    elif args.variant == "floor":
        engine = engine.replace(model_step=step_id)

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
    print(f"{args.variant}: {1e3 * dt / args.steps:.3f} ms/step")


if __name__ == "__main__":
    main()
