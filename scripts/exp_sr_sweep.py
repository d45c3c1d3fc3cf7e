"""Sweep (sorted_resident, rebuild_every) per model at bench scale.

Motivation: the sorted-resident pathology is CHUNK-LENGTH dependent
(fine at k <= 5, ~2.7x loss at k = 20 for large step bodies), and the
table skin scales with the interval (2 * v_max * t_s * K), so SHORT
chunks buy back (a) the non-SR per-step sort (one [N, 16] gather + one
[N, 2] scatter) and (b) a tighter candidate table -- at the price of
more rebuilds. One variant per process (tunnel rules):

    python scripts/exp_sr_sweep.py --model invpendulum --sr 1 --rebuild 5
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="invpendulum",
                    choices=("bicycle2d", "twod", "invpendulum"))
    ap.add_argument("--sr", type=int, default=1)
    ap.add_argument("--rebuild", type=int, default=5)
    ap.add_argument("--kb", type=int, default=0)
    ap.add_argument("--steps", type=int, default=240)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/csf_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from bench import BLOCK, BLOCK_SRC, CUTOFF, KB, audit_overflow

    from __graft_entry__ import _build
    from cyclistsocialforce_tpu.engine import Engine, NeighborConfig
    from cyclistsocialforce_tpu.models import MODELS, prepare
    from cyclistsocialforce_tpu.params import (BicycleParams,
                                               InvPendulumBicycleParams)

    n = 100_000
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    hist = 8 if args.model == "bicycle2d" else 128
    _, state = _build(n, dtype=np.float32, density=0.02, hist_len=hist,
                      pad_to_block=BLOCK, model_name=args.model)
    cfg = NeighborConfig(cutoff=CUTOFF, block=BLOCK, kb=args.kb or KB,
                         block_src=BLOCK_SRC, rebuild_every=args.rebuild,
                         sub=0, screen=False,
                         backend="pallas" if on_tpu else "xla")
    if args.model == "invpendulum":
        params = InvPendulumBicycleParams.create(zoh_lut=4096)
    else:
        params = BicycleParams.create()
    model = MODELS[args.model]
    engine = Engine.create(params, model, neighbors=cfg,
                           sorted_resident=bool(args.sr))
    state = prepare(model, params, state)

    run = jax.jit(lambda e, s: e.simulate(s, args.steps, record=False)[0])

    def sync(out):
        jax.block_until_ready(out)
        return np.asarray(out.s[:4, :4])

    out0 = run(engine, state)
    sync(out0)
    pos1 = np.asarray(jax.device_get(out0.s))[:, :2]
    audit_overflow(pos1[:, 0], pos1[:, 1], cfg, "t=end")

    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        probe = sync(run(engine, state))
        dt = min(dt, time.perf_counter() - t0)
    assert np.all(np.isfinite(probe))
    print(f"{args.model} sr={args.sr} rebuild={args.rebuild} "
          f"kb={args.kb or KB}: {1e3 * dt / args.steps:.3f} ms/step "
          f"({n * args.steps / dt / 1e6:.2f}M agent-steps/s)")


if __name__ == "__main__":
    main()
