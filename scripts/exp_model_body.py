"""Body-only (rep_force=None) step cost for the non-bicycle2d bench rows.

Quantifies how much of a model row's step time is its BODY (dest force
+ dynamics + finish) vs the shared pair stage + data movement, at the
exact bench configuration. One variant per process (tunnel rules):

    python scripts/exp_model_body.py --row invpendulum [--full]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--row", default="invpendulum",
                    choices=("twod", "invpendulum", "stochastic",
                             "balancingrider"))
    ap.add_argument("--full", action="store_true",
                    help="keep the pair stage (the full bench row)")
    ap.add_argument("--gains", default="lut",
                    choices=("lut", "fixed", "exact", "poly", "proppoly"),
                    help="balancingrider gain source (ablate the LUT "
                         "gather: 'fixed' = constant K, no gather)")
    ap.add_argument("--zoh", default="lut", choices=("lut", "poly", "exact"),
                    help="invpendulum ZOH propagator source")
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--sr", default="default", choices=("default", "on",
                                                        "off"),
                    help="override the row's sorted_resident setting")
    ap.add_argument("--rebuild-mode", default="chunked",
                    choices=("chunked", "flat"))
    ap.add_argument("--budget", type=int, default=2048,
                    help="stochastic resample budget")
    ap.add_argument("--every", type=int, default=1,
                    help="stochastic resample cadence (steps)")
    ap.add_argument("--thresh", type=float, default=None,
                    help="stochastic resampling speed threshold")
    ap.add_argument("--rebuild-every", type=int, default=0,
                    help="override the bench rebuild_every (0 = keep)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/csf_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from bench import BLOCK, BLOCK_SRC, CUTOFF, KB, REBUILD
    from __graft_entry__ import _build
    from cyclistsocialforce_tpu.engine import Engine, NeighborConfig
    from cyclistsocialforce_tpu.models import MODELS, prepare
    from cyclistsocialforce_tpu.params import (BalancingRiderParams,
                                               BicycleParams,
                                               InvPendulumBicycleParams)

    n = 100_000
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    hist = 8 if args.row in ("stochastic", "balancingrider") else 128
    model_name = ("balancingrider"
                  if args.row in ("stochastic", "flagship", "balancingrider")
                  else args.row)
    _, state = _build(n, dtype=np.float32, density=0.02, hist_len=hist,
                      pad_to_block=BLOCK, model_name=model_name)
    cfg = NeighborConfig(
        cutoff=CUTOFF, block=BLOCK, kb=KB,
        rebuild_every=args.rebuild_every or REBUILD,
        rebuild_mode=args.rebuild_mode,
        sub=0, screen=False, block_src=BLOCK_SRC,
        backend="pallas" if on_tpu else "xla")
    if args.row == "twod":
        params, model, sr = BicycleParams.create(), MODELS["twod"], True
    elif args.row == "invpendulum":
        zkw = {"lut": dict(zoh_lut=4096), "poly": dict(zoh_poly=32),
               "exact": {}}[args.zoh]
        params = InvPendulumBicycleParams.create(**zkw)
        model, sr = MODELS["invpendulum"], False
    elif args.row == "balancingrider":
        gkw = {"lut": dict(gains_lut=4096),
               "fixed": dict(gains=[-13.14, 1.10, -6.69, -0.11, -11.38]),
               "poly": dict(gains_poly=16),
               "proppoly": dict(prop_poly=16),
               "exact": {}}[args.gains]
        params = BalancingRiderParams.create(verbose=False, **gkw)
        model, sr = MODELS["balancingrider"], True
    else:
        gkw = {"lut": dict(gains_lut=4096), "poly": dict(gains_poly=16),
               "fixed": {}, "exact": {}}[args.gains]
        if args.thresh is not None:
            gkw["controlparam_resampling_speedthresh"] = args.thresh
        params = BalancingRiderParams.create(
            stochastic_control_behavior=True,
            resample_budget=args.budget,
            resample_every=args.every, verbose=False, **gkw)
        model, sr = MODELS["balancingrider"], True
    if args.sr != "default":
        sr = args.sr == "on"
    engine = Engine.create(params, model,
                           neighbors=cfg if args.full else None,
                           sorted_resident=sr)
    if not args.full:
        engine = engine.replace(rep_force=None)
    state = prepare(model, params, state)

    run = jax.jit(lambda e, s: e.simulate(s, args.steps,
                                          record=False)[0])

    def sync(out):
        jax.block_until_ready(out)
        return np.asarray(out.s[:4, :4])

    sync(run(engine, state))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        probe = sync(run(engine, state))
        dt = min(dt, time.perf_counter() - t0)
    assert np.all(np.isfinite(probe)), probe
    tag = "full" if args.full else "body-only"
    print(f"{args.row} {tag} (gains={args.gains} zoh={args.zoh} "
          f"sr={sr}): {1e3 * dt / args.steps:.3f} ms/step = "
          f"{n * args.steps / dt / 1e6:.2f}M agent-steps/s")


if __name__ == "__main__":
    main()
