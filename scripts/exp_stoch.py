"""Round-3 experiment: stochastic flagship (balancingrider) at bench
scale, with/without the compacted resampling budget.

    python scripts/exp_stoch.py --budget 2048
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=0)
    ap.add_argument("--gains-lut", type=int, default=0,
                    help="deterministic: K(v) table; stochastic: "
                         "Ackermann coefficient-basis table M(v)")
    ap.add_argument("--agents", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--density", type=float, default=0.02)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-sr", action="store_true")
    ap.add_argument("--deterministic", action="store_true",
                    help="deterministic flagship (gains_lut) instead of "
                         "stochastic")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/csf_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass

    from __graft_entry__ import _build
    from cyclistsocialforce_tpu.engine import Engine, NeighborConfig
    from cyclistsocialforce_tpu.models import MODELS
    from cyclistsocialforce_tpu.params import BalancingRiderParams

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    _, state = _build(args.agents, dtype=np.float32, density=args.density,
                      model_name="balancingrider", hist_len=8, pad_to_block=128)
    cfg = NeighborConfig(
        cutoff=50.0, block=128, kb=14, rebuild_every=20, screen=False,
        backend="pallas" if on_tpu else "xla")
    model = MODELS["balancingrider"]
    if args.deterministic:
        params = BalancingRiderParams.create(
            gains_lut=args.gains_lut or 4096, verbose=False)
    else:
        params = BalancingRiderParams.create(
            stochastic_control_behavior=True,
            resample_budget=args.budget, gains_lut=args.gains_lut,
            verbose=False)
    engine = Engine.create(params, model, neighbors=cfg,
                           sorted_resident=not args.no_sr)
    state = model.prepare(engine.params, state)

    run = jax.jit(lambda e, s: e.simulate(s, args.steps, record=False)[0])

    def sync(out):
        jax.block_until_ready(out)
        return np.asarray(out.s[:4, :4])

    t0 = time.perf_counter()
    sync(run(engine, state))
    t_compile = time.perf_counter() - t0
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        probe = sync(run(engine, state))
        dt = min(dt, time.perf_counter() - t0)
    assert np.all(np.isfinite(probe)), probe
    ms = dt / args.steps * 1e3
    asps = args.agents * args.steps / dt
    print(f"RESULT {'det' if args.deterministic else 'stochastic'} "
          f"budget={args.budget} sr={not args.no_sr} "
          f"N={args.agents} steps={args.steps}: {ms:.2f} ms/step, "
          f"{asps/1e6:.2f}M agent-steps/s (compile {t_compile:.0f}s)")


if __name__ == "__main__":
    main()
