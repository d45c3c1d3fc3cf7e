"""Flagship row with the tabulated midpoint PROPAGATOR (prop_lut).

Times the balancingrider bench row with `prop_lut=4096` -- one flat
[G, 40] row gather + a broadcast 5x5 matvec per step instead of the
A(v) assembly + rank-1 gain closure + per-agent unrolled 5x5 solve
(models/balancingrider.py prop branch). Compare against the gains_lut
row printed by `python bench.py --heavy` (BASELINE.md flagship row).

    python scripts/exp_proplut.py [--steps 240] [--body-only]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--body-only", action="store_true",
                    help="rep_force=None: isolate the step body")
    ap.add_argument("--gains-lut", action="store_true",
                    help="run the gains_lut baseline instead")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/csf_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from bench import BLOCK, BLOCK_SRC, CUTOFF, KB, REBUILD
    from __graft_entry__ import _build
    from cyclistsocialforce_tpu.engine import Engine, NeighborConfig
    from cyclistsocialforce_tpu.models import MODELS, prepare
    from cyclistsocialforce_tpu.params import BalancingRiderParams

    n = 100_000
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    _, state = _build(n, dtype=np.float32, density=0.02, hist_len=8,
                      pad_to_block=BLOCK, model_name="balancingrider")
    cfg = NeighborConfig(
        cutoff=CUTOFF, block=BLOCK, kb=KB, rebuild_every=REBUILD,
        sub=0, screen=False, block_src=BLOCK_SRC,
        backend="pallas" if on_tpu else "xla")
    model = MODELS["balancingrider"]
    if args.gains_lut:
        params = BalancingRiderParams.create(gains_lut=4096, verbose=False)
        tag = "gains_lut"
    else:
        params = BalancingRiderParams.create(prop_lut=4096, verbose=False)
        tag = "prop_lut"
    kwargs = {}
    if args.body_only:
        kwargs["rep_force"] = None
    engine = Engine.create(params, model, neighbors=cfg, **kwargs)
    state = model.prepare(engine.params, state)

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
    assert np.all(np.isfinite(probe)), probe
    ms = dt / args.steps * 1e3
    print(f"{tag}{' body-only' if args.body_only else ''}: "
          f"{ms:.3f} ms/step, {n * args.steps / dt / 1e6:.2f}M "
          f"agent-steps/s")


if __name__ == "__main__":
    main()
