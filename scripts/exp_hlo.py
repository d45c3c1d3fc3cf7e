"""Compile the twod bench step and analyze the optimized HLO: op-category
histogram inside the scan body, biggest buffers, copy/transpose counts.
Compile-only (no device execution beyond compilation).

    python scripts/exp_hlo.py --rep on --backend pallas
"""

import argparse
import collections
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="twod")
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--rep", default="on")
    ap.add_argument("--agents", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--hist", type=int, default=128)
    ap.add_argument("--out", default=None, help="write full HLO text here")
    args = ap.parse_args()

    import jax

    from __graft_entry__ import _build
    from cyclistsocialforce_tpu.engine import Engine, NeighborConfig
    from cyclistsocialforce_tpu.models import MODELS, prepare
    from cyclistsocialforce_tpu.params import (BicycleParams,
                                               InvPendulumBicycleParams)

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    _, state = _build(args.agents, dtype=np.float32, density=0.02,
                      hist_len=args.hist, pad_to_block=128,
                      model_name=("balancingrider"
                                  if args.model == "stochastic"
                                  else args.model))
    cfg = NeighborConfig(cutoff=50.0, block=128, kb=14, rebuild_every=20,
                         screen=False,
                         backend=args.backend if on_tpu else "xla")
    sr = None
    if args.model == "invpendulum":
        params = InvPendulumBicycleParams.create(zoh_lut=4096)
    elif args.model == "stochastic":
        from cyclistsocialforce_tpu.params import BalancingRiderParams
        params = BalancingRiderParams.create(
            stochastic_control_behavior=True, resample_budget=2048,
            gains_lut=4096, verbose=False)
        args.model = "balancingrider"
        sr = True
    else:
        params = BicycleParams.create()
    model = MODELS[args.model]
    engine = Engine.create(params, model,
                           neighbors=None if args.rep == "off" else cfg,
                           **({} if sr is None else
                              {"sorted_resident": sr}))
    if args.rep == "off":
        engine = engine.replace(rep_force=None)
    state = prepare(model, params, state)

    fn = jax.jit(lambda e, s: e.simulate(s, args.steps, record=False)[0])
    lowered = fn.lower(engine, state)
    compiled = lowered.compile()
    txt = compiled.as_text()
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt)

    # ---- analysis ----
    mem = compiled.memory_analysis()
    print(f"== {args.model} rep={args.rep} backend={args.backend}")
    try:
        print(f"temp={mem.temp_size_in_bytes/1e6:.1f}MB "
              f"output={mem.output_size_in_bytes/1e6:.1f}MB "
              f"arg={mem.argument_size_in_bytes/1e6:.1f}MB")
    except Exception as e:  # noqa: BLE001
        print("memory_analysis unavailable:", e)

    ops = collections.Counter()
    big = []
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = (\w+)\[([\d,]*)", line)
        if not m:
            continue
        op_kind = None
        m2 = re.search(r"= [\w\[\]{},/ ]*? (\w+)\(", line)
        if m2:
            op_kind = m2.group(1)
        dims = m.group(2)
        size = 1
        for d in dims.split(","):
            if d:
                size *= int(d)
        if op_kind:
            ops[op_kind] += 1
            if size >= 2_000_000:
                big.append((size, op_kind, line.strip()[:140]))
    print("top op kinds:", ops.most_common(18))
    big.sort(reverse=True)
    print(f"{len(big)} ops with >=2M elements; top 15:")
    for size, kind, line in big[:15]:
        print(f"  {size/1e6:7.1f}M {kind:12s} {line[:120]}")
    n_fusion = ops.get("fusion", 0)
    print(f"fusions={n_fusion} copies={ops.get('copy', 0)} "
          f"transposes={ops.get('transpose', 0)} "
          f"custom_calls={ops.get('custom-call', 0)}")


if __name__ == "__main__":
    main()
