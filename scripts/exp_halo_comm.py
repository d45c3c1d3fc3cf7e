"""Per-step collective traffic of the sharded culled schedules.

Compiles each comm schedule over an 8-virtual-device CPU mesh and sums
the STATIC byte volume of every collective (all-gather /
collective-permute / all-reduce) occurrence in the optimized HLO; the
analytic section below scales by the actual loop trip counts. Virtual
CPU devices share cores so WALL CLOCK cannot show a speedup -- the
collective BYTE VOLUME is the device-count- and hardware-independent
quantity the halo schedule improves:

    allgather: one [N, 16] source all-gather EVERY step
    ring:      D hops of [N/D, 16] ppermute per step (same total bytes)
    halo:      one packed [K, N] all-gather per REBUILD (amortized /k)
               + 2 * halo * block_src * 16 ppermute rows per step

    python scripts/exp_halo_comm.py [--n 8192] [--steps 8]
"""

import argparse
import re
import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

DT = {"f64": 8, "f32": 4, "s32": 4, "u32": 4, "pred": 1, "s8": 1}


def collective_bytes(hlo: str):
    """Sum output-shape bytes of every collective op occurrence in the
    optimized HLO (STATIC footprint -- in-loop ops are counted once, not
    per trip; the analytic per-step section below is the trip-scaled
    ground truth). Handles both plain `f64[...]` outputs and the tuple
    outputs XLA's collective combiner emits for merged variadic
    gathers (`(f64[...], s32[...]) all-gather`)."""
    out = {}
    for line in hlo.splitlines():
        m = re.search(r"= ([^=]*?)(all-gather|collective-permute|"
                      r"all-reduce)\(", line)
        if not m:
            continue
        kind = m.group(2)
        tot = 0
        for dtype, dims in re.findall(r"(\w+)\[([\d,]*)\]", m.group(1)):
            elems = int(np.prod([int(d) for d in dims.split(",") if d])
                        if dims else 1)
            tot += elems * DT.get(dtype, 4)
        if tot:
            out.setdefault(kind, []).append(tot)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--rebuild", type=int, default=4,
                    help="rebuild interval k (production uses 20; the "
                         "halo schedule's packed reshard amortizes /k)")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo/tests")
    from test_sharding import _setup_halo

    from cyclistsocialforce_tpu.parallel import (
        make_mesh, required_halo, shard_state, sharded_simulate_fn)

    eng, st = _setup_halo(args.n, kb=64, rebuild_every=args.rebuild)
    mesh = make_mesh()
    sh = shard_state(st, mesh)
    k = eng.neighbors.rebuild_every

    print(f"N={args.n}, D=8, steps={args.steps}, rebuild_every={k}")
    for comm in ("allgather", "ring", "halo"):
        kw = {}
        if comm == "halo":
            kw["halo"] = required_halo(eng, st, 8) + 1
        run = sharded_simulate_fn(eng, mesh, args.steps, record=False,
                                  comm=comm, **kw)
        hlo = run.lower(sh).compile().as_text()
        per = collective_bytes(hlo)
        tot = sum(sum(v) for v in per.values())
        detail = ", ".join(f"{kk}: {len(vv)} ops / {sum(vv)/2**20:.2f} MiB"
                           for kk, vv in sorted(per.items()))
        print(f"  {comm:10s} static collective footprint: "
              f"{tot / 2**20:.2f} MiB ({detail})"
              + (f" [halo={kw.get('halo')}]" if comm == "halo" else ""))

    # analytic per-step bytes (ground truth independent of HLO parsing)
    n, d = args.n, 8
    f = 8  # f64
    ag = n * 16 * f
    h = required_halo(eng, st, 8) + 1
    bs = eng.neighbors.block_src
    # packed state columns: read K from the state layout
    from cyclistsocialforce_tpu.engine import pack_state_rows
    pT, ipT = pack_state_rows(st)
    kf = pT.shape[0]
    ki = 0 if ipT is None else ipT.shape[0]
    halo_step = 2 * h * bs * 16 * f
    # float pack + separate int32 pack + x/y gathers + int32 ident carry
    halo_rebuild = (kf + 2) * n * f + ki * n * 4 + n * 4
    print(f"\nanalytic per-step source-exchange bytes (f64):")
    print(f"  allgather/ring: {ag / 2**20:.3f} MiB/step")
    print(f"  halo:           {halo_step / 2**20:.3f} MiB/step "
          f"+ {halo_rebuild / 2**20:.3f} MiB per rebuild "
          f"(/{k} steps = {halo_rebuild / k / 2**20:.3f} MiB/step "
          f"amortized)")
    ratio = ag / (halo_step + halo_rebuild / k)
    print(f"  per-step reduction: {ratio:.1f}x at N={n}, D=8, halo={h}")


if __name__ == "__main__":
    main()
