"""Dump the Mosaic MLIR of the pair kernel and histogram its vector ops.

The pair tile is VPU-issue-bound (BASELINE.md: measured ~165 issue
slots/pair vs ~110 hand-counted full-tile ops). This script lowers the
shipped kernel for the TPU backend with `pallas_call(debug=True)` (which
prints the Mosaic module during lowering -- no execution), then counts
the [block_src, block]-shaped vector ops, the [block_src, 1] column ops,
and the broadcast/select/relayout traffic, to locate the extra slots.

    python scripts/exp_mosaic_dump.py [--out /tmp/mosaic.mlir]
"""

import argparse
import collections
import contextlib
import io
import re
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/mosaic.mlir")
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--block_src", type=int, default=64)
    ap.add_argument("--kb", type=int, default=19)
    ap.add_argument("--uniform", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as real_pl

    from cyclistsocialforce_tpu.ops import pallas_forces as PF

    # inject debug=True into the kernel's pallas_call
    orig = real_pl.pallas_call

    def debug_call(*a, **kw):
        kw["debug"] = True
        return orig(*a, **kw)

    PF.pl.pallas_call = debug_call

    b, bs, kb = args.block, args.block_src, args.kb
    n = b * 8
    nbr = jnp.zeros((8, kb), jnp.int32)
    valid = jnp.ones((8, kb), bool)
    src = jnp.zeros((n, PF.SRC_COLS), jnp.float32)
    recv = jnp.zeros((PF.RECV_ROWS, n), jnp.float32)

    uni = ((0.9, 0.3, 5.0, 2.0, 2.0, 1.0, 0.0) if args.uniform
           else None)
    fn = lambda nbr, valid, src, recv: PF.pair_forces_neighbors(
        nbr, valid, src, recv, block=b, block_src=bs,
        cutoff=50.0, screen=False, fov=True, uniform=uni)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        jax.jit(fn).lower(nbr, valid, src, recv)
    text = buf.getvalue()
    with open(args.out, "w") as f:
        f.write(text)
    print(f"wrote {len(text)} chars to {args.out}")

    # histogram ops by (op name, result vector shape)
    pat = re.compile(r"= \"?([\w.]+)\"?\(.*?-> .*?(vector<[\dx]+x\w+>|\w+)$")
    hist = collections.Counter()
    for line in text.splitlines():
        line = line.strip()
        m = re.search(r"= \"?([a-z]+\.[\w.]+)\"?[ (]", line)
        if not m:
            continue
        op = m.group(1)
        shapes = re.findall(r"vector<([\dx]+)x(?:f32|i32|i1|i8)>", line)
        shape = shapes[-1] if shapes else "scalar"
        hist[(op, shape)] += 1
    full = f"{bs}x{b}"
    tot_full = 0
    print("\n== op histogram (count, op, result shape) ==")
    for (op, shape), c in sorted(hist.items(), key=lambda kv: -kv[1]):
        mark = " <-- FULL TILE" if shape == full else ""
        if shape == full:
            tot_full += c
        print(f"{c:5d}  {op:28s} {shape}{mark}")
    print(f"\nfull-tile [{full}] ops total: {tot_full}")


if __name__ == "__main__":
    main()
