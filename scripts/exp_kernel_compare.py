"""Time the pair kernels STANDALONE at the bench distribution, amortized.

The headline's pair stage did not speed up when the tile lost ~11% of
its Mosaic vector ops (112 -> 100, scripts/exp_mosaic_dump.py), which
suggests the grid kernel is bound by PER-GRID-STEP pipeline overhead
(782 x kb ~ 15k grid steps/call), not tile issue slots. This compares:

  grid64/32/16   pair_forces_neighbors   (grid = [B, KB])
  unr64/32/16    pair_forces_neighbors_unrolled (grid = [B]; manual
                 up-front DMA pipeline, statically unrolled KB loop)

Each timed region is a 200-iteration lax.scan whose input depends on the
previous output through a runtime-zero epsilon (XLA cannot hoist the
pure call out of the loop), so the ~58 ms tunnel dispatch amortizes out.
ONE VARIANT PER PROCESS (the tunnel corrupts repeated program sequences):

    python scripts/exp_kernel_compare.py --variant unr --src 32
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="grid", choices=("grid", "unr"))
    ap.add_argument("--src", type=int, default=64)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--kb", type=int, default=0,
                    help="override the kb capacity (e.g. inflate it to "
                         "measure the per-SENTINEL-step cost directly)")
    ap.add_argument("--uniform", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/csf_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from cyclistsocialforce_tpu.ops import neighbors as NB
    from cyclistsocialforce_tpu.ops import pallas_forces as PF

    BLOCK, CUTOFF = 128, 50.0
    # audited kb capacities per source granularity (exp_asym_blocks:
    # max in-range 11/17/29/55 for src 128/64/32/16, +2 margin)
    KB = args.kb or {128: 13, 64: 19, 32: 31, 16: 57}[args.src]

    rng = np.random.default_rng(0)
    n_pad = ((args.n + BLOCK - 1) // BLOCK) * BLOCK - args.n
    n = args.n + n_pad
    side = 0.5 * float(np.sqrt(args.n / 0.02))
    x = jnp.asarray(rng.uniform(-side, side, n), jnp.float32)
    y = jnp.asarray(rng.uniform(-side, side, n), jnp.float32)
    psi = rng.uniform(-np.pi, np.pi, n)

    perm, nbr, valid, overflow = jax.jit(
        lambda x, y: NB.build(x, y, CUTOFF + 4.0, BLOCK, KB,
                              block_src=args.src))(x, y)
    print(f"overflow blocks: {int(np.asarray(jnp.sum(overflow)))} "
          f"(kb={KB}, src={args.src})")

    # bench-like src/recv packs (bicycle2d twod field params)
    src = np.zeros((n, PF.SRC_COLS), np.float32)
    xs = np.asarray(x)[np.asarray(perm)]
    ys = np.asarray(y)[np.asarray(perm)]
    ps = psi[np.asarray(perm)]
    src[:, PF._SX] = xs
    src[:, PF._SY] = ys
    src[:, PF._SC] = np.cos(ps)
    src[:, PF._SS] = np.sin(ps)
    src[:, PF._F0] = 3.0
    src[:, PF._E0] = 0.9
    src[:, PF._E1] = 0.3
    src[:, PF._S0] = 5.0
    src[:, PF._S1] = 2.0
    src[:, PF._S2] = 2.0
    src[:, PF._S3] = 1.0
    src[:, PF._CHF] = np.cos(0.5 * np.pi)
    src[:, PF._SACT] = 1.0
    recv = np.zeros((PF.RECV_ROWS, n), np.float32)
    recv[0] = xs
    recv[1] = ys
    recv[2] = np.cos(ps)
    recv[3] = np.sin(ps)
    recv[4] = 1.0
    src = jnp.asarray(src)
    recv = jnp.asarray(recv)

    uni = ((0.9, 0.3, 5.0, 2.0, 2.0, 1.0, 0.0) if args.uniform
           else None)
    if args.variant == "grid":
        call = lambda s: PF.pair_forces_neighbors(
            nbr, valid, s, recv, block=BLOCK, cutoff=CUTOFF,
            screen=False, fov=True, block_src=args.src, uniform=uni)
    else:
        call = lambda s: PF.pair_forces_neighbors_unrolled(
            nbr, valid, s, recv, block=BLOCK, fov=True,
            block_src=args.src, uniform=uni)

    def scan_fn(src, eps):
        def body(carry, _):
            out = call(src + eps * carry[0, 0])
            return out, ()
        out, _ = jax.lax.scan(body, jnp.zeros((2, n), jnp.float32),
                              None, length=args.iters)
        return out

    fn = jax.jit(scan_fn)
    eps = jnp.float32(0.0)           # runtime zero: defeats hoisting
    out = fn(src, eps)
    np.asarray(out[:, :2])           # tunnel-safe sync
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = fn(src, eps)
        np.asarray(o[:, :2])
        dt = min(dt, time.perf_counter() - t0)
    per = dt / args.iters
    print(f"{args.variant} src={args.src} kb={KB}: "
          f"{1e3 * per:.3f} ms/call ({args.iters} iters)")


if __name__ == "__main__":
    main()
