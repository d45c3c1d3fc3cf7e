"""Round-3 experiment: stochastic gains-stage variants standalone.

The Ackermann-basis LUT (params.br_ackermann_lut) replaced the exact
per-agent placement (~2 ms/step at N = 100k) but the naive [N]-row
gather from the [4096, 6, 5] table measured ~4 ms SLOWER composed.
Time the candidates in isolation (scanned x200 to amortize tunnel
dispatch):

    python scripts/exp_acklut.py --variant exact|gather|flat|onehot

exact  : vmapped Ackermann placement (smallmat ops)
gather : tab[i0] on the [G, 6, 5] table (the shipped first cut)
flat   : gather on the [G, 30] flattened table, reshape after
onehot : coarse-grid piecewise-cubic table contracted via a one-hot
         [N, C] matmul (no gather at all)
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="gather")
    ap.add_argument("--agents", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--cells", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/csf_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:  # noqa: BLE001
        pass

    import jax.numpy as jnp

    from cyclistsocialforce_tpu.models import balancingrider as BR
    from cyclistsocialforce_tpu.ops.control import charpoly_from_pole_features
    from cyclistsocialforce_tpu.params import BalancingRiderParams

    n = args.agents
    dtype = jnp.float32
    ps = BalancingRiderParams.create(stochastic_control_behavior=True,
                                     gains_lut=4096, verbose=False)
    tab_np, v0, dv = ps.br_ackermann_lut
    G = tab_np.shape[0]
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(2.5, 9.5, n), dtype)
    feats = jnp.asarray(rng.uniform(0.5, 6.0, (n, 5)), dtype)
    tab = jnp.asarray(tab_np, dtype)
    A0, A1, A2, B, _ = BR._sysmats(ps, n, dtype)

    if args.variant == "exact":
        def gains(v, feats):
            return jax.vmap(BR._gains_at, in_axes=(None, 0, 0, 0, 0, 0, 0))(
                ps, A0, A1, A2, B, feats, v)
    elif args.variant == "gather":
        def gains(v, feats):
            t = jnp.clip((v - v0) / dv, 0.0, G - 1.0).astype(dtype)
            i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, G - 2)
            w = (t - i0.astype(dtype))[:, None, None]
            Mv = tab[i0] * (1.0 - w) + tab[i0 + 1] * w
            c = jax.vmap(charpoly_from_pole_features)(feats)
            return jnp.sum(c[:, :, None] * Mv, axis=1)
    elif args.variant == "flat":
        tabf = tab.reshape(G, 30)

        def gains(v, feats):
            t = jnp.clip((v - v0) / dv, 0.0, G - 1.0).astype(dtype)
            i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, G - 2)
            w = (t - i0.astype(dtype))[:, None]
            Mv = (tabf[i0] * (1.0 - w) + tabf[i0 + 1] * w).reshape(-1, 6, 5)
            c = jax.vmap(charpoly_from_pole_features)(feats)
            return jnp.sum(c[:, :, None] * Mv, axis=1)
    elif args.variant == "onehot":
        # piecewise-cubic in the local cell coordinate u in [0, 1]:
        # M(v) ~ sum_d u^d * C[cell, d]; coefficients from a least-squares
        # fit on the fine 4096-pt table restricted to each cell
        C = args.cells
        seg = G // C
        vs = np.arange(G) * float(dv) + float(v0)
        coef = np.zeros((C, 4, 30), np.float64)
        flat = tab_np.reshape(G, 30)
        for c_ in range(C):
            sl = slice(c_ * seg, min(G, (c_ + 1) * seg + 1))
            u = (np.arange(sl.stop - sl.start)) / seg
            V = np.vander(u, 4, increasing=True)
            coef[c_] = np.linalg.lstsq(V, flat[sl], rcond=None)[0]
        coefs = jnp.asarray(coef.reshape(C, 120), dtype)
        cell_dv = float(dv) * seg

        def gains(v, feats):
            t = jnp.clip((v - v0) / cell_dv, 0.0, C - 1e-6).astype(dtype)
            cell = jnp.floor(t).astype(jnp.int32)
            u = (t - cell.astype(dtype))
            oh = (cell[:, None] == jnp.arange(C)[None, :]).astype(dtype)
            Cd = (oh @ coefs).reshape(-1, 4, 30)
            up = jnp.stack([jnp.ones_like(u), u, u * u, u * u * u], 1)
            Mv = jnp.einsum("nd,ndk->nk", up, Cd).reshape(-1, 6, 5)
            c = jax.vmap(charpoly_from_pole_features)(feats)
            return jnp.sum(c[:, :, None] * Mv, axis=1)
    else:
        raise SystemExit(f"unknown variant {args.variant}")

    @jax.jit
    def run(v, feats):
        def body(carry, _):
            vv, ff = carry
            K = gains(vv, ff)
            # feed the output back so iterations can't be elided
            vv = vv + 1e-6 * K[:, 0]
            return (vv, ff), ()
        (vv, _), _ = jax.lax.scan(body, (v, feats), None, length=args.iters)
        return vv

    out = run(v, feats)
    jax.block_until_ready(out)
    _ = np.asarray(out[:4])
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(v, feats)
        jax.block_until_ready(out)
        _ = np.asarray(out[:4])
        dt = min(dt, time.perf_counter() - t0)
    ms = dt / args.iters * 1e3
    print(f"RESULT variant={args.variant} N={n} iters={args.iters}"
          f"{' cells=%d' % args.cells if args.variant == 'onehot' else ''}: "
          f"{ms:.3f} ms/iter")
    if args.variant == "onehot":
        # accuracy vs the fine-table linear interp on random speeds
        t = np.clip((np.asarray(v[:2000]) - v0) / dv, 0, G - 1.0)
        i0 = np.clip(np.floor(t).astype(int), 0, G - 2)
        w = (t - i0)[:, None]
        ref = flat[i0] * (1 - w) + flat[i0 + 1] * w
        got = np.asarray(
            jax.jit(gains)(v[:2000], feats[:2000]))
        refK = np.einsum(
            "nk,nkj->nj",
            np.asarray(jax.vmap(charpoly_from_pole_features)(feats[:2000])),
            ref.reshape(-1, 6, 5))
        rel = (np.abs(got - refK).max(axis=1)
               / (1e-30 + np.abs(refK).max(axis=1)))
        print(f"  onehot-vs-fine-linear rel err max {rel.max():.3e}")


if __name__ == "__main__":
    main()
