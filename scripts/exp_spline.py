"""Round-3 experiment harness: spline-family (twod/invpendulum) perf at
bench scale. One experiment per process (the remote-TPU tunnel corrupts
repeated program sequences in one process).

    python scripts/exp_spline.py --model twod --backend pallas
    python scripts/exp_spline.py --model invpendulum --dest straight

Prints one line: model, config, ms/step, agent-steps/s.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="twod")
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--dest", default=None,
                    help="override dest force (straight = stub the spline)")
    ap.add_argument("--agents", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--density", type=float, default=0.02)
    ap.add_argument("--hist", type=int, default=128)
    ap.add_argument("--rep", default="on", choices=["on", "off"],
                    help="off = no pairwise stage at all")
    ap.add_argument("--zoh-lut", type=int, default=0,
                    help="invpendulum: tabulated ZOH propagator size")
    ap.add_argument("--rebuild", type=int, default=20)
    ap.add_argument("--mode", default="chunked",
                    choices=["chunked", "flat"])
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--kb", type=int, default=14)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--audit", action="store_true",
                    help="assert the neighbor table is overflow-free at "
                         "t=0 and t=end (bench.audit_overflow)")
    ap.add_argument("--no-sr", action="store_true",
                    help="disable the sorted-resident fast path "
                         "(Engine.create(sorted_resident=False)) while "
                         "keeping the nested rebuild-chunk scan")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _build
    from cyclistsocialforce_tpu.engine import Engine, NeighborConfig
    from cyclistsocialforce_tpu.models import MODELS, prepare
    from cyclistsocialforce_tpu.params import (BicycleParams,
                                               InvPendulumBicycleParams)

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    _, state = _build(args.agents, dtype=np.float32, density=args.density,
                      hist_len=args.hist, pad_to_block=128,
                      model_name=args.model)
    cfg = NeighborConfig(
        cutoff=50.0, block=args.block, kb=args.kb,
        rebuild_every=args.rebuild, screen=False,
        rebuild_mode=args.mode,
        backend=args.backend if on_tpu else "xla")
    if args.model == "invpendulum":
        params = InvPendulumBicycleParams.create(zoh_lut=args.zoh_lut)
    else:
        params = BicycleParams.create()
    model = MODELS[args.model]
    engine = Engine.create(
        params, model, dest_force=args.dest,
        sorted_resident=not args.no_sr,
        # bicycle2d defaults to the legacy field; the bench runs it with
        # the twod field (BASELINE.md) -- keep runs comparable
        rep_force="twod" if args.model == "bicycle2d" else None,
        neighbors=None if args.rep == "off" else cfg)
    if args.rep == "off":
        engine = engine.replace(rep_force=None)
    state = prepare(model, params, state)

    run = jax.jit(lambda e, s: e.simulate(s, args.steps, record=False)[0])

    def sync(out):
        jax.block_until_ready(out)
        return np.asarray(out.s[:4, :4])

    t0 = time.perf_counter()
    out0 = run(engine, state)
    sync(out0)
    t_compile = time.perf_counter() - t0
    if args.audit and args.rep == "on":
        import jax.numpy as jnp  # noqa: F401

        from bench import audit_overflow

        pos0 = np.asarray(jax.device_get(state.s))[:, :2]
        pos1 = np.asarray(jax.device_get(out0.s))[:, :2]
        audit_overflow(pos0[:, 0], pos0[:, 1], cfg, "t=0")
        audit_overflow(pos1[:, 0], pos1[:, 1], cfg, "t=end")
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        probe = sync(run(engine, state))
        dt = min(dt, time.perf_counter() - t0)
    assert np.all(np.isfinite(probe)), probe
    ms = dt / args.steps * 1e3
    asps = args.agents * args.steps / dt
    print(f"RESULT model={args.model} backend={args.backend} "
          f"dest={args.dest or model.DEST_FORCE} rep={args.rep} "
          f"mode={args.mode} rebuild={args.rebuild} sr={not args.no_sr} "
          f"zoh_lut={args.zoh_lut} "
          f"N={args.agents} steps={args.steps}: {ms:.2f} ms/step, "
          f"{asps/1e6:.2f}M agent-steps/s (compile {t_compile:.0f}s)")


if __name__ == "__main__":
    main()
