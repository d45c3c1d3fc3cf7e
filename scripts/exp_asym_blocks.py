"""Measure candidate-pair counts for ASYMMETRIC block granularity.

The pair kernel is VPU-issue-bound: time ~ (tile ops) x (candidate
pairs). Receivers must stay at 128 (they are the tile's LANE dim --
narrower receiver blocks waste lanes), but sources are the SUBLANE dim
(granularity 8), so a finer SOURCE block wastes nothing in the tile and
shrinks each candidate tile's height. This script quantifies the
candidate-pair reduction on the bench distribution for source blocks of
128/64/32/16 with receiver blocks fixed at 128.

CPU-only; run directly.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cyclistsocialforce_tpu.ops import neighbors as NB  # noqa: E402

N = 100_000
DENSITY = 0.02
CUTOFF = 54.0  # table cutoff = force cutoff 50 + skin 4
RECV = 128


def main():
    rng = np.random.default_rng(0)
    n_pad = ((N + RECV - 1) // RECV) * RECV - N
    n = N + n_pad
    side = 0.5 * float(np.sqrt(N / DENSITY))
    x = rng.uniform(-side, side, n)
    y = rng.uniform(-side, side, n)
    # bench pads clump at the first agent's position (audit_overflow) --
    # replicate _build: pads frozen in place at their random positions
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    perm = NB.sort_by_cell(xj, yj, CUTOFF)
    xs, ys = xj[perm], yj[perm]

    recv_boxes = NB.block_bboxes(xs, ys, RECV)
    print(f"N={n} (pad {n_pad}), recv blocks {recv_boxes.shape[0]}")
    base = None
    for s in (128, 64, 32, 16, 8):
        src_boxes = NB.block_bboxes(xs, ys, s)
        d2 = NB.bbox_distance2(recv_boxes, src_boxes)
        within = np.asarray(d2 <= CUTOFF * CUTOFF)
        counts = within.sum(1)
        pairs_per_agent = counts.mean() * s
        if base is None:
            base = pairs_per_agent
        print(f"src={s:4d}: in-range mean {counts.mean():6.2f} "
              f"max {counts.max():3d}  pairs/agent {pairs_per_agent:7.1f} "
              f"({pairs_per_agent / base:.3f}x)")


if __name__ == "__main__":
    main()
