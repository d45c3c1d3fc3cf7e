"""Measure neighbor-table tightness under different spatial sort orders.

The culled pair stage's cost is ~ (mean in-range blocks) x block x N ops
(the kernel is VPU issue-bound, BASELINE.md round 2): any sort order that
makes the 128-agent blocks more COMPACT cuts candidate pairs one-for-one.
Serpentine column order (the round-2 fix for row-major straddle blocks)
still yields 54 m x ~2.4-cell strip-shaped blocks; a Hilbert curve should
give ~square blocks and approach the geometric lower bound
(area(block bbox (+) cutoff disk) x density / block ~ 5.5 blocks).

CPU-only (numpy table math), no TPU needed.

    python scripts/exp_hilbert.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

N = 100_000
DENSITY = 0.02
BLOCK = 128
CUTOFF = 54.0          # cutoff + skin, what Engine passes to NB.build


def bench_positions():
    rng = np.random.default_rng(0)
    side = 0.5 * float(np.sqrt(N / DENSITY))
    x = rng.uniform(-side, side, N)
    y = rng.uniform(-side, side, N)
    return x, y


def hilbert_key(ix, iy, order):
    """Hilbert curve index of integer cells (ix, iy), each < 2**order.

    Standard xy->d bit-interleaving walk (Wikipedia formulation),
    vectorized over numpy arrays.
    """
    rx = np.zeros_like(ix)
    ry = np.zeros_like(iy)
    d = np.zeros_like(ix, dtype=np.int64)
    x = ix.copy()
    y = iy.copy()
    s = 1 << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(ix.dtype)
        ry = ((y & s) > 0).astype(iy.dtype)
        d += (s * s) * ((3 * rx) ^ ry)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x2 = np.where(swap, y_f, x_f)
        y2 = np.where(swap, x_f, y_f)
        x, y = x2, y2
        s >>= 1
    return d


def table_stats(x, y, perm, tag):
    xs, ys = x[perm], y[perm]
    npd = (N // BLOCK) * BLOCK
    xs, ys = xs[:npd], ys[:npd]
    b = npd // BLOCK
    xb = xs.reshape(b, BLOCK)
    yb = ys.reshape(b, BLOCK)
    boxes = np.stack([xb.min(1), yb.min(1), xb.max(1), yb.max(1)], axis=1)
    dx = np.maximum(np.maximum(boxes[None, :, 0] - boxes[:, None, 2],
                               boxes[:, None, 0] - boxes[None, :, 2]), 0.0)
    dy = np.maximum(np.maximum(boxes[None, :, 1] - boxes[:, None, 3],
                               boxes[:, None, 1] - boxes[None, :, 3]), 0.0)
    within = dx * dx + dy * dy <= CUTOFF * CUTOFF
    counts = within.sum(1)
    ext_x = boxes[:, 2] - boxes[:, 0]
    ext_y = boxes[:, 3] - boxes[:, 1]
    print(f"{tag:28s} mean {counts.mean():5.2f}  max {counts.max():3d}  "
          f"block extent mean {ext_x.mean():5.1f}x{ext_y.mean():5.1f} m")
    return counts.mean(), counts.max()


def serpentine_perm(x, y, cell):
    ix = np.floor((x - x.min()) / cell).astype(np.int64)
    iy = np.floor((y - y.min()) / cell).astype(np.int64)
    m = 1 << 15
    iy = np.where(ix % 2 == 0, iy, m - 1 - iy)
    return np.argsort(ix * m + iy, kind="stable")


def hilbert_perm(x, y, cell, order):
    ix = np.floor((x - x.min()) / cell).astype(np.int64)
    iy = np.floor((y - y.min()) / cell).astype(np.int64)
    ix = np.clip(ix, 0, (1 << order) - 1)
    iy = np.clip(iy, 0, (1 << order) - 1)
    return np.argsort(hilbert_key(ix, iy, order), kind="stable")


def serpentine_finey_perm(x, y, col_w, y_res=0.1):
    """Columns of width col_w, but y sorted at y_res granularity inside
    each column (vs the cell-size granularity of serpentine_perm, which
    lets a 2.2-cell block's bbox span 3 full cells)."""
    ix = np.floor((x - x.min()) / col_w).astype(np.int64)
    iy = np.floor((y - y.min()) / y_res).astype(np.int64)
    m = int(np.ceil((y.max() - y.min()) / y_res)) + 2
    iy = np.where(ix % 2 == 0, iy, m - 1 - iy)
    return np.argsort(ix * m + iy, kind="stable")


def main():
    x, y = bench_positions()
    table_stats(x, y, serpentine_perm(x, y, 54.0), "serpentine cell=54")
    table_stats(x, y, serpentine_perm(x, y, 27.0), "serpentine cell=27")
    for cell in (54.0, 27.0, 13.5, 8.0, 4.0):
        side = x.max() - x.min()
        order = int(np.ceil(np.log2(side / cell + 1)))
        table_stats(x, y, hilbert_perm(x, y, cell, order),
                    f"hilbert cell={cell:g} (ord {order})")
    for w in (27.0, 40.0, 54.0, 66.0, 80.0, 100.0):
        table_stats(x, y, serpentine_finey_perm(x, y, w),
                    f"serp fine-y col={w:g}")


if __name__ == "__main__":
    main()
