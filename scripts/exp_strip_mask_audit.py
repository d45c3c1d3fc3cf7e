"""Ceiling audit for the strip-masked (two-level) neighbor table
(VERDICT r4 item 5): at the bench geometry, how many candidate pairs
per agent remain if each admitted (receiver-block, source-block) table
entry is refined by an 8-row SOURCE-STRIP bbox test precomputed at
build time?

Levels compared (all per agent, receivers x admitted sources):
  L0: current table        -- kb source-64 blocks x 64 rows
  L1: strip-masked (sub=8) -- only 8-row strips whose bbox is within the
                              (skin-extended) cutoff of the RECEIVER
                              BLOCK bbox
  L2: true in-cutoff pairs -- the physics lower bound
CPU-only; run me before building any kernel."""

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import _build  # noqa: E402
from cyclistsocialforce_tpu.ops import neighbors as NB  # noqa: E402

N, DENSITY = 100_000, 0.02
BLOCK, BLOCK_SRC, KB, CUTOFF, SKIN = 128, 64, 19, 50.0, 4.0
SUB = 8

_, state = _build(N, dtype=np.float32, density=DENSITY, hist_len=8,
                  pad_to_block=BLOCK)
x = np.asarray(state.s[:, 0]); y = np.asarray(state.s[:, 1])
n = x.shape[0]
cut = CUTOFF + SKIN

perm = np.asarray(NB.sort_by_cell(jnp.asarray(x), jnp.asarray(y), cut))
xs, ys = x[perm], y[perm]
boxes_recv = np.asarray(NB.block_bboxes(jnp.asarray(xs), jnp.asarray(ys), BLOCK))
boxes_src = np.asarray(NB.block_bboxes(jnp.asarray(xs), jnp.asarray(ys), BLOCK_SRC))
boxes_strip = np.asarray(NB.block_bboxes(jnp.asarray(xs), jnp.asarray(ys), SUB))
nbr, valid, overflow = NB.neighbor_block_table(
    jnp.asarray(boxes_recv), cut, KB, src_bboxes=jnp.asarray(boxes_src),
    chunk=1024)
nbr = np.asarray(nbr); valid = np.asarray(valid)
assert not np.asarray(overflow).any()

def box_dist2(a, b):
    dx = np.maximum(np.maximum(b[:, 0] - a[2], a[0] - b[:, 2]), 0.0)
    dy = np.maximum(np.maximum(b[:, 1] - a[3], a[1] - b[:, 3]), 0.0)
    return dx * dx + dy * dy

B = boxes_recv.shape[0]
strips_per_src = BLOCK_SRC // SUB
l0_pairs = valid.sum() * BLOCK_SRC * BLOCK
l1_strips = 0
for b in range(B):
    rb = boxes_recv[b]
    for k in range(KB):
        if not valid[b, k]:
            continue
        s = nbr[b, k]
        sidx = np.arange(s * strips_per_src, (s + 1) * strips_per_src)
        d2 = box_dist2(rb, boxes_strip[sidx])
        l1_strips += int((d2 <= cut * cut).sum())
l1_pairs = l1_strips * SUB * BLOCK

# true pairs (chunked)
true_pairs = 0
act = np.ones(n, bool)
for i0 in range(0, n, 4096):
    dx = xs[i0:i0+4096, None] - xs[None, :]
    dy = ys[i0:i0+4096, None] - ys[None, :]
    true_pairs += int(((dx*dx + dy*dy) <= CUTOFF*CUTOFF).sum())

print(f"receiver blocks {B}, admitted entries {valid.sum()}, "
      f"mean kb {valid.sum()/B:.1f}")
print(f"L0 current table : {l0_pairs / n:10.1f} pairs/agent")
print(f"L1 strip-masked  : {l1_pairs / n:10.1f} pairs/agent "
      f"({100*l1_pairs/l0_pairs:.0f}% of L0)")
print(f"L2 true in-cutoff: {true_pairs / n:10.1f} pairs/agent")
print(f"potential pair-stage speedup if VPU-issue-bound on candidates: "
      f"{l0_pairs / l1_pairs:.2f}x")
