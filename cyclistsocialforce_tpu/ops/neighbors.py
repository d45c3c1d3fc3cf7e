"""Spatial culling for the O(N^2) pairwise force stage.

The repulsive fields decay exponentially (sigma ~ 5 m,
`ops.forces.rep_force_twod_pair`): beyond a cutoff of ~60 m a pair's force
is < 1e-4 -- below the framework's parity tolerance. This module exploits
that with a TPU-shaped cell list:

  1. agents are SORTED by spatial cell key (one argsort per rebuild) so
     that nearby agents are nearby in memory;
  2. the sorted population is cut into contiguous BLOCKS of `block` agents
     and each block gets an axis-aligned bounding box;
  3. per receiver block, the source blocks whose boxes lie within the
     cutoff are collected into a fixed-width neighbor-block table
     [B, KB] -- the only dynamic-shape-free sparse structure a TPU wants.

The force stage then evaluates one [block x block] tile per (receiver
block, neighbor block) pair -- with the Pallas kernel (ops.pallas_forces)
streaming tiles through VMEM via scalar-prefetched block indices, or an
XLA gather fallback.

Everything is static-shape and jit/scan-compatible; `KB` (max neighbor
blocks) is a capacity chosen from the expected density. Overflow (more
true neighbor blocks than KB) drops the FARTHEST blocks first and can be
detected with `neighbor_overflow`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = jnp.float32(3.4e38)


def cell_keys(x, y, cell_size):
    """Spatial cell key per agent: SERPENTINE (boustrophedon) order over a
    dynamic origin -- column-major, with every odd column's y-order
    reversed. Plain row/column-major order makes the agent blocks that
    straddle a column boundary span the column's full height, so their
    bounding boxes cover the whole domain and they become "neighbors" of
    every block in adjacent columns (measured at the bench distribution:
    max neighbor-block count 47 vs 11, mean 14.9 vs 8.4 for block = 256).
    Serpentine order keeps consecutive columns adjacent at the turn, so
    straddling blocks stay spatially compact.

    Within a column, y is ordered at FINE granularity (the full domain
    height mapped onto 2^15 sub-levels), not at cell_size granularity: a
    128-agent block covers ~2.2 cells of sorted run, so cell-granular y
    keys let its bbox span 3 FULL cells (y-extent ~3 cells) while
    fine-grained y keys shrink it to the exact run (~2.2 cells) -- mean
    in-range neighbor blocks 9.4 -> 8.5, max 12 -> 10 at the bench
    distribution (scripts/exp_hilbert.py; Hilbert-curve order measures
    WORSE, 12.0, because column-serpentine stacking aligns the dilated
    boxes better than square blocks).

    Keep cell_size (the column width) >= the table cutoff: at width just
    below the cutoff the 2-away column's boxes come into range and the
    candidate count jumps ~1.5x (the sharp optimum documented in
    BASELINE.md).

    The actual column width is cell_size snapped UP so an integer number
    of columns tiles the x-span exactly (width' = span / floor(span /
    cell_size)). A fixed width leaves a fractional trailing SLIVER
    column (span/cell_size is never integral); its handful of agents are
    spread over the domain's full height, so the sorted blocks straddling
    into it get ~full-height bounding boxes that are "in range" of every
    block of the neighboring dense column -- measured at N = 2e6: max
    in-range count 34 (vs mean 13.9) from exactly the trailing-edge
    blocks; snapping removes the sliver at a <=1%% mean-width cost and
    cannot trip the 2-away-column jump because the width only grows.

    int32 composite key (works without x64): supports up to 65536
    columns (~3500 km of domain at the default ~54 m column width); y is
    resolved to (domain height / 32768) within a column.
    """
    xmin = jnp.min(x)
    ymin = jnp.min(y)
    xspan = jnp.maximum(jnp.max(x) - xmin, 1e-9)
    yspan = jnp.maximum(jnp.max(y) - ymin, 1e-9)
    ncols = jnp.maximum(jnp.floor(xspan / cell_size), 1.0)
    eff = xspan / ncols
    m = jnp.int32(1 << 15)
    ix = jnp.clip(jnp.floor((x - xmin) / eff).astype(jnp.int32),
                  0, ncols.astype(jnp.int32) - 1)
    iy = jnp.clip(((y - ymin) / yspan * (1 << 15)).astype(jnp.int32),
                  0, m - 1)
    iy = jnp.where(ix % 2 == 0, iy, m - 1 - iy)
    return ix * m + iy


def sort_by_cell(x, y, cell_size):
    """Permutation sorting agents by cell key; [N] int32."""
    keys = cell_keys(x, y, cell_size)
    return jnp.argsort(keys).astype(jnp.int32)


def block_bboxes(xs, ys, block: int):
    """Axis-aligned bounding boxes of contiguous agent blocks.

    xs, ys: [N] SORTED positions, N divisible by block.
    Returns [B, 4]: (xmin, ymin, xmax, ymax).
    """
    n = xs.shape[0]
    b = n // block
    xb = xs.reshape(b, block)
    yb = ys.reshape(b, block)
    return jnp.stack([xb.min(1), yb.min(1), xb.max(1), yb.max(1)], axis=1)


def bbox_distance2(boxes_a, boxes_b):
    """[A, B] squared distances between box perimeters (0 if overlapping)."""
    dx = jnp.maximum(
        jnp.maximum(boxes_b[None, :, 0] - boxes_a[:, None, 2],
                    boxes_a[:, None, 0] - boxes_b[None, :, 2]), 0.0)
    dy = jnp.maximum(
        jnp.maximum(boxes_b[None, :, 1] - boxes_a[:, None, 3],
                    boxes_a[:, None, 1] - boxes_b[None, :, 3]), 0.0)
    return dx * dx + dy * dy


def neighbor_block_table(bboxes, cutoff, kb: int, src_bboxes=None,
                         chunk: int = 0):
    """Fixed-width neighbor-block table.

    bboxes are the RECEIVER blocks' boxes; src_bboxes (default: the same
    boxes) may use a FINER granularity -- the pair tile's source axis is
    the VPU sublane dim (granularity 8, no lane waste), so finer source
    blocks shrink each candidate tile and cut the issue-bound pair work
    (~20% fewer candidate pairs at source block 64 vs 128 on the bench
    distribution, scripts/exp_asym_blocks.py).

    chunk: receiver-axis chunk size (0 = dense). The dense form
    materializes the [B, B_src] bbox distance matrix -- 488 MB at
    N = 1e6 and ~8 GB at 4e6 (an HBM wall). Chunking lax.maps the build
    over ceil(B/chunk) receiver-row chunks, bounding peak memory to
    O(chunk * B_src) while keeping the result IDENTICAL (same exact
    box-to-box test, same closest-first top_k per row). B is padded up
    to a chunk multiple with dummy rows.

    Returns (nbr [B, KB] int32, valid [B, KB] bool, overflow [B] bool):
    for each receiver block, the up-to-KB source blocks within `cutoff`
    (box-to-box), CLOSEST FIRST; `overflow` flags receiver blocks whose
    true neighbor count exceeded KB (dropped-farthest semantics).
    """
    if src_bboxes is None:
        src_bboxes = bboxes

    def per_rows(boxes_r):
        d2 = bbox_distance2(boxes_r, src_bboxes)         # [C, B_src]
        within = d2 <= cutoff * cutoff
        # kb closest via top_k on the NEGATED distance (out-of-range
        # pushed to -BIG), NOT a row argsort: argsort sorts the full
        # [B, B_src] matrix (1.2e8 elements at N = 1e6 -- the rebuild's
        # dominant cost at that scale), while top_k selects kb of B_src
        neg = jnp.where(within, -d2, -BIG)
        k_eff = min(kb, neg.shape[1])    # kb may exceed the block count
        dneg, order = jax.lax.top_k(neg, k_eff)          # descending neg
        order = order.astype(jnp.int32)                  # closest first
        valid = dneg > -BIG
        if k_eff < kb:                   # pad the capacity with invalids
            b = neg.shape[0]
            order = jnp.concatenate(
                [order, jnp.zeros((b, kb - k_eff), jnp.int32)], axis=1)
            valid = jnp.concatenate(
                [valid, jnp.zeros((b, kb - k_eff), bool)], axis=1)
        overflow = jnp.sum(within, axis=1) > kb
        # invalid entries hold ANY in-bounds source index (they are
        # masked by `valid` in the XLA path and re-encoded as DMA-eliding
        # sign sentinels by the Pallas path); 0 is always in bounds
        nbr = jnp.where(valid, order, 0)
        return nbr, valid, overflow

    b = bboxes.shape[0]
    if not chunk or chunk >= b:
        return per_rows(bboxes)
    n_chunks = -(-b // chunk)
    pad = n_chunks * chunk - b
    padded = (jnp.concatenate([bboxes, jnp.zeros((pad, 4),
                                                 bboxes.dtype)])
              if pad else bboxes)
    nbr, valid, overflow = jax.lax.map(
        per_rows, padded.reshape(n_chunks, chunk, 4))
    return (nbr.reshape(-1, kb)[:b], valid.reshape(-1, kb)[:b],
            overflow.reshape(-1)[:b])


def build(x, y, cutoff, block: int, kb: int, cell_size=None,
          block_src: int = 0, table_chunk: int = 0):
    """One-call neighbor structure: (perm, nbr, valid, overflow).

    perm sorts agents by cell; nbr/valid index SORTED blocks -- receiver
    blocks of `block` agents, source blocks of `block_src` (0 = same as
    `block`; must divide `block`). N must be divisible by `block` (pad
    the population upstream). table_chunk bounds the table build's peak
    memory at mega-agent scale (see neighbor_block_table).
    """
    if cell_size is None:
        cell_size = cutoff
    block_src = block_src or block
    perm = sort_by_cell(x, y, cell_size)
    xs, ys = x[perm], y[perm]
    boxes = block_bboxes(xs, ys, block)
    src_boxes = (boxes if block_src == block
                 else block_bboxes(xs, ys, block_src))
    nbr, valid, overflow = neighbor_block_table(boxes, cutoff, kb,
                                                src_bboxes=src_boxes,
                                                chunk=table_chunk)
    return perm, nbr, valid, overflow
