"""Tile binning: fixed-shape, allocation-free TPU redesign of the CUDA
duplicate->radix-sort pipeline.

The CUDA rasterizer (reference N1; notes/rasterizer_note.h:27-41) counts
touched tiles per splat, prefix-sums, materializes (tile|depth)-keyed
duplicates in a dynamically resized buffer, and radix-sorts them. Dynamic
allocation and data-dependent shapes don't exist under XLA, so the TPU design
is:

1. Sort splats by view depth once, globally (lax.sort — O(N log N), runs on
   chip). Per-tile depth order is then a subsequence of the global order.
2. Expand (splat, tile) pairs into a *static* budget of ``max_pairs`` slots
   (the Pallas expansion kernel, or a scatter+cummax fill path) — every
   slot computes its (gaussian, tile) pair independently (pure vector code).
   Because expansion enumerates splats in depth order, pair order within a
   tile is already depth-ascending.
3. One *stable* global sort by tile id groups pairs per tile while
   preserving depth order — a 16/32-bit single-key sort instead of CUDA's
   64-bit (tile|depth) radix sort.
4. Everything positional is then closed-form (build_sorted_bins): tile
   ranges from T searchsorted queries, backward-write destinations from a
   monotone per-tile delta forward-filled with one scatter + cummax.

Two products share stages 1-2: ``build_tile_bins`` (per-tile index tables,
the XLA compositing path) and ``build_sorted_bins`` (the Pallas
compositor's sorted-stream layout). Overflowing pairs (budget exhausted)
drop the *farthest* splats first — graceful degradation, with the drop
count reported for logging (the "no silent caps" rule).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_splatting_lightning_tpu.core import transforms as tf
from gaussian_splatting_lightning_tpu.ops.common import BLOCK_X, BLOCK_Y, Preprocessed


def owner_of_slot(starts: jnp.ndarray, n_slots: int) -> jnp.ndarray:
    """For ascending ``starts`` (K,), map each slot in [0, n_slots) to the
    largest k with starts[k] <= slot (i.e. searchsorted-right - 1), via
    scatter-max + cummax.

    Equivalent to ``jnp.searchsorted(starts, arange, 'right') - 1`` but ~100x
    faster on TPU in fused context (XLA's searchsorted lowers to a 17-pass
    binary-search loop that pessimizes surrounding fusion; this is one
    scatter and one cumulative max). Zero-width runs (duplicate starts)
    resolve to the last owner, matching searchsorted-right semantics.
    """
    k = starts.shape[0]
    marker = jnp.full(n_slots, -1, dtype=jnp.int32)
    marker = marker.at[starts].max(
        jnp.arange(k, dtype=jnp.int32), mode="drop"
    )
    return jax.lax.cummax(marker)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TileBins:
    """Depth-then-tile ordered (splat, tile) pairs with per-tile ranges."""

    pair_gaussian: jnp.ndarray  # (M,) int32 index into the original arrays
    pair_tile: jnp.ndarray  # (M,) int32 tile id; == n_tiles for padding
    pair_valid: jnp.ndarray  # (M,) bool
    tile_start: jnp.ndarray  # (T,) int32 offset into pair arrays
    tile_count: jnp.ndarray  # (T,) int32
    num_pairs: jnp.ndarray  # scalar int32: total pairs before the budget cap
    num_dropped: jnp.ndarray  # scalar int32 pairs dropped by the budget


def build_tile_bins(
    prep: Preprocessed,
    grid_x: int,
    grid_y: int,
    max_pairs: int,
    tile_y_offset=0,
    grid_y_local: int | None = None,
) -> TileBins:
    """``tile_y_offset``/``grid_y_local`` restrict binning to a horizontal
    band of tile rows — the unit of multi-chip tile sharding (each device
    bins+composites only its band; see parallel/shard.py). The offset may be
    a traced scalar (lax.axis_index under shard_map); the band height is
    static. Tile ids are *local* to the band."""
    n = prep.depth.shape[0]
    if grid_y_local is None:
        grid_y_local = grid_y
    n_tiles = grid_x * grid_y_local

    x0, y0g, x1, y1g = tf.tile_rect(prep.p_pix, prep.radius_bin, grid_x, grid_y)
    y0 = jnp.clip(y0g - tile_y_offset, 0, grid_y_local)
    y1 = jnp.clip(y1g - tile_y_offset, 0, grid_y_local)
    nx = jnp.maximum(x1 - x0, 0)
    ny = jnp.maximum(y1 - y0, 0)
    ntiles = jnp.where(prep.visible, nx * ny, 0).astype(jnp.int32)

    # (1) global depth sort; culled splats last.
    depth_key = jnp.where(prep.visible, prep.depth, jnp.inf)
    order = jnp.argsort(depth_key)  # stable
    ntiles_s = ntiles[order]
    x0_s, nx_s = x0[order], jnp.maximum(nx[order], 1)

    # (2) static-budget pair expansion.
    offsets = jnp.cumsum(ntiles_s) - ntiles_s  # exclusive prefix sum
    total = offsets[-1] + ntiles_s[-1]
    slot = jnp.arange(max_pairs, dtype=jnp.int32)
    g_s = jnp.clip(owner_of_slot(offsets, max_pairs), 0, n - 1)
    local = slot - offsets[g_s]
    # Integer div/mod by a *variable* divisor lowers to a slow expansion on
    # the VPU; with 0 <= local < nx*ny and r < nx, (local + 0.5)/nx lies
    # strictly inside (q, q+1), so float floor-division is exact.
    nx_f = nx_s[g_s].astype(prep.p_pix.dtype)
    row = jnp.floor(
        (local.astype(prep.p_pix.dtype) + 0.5) / nx_f
    ).astype(jnp.int32)
    tile_x = x0_s[g_s] + local - row * nx_s[g_s]
    tile_y = y0[order][g_s] + row
    valid = slot < jnp.minimum(total, max_pairs)
    tile_id = jnp.where(
        valid, tile_y * grid_x + tile_x, n_tiles
    ).astype(jnp.int32)

    # (3) stable tile sort preserves depth order within each tile.
    perm = jnp.argsort(tile_id)
    pair_tile = tile_id[perm]
    pair_gaussian = order[g_s][perm].astype(jnp.int32)
    pair_valid = valid[perm]

    # (4) per-tile ranges via histogram (pairs are tile-sorted, so start[t]
    # is the prefix sum of counts; avoids XLA's slow searchsorted lowering).
    counts = jax.ops.segment_sum(
        jnp.ones(max_pairs, jnp.int32), tile_id, num_segments=n_tiles + 1
    )
    tile_count = counts[:n_tiles]
    tile_start = jnp.cumsum(tile_count) - tile_count

    return TileBins(
        pair_gaussian=pair_gaussian,
        pair_tile=pair_tile,
        pair_valid=pair_valid,
        tile_start=tile_start,
        tile_count=tile_count,
        num_pairs=total,
        num_dropped=jnp.maximum(total - max_pairs, 0),
    )


# --- Pallas expansion kernel -------------------------------------------------
#
# The run-length expansion (slot -> owning splat -> tile coordinate) was five
# scatter-max + cummax "fills" plus their unpack arithmetic in XLA (~70 ms at
# 4.7M slots). Because offsets are a cumsum over the live (ntiles >= 1)
# prefix, slot owners advance by AT MOST ONE per slot — so the owners of any
# 128-slot chunk always fit in one statically-positioned 256-splat window:
# per chunk, two lane-native (128, 128) interval one-hots assign owners and
# gather the per-splat fields, with zero search loops. The kernel also
# applies the *exact* per-tile ellipse cull (pixel-center distance from the
# tile's pixel rect vs prep.cull_r2): a culled pair's every pixel alpha is
# below the kill threshold, so removing it changes nothing — while the
# aligned pair layout, the feature gathers, and the compositing work all
# shrink (rect corners are ~20% of a large splat's tiles).

EXP_BLK = 4096  # slots per grid program
EXP_TBL = 16  # f32 field rows: off0 off1 x0 nx y0 px py cull_r2 orig (7 pad)
EXP_WIN_ROWS = (EXP_BLK + 256) // 128  # splat window rows per program


def _expand_kernel(
    # scalar prefetch
    wstart_ref, scal_ref,
    # inputs
    tbl_hbm,
    # outputs
    key_ref, gauss_ref,
    # scratch
    win, sem,
    *, n_chunks, grid_x, n_tiles, n_pad_rows, block,
):
    p = pl.program_id(0)
    wstart = wstart_ref[p]
    astart_row = jnp.minimum(wstart // 128, n_pad_rows - EXP_WIN_ROWS)
    total = scal_ref[0]
    tyoff_px = (scal_ref[1] * block).astype(jnp.float32)

    dma = pltpu.make_async_copy(
        tbl_hbm.at[pl.ds(astart_row, EXP_WIN_ROWS)], win, sem
    )
    dma.start()
    dma.wait()

    base_slot = p * EXP_BLK
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(jnp.float32)

    def chunk_body(c, ow):
        s = (
            base_slot + c * 128
            + jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        ).astype(jnp.float32)
        ow_row = ow // 128
        win2 = win[pl.ds(ow_row, 2), :, :]  # one dynamic read per chunk

        def half(h, row_f):
            off0 = win2[h, 0].reshape(1, 128)
            off1 = win2[h, 1].reshape(1, 128)
            oh = ((s >= off0) & (s < off1)).astype(jnp.float32)  # (128, 128)

            def g(f):
                return jnp.sum(
                    oh * win2[h, f].reshape(1, 128), axis=1, keepdims=True
                )  # (128, 1)

            rel = jnp.sum(
                oh * (row_f * 128.0 + lane), axis=1, keepdims=True
            )
            return oh, rel, g(0), g(2), g(3), g(4), g(5), g(6), g(7), g(8)

        row_f = ow_row.astype(jnp.float32)
        parts0 = half(0, row_f)
        parts1 = half(1, row_f + 1.0)
        oh_sum = jnp.sum(parts0[0], axis=1, keepdims=True) + jnp.sum(
            parts1[0], axis=1, keepdims=True
        )
        rel, off0, x0, nx, y0, px, py, cr2, orig = (
            a + b for a, b in zip(parts0[1:], parts1[1:])
        )

        local = s - off0
        nx_safe = jnp.maximum(nx, 1.0)
        row_t = jnp.floor((local + 0.5) / nx_safe)
        tile_x = x0 + local - row_t * nx_safe
        tile_y = y0 + row_t
        key = tile_y * jnp.float32(grid_x) + tile_x

        # exact per-tile cull: min pixel-center distance from the tile's
        # block x block pixel rect (global coords) to the splat mean
        blk_f = jnp.float32(block)
        gx0 = tile_x * blk_f
        gy0 = tile_y * blk_f + tyoff_px
        dx = jnp.maximum(
            jnp.maximum(gx0 - px, px - (gx0 + blk_f - 1.0)), 0.0
        )
        dy = jnp.maximum(
            jnp.maximum(gy0 - py, py - (gy0 + blk_f - 1.0)), 0.0
        )
        keep = dx * dx + dy * dy <= cr2

        matched = (oh_sum > 0.0) & (s < total.astype(jnp.float32))
        key = jnp.where(matched & keep, key, jnp.float32(n_tiles))
        key_ref[0, c, :] = key.reshape(128).astype(jnp.int32)
        gauss_ref[0, c, :] = orig.reshape(128).astype(jnp.int32)
        new_ow = jnp.max(
            jnp.where(matched, rel, ow.astype(jnp.float32))
        ).astype(jnp.int32)
        return jnp.maximum(ow, new_ow)

    jax.lax.fori_loop(0, n_chunks, chunk_body, wstart - astart_row * 128)


def expand_pairs_pallas(
    offsets, ntiles_s, fields_s,
    max_pairs, total, grid_x, n_tiles, tile_y_offset, interpret,
    block=BLOCK_X,
):
    """Pallas run-length pair expansion + exact per-tile cull.

    ``fields_s`` is the depth-sorted (N, 7) f32 field table
    [x0, nx, y0, px, py, cull_r2, orig_id] — one fused row gather builds it
    (six separate [order] gathers cost ~38 ms at N=1M). Returns (key
    (max_pairs,) int32 with n_tiles for padding/culled, gauss (max_pairs,)
    int32 in ORIGINAL index space).
    """
    n = offsets.shape[0]
    n_rows = -(-n // 128) + EXP_WIN_ROWS
    n_pad = n_rows * 128
    off0 = offsets.astype(jnp.float32)
    off1 = (offsets + ntiles_s).astype(jnp.float32)

    tbl = jnp.concatenate(
        [off0[:, None], off1[:, None], fields_s,
         jnp.zeros((n, EXP_TBL - 9), jnp.float32)],
        axis=1,
    )
    tbl = jnp.pad(tbl, ((0, n_pad - n), (0, 0)))  # (n_pad, 16)
    tbl3 = tbl.reshape(n_rows, 128, EXP_TBL).transpose(0, 2, 1)

    n_blocks = -(-max_pairs // EXP_BLK)  # overhang slots computed, sliced off
    starts = jnp.arange(n_blocks, dtype=jnp.int32) * EXP_BLK
    wstart = jnp.clip(
        jnp.searchsorted(offsets, starts, side="right").astype(jnp.int32) - 1,
        0, n - 1,
    )
    scal = jnp.stack(
        [jnp.asarray(total, jnp.int32),
         jnp.asarray(tile_y_offset, jnp.int32)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(
                (1, EXP_BLK // 128, 128), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, EXP_BLK // 128, 128), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((EXP_WIN_ROWS, EXP_TBL, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    key3, gauss3 = pl.pallas_call(
        functools.partial(
            _expand_kernel, n_chunks=EXP_BLK // 128, grid_x=grid_x,
            n_tiles=n_tiles, n_pad_rows=n_rows, block=block,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks, EXP_BLK // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, EXP_BLK // 128, 128), jnp.int32),
        ),
        interpret=interpret,
    )(wstart, scal, tbl3)
    return key3.reshape(-1)[:max_pairs], gauss3.reshape(-1)[:max_pairs]


def build_sorted_bins(
    prep: Preprocessed,
    grid_x: int,
    grid_y: int,
    max_pairs: int,
    tile_y_offset=0,
    grid_y_local: int | None = None,
    pallas_expand: bool = True,
    interpret: bool = False,
    block: int = BLOCK_X,
):
    """Binning for the Pallas compositor, round-5 design: ONE global stable
    sort by tile key, then everything else is closed-form.

    The round 1-3 pipeline (blocked sort -> Pallas histogram + running-
    histogram destination kernels -> aligned scatter -> aligned gather) spent
    ~28 ms/step of kernels + XLA scatter at the bench shape computing each
    pair's chunk-aligned destination. With a GLOBAL sort those quantities
    are positional:

      - tile_start = searchsorted(keys_sorted, arange(T)) — T queries, not
        M (XLA's searchsorted is slow per-query; over tiles it is ~1.6 ms);
      - within-tile rank  = position - tile_start[key].

    The compositors read AND write each tile's pairs at its aligned window
    [floor(tile_start/128)*128, ...) with a [phase, phase + count) lane mask
    (Mosaic requires 128-aligned lane DMA starts; boundary chunks shared by
    adjacent tiles are merged in the bwd kernel through a VMEM carry — the
    TPU grid is a sequential loop, so no atomicity is needed). The round-4
    private chunk-padded bwd layout (dst fill + pad_cstart + a slot-
    inversion sort + an M-sized cotangent gather) is gone: the bwd routes
    per-pair cotangents with one unstable sort keyed by ORIGINAL splat id
    (see rasterize_pallas.make_pair_pipeline).

    Returns (gauss_s, slot_s, astart, phase, tile_count, nchunk, num_pairs,
    num_dropped, ntiles, offsets, order):
      gauss_s (M,) original splat id per sorted pair;
      slot_s (M,) expansion slot per sorted pair (a permutation of [0, M));
      astart/phase/tile_count/nchunk (T,) aligned window geometry
      (tile_start = astart + phase);
      ntiles (N,) per-splat rect pair count in ORIGINAL splat order — the
      bwd sort's segment lengths (culled pairs included: they ride the
      stream with zero cotangents);
      offsets (N,) depth-grouped expansion slot starts and order (N,) the
      depth permutation — consumed only by the bwd's overflow branch.
    """
    chunk = 128  # kernel chunk alignment (rasterize_pallas.CHUNK)
    n = prep.depth.shape[0]
    if grid_y_local is None:
        grid_y_local = grid_y
    n_tiles = grid_x * grid_y_local

    # the guard keeps slot arithmetic f32-exact in the expansion and
    # segreduce kernels (exact below 2^24)
    key, gauss, order, offsets, total, ntiles = _expand_keys(
        prep, grid_x, grid_y, max_pairs, tile_y_offset, grid_y_local,
        n_tiles, pallas_expand and 2 * max_pairs < (1 << 24), interpret,
        block,
    )

    # ONE global stable sort groups pairs by tile while preserving depth
    # order (expansion enumerates splats in depth order)
    keys_s, gauss_s, slot_s = jax.lax.sort(
        (key, gauss, jnp.arange(max_pairs, dtype=jnp.int32)),
        dimension=0, num_keys=1, is_stable=True,
    )

    # positional tile ranges: T searchsorted queries over the sorted keys
    t_ids = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(keys_s, t_ids, side="left").astype(jnp.int32)
    tile_start = bounds[:-1]
    tile_count = bounds[1:] - bounds[:-1]

    # Mosaic requires lane-dimension DMA slices to start 128-aligned, so
    # each tile's read/write window rounds DOWN to the chunk boundary and
    # the kernels mask lanes to [phase, phase + count).
    astart = (tile_start // chunk) * chunk
    phase = tile_start - astart
    nchunk = (phase + tile_count + chunk - 1) // chunk

    return (
        gauss_s,
        slot_s,
        astart,
        phase,
        tile_count,
        nchunk,
        total,
        jnp.maximum(total - max_pairs, 0),
        ntiles,
        offsets,
        order,
    )


def _expand_keys(
    prep: Preprocessed,
    grid_x: int,
    grid_y: int,
    max_pairs: int,
    tile_y_offset,
    grid_y_local: int,
    n_tiles: int,
    use_pallas: bool,
    interpret: bool,
    block: int,
):
    """Shared pair expansion: (key, gauss) per expansion slot, plus the depth
    permutation, per-splat slot offsets, and the per-splat rect pair counts
    ``ntiles`` in original splat order. Pallas kernel by default; the XLA
    scatter-fill path is the fallback for giant budgets and a CPU-testable
    oracle."""
    n = prep.depth.shape[0]
    x0, y0g, x1, y1g = tf.tile_rect(
        prep.p_pix, prep.radius_bin, grid_x, grid_y, block, block
    )
    y0 = jnp.clip(y0g - tile_y_offset, 0, grid_y_local)
    y1 = jnp.clip(y1g - tile_y_offset, 0, grid_y_local)
    nx = jnp.maximum(x1 - x0, 0)
    ny = jnp.maximum(y1 - y0, 0)
    ntiles = jnp.where(prep.visible, nx * ny, 0).astype(jnp.int32)

    # live prefix = visible splats with at least one (possibly band-clipped)
    # tile: guarantees slot owners advance by <= 1 per slot, the invariant
    # the Pallas expansion kernel's static windows rely on
    depth_key = jnp.where(prep.visible & (ntiles > 0), prep.depth, jnp.inf)
    order = jnp.argsort(depth_key)

    if use_pallas:
        # one fused row gather for every per-splat field the expansion
        # kernel needs (tile assignment carries no gradient, like the fill
        # path whose int ops were naturally tangent-free)
        sg = jax.lax.stop_gradient
        f32 = jnp.float32
        fields = jnp.stack(
            [
                ntiles.astype(f32), x0.astype(f32),
                jnp.maximum(nx, 1).astype(f32), y0.astype(f32),
                sg(prep.p_pix[:, 0]), sg(prep.p_pix[:, 1]),
                sg(prep.cull_r2),
                jnp.arange(n, dtype=f32),
            ],
            axis=1,
        )  # (N, 8) original order
        fields_s = fields[order]
        ntiles_s = fields_s[:, 0].astype(jnp.int32)
        offsets = jnp.cumsum(ntiles_s) - ntiles_s
        total = offsets[-1] + ntiles_s[-1]
        key, gauss = expand_pairs_pallas(
            offsets, ntiles_s, fields_s[:, 1:],
            max_pairs, total, grid_x, n_tiles, tile_y_offset, interpret,
            block,
        )
    else:
        ntiles_s = ntiles[order]
        x0_s, nx_s = x0[order], jnp.maximum(nx[order], 1)
        y0_s = y0[order]

        offsets = jnp.cumsum(ntiles_s) - ntiles_s
        total = offsets[-1] + ntiles_s[-1]
        slot = jnp.arange(max_pairs, dtype=jnp.int32)
        # Gather-free XLA expansion. TPU gathers run at ~7 cycles/element,
        # and the naive expansion needs four M-sized lookups (offsets/x0/nx/
        # y0 by the owning splat). Because slot ownership is *monotone*,
        # every lookup is a run-length broadcast: scatter the value at the
        # run's first slot and forward-fill with a cumulative max.
        # Non-monotone payloads are made monotone by packing them under the
        # (monotone) owner index: packed = owner*512 + field (field < 512,
        # i.e. tile coords of up to 8K-wide images; owner < 2^22 splats) —
        # unpacked with the owner from the same fill. Duplicate offsets
        # (zero-area splats) resolve to the largest owner on every fill,
        # keeping unpacking consistent.
        def fill(values):
            marker = jnp.full(max_pairs, -1, jnp.int32)
            marker = marker.at[offsets].max(values, mode="drop")
            return jax.lax.cummax(marker)

        K = 512
        idx_n = jnp.arange(n, dtype=jnp.int32)
        g_s = jnp.clip(fill(idx_n), 0, n - 1)
        local = slot - fill(offsets)  # value == position: monotone as-is
        x0_g = fill(idx_n * K + x0_s) - g_s * K
        nx_g = fill(idx_n * K + nx_s) - g_s * K
        y0_g = fill(idx_n * K + y0_s) - g_s * K

        nx_f = nx_g.astype(prep.p_pix.dtype)
        row = jnp.floor(
            (local.astype(prep.p_pix.dtype) + 0.5) / nx_f
        ).astype(jnp.int32)
        tile_x = x0_g + local - row * nx_g
        tile_y = y0_g + row
        valid0 = slot < jnp.minimum(total, max_pairs)
        key = jnp.where(
            valid0, tile_y * grid_x + tile_x, n_tiles
        ).astype(jnp.int32)
        # translate to original index space (matches the Pallas branch)
        gauss = order.astype(jnp.int32)[g_s]
    return key, gauss, order, offsets, total, ntiles


def build_tile_table(bins: TileBins, n_tiles: int, capacity: int) -> jnp.ndarray:
    """(T, K) table of pair indices, -1 padded; entry k is the k-th nearest
    member of the tile. Used by the XLA compositing path (the Pallas path
    walks [tile_start, tile_start+count) directly)."""
    m = bins.pair_tile.shape[0]
    pos = jnp.arange(m, dtype=jnp.int32) - bins.tile_start[
        jnp.clip(bins.pair_tile, 0, n_tiles - 1)
    ]
    table = jnp.full((n_tiles, capacity), -1, dtype=jnp.int32)
    row = jnp.where(bins.pair_valid, bins.pair_tile, n_tiles)
    col = jnp.where(pos < capacity, pos, capacity)
    table = table.at[row, col].set(
        jnp.arange(m, dtype=jnp.int32), mode="drop"
    )
    return table


def grid_shape(width: int, height: int, block_x: int = BLOCK_X,
               block_y: int = BLOCK_Y):
    return -(-width // block_x), -(-height // block_y)


