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
   with searchsorted over the exclusive prefix sum of tiles-touched — every
   slot computes its (gaussian, tile) pair independently (pure vector code).
   Because expansion enumerates splats in depth order, pair order within a
   tile is already depth-ascending.
3. One *stable* sort by tile id groups pairs per tile while preserving depth
   order — a 16/32-bit single-key sort instead of CUDA's 64-bit
   (tile|depth) radix sort.
4. Per-tile [start, count) ranges via searchsorted.

Overflowing pairs (budget exhausted) drop the *farthest* splats first —
graceful degradation, with the drop count reported for logging (the
"no silent caps" rule).
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


# --- Pallas counting-sort kernels ------------------------------------------
#
# After the blocked sort, XLA's remaining counting-sort stages cost ~95 ms at
# 4.7M pairs on v5e: the per-(block, tile) histogram lowers to a scatter-add
# (~41 ms), the per-pair base lookup to a serialized gather (~48 ms), plus the
# run-start cummax for ranks. Block-sorted keys cluster: the keys of one
# 128-key chunk almost always fall inside one 256-wide tile window, so a
# (128, 256) one-hot turns histogram/rank/base-lookup into VPU compares and
# tiny MXU matmuls. A persistent VMEM running histogram carried across the
# (sequential) TPU grid replaces the cross-block prefix sums outright: the
# destination of a pair is pad_start[tile] + (pairs of this tile seen so
# far), accumulated in depth order.

HIST_CHUNK = 128  # keys per inner step
HIST_WIN = 256  # one-hot window width (2 x 128 lanes)


def _win_onehot_halves(keys, w_lo):
    """(128, 1) int keys vs window [w_lo, w_lo + 256) as two (128, 128)
    one-hot halves — all shapes stay lane-native (Mosaic cannot shape-cast a
    256-lane row into (2, 128))."""
    cols = w_lo + jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    oh0 = (keys == cols).astype(jnp.float32)
    oh1 = (keys == cols + 128).astype(jnp.float32)
    return oh0, oh1


def _hist_kernel(keys_ref, out_ref, *, n_chunks):
    """Per-block tile histogram over block-sorted keys.

    keys_ref: (1, n_chunks, 128) int32 sorted ascending within the block.
    out_ref: (1, n_rows, 128) int32 — counts laid out tile t -> (t//128, t%128).
    """
    out_ref[...] = jnp.zeros_like(out_ref)

    def chunk_body(c, _):
        keys = keys_ref[0, c].reshape(HIST_CHUNK, 1)

        # walk the chunk in 256-wide key windows; w_end (the exclusive end of
        # the processed key range) is always a multiple of 128, so the next
        # window's floor-aligned start never re-covers processed keys
        def cond(w_end):
            return jnp.any(keys >= w_end)

        def body(w_end):
            k0 = jnp.min(jnp.where(keys >= w_end, keys, jnp.int32(1 << 30)))
            w_row = k0 // 128
            oh0, oh1 = _win_onehot_halves(keys, w_row * 128)
            counts = jnp.concatenate(
                [
                    jnp.sum(oh0, axis=0, keepdims=True),
                    jnp.sum(oh1, axis=0, keepdims=True),
                ],
                axis=0,
            ).astype(jnp.int32)  # (2, 128): one ref update per window
            out_ref[0, pl.ds(w_row, 2), :] += counts
            return w_row * 128 + HIST_WIN

        jax.lax.while_loop(cond, body, jnp.int32(0))
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def _dst_kernel(keys_ref, base_ref, out_ref, runhist, *, n_chunks):
    """Aligned destination of every block-sorted pair.

    dst = base[tile] + (same-tile pairs seen in earlier blocks/chunks, from
    the persistent running histogram) + (rank among same-tile keys within
    this chunk, via a strictly-lower-triangular MXU matmul). All lookups are
    one-hot matmuls against the 256-wide key window; values stay exact in
    f32 (< 2^24).
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        runhist[...] = jnp.zeros_like(runhist)

    r = jax.lax.broadcasted_iota(jnp.int32, (HIST_CHUNK, HIST_CHUNK), 0)
    c_ = jax.lax.broadcasted_iota(jnp.int32, (HIST_CHUNK, HIST_CHUNK), 1)
    L = (r > c_).astype(jnp.bfloat16)  # strictly lower: earlier rows count

    def chunk_body(c, _):
        keys = keys_ref[0, c].reshape(HIST_CHUNK, 1)

        def cond(state):
            return jnp.any(keys >= state[0])

        def body(state):
            w_end, acc = state
            k0 = jnp.min(jnp.where(keys >= w_end, keys, jnp.int32(1 << 30)))
            w_row = k0 // 128
            oh0, oh1 = _win_onehot_halves(keys, w_row * 128)
            base2 = base_ref[pl.ds(w_row, 2), :]  # one read per window
            run2 = runhist[pl.ds(w_row, 2), :]

            # one-hot gather from a (1, 128) table row: broadcast multiply +
            # row sum (VPU; dot_general here trips Mosaic's accumulator rule)
            def lane_gather(oh, table_row):
                return jnp.sum(oh * table_row, axis=1, keepdims=True)

            def half(oh, h):
                base_g = lane_gather(oh, base2[h : h + 1, :])
                run_g = lane_gather(oh, run2[h : h + 1, :])
                lower = jax.lax.dot_general(
                    L, oh.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (128, 128): same-key rows above within the chunk
                rank = jnp.sum(lower * oh, axis=1, keepdims=True)
                return base_g + run_g + rank

            acc = acc + half(oh0, 0) + half(oh1, 1)
            counts = jnp.concatenate(
                [
                    jnp.sum(oh0, axis=0, keepdims=True),
                    jnp.sum(oh1, axis=0, keepdims=True),
                ],
                axis=0,
            )
            runhist[pl.ds(w_row, 2), :] = run2 + counts  # one write per window
            return w_row * 128 + HIST_WIN, acc

        _, acc = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.zeros((HIST_CHUNK, 1), jnp.float32)),
        )
        out_ref[0, c, :] = acc.reshape(HIST_CHUNK).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


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


def table_rows(n_tiles: int) -> int:
    """VMEM table rows: tiles (+1 invalid id) plus window overhang padding
    so windows never need clamping."""
    return (n_tiles + 1 + 127) // 128 + HIST_WIN // 128


def _hist_call(keys_s, n_rows, interpret):
    """keys_s (b, SB) block-sorted -> per-block counts (b, n_rows * 128)."""
    b, sb = keys_s.shape
    n_chunks = sb // HIST_CHUNK
    keys3 = keys_s.reshape(b, n_chunks, HIST_CHUNK)
    hist = pl.pallas_call(
        functools.partial(_hist_kernel, n_chunks=n_chunks),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, n_chunks, HIST_CHUNK), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_rows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_rows, 128), jnp.int32),
        interpret=interpret,
    )(keys3)
    return hist.reshape(b, -1)


def _dst_call(keys_s, base_table, interpret):
    """keys_s (b, SB), base_table (n_rows * 128,) f32 -> dst (b * SB,)."""
    b, sb = keys_s.shape
    n_chunks = sb // HIST_CHUNK
    n_rows = base_table.shape[0] // 128
    keys3 = keys_s.reshape(b, n_chunks, HIST_CHUNK)
    dst = pl.pallas_call(
        functools.partial(_dst_kernel, n_chunks=n_chunks),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, n_chunks, HIST_CHUNK), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_chunks, HIST_CHUNK), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_chunks, HIST_CHUNK), jnp.int32),
        scratch_shapes=[pltpu.VMEM((n_rows, 128), jnp.float32)],
        interpret=interpret,
    )(keys3, base_table.reshape(n_rows, 128))
    return dst.reshape(-1)


def build_sorted_bins(
    prep: Preprocessed,
    grid_x: int,
    grid_y: int,
    max_pairs: int,
    m_pad: int,
    tile_y_offset=0,
    grid_y_local: int | None = None,
    pallas_expand: bool = True,
    interpret: bool = False,
    block: int = BLOCK_X,
):
    """Binning for the Pallas compositor, round-4 design: ONE global stable
    sort by tile key, then everything else is closed-form.

    The round 1-3 pipeline (blocked sort -> Pallas histogram + running-
    histogram destination kernels -> aligned scatter -> aligned gather) spent
    ~28 ms/step of kernels + XLA scatter at the bench shape computing each
    pair's chunk-aligned destination. With a GLOBAL sort those quantities
    are positional:

      - tile_start = searchsorted(keys_sorted, arange(T)) — T queries, not
        M (XLA's searchsorted is slow per-query; over tiles it is ~1.6 ms);
      - within-tile rank  = position - tile_start[key];
      - padded (bwd-write) destination = position + delta[key], where
        delta = pad_start - tile_start is NON-DECREASING in tile id (it is a
        cumsum of per-tile pad amounts), so delta-per-pair needs no gather:
        scatter delta[t] at tile_start[t] and forward-fill with cummax
        (owner_of_slot's trick — 0.8 ms at 2.2M pairs).

    The compositor then reads each tile's pairs at UNALIGNED positions
    [tile_start[t] + 128*ci] (overlapping reads across tile boundaries are
    harmless; a per-chunk lane mask from tile_count cuts the tail), and only
    the BACKWARD pair-gradient write uses the private chunk-padded layout
    (disjoint chunks per tile, atomics-free) via ``pad_cstart``.

    Measured vs the aligned pipeline on v5e at 1080p/1M splats/2.2M pairs:
    global sort +5.8 ms, fill +0.8, searchsorted +1.6, in exchange for
    dropping the gidx scatter (-10.2), destination kernel (-11.4), histogram
    kernel (-6.7), and the aligned-layout gather inflation.

    Returns (gauss_s, slot_s, dst_sorted, tile_start, tile_count,
    pad_cstart, nchunk, num_pairs, num_dropped, offsets, order):
      gauss_s (M,) original splat id per sorted pair;
      slot_s (M,) expansion slot per sorted pair (a permutation of [0, M));
      dst_sorted (M,) padded destination (== position + delta fill);
      tile_start/tile_count (T,) pair-space ranges;
      pad_cstart/nchunk (T,) chunk-space ranges of the padded bwd layout;
      offsets (N,) depth-grouped expansion slot starts (segreduce input).
    """
    chunk = 128  # kernel chunk alignment (rasterize_pallas.CHUNK)
    n = prep.depth.shape[0]
    if grid_y_local is None:
        grid_y_local = grid_y
    n_tiles = grid_x * grid_y_local

    key, gauss, order, offsets, total = _expand_keys(
        prep, grid_x, grid_y, max_pairs, tile_y_offset, grid_y_local,
        n_tiles, pallas_expand and m_pad + max_pairs < (1 << 24), interpret,
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
    # each tile's read window rounds DOWN to the chunk boundary and the
    # kernels mask lanes to [phase, phase + count). The padded (backward-
    # write) layout reserves whole window chunks per tile.
    astart = (tile_start // chunk) * chunk
    phase = tile_start - astart
    nchunk = (phase + tile_count + chunk - 1) // chunk
    padded = nchunk * chunk
    pad_start = (jnp.cumsum(padded) - padded).astype(jnp.int32)
    pad_cstart = pad_start // chunk

    # delta fill: pair at sorted position p of tile t lands at padded
    # destination p + delta[t] with delta = pad_start - astart, which is
    # NON-DECREASING in t (padded_t >= the aligned window span — each step
    # is 128*ceil((phase+count)/128) vs 128*floor((phase+count+...)/128)),
    # so the per-pair lookup is a T-point scatter + forward cummax, not a
    # gather
    delta_tbl = pad_start - astart
    marker = jnp.full(max_pairs, -1, jnp.int32)
    marker = marker.at[tile_start].max(delta_tbl, mode="drop")
    delta = jax.lax.cummax(marker)
    dst_sorted = jnp.arange(max_pairs, dtype=jnp.int32) + delta

    return (
        gauss_s,
        slot_s,
        dst_sorted,
        astart,
        phase,
        tile_count,
        pad_cstart,
        nchunk,
        total,
        jnp.maximum(total - max_pairs, 0),
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
    permutation and per-splat slot offsets. Pallas kernel by default; the
    XLA scatter-fill path is the fallback for giant budgets and a CPU-testable
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
    return key, gauss, order, offsets, total


def build_aligned_bins(
    prep: Preprocessed,
    grid_x: int,
    grid_y: int,
    max_pairs: int,
    m_pad: int,
    tile_y_offset=0,
    grid_y_local: int | None = None,
    sort_block: int = 2048,
    pallas_hist_dst: bool = True,
    interpret: bool = False,
    block: int = BLOCK_X,
):
    """Fused binning for the Pallas path: expansion -> *blocked* counting
    sort -> direct scatter into the chunk-aligned pair layout.

    Replaces the global M-element stable sort (a ~20-pass HBM operation on
    TPU) with per-block sorts that fit in VMEM plus a (blocks x tiles)
    histogram prefix — the TPU shape of a radix/counting sort:

      1. expand pairs in depth order into ``max_pairs`` slots (static);
      2. stable-sort each block of ``sort_block`` pairs by tile key
         (depth order preserved within blocks; blocks are depth-ordered);
      3. per-(block, tile) histogram + two small prefix sums give every
         pair's exact destination: aligned_start[tile] + pairs of the same
         tile in earlier blocks + rank within (block, tile) — the rank
         comes from a neighbor-compare/cummax run-start trick, not a scan;
      4. one scatter lands (gaussian id, valid) straight into the aligned
         slots consumed by the kernels. No intermediate tile-sorted arrays.

    Returns (gidx (m_pad,) in *original index space*, order (N,) the depth
    permutation, valid (m_pad,), cstart (T,), nchunk (T,), tile_count (T,),
    num_pairs, num_dropped, dst, slot_s, offsets). ``offsets`` group the
    expansion slots by depth rank; the depth-rank-k group belongs to
    original splat order[k].
    """
    chunk = 128  # kernel chunk alignment (rasterize_pallas.CHUNK)
    n = prep.depth.shape[0]
    if grid_y_local is None:
        grid_y_local = grid_y
    n_tiles = grid_x * grid_y_local

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

    use_pallas = pallas_hist_dst and m_pad + max_pairs < (1 << 24)
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
        slot = jnp.arange(max_pairs, dtype=jnp.int32)
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

    # (2) blocked stable sort by tile key; payloads: gaussian id + the
    # expansion slot id (the latter gives the slot -> aligned-slot map the
    # backward segment-reduce needs)
    b = max_pairs // sort_block
    keys_b = key.reshape(b, sort_block)
    gauss_b = gauss.reshape(b, sort_block)
    slot_b = slot.reshape(b, sort_block)
    keys_s, gauss_s, slot_s = jax.lax.sort(
        (keys_b, gauss_b, slot_b), dimension=1, num_keys=1, is_stable=True
    )

    if use_pallas:
        # (3 + 4a) Pallas counting-sort kernels (see module section above):
        # windowed per-block histogram, then per-pair destinations from a
        # persistent running histogram — no scatter-add, no take_along, no
        # rank cummax.
        n_rows = table_rows(n_tiles)
        hist_blocks = _hist_call(keys_s, n_rows, interpret)
        tile_count = jnp.sum(hist_blocks, axis=0)[:n_tiles]
        padded = ((tile_count + chunk - 1) // chunk) * chunk
        pad_start = (jnp.cumsum(padded) - padded).astype(jnp.int32)
        base_table = jnp.zeros(n_rows * 128, jnp.float32)
        base_table = base_table.at[:n_tiles].set(pad_start.astype(jnp.float32))
        base_table = base_table.at[n_tiles].set(float(m_pad))
        dst = _dst_call(keys_s, base_table, interpret)
    else:
        # (3a) rank within (block, tile): distance from the run start
        idx = jax.lax.broadcasted_iota(jnp.int32, (b, sort_block), 1)
        is_start = jnp.concatenate(
            [
                jnp.ones((b, 1), bool),
                keys_s[:, 1:] != keys_s[:, :-1],
            ],
            axis=1,
        )
        run_start = jax.lax.cummax(jnp.where(is_start, idx, -1), axis=1)
        rank = idx - run_start

        # (3b) per-(block, tile) histogram and prefixes
        flat = keys_s + jax.lax.broadcasted_iota(
            jnp.int32, (b, sort_block), 0
        ) * (n_tiles + 1)
        hist = jax.ops.segment_sum(
            jnp.ones((b * sort_block,), jnp.int32),
            flat.reshape(-1),
            num_segments=b * (n_tiles + 1),
        ).reshape(b, n_tiles + 1)
        col_base = jnp.cumsum(hist, axis=0) - hist  # pairs of this tile above
        tile_count = jnp.sum(hist, axis=0)[:n_tiles]

        padded = ((tile_count + chunk - 1) // chunk) * chunk
        pad_start = (jnp.cumsum(padded) - padded).astype(jnp.int32)
        pad_start_ext = jnp.concatenate(
            [pad_start, jnp.asarray([m_pad], jnp.int32)]
        )

        # (4) destination + scatter: fold the (small) aligned starts into
        # the per-(block, tile) bases — a single base gather per pair.
        combined_base = col_base + pad_start_ext[None, :]
        dst = jnp.take_along_axis(combined_base, keys_s, axis=1) + rank
        dst = jnp.where(keys_s < n_tiles, dst, m_pad).reshape(-1)
    # every kept pair has a distinct destination; dropped pairs all carry
    # dst == m_pad, so spread them across unique out-of-bounds slots to let
    # XLA take the unique-indices scatter path (no serialization)
    dstu = dst.reshape(-1)
    dstu = jnp.where(
        dstu < m_pad,
        dstu,
        m_pad + jnp.arange(dstu.shape[0], dtype=jnp.int32),
    )
    gidx = (
        jnp.full(m_pad, -1, jnp.int32)
        .at[dstu]
        .set(gauss_s.reshape(-1), mode="drop", unique_indices=True)
    )
    valid = gidx >= 0
    # dst/slot_s (both in sorted-block order) give the backward pass its
    # aligned->expansion routing: gather cotangents by ``dst`` (ascending
    # within each block — pad_start is monotone in tile id, so the gather has
    # near-sequential HBM locality) and scatter by ``slot_s`` into expansion
    # order, where each splat's pairs are CONTIGUOUS
    # ([offsets_i, offsets_i + ntiles_i)) and a Pallas segment-reduce replaces
    # XLA's serialized scatter-add. (A single direct gather by the composed
    # slot->dst map cost ~100 ms at 4M pairs — its indices jump across the
    # whole aligned array, defeating HBM read locality.)

    return (
        gidx,
        order,
        valid,
        pad_start // chunk,
        (padded // chunk).astype(jnp.int32),
        tile_count,
        total,
        jnp.maximum(total - max_pairs, 0),
        dst,
        slot_s.reshape(-1),
        offsets,
    )


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


