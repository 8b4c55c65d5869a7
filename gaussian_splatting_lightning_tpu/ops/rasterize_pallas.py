"""Pallas TPU compositing kernels: the performance core.

TPU-native redesign of the CUDA tile renderer (reference N1's renderCUDA /
renderBackwardCUDA): one grid program per tile (32x32 px by default —
TilingConfig.block) walks its depth-sorted pair list in 128-splat chunks held
in VMEM. Reference membership semantics stay exactly 16px-granular via the
per-pair rect rows (F_X0..F_Y1), so rendered values are tile-size-invariant.

Key departures from the CUDA design, forced/enabled by the hardware:

- Pair features live feature-major ``(16, M)`` in the globally TILE-SORTED
  pair order (ops/binning.py build_sorted_bins): each tile's pairs are a
  contiguous [tile_start, tile_start + count) range, read by the kernels as
  128-aligned window chunks with a [phase, phase + count) lane mask
  (Mosaic requires aligned lane DMA starts). In-kernel tiles put *pixels
  on sublanes (256) and pairs on lanes (128)*.
- The serial front-to-back transmittance product becomes an *exclusive
  cumulative sum of log1p(-alpha) via a strictly-triangular matmul on the
  MXU* (alpha <= 0.99 keeps the log well-conditioned), so a whole chunk
  composites in parallel instead of CUDA's per-splat loop.
- The backward pass needs the classic suffix sums S_j = sum_{k>j} w_k c_k.
  Instead of CUDA's back-to-front re-walk with atomicAdd into global memory,
  we walk *front-to-back again* using suffix = total - prefix (totals are
  forward outputs) and write gradients UNPADDED into the sorted-pair
  stream; the one chunk a tile can share with its neighbour is composed
  through a VMEM carry across the (sequential) grid — atomics-free by
  construction. The per-pair cotangents are then grouped by ORIGINAL splat
  id with one unstable payload sort and summed by the _segreduce_kernel: a
  streamed one-hot MXU matmul over each splat's contiguous group (bf16
  rows by default, f32 accumulation) — see make_pair_pipeline.
- Per-pixel state across chunks (transmittance, prefix accumulators) lives in
  VMEM scratch; early termination of a saturated tile is a while-loop exit
  rather than a warp vote.

Everything upstream (preprocess, binning, pair gather) is differentiable jnp;
jax.custom_vjp wraps only this compositing stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_splatting_lightning_tpu.ops.common import (
    ALPHA_CLAMP,
    ALPHA_THRESHOLD,
    TRANSMITTANCE_EPS,
)

CHUNK = 128  # pairs per VMEM chunk (lane dimension)
SLAB = 256  # pixel rows per bwd-kernel step (VMEM working-set bound)
PALLAS_BLOCK = 32  # default tile edge (px) for this path; see TilingConfig
NFEAT = 16  # px py ca cb cc op r g b invz (6 pad); == grad rows
NOUT = 4  # r g b invd (tfin was row 4 through round 4 — never consumed;
# dropping it halves the output canvas, and the canvas is channel-first
# (T, NOUT, pix) so its lane dim is pixels — a (pix, 4) minor dim would
# tile 4 -> 128 lanes, a 32x physical inflation every consumer pays)

F_PX, F_PY, F_CA, F_CB, F_CC, F_OP, F_R, F_G, F_B, F_IZ = range(10)
# At tile sizes other than the reference's 16 px, rows 10-13 carry the
# splat's 16px-granular tile rect (x0, x1, y0, y1): the reference applies
# its 3-sigma/support-radius cut at 16px-TILE granularity (rasterize.py:
# 129-152 membership rects), and a 3-sigma tail pixel can still have
# alpha > 1/255 — so membership is part of the value spec, not scheduling.
# The kernels re-apply that exact 16px rect per pixel, making rendered
# values tile-size-invariant (checked vs the oracle at 5e-6).
F_X0, F_X1, F_Y0, F_Y1 = 10, 11, 12, 13


def _pixel_coords(origin_x, origin_y, dtype, pix, block_x):
    """(pix, 1) x/y pixel-center coordinates, y-major pixel order."""
    p = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    px = (p % block_x).astype(dtype) + origin_x
    py = (p // block_x).astype(dtype) + origin_y
    return px, py


def _strict_upper(dtype):
    """(128, 128) strictly-upper ones: x @ U = exclusive cumsum over lanes."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (r < c).astype(dtype)


def _subtile_coords(px, py, rect_mask):
    """Hoisted per-tile 16px-subtile coords for _chunk_alpha (pure pixel
    functions — recomputing them per chunk/slab wasted VPU passes)."""
    if not rect_mask:
        return None
    return jnp.floor(px * (1.0 / 16.0)), jnp.floor(py * (1.0 / 16.0))


def _chunk_alpha(chunk, px, py, sxy):
    """Shared fwd/bwd math: chunk (NFEAT, 128) -> (pix, 128) fields."""
    dx = chunk[F_PX : F_PX + 1, :] - px  # (pix, 128)
    dy = chunk[F_PY : F_PY + 1, :] - py
    power = -0.5 * (
        chunk[F_CA : F_CA + 1, :] * dx * dx
        + 2.0 * chunk[F_CB : F_CB + 1, :] * dx * dy
        + chunk[F_CC : F_CC + 1, :] * dy * dy
    )
    e = jnp.exp(power)
    raw = e * chunk[F_OP : F_OP + 1, :]
    alpha = jnp.minimum(raw, ALPHA_CLAMP)
    keep = alpha > ALPHA_THRESHOLD
    if sxy is not None:
        # pixel's 16px subtile vs the pair's reference-granularity rect
        sx, sy = sxy
        keep = (
            keep
            & (sx >= chunk[F_X0 : F_X0 + 1, :])
            & (sx < chunk[F_X1 : F_X1 + 1, :])
            & (sy >= chunk[F_Y0 : F_Y0 + 1, :])
            & (sy < chunk[F_Y1 : F_Y1 + 1, :])
        )
    alpha = jnp.where(keep, alpha, 0.0)
    return dx, dy, e, raw, alpha


def _lane_valid(ci, phase, count, dtype):
    """(1, 128) mask: window position ci*128+j is inside this tile's
    [phase, phase + count) pair range.

    Tile pair ranges are UNALIGNED in the sorted pair stream (round-4
    binning), but Mosaic requires 128-aligned lane DMA slices — so each
    tile reads from the rounded-down chunk boundary and masks the leading
    ``phase`` lanes (the previous tile's pairs) and the tail (the next
    tile's) to alpha 0, removing them exactly."""
    lane = ci * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    return ((lane >= phase) & (lane < phase + count)).astype(dtype)


def _fwd_kernel(
    # scalar prefetch
    astart_ref, nchunk_ref, phase_ref, count_ref, ox_ref, oy_ref,
    # inputs
    feats_hbm, bg_ref,
    # outputs
    out_ref,
    # scratch
    buf, sem, tcar, acc,
    *, early_stop: bool, pix: int, block_x: int, rect_mask: bool,
):
    t = pl.program_id(0)
    dtype = out_ref.dtype
    px, py = _pixel_coords(
        ox_ref[t].astype(dtype), oy_ref[t].astype(dtype), dtype, pix, block_x
    )
    U = _strict_upper(dtype)
    tstart = pl.multiple_of(astart_ref[t], CHUNK)  # aligned window origin
    n_chunks = nchunk_ref[t]
    phase = phase_ref[t]
    count = count_ref[t]

    sxy = _subtile_coords(px, py, rect_mask)
    tcar[...] = jnp.ones((pix, 1), dtype)
    acc[...] = jnp.zeros((pix, 4), dtype)

    def get_dma(slot, ci):
        return pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(tstart + ci * CHUNK, CHUNK)],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(state):
        ci, _ = state
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            get_dma(1 - slot, ci + 1).start()

        get_dma(slot, ci).wait()
        chunk = buf[slot]  # (NFEAT, 128)
        _, _, _, _, alpha = _chunk_alpha(chunk, px, py, sxy)
        alpha = alpha * _lane_valid(ci, phase, count, dtype)

        lw = jnp.log1p(-alpha)  # alpha <= 0.99 -> well-conditioned
        cum_excl = jnp.dot(lw, U, preferred_element_type=dtype)
        t_in = tcar[...] * jnp.exp(cum_excl)  # (256, 128)
        w = jnp.where(t_in > TRANSMITTANCE_EPS, alpha * t_in, 0.0)

        rgbz = chunk[F_R : F_R + 4, :]  # (4, 128): r g b invz
        contrib = jax.lax.dot_general(
            w, rgbz, (((1,), (1,)), ((), ())), preferred_element_type=dtype
        )  # (256, 4)
        acc[:, 0:4] += contrib
        tcar[...] = tcar[...] * jnp.exp(
            jnp.sum(lw, axis=1, keepdims=True)
        )
        return ci + 1, jnp.max(tcar[...])

    def cond(state):
        ci, tmax = state
        alive = ci < n_chunks
        if early_stop:
            alive = jnp.logical_and(alive, tmax > TRANSMITTANCE_EPS)
        return alive

    final_ci, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.asarray(1.0, dtype))
    )
    if early_stop:
        # Early exit leaves the prefetched DMA for chunk final_ci in flight;
        # drain it or the dangling semaphore corrupts the next grid step.
        @pl.when(final_ci < n_chunks)
        def _():
            get_dma(jax.lax.rem(final_ci, 2), final_ci).wait()

    color = acc[:, 0:3] + tcar[...] * bg_ref[0:1, 0:3]  # bg composited in
    # channel-first (NOUT, pix): lanes = pixels. A (pix, NOUT) canvas
    # tiles its 4-wide minor dim to 128 lanes on TPU — a 32x physical
    # inflation every producer/consumer pays; one in-register transpose
    # here keeps the whole canvas lane-dense (round-5 layout fix)
    out_ref[0] = jnp.concatenate([color, acc[:, 3:4]], axis=1).T


def _bwd_kernel(
    # scalar prefetch
    astart_ref, nchunk_ref, phase_ref, count_ref, ox_ref, oy_ref,
    # inputs
    feats_hbm, bg_ref, fwd_out_ref, ct_ref, dfeats_init_hbm,
    # outputs (aliased with dfeats_init: chunks outside every range stay 0)
    dfeats_hbm,
    # scratch
    buf, sem, dbuf, dsem, carry, csem, cstate, tcar, gapre,
    *, pix: int, block_x: int, rect_mask: bool, early_stop: bool,
):
    """Per-pair gradients written UNPADDED, straight into the sorted-pair
    stream at each tile's aligned window (round-5 design).

    Adjacent tiles share at most their boundary chunk (window origins round
    down to 128). The TPU grid is a sequential loop, so the shared chunk is
    composed through a VMEM ``carry``: every program STASHES its last
    chunk's gradients instead of writing them; the next non-empty program
    either MERGES the carry into its first chunk (same global chunk) or
    FLUSHES it to HBM (disjoint). Interior chunks are exclusively owned and
    stream out double-buffered as before. Chunks never written stay zero via
    the aliased zero init (early-stopped tails, gaps from empty tiles).

    ``cstate`` (SMEM): [0] carry's global chunk index or -1, [1] flush
    in flight?, [2] flush target chunk index.
    """
    t = pl.program_id(0)
    dtype = ct_ref.dtype
    px, py = _pixel_coords(
        ox_ref[t].astype(dtype), oy_ref[t].astype(dtype), dtype, pix, block_x
    )
    U = _strict_upper(dtype)
    tstart = pl.multiple_of(astart_ref[t], CHUNK)  # aligned window origin
    gci0 = tstart // CHUNK  # global chunk index of this tile's first chunk
    n_chunks = nchunk_ref[t]
    phase = phase_ref[t]
    count = count_ref[t]

    @pl.when(t == 0)
    def _():
        cstate[0] = -1
        cstate[1] = 0
        cstate[2] = 0
        carry[...] = jnp.zeros_like(carry)  # the unconditional read below
        # must never see garbage (NaN would survive even a 0-multiply)

    def carry_flush_dma(cidx):
        return pltpu.make_async_copy(
            carry,
            dfeats_hbm.at[:, pl.ds(cidx * CHUNK, CHUNK)],
            csem,
        )

    G = ct_ref[0].T  # (pix, NOUT) dL/d[r g b invd]
    fwd = fwd_out_ref[0].T  # (pix, NOUT)
    # Gtotal'[p] = sum_f G*total'_f with total'_rgb = color_with_bg (already
    # contains the T_fin*bg term) and total'_d = total inverse depth; then
    # suffix-through-j = Gtotal' - prefix_incl (see module docstring).
    g_total = jnp.sum(G * fwd[:, 0:4], axis=1, keepdims=True)  # (256, 1)

    sxy = _subtile_coords(px, py, rect_mask)
    tcar[...] = jnp.ones((pix, 1), dtype)
    gapre[...] = jnp.zeros((pix, 1), dtype)  # sum_f G * prefix_f

    def get_dma(slot, ci):
        return pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(tstart + ci * CHUNK, CHUNK)],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    # Pixels are processed in 256-row slabs (statically unrolled): the bwd
    # math holds ~20 live (pixels, 128) temporaries, and at 32px tiles
    # (pix=1024) the full-tile working set (~10 MB/chunk) thrashed VMEM —
    # 56 ms vs the forward's 6 ms. Per-pair gradients are pixel sums, so
    # slabs just accumulate into one (NFEAT, 128) block.
    slab = SLAB if pix % SLAB == 0 else pix
    n_slabs = pix // slab

    def body(state):
        ci, _ = state
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            get_dma(1 - slot, ci + 1).start()

        get_dma(slot, ci).wait()
        chunk = buf[slot]  # (NFEAT, 128)
        rgbz = chunk[F_R : F_R + 4, :]  # (4, 128)
        ca = chunk[F_CA : F_CA + 1, :]
        cb = chunk[F_CB : F_CB + 1, :]
        cc = chunk[F_CC : F_CC + 1, :]

        def colsum(x):  # (slab, 128) -> (1, 128): reduce over pixels
            return jnp.sum(x, axis=0, keepdims=True)

        lane_ok = _lane_valid(ci, phase, count, dtype)
        grad = jnp.zeros((NFEAT, CHUNK), dtype)
        for s in range(n_slabs):
            sl = slice(s * slab, (s + 1) * slab)
            sxy_sl = None if sxy is None else (sxy[0][sl], sxy[1][sl])
            dx, dy, e, raw, alpha = _chunk_alpha(
                chunk, px[sl], py[sl], sxy_sl
            )
            alpha = alpha * lane_ok
            lw = jnp.log1p(-alpha)
            cum_excl = jnp.dot(lw, U, preferred_element_type=dtype)
            t_in = tcar[sl, :] * jnp.exp(cum_excl)
            live = t_in > TRANSMITTANCE_EPS
            w = jnp.where(live, alpha * t_in, 0.0)  # (slab, 128)

            E = jnp.dot(G[sl], rgbz, preferred_element_type=dtype)
            wE = w * E
            # inclusive prefix = exclusive prefix + self: reuse the U matmul
            prefix_incl = gapre[sl, :] + jnp.dot(
                wE, U, preferred_element_type=dtype
            ) + wE
            suffix = g_total[sl] - prefix_incl  # G.(suffix colors + Tfin*bg)
            has_grad = alpha > 0.0  # thresholded alphas detach entirely
            # 1/(1-alpha) == exp(-log1p(-alpha)) — reuses lw and replaces a
            # multi-pass VPU divide with one transcendental
            d_alpha = jnp.where(
                has_grad,
                jnp.where(live, E * t_in, 0.0) - suffix * jnp.exp(-lw),
                0.0,
            )
            unclamped = raw < ALPHA_CLAMP
            d_power = jnp.where(unclamped, d_alpha * alpha, 0.0)  # op*e

            # moment-sum refactor: the position/conic gradients are
            # per-pair linear combinations of five pixel-reduced moments
            # of d_power (ca/cb/cc are per-pair constants), so build five
            # (slab, 128) products instead of six full gradient fields and
            # apply the coefficients on (1, 128) rows after the reduction
            t1 = d_power * dx
            t2 = d_power * dy
            m0 = colsum(d_power)
            m1x, m1y = colsum(t1), colsum(t2)
            m2xx = colsum(t1 * dx)
            m2xy = colsum(t1 * dy)
            m2yy = colsum(t2 * dy)

            d_rgbz = jax.lax.dot_general(
                G[sl], w, (((0,), (0,)), ((), ())),
                preferred_element_type=dtype,
            )  # (4, 128)
            grad = grad + jnp.concatenate(
                [
                    -(ca * m1x + cb * m1y), -(cb * m1x + cc * m1y),
                    -0.5 * m2xx,
                    -m2xy,
                    -0.5 * m2yy,
                    # d_op = sum_px d_alpha*e = sum_px d_power / op (for
                    # unclamped alphas, alpha = e*op): one per-lane divide
                    # instead of a full (slab, 128) field + reduction
                    m0 / jnp.maximum(chunk[F_OP : F_OP + 1, :], 1e-30),
                    d_rgbz,
                    jnp.zeros((NFEAT - 10, CHUNK), dtype),
                ],
                axis=0,
            )  # (NFEAT, 128)
            gapre[sl, :] = gapre[sl, :] + jnp.sum(wE, axis=1, keepdims=True)
            tcar[sl, :] = tcar[sl, :] * jnp.exp(
                jnp.sum(lw, axis=1, keepdims=True)
            )

        # write this chunk's pair grads (cast to the routing dtype — bf16 by
        # default: the downstream sort + segment-reduce are HBM/issue bound
        # and the per-pair cotangents tolerate 8-bit mantissas; accumulation
        # back into per-splat sums happens in f32 on the MXU).
        gci = gci0 + ci
        # first chunk: consume the carry — merge it if it IS my first chunk,
        # flush it to its (now settled) HBM chunk otherwise
        use_carry = (ci == 0) & (cstate[0] == gci)
        grad = grad + jnp.where(
            use_carry, carry[...].astype(dtype), 0.0
        )

        @pl.when((ci == 0) & (cstate[0] >= 0) & (cstate[0] != gci))
        def _():
            cstate[1] = 1
            cstate[2] = cstate[0]
            carry_flush_dma(cstate[0]).start()

        @pl.when(ci == 0)
        def _():
            cstate[0] = -1

        def get_out_dma(slot, cj):
            return pltpu.make_async_copy(
                dbuf.at[slot],
                dfeats_hbm.at[:, pl.ds((gci0 + cj) * CHUNK, CHUNK)],
                dsem.at[slot],
            )

        is_last = ci == n_chunks - 1

        # interior chunks (exclusively owned): double-buffered stream-out —
        # only wait for the DMA that used this slot two chunks ago (a
        # blocking wait per chunk serialized the kernel on the write)
        @pl.when(jnp.logical_not(is_last))
        def _():
            oslot = jax.lax.rem(ci, 2)

            @pl.when(ci >= 2)
            def _():
                get_out_dma(oslot, ci - 2).wait()

            dbuf[oslot] = grad.astype(dbuf.dtype)
            get_out_dma(oslot, ci).start()

        # last chunk: stash in the carry for the next program (the chunk may
        # be shared with its window origin); wait any in-flight flush first
        # so the buffer is free to overwrite
        @pl.when(is_last)
        def _():
            @pl.when(cstate[1] == 1)
            def _():
                carry_flush_dma(cstate[2]).wait()
                cstate[1] = 0

            carry[...] = grad.astype(carry.dtype)
            cstate[0] = gci

        # Early stop mirrors the forward: once every pixel's transmittance
        # is below the stop threshold, all remaining pairs had w = 0 in the
        # forward and their gradients are exactly zero — their chunks stay
        # zero via the aliased zero init (and the carry stays unset, so a
        # neighbour sharing the boundary chunk just writes its own values).
        return ci + 1, jnp.max(tcar[...])

    def cond(state):
        ci, tmax = state
        alive = ci < n_chunks
        if early_stop:
            alive = jnp.logical_and(alive, tmax > TRANSMITTANCE_EPS)
        return alive

    final_ci, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.asarray(1.0, dtype))
    )
    if early_stop:
        # drain the prefetched input DMA left in flight by an early exit
        @pl.when(final_ci < n_chunks)
        def _():
            get_dma(jax.lax.rem(final_ci, 2), final_ci).wait()

    # drain in-flight output DMAs before the next grid step reuses the
    # slots; chunks written = [0, nw) (the last chunk was stashed, not
    # written, and an early stop wrote only up to final_ci)
    def drain_dma(cj):
        return pltpu.make_async_copy(
            dbuf.at[jax.lax.rem(cj, 2)],
            dfeats_hbm.at[:, pl.ds((gci0 + cj) * CHUNK, CHUNK)],
            dsem.at[jax.lax.rem(cj, 2)],
        )

    nw = jnp.minimum(final_ci, n_chunks - 1)

    @pl.when(nw >= 1)
    def _():
        drain_dma(nw - 1).wait()

    @pl.when(nw >= 2)
    def _():
        drain_dma(nw - 2).wait()

    # final program: settle the carry (and any flush left in flight)
    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        @pl.when(cstate[1] == 1)
        def _():
            carry_flush_dma(cstate[2]).wait()
            cstate[1] = 0

        @pl.when(cstate[0] >= 0)
        def _():
            f = carry_flush_dma(cstate[0])
            f.start()
            f.wait()


def _fwd_call(feats, bg, astart, nchunk, phase, count, ox, oy, n_tiles,
              interpret, early_stop, pix, block_x, rect_mask):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, NOUT, pix), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NFEAT, CHUNK), feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((pix, 1), feats.dtype),
            pltpu.VMEM((pix, 4), feats.dtype),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, early_stop=early_stop, pix=pix, block_x=block_x,
            rect_mask=rect_mask,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, NOUT, pix), feats.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(astart, nchunk, phase, count, ox, oy, feats, bg)


def _bwd_call(feats, bg, fwd_out, ct, astart, nchunk, phase, count,
              max_pairs, ox, oy, n_tiles, interpret, pix,
              block_x, rect_mask, early_stop, grad_dtype=None):
    grad_dtype = grad_dtype or feats.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, NOUT, pix), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, NOUT, pix), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, NFEAT, CHUNK), feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, NFEAT, CHUNK), grad_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((NFEAT, CHUNK), grad_dtype),  # boundary-chunk carry
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((3,), jnp.int32),  # carry idx / flush flag / target
            pltpu.VMEM((pix, 1), feats.dtype),
            pltpu.VMEM((pix, 1), feats.dtype),
        ],
    )
    dfeats_init = jnp.zeros((NFEAT, max_pairs), grad_dtype)
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, pix=pix, block_x=block_x, rect_mask=rect_mask,
            early_stop=early_stop,
        ),
        out_shape=jax.ShapeDtypeStruct((NFEAT, max_pairs), grad_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases={10: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(astart, nchunk, phase, count, ox, oy, feats, bg, fwd_out,
      ct, dfeats_init)


# -- backward segment-reduce: per-splat sums over contiguous slot ranges ----

SEG_CHUNK = 512  # dslot rows per DMA
SEG_SPLATS = 128  # splats per grid program


def _segreduce_kernel(
    # scalar prefetch
    pstart_ref, pchunks_ref, total_ref,
    # inputs
    counts_ref, dslot_hbm,
    # outputs
    out_ref,
    # scratch
    buf, sem, acc,
):
    """out[g] = sum of dslot columns in [offsets_g, offsets_g + counts_g).

    One program owns 128 consecutive splats (ORIGINAL id order since round
    5 — the gauss-key payload sort groups each splat's cotangents
    contiguously, so the reduction lands directly in original order). The
    reduction is a streamed one-hot matmul on the MXU — no scatter, no
    atomics (the XLA scatter-add this replaces ran at ~85 ns/row).
    ``dslot_hbm`` is feature-major (NFEAT, M); lane windows start
    128-aligned (program starts are rounded down — the one-hot mask
    excludes the other programs' leading slots).
    """
    b = pl.program_id(0)
    dtype = out_ref.dtype
    pstart = pstart_ref[b]
    astart = (pstart // 128) * 128  # aligned DMA origin
    n_chunks = pchunks_ref[b]
    total = total_ref[0]

    cnt = counts_ref[0, 0:1, :].astype(dtype)  # (1, 128)
    U = _strict_upper(dtype)
    off_rel = jnp.dot(cnt, U, preferred_element_type=dtype)  # exclusive cumsum
    off_abs = off_rel + pstart.astype(dtype)  # (1, 128)
    off_next = off_abs + cnt

    acc[...] = jnp.zeros((NFEAT, SEG_SPLATS), dtype)

    def get_dma(slot, ci):
        return pltpu.make_async_copy(
            dslot_hbm.at[:, pl.ds(astart + ci * SEG_CHUNK, SEG_CHUNK)],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(ci, _):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            get_dma(1 - slot, ci + 1).start()

        get_dma(slot, ci).wait()
        rows = buf[slot]  # (NFEAT, SEG_CHUNK), possibly bf16
        slotg = (
            astart + ci * SEG_CHUNK
            + jax.lax.broadcasted_iota(jnp.int32, (SEG_CHUNK, 1), 0)
        ).astype(dtype)  # f32 compares stay exact below 2^24 slots
        onehot = (
            (slotg >= off_abs) & (slotg < off_next)
            & (slotg < total.astype(dtype))
        ).astype(rows.dtype)  # (SEG_CHUNK, 128); 0/1 exact in bf16
        # bf16 rows: MXU-native, exact. f32 rows: DEFAULT precision would
        # round them to bf16 on the MXU — which made the "f32 routing"
        # config bit-identical to bf16 routing (measured round 5). The
        # one-hot side is exactly representable, so HIGHEST keeps f32 rows
        # exact; only the f32 (parity/test) config pays the extra passes.
        precision = (
            None if rows.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST
        )
        acc[...] += jax.lax.dot_general(
            rows, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=dtype, precision=precision,
        )  # (NFEAT, 128) accumulated in f32 on the MXU
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[0] = acc[...]


def _segreduce_call(dslot, counts2d, pstart, pchunks, total_arr, interpret):
    n_blocks = counts2d.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, SEG_SPLATS), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, NFEAT, SEG_SPLATS), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NFEAT, SEG_CHUNK), dslot.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((NFEAT, SEG_SPLATS), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _segreduce_kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks, NFEAT, SEG_SPLATS), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pstart, pchunks, total_arr, counts2d, dslot)


NGRAD = 10  # live gradient rows: ddx ddy 3x dconic dop 4x drgbz


def make_pair_pipeline(
    n: int,
    n_tiles: int,
    interpret: bool = False,
    early_stop: bool = True,
    block: int = PALLAS_BLOCK,
    grad_bf16: bool = True,
):
    """Pair gather + compositing as ONE custom_vjp.

    Forward: feats = gfeat_T[:, gidx] (a lane gather from the (16, N)
    original-order splat table), then the Pallas compositor.

    Backward (all hand-rolled — none of this is XLA AD):
      1. the bwd compositor kernel writes per-pair cotangents UNPADDED into
         the sorted-pair stream (boundary chunks merged through its VMEM
         carry), in ``bf16`` when ``grad_bf16`` (default): the routing
         below is HBM/issue bound, per-pair gradients tolerate 8-bit
         mantissas, and keeping the boundary *inside* this custom_vjp keeps
         the op's own cotangent f32 like its primal;
      2. ONE unstable sort keyed by ORIGINAL splat id carries the NGRAD
         cotangent rows into per-splat groups. This replaced round 4's
         slot-inversion sort + M-sized cotangent gather + final N-sized
         permutation gather: TPU gathers cost ~6.4 ns/row regardless of
         layout/width/coherence (measured round 5 — row-major, blocked,
         narrow, and coherent-index variants all tie), while a sort
         payload costs ~1.6 ns/row/operand, so moving the rows with the
         sort wins ~9 ms at 2.2M pairs;
      3. a Pallas segment-reduce sums each splat's contiguous group (group
         lengths = the rect pair counts ``ntiles``; culled pairs ride along
         with zero cotangents) straight into ORIGINAL splat order with f32
         MXU accumulation. On pair-budget overflow (dropped pairs) a
         lax.cond branch computes the per-splat PRESENT counts instead —
         only that rare step pays the inverse-permutation gather.
    """
    n_blocks = -(-n // SEG_SPLATS)
    n_pad = n_blocks * SEG_SPLATS
    pix = block * block
    rect_mask = block != 16
    grad_dtype = jnp.bfloat16 if grad_bf16 else None

    def _gather(gfeat_t, gauss_pad):
        # ONE row gather builds the sorted-order pair features; tail lanes
        # of boundary chunks are cut by the in-kernel count mask, so no
        # validity multiply is needed
        return jnp.take(gfeat_t, gauss_pad, axis=1)

    @jax.custom_vjp
    def run(gfeat_t, gauss_pad, slot_sorted, ntiles, offsets_depth, order,
            total, bg, astart, nchunk, phase, count, ox, oy):
        feats = _gather(gfeat_t, gauss_pad)
        return _fwd_call(
            feats, bg, astart, nchunk, phase, count, ox, oy, n_tiles,
            interpret, early_stop, pix, block, rect_mask,
        )

    def fwd(gfeat_t, gauss_pad, slot_sorted, ntiles, offsets_depth, order,
            total, bg, astart, nchunk, phase, count, ox, oy):
        feats = _gather(gfeat_t, gauss_pad)
        out = _fwd_call(
            feats, bg, astart, nchunk, phase, count, ox, oy, n_tiles,
            interpret, early_stop, pix, block, rect_mask,
        )
        return out, (feats, bg, out, gauss_pad, slot_sorted, ntiles,
                     offsets_depth, order, total, astart, nchunk, phase,
                     count, ox, oy)

    def bwd(res, ct):
        (feats, bg, out, gauss_pad, slot_sorted, ntiles, offsets_depth,
         order, total, astart, nchunk, phase, count, ox, oy) = res
        max_pairs = slot_sorted.shape[0]
        # full-NOUT cotangent canvas goes straight to the kernel (rows
        # 0:4 used in-kernel; a host-side ct[:, :, 0:4] slice cost 3.2 ms)
        dcols_t = _bwd_call(
            feats, bg, out, ct, astart, nchunk, phase, count,
            max_pairs, ox, oy, n_tiles, interpret, pix, block, rect_mask,
            early_stop, grad_dtype,
        )  # (NFEAT, max_pairs) grad dtype, sorted-pair order; zero outside
        # every tile range (aliased zero init)

        # group per-pair cotangents by ORIGINAL splat id: dead slots beyond
        # the real pair count get a sentinel key (n) and sort past every
        # real group; culled pairs keep their splat's key and contribute
        # exact zeros (they sit past every tile's range in the stream)
        cap = jnp.minimum(total, max_pairs).astype(jnp.int32)
        gauss_sl = jax.lax.slice_in_dim(gauss_pad, 0, max_pairs)
        gkey = jnp.where(slot_sorted < cap, gauss_sl, jnp.int32(n))
        if dcols_t.dtype == jnp.bfloat16:
            # pack bf16 row pairs into u32 words: sort payloads cost
            # ~1.6 ms/operand at 2.2M pairs regardless of element width
            # (measured round 5), so 5 packed words beat 10 bf16 rows
            def pack2(a, b):
                lo = jax.lax.bitcast_convert_type(a, jnp.uint16).astype(
                    jnp.uint32
                )
                hi = jax.lax.bitcast_convert_type(b, jnp.uint16).astype(
                    jnp.uint32
                )
                return (hi << 16) | lo

            packed = [
                pack2(dcols_t[2 * i], dcols_t[2 * i + 1])
                for i in range(NGRAD // 2)
            ]
            sorted_ops = jax.lax.sort(
                (gkey, *packed), dimension=0, num_keys=1, is_stable=False
            )

            def unpack2(w):
                lo = jax.lax.bitcast_convert_type(
                    (w & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16
                )
                hi = jax.lax.bitcast_convert_type(
                    (w >> 16).astype(jnp.uint16), jnp.bfloat16
                )
                return lo, hi

            rows = [r for wd in sorted_ops[1:] for r in unpack2(wd)]
        else:
            sorted_ops = jax.lax.sort(
                (gkey, *(dcols_t[f] for f in range(NGRAD))),
                dimension=0, num_keys=1, is_stable=False,
            )
            rows = list(sorted_ops[1:])
        zrow = jnp.zeros((max_pairs,), dcols_t.dtype)
        dslot = jnp.stack(rows + [zrow] * (NFEAT - NGRAD), axis=0)
        dslot = jnp.pad(dslot, ((0, 0), (0, SEG_CHUNK + 128)))

        # per-splat group geometry in original order. No drops (the
        # operating point): lengths are exactly the rect pair counts. With
        # drops: the farthest DEPTH-ranked slots were cut, so each splat
        # keeps clip(max_pairs - its_first_slot, 0, ntiles) pairs — only
        # this branch pays the inverse-permutation + gather.
        def _no_drop(_):
            return ntiles

        def _with_drop(_):
            _, inv = jax.lax.sort(
                (order.astype(jnp.int32),
                 jnp.arange(n, dtype=jnp.int32)),
                num_keys=1,
            )
            off_d = jnp.take(offsets_depth.astype(jnp.int32), inv)
            return jnp.clip(max_pairs - off_d, 0, ntiles)

        counts = jax.lax.cond(
            total <= max_pairs, _no_drop, _with_drop, 0
        ).astype(jnp.int32)
        offsets_o = (jnp.cumsum(counts) - counts).astype(jnp.int32)
        counts2d = jnp.pad(counts, (0, n_pad - n)).reshape(
            n_blocks, 1, SEG_SPLATS
        )
        if n_pad > n:
            tail = jnp.broadcast_to(cap, (n_pad - n,))
            offsets_pad = jnp.concatenate([offsets_o, tail])
        else:
            offsets_pad = offsets_o
        pstart = jnp.minimum(offsets_pad[:: SEG_SPLATS], cap)
        # chunk counts from the 128-aligned DMA origin to the block end
        astart_s = (pstart // 128) * 128
        block_end = jnp.concatenate([pstart[1:], cap[None]])
        pchunks = -(-jnp.maximum(block_end - astart_s, 0) // SEG_CHUNK)
        total_arr = cap.reshape(1)

        segsum = _segreduce_call(
            dslot, counts2d, pstart, pchunks.astype(jnp.int32), total_arr,
            interpret,
        )  # (n_blocks, NFEAT, 128) f32, already in original splat order
        dtable = segsum.transpose(1, 0, 2).reshape(NFEAT, n_pad)[:, :n]
        f0 = jax.dtypes.float0
        return (
            dtable,
            np.zeros(gauss_pad.shape, f0),
            np.zeros(slot_sorted.shape, f0),
            np.zeros(ntiles.shape, f0),
            np.zeros(offsets_depth.shape, f0),
            np.zeros(order.shape, f0),
            np.zeros(total.shape, f0),
            jnp.zeros_like(bg),
            np.zeros(astart.shape, f0),
            np.zeros(nchunk.shape, f0),
            np.zeros(phase.shape, f0),
            np.zeros(count.shape, f0),
            np.zeros(ox.shape, f0),
            np.zeros(oy.shape, f0),
        )

    run.defvjp(fwd, bwd)
    return run


def _assemble_cf(out_t, grid_x, grid_y, width, height, block):
    """(T, C, pix) channel-first tile canvas -> (C, H, W) image; every
    intermediate keeps a lane-dense minor dim (pixel columns)."""
    c = out_t.shape[1]
    t = out_t.reshape(grid_y, grid_x, c, block, block)
    t = t.transpose(2, 0, 3, 1, 4).reshape(
        c, grid_y * block, grid_x * block
    )
    return t[:, :height, :width]


def rasterize_pallas(
    means3d, opacities, scales, quats, sh, camera, width, height,
    background, sh_degree, config=None, max_sh_degree=None,
    scale_modifier: float = 1.0, antialias: bool = False, alive=None,
    means2d_ndc_offset=None, tile_y_offset=0, grid_y_local=None,
    interpret: bool = False, early_stop: bool = True, prep=None,
    colors_precomp=None, cov3d_precomp=None,
):
    """Drop-in replacement for rasterize_tiled with Pallas compositing.
    Same return contract: (RenderOutput, stats). ``prep`` accepts an
    externally computed ``Preprocessed`` (see rasterize_tiled)."""
    from gaussian_splatting_lightning_tpu.ops import binning
    from gaussian_splatting_lightning_tpu.ops.common import (
        RenderOutput,
        preprocess,
    )
    from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import (
        TilingConfig,
    )

    config = config or TilingConfig()
    blk = config.resolve_block("pallas")
    if prep is None:
        prep = preprocess(
            means3d, opacities, scales, quats, sh, camera, width, height,
            sh_degree, max_sh_degree, scale_modifier, antialias, alive,
            means2d_ndc_offset, colors_precomp, cov3d_precomp,
        )
    grid_x, grid_y = binning.grid_shape(width, height, blk, blk)
    banded = grid_y_local is not None
    gy = grid_y_local if banded else grid_y
    n_tiles = grid_x * gy

    max_pairs = -(-config.max_pairs // CHUNK) * CHUNK
    (gauss_s, slot_sorted, astart, phase, tile_count, nchunk, num_pairs,
     num_dropped, ntiles, slot_offsets, order) = (
        binning.build_sorted_bins(
            prep, grid_x, grid_y, max_pairs, tile_y_offset, gy,
            interpret=interpret, block=blk,
        )
    )
    # Packed per-splat feature rows (original order — gauss_s carries
    # original ids), then ONE contiguous row gather per pair; the pair
    # gather carries a custom VJP (segment-reduce over depth-grouped slots)
    # instead of XLA's serialized scatter-adds. The +2*CHUNK pad keeps the
    # compositor's overhanging last-window DMA in bounds.
    gauss_pad = jnp.pad(gauss_s, (0, 2 * CHUNK))
    zeros_n = jnp.zeros_like(prep.depth)
    if blk != 16:
        # reference-granularity membership rect (see F_X0 note above);
        # tangent-free geometry, like the binning rect
        from gaussian_splatting_lightning_tpu.core import transforms as _tf

        g16x, g16y = binning.grid_shape(width, height, 16, 16)
        sg = jax.lax.stop_gradient
        r16 = _tf.tile_rect(
            sg(prep.p_pix), sg(prep.radius_bin), g16x, g16y, 16, 16
        )
        rect_rows = [r.astype(prep.depth.dtype) for r in
                     (r16[0], r16[2], r16[1], r16[3])]  # x0 x1 y0 y1
    else:
        rect_rows = [zeros_n, zeros_n, zeros_n, zeros_n]
    gfeat_t = jnp.stack(
        [
            prep.p_pix[:, 0], prep.p_pix[:, 1],
            prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
            prep.opacity,
            prep.rgb[:, 0], prep.rgb[:, 1], prep.rgb[:, 2],
            # safe divisor: a splat exactly at the camera plane (culled,
            # never paired) would otherwise put -inf^2 * 0 = NaN into the
            # depth gradient through this row's VJP
            1.0 / jnp.where(jnp.abs(prep.depth) > 1e-9, prep.depth, 1.0),
            *rect_rows, zeros_n, zeros_n,
        ],
        axis=0,
    )  # (NFEAT, N), feature-major from the start: no transposes on this path
    t_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    ox = (t_ids % grid_x) * blk
    oy = ((t_ids // grid_x) + tile_y_offset) * blk
    bg_pad = jnp.zeros((1, 128), gfeat_t.dtype).at[0, 0:3].set(background)

    pipeline = make_pair_pipeline(
        gfeat_t.shape[1], n_tiles, interpret, early_stop, blk,
        grad_bf16=config.pair_grad_bf16,
    )
    out = pipeline(
        gfeat_t, gauss_pad, slot_sorted, ntiles, slot_offsets, order,
        jnp.asarray(num_pairs, jnp.int32),
        bg_pad, astart, nchunk, phase, tile_count, ox, oy,
    )  # (T, pix, NOUT)

    out_h = gy * blk if banded else height
    imgd = _assemble_cf(out, grid_x, gy, width, out_h, blk)  # (NOUT, H, W)
    image = imgd[0:3]
    depth = imgd[3]

    stats = {
        "num_pairs": num_pairs,
        "num_dropped_pairs": num_dropped,
        "max_tile_count": jnp.max(tile_count),
        "num_tile_overflow": jnp.zeros((), jnp.int32),
        "num_visible": jnp.sum(prep.visible.astype(jnp.int32)),
    }
    render = RenderOutput(
        image=image, radii=prep.radius, depth=depth[None]
    )
    return render, stats
