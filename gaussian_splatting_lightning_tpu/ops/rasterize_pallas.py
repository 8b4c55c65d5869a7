"""Pallas TPU compositing kernels: the performance core.

TPU-native redesign of the CUDA tile renderer (reference N1's renderCUDA /
renderBackwardCUDA): one grid program per 16x16 tile walks its depth-sorted
pair list in 128-splat chunks held in VMEM.

Key departures from the CUDA design, forced/enabled by the hardware:

- Pair chunks are (128, 16) feature rows; the pixel dimension (256) lives on
  vector lanes. alpha/weights are (pairs=128, pixels=256) VPU tiles.
- The serial front-to-back transmittance product becomes an *exclusive
  cumulative sum of log(1-alpha) via a lower-triangular matmul on the MXU*
  (alpha <= 0.99 keeps the log well-conditioned), so the whole chunk
  composites in parallel instead of CUDA's per-splat loop.
- The backward pass needs the classic suffix sums S_j = sum_{k>j} w_k c_k.
  Instead of CUDA's back-to-front re-walk with atomicAdd into global memory,
  we walk *front-to-back again* using suffix = total - prefix (the totals are
  forward outputs) and write gradients *per pair* — each pair belongs to
  exactly one tile, and tile ranges are 128-aligned, so programs write
  disjoint rows: atomics-free by construction. The per-splat reduction is a
  segment-sum done by XLA outside (the transpose of the pair gather).
- Per-pixel state across chunks (transmittance, prefix accumulators) lives in
  VMEM scratch; early termination of a tile (all pixels saturated) is a loop
  exit rather than a warp vote.

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
    BLOCK_X,
    BLOCK_Y,
    TRANSMITTANCE_EPS,
)

CHUNK = 128  # pairs per VMEM chunk
PIX = BLOCK_X * BLOCK_Y  # 256 pixels per tile
NFEAT = 16  # px py ca cb cc op r g b invz (6 pad)
NOUT = 8  # r g b invd tfin (3 pad)
NGRAD = 16  # dpx dpy dca dcb dcc dop dr dg db dinvz (6 pad)

F_PX, F_PY, F_CA, F_CB, F_CC, F_OP, F_R, F_G, F_B, F_IZ = range(10)


def _pixel_coords(origin_x, origin_y, dtype):
    """(1, 256) x/y pixel-center coordinates, y-major pixel order."""
    p = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    px = (p % BLOCK_X).astype(dtype) + origin_x
    py = (p // BLOCK_X).astype(dtype) + origin_y
    return px, py


def _strict_lower(dtype):
    """(128, 128) strictly-lower-triangular ones: L @ x = exclusive cumsum
    over the pair axis; ones row gives the chunk total."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (c < r).astype(dtype)


def _chunk_alpha(chunk, px, py):
    """Shared fwd/bwd math: chunk (128, NFEAT) -> alpha etc, all (128, 256)."""
    dx = chunk[:, F_PX : F_PX + 1] - px  # (128, 256)
    dy = chunk[:, F_PY : F_PY + 1] - py
    power = -0.5 * (
        chunk[:, F_CA : F_CA + 1] * dx * dx
        + 2.0 * chunk[:, F_CB : F_CB + 1] * dx * dy
        + chunk[:, F_CC : F_CC + 1] * dy * dy
    )
    e = jnp.exp(power)
    raw = e * chunk[:, F_OP : F_OP + 1]
    alpha = jnp.minimum(raw, ALPHA_CLAMP)
    alpha = jnp.where(alpha > ALPHA_THRESHOLD, alpha, 0.0)
    return dx, dy, e, raw, alpha


def _fwd_kernel(
    # scalar prefetch
    start_ref, nchunk_ref, ox_ref, oy_ref,
    # inputs
    feats_hbm, bg_ref,
    # outputs
    out_ref,
    # scratch
    buf, sem, tcar, acc,
    *, early_stop: bool,
):
    t = pl.program_id(0)
    dtype = out_ref.dtype
    px, py = _pixel_coords(
        ox_ref[t].astype(dtype), oy_ref[t].astype(dtype), dtype
    )
    L = _strict_lower(dtype)
    start = start_ref[t]
    n_chunks = nchunk_ref[t]

    tcar[...] = jnp.ones((1, PIX), dtype)
    acc[...] = jnp.zeros((8, PIX), dtype)

    def get_dma(slot, ci):
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start + ci * CHUNK, CHUNK), :],
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
        chunk = buf[slot]  # (128, NFEAT)
        _, _, _, _, alpha = _chunk_alpha(chunk, px, py)

        lw = jnp.log1p(-alpha)  # alpha <= 0.99 -> well-conditioned
        cum_excl = jnp.dot(L, lw, preferred_element_type=dtype)
        t_in = tcar[...] * jnp.exp(cum_excl)  # (128, 256)
        w = jnp.where(t_in > TRANSMITTANCE_EPS, alpha * t_in, 0.0)

        rgbz = chunk[:, F_R : F_R + 4]  # (128, 4): r g b invz
        contrib = jax.lax.dot_general(
            rgbz, w, (((0,), (0,)), ((), ())), preferred_element_type=dtype
        )  # (4, 256)
        acc[0:4, :] += contrib
        tcar[...] = tcar[...] * jnp.exp(
            jnp.sum(lw, axis=0, keepdims=True)
        )
        return ci + 1, jnp.max(tcar[...])

    def cond(state):
        ci, tmax = state
        alive = ci < n_chunks
        if early_stop:
            alive = jnp.logical_and(alive, tmax > TRANSMITTANCE_EPS)
        return alive

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.asarray(1.0, dtype)))

    color = acc[0:3, :] + tcar[...] * bg_ref[0:3, 0:1]  # bg composited in
    out = jnp.concatenate(
        [color, acc[3:4, :], tcar[...], jnp.zeros((3, PIX), dtype)], axis=0
    )
    out_ref[0] = out  # (NOUT, 256)


def _bwd_kernel(
    # scalar prefetch
    start_ref, nchunk_ref, ox_ref, oy_ref,
    # inputs
    feats_hbm, bg_ref, fwd_out_ref, ct_ref, dfeats_init_hbm,
    # outputs (aliased with dfeats_init: rows outside every tile range stay 0)
    dfeats_hbm,
    # scratch
    buf, sem, dbuf, dsem, tcar, gapre,
):
    t = pl.program_id(0)
    dtype = ct_ref.dtype
    px, py = _pixel_coords(
        ox_ref[t].astype(dtype), oy_ref[t].astype(dtype), dtype
    )
    L = _strict_lower(dtype)
    Lincl = L + jnp.eye(CHUNK, dtype=dtype)
    ones_row = jnp.ones((1, CHUNK), dtype)
    start = start_ref[t]
    n_chunks = nchunk_ref[t]

    G = ct_ref[0, 0:4, :]  # (4, 256): d L/d [r g b invd]
    fwd = fwd_out_ref[0]  # (NOUT, 256)
    tfin = fwd[4:5, :]
    # Gtotal'[p] = sum_f G * total'_f where total'_rgb = color_with_bg and
    # total'_d = invd total (see module docstring: suffix = total - prefix)
    g_total = jnp.sum(G * fwd[0:4, :], axis=0, keepdims=True)  # (1, 256)
    g_bg = jnp.sum(G[0:3, :] * bg_ref[0:3, 0:1], axis=0, keepdims=True)

    tcar[...] = jnp.ones((1, PIX), dtype)
    gapre[...] = jnp.zeros((1, PIX), dtype)  # sum_f G * prefix_f

    def get_dma(slot, ci):
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start + ci * CHUNK, CHUNK), :],
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
        chunk = buf[slot]
        dx, dy, e, raw, alpha = _chunk_alpha(chunk, px, py)

        lw = jnp.log1p(-alpha)
        cum_excl = jnp.dot(L, lw, preferred_element_type=dtype)
        t_in = tcar[...] * jnp.exp(cum_excl)
        live = t_in > TRANSMITTANCE_EPS
        w = jnp.where(live, alpha * t_in, 0.0)

        rgbz = chunk[:, F_R : F_R + 4]
        # E[j,p] = c_j . G_p  (128, 256)
        E = jnp.dot(rgbz, G, preferred_element_type=dtype)
        wE = w * E
        # prefix through j of sum_f G*w*c (inclusive, global):
        # gapre + within-chunk inclusive cumsum
        prefix_incl = gapre[...] + jnp.dot(
            Lincl, wE, preferred_element_type=dtype
        )
        # U = G.(suffix'_j) including the background-through-transmittance
        # term: total' already contains T_fin*bg (color_with_bg)
        U = g_total - prefix_incl
        one_m = 1.0 - alpha
        has_grad = alpha > 0.0  # alpha was thresholded; zero alphas detach
        d_alpha = jnp.where(
            has_grad,
            jnp.where(live, E * t_in, 0.0) - U / one_m,
            0.0,
        )
        unclamped = raw < ALPHA_CLAMP
        d_power = jnp.where(unclamped, d_alpha * alpha, 0.0)  # dalpha/dpower = op*e = alpha
        d_op_px = jnp.where(unclamped, d_alpha * e, 0.0)

        ca = chunk[:, F_CA : F_CA + 1]
        cb = chunk[:, F_CB : F_CB + 1]
        cc = chunk[:, F_CC : F_CC + 1]
        ddx = d_power * (-(ca * dx + cb * dy))
        ddy = d_power * (-(cb * dx + cc * dy))

        def rowsum(x):  # (128, 256) -> (128, 1)
            return jnp.sum(x, axis=1, keepdims=True)

        d_px = rowsum(ddx)
        d_py = rowsum(ddy)
        d_ca = rowsum(d_power * (-0.5 * dx * dx))
        d_cb = rowsum(d_power * (-dx * dy))
        d_cc = rowsum(d_power * (-0.5 * dy * dy))
        d_op = rowsum(d_op_px)
        # d rgb/invz: (128, 256) . (4, 256) contracting pixels -> (128, 4)
        d_rgbz = jax.lax.dot_general(
            w, G, (((1,), (1,)), ((), ())), preferred_element_type=dtype
        )

        grad = jnp.concatenate(
            [d_px, d_py, d_ca, d_cb, d_cc, d_op, d_rgbz,
             jnp.zeros((CHUNK, NGRAD - 10), dtype)],
            axis=1,
        )  # (128, NGRAD)

        # write this chunk's pair grads back to HBM. Tile ranges are disjoint
        # and 128-aligned, so no other program touches these rows. The wait
        # is synchronous per chunk (compute of the next chunk's DMA-in is
        # already overlapped; grad write-out is small).
        dbuf[0] = grad
        out_dma = pltpu.make_async_copy(
            dbuf.at[0],
            dfeats_hbm.at[pl.ds(start + ci * CHUNK, CHUNK), :],
            dsem.at[0],
        )
        out_dma.start()
        out_dma.wait()

        # carry updates
        gapre[...] = gapre[...] + jnp.dot(
            ones_row, wE, preferred_element_type=dtype
        )
        tcar[...] = tcar[...] * jnp.exp(jnp.sum(lw, axis=0, keepdims=True))
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _fwd_call(feats, bg, start, nchunk, ox, oy, n_tiles, interpret, early_stop):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, NOUT, PIX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, NFEAT), feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, PIX), feats.dtype),
            pltpu.VMEM((8, PIX), feats.dtype),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, early_stop=early_stop),
        out_shape=jax.ShapeDtypeStruct((n_tiles, NOUT, PIX), feats.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(start, nchunk, ox, oy, feats, bg)


def _bwd_call(feats, bg, fwd_out, ct, start, nchunk, ox, oy, n_tiles, interpret):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, NOUT, PIX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 4, PIX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, NFEAT), feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, CHUNK, NGRAD), feats.dtype),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.VMEM((1, PIX), feats.dtype),
            pltpu.VMEM((1, PIX), feats.dtype),
        ],
    )
    dfeats_init = jnp.zeros(feats.shape[:1] + (NGRAD,), feats.dtype)
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct(feats.shape[:1] + (NGRAD,), feats.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases={8: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(start, nchunk, ox, oy, feats, bg, fwd_out, ct, dfeats_init)


def make_pair_compositor(
    n_tiles: int, interpret: bool = False, early_stop: bool = True
):
    """Returns composite(feats, bg, start, nchunk, ox, oy) -> (T, NOUT, 256)
    with a custom VJP producing per-pair feature gradients.

    feats: (M_pad, NFEAT) f32, per-tile ranges 128-aligned and padded with
    opacity-0 rows; start/nchunk/ox/oy: (T,) int32 (chunk counts and global
    tile pixel origins). bg: (8, 128) broadcast-padded background (first 3
    rows live). Gradients flow to feats only.
    """

    @jax.custom_vjp
    def composite(feats, bg, start, nchunk, ox, oy):
        return _fwd_call(
            feats, bg, start, nchunk, ox, oy, n_tiles, interpret, early_stop
        )

    def fwd(feats, bg, start, nchunk, ox, oy):
        out = _fwd_call(
            feats, bg, start, nchunk, ox, oy, n_tiles, interpret, early_stop
        )
        return out, (feats, bg, start, nchunk, ox, oy, out)

    def bwd(res, ct):
        feats, bg, start, nchunk, ox, oy, out = res
        ct4 = ct[:, 0:4, :]  # cotangent for [r g b invd]; tfin ct ignored
        dfeats = _bwd_call(
            feats, bg, out, ct4, start, nchunk, ox, oy, n_tiles, interpret
        )
        f0 = jax.dtypes.float0
        return (
            dfeats,
            jnp.zeros_like(bg),
            np.zeros(start.shape, f0),
            np.zeros(nchunk.shape, f0),
            np.zeros(ox.shape, f0),
            np.zeros(oy.shape, f0),
        )

    composite.defvjp(fwd, bwd)
    return composite


# ---------------------------------------------------------------------------
# glue: preprocess/binning -> aligned pair features -> kernel -> image
# ---------------------------------------------------------------------------

def build_aligned_pairs(prep, bins, n_tiles: int, m_pad: int):
    """Re-layout the tile-sorted pairs so every tile's range starts on a
    CHUNK boundary (disjoint 128-aligned rows let the backward kernel write
    per-pair gradients without atomics). Returns (feats (m_pad, NFEAT),
    start (T,), nchunk (T,), gidx (m_pad,) , valid (m_pad,)).

    Differentiable: feats is a gather from the preprocess outputs, so JAX
    transposes it into the per-splat segment-sum automatically.
    """
    cnt = bins.tile_count
    padded = ((cnt + CHUNK - 1) // CHUNK) * CHUNK
    pad_start = (jnp.cumsum(padded) - padded).astype(jnp.int32)

    slot = jnp.arange(m_pad, dtype=jnp.int32)
    t_of = (
        jnp.searchsorted(pad_start, slot, side="right").astype(jnp.int32) - 1
    )
    t_of = jnp.clip(t_of, 0, n_tiles - 1)
    local = slot - pad_start[t_of]
    valid = local < cnt[t_of]
    src = jnp.clip(bins.tile_start[t_of] + local, 0, bins.pair_gaussian.shape[0] - 1)
    gidx = jnp.where(valid, bins.pair_gaussian[src], -1)

    g = jnp.clip(gidx, 0)
    vm = valid.astype(prep.p_pix.dtype)[:, None]
    cols = jnp.concatenate(
        [
            prep.p_pix[g],  # px py
            prep.conic[g],  # ca cb cc
            prep.opacity[g][:, None],
            prep.rgb[g],  # r g b
            (1.0 / prep.depth[g])[:, None],
        ],
        axis=1,
    )  # (m_pad, 10)
    feats = jnp.pad(cols * vm, ((0, 0), (0, NFEAT - 10)))
    return feats, pad_start, (padded // CHUNK).astype(jnp.int32), gidx, valid


def rasterize_pallas(
    means3d, opacities, scales, quats, sh, camera, width, height,
    background, sh_degree, config=None, max_sh_degree=None,
    scale_modifier: float = 1.0, antialias: bool = False, alive=None,
    means2d_ndc_offset=None, tile_y_offset=0, grid_y_local=None,
    interpret: bool = False, early_stop: bool = True,
):
    """Drop-in replacement for rasterize_tiled with Pallas compositing.
    Same return contract: (RenderOutput, stats)."""
    from gaussian_splatting_lightning_tpu.ops import binning
    from gaussian_splatting_lightning_tpu.ops.common import (
        Preprocessed,
        RenderOutput,
        preprocess,
    )
    from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import (
        TilingConfig,
        _assemble,
    )

    config = config or TilingConfig()
    prep = preprocess(
        means3d, opacities, scales, quats, sh, camera, width, height,
        sh_degree, max_sh_degree, scale_modifier, antialias, alive,
        means2d_ndc_offset,
    )
    grid_x, grid_y = binning.grid_shape(width, height)
    banded = grid_y_local is not None
    gy = grid_y_local if banded else grid_y
    n_tiles = grid_x * gy

    bins = binning.build_tile_bins(
        prep, grid_x, grid_y, config.max_pairs, tile_y_offset, gy
    )
    m_pad = config.max_pairs + CHUNK * n_tiles
    feats, start, nchunk, gidx, valid = build_aligned_pairs(
        prep, bins, n_tiles, m_pad
    )

    t_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    ox = (t_ids % grid_x) * BLOCK_X
    oy = ((t_ids // grid_x) + tile_y_offset) * BLOCK_Y
    bg_pad = jnp.zeros((8, 128), feats.dtype).at[0:3, :].set(
        background.reshape(3, 1)
    )

    composite = make_pair_compositor(n_tiles, interpret, early_stop)
    out = composite(feats, bg_pad, start, nchunk, ox, oy)  # (T, NOUT, 256)

    tiles_pc = jnp.swapaxes(out, 1, 2)  # (T, 256, NOUT)
    out_h = gy * BLOCK_Y if banded else height
    image = _assemble(tiles_pc[..., 0:3], grid_x, gy, width, out_h, 3)
    depth = _assemble(tiles_pc[..., 3], grid_x, gy, width, out_h)

    max_tile_count = jnp.max(bins.tile_count)
    stats = {
        "num_pairs": bins.num_pairs,
        "num_dropped_pairs": bins.num_dropped,
        "max_tile_count": max_tile_count,
        "num_tile_overflow": jnp.zeros((), jnp.int32),
        "num_visible": jnp.sum(prep.visible.astype(jnp.int32)),
    }
    render = RenderOutput(
        image=jnp.moveaxis(image, -1, 0), radii=prep.radius, depth=depth[None]
    )
    return render, stats
