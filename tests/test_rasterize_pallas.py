"""Pallas compositing kernels vs the jnp oracle — interpret mode on CPU.

The same kernels compile for real TPU (exercised by bench.py); interpret mode
validates the kernel math, DMA staging, masking, and the custom-VJP analytic
backward (SURVEY hard part #1: gradients the reference never implemented)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussian_splatting_lightning_tpu.core.camera import camera_from_matrices
from gaussian_splatting_lightning_tpu.ops import rasterize_reference
from gaussian_splatting_lightning_tpu.ops.rasterize_pallas import rasterize_pallas
from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import TilingConfig
from tests.ref_oracle import load_treehill_fixtures

# strict oracle-parity config: f32 gradient routing (the production default
# routes pair cotangents in bf16 — bounded separately below)
CFG = TilingConfig(
    max_pairs=1 << 14, tile_capacity=512, chunk=64, pair_grad_bf16=False
)


@pytest.fixture(scope="module")
def setup():
    settings, _, common = load_treehill_fixtures()
    s = settings[0]
    cam = camera_from_matrices(
        s["viewmatrix"], s["projmatrix"], s["campos"],
        common["tanfovx"], common["tanfovy"],
    )
    return s, cam


def _scene(n, s, seed=31):
    # per-call RNG: scenes must not depend on test execution order
    RNG = np.random.default_rng(seed)
    means = RNG.normal(size=(n, 3)).astype(np.float32) * 2
    fwd = s["viewmatrix"][:3, 2]
    means = (s["campos"][None, :] + fwd[None, :] * 4.0 + means).astype(np.float32)
    opac = RNG.uniform(0.2, 0.95, size=(n, 1)).astype(np.float32)
    scales = RNG.uniform(0.02, 0.3, size=(n, 3)).astype(np.float32)
    quats = RNG.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    sh = (RNG.normal(size=(n, 16, 3)) * 0.3).astype(np.float32)
    return means, opac, scales, quats, sh


def test_pallas_forward_matches_oracle(setup):
    s, cam = setup
    n, w, h = 300, 96, 64
    means, opac, scales, quats, sh = _scene(n, s)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    args = (
        jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), jnp.asarray(sh), cam, w, h, jnp.asarray(bg), 3,
    )
    oracle = rasterize_reference(*args)
    out, stats = rasterize_pallas(
        *args, config=CFG, interpret=True, early_stop=False
    )
    np.testing.assert_allclose(
        np.asarray(out.image), np.asarray(oracle.image), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.depth), np.asarray(oracle.depth), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(out.radii), np.asarray(oracle.radii)
    )
    assert int(stats["num_dropped_pairs"]) == 0


def test_pallas_early_stop_error_is_bounded(setup):
    s, cam = setup
    n, w, h = 300, 96, 64
    means, opac, scales, quats, sh = _scene(n, s)
    args = (
        jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), jnp.asarray(sh), cam, w, h, jnp.zeros(3), 3,
    )
    exact, _ = rasterize_pallas(*args, config=CFG, interpret=True, early_stop=False)
    fast, _ = rasterize_pallas(*args, config=CFG, interpret=True, early_stop=True)
    # skipping chunks once every pixel's transmittance < 1e-4 can only
    # perturb the (T_fin * background) term
    assert np.abs(np.asarray(fast.image) - np.asarray(exact.image)).max() < 2e-4


@pytest.mark.parametrize("early_stop", [False, True])
def test_pallas_backward_matches_oracle_ad(setup, early_stop):
    """With early_stop=True the bwd kernel also stops at saturation —
    dropped pairs must get exactly the oracle's zero gradients."""
    s, cam = setup
    n, w, h = 200, 64, 48
    means, opac, scales, quats, sh = _scene(n, s)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    target = jnp.linspace(0, 1, 3 * h * w).reshape(3, h, w)
    offset = jnp.zeros((n, 2))

    def loss_oracle(*p):
        out = rasterize_reference(
            p[0], p[1], p[2], p[3], p[4], cam, w, h, bg, 3,
            means2d_ndc_offset=p[5],
        )
        return jnp.abs(out.image - target).mean() + 0.1 * out.depth.mean()

    def loss_pallas(*p):
        out, _ = rasterize_pallas(
            p[0], p[1], p[2], p[3], p[4], cam, w, h, bg, 3, config=CFG,
            means2d_ndc_offset=p[5], interpret=True, early_stop=early_stop,
        )
        return jnp.abs(out.image - target).mean() + 0.1 * out.depth.mean()

    args = (
        jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), jnp.asarray(sh), offset,
    )
    assert float(loss_pallas(*args)) == pytest.approx(
        float(loss_oracle(*args)), abs=1e-6
    )
    go = jax.grad(loss_oracle, argnums=tuple(range(6)))(*args)
    gp = jax.grad(loss_pallas, argnums=tuple(range(6)))(*args)
    for name, a, b in zip(
        ["means", "opacity", "scales", "quats", "sh", "offset"], go, gp
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(
            b / scale, a / scale, atol=5e-6, err_msg=name
        )
    assert np.abs(np.asarray(gp[5])).sum() > 0


def test_pallas_bf16_grad_routing_error_bound(setup):
    """The production default routes per-pair cotangents in bf16 (f32 MXU
    accumulation). Bound its gradient error against the f32 routing: the
    forward must be bit-identical (bf16 only touches the backward), and
    every parameter gradient must stay within 5% of the f32 path's scale
    (on-chip measurement at 512x384/100k splats: 3.8% max — bench.py
    parity gate; training recovery verified in BASELINE.md)."""
    import dataclasses

    s, cam = setup
    n, w, h = 400, 96, 64
    means, opac, scales, quats, sh = _scene(n, s, seed=77)
    bg = jnp.zeros(3)
    target = jnp.linspace(0, 1, 3 * h * w).reshape(3, h, w)
    args = (
        jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), jnp.asarray(sh),
    )

    def make_loss(cfg):
        def loss(*p):
            out, _ = rasterize_pallas(
                p[0], p[1], p[2], p[3], p[4], cam, w, h, bg, 2, config=cfg,
                interpret=True, early_stop=False,
            )
            return jnp.abs(out.image - target).mean()
        return loss

    cfg16 = dataclasses.replace(CFG, pair_grad_bf16=True)
    l32, l16 = make_loss(CFG), make_loss(cfg16)
    np.testing.assert_array_equal(
        np.asarray(l32(*args)), np.asarray(l16(*args))
    )
    g32 = jax.grad(l32, argnums=tuple(range(5)))(*args)
    g16 = jax.grad(l16, argnums=tuple(range(5)))(*args)
    for name, a, b in zip(["means", "op", "sc", "q", "sh"], g32, g16):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        err = np.abs(b - a).max() / scale
        assert err < 5e-2, f"{name}: bf16 routing error {err:.2e}"
        assert np.isfinite(b).all()


@pytest.mark.parametrize("block", [16, 32])
def test_pallas_banded_rendering_matches_full(setup, block):
    """Tile-row bands (the multi-chip sharding unit) assemble to the full
    image — validates tile_y_offset/grid_y_local through the Pallas path,
    at both tile sizes."""
    import dataclasses

    s, cam = setup
    n, w, h = 250, 96, block * 4  # grid_y = 4
    cfg = dataclasses.replace(CFG, block=block)
    means, opac, scales, quats, sh = _scene(n, s)
    args = (
        jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), jnp.asarray(sh), cam, w, h, jnp.zeros(3), 2,
    )
    full, _ = rasterize_pallas(*args, config=cfg, interpret=True, early_stop=False)
    bands = []
    for band in range(2):
        out, _ = rasterize_pallas(
            *args, config=cfg, interpret=True, early_stop=False,
            tile_y_offset=band * 2, grid_y_local=2,
        )
        bands.append(np.asarray(out.image))
    assembled = np.concatenate(bands, axis=1)
    np.testing.assert_allclose(
        assembled, np.asarray(full.image), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("n,budget", [(197, 1 << 14), (300, 2048)])
def test_pallas_backward_odd_sizes_and_overflow(setup, n, budget):
    """Segment-reduce VJP edge cases: splat counts not divisible by the
    128-splat program size, and pair-budget overflow (dropped pairs must
    simply contribute zero gradient, matching the oracle on the same drop)."""
    s, cam = setup
    w, h = 64, 48
    means, opac, scales, quats, sh = _scene(n, s)
    bg = jnp.zeros(3)
    target = jnp.linspace(0, 1, 3 * h * w).reshape(3, h, w)
    cfg = TilingConfig(
        max_pairs=budget, tile_capacity=256, chunk=64, pair_grad_bf16=False
    )

    def loss_pallas(*p):
        out, _ = rasterize_pallas(
            p[0], p[1], p[2], p[3], p[4], cam, w, h, bg, 2, config=cfg,
            interpret=True, early_stop=False,
        )
        return jnp.abs(out.image - target).mean()

    args = (
        jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), jnp.asarray(sh),
    )
    g = jax.grad(loss_pallas, argnums=tuple(range(5)))(*args)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
    # compare against plain JAX AD through the XLA tiled path with the SAME
    # budget (identical pair drops -> identical gradients)
    from gaussian_splatting_lightning_tpu.ops import rasterize_tiled

    def loss_tiled(*p):
        out, _ = rasterize_tiled(
            p[0], p[1], p[2], p[3], p[4], cam, w, h, bg, 2, config=cfg
        )
        return jnp.abs(out.image - target).mean()

    gt = jax.grad(loss_tiled, argnums=tuple(range(5)))(*args)
    for name, a, b in zip(["means", "op", "sc", "q", "sh"], gt, g):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-5, err_msg=name)


def test_sorted_bins_positional_machinery():
    """The global-sort binning's closed-form quantities (binning.py
    build_sorted_bins) must match a naive numpy construction: searchsorted
    tile ranges, aligned window geometry, and the monotone-delta fill that
    gives every sorted pair its private padded destination."""
    import dataclasses

    from gaussian_splatting_lightning_tpu.ops import binning
    from gaussian_splatting_lightning_tpu.ops.common import Preprocessed

    rng = np.random.default_rng(7)
    n, grid_x, grid_y = 400, 7, 5
    n_tiles = grid_x * grid_y
    max_pairs = 4096
    prep = Preprocessed(
        p_pix=jnp.asarray(
            rng.uniform(0, 16 * grid_x, size=(n, 2)).astype(np.float32)
        ),
        depth=jnp.asarray(rng.uniform(1, 10, size=n).astype(np.float32)),
        conic=jnp.zeros((n, 3)),
        rgb=jnp.zeros((n, 3)),
        opacity=jnp.ones(n),
        radius=jnp.asarray(rng.uniform(1, 40, size=n).astype(np.float32)),
        visible=jnp.asarray(rng.uniform(size=n) > 0.2),
        radius_bin=jnp.asarray(rng.uniform(1, 40, size=n).astype(np.float32)),
        cull_r2=jnp.full(n, 1e9, jnp.float32),  # cull off: pure geometry
    )
    (gauss_s, slot_s, astart, phase, count, nchunk,
     total, dropped, ntiles, offsets, order) = binning.build_sorted_bins(
        prep, grid_x, grid_y, max_pairs,
        interpret=True, block=16,
    )
    gauss_s, slot_s, astart, phase, count, nchunk, ntiles = (
        np.asarray(x)
        for x in (gauss_s, slot_s, astart, phase, count, nchunk, ntiles)
    )
    assert int(dropped) == 0
    tile_start = astart + phase

    # naive reference: per-tile membership from the same rects, depth order
    x0, y0, x1, y1 = (
        np.asarray(v)
        for v in __import__(
            "gaussian_splatting_lightning_tpu.core.transforms",
            fromlist=["tile_rect"],
        ).tile_rect(prep.p_pix, prep.radius_bin, grid_x, grid_y, 16, 16)
    )
    vis = np.asarray(prep.visible)
    depth = np.asarray(prep.depth)
    pairs_ref = {t: [] for t in range(n_tiles)}
    for g in np.argsort(np.where(vis & ((x1 - x0) * (y1 - y0) > 0),
                                 depth, np.inf), kind="stable"):
        if not vis[g]:
            continue
        for ty in range(y0[g], y1[g]):
            for tx in range(x0[g], x1[g]):
                pairs_ref[ty * grid_x + tx].append(g)

    # (a) per-tile ranges + depth-ordered members match
    for t in range(n_tiles):
        assert count[t] == len(pairs_ref[t]), t
        got = gauss_s[tile_start[t]: tile_start[t] + count[t]]
        np.testing.assert_array_equal(got, np.asarray(pairs_ref[t], np.int32))

    # (b) aligned window geometry (bwd windows end within max_pairs, so the
    # unpadded bwd writes stay in bounds)
    np.testing.assert_array_equal(astart % 128, 0)
    assert (phase == tile_start - astart).all()
    np.testing.assert_array_equal(nchunk, -(-(phase + count) // 128))
    assert (astart + nchunk * 128 <= max_pairs).all()

    # (c) ntiles = per-splat rect pair counts in ORIGINAL order (the bwd
    # sort's segment lengths; cull disabled here so counts are pure rects)
    area = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
    np.testing.assert_array_equal(ntiles, np.where(vis, area, 0))

    # (d) slot_s is a permutation (the bwd keys its cotangent sort off it)
    assert np.array_equal(np.sort(slot_s), np.arange(max_pairs))


def test_expand_kernel_matches_xla_fills():
    """The Pallas expansion kernel must reproduce the XLA fill-based
    expansion exactly when the per-tile cull is disabled (cull_r2 = inf)."""
    from gaussian_splatting_lightning_tpu.ops import binning

    rng = np.random.default_rng(3)
    n, grid_x, grid_y = 300, 7, 5
    n_tiles = grid_x * grid_y
    # random clipped rects, ~25% empty (dead tail after the live-prefix sort)
    x0 = rng.integers(0, grid_x, n).astype(np.int32)
    nx = rng.integers(0, 4, n).astype(np.int32)
    nx = np.minimum(nx, grid_x - x0)
    y0 = rng.integers(0, grid_y, n).astype(np.int32)
    ny = np.minimum(rng.integers(0, 4, n).astype(np.int32), grid_y - y0)
    ntiles = (nx * ny).astype(np.int32)
    # emulate the live-prefix depth sort: nonzero ntiles first
    live = np.argsort(ntiles == 0, kind="stable")
    x0, nx, y0, ntiles = x0[live], nx[live], y0[live], ntiles[live]
    nx_safe = np.maximum(nx, 1)
    offsets = np.cumsum(ntiles) - ntiles
    total = int(offsets[-1] + ntiles[-1])
    max_pairs = ((total + 100) // 128) * 128  # not a multiple of EXP_BLK

    def fields(px, py, cr2):
        return jnp.asarray(
            np.stack(
                [x0, nx_safe, y0, np.full(n, px), np.full(n, py),
                 np.full(n, cr2), np.arange(n)], axis=1
            ).astype(np.float32)
        )

    key_p, gauss_p = binning.expand_pairs_pallas(
        jnp.asarray(offsets), jnp.asarray(ntiles), fields(3.0, 3.0, 1e30),
        max_pairs, jnp.asarray(total), grid_x, n_tiles, 0, interpret=True,
    )
    # XLA reference expansion (fill semantics)
    keys_ref = np.full(max_pairs, n_tiles, np.int32)
    gauss_ref = np.zeros(max_pairs, np.int32)
    for g in range(n):
        for j in range(ntiles[g]):
            s = offsets[g] + j
            if s >= max_pairs:
                break
            r = j // nx_safe[g]
            keys_ref[s] = (y0[g] + r) * grid_x + (x0[g] + j - r * nx_safe[g])
            gauss_ref[s] = g
    valid = keys_ref < n_tiles
    np.testing.assert_array_equal(np.asarray(key_p)[valid], keys_ref[valid])
    np.testing.assert_array_equal(np.asarray(gauss_p)[valid], gauss_ref[valid])
    assert (np.asarray(key_p)[~valid] == n_tiles).all()

    # a finite cull radius only turns keys into n_tiles (drops), never remaps
    key_c, _ = binning.expand_pairs_pallas(
        jnp.asarray(offsets), jnp.asarray(ntiles), fields(40.0, 40.0, 900.0),
        max_pairs, jnp.asarray(total), grid_x, n_tiles, 0, interpret=True,
    )
    kc = np.asarray(key_c)
    changed = kc != np.asarray(key_p)
    assert (kc[changed] == n_tiles).all()
    assert changed.any()  # distance-30px tiles beyond r=30 exist in this grid
