"""Tiled XLA rasterizer vs the jnp oracle: forward and backward allclose
(BASELINE config 1, both halves, on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussian_splatting_lightning_tpu.core.camera import (
    camera_from_matrices,
    make_camera,
)
from gaussian_splatting_lightning_tpu.ops import (
    TilingConfig,
    rasterize_reference,
    rasterize_tiled,
)
from tests.ref_oracle import load_treehill_fixtures

RNG = np.random.default_rng(21)


def _scene(n, s, spread=2.0):
    means = RNG.normal(size=(n, 3)).astype(np.float32) * spread
    fwd = s["viewmatrix"][:3, 2]
    means = (s["campos"][None, :] + fwd[None, :] * 4.0 + means).astype(np.float32)
    opac = RNG.uniform(0.2, 0.95, size=(n, 1)).astype(np.float32)
    scales = RNG.uniform(0.02, 0.3, size=(n, 3)).astype(np.float32)
    quats = RNG.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    sh = (RNG.normal(size=(n, 16, 3)) * 0.3).astype(np.float32)
    return means, opac, scales, quats, sh


@pytest.fixture(scope="module")
def setup():
    settings, _, common = load_treehill_fixtures()
    s = settings[0]
    cam = camera_from_matrices(
        s["viewmatrix"], s["projmatrix"], s["campos"],
        common["tanfovx"], common["tanfovy"],
    )
    return s, cam


@pytest.mark.parametrize("n,w,h", [(200, 96, 64), (1000, 128, 128)])
def test_forward_matches_oracle(setup, n, w, h):
    s, cam = setup
    means, opac, scales, quats, sh = _scene(n, s)
    bg = np.array([0.1, 0.2, 0.3], dtype=np.float32)
    args = (
        jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), jnp.asarray(sh), cam, w, h, jnp.asarray(bg), 3,
    )
    oracle = rasterize_reference(*args)
    tiled, stats = rasterize_tiled(
        *args, config=TilingConfig(max_pairs=1 << 16, tile_capacity=512, chunk=64)
    )
    assert int(stats["num_dropped_pairs"]) == 0
    assert int(stats["num_tile_overflow"]) == 0
    np.testing.assert_allclose(
        np.asarray(tiled.image), np.asarray(oracle.image), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(tiled.radii), np.asarray(oracle.radii)
    )
    np.testing.assert_allclose(
        np.asarray(tiled.depth), np.asarray(oracle.depth), rtol=1e-4, atol=1e-5
    )


def test_backward_matches_oracle(setup):
    s, cam = setup
    n, w, h = 300, 96, 64
    means, opac, scales, quats, sh = _scene(n, s)
    bg = jnp.zeros(3)
    target = jnp.linspace(0, 1, 3 * h * w).reshape(3, h, w)
    offset = jnp.zeros((n, 2))

    def loss_oracle(means, opac, scales, quats, sh, offset):
        out = rasterize_reference(
            jnp.asarray(means), opac, scales, quats, sh, cam, w, h, bg, 3,
            means2d_ndc_offset=offset,
        )
        return jnp.abs(out.image - target).mean() + 0.1 * out.depth.mean()

    def loss_tiled(means, opac, scales, quats, sh, offset):
        out, _ = rasterize_tiled(
            jnp.asarray(means), opac, scales, quats, sh, cam, w, h, bg, 3,
            config=TilingConfig(max_pairs=1 << 15, tile_capacity=512, chunk=64),
            means2d_ndc_offset=offset,
        )
        return jnp.abs(out.image - target).mean() + 0.1 * out.depth.mean()

    args = (
        jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), jnp.asarray(sh), offset,
    )
    g_oracle = jax.grad(loss_oracle, argnums=tuple(range(6)))(*args)
    g_tiled = jax.grad(loss_tiled, argnums=tuple(range(6)))(*args)
    names = ["means", "opacity", "scales", "quats", "sh", "means2d"]
    for name, go, gt in zip(names, g_oracle, g_tiled):
        go, gt = np.asarray(go), np.asarray(gt)
        scale = np.abs(go).max() + 1e-8
        np.testing.assert_allclose(
            gt / scale, go / scale, rtol=5e-4, atol=5e-5, err_msg=name
        )
    assert np.abs(np.asarray(g_tiled[5])).sum() > 0


def test_pair_budget_overflow_reported(setup):
    s, cam = setup
    n, w, h = 500, 128, 96
    means, opac, scales, quats, sh = _scene(n, s)
    _, stats = rasterize_tiled(
        jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), jnp.asarray(sh), cam, w, h, jnp.zeros(3), 3,
        config=TilingConfig(max_pairs=256, tile_capacity=64, chunk=32),
    )
    assert int(stats["num_dropped_pairs"]) > 0


def test_jit_and_alive_mask(setup):
    s, cam = setup
    n, w, h = 256, 64, 48
    means, opac, scales, quats, sh = _scene(n, s)
    alive = np.ones(n, bool)
    alive[n // 2 :] = False
    cfg = TilingConfig(max_pairs=1 << 14, tile_capacity=256, chunk=64)

    @jax.jit
    def render(means, opac, scales, quats, sh, alive):
        out, _ = rasterize_tiled(
            means, opac, scales, quats, sh, cam, w, h, jnp.zeros(3), 3,
            config=cfg, alive=alive,
        )
        return out

    full = render(
        jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), jnp.asarray(sh), jnp.asarray(np.ones(n, bool)),
    )
    half = render(
        jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), jnp.asarray(sh), jnp.asarray(alive),
    )
    # masked-out splats must not render: radii forced to 0
    assert np.all(np.asarray(half.radii)[n // 2 :] == 0)
    # and equal to physically removing them
    removed = rasterize_reference(
        jnp.asarray(means[: n // 2]), jnp.asarray(opac[: n // 2]),
        jnp.asarray(scales[: n // 2]), jnp.asarray(quats[: n // 2]),
        jnp.asarray(sh[: n // 2]), cam, w, h, jnp.zeros(3), 3,
    )
    np.testing.assert_allclose(
        np.asarray(half.image), np.asarray(removed.image), rtol=1e-4, atol=1e-5
    )

def test_precomp_inputs_match_derived():
    """colors_precomp / cov3D_precomp parity (reference N1 API surface,
    gs_lightning_module.py:337-348): feeding the precomputed RGB (from SH)
    and 3D covariance (from scales/quats) must reproduce the derived-path
    render exactly."""
    import numpy as np

    from gaussian_splatting_lightning_tpu.core import sh as sh_lib
    from gaussian_splatting_lightning_tpu.core import transforms as tf
    from gaussian_splatting_lightning_tpu.ops.rasterize_reference import (
        rasterize_reference,
    )

    rng = np.random.default_rng(3)
    n = 300
    means = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 1.5)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, size=(n,)).astype(np.float32))
    scales = jnp.asarray(
        rng.uniform(0.05, 0.2, size=(n, 3)).astype(np.float32)
    )
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats = jnp.asarray(quats / np.linalg.norm(quats, axis=1, keepdims=True))
    sh = jnp.asarray(rng.normal(size=(n, 4, 3)).astype(np.float32) * 0.3)
    w, h = 64, 48
    cam = make_camera(
        np.concatenate([np.eye(3), np.asarray([[0.0], [0.0], [4.0]])], 1),
        60.0, 60.0, w, h,
    )
    bg = jnp.zeros(3)

    base = rasterize_reference(
        means, opac, scales, quats, sh, cam, w, h, bg, 1
    )
    rgb = sh_lib.sh_to_rgb(sh, means, cam.campos, jnp.asarray(1), 1)
    cov6 = tf.build_cov3d(scales, quats, 1.0)
    # precomp inputs REPLACE the derived quantities: pass garbage sh/scales/
    # quats to prove they are unused
    junk_sh = sh * 100.0 + 3.0
    junk_scales = scales * 7.0
    via_precomp = rasterize_reference(
        means, opac, junk_scales, quats, junk_sh, cam, w, h, bg, 1,
        colors_precomp=rgb, cov3d_precomp=cov6,
    )
    np.testing.assert_allclose(
        np.asarray(via_precomp.image), np.asarray(base.image), atol=1e-6
    )

    from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import (
        rasterize_tiled,
    )

    out_t, _ = rasterize_tiled(
        means, opac, junk_scales, quats, junk_sh, cam, w, h, bg, 1,
        config=TilingConfig(max_pairs=1 << 14, tile_capacity=256, chunk=32),
        colors_precomp=rgb, cov3d_precomp=cov6,
    )
    out_b, _ = rasterize_tiled(
        means, opac, scales, quats, sh, cam, w, h, bg, 1,
        config=TilingConfig(max_pairs=1 << 14, tile_capacity=256, chunk=32),
    )
    np.testing.assert_allclose(
        np.asarray(out_t.image), np.asarray(out_b.image), atol=1e-6
    )
