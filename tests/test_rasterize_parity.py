"""Forward parity: our jnp oracle vs the reference's pure-PyTorch rasterizer,
executed live on the reference's frozen treehill camera fixtures
(BASELINE config 1 gate)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from gaussian_splatting_lightning_tpu.core.camera import camera_from_matrices
from gaussian_splatting_lightning_tpu.ops.rasterize_reference import (
    mark_visible,
    rasterize_reference,
)
from tests.ref_oracle import load_reference_rasterize, load_treehill_fixtures

RNG = np.random.default_rng(7)


def _make_gaussians(n, sh_coeffs=16, spread=3.0):
    means = RNG.normal(size=(n, 3)).astype(np.float32) * spread
    opac = RNG.uniform(0.3, 0.95, size=(n, 1)).astype(np.float32)
    scales = RNG.uniform(0.02, 0.25, size=(n, 3)).astype(np.float32)
    quats = RNG.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    sh = RNG.normal(size=(n, sh_coeffs, 3)).astype(np.float32) * 0.3
    return means, opac, scales, quats, sh


@pytest.fixture(scope="module")
def ref_raster():
    return load_reference_rasterize()


@pytest.fixture(scope="module")
def fixtures():
    return load_treehill_fixtures()


def test_mark_visible_parity(ref_raster, fixtures):
    settings, points, _ = fixtures
    for s in settings:
        ref = ref_raster.markVisible(
            torch.from_numpy(points),
            torch.from_numpy(s["viewmatrix"]),
            torch.from_numpy(s["projmatrix"]),
        ).numpy()
        ours = np.asarray(
            mark_visible(
                jnp.asarray(points), jnp.asarray(s["viewmatrix"]),
                jnp.asarray(s["projmatrix"]),
            )
        )
        np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("view_idx", [0, 1, 2])
def test_forward_parity_treehill(ref_raster, fixtures, view_idx):
    settings, points, common = fixtures
    s = settings[view_idx]
    # Keep a small render for test speed; parity is per-pixel so size-agnostic.
    W, H = 160, 112
    n = len(points)
    _, opac, scales, quats, sh = _make_gaussians(n)
    means = points
    sh_degree = 2  # reference's SH eval cannot run degree 3 (utils/sh.py:83)
    bg = np.zeros(3, dtype=np.float32)

    ref_img, ref_radii, ref_depth = ref_raster.rasterize_gaussian(
        means3D=torch.from_numpy(means),
        opacities=torch.from_numpy(opac),
        scales=torch.from_numpy(scales),
        rotations=torch.from_numpy(quats),
        shs=torch.from_numpy(sh),
        scale_modifier=1.0,
        image_width=W,
        image_height=H,
        tanfovx=common["tanfovx"],
        tanfovy=common["tanfovy"],
        viewmatrix=torch.from_numpy(s["viewmatrix"]),
        projmatrix=torch.from_numpy(s["projmatrix"]),
        campos=torch.from_numpy(s["campos"]),
        background=torch.from_numpy(bg),
        sh_degree=sh_degree,
    )

    cam = camera_from_matrices(
        s["viewmatrix"], s["projmatrix"], s["campos"],
        common["tanfovx"], common["tanfovy"],
    )
    out = rasterize_reference(
        jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), jnp.asarray(sh), cam, W, H,
        jnp.asarray(bg), sh_degree,
        reference_quirks=True,
    )

    np.testing.assert_allclose(
        np.asarray(out.radii), ref_radii.numpy(), atol=1.0 + 1e-6
    )
    assert (np.asarray(out.radii) == ref_radii.numpy()).mean() > 0.95
    np.testing.assert_allclose(
        np.asarray(out.image), ref_img.numpy(), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.depth), ref_depth.numpy(), rtol=1e-3, atol=2e-3
    )


def test_forward_parity_dense_scene(ref_raster, fixtures):
    """Denser random cloud in front of the camera — exercises overlap order."""
    settings, _, common = fixtures
    s = settings[0]
    W, H = 96, 64
    n = 400
    means, opac, scales, quats, sh = _make_gaussians(n, spread=2.0)
    # push the cloud toward where this camera looks: sample around campos
    # shifted along the camera forward axis (row-vector view: forward = col 2)
    fwd = s["viewmatrix"][:3, 2]
    means = (
        s["campos"][None, :] + fwd[None, :] * 4.0 + means * 0.8
    ).astype(np.float32)
    bg = np.array([0.2, 0.3, 0.4], dtype=np.float32)

    ref_img, ref_radii, ref_depth = ref_raster.rasterize_gaussian(
        means3D=torch.from_numpy(means),
        opacities=torch.from_numpy(opac),
        scales=torch.from_numpy(scales),
        rotations=torch.from_numpy(quats),
        shs=torch.from_numpy(sh),
        scale_modifier=1.0,
        image_width=W,
        image_height=H,
        tanfovx=common["tanfovx"],
        tanfovy=common["tanfovy"],
        viewmatrix=torch.from_numpy(s["viewmatrix"]),
        projmatrix=torch.from_numpy(s["projmatrix"]),
        campos=torch.from_numpy(s["campos"]),
        background=torch.from_numpy(bg),
        sh_degree=1,
    )
    cam = camera_from_matrices(
        s["viewmatrix"], s["projmatrix"], s["campos"],
        common["tanfovx"], common["tanfovy"],
    )
    out = rasterize_reference(
        jnp.asarray(means), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), jnp.asarray(sh), cam, W, H,
        jnp.asarray(bg), 1, reference_quirks=True,
    )
    np.testing.assert_allclose(
        np.asarray(out.image), ref_img.numpy(), rtol=2e-3, atol=1e-3
    )


def test_backward_finite(fixtures):
    """Gradients exist and are finite through the full oracle forward."""
    settings, points, common = fixtures
    s = settings[0]
    W, H = 64, 48
    n = len(points)
    _, opac, scales, quats, sh = _make_gaussians(n)
    cam = camera_from_matrices(
        s["viewmatrix"], s["projmatrix"], s["campos"],
        common["tanfovx"], common["tanfovy"],
    )
    target = jnp.zeros((3, H, W)) + 0.5

    def loss_fn(means, opac, scales, quats, sh, offset):
        out = rasterize_reference(
            means, opac, scales, quats, sh, cam, W, H,
            jnp.zeros(3), 2, means2d_ndc_offset=offset,
        )
        return jnp.abs(out.image - target).mean()

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5))(
        jnp.asarray(points), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), jnp.asarray(sh), jnp.zeros((n, 2)),
    )
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    # the screen-space gradient signal must be nonzero for visible splats
    assert np.abs(np.asarray(grads[5])).sum() > 0
