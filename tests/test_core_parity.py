"""Parity of core math vs the reference implementation (executed, not copied)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from gaussian_splatting_lightning_tpu.core import sh as sh_lib
from gaussian_splatting_lightning_tpu.core import transforms as tf
from gaussian_splatting_lightning_tpu.core.camera import get_projection_matrix
from tests.ref_oracle import load_reference_module

RNG = np.random.default_rng(0)


def _rand_unit_quats(n):
    q = RNG.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def ref_tools():
    return load_reference_module("rasterize.render_tools")


@pytest.fixture(scope="module")
def ref_sh():
    return load_reference_module("utils.sh")


@pytest.fixture(scope="module")
def ref_camera():
    return load_reference_module("utils.camera")


@pytest.mark.parametrize("degree", [0, 1, 2, 4])
def test_sh_matches_reference(ref_sh, degree):
    # Degree 3 is skipped against the reference: its second `< 3` gate
    # (utils/sh.py:83) erroneously evaluates degree-4 terms at degree 3.
    n, k = 64, 25
    sh = RNG.normal(size=(n, k, 3)).astype(np.float32)
    dirs = RNG.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    ref = ref_sh.apply_sh(
        torch.from_numpy(sh), torch.from_numpy(dirs), degree
    ).numpy()
    ours = np.asarray(sh_lib.eval_sh(jnp.asarray(sh), jnp.asarray(dirs), degree))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)

    banded = np.asarray(
        sh_lib.eval_sh_banded(jnp.asarray(sh), jnp.asarray(dirs), jnp.int32(degree), 4)
    )
    np.testing.assert_allclose(banded, ref, rtol=2e-5, atol=2e-5)


def test_sh_degree3_fixes_reference_gating_bug():
    # Our degree-3 eval must only touch the first 16 coefficients.
    n = 8
    sh16 = RNG.normal(size=(n, 16, 3)).astype(np.float32)
    dirs = RNG.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sh_lib.eval_sh(jnp.asarray(sh16), jnp.asarray(dirs), 3)
    assert np.isfinite(np.asarray(out)).all()


def test_cov3d_matches_reference(ref_tools):
    n = 128
    scales = np.abs(RNG.normal(size=(n, 3))).astype(np.float32) * 0.5
    quats = _rand_unit_quats(n)
    ref = ref_tools.computeConv3D(
        torch.from_numpy(scales), 1.3, torch.from_numpy(quats)
    ).numpy()
    ours = np.asarray(tf.build_cov3d(jnp.asarray(scales), jnp.asarray(quats), 1.3))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_cov2d_conic_radius_match_reference(ref_tools):
    n = 256
    means = RNG.normal(size=(n, 3)).astype(np.float32) * 3.0
    means[:, 2] += 6.0
    scales = np.abs(RNG.normal(size=(n, 3))).astype(np.float32) * 0.3
    quats = _rand_unit_quats(n)
    view = np.eye(4, dtype=np.float32)
    view[3, :3] = [0.2, -0.1, 0.5]
    tanfovx, tanfovy, w, h = 0.6, 0.4, 640, 416
    fx, fy = w * 0.5 / tanfovx, h * 0.5 / tanfovy

    cov3d_ref = ref_tools.computeConv3D(
        torch.from_numpy(scales), 1.0, torch.from_numpy(quats)
    )
    cov2d_ref = ref_tools.computeConv2D(
        torch.from_numpy(means), fx, fy, tanfovx, tanfovy,
        cov3d_ref, torch.from_numpy(view),
    )
    # NOTE inverse_conv2D mutates cov2d in place (adds the +0.3 dilation);
    # the reference then computes the radius from the dilated matrix.
    inv_ref, invalid_ref, hscale_ref = ref_tools.inverse_conv2D(cov2d_ref.clone())
    cov2d_dilated = cov2d_ref.clone()
    cov2d_dilated[:, 0, 0] += 0.3
    cov2d_dilated[:, 1, 1] += 0.3
    radius_ref = ref_tools.compute_extent_and_radius(cov2d_dilated).numpy()

    cov6 = tf.build_cov3d(jnp.asarray(scales), jnp.asarray(quats), 1.0)
    cov2d = tf.project_cov3d_ewa(
        jnp.asarray(means), cov6, jnp.asarray(view), fx, fy, tanfovx, tanfovy
    )
    cov2d_full = np.asarray(cov2d)
    ref_c = cov2d_ref.numpy()
    np.testing.assert_allclose(cov2d_full[:, 0], ref_c[:, 0, 0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(cov2d_full[:, 1], ref_c[:, 0, 1], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(cov2d_full[:, 2], ref_c[:, 1, 1], rtol=1e-4, atol=1e-4)

    conic, radius, valid, _, _ = tf.conic_and_radius(cov2d)
    conic = np.asarray(conic)
    inv_ref = inv_ref.numpy()
    np.testing.assert_allclose(conic[:, 0], inv_ref[:, 0, 0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(conic[:, 1], inv_ref[:, 0, 1], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(conic[:, 2], inv_ref[:, 1, 1], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(radius), radius_ref, atol=1.0 + 1e-6)
    # radii are ceil()ed so allow off-by-one on boundary values; require
    # almost all to agree exactly
    assert (np.asarray(radius) == radius_ref).mean() > 0.98


def test_antialias_opacity_scaling_matches_reference(ref_tools):
    n = 64
    cov = RNG.normal(size=(n, 3)).astype(np.float32)
    cov = np.stack(
        [np.abs(cov[:, 0]) + 0.05, cov[:, 1] * 0.01, np.abs(cov[:, 2]) + 0.05], -1
    )
    cov_t = torch.zeros(n, 2, 2)
    cov_t[:, 0, 0], cov_t[:, 0, 1] = torch.from_numpy(cov[:, 0]), torch.from_numpy(cov[:, 1])
    cov_t[:, 1, 0], cov_t[:, 1, 1] = torch.from_numpy(cov[:, 1]), torch.from_numpy(cov[:, 2])
    _, _, hscale_ref = ref_tools.inverse_conv2D(cov_t, antialias=True)
    _, _, _, hscale, _ = tf.conic_and_radius(jnp.asarray(cov), antialias=True)
    np.testing.assert_allclose(np.asarray(hscale), hscale_ref.numpy(), rtol=1e-5)


def test_projection_matrix_matches_reference(ref_camera):
    ours = get_projection_matrix(400.0, 410.0, 640, 480, 0.01, 100.0)
    ref = ref_camera.get_projection_matrix(400.0, 410.0, 640, 480, 0.01, 100.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_camera_tools_match_reference():
    ct = load_reference_module("rasterize.camera_tools")
    n = 64
    pts = RNG.normal(size=(n, 3)).astype(np.float32) * 4
    view = RNG.normal(size=(4, 4)).astype(np.float32)
    proj = RNG.normal(size=(4, 4)).astype(np.float32)

    ref_ext = ct.apply_extrinsic_matrix(torch.from_numpy(pts), torch.from_numpy(view))
    ours_ext = tf.apply_extrinsic(jnp.asarray(pts), jnp.asarray(view))
    np.testing.assert_allclose(np.asarray(ours_ext), ref_ext.numpy(), rtol=1e-5, atol=1e-5)

    ref_proj = ct.apply_projection_matrix(torch.from_numpy(pts), torch.from_numpy(proj))
    ours_proj = tf.apply_projection(jnp.asarray(pts), jnp.asarray(proj))
    np.testing.assert_allclose(np.asarray(ours_proj), ref_proj.numpy(), rtol=1e-4, atol=1e-4)

    ref_pix = ct.ndc2Pix(ref_proj, 634, 416).numpy()
    ours_pix = tf.ndc_to_pix(ours_proj, 634, 416)
    np.testing.assert_allclose(np.asarray(ours_pix), ref_pix, rtol=1e-4, atol=1e-3)
