"""Splatting geometry: quaternions, 3D/2D covariances (EWA), conics, radii.

Behavioral spec: the reference's pure-Python rasterizer math
(``gs_lightning/rasterize/render_tools.py`` and ``camera_tools.py``) — the
executable specification for our kernels. Everything here is pure ``jnp``,
shape-polymorphic over a leading batch axis, and differentiable.

Conventions (load-bearing, easy to get silently wrong):
- Row-vector matrices: points transform as ``p_hom @ M``
  (reference ``camera_tools.py:21-27``); ``viewmatrix`` stores translation in
  its last *row*.
- Projection maps z to [0, 1] with z_sign=+1 (reference ``utils/camera.py``).
- 2D covariance is dilated by +0.3 px *before* both inversion and radius
  (the reference mutates cov2D in-place in ``inverse_conv2D``,
  ``render_tools.py:79-80``, so ``compute_extent_and_radius`` at
  ``rasterize.py:79`` sees the dilated matrix).
"""

from __future__ import annotations

import jax.numpy as jnp

COV_DILATION = 0.3  # reference render_tools.py:73 (h_var)
RADIUS_FACTOR = 3.0
FRUSTUM_NEAR_Z = 0.2  # reference camera_tools.py:7


def normalize_quat(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize wxyz quaternions, (..., 4)."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """wxyz unit quaternion -> rotation matrix. (..., 4) -> (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def build_cov3d(
    scales: jnp.ndarray, quats: jnp.ndarray, scale_modifier: float = 1.0
) -> jnp.ndarray:
    """Sigma = R S S^T R^T, upper triangle (xx, xy, xz, yy, yz, zz).

    Spec: reference ``render_tools.py:56-70`` (computeConv3D). ``quats`` are
    assumed normalized. (..., 3), (..., 4) -> (..., 6).

    Written as pure elementwise math over the rotation-matrix entries
    (Sigma_ij = sum_k s_k^2 R_ik R_jk) rather than batched 3x3 matmuls:
    XLA lowers (N,3,3) dot_generals to convolution fusions on T(4,128)
    layouts that cost ~50 ms at N=1M on v5e, vs ~2 ms for the VPU loop this
    fuses into.
    """
    s = scales * scale_modifier
    s2 = s * s
    s2x, s2y, s2z = s2[..., 0], s2[..., 1], s2[..., 2]
    w, x, y, z = quats[..., 0], quats[..., 1], quats[..., 2], quats[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r00 = 1.0 - 2.0 * (yy + zz)
    r01 = 2.0 * (xy - wz)
    r02 = 2.0 * (xz + wy)
    r10 = 2.0 * (xy + wz)
    r11 = 1.0 - 2.0 * (xx + zz)
    r12 = 2.0 * (yz - wx)
    r20 = 2.0 * (xz - wy)
    r21 = 2.0 * (yz + wx)
    r22 = 1.0 - 2.0 * (xx + yy)
    c_xx = s2x * r00 * r00 + s2y * r01 * r01 + s2z * r02 * r02
    c_xy = s2x * r00 * r10 + s2y * r01 * r11 + s2z * r02 * r12
    c_xz = s2x * r00 * r20 + s2y * r01 * r21 + s2z * r02 * r22
    c_yy = s2x * r10 * r10 + s2y * r11 * r11 + s2z * r12 * r12
    c_yz = s2x * r10 * r20 + s2y * r11 * r21 + s2z * r12 * r22
    c_zz = s2x * r20 * r20 + s2y * r21 * r21 + s2z * r22 * r22
    return jnp.stack([c_xx, c_xy, c_xz, c_yy, c_yz, c_zz], axis=-1)


def cov3d_to_matrix(cov6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) upper triangle -> (..., 3, 3) symmetric."""
    m = jnp.stack(
        [
            cov6[..., 0], cov6[..., 1], cov6[..., 2],
            cov6[..., 1], cov6[..., 3], cov6[..., 4],
            cov6[..., 2], cov6[..., 4], cov6[..., 5],
        ],
        axis=-1,
    )
    return m.reshape(cov6.shape[:-1] + (3, 3))


def apply_extrinsic(points: jnp.ndarray, viewmatrix: jnp.ndarray) -> jnp.ndarray:
    """[p, 1] @ view -> (..., 4). Spec: camera_tools.py:21-27."""
    ones = jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)
    return jnp.concatenate([points, ones], axis=-1) @ viewmatrix


def apply_projection(
    points: jnp.ndarray, projmatrix: jnp.ndarray, eps: float = 1e-7
) -> jnp.ndarray:
    """Homogeneous projection -> NDC xy, (..., 2). Spec: camera_tools.py:10-19."""
    ones = jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)
    p_hom = jnp.concatenate([points, ones], axis=-1) @ projmatrix
    p_w = 1.0 / (p_hom[..., -1:] + eps)
    return (p_hom * p_w)[..., :2]


def in_frustum(p_view: jnp.ndarray) -> jnp.ndarray:
    """Visibility = view-space z > 0.2 only (reference camera_tools.py:5-8;
    the NDC bounds check is deliberately commented out upstream)."""
    return p_view[..., 2] > FRUSTUM_NEAR_Z


def ndc_to_pix(ndc_xy: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """NDC -> pixel coords. Spec: camera_tools.py:29-32."""
    x = ((ndc_xy[..., 0] + 1.0) * width - 1.0) * 0.5
    y = ((ndc_xy[..., 1] + 1.0) * height - 1.0) * 0.5
    return jnp.stack([x, y], axis=-1)


def project_cov3d_ewa(
    means3d: jnp.ndarray,
    cov6: jnp.ndarray,
    viewmatrix: jnp.ndarray,
    focal_x: float,
    focal_y: float,
    tan_fovx: float,
    tan_fovy: float,
) -> jnp.ndarray:
    """EWA projection of 3D covariance to screen space.

    Spec: reference ``render_tools.py:13-52`` (computeConv2D). Returns the
    *undilated* 2x2 covariance as (..., 3) = (a, b, d) for [[a, b], [b, d]].
    """
    p_view = apply_extrinsic(means3d, viewmatrix)
    z = p_view[..., 2]
    # a splat exactly AT the camera plane (z == +-0.0) produces
    # 0 * inf = NaN in the Jacobian terms below, and that NaN forward value
    # poisons every parameter's gradient through the VJP chain even under a
    # zero cotangent (NaN * 0 = NaN). Nudge only the exact-degenerate case:
    # anything with |z| > 0 keeps the reference's raw-z behaviour (the
    # quirks oracle renders even culled splats, so a wider clamp would
    # change reference-parity values).
    z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    lim_x, lim_y = 1.3 * tan_fovx, 1.3 * tan_fovy
    x = jnp.clip(p_view[..., 0] / z, -lim_x, lim_x) * z
    y = jnp.clip(p_view[..., 1] / z, -lim_y, lim_y) * z

    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    # J rows: [fx/z, 0, -fx*x/z^2], [0, fy/z, -fy*y/z^2] (3rd row unused).
    j00 = focal_x * inv_z
    j02 = -focal_x * x * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * y * inv_z2

    # Row-vector viewmatrix => world->cam rotation (column form) is view[:3,:3]^T.
    W = viewmatrix[:3, :3].T  # (3, 3)
    # T = J @ W, keeping only the two needed rows. t0/t1: (..., 3)
    t0 = j00[..., None] * W[0] + j02[..., None] * W[2]
    t1 = j11[..., None] * W[1] + j12[..., None] * W[2]

    # quadratic forms t_a^T V t_b over the symmetric 6-entry cov — pure
    # elementwise VPU math (see build_cov3d for why no (N,3,3) einsums)
    v_xx, v_xy, v_xz = cov6[..., 0], cov6[..., 1], cov6[..., 2]
    v_yy, v_yz, v_zz = cov6[..., 3], cov6[..., 4], cov6[..., 5]

    def quad(u, v):
        return (
            v_xx * u[..., 0] * v[..., 0]
            + v_yy * u[..., 1] * v[..., 1]
            + v_zz * u[..., 2] * v[..., 2]
            + v_xy * (u[..., 0] * v[..., 1] + u[..., 1] * v[..., 0])
            + v_xz * (u[..., 0] * v[..., 2] + u[..., 2] * v[..., 0])
            + v_yz * (u[..., 1] * v[..., 2] + u[..., 2] * v[..., 1])
        )

    a = quad(t0, t0)
    b = quad(t0, t1)
    d = quad(t1, t1)
    return jnp.stack([a, b, d], axis=-1)


def conic_and_radius(
    cov2d: jnp.ndarray, antialias: bool = False
):
    """Dilate cov2d, invert to a conic, compute the 3-sigma pixel radius.

    Spec: reference ``render_tools.py:73-116`` (inverse_conv2D +
    compute_extent_and_radius — radius uses the *dilated* covariance).

    Returns (conic (...,3), radius (...,), valid (...,), opacity_scale (...,),
    lam_max (...,) — the dilated covariance's larger eigenvalue, used by the
    opacity-aware binning radius).
    """
    # near-camera-plane splats can reach |cov| ~ 1e26, overflowing the det
    # products to inf and det to inf - inf = NaN — which poisons EVERY
    # parameter's gradient through the VJP chain even though such splats
    # are frustum-culled (NaN * 0 = NaN). Clamp magnitudes so products stay
    # finite; real screen covariances are many orders below this.
    lim = 1e18
    a = jnp.clip(cov2d[..., 0], -lim, lim)
    b = jnp.clip(cov2d[..., 1], -lim, lim)
    d = jnp.clip(cov2d[..., 2], -lim, lim)
    det_raw = a * d - b * b
    a_h, d_h = a + COV_DILATION, d + COV_DILATION
    det = a_h * d_h - b * b

    if antialias:
        opacity_scale = jnp.sqrt(jnp.maximum(det_raw / det, 0.000025))
    else:
        opacity_scale = jnp.ones_like(det_raw)

    valid = det != 0.0
    det_inv = 1.0 / jnp.maximum(det, 1e-5)
    conic = jnp.stack([d_h * det_inv, -b * det_inv, a_h * det_inv], axis=-1)

    mid = 0.5 * (a_h + d_h)
    sqrt_term = jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    lam_max = mid + sqrt_term  # sqrt_term >= 0 so this is the larger root
    radius = jnp.ceil(RADIUS_FACTOR * jnp.sqrt(lam_max))
    return conic, radius, valid, opacity_scale, lam_max


def tight_radius(
    opacity: jnp.ndarray, lam_max: jnp.ndarray, alpha_threshold: float
) -> jnp.ndarray:
    """Exact support radius of a splat's rendered contribution.

    The compositor zeroes every pixel with alpha = op * exp(-q/2) <=
    ``alpha_threshold`` (reference rasterize.py:193/223), and the Mahalanobis
    form q >= |d|^2 / lam_max, so pixels farther than
    sqrt(2 ln(op/threshold) * lam_max) contribute *exactly zero* color and
    gradient. Binning with min(this, 3-sigma) therefore drops only
    all-zero (splat, tile) pairs — image- and gradient-exact — while
    shrinking the pair count (and with it the adaptive pair budget that every
    per-pair binning stage scales with). Low-opacity splats (op <= threshold)
    collapse to radius 0: they render as exact zeros everywhere.

    The +1 margin covers ``tile_rect``'s trunc arithmetic (reference
    render_tools.py:134-139), whose excluded tiles only guarantee pixel
    distance > r - 1, plus f32 rounding of the kill test near the threshold.
    """
    log_ratio = jnp.log(jnp.maximum(opacity / alpha_threshold, 1.0))
    # near-camera-plane splats can overflow lam_max to inf (their radius is
    # discarded by the frustum cull, but 0 * inf = NaN here would poison
    # gradients through the VJP chain); cap at a harmless ~1.8M px radius
    lam_safe = jnp.minimum(lam_max, 1e12)
    return jnp.ceil(jnp.sqrt(2.0 * log_ratio * lam_safe)) + 1.0


def tile_rect(
    p_pix: jnp.ndarray,
    radius: jnp.ndarray,
    grid_x: int,
    grid_y: int,
    block_x: int = 16,
    block_y: int = 16,
):
    """Tile-index bounding rect covered by each splat.

    Spec: reference ``render_tools.py:134-139`` (get_covered_tiles) — note the
    truncation-toward-zero of ``.int()`` on the pre-clamp quotient.
    Returns (x_min, y_min, x_max, y_max), each (...,) int32, half-open ranges.
    """
    px, py = p_pix[..., 0], p_pix[..., 1]
    x_min = jnp.clip(jnp.trunc((px - radius) / block_x).astype(jnp.int32), 0, grid_x)
    y_min = jnp.clip(jnp.trunc((py - radius) / block_y).astype(jnp.int32), 0, grid_y)
    x_max = jnp.clip(
        jnp.trunc((px + radius + block_x - 1) / block_x).astype(jnp.int32), 0, grid_x
    )
    y_max = jnp.clip(
        jnp.trunc((py + radius + block_y - 1) / block_y).astype(jnp.int32), 0, grid_y
    )
    return x_min, y_min, x_max, y_max


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x / (1.0 - x))
