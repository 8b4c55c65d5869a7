"""Real spherical-harmonics evaluation, degrees 0-4.

Behavioral spec: the reference's ``gs_lightning/utils/sh.py:41-98`` (apply_sh)
with one deliberate fix — the reference gates its degree-4 band behind a
second ``if sh_degree < 3`` (sh.py:83), so its pure-Python path cannot run at
degree 3 with the standard 16-coefficient layout. Here degree-4 terms are only
evaluated for ``degree >= 4``.

Layout: ``sh`` is ``(..., K, 3)`` — coefficient-major, channel-minor — the
same layout as the reference's ``GaussianModel.get_features()``
(``gs_lightning/modules/gaussian_model.py:320-321``).

Two entry points:
- :func:`eval_sh` — ``degree`` is a static Python int (specialized code).
- :func:`eval_sh_banded` — ``degree`` is a traced int32; all bands up to a
  static ``max_degree`` are computed and masked. This keeps a single XLA
  compilation alive across SH-degree warmup (the reference recompiles nothing
  because it is eager; under jit we must not recompile every 1000 steps).
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = (-0.4886025119029199, 0.4886025119029199, -0.4886025119029199)
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
SH_C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def _band_basis(dirs: jnp.ndarray, band: int) -> jnp.ndarray:
    """Basis functions for one SH band. dirs (..., 3) -> (..., 2*band+1)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    if band == 0:
        return jnp.full(dirs.shape[:-1] + (1,), SH_C0, dtype=dirs.dtype)
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, zx = x * y, y * z, z * x
    if band == 1:
        return jnp.stack(
            [SH_C1[0] * y, SH_C1[1] * z, SH_C1[2] * x], axis=-1
        )
    if band == 2:
        return jnp.stack(
            [
                SH_C2[0] * xy,
                SH_C2[1] * yz,
                SH_C2[2] * (2.0 * zz - xx - yy),
                SH_C2[3] * zx,
                SH_C2[4] * (xx - yy),
            ],
            axis=-1,
        )
    if band == 3:
        return jnp.stack(
            [
                SH_C3[0] * y * (3.0 * xx - yy),
                SH_C3[1] * xy * z,
                SH_C3[2] * y * (4.0 * zz - xx - yy),
                SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                SH_C3[4] * x * (4.0 * zz - xx - yy),
                SH_C3[5] * z * (xx - yy),
                SH_C3[6] * x * (xx - 3.0 * yy),
            ],
            axis=-1,
        )
    if band == 4:
        return jnp.stack(
            [
                SH_C4[0] * xy * (xx - yy),
                SH_C4[1] * yz * (3.0 * xx - yy),
                SH_C4[2] * xy * (7.0 * zz - 1.0),
                SH_C4[3] * yz * (7.0 * zz - 3.0),
                SH_C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
                SH_C4[5] * zx * (7.0 * zz - 3.0),
                SH_C4[6] * (xx - yy) * (7.0 * zz - 1.0),
                SH_C4[7] * zx * (xx - 3.0 * yy),
                SH_C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
            ],
            axis=-1,
        )
    raise ValueError(f"SH band {band} unsupported (max 4)")


def eval_sh(sh: jnp.ndarray, dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate SH colors. sh (..., K, 3), dirs (..., 3) unit -> (..., 3)."""
    if not 0 <= degree <= 4:
        raise ValueError(f"degree must be in [0, 4], got {degree}")
    result = SH_C0 * sh[..., 0, :]
    offset = 1
    for band in range(1, degree + 1):
        basis = _band_basis(dirs, band)  # (..., 2b+1)
        n = 2 * band + 1
        coeffs = sh[..., offset : offset + n, :]  # (..., n, 3)
        result = result + jnp.einsum("...n,...nc->...c", basis, coeffs)
        offset += n
    return result


def eval_sh_banded(
    sh: jnp.ndarray, dirs: jnp.ndarray, degree: jnp.ndarray, max_degree: int
) -> jnp.ndarray:
    """Like :func:`eval_sh` but ``degree`` may be a traced int32 scalar.

    Computes every band up to the static ``max_degree`` and masks bands above
    the live degree — one compiled program covers the whole SH warmup.
    """
    result = SH_C0 * sh[..., 0, :]
    offset = 1
    for band in range(1, max_degree + 1):
        basis = _band_basis(dirs, band)
        n = 2 * band + 1
        coeffs = sh[..., offset : offset + n, :]
        contrib = jnp.einsum("...n,...nc->...c", basis, coeffs)
        gate = (degree >= band).astype(result.dtype)
        result = result + gate * contrib
        offset += n
    return result


def sh_to_rgb(
    sh: jnp.ndarray,
    points: jnp.ndarray,
    campos: jnp.ndarray,
    degree,
    max_degree: int | None = None,
) -> jnp.ndarray:
    """SH -> clamped RGB along the view direction.

    Spec: reference ``render_tools.py:118-131`` (computeColorFromSH):
    normalize(points - campos), eval, +0.5, clamp_min 0.
    """
    direction = points - campos[None, :]
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    if max_degree is None:
        rgb = eval_sh(sh, direction, int(degree))
    else:
        rgb = eval_sh_banded(sh, direction, degree, max_degree)
    return jnp.maximum(rgb + 0.5, 0.0)


def rgb_to_sh0(rgb: jnp.ndarray) -> jnp.ndarray:
    """Reference ``utils/sh.py:100-101``."""
    return (rgb - 0.5) / SH_C0


def sh0_to_rgb(sh0: jnp.ndarray) -> jnp.ndarray:
    return sh0 * SH_C0 + 0.5
