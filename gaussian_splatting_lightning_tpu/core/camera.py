"""Camera model: a jit-friendly pytree + projection-matrix construction.

Spec: reference ``gs_lightning/utils/camera.py`` (projection matrix,
z in [0,1], z_sign=+1) and ``gs_lightning/datasets/colmap_dataset.py:85-108``
(row-vector view/proj chain: ``full_proj = view @ proj^T``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def get_projection_matrix(
    fx: float, fy: float, w: int, h: int, znear: float, zfar: float
) -> np.ndarray:
    """Column-vector perspective matrix, z -> [0, 1], z_sign = +1.

    Spec: reference ``utils/camera.py:4-41``. Callers transpose it into the
    row-vector convention.
    """
    right = (w * 0.5) * (znear / fx)
    top = (h * 0.5) * (znear / fy)
    m = np.zeros((4, 4), dtype=np.float64)
    m[0, 0] = znear / right
    m[1, 1] = znear / top
    m[3, 2] = 1.0
    m[2, 2] = (zfar + znear) / (zfar - znear)
    m[2, 3] = -(zfar * znear) / (zfar - znear)
    return m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """One view's rasterization settings (all arrays; jit-traceable).

    Mirrors the fields of the reference's GaussianRasterizationSettings
    (``gs_lightning_module.py:322-336``) minus image size, which stays static.
    """

    viewmatrix: jnp.ndarray  # (4, 4) row-vector world->cam, translation in row 3
    projmatrix: jnp.ndarray  # (4, 4) full projection = view @ proj^T
    campos: jnp.ndarray  # (3,)
    tanfovx: jnp.ndarray  # scalar
    tanfovy: jnp.ndarray  # scalar

    def focal(self, width: int, height: int):
        return (width * 0.5) / self.tanfovx, (height * 0.5) / self.tanfovy


def make_camera(
    cam_from_world: np.ndarray,  # (3, 4) or (4, 4) column-vector world->cam
    fx: float,
    fy: float,
    width: int,
    height: int,
    znear: float = 0.01,
    zfar: float = 100.0,
    dtype=jnp.float32,
) -> Camera:
    """Build a Camera from a COLMAP-style world->cam matrix.

    Spec: reference ``colmap_dataset.py:85-108``: viewmatrix rows 0-2 hold
    cam_from_world^T; projmatrix = viewmatrix @ proj^T; campos = row 3 of
    view^-1; tanfov = (size/2)/focal.
    """
    world_view = np.eye(4, dtype=np.float64)
    world_view[:, :3] = np.asarray(cam_from_world, dtype=np.float64)[:3, :4].T
    proj = get_projection_matrix(fx, fy, width, height, znear, zfar).T
    full_proj = world_view @ proj
    campos = np.linalg.inv(world_view)[3, :3]
    return Camera(
        viewmatrix=jnp.asarray(world_view, dtype=dtype),
        projmatrix=jnp.asarray(full_proj, dtype=dtype),
        campos=jnp.asarray(campos, dtype=dtype),
        tanfovx=jnp.asarray((width * 0.5) / fx, dtype=dtype),
        tanfovy=jnp.asarray((height * 0.5) / fy, dtype=dtype),
    )


def camera_from_matrices(
    viewmatrix, projmatrix, campos, tanfovx, tanfovy, dtype=jnp.float32
) -> Camera:
    """Wrap pre-built (row-vector convention) matrices, e.g. test fixtures."""
    return Camera(
        viewmatrix=jnp.asarray(viewmatrix, dtype=dtype),
        projmatrix=jnp.asarray(projmatrix, dtype=dtype),
        campos=jnp.asarray(campos, dtype=dtype),
        tanfovx=jnp.asarray(tanfovx, dtype=dtype),
        tanfovy=jnp.asarray(tanfovy, dtype=dtype),
    )
