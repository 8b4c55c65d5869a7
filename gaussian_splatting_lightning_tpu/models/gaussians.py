"""GaussianScene: the splat store as a padded-capacity, fixed-shape pytree.

Functional redesign of the reference's ``GaussianModel``
(``gs_lightning/modules/gaussian_model.py``). The reference grows/shrinks its
parameter tensors during densification — recompilation poison under XLA — so
here every array has a static ``capacity`` rows and an ``alive`` mask;
densify/prune/clone/split are device-side gathers/scatters into the padded
buffers (training/densify.py), and the whole training step stays one compiled
program.

Parameters (same six as the reference, gaussian_model.py:19-26, stored
pre-activation):
  xyz (C,3) | features_dc (C,1,3) | features_rest (C,K-1,3) |
  opacity (C,1) logit | scales (C,3) log | quats (C,4) unnormalized wxyz
Activations (gaussian_model.py:317-333): sigmoid / exp / L2-normalize.

Densification statistics (max_radii2d, grad_accum, grad_count —
gaussian_model.py:105-107) live beside the params so the train step can thread
one state object.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_lightning_tpu.core import sh as sh_lib
from gaussian_splatting_lightning_tpu.core import transforms as tf
from gaussian_splatting_lightning_tpu.models import ply as ply_io
from gaussian_splatting_lightning_tpu.ops.knn import mean_knn_sq_dist

PARAM_NAMES = ("xyz", "features_dc", "features_rest", "opacity", "scales", "quats")

DEAD_OPACITY_LOGIT = -20.0  # sigmoid(-20) ~ 2e-9: dead slots never render


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianParams:
    """The six learnable tensors (the optax leaves)."""

    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    opacity: jnp.ndarray
    scales: jnp.ndarray
    quats: jnp.ndarray


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianScene:
    params: GaussianParams
    alive: jnp.ndarray  # (C,) bool
    max_radii2d: jnp.ndarray  # (C,) f32
    grad_accum: jnp.ndarray  # (C,) f32 — accumulated screenspace grad norms
    grad_count: jnp.ndarray  # (C,) f32
    active_sh_degree: jnp.ndarray  # () int32

    # ---- static info -----------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    @property
    def max_sh_degree(self) -> int:
        k = 1 + self.params.features_rest.shape[1]
        return int(round(np.sqrt(k))) - 1

    # ---- activations -----------------------------------------------------
    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.params.opacity)

    def get_scales(self) -> jnp.ndarray:
        return jnp.exp(self.params.scales)

    def get_rotation(self) -> jnp.ndarray:
        return tf.normalize_quat(self.params.quats)

    def get_features(self) -> jnp.ndarray:
        return jnp.concatenate(
            [self.params.features_dc, self.params.features_rest], axis=1
        )

    def n_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))

    def step_sh_degree(self) -> "GaussianScene":
        """Reference gaussian_model.py:302-303."""
        return dataclasses.replace(
            self,
            active_sh_degree=jnp.minimum(
                self.active_sh_degree + 1, self.max_sh_degree
            ),
        )

    def reset_opacity(self) -> "GaussianScene":
        """min(opacity, 0.01) in probability space; gaussian_model.py:289-293."""
        new = tf.inverse_sigmoid(jnp.minimum(self.get_opacity(), 0.01))
        return dataclasses.replace(
            self, params=dataclasses.replace(self.params, opacity=new)
        )


def _pad(arr: np.ndarray, capacity: int, fill: float = 0.0) -> np.ndarray:
    n = len(arr)
    if n > capacity:
        raise ValueError(f"capacity {capacity} < initial points {n}")
    out = np.full((capacity,) + arr.shape[1:], fill, dtype=arr.dtype)
    out[:n] = arr
    return out


def from_points(
    xyz: np.ndarray,
    rgb: np.ndarray,
    capacity: int,
    sh_degree: int = 3,
    dtype=jnp.float32,
) -> GaussianScene:
    """Initialize from a sparse SfM point cloud.

    Spec: reference ``GaussianModel.initialize`` (gaussian_model.py:65-107):
    sh0 = (rgb - 0.5)/C0, higher bands zero; log-scale from sqrt of clamped
    mean 3-NN squared distance, isotropic; identity quaternion;
    opacity = inverse_sigmoid(0.1); active_sh_degree starts at 0.
    """
    xyz = np.asarray(xyz, np.float32)
    rgb = np.asarray(rgb, np.float32)
    n = len(xyz)
    k = sh_lib.num_sh_coeffs(sh_degree)

    f_dc = sh_lib.rgb_to_sh0(rgb).reshape(n, 1, 3).astype(np.float32)
    f_rest = np.zeros((n, k - 1, 3), np.float32)
    dist = np.maximum(mean_knn_sq_dist(xyz), 1e-7)
    log_scales = np.repeat(
        np.log(np.sqrt(dist))[:, None], 3, axis=1
    ).astype(np.float32)
    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0
    opacity = np.full((n, 1), np.log(0.1 / 0.9), np.float32)

    alive = np.zeros(capacity, bool)
    alive[:n] = True
    params = GaussianParams(
        xyz=jnp.asarray(_pad(xyz, capacity), dtype),
        features_dc=jnp.asarray(_pad(f_dc, capacity), dtype),
        features_rest=jnp.asarray(_pad(f_rest, capacity), dtype),
        opacity=jnp.asarray(
            _pad(opacity, capacity, DEAD_OPACITY_LOGIT), dtype
        ),
        scales=jnp.asarray(_pad(log_scales, capacity), dtype),
        quats=jnp.asarray(_pad(quats, capacity), dtype).at[n:, 0].set(1.0),
    )
    return GaussianScene(
        params=params,
        alive=jnp.asarray(alive),
        max_radii2d=jnp.zeros(capacity, dtype),
        grad_accum=jnp.zeros(capacity, dtype),
        grad_count=jnp.zeros(capacity, dtype),
        active_sh_degree=jnp.asarray(0, jnp.int32),
    )


def from_colmap_points_ply(
    ply_path: str, capacity: int, sh_degree: int = 3
) -> GaussianScene:
    xyz, rgb = ply_io.read_points_ply(ply_path)
    return from_points(xyz, rgb, capacity, sh_degree)


def save_ply(scene: GaussianScene, path: str) -> None:
    """Checkpoint the *alive* splats in the reference/Inria PLY layout."""
    alive = np.asarray(scene.alive)
    p = scene.params
    ply_io.write_gaussian_ply(
        path,
        xyz=np.asarray(p.xyz)[alive],
        features_dc=np.asarray(p.features_dc)[alive],
        features_rest=np.asarray(p.features_rest)[alive],
        opacity=np.asarray(p.opacity)[alive],
        scales=np.asarray(p.scales)[alive],
        quats=np.asarray(p.quats)[alive],
    )


def load_ply(
    path: str, capacity: int | None = None, dtype=jnp.float32
) -> GaussianScene:
    """Load a checkpoint PLY (ours, the reference's, or Inria's).

    ``active_sh_degree`` is set to the checkpoint's full degree — fixing the
    reference's loader which always lands on degree 2 (gaussian_model.py:132).
    """
    d = ply_io.read_gaussian_ply(path)
    n = len(d["xyz"])
    capacity = capacity or n
    alive = np.zeros(capacity, bool)
    alive[:n] = True
    params = GaussianParams(
        xyz=jnp.asarray(_pad(d["xyz"], capacity), dtype),
        features_dc=jnp.asarray(_pad(d["features_dc"], capacity), dtype),
        features_rest=jnp.asarray(_pad(d["features_rest"], capacity), dtype),
        opacity=jnp.asarray(_pad(d["opacity"], capacity, DEAD_OPACITY_LOGIT), dtype),
        scales=jnp.asarray(_pad(d["scales"], capacity), dtype),
        quats=jnp.asarray(_pad(d["quats"], capacity), dtype).at[n:, 0].set(1.0),
    )
    return GaussianScene(
        params=params,
        alive=jnp.asarray(alive),
        max_radii2d=jnp.zeros(capacity, dtype),
        grad_accum=jnp.zeros(capacity, dtype),
        grad_count=jnp.zeros(capacity, dtype),
        active_sh_degree=jnp.asarray(d["sh_degree"], jnp.int32),
    )
