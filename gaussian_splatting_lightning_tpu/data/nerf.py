"""NeRF-synthetic (Blender) dataset support.

Completes the reference's unfinished roadmap item "support nerf dataset"
(reference README.md:46 TODO list — no implementation exists upstream).
Reads the standard Blender format: ``transforms_train.json`` /
``transforms_{test,val}.json`` with ``camera_angle_x`` and per-frame
camera-to-world matrices in the OpenGL convention (camera looks down -Z,
Y up), RGBA PNGs composited over the configured background.

Produces the same host-side ``ViewItem`` records as ``ColmapDataset`` so
the rest of the stack (trainer, sharding, eval) is format-agnostic.
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import List, Optional

import numpy as np

from gaussian_splatting_lightning_tpu.core.camera import get_projection_matrix
from gaussian_splatting_lightning_tpu.data.dataset import ViewItem, _resize


def is_nerf_dataset(path) -> bool:
    """True when `path` holds a Blender-format scene (transforms_*.json)."""
    p = Path(path)
    return (p / "transforms_train.json").exists() or (
        p / "transforms.json"
    ).exists()


def _load_rgba(path: Path) -> np.ndarray:
    import imageio.v2 as imageio

    for candidate in (path, path.with_suffix(".png"), path.with_suffix(".jpg")):
        if candidate.exists():
            return np.asarray(imageio.imread(candidate))
    raise FileNotFoundError(f"no image at {path}(.png/.jpg)")


def _blender_c2w_to_viewmatrix(c2w: np.ndarray) -> np.ndarray:
    """OpenGL camera-to-world -> row-vector world->view matrix.

    Blender/NeRF cameras look down -Z with +Y up; the rasterizer's camera
    convention (reference colmap chain, ``data/dataset.py:113-120``) looks
    down +Z with -Y up, so the camera-frame Y and Z axes are negated before
    inverting. Rows of the result follow the reference layout:
    ``world_view[:, :3] = [R|t].T``.
    """
    c2w = np.asarray(c2w, np.float64).copy()
    c2w[:3, 1:3] *= -1.0  # flip camera Y and Z axes (OpenGL -> COLMAP)
    w2c = np.linalg.inv(c2w)
    world_view = np.eye(4)
    world_view[:, :3] = w2c[:3, :4].T
    return world_view


class NerfDataset:
    """Blender transforms.json dataset with the ColmapDataset item contract."""

    def __init__(
        self,
        scene_path: str,
        split: str = "train",
        resize_to: Optional[int] = None,
        downscale: Optional[float] = None,
        white_background: bool = True,
        z_near: float = 0.01,
        z_far: float = 100.0,
        preload_data: bool = True,
    ):
        self.root = Path(scene_path)
        self.z_near, self.z_far = z_near, z_far
        self.background = (
            np.ones(3, np.float32)
            if white_background
            else np.zeros(3, np.float32)
        )
        meta_path = self.root / f"transforms_{split}.json"
        if not meta_path.exists():
            meta_path = self.root / "transforms.json"
        meta = json.loads(meta_path.read_text())
        self.camera_angle_x = float(meta["camera_angle_x"])
        self.frames = list(meta["frames"])
        self.resize_to = resize_to
        self.downscale = downscale
        self._cache: dict = {}
        if preload_data:
            for i in range(len(self)):
                self._cache[i] = self.build_item(i)

    def __len__(self) -> int:
        return len(self.frames)

    def __getitem__(self, index: int) -> ViewItem:
        if index not in self._cache:
            self._cache[index] = self.build_item(index)
        return self._cache[index]

    def build_item(self, index: int) -> ViewItem:
        frame = self.frames[index]
        rgba = _load_rgba(self.root / frame["file_path"].lstrip("./"))
        h, w = rgba.shape[:2]
        if self.downscale is not None:
            h, w = int(h * self.downscale), int(w * self.downscale)
        elif self.resize_to is not None:
            scale = self.resize_to / max(h, w)
            h, w = int(h * scale), int(w * scale)
        rgba = _resize(rgba, w, h).astype(np.float32) / 255.0
        if rgba.ndim == 2:
            rgba = np.repeat(rgba[..., None], 3, axis=-1)
        if rgba.shape[-1] == 4:
            alpha = rgba[..., 3:4]
            image = rgba[..., :3] * alpha + self.background * (1.0 - alpha)
        else:
            image = rgba[..., :3]

        world_view = _blender_c2w_to_viewmatrix(frame["transform_matrix"])
        # per-frame fov override (some exporters write camera_angle_x per
        # frame); focal scales with the resized width
        angle_x = float(frame.get("camera_angle_x", self.camera_angle_x))
        focal = 0.5 * w / math.tan(0.5 * angle_x)
        projection = get_projection_matrix(
            focal, focal, w, h, self.z_near, self.z_far
        ).T
        full_proj = world_view @ projection
        campos = np.linalg.inv(world_view)[3, :3]

        return ViewItem(
            image=np.moveaxis(image, -1, 0).astype(np.float32),
            viewmatrix=world_view.astype(np.float32),
            projmatrix=full_proj.astype(np.float32),
            campos=campos.astype(np.float32),
            tanfovx=float((w * 0.5) / focal),
            tanfovy=float((h * 0.5) / focal),
            background=self.background,
            name=str(frame["file_path"]),
        )


def camera_centers(views: List[ViewItem]) -> np.ndarray:
    return np.stack([v.campos for v in views])


def nerf_norm_from_views(views: List[ViewItem]) -> dict:
    """getNerfppNorm from camera centers (reference utils/colmap.py:5-23
    computes the same from a pycolmap reconstruction): radius = 1.1 * max
    distance from the camera-center centroid."""
    centers = camera_centers(views)
    centroid = centers.mean(axis=0)
    radius = 1.1 * float(np.linalg.norm(centers - centroid, axis=1).max())
    return {"translate": -centroid, "radius": radius}


def random_init_points(
    n: int = 100_000, extent: float = 1.3, seed: int = 0
) -> tuple:
    """Random splat initialization for SfM-free scenes: n points uniform in
    [-extent, extent]^3 with random colors — the standard Blender-scene init
    (the synthetic scenes have no COLMAP points3D)."""
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-extent, extent, size=(n, 3)).astype(np.float32)
    rgb = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    return xyz, rgb
