"""NeRF-synthetic (Blender) dataset support — the reference's unfinished
"support nerf dataset" roadmap item (reference README.md TODO; no upstream
implementation exists). Validates the OpenGL->COLMAP camera-convention
conversion against the rasterizer and the CLI train path end-to-end."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from gaussian_splatting_lightning_tpu.core.camera import make_camera
from gaussian_splatting_lightning_tpu.data.nerf import (
    NerfDataset,
    _blender_c2w_to_viewmatrix,
    is_nerf_dataset,
    nerf_norm_from_views,
    random_init_points,
)
from gaussian_splatting_lightning_tpu.models import from_points
from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import TilingConfig
from gaussian_splatting_lightning_tpu.training.trainer import render_scene

RNG = np.random.default_rng(11)


def _colmap_pose(i, n, radius=4.0):
    """world->cam [R|t] rows (camera looks at origin, +Z forward)."""
    ang = 2 * np.pi * i / n
    pos = np.array([radius * np.cos(ang), 0.8, radius * np.sin(ang)])
    fwd = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    R = np.stack([right, up2, fwd], 0)
    t = -R @ pos
    return R, t


def _to_blender_c2w(R, t):
    """[R|t] world->cam (COLMAP convention) -> Blender/OpenGL c2w."""
    c2w = np.eye(4)
    c2w[:3, :3] = R.T
    c2w[:3, 3] = -R.T @ t
    c2w[:3, 1:3] *= -1.0  # COLMAP -> OpenGL camera axes
    return c2w


def test_blender_c2w_roundtrip():
    R, t = _colmap_pose(3, 8)
    c2w = _to_blender_c2w(R, t)
    world_view = _blender_c2w_to_viewmatrix(c2w)
    expect = np.eye(4)
    expect[:, :3] = np.concatenate([R, t[:, None]], 1).T
    np.testing.assert_allclose(world_view, expect, atol=1e-12)


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    """Tiny Blender-format scene rendered from known splats."""
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("blender")
    (root / "train").mkdir()
    w, h, n_views = 64, 48, 6
    fov_x = np.radians(60.0)
    focal = 0.5 * w / np.tan(0.5 * fov_x)

    xyz = RNG.normal(size=(60, 3)).astype(np.float32) * 0.8
    rgb = RNG.uniform(0.2, 0.9, size=(60, 3)).astype(np.float32)
    gt = from_points(xyz, rgb, capacity=60, sh_degree=1)
    tiling = TilingConfig(max_pairs=1 << 14, tile_capacity=128, chunk=32)

    frames = []
    for i in range(n_views):
        R, t = _colmap_pose(i, n_views)
        cam = make_camera(np.concatenate([R, t[:, None]], 1), focal, focal, w, h)
        out, _ = render_scene(gt, cam, w, h, jnp.ones(3), tiling)
        img8 = (
            np.clip(np.moveaxis(np.asarray(out.image), 0, -1), 0, 1) * 255
            + 0.5
        ).astype(np.uint8)
        name = f"train/r_{i}"
        imageio.imwrite(root / f"{name}.png", img8)
        frames.append(
            {
                "file_path": f"./{name}",
                "transform_matrix": _to_blender_c2w(R, t).tolist(),
            }
        )
    meta = {"camera_angle_x": float(fov_x), "frames": frames}
    (root / "transforms_train.json").write_text(json.dumps(meta))
    return root, gt, tiling, (w, h)


def test_nerf_dataset_cameras_match_rasterizer(blender_scene):
    """A view loaded through NerfDataset must render the same image the
    frame was generated with (camera-convention chain is exact)."""
    root, gt, tiling, (w, h) = blender_scene
    assert is_nerf_dataset(root)
    ds = NerfDataset(str(root), split="train", downscale=1.0,
                     white_background=True)
    assert len(ds) == 6
    v = ds[2]
    from gaussian_splatting_lightning_tpu.core.camera import Camera

    cam = Camera(
        viewmatrix=jnp.asarray(v.viewmatrix),
        projmatrix=jnp.asarray(v.projmatrix),
        campos=jnp.asarray(v.campos),
        tanfovx=jnp.asarray(np.float32(v.tanfovx)),
        tanfovy=jnp.asarray(np.float32(v.tanfovy)),
    )
    out, _ = render_scene(gt, cam, w, h, jnp.ones(3), tiling)
    rendered = np.clip(np.asarray(out.image), 0, 1)
    # the stored image went through one uint8 quantization
    assert np.abs(rendered - v.image).max() < 3.0 / 255.0

    norm = nerf_norm_from_views([ds[i] for i in range(len(ds))])
    assert norm["radius"] == pytest.approx(1.1 * np.sqrt(4.0**2 + 0.0), rel=0.2)


def test_nerf_train_cli_end_to_end(blender_scene, tmp_path, monkeypatch):
    """scripts/train.py auto-detects the Blender scene, random-inits the
    splats, and the loss decreases."""
    import sys

    root, *_ = blender_scene
    cfg = f"""
exp_name: nerf
run_name: smoke
out_dir: {tmp_path}/runs
seed: 0
sh_degree: 1
capacity: 4096
data:
  colmap_path: {root}
  downscale: 1.0
  white_background: true
  holdout_every: 6
train:
  num_iters: 60
  log_interval: 20
  valid_interval: 60
  checkpoint_interval: 100000
  tiling:
    max_pairs: 32768
    tile_capacity: 256
    chunk: 64
"""
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(cfg)
    monkeypatch.setattr(sys, "argv", ["train", "-c", str(cfg_path)])
    from scripts.train import main

    main()
    run_dir = next((tmp_path / "runs" / "nerf").iterdir())
    logs = [
        json.loads(line)
        for line in (run_dir / "train_log.jsonl").read_text().splitlines()
    ]
    assert logs[-1]["loss"] < logs[0]["loss"]
    xyz, rgb = random_init_points(n=100, extent=1.3, seed=1)
    assert xyz.shape == (100, 3) and np.abs(xyz).max() <= 1.3

    # render + eval CLIs on the trained checkpoint (Blender path)
    ckpt = run_dir / "point_cloud-final.ply"
    out_png = tmp_path / "r.png"
    monkeypatch.setattr(
        sys, "argv",
        ["render", str(ckpt), "--colmap", str(root), "--downscale", "1.0",
         "--white-background", "--out", str(out_png)],
    )
    from scripts.render import main as render_main

    render_main()
    assert out_png.exists()
    out_json = tmp_path / "m.json"
    monkeypatch.setattr(
        sys, "argv",
        ["eval", str(ckpt), "--colmap", str(root), "--downscale", "1.0",
         "--white-background", "--holdout-every", "3",
         "--out", str(out_json)],
    )
    from scripts.eval import main as eval_main

    eval_main()
    metrics = json.loads(out_json.read_text())
    assert metrics["mean"]["psnr"] > 10.0
