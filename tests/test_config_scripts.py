"""Config loading + end-to-end script smoke test on a synthetic COLMAP scene."""

import json
import struct
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def test_load_default_config():
    from gaussian_splatting_lightning_tpu.training.config import load_config

    cfg = load_config(Path(__file__).parent.parent / "configs" / "train_gs.yaml")
    assert cfg.train.num_iters == 30000
    assert cfg.train.densify.densify_grad_threshold == 0.0002
    assert cfg.train.optimizer.eps == 1e-15
    assert cfg.train.tiling.max_pairs == 2097152
    assert cfg.capacity == 1 << 21
    assert cfg.data.resize_to == 1600


def test_all_committed_configs_load():
    from gaussian_splatting_lightning_tpu.training.config import load_config

    cfg_dir = Path(__file__).parent.parent / "configs"
    paths = sorted(cfg_dir.glob("*.yaml"))
    assert paths
    for p in paths:
        cfg = load_config(p)
        assert cfg.capacity > 0


def test_cli_overrides(tmp_path):
    from gaussian_splatting_lightning_tpu.training.config import load_config

    base = Path(__file__).parent.parent / "configs" / "train_gs.yaml"
    cfg = load_config(
        base,
        overrides=[
            "train.num_iters=123",
            "train.tiling.max_pairs=8192",
            "train.densify.densify_grad_threshold=5e-5",
            "data.white_background=true",
            "run_name=ovr",
        ],
    )
    assert cfg.train.num_iters == 123
    assert cfg.train.tiling.max_pairs == 8192
    assert cfg.train.densify.densify_grad_threshold == 5e-5
    assert cfg.data.white_background is True
    assert cfg.run_name == "ovr"
    # unknown dotted key still rejected
    with pytest.raises(KeyError):
        load_config(base, overrides=["train.not_a_key=1"])
    with pytest.raises(ValueError):
        load_config(base, overrides=["no_equals_sign"])


def test_unknown_key_rejected(tmp_path):
    from gaussian_splatting_lightning_tpu.training.config import load_config

    p = tmp_path / "bad.yaml"
    p.write_text("train:\n  not_a_real_key: 1\n")
    with pytest.raises(KeyError):
        load_config(p)


def _norm(q):
    q = np.asarray(q, float)
    return q / np.linalg.norm(q)


def _make_synthetic_colmap(root: Path, n_views=6, n_points=120, w=64, h=48):
    """Binary COLMAP model + rendered images from a ring of cameras."""
    import imageio.v2 as imageio

    sparse = root / "sparse" / "0"
    sparse.mkdir(parents=True)
    imgdir = root / "images"
    imgdir.mkdir()

    fx = fy = 60.0
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n_points, 3)).astype(np.float64) * 0.8
    cols = rng.integers(30, 225, size=(n_points, 3))

    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, w, h))
        f.write(struct.pack("<4d", fx, fy, w / 2, h / 2))

    images = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        fwd = -np.array([np.cos(ang), 0.15, np.sin(ang)])
        fwd /= np.linalg.norm(fwd)
        pos = -4.0 * fwd
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        R = np.stack([right, np.cross(fwd, right), fwd], 0)
        t = -R @ pos
        # rotation matrix -> wxyz quaternion
        tr = np.trace(R)
        qw = np.sqrt(max(0.0, 1 + tr)) / 2
        qx = (R[2, 1] - R[1, 2]) / (4 * qw)
        qy = (R[0, 2] - R[2, 0]) / (4 * qw)
        qz = (R[1, 0] - R[0, 1]) / (4 * qw)
        images.append((_norm([qw, qx, qy, qz]), t, f"v{i}.png"))

    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", n_views))
        for i, (q, t, name) in enumerate(images):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))

    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", n_points))
        for pid, (xyz, rgb) in enumerate(zip(pts, cols)):
            f.write(struct.pack("<Q3d3Bd", pid, *xyz, *rgb, 0.5))
            f.write(struct.pack("<Q", 0))

    # render GT images through our own oracle-initialized scene
    import jax.numpy as jnp

    from gaussian_splatting_lightning_tpu.core.camera import make_camera
    from gaussian_splatting_lightning_tpu.models import from_points
    from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import TilingConfig
    from gaussian_splatting_lightning_tpu.training.trainer import render_scene
    import dataclasses

    scene = from_points(
        pts.astype(np.float32), cols.astype(np.float32) / 255.0,
        capacity=n_points, sh_degree=1,
    )
    scene = dataclasses.replace(
        scene,
        params=dataclasses.replace(
            scene.params,
            scales=jnp.full_like(scene.params.scales, np.log(0.1)),
            opacity=jnp.full_like(scene.params.opacity, 1.5),
        ),
    )
    for q, t, name in images:
        w_, x_, y_, z_ = q
        Rq = np.array([
            [1 - 2 * (y_ * y_ + z_ * z_), 2 * (x_ * y_ - w_ * z_), 2 * (x_ * z_ + w_ * y_)],
            [2 * (x_ * y_ + w_ * z_), 1 - 2 * (x_ * x_ + z_ * z_), 2 * (y_ * z_ - w_ * x_)],
            [2 * (x_ * z_ - w_ * y_), 2 * (y_ * z_ + w_ * x_), 1 - 2 * (x_ * x_ + y_ * y_)],
        ])
        cam = make_camera(np.concatenate([Rq, np.asarray(t)[:, None]], 1), fx, fy, w, h)
        out, _ = render_scene(
            scene, cam, w, h, jnp.zeros(3),
            TilingConfig(max_pairs=1 << 14, tile_capacity=128, chunk=32),
        )
        img = (np.clip(np.moveaxis(np.asarray(out.image), 0, -1), 0, 1) * 255).astype(np.uint8)
        imageio.imwrite(imgdir / name, img)
    return root


def test_train_script_end_to_end(tmp_path):
    """Run the actual CLI for a short training on a synthetic scene."""
    root = _make_synthetic_colmap(tmp_path / "scene")
    cfg = f"""
exp_name: smoke
run_name: t
sh_degree: 1
capacity: 512
data:
  colmap_path: {root}
  image_folder: {root}/images
  downscale: 1.0
  holdout_every: 6
train:
  num_iters: 30
  log_interval: 10
  valid_interval: 20
  checkpoint_interval: 1000
  rasterizer: xla
  densify:
    densify_since: 5
    densify_interval: 10
    densify_until: 25
  tiling:
    max_pairs: 16384
    tile_capacity: 128
    chunk: 32
"""
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(cfg)
    out_dir = tmp_path / "out"
    env = dict(
        PATH="/usr/bin:/bin:/usr/local/bin",
        JAX_PLATFORMS="cpu",
        HOME="/root",
    )
    res = subprocess.run(
        [sys.executable, "-m", "scripts.train", "-c", str(cfg_path),
         "--out-dir", str(out_dir)],
        capture_output=True, text=True, timeout=600,
        cwd=Path(__file__).parent.parent, env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    run_dir = next((out_dir / "smoke").iterdir())
    assert (run_dir / "point_cloud-final.ply").exists()
    log = [
        json.loads(l)
        for l in (run_dir / "train_log.jsonl").read_text().splitlines()
    ]
    assert log[-1]["loss"] < log[0]["loss"]
    assert (run_dir / "config.json").exists()

    # render the trained checkpoint through the CLI (oracle path, CPU)
    out_png = tmp_path / "render.png"
    res2 = subprocess.run(
        [sys.executable, "-m", "scripts.render",
         str(run_dir / "point_cloud-final.ply"),
         "--colmap", str(root), "--image-folder", str(root / "images"),
         "--downscale", "1.0", "--use-oracle", "--out", str(out_png)],
        capture_output=True, text=True, timeout=600,
        cwd=Path(__file__).parent.parent, env=env,
    )
    assert res2.returncode == 0, res2.stderr[-3000:]
    assert out_png.exists()

    # evaluate the checkpoint through the CLI
    metrics_json = tmp_path / "metrics.json"
    res3 = subprocess.run(
        [sys.executable, "-m", "scripts.eval",
         str(run_dir / "point_cloud-final.ply"),
         "--colmap", str(root), "--image-folder", str(root / "images"),
         "--downscale", "1.0", "--holdout-every", "3", "--use-oracle",
         "--out", str(metrics_json)],
        capture_output=True, text=True, timeout=600,
        cwd=Path(__file__).parent.parent, env=env,
    )
    assert res3.returncode == 0, res3.stderr[-3000:]
    metrics = json.loads(metrics_json.read_text())
    assert metrics["mean"]["psnr"] > 5.0
    assert 0.0 <= metrics["mean"]["ssim"] <= 1.0

    # camera-path flythrough CLI on the trained checkpoint
    frames_dir = tmp_path / "frames"
    res4 = subprocess.run(
        [sys.executable, "-m", "scripts.render_path",
         str(run_dir / "point_cloud-final.ply"),
         "--colmap", str(root), "--image-folder", str(root / "images"),
         "--downscale", "1.0", "--n-frames", "4", "--loop",
         "--out", str(frames_dir), "--gif", str(tmp_path / "path.gif")],
        capture_output=True, text=True, timeout=600,
        cwd=Path(__file__).parent.parent, env=env,
    )
    assert res4.returncode == 0, res4.stderr[-3000:]
    assert len(list(frames_dir.glob("frame_*.png"))) == 4
    assert (tmp_path / "path.gif").exists()

    # web-viewer .splat export CLI
    res5 = subprocess.run(
        [sys.executable, "-m", "scripts.export_splat",
         str(run_dir / "point_cloud-final.ply"),
         "--out", str(tmp_path / "scene.splat")],
        capture_output=True, text=True, timeout=600,
        cwd=Path(__file__).parent.parent, env=env,
    )
    assert res5.returncode == 0, res5.stderr[-3000:]
    size = (tmp_path / "scene.splat").stat().st_size
    assert size > 0 and size % 32 == 0
