"""Render a smooth camera path through a trained scene.

Novel-view flythrough: keyframes are the dataset's camera poses (COLMAP or
Blender), the path interpolates between them (slerp rotation, Catmull-Rom
position), frames are rendered with the fast kernel path under one jit and
written as PNGs plus an optional GIF. Extends the reference's single-frame
``scripts/render_trained_image.py`` surface to sequences.

Usage:
    python -m scripts.render_path CKPT.ply --colmap PATH \
        [--image-folder PATH] [--n-frames 120] [--downscale 0.5] \
        [--loop] [--out frames_dir] [--gif path.gif]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def slerp(q0: np.ndarray, q1: np.ndarray, t: float) -> np.ndarray:
    """Spherical interpolation between two wxyz quaternions."""
    d = float(np.dot(q0, q1))
    if d < 0.0:  # shortest arc
        q1, d = -q1, -d
    if d > 0.9995:
        q = q0 + t * (q1 - q0)
        return q / np.linalg.norm(q)
    th = np.arccos(np.clip(d, -1.0, 1.0))
    return (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)


def rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """(3,3) rotation -> wxyz unit quaternion."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                      (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
        q = np.zeros(4)
        q[0] = (R[k, j] - R[j, k]) / s
        q[1 + i] = 0.25 * s
        q[1 + j] = (R[j, i] + R[i, j]) / s
        q[1 + k] = (R[k, i] + R[i, k]) / s
    return q / np.linalg.norm(q)


def quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def catmull_rom(p0, p1, p2, p3, t: float) -> np.ndarray:
    """Centripetal-flavored cubic through p1..p2 (standard CR, tau=0.5)."""
    t2, t3 = t * t, t * t * t
    return 0.5 * (
        (2 * p1)
        + (-p0 + p2) * t
        + (2 * p0 - 5 * p1 + 4 * p2 - p3) * t2
        + (-p0 + 3 * p1 - 3 * p2 + p3) * t3
    )


def interpolate_path(keys, n_frames: int, loop: bool):
    """keys: list of (R world->cam rows, C camera center). Yields (R, C)."""
    m = len(keys)
    quats = [rotmat_to_quat(R) for R, _ in keys]
    cents = [C for _, C in keys]
    n_seg = m if loop else m - 1
    for f in range(n_frames):
        u = f * n_seg / n_frames if loop else f * n_seg / max(n_frames - 1, 1)
        s = min(int(u), n_seg - 1)
        t = u - s

        def k(i):
            return (i % m) if loop else min(max(i, 0), m - 1)

        C = catmull_rom(
            cents[k(s - 1)], cents[k(s)], cents[k(s + 1)], cents[k(s + 2)], t
        )
        q = slerp(quats[k(s)], quats[k(s + 1)], t)
        yield quat_to_rotmat(q), C


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint")
    parser.add_argument("--colmap", required=True)
    parser.add_argument("--image-folder", default=None)
    parser.add_argument("--n-frames", type=int, default=120)
    parser.add_argument("--resize-to", type=int, default=None)
    parser.add_argument("--downscale", type=float, default=None)
    parser.add_argument("--white-background", action="store_true")
    parser.add_argument("--loop", action="store_true",
                        help="close the path back to the first keyframe")
    parser.add_argument("--out", default="path_frames")
    parser.add_argument("--gif", default=None)
    parser.add_argument("--fps", type=float, default=30.0)
    args = parser.parse_args()

    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from gaussian_splatting_lightning_tpu.core.camera import make_camera
    from gaussian_splatting_lightning_tpu.data import ColmapDataset
    from gaussian_splatting_lightning_tpu.data.nerf import (
        NerfDataset,
        is_nerf_dataset,
    )
    from gaussian_splatting_lightning_tpu.models import load_ply
    from gaussian_splatting_lightning_tpu.training.trainer import (
        render_scene,
        resolve_rasterizer,
    )
    from gaussian_splatting_lightning_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    scene = load_ply(args.checkpoint)
    print(f"loaded {int(scene.n_alive())} splats")

    common = dict(
        resize_to=args.resize_to, downscale=args.downscale,
        white_background=args.white_background, preload_data=False,
    )
    if is_nerf_dataset(args.colmap):
        ds = NerfDataset(args.colmap, split="train", **common)
    else:
        ds = ColmapDataset(args.colmap, args.image_folder, **common)
    views = [ds[i] for i in range(len(ds))]
    h, w = views[0].image.shape[-2:]
    fx = (w * 0.5) / views[0].tanfovx
    fy = (h * 0.5) / views[0].tanfovy
    bg = jnp.asarray(views[0].background)

    # keyframes: (world->cam rotation rows, camera center), in dataset order
    keys = []
    for v in views:
        R = np.asarray(v.viewmatrix, dtype=np.float64)[:3, :3].T
        keys.append((R, np.asarray(v.campos, dtype=np.float64)))

    from gaussian_splatting_lightning_tpu.core.camera import Camera
    from gaussian_splatting_lightning_tpu.ops.budget import pair_budget
    from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import TilingConfig

    impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    key_cams = [
        Camera(
            viewmatrix=np.asarray(v.viewmatrix),
            projmatrix=np.asarray(v.projmatrix),
            campos=np.asarray(v.campos),
            tanfovx=v.tanfovx, tanfovy=v.tanfovy,
        )
        for v in views
    ]
    # interpolated poses lie between the keyframes; extra headroom covers
    # pair-count variation along the path
    tiling = TilingConfig(
        max_pairs=pair_budget(
            scene, key_cams, w, h, TilingConfig().resolve_block(impl),
            headroom=1.5,
        ),
        tile_capacity=4096,
    )
    render = jax.jit(
        lambda s, cam: render_scene(
            s, cam, w, h, bg, tiling, rasterize_fn=resolve_rasterizer(impl)
        )
    )
    warned = [False]

    def render_checked(s, cam):
        out, stats = render(s, cam)
        if not warned[0] and int(stats["num_dropped_pairs"]) > 0:
            warned[0] = True
            print(
                f"WARNING: dropped {int(stats['num_dropped_pairs'])} "
                f"splat-tile pairs (budget {tiling.max_pairs})"
            )
        return out.image

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    gif = imageio.get_writer(args.gif, duration=1.0 / args.fps) if args.gif \
        else None
    for i, (R, C) in enumerate(
        interpolate_path(keys, args.n_frames, args.loop)
    ):
        t = -R @ C
        cam = make_camera(np.concatenate([R, t[:, None]], 1), fx, fy, w, h)
        img = np.clip(np.asarray(render_checked(scene, cam)), 0.0, 1.0)
        img8 = (np.moveaxis(img, 0, -1) * 255.0 + 0.5).astype(np.uint8)
        imageio.imwrite(out_dir / f"frame_{i:05d}.png", img8)
        if gif is not None:
            gif.append_data(img8)
        if i % 10 == 0:
            print(f"frame {i}/{args.n_frames}")
    if gif is not None:
        gif.close()
        print(f"wrote {args.gif}")
    print(f"wrote {args.n_frames} frames to {out_dir}")


if __name__ == "__main__":
    main()
