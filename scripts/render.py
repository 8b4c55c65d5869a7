"""Inference entry point: render one trained view and save a triptych.

Capability parity with the reference's ``scripts/render_trained_image.py``:
load a checkpoint PLY, pick a COLMAP frame, render (fast kernel path or the
readable oracle via ``--use-oracle``, mirroring ``--use_pytorch``), report
wall-clock, save [GT | render | depth].

Usage:
    python -m scripts.render CKPT.ply --colmap PATH --image-folder PATH \
        --image-idx 1 [--resize-to 1600] [--use-oracle] [--out out.png]
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint")
    parser.add_argument("--colmap", required=True)
    parser.add_argument("--image-folder", default=None,
                        help="required for COLMAP scenes; unused for "
                        "Blender transforms.json scenes")
    parser.add_argument("--image-idx", type=int, default=None)
    parser.add_argument("--resize-to", type=int, default=None)
    parser.add_argument("--downscale", type=float, default=None)
    parser.add_argument("--use-oracle", action="store_true",
                        help="use the readable jnp oracle rasterizer")
    parser.add_argument("--white-background", action="store_true")
    parser.add_argument("--out", default="render.png")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussian_splatting_lightning_tpu.core.camera import Camera
    from gaussian_splatting_lightning_tpu.data import ColmapDataset
    from gaussian_splatting_lightning_tpu.models import load_ply
    from gaussian_splatting_lightning_tpu.ops.rasterize_reference import (
        rasterize_reference,
    )
    from gaussian_splatting_lightning_tpu.training.trainer import (
        render_scene,
        resolve_rasterizer,
    )

    scene = load_ply(args.checkpoint)
    print(
        f"loaded {int(scene.n_alive())} splats, SH degree "
        f"{int(scene.active_sh_degree)}"
    )

    from gaussian_splatting_lightning_tpu.data.nerf import (
        NerfDataset,
        is_nerf_dataset,
    )

    if is_nerf_dataset(args.colmap):
        ds = NerfDataset(
            args.colmap, split="train",
            resize_to=args.resize_to, downscale=args.downscale,
            white_background=args.white_background, preload_data=False,
        )
        index = args.image_idx or 0
    else:
        ds = ColmapDataset(
            args.colmap, args.image_folder,
            resize_to=args.resize_to, downscale=args.downscale,
            white_background=args.white_background, preload_data=False,
        )
        index = 0
        if args.image_idx is not None:
            index = ds.image_indices.index(args.image_idx)
    view = ds[index]
    h, w = view.image.shape[-2:]
    cam = Camera(
        viewmatrix=jnp.asarray(view.viewmatrix),
        projmatrix=jnp.asarray(view.projmatrix),
        campos=jnp.asarray(view.campos),
        tanfovx=jnp.asarray(view.tanfovx),
        tanfovy=jnp.asarray(view.tanfovy),
    )
    bg = jnp.asarray(view.background)

    if args.use_oracle:
        out = rasterize_reference(
            scene.params.xyz, scene.get_opacity(), scene.get_scales(),
            scene.get_rotation(), scene.get_features(), cam, w, h, bg,
            int(scene.active_sh_degree),
        )
        image, depth = out.image, out.depth
        elapsed = float("nan")
    else:
        from gaussian_splatting_lightning_tpu.ops.budget import pair_budget
        from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import (
            TilingConfig,
        )

        impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
        tiling = TilingConfig(
            max_pairs=pair_budget(
                scene, cam, w, h, TilingConfig().resolve_block(impl)
            ),
            tile_capacity=4096,
        )
        fn = jax.jit(
            lambda s: render_scene(
                s, cam, w, h, bg, tiling,
                rasterize_fn=resolve_rasterizer(impl),
            )
        )
        out, stats = fn(scene)
        jax.block_until_ready(out.image)  # compile outside the timer
        dropped = int(stats["num_dropped_pairs"]) + int(
            stats["num_tile_overflow"]
        )
        if dropped:
            print(
                f"WARNING: dropped {dropped} splat-tile pairs "
                f"(budget {tiling.max_pairs}); image is degraded"
            )
        t0 = time.perf_counter()
        out, _ = fn(scene)
        jax.block_until_ready(out.image)
        elapsed = time.perf_counter() - t0
        image, depth = out.image, out.depth
        print(f"render time: {elapsed * 1e3:.2f} ms ({w}x{h})")

    image = np.clip(np.asarray(image), 0, 1)
    depth = np.asarray(depth)
    depth = depth / max(depth.max(), 1e-8)
    trip = np.concatenate(
        [view.image, image, np.repeat(depth, 3, axis=0)], axis=-1
    )
    trip = (np.moveaxis(trip, 0, -1) * 255).astype(np.uint8)

    import imageio.v2 as imageio

    imageio.imwrite(args.out, trip)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
