"""Evaluate a trained checkpoint over a validation split.

Renders every selected view and reports per-view and mean PSNR / SSIM / L1 —
the field-standard evaluation pass the reference never ships (SURVEY §5:
"no PSNR/LPIPS eval metrics").

Usage:
    python -m scripts.eval CKPT.ply --colmap PATH --image-folder PATH \
        [--resize-to 1600 | --downscale 0.5] [--holdout-every 8]
        [--idx-file eval.txt] [--use-oracle] [--out metrics.json]
"""

from __future__ import annotations

import argparse
import json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint")
    parser.add_argument("--colmap", required=True)
    parser.add_argument("--image-folder", default=None,
                        help="required for COLMAP scenes; unused for "
                        "Blender transforms.json scenes")
    parser.add_argument("--resize-to", type=int, default=None)
    parser.add_argument("--downscale", type=float, default=None)
    parser.add_argument("--holdout-every", type=int, default=None,
                        help="evaluate every Nth view (llff-style split)")
    parser.add_argument("--idx-file", default=None)
    parser.add_argument("--white-background", action="store_true")
    parser.add_argument("--use-oracle", action="store_true")
    parser.add_argument(
        "--lpips-weights", default=None,
        help="path to an lpips_vgg16.npz exported by "
        "scripts/export_lpips_weights.py; adds LPIPS to the metrics "
        "(pretrained weights are not obtainable inside this image — "
        "BASELINE.md 'LPIPS' note)",
    )
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussian_splatting_lightning_tpu.core.camera import Camera
    from gaussian_splatting_lightning_tpu.data import ColmapDataset
    from gaussian_splatting_lightning_tpu.models import load_ply
    from gaussian_splatting_lightning_tpu.ops.rasterize_reference import (
        rasterize_reference,
    )
    from gaussian_splatting_lightning_tpu.ops.ssim import psnr, ssim
    from gaussian_splatting_lightning_tpu.training.trainer import (
        render_scene,
        resolve_rasterizer,
    )
    from gaussian_splatting_lightning_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    lpips_weights = None
    if args.lpips_weights:
        from gaussian_splatting_lightning_tpu.ops.lpips import load_weights

        lpips_weights = load_weights(args.lpips_weights)
    scene = load_ply(args.checkpoint)
    from gaussian_splatting_lightning_tpu.data.nerf import (
        NerfDataset,
        is_nerf_dataset,
    )

    if is_nerf_dataset(args.colmap):
        from pathlib import Path

        split = "test" if (
            Path(args.colmap) / "transforms_test.json"
        ).exists() else "train"
        ds = NerfDataset(
            args.colmap, split=split,
            resize_to=args.resize_to, downscale=args.downscale,
            white_background=args.white_background, preload_data=False,
        )
    else:
        ds = ColmapDataset(
            args.colmap, args.image_folder, image_idx=args.idx_file,
            resize_to=args.resize_to, downscale=args.downscale,
            white_background=args.white_background, preload_data=False,
        )
    indices = list(range(len(ds)))
    if args.holdout_every:
        indices = indices[:: args.holdout_every]

    impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    raster = resolve_rasterizer(impl)
    render_jit = None
    tiling = None
    rows = []
    for i in indices:
        view = ds[i]
        h, w = view.image.shape[-2:]
        cam = Camera(
            viewmatrix=jnp.asarray(view.viewmatrix),
            projmatrix=jnp.asarray(view.projmatrix),
            campos=jnp.asarray(view.campos),
            tanfovx=jnp.asarray(view.tanfovx),
            tanfovy=jnp.asarray(view.tanfovy),
        )
        if args.use_oracle:
            image = rasterize_reference(
                scene.params.xyz, scene.get_opacity(), scene.get_scales(),
                scene.get_rotation(), scene.get_features(), cam, w, h,
                jnp.asarray(view.background), int(scene.active_sh_degree),
            ).image
        else:
            if render_jit is None:
                # size the static pair budget for THIS scene (the default
                # budget silently drops the farthest splats on big scenes)
                from gaussian_splatting_lightning_tpu.ops.budget import (
                    pair_budget,
                )
                from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import (
                    TilingConfig,
                )

                all_cams = [
                    Camera(
                        viewmatrix=np.asarray(ds[j].viewmatrix),
                        projmatrix=np.asarray(ds[j].projmatrix),
                        campos=np.asarray(ds[j].campos),
                        tanfovx=ds[j].tanfovx, tanfovy=ds[j].tanfovy,
                    )
                    for j in indices
                ]
                blk = TilingConfig().resolve_block(impl)
                tiling = TilingConfig(
                    max_pairs=pair_budget(scene, all_cams, w, h, blk),
                    tile_capacity=4096,
                )
                render_jit = jax.jit(
                    lambda s, c, bg: render_scene(
                        s, c, w, h, bg, tiling, rasterize_fn=raster
                    )
                )
            out, stats = render_jit(scene, cam, jnp.asarray(view.background))
            image = out.image
            dropped = int(stats["num_dropped_pairs"]) + int(
                stats["num_tile_overflow"]
            )
            if dropped:
                print(
                    f"WARNING: view {i} dropped {dropped} splat-tile pairs "
                    f"(budget {tiling.max_pairs}); metrics are degraded"
                )
        gt = jnp.asarray(view.image)
        image = jnp.clip(image, 0.0, 1.0)
        row = dict(
            view=view.name or str(i),
            psnr=float(psnr(image, gt)),
            ssim=float(ssim(image, gt)),
            l1=float(jnp.mean(jnp.abs(image - gt))),
        )
        if lpips_weights is not None:
            from gaussian_splatting_lightning_tpu.ops.lpips import lpips

            row["lpips"] = float(lpips(image, gt, lpips_weights))
        rows.append(row)
        print(
            f"{row['view']}: psnr={row['psnr']:.2f} "
            f"ssim={row['ssim']:.4f} l1={row['l1']:.4f}"
            + (f" lpips={row['lpips']:.4f}" if "lpips" in row else "")
        )

    keys = ("psnr", "ssim", "l1") + (
        ("lpips",) if lpips_weights is not None else ()
    )
    mean = {k: float(np.mean([r[k] for r in rows])) for k in keys}
    print(
        f"MEAN over {len(rows)} views: psnr={mean['psnr']:.2f} "
        f"ssim={mean['ssim']:.4f} l1={mean['l1']:.4f}"
        + (f" lpips={mean['lpips']:.4f}" if "lpips" in mean else "")
    )
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"views": rows, "mean": mean}, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
