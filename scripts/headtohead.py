"""Cross-framework training head-to-head: the reference vs this framework.

The strongest quality-parity evidence attainable in this image (VERDICT r3
next #3): no real COLMAP dataset exists here (zero egress), but the
reference's pure-PyTorch rasterizer is plain tensor code that torch autograd
differentiates (/root/reference/gs_lightning/rasterize/rasterize.py:28-127 —
it runs under no_grad only by its caller's choice,
scripts/render_trained_image.py:79). So: train the REFERENCE ITSELF — its
rasterizer under torch.autograd, its own optimizer groups/LRs
(gs_lightning_module.py:114-134), its own LR scheduler (scheduler.py:27-46,
imported live), its own loss weighting (gs_lightning_module.py:281-284) —
and this framework, on the IDENTICAL tiny scene, init, and view sequence,
and compare PSNR trajectories.

Controls for a fair comparison:
- GT images are rendered by the REFERENCE's rasterizer (so any forward
  mismatch penalizes us, not them);
- identical init arrays (numpy): same SfM-like noisy point subset, the
  reference's own distCUDA2 (utils/math.py:9-14, imported live) for the
  scale init, grey rgb2sh0 colors, inv_sigmoid(0.1) opacity, identity quats;
- identical deterministic round-robin view order (the RandomSampler
  permutation stream is implementation-defined; ordering is not what's
  under test);
- densification OFF on both sides (its RNG streams cannot be made
  bit-identical across frameworks; densify parity is covered by
  tests/test_training.py Adam/densify parity tests);
- loss = pure L1 (w_ssim = 0): the reference's SSIM term is the CUDA-only
  fused-ssim submodule, absent from this image. Both sides use
  loss = (1 - w_ssim) * L1 with w_ssim = 0 — the reference's exact
  weighting formula at that setting.

Writes a step-by-step PSNR table (JSON + stdout) and a verdict line; the
BASELINE.md "head-to-head" section records the result.

Usage: python -m scripts.headtohead [--steps 800] [--every 50]
       [--width 128 --height 96] [--out artifacts/headtohead_r4]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from pathlib import Path


def build_cameras(n_views, w, h, fx=110.0, radius=4.0):
    """Ring of cameras looking at the origin, reference row-vector
    convention (colmap_dataset.py:85-98 chain via core.camera.make_camera)."""
    import numpy as np

    from gaussian_splatting_lightning_tpu.core.camera import make_camera

    cams = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        fwd = -np.array([np.cos(ang), 0.25 * np.sin(1.7 * ang + 0.3), np.sin(ang)])
        fwd /= np.linalg.norm(fwd)
        pos = -radius * fwd
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R = np.stack([right, up2, fwd], 0)  # world->cam rows
        t = -R @ pos
        cams.append(make_camera(np.concatenate([R, t[:, None]], 1), fx, fx, w, h))
    return cams


def make_gt_splats(n=2000, seed=0):
    """Clustered anisotropic GT cloud (numpy) with low-frequency colors."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n_clusters = 12
    centers = rng.normal(size=(n_clusters, 3)) * 1.1
    which = rng.integers(0, n_clusters, size=n)
    xyz = centers[which] + rng.normal(size=(n, 3)) * 0.35
    base = rng.uniform(0.15, 0.95, size=(n_clusters, 3))
    rgb = np.clip(base[which] + rng.normal(size=(n, 3)) * 0.08, 0.02, 0.98)
    scales = np.exp(rng.uniform(np.log(0.02), np.log(0.09), size=(n, 3)))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opacity = rng.uniform(0.55, 0.95, size=(n, 1))
    return (
        xyz.astype(np.float32), rgb.astype(np.float32),
        scales.astype(np.float32), quats.astype(np.float32),
        opacity.astype(np.float32),
    )


def reference_render(ref, cam, w, h, xyz, opacity, scales, quats, sh, deg):
    """One reference forward (torch), activated inputs."""
    import torch

    img, _, _ = ref.rasterize_gaussian(
        means3D=xyz, opacities=opacity, scales=scales, rotations=quats,
        shs=sh, scale_modifier=1.0, image_width=w, image_height=h,
        tanfovx=float(cam.tanfovx), tanfovy=float(cam.tanfovy),
        viewmatrix=torch.from_numpy(__import__("numpy").asarray(cam.viewmatrix)),
        projmatrix=torch.from_numpy(__import__("numpy").asarray(cam.projmatrix)),
        campos=torch.from_numpy(__import__("numpy").asarray(cam.campos)),
        background=torch.zeros(3),
        sh_degree=deg,
    )
    return img


def psnr_np(a, b):
    import numpy as np

    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10.0 * math.log10(1.0 / max(mse, 1e-12))


def init_params(gt_xyz, n_train, seed, ref_math):
    """Shared SfM-like init, reference semantics (gaussian_model.py:65-107):
    noisy point subset, grey colors -> sh0, distCUDA2 scale init (the
    reference's own scipy implementation, executed), opacity
    inv_sigmoid(0.1), identity rotation."""
    import numpy as np
    import torch

    rng = np.random.default_rng(seed + 1)
    idx = rng.choice(len(gt_xyz), size=n_train, replace=False)
    xyz0 = gt_xyz[idx] + rng.normal(size=(n_train, 3)).astype(np.float32) * 0.05
    rgb0 = np.full((n_train, 3), 0.5, np.float32)
    C0 = 0.28209479177387814
    sh0 = (rgb0 - 0.5) / C0  # rgb2sh0 (utils/sh.py:100-101)
    dist2 = np.clip(
        ref_math.distCUDA2(torch.from_numpy(xyz0)).numpy(), 1e-7, None
    )
    scales0 = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)
    opacity0 = np.full((n_train, 1), math.log(0.1 / 0.9), np.float32)
    quats0 = np.zeros((n_train, 4), np.float32)
    quats0[:, 0] = 1.0
    return (
        xyz0.astype(np.float32), sh0.astype(np.float32),
        scales0.astype(np.float32), opacity0.astype(np.float32), quats0,
    )


def train_reference(ref, ref_sched, cams, gt_images, init, steps, every, w, h,
                    spatial_scale, sh_coeffs, eval_cams, eval_images):
    """The reference trained as itself: torch params with its activations
    (gaussian_model.py:317-333), its optimizer groups/LRs/eps
    (gs_lightning_module.py:114-134, configs/train_gs.yaml:21-30), its
    scheduler, pure-L1 loss at w_ssim=0 (gs_lightning_module.py:281-284)."""
    import numpy as np
    import torch

    xyz0, sh0, scales0, opacity0, quats0 = init
    n = len(xyz0)
    p_xyz = torch.tensor(xyz0, requires_grad=True)
    feat = np.zeros((n, sh_coeffs, 3), np.float32)
    feat[:, 0, :] = sh0
    p_dc = torch.tensor(feat[:, :1], requires_grad=True)
    p_rest = torch.tensor(feat[:, 1:], requires_grad=True)
    p_op = torch.tensor(opacity0, requires_grad=True)
    p_sc = torch.tensor(scales0, requires_grad=True)
    p_rot = torch.tensor(quats0, requires_grad=True)

    xyz_lr = 0.00016 * spatial_scale
    groups = [
        {"params": [p_xyz], "lr": xyz_lr, "name": "xyz"},
        {"params": [p_dc], "lr": 0.0025, "name": "features_dc"},
        {"params": [p_rest], "lr": 0.0025 / 20.0, "name": "features_rest"},
        {"params": [p_op], "lr": 0.025, "name": "opacity"},
        {"params": [p_sc], "lr": 0.005, "name": "scaling"},
        {"params": [p_rot], "lr": 0.001, "name": "rotation"},
    ]
    opt = torch.optim.Adam(groups, lr=0.0, eps=1e-15)
    # schedule parameters mirror both frameworks' shared defaults
    # (CFGScheduler / OptimizerConfig: lr_final = lr_init/100 per the yaml,
    # max_steps 30k) so the two sides follow the identical LR curve over
    # the first `steps` iterations
    sched = ref_sched.GSWarmUpExponentialDecayScheduler(
        optimizer=opt, param="xyz", max_steps=30_000,
        lr_init=xyz_lr, lr_final=0.0000016 * spatial_scale,
        lr_delay_multi=0.001, lr_delay_step=0,
    )

    def activated():
        return (
            p_xyz,
            torch.sigmoid(p_op),
            torch.exp(p_sc),
            torch.nn.functional.normalize(p_rot),
            torch.cat([p_dc, p_rest], 1),
        )

    def render_eval(cs):
        with torch.no_grad():
            xyz, op, sc, rot, sh = activated()
            return [
                reference_render(ref, c, w, h, xyz, op, sc, rot, sh, 0)
                .clamp(0, 1).numpy()
                for c in cs
            ]

    rows = []
    t0 = time.time()
    for step in range(steps):
        v = step % len(cams)
        xyz, op, sc, rot, sh = activated()
        img = reference_render(ref, cams[v], w, h, xyz, op, sc, rot, sh, 0)
        loss = torch.nn.functional.l1_loss(img, gt_images[v])  # w_ssim=0
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        if step % every == every - 1 or step == 0:
            train_psnr = float(
                np.mean([psnr_np(r, g.numpy())
                         for r, g in zip(render_eval(cams), gt_images)])
            )
            rows.append({"step": step + 1, "train_psnr": train_psnr,
                         "loss": float(loss)})
            print(
                f"[reference] step {step + 1}: l1={float(loss):.4f} "
                f"train_psnr={train_psnr:.2f} ({time.time() - t0:.0f}s)",
                flush=True,
            )
    held = float(
        np.mean([psnr_np(r, g.numpy())
                 for r, g in zip(render_eval(eval_cams), eval_images)])
    )
    return rows, held


def train_ours(cams, gt_images, init, steps, every, w, h, spatial_scale,
               sh_coeffs, eval_cams, eval_images):
    """This framework on the identical problem: same init arrays, same
    round-robin view order, densify off, w_ssim=0."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from gaussian_splatting_lightning_tpu.models import from_points
    from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import (
        TilingConfig,
    )
    from gaussian_splatting_lightning_tpu.training.densify import DensifyConfig
    from gaussian_splatting_lightning_tpu.training.optimizer import init_adam
    from gaussian_splatting_lightning_tpu.training.trainer import (
        TrainConfig,
        make_eval_step,
        make_train_step,
    )

    xyz0, sh0, scales0, opacity0, quats0 = init
    n = len(xyz0)
    sh_degree = int(round(math.sqrt(sh_coeffs))) - 1
    # from_points reproduces the reference init (grey 0.5 -> sh0 == sh0 arg
    # here, inv_sigmoid(0.1) opacity, identity quats); the scale init is
    # overwritten with the REFERENCE's own distCUDA2 values so both sides
    # start from bit-identical arrays
    scene = from_points(
        xyz0, np.full((n, 3), 0.5, np.float32), capacity=n,
        sh_degree=sh_degree,
    )
    scene = dataclasses.replace(
        scene,
        params=dataclasses.replace(
            scene.params, scales=jnp.asarray(scales0)
        ),
    )
    cfg = TrainConfig(
        num_iters=steps, w_ssim=0.0, capacity=n, adaptive_pairs=False,
        tiling=TilingConfig(max_pairs=1 << 18, tile_capacity=2048, chunk=64),
        densify=DensifyConfig(densify_since=steps + 1, densify_until=0),
    )
    step_fn = make_train_step(cfg, spatial_scale, w, h)
    eval_fn = make_eval_step(cfg, w, h)
    adam = init_adam(scene.params)
    bg = jnp.zeros(3, jnp.float32)
    gt_dev = [jnp.asarray(np.asarray(g)) for g in gt_images]

    def eval_psnr(cs, gts):
        vals = []
        for c, g in zip(cs, gts):
            img, _, _ = eval_fn(scene, c, g, bg)
            vals.append(psnr_np(np.clip(np.asarray(img), 0, 1), np.asarray(g)))
        return float(np.mean(vals))

    rows = []
    t0 = time.time()
    for step in range(steps):
        v = step % len(cams)
        scene, adam, logs = step_fn(scene, adam, step, cams[v], gt_dev[v], bg)
        if step % every == every - 1 or step == 0:
            train_psnr = eval_psnr(cams, gt_dev)
            rows.append({"step": step + 1, "train_psnr": train_psnr,
                         "loss": float(logs["loss"])})
            print(
                f"[ours]      step {step + 1}: l1={float(logs['loss']):.4f} "
                f"train_psnr={train_psnr:.2f} ({time.time() - t0:.0f}s)",
                flush=True,
            )
    held = eval_psnr(eval_cams, [jnp.asarray(np.asarray(g)) for g in eval_images])
    return rows, held


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=800)
    parser.add_argument("--every", type=int, default=100)
    parser.add_argument("--width", type=int, default=128)
    parser.add_argument("--height", type=int, default=96)
    parser.add_argument("--gt-splats", type=int, default=2000)
    parser.add_argument("--train-splats", type=int, default=1200)
    parser.add_argument("--views", type=int, default=12)
    parser.add_argument("--eval-views", type=int, default=3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="artifacts/headtohead_r4")
    args = parser.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np
    import torch

    torch.manual_seed(args.seed)
    torch.set_num_threads(max(1, os.cpu_count() - 2))

    from tests.ref_oracle import load_reference_module, load_reference_rasterize

    ref = load_reference_rasterize()
    if ref is None:
        raise SystemExit("/root/reference not present — nothing to compare")
    ref_math = load_reference_module("utils.math")
    ref_sched = load_reference_module("scheduler")

    w, h = args.width, args.height
    n_all = args.views + args.eval_views
    cams = build_cameras(n_all, w, h)
    train_cams, eval_cams = cams[: args.views], cams[args.views:]

    gt_xyz, gt_rgb, gt_scales, gt_quats, gt_op = make_gt_splats(
        args.gt_splats, args.seed
    )
    C0 = 0.28209479177387814
    gt_sh = ((gt_rgb - 0.5) / C0)[:, None, :]  # (N, 1, 3) degree-0

    print(f"rendering {n_all} GT views with the reference rasterizer...",
          flush=True)
    gt_images = [
        reference_render(
            ref, c, w, h, torch.from_numpy(gt_xyz),
            torch.from_numpy(gt_op), torch.from_numpy(gt_scales),
            torch.from_numpy(gt_quats), torch.from_numpy(gt_sh), 0,
        ).clamp(0, 1)
        for c in cams
    ]
    train_gt, eval_gt = gt_images[: args.views], gt_images[args.views:]

    # spatial scale: camera-centroid radius like getNerfppNorm
    centers = np.stack([np.asarray(c.campos) for c in train_cams])
    spatial_scale = 1.1 * float(
        np.max(np.linalg.norm(centers - centers.mean(0), axis=1))
    )
    init = init_params(gt_xyz, args.train_splats, args.seed, ref_math)
    sh_coeffs = 4  # degree-1 allocation; active degree stays 0 on both sides

    print(f"== ours: {args.steps} steps ==", flush=True)
    ours_rows, ours_held = train_ours(
        train_cams, train_gt, init, args.steps, args.every, w, h,
        spatial_scale, sh_coeffs, eval_cams, eval_gt,
    )
    print(f"== reference: {args.steps} steps ==", flush=True)
    ref_rows, ref_held = train_reference(
        ref, ref_sched, train_cams, train_gt, init, args.steps, args.every,
        w, h, spatial_scale, sh_coeffs, eval_cams, eval_gt,
    )

    print(f"\n{'step':>6} {'ref PSNR':>9} {'ours PSNR':>10} {'delta':>7}")
    deltas = []
    table = []
    for r_ref, r_our in zip(ref_rows, ours_rows):
        d = r_our["train_psnr"] - r_ref["train_psnr"]
        deltas.append(d)
        table.append({"step": r_ref["step"], "ref": r_ref["train_psnr"],
                      "ours": r_our["train_psnr"], "delta": d})
        print(
            f"{r_ref['step']:>6} {r_ref['train_psnr']:>9.2f} "
            f"{r_our['train_psnr']:>10.2f} {d:>+7.2f}"
        )
    d_held = ours_held - ref_held
    print(
        f"{'held':>6} {ref_held:>9.2f} {ours_held:>10.2f} {d_held:>+7.2f}"
    )
    final_delta = deltas[-1]
    verdict = "PASS" if abs(final_delta) <= 0.5 else "DIVERGED"
    print(
        f"\nfinal train-PSNR delta {final_delta:+.2f} dB, held-out delta "
        f"{d_held:+.2f} dB -> {verdict} (|final| <= 0.5 dB)"
    )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "headtohead.json", "w") as f:
        json.dump(
            {
                "config": vars(args),
                "table": table,
                "held_out": {"ref": ref_held, "ours": ours_held,
                             "delta": d_held},
                "verdict": verdict,
            },
            f, indent=2,
        )
    print(f"wrote {out / 'headtohead.json'}")


if __name__ == "__main__":
    main()
