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
- loss: --w-ssim selects the objective. 0 = pure L1 (bitwise-tight leg).
  0.2 = the reference's SHIPPED objective 0.8*L1 + 0.2*(1-SSIM)
  (gs_lightning_module.py:278-284): its fused-ssim submodule is CUDA-only,
  but the math is just an 11x11 sigma-1.5 Gaussian-window SSIM with zero
  padding — implemented here in ~20 lines of plain torch (torch_ssim), so
  the reference trains its true loss and our SSIM stack is validated
  against the reference objective instead of only against itself
  (VERDICT r4 missing #2);
- --densify enables the reference densification on BOTH sides (clone/
  split/prune + Adam-moment surgery + opacity reset, reference cadences):
  the torch side replicates gaussian_model.py:174-300 +
  gs_lightning_module.py:192-235 verbatim; split RNG streams cannot be
  bit-matched across frameworks, so this leg is judged at tolerance
  (final PSNR within 0.5 dB, splat counts within 10% — VERDICT r4
  missing #3).

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



def torch_ssim(img, gt):
    """The fused-ssim math in plain torch: 11x11 sigma-1.5 Gaussian window,
    zero 'same' padding, C1=0.01^2, C2=0.03^2, mean over pixels/channels —
    the reference's CUDA submodule (N2) and our ops/ssim.py implement the
    same formula (Wang et al.)."""
    import torch
    import torch.nn.functional as F

    g = torch.exp(-((torch.arange(11, dtype=torch.float32) - 5.0) ** 2)
                  / (2 * 1.5 ** 2))
    g = g / g.sum()
    win = (g[:, None] @ g[None, :]).expand(3, 1, 11, 11)
    x, y = img[None], gt[None]
    mu1 = F.conv2d(x, win, padding=5, groups=3)
    mu2 = F.conv2d(y, win, padding=5, groups=3)
    mu1s, mu2s, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = F.conv2d(x * x, win, padding=5, groups=3) - mu1s
    s2 = F.conv2d(y * y, win, padding=5, groups=3) - mu2s
    s12 = F.conv2d(x * y, win, padding=5, groups=3) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1s + mu2s + c1) * (s1 + s2 + c2)
    )
    return m.mean()


class RefDensifyState:
    """The reference's densification state + operations, replicated verbatim
    from gaussian_model.py:174-300 and gs_lightning_module.py:192-235 on
    the script's raw torch parameter tensors."""

    def __init__(self, n, spatial_scale):
        import torch

        self.max_radii2D = torch.zeros(n)
        self.grad_accum = torch.zeros(n)
        self.grad_count = torch.zeros(n)
        self.spatial_scale = spatial_scale

    def accumulate(self, radii, screen_grad):
        import torch

        vis = radii > 0
        self.max_radii2D[vis] = torch.max(self.max_radii2D[vis], radii[vis])
        self.grad_accum[vis] += torch.norm(screen_grad[vis, :2], dim=1)
        self.grad_count[vis] += 1

    def densify_and_prune(self, params, opt, dcfg, apply_screensize):
        """params: dict name->tensor (leaf, requires_grad). Returns new
        params dict; performs the reference's prune -> clone/split and the
        Adam exp_avg/exp_avg_sq surgery (gs_lightning_module.py:213-235)."""
        import torch

        p_sc = params["scaling"]
        opacity = torch.sigmoid(params["opacity"]).squeeze(-1)
        scaling = torch.exp(p_sc)
        # prune (gaussian_model.py:214-237)
        keep = opacity > dcfg["prune_opacity_threshold"]
        if apply_screensize:
            keep &= self.max_radii2D < dcfg["prune_screensize_threshold"]
            keep &= scaling.max(dim=1)[0] < (
                dcfg["prune_size_threshold"] * self.spatial_scale
            )
        preserve_idx = keep.nonzero().squeeze(-1)
        new_p = {k: v.detach()[keep] for k, v in params.items()}
        self.max_radii2D = self.max_radii2D[keep]
        self.grad_accum = self.grad_accum[keep]
        self.grad_count = self.grad_count[keep]

        grad = self.grad_accum / self.grad_count
        grad[grad.isnan()] = 0.0
        bad = grad >= dcfg["densify_grad_threshold"]
        size = torch.exp(new_p["scaling"]).max(dim=1)[0]
        clone_thr = dcfg["clone_size_threshold"] * self.spatial_scale
        small = (bad & (size < clone_thr)).nonzero().squeeze(-1)
        large = (bad & (size >= clone_thr)).nonzero().squeeze(-1)

        # split first mutates parents in place (gaussian_model.py:251-265)
        if len(large):
            sc_l = torch.exp(new_p["scaling"][large])
            displace = torch.normal(torch.zeros(len(large), 3), sc_l)
            q = torch.nn.functional.normalize(new_p["rotation"][large])
            w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
            R = torch.stack([
                1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
                2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
                2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
            ], dim=1).reshape(-1, 3, 3)
            new_p["xyz"][large] += torch.bmm(R, displace[:, :, None]).squeeze(-1)
            new_p["scaling"][large] = torch.log(sc_l / 1.6)
        appended = torch.cat([small, large])
        n_new = len(appended)
        for k in new_p:
            new_p[k] = torch.cat([new_p[k], new_p[k][appended]], dim=0)
        self.max_radii2D = torch.cat([self.max_radii2D, torch.zeros(n_new)])
        self.grad_accum = torch.cat([self.grad_accum, torch.zeros(n_new)])
        self.grad_count = torch.cat([self.grad_count, torch.zeros(n_new)])
        self.max_radii2D.fill_(0.0)
        self.grad_accum.fill_(0.0)
        self.grad_count.fill_(0.0)

        # leaf-ify + Adam surgery (gs_lightning_module.py:213-235)
        out = {}
        for group in opt.param_groups:
            name = group["name"]
            old_param = group["params"][0]
            t = new_p[name].clone().requires_grad_(True)
            stored = opt.state.get(old_param, None)
            if stored is not None:
                diff_n = len(t) - len(preserve_idx)
                for key in ("exp_avg", "exp_avg_sq"):
                    zpad = torch.zeros(diff_n, *stored[key].shape[1:])
                    stored[key] = torch.cat(
                        [stored[key][preserve_idx], zpad], dim=0
                    )
                del opt.state[old_param]
                opt.state[t] = stored
            group["params"][0] = t
            out[name] = t
        return out


def train_reference(ref, ref_sched, cams, gt_images, init, steps, every, w, h,
                    spatial_scale, sh_coeffs, eval_cams, eval_images,
                    w_ssim=0.0, dcfg=None):
    """The reference trained as itself: torch params with its activations
    (gaussian_model.py:317-333), its optimizer groups/LRs/eps
    (gs_lightning_module.py:114-134, configs/train_gs.yaml:21-30), its
    scheduler, its loss weighting (gs_lightning_module.py:281-284) — with
    the fused-ssim math in plain torch when w_ssim > 0, and its full
    densification pipeline when ``dcfg`` is given."""
    import numpy as np
    import torch

    xyz0, sh0, scales0, opacity0, quats0 = init
    n = len(xyz0)
    feat = np.zeros((n, sh_coeffs, 3), np.float32)
    feat[:, 0, :] = sh0
    params = {
        "xyz": torch.tensor(xyz0, requires_grad=True),
        "features_dc": torch.tensor(feat[:, :1], requires_grad=True),
        "features_rest": torch.tensor(feat[:, 1:], requires_grad=True),
        "opacity": torch.tensor(opacity0, requires_grad=True),
        "scaling": torch.tensor(scales0, requires_grad=True),
        "rotation": torch.tensor(quats0, requires_grad=True),
    }

    xyz_lr = 0.00016 * spatial_scale
    lrs = {"xyz": xyz_lr, "features_dc": 0.0025,
           "features_rest": 0.0025 / 20.0, "opacity": 0.025,
           "scaling": 0.005, "rotation": 0.001}
    groups = [
        {"params": [params[k]], "lr": lrs[k], "name": k} for k in params
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
    dstate = RefDensifyState(n, spatial_scale) if dcfg else None

    def activated():
        return (
            params["xyz"],
            torch.sigmoid(params["opacity"]),
            torch.exp(params["scaling"]),
            torch.nn.functional.normalize(params["rotation"]),
            torch.cat([params["features_dc"], params["features_rest"]], 1),
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
    cached = None
    for step in range(steps):
        # reference on_train_batch_start hooks (gs_lightning_module.py:
        # 144-161): densify from the PREVIOUS step's cached radii/grads,
        # then the opacity reset — both before this step's render
        if dcfg and cached is not None:
            if step < dcfg["densify_until"]:
                dstate.accumulate(*cached)
                if (step > dcfg["densify_since"]
                        and step % dcfg["densify_interval"] == 0):
                    params = dstate.densify_and_prune(
                        params, opt, dcfg,
                        step > dcfg["opacity_reset_interval"],
                    )
            if step % dcfg["opacity_reset_interval"] == 0:
                with torch.no_grad():
                    newop = torch.min(
                        torch.sigmoid(params["opacity"]),
                        torch.full_like(params["opacity"], 0.01),
                    )
                    params["opacity"].copy_(torch.log(newop / (1 - newop)))

        v = step % len(cams)
        xyz, op, sc, rot, sh = activated()
        if dcfg:
            # screenspace gradient via an NDC offset on p_proj — the
            # signal the CUDA rasterizer exposes through its means2D input
            # (gs_lightning_module.py:316-317, 175-178)
            offset = torch.zeros((len(xyz), 2), requires_grad=True)
            orig_proj = ref.apply_projection_matrix

            def patched(points, proj, eps=1e-7):
                return orig_proj(points, proj, eps) + offset

            ref.apply_projection_matrix = patched
            try:
                img, radii, _ = ref.rasterize_gaussian(
                    means3D=xyz, opacities=op, scales=sc, rotations=rot,
                    shs=sh, scale_modifier=1.0, image_width=w,
                    image_height=h, tanfovx=float(cams[v].tanfovx),
                    tanfovy=float(cams[v].tanfovy),
                    viewmatrix=torch.from_numpy(np.asarray(cams[v].viewmatrix)),
                    projmatrix=torch.from_numpy(np.asarray(cams[v].projmatrix)),
                    campos=torch.from_numpy(np.asarray(cams[v].campos)),
                    background=torch.zeros(3), sh_degree=0,
                )
            finally:
                ref.apply_projection_matrix = orig_proj
        else:
            img = reference_render(ref, cams[v], w, h, xyz, op, sc, rot, sh, 0)
        l1 = torch.nn.functional.l1_loss(img, gt_images[v])
        if w_ssim > 0.0:
            loss = (1 - w_ssim) * l1 + w_ssim * (1 - torch_ssim(img, gt_images[v]))
        else:
            loss = l1
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        if dcfg:
            cached = (radii.detach(), offset.grad.detach())
        if step % every == every - 1 or step == 0:
            train_psnr = float(
                np.mean([psnr_np(r, g.numpy())
                         for r, g in zip(render_eval(cams), gt_images)])
            )
            rows.append({"step": step + 1, "train_psnr": train_psnr,
                         "loss": float(loss),
                         "n": int(len(params["xyz"]))})
            print(
                f"[reference] step {step + 1}: loss={float(loss):.4f} "
                f"train_psnr={train_psnr:.2f} n={len(params['xyz'])} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
    held = float(
        np.mean([psnr_np(r, g.numpy())
                 for r, g in zip(render_eval(eval_cams), eval_images)])
    )
    return rows, held, int(len(params["xyz"]))


def train_ours(cams, gt_images, init, steps, every, w, h, spatial_scale,
               sh_coeffs, eval_cams, eval_images, w_ssim=0.0, dcfg=None):
    """This framework on the identical problem: same init arrays, same
    round-robin view order; w_ssim and densification per leg (the densify
    path runs the PRODUCT machinery: padded-capacity densify_step + Adam
    surgery + opacity reset at the reference cadences)."""
    import dataclasses

    import jax
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
        densify_step,
        make_eval_step,
        make_train_step,
        opacity_reset_step,
    )

    xyz0, sh0, scales0, opacity0, quats0 = init
    n = len(xyz0)
    sh_degree = int(round(math.sqrt(sh_coeffs))) - 1
    cap = n * 16 if dcfg else n
    # from_points reproduces the reference init (grey 0.5 -> sh0 == sh0 arg
    # here, inv_sigmoid(0.1) opacity, identity quats); the scale init is
    # overwritten with the REFERENCE's own distCUDA2 values so both sides
    # start from bit-identical arrays
    scene = from_points(
        xyz0, np.full((n, 3), 0.5, np.float32), capacity=cap,
        sh_degree=sh_degree,
    )
    pad_sc = np.full((cap, 3), np.log(1e-6), np.float32)
    pad_sc[:n] = scales0
    scene = dataclasses.replace(
        scene,
        params=dataclasses.replace(
            scene.params, scales=jnp.asarray(pad_sc)
        ),
    )
    if dcfg:
        densify = DensifyConfig(
            densify_since=dcfg["densify_since"],
            densify_until=dcfg["densify_until"],
            densify_interval=dcfg["densify_interval"],
            densify_grad_threshold=dcfg["densify_grad_threshold"],
            clone_size_threshold=dcfg["clone_size_threshold"],
            prune_opacity_threshold=dcfg["prune_opacity_threshold"],
            prune_size_threshold=dcfg["prune_size_threshold"],
            prune_screensize_threshold=dcfg["prune_screensize_threshold"],
            opacity_reset_interval=dcfg["opacity_reset_interval"],
            sh_degree_step_interval=10 ** 9,
        )
    else:
        densify = DensifyConfig(densify_since=steps + 1, densify_until=0)
    cfg = TrainConfig(
        num_iters=steps, w_ssim=w_ssim, capacity=cap, adaptive_pairs=False,
        tiling=TilingConfig(max_pairs=1 << 19, tile_capacity=2048, chunk=64),
        densify=densify,
    )
    step_fn = make_train_step(cfg, spatial_scale, w, h)
    eval_fn = make_eval_step(cfg, w, h)
    adam = init_adam(scene.params)
    bg = jnp.zeros(3, jnp.float32)
    gt_dev = [jnp.asarray(np.asarray(g)) for g in gt_images]
    key = jax.random.PRNGKey(1234)

    def eval_psnr(cs, gts):
        vals = []
        for c, g in zip(cs, gts):
            img, _, _ = eval_fn(scene, c, g, bg)
            vals.append(psnr_np(np.clip(np.asarray(img), 0, 1), np.asarray(g)))
        return float(np.mean(vals))

    rows = []
    t0 = time.time()
    for step in range(steps):
        # product Trainer.maybe_densify hook ordering (trainer.py:538-571)
        if dcfg and step >= 1:
            d = cfg.densify
            if (step < d.densify_until and step > d.densify_since
                    and step % d.densify_interval == 0):
                key, sub = jax.random.split(key)
                scene, adam, _ = densify_step(
                    scene, adam, sub, d, spatial_scale,
                    step > d.opacity_reset_interval,
                )
            if step % d.opacity_reset_interval == 0:
                scene = opacity_reset_step(scene)
        v = step % len(cams)
        scene, adam, logs = step_fn(scene, adam, step, cams[v], gt_dev[v], bg)
        if step % every == every - 1 or step == 0:
            train_psnr = eval_psnr(cams, gt_dev)
            n_alive = int(logs["n_gaussians"])
            rows.append({"step": step + 1, "train_psnr": train_psnr,
                         "loss": float(logs["loss"]), "n": n_alive})
            print(
                f"[ours]      step {step + 1}: loss={float(logs['loss']):.4f} "
                f"train_psnr={train_psnr:.2f} n={n_alive} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
    held = eval_psnr(eval_cams, [jnp.asarray(np.asarray(g)) for g in eval_images])
    return rows, held, int(scene.n_alive())


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
    parser.add_argument("--w-ssim", type=float, default=0.0)
    parser.add_argument("--densify", action="store_true")
    parser.add_argument("--densify-since", type=int, default=300)
    parser.add_argument("--densify-interval", type=int, default=100)
    parser.add_argument("--densify-until", type=int, default=1200)
    parser.add_argument("--densify-grad-threshold", type=float, default=2e-4)
    parser.add_argument("--opacity-reset-interval", type=int, default=600)
    parser.add_argument("--tag", default="l1")
    parser.add_argument("--out", default="artifacts/headtohead_r5")
    args = parser.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # this comparison is CPU-native (the reference rasterizer is torch-CPU);
    # forcing the CPU backend also keeps it runnable while the real chip is
    # busy training
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
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
    dcfg = None
    if args.densify:
        dcfg = {
            "densify_since": args.densify_since,
            "densify_interval": args.densify_interval,
            "densify_until": args.densify_until,
            "densify_grad_threshold": args.densify_grad_threshold,
            "clone_size_threshold": 0.01,
            "prune_opacity_threshold": 0.005,
            "prune_size_threshold": 0.1,
            "prune_screensize_threshold": 40.0,
            "opacity_reset_interval": args.opacity_reset_interval,
        }

    print(f"== ours: {args.steps} steps (w_ssim={args.w_ssim}, "
          f"densify={bool(dcfg)}) ==", flush=True)
    ours_rows, ours_held, ours_n = train_ours(
        train_cams, train_gt, init, args.steps, args.every, w, h,
        spatial_scale, sh_coeffs, eval_cams, eval_gt,
        w_ssim=args.w_ssim, dcfg=dcfg,
    )
    print(f"== reference: {args.steps} steps ==", flush=True)
    ref_rows, ref_held, ref_n = train_reference(
        ref, ref_sched, train_cams, train_gt, init, args.steps, args.every,
        w, h, spatial_scale, sh_coeffs, eval_cams, eval_gt,
        w_ssim=args.w_ssim, dcfg=dcfg,
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
    ok = abs(final_delta) <= 0.5
    count_line = ""
    if args.densify:
        ratio = ours_n / max(ref_n, 1)
        ok = ok and 0.9 <= ratio <= 1.1
        count_line = (
            f", splats ref {ref_n} vs ours {ours_n} "
            f"(ratio {ratio:.3f}, bar 0.9-1.1)"
        )
    verdict = "PASS" if ok else "DIVERGED"
    print(
        f"\nfinal train-PSNR delta {final_delta:+.2f} dB, held-out delta "
        f"{d_held:+.2f} dB{count_line} -> {verdict} (|final| <= 0.5 dB)"
    )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rec = {
        "config": vars(args),
        "table": table,
        "held_out": {"ref": ref_held, "ours": ours_held, "delta": d_held},
        "splats": {"ref": ref_n, "ours": ours_n},
        "verdict": verdict,
    }
    path = out / f"headtohead_{args.tag}.json"
    with open(path, "w") as f:
        json.dump(rec, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
