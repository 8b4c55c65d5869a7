"""Benchmark: rays/s/chip (forward+backward) on the flagship rasterizer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (the driver
contract). The reference publishes no numbers (BASELINE.md), so vs_baseline
is null; the absolute number is tracked round over round.

Scene: synthetic 1M-splat cloud with garden-like screen footprint (a trained
MipNeRF-360 scene has millions of small splats), 1080p render, SH degree 3,
full forward + backward through the L1+SSIM loss — the BASELINE.json
"rays/s/chip (fwd+bwd) at 1080p" metric on one chip, Pallas kernels, pair
budget sized adaptively to the scene.
"""

from __future__ import annotations

import json
import time

import numpy as np



def _estimate_pairs_numpy(scene, cam, w, h):
    """Host-side (numpy) replica of preprocess+rect counting, for sizing the
    pair budget without compiling a device probe program."""
    import numpy as np

    xyz = np.asarray(scene.params.xyz)
    scales = np.exp(np.asarray(scene.params.scales))
    q = np.asarray(scene.params.quats)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    view = np.asarray(cam.viewmatrix)
    ones = np.ones((len(xyz), 1), np.float32)
    p_view = np.concatenate([xyz, ones], 1) @ view
    z = p_view[:, 2]
    visible = z > 0.2

    wq, xq, yq, zq = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.stack([
        1 - 2 * (yq * yq + zq * zq), 2 * (xq * yq - wq * zq), 2 * (xq * zq + wq * yq),
        2 * (xq * yq + wq * zq), 1 - 2 * (xq * xq + zq * zq), 2 * (yq * zq - wq * xq),
        2 * (xq * zq - wq * yq), 2 * (yq * zq + wq * xq), 1 - 2 * (xq * xq + yq * yq),
    ], -1).reshape(-1, 3, 3)
    L = R * scales[:, None, :]
    V = L @ np.swapaxes(L, 1, 2)
    tanx, tany = float(cam.tanfovx), float(cam.tanfovy)
    fx, fy = w * 0.5 / tanx, h * 0.5 / tany
    x = np.clip(p_view[:, 0] / z, -1.3 * tanx, 1.3 * tanx) * z
    y = np.clip(p_view[:, 1] / z, -1.3 * tany, 1.3 * tany) * z
    W3 = view[:3, :3].T
    t0 = (fx / z)[:, None] * W3[0] + (-fx * x / z ** 2)[:, None] * W3[2]
    t1 = (fy / z)[:, None] * W3[1] + (-fy * y / z ** 2)[:, None] * W3[2]
    a = np.einsum("ni,nij,nj->n", t0, V, t0) + 0.3
    b = np.einsum("ni,nij,nj->n", t0, V, t1)
    d = np.einsum("ni,nij,nj->n", t1, V, t1) + 0.3
    mid = 0.5 * (a + d)
    lam = mid + np.sqrt(np.maximum(mid * mid - (a * d - b * b), 0.1))
    radius = np.ceil(3.0 * np.sqrt(lam))
    # opacity-aware exact support radius (ops/common.py preprocess)
    op = 1.0 / (1.0 + np.exp(-np.asarray(scene.params.opacity[:, 0])))
    log_ratio = np.log(np.maximum(op * 255.0, 1.0))
    radius = np.minimum(radius, np.ceil(np.sqrt(2.0 * log_ratio * lam)) + 1.0)

    proj = np.asarray(cam.projmatrix)
    ph = np.concatenate([xyz, ones], 1) @ proj
    pw = 1.0 / (ph[:, 3] + 1e-7)
    px = ((ph[:, 0] * pw + 1) * w - 1) * 0.5
    py = ((ph[:, 1] * pw + 1) * h - 1) * 0.5
    blk = 32  # TilingConfig default tile edge on the Pallas path
    gx, gy = -(-w // blk), -(-h // blk)
    x0 = np.clip(np.trunc((px - radius) / blk), 0, gx)
    x1 = np.clip(np.trunc((px + radius + blk - 1) / blk), 0, gx)
    y0 = np.clip(np.trunc((py - radius) / blk), 0, gy)
    y1 = np.clip(np.trunc((py + radius + blk - 1) / blk), 0, gy)
    return int(np.where(visible, np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0), 0).sum())


def run(w, h, n, iters=10, warmup=2):
    import jax

    from gaussian_splatting_lightning_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from gaussian_splatting_lightning_tpu.ops.rasterize_pallas import (
        rasterize_pallas,
    )
    from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import TilingConfig
    from gaussian_splatting_lightning_tpu.training.loss import photometric_loss

    scene = ge._synthetic_scene(n, n, scale=0.008)
    cam = ge._camera(w, h)
    # adaptive pair budget, like the trainer: estimate the scene's actual
    # (splat, tile) pair count host-side (no device compile), then size the
    # static budget to fit — every per-pair stage costs proportionally to it.
    actual_pairs = _estimate_pairs_numpy(scene, cam, w, h)
    # round to sort-block granularity, not the next power of two (which
    # would re-tax every per-pair stage by up to 2x)
    budget = max(16384, -(-int(actual_pairs * 1.2) // 8192) * 8192)
    cfg = TilingConfig(max_pairs=budget)
    target = jnp.asarray(
        np.random.default_rng(0).uniform(size=(3, h, w)).astype(np.float32)
    )

    def loss_fn(xyz, opacity, scales, quats, sh):
        out, _ = rasterize_pallas(
            xyz, opacity, scales, quats, sh, cam, w, h,
            jnp.zeros(3, xyz.dtype), 3, config=cfg,
        )
        loss, _ = photometric_loss(out.image, target, 0.2)
        return loss

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    args = (
        scene.params.xyz, scene.get_opacity(), scene.get_scales(),
        scene.get_rotation(), scene.get_features(),
    )

    t0 = time.perf_counter()
    g = step(*args)
    jax.block_until_ready(g)
    compile_s = time.perf_counter() - t0

    for _ in range(warmup):
        g = step(*args)
    jax.block_until_ready(g)

    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(*args)
    jax.block_until_ready(g)
    elapsed = time.perf_counter() - t0
    return elapsed / iters, compile_s, actual_pairs, budget


def parity_gate(w=512, h=384, n=100_000):
    """On-device parity: Pallas kernels vs the XLA tiled path, fwd + every
    parameter gradient, on the REAL backend (VERDICT r1 missing #5 — round-1
    asserted this only in CPU interpret mode). Returns max |deltas| relative
    to each gradient's scale, for the bench JSON."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from gaussian_splatting_lightning_tpu.ops.rasterize_pallas import (
        rasterize_pallas,
    )
    from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import (
        TilingConfig,
        rasterize_tiled,
    )

    scene = ge._synthetic_scene(n, n, scale=0.01)
    cam = ge._camera(w, h)
    target = jnp.asarray(
        np.random.default_rng(1).uniform(size=(3, h, w)).astype(np.float32)
    )
    budget = max(16384, -(-_estimate_pairs_numpy(scene, cam, w, h) * 2 // 8192) * 8192)
    cfg = TilingConfig(max_pairs=budget, tile_capacity=4096)
    args = (
        scene.params.xyz, scene.get_opacity(), scene.get_scales(),
        scene.get_rotation(), scene.get_features(),
    )

    def make_loss(raster, **kw):
        def loss(*p):
            out, _ = raster(
                *p, cam, w, h, jnp.zeros(3), 3, config=cfg, **kw
            )
            return (
                jnp.abs(out.image - target).mean(),
                out.image,
            )
        return loss

    deltas = {}
    grad_p, img_p = jax.jit(
        jax.grad(make_loss(rasterize_pallas), argnums=(0, 1, 2, 3, 4),
                 has_aux=True)
    )(*args)
    grad_t, img_t = jax.jit(
        jax.grad(make_loss(rasterize_tiled), argnums=(0, 1, 2, 3, 4),
                 has_aux=True)
    )(*args)
    deltas["image_max_abs"] = float(jnp.abs(img_p - img_t).max())
    gmax = 0.0
    for gp, gt in zip(grad_p, grad_t):
        scale = float(jnp.abs(gt).max()) + 1e-12
        gmax = max(gmax, float(jnp.abs(gp - gt).max()) / scale)
    deltas["grad_max_rel"] = gmax
    return deltas


def main():
    import jax

    platform = jax.devices()[0].platform
    w, h, n = 1920, 1080, 1_000_000
    step_s, compile_s, actual_pairs, budget = run(w, h, n)
    parity = parity_gate()
    rays_per_s = w * h / step_s
    result = {
        "metric": "rays/s/chip fwd+bwd, 1080p, 1M splats, SH3",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": None,
        "extra": {
            "platform": platform,
            "step_ms": round(1e3 * step_s, 2),
            "compile_s": round(compile_s, 1),
            "impl": "pallas",
            "pairs": actual_pairs,
            "pair_budget": budget,
            "parity_512x384_100k": parity,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
