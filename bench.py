"""Benchmark: rays/s/chip (forward+backward) on the flagship rasterizer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (the driver
contract). The reference publishes no numbers (BASELINE.md), so vs_baseline
is null; the absolute number is tracked round over round.

Scene: synthetic 100k-splat cloud, 1080p render, SH degree 3, full forward +
backward through the L1+SSIM loss — the BASELINE.json "rays/s/chip (fwd+bwd)
at 1080p" metric on one chip, using the Pallas compositing kernels.
"""

from __future__ import annotations

import json
import time

import numpy as np


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

    scene = ge._synthetic_scene(n, n)
    cam = ge._camera(w, h)
    # adaptive pair budget, like the trainer: probe the scene's actual
    # (splat, tile) pair count once, then size the static budget to fit —
    # every per-pair stage costs proportionally to the budget.
    probe_cfg = TilingConfig(max_pairs=1 << 22)
    _, probe_stats = rasterize_pallas(
        scene.params.xyz, scene.get_opacity(), scene.get_scales(),
        scene.get_rotation(), scene.get_features(), cam, w, h,
        jnp.zeros(3), 3, config=probe_cfg,
    )
    actual_pairs = int(probe_stats["num_pairs"])
    budget = 1 << max(14, int(np.ceil(np.log2(actual_pairs * 1.3))))
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


def main():
    import jax

    platform = jax.devices()[0].platform
    w, h, n = 1920, 1080, 100_000
    step_s, compile_s, actual_pairs, budget = run(w, h, n)
    rays_per_s = w * h / step_s
    result = {
        "metric": "rays/s/chip fwd+bwd, 1080p, 100k splats, SH3",
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
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
