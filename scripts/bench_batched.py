"""Measure batched multi-view training throughput (steps/s/view).

SURVEY §2.3 calls for "turning the reference's batch-size-1 loop into
batched multi-view steps"; ``TrainConfig.batch_views`` vmaps render+loss
over a view batch in one compiled program, amortizing the per-step fixed
costs (binning setup, sort dispatch, Adam). This harness quantifies it:
same scene/views, batch_views in {1, 2, 4, 8}, per-view step time.

    python -m scripts.bench_batched [--width 512 --height 384 --n 100000]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from bench import _estimate_pairs_numpy
    from gaussian_splatting_lightning_tpu.core.camera import Camera, make_camera
    from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import TilingConfig
    from gaussian_splatting_lightning_tpu.training import TrainConfig, init_adam
    from gaussian_splatting_lightning_tpu.training.trainer import make_train_step
    from gaussian_splatting_lightning_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    w, h, n = args.width, args.height, args.n

    def ring_cam(i, total):
        ang = 2 * np.pi * i / total
        fwd = -np.array([np.cos(ang), 0.2, np.sin(ang)])
        fwd /= np.linalg.norm(fwd)
        pos = -4.0 * fwd
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        R = np.stack([right, np.cross(fwd, right), fwd], 0)
        t = -R @ pos
        return make_camera(np.concatenate([R, t[:, None]], 1), w * 0.7, w * 0.7, w, h)

    cams = [ring_cam(i, 8) for i in range(8)]
    scene0 = ge._synthetic_scene(n, n, scale=0.01)
    budget = max(
        _estimate_pairs_numpy(scene0, c, w, h) for c in cams[:4]
    )
    budget = max(16384, -(-int(budget * 1.3) // 8192) * 8192)
    rng = np.random.default_rng(0)
    rows = []
    for b in args.batches:
        cfg = TrainConfig(
            capacity=n, batch_views=b,
            tiling=TilingConfig(max_pairs=budget, tile_capacity=4096),
        )
        step = make_train_step(cfg, 4.0, w, h)
        sel = [cams[i % len(cams)] for i in range(b)]
        cam_b = jax.tree.map(lambda *xs: jnp.stack(xs), *sel)
        img = jnp.asarray(rng.uniform(size=(b, 3, h, w)).astype(np.float32))
        bg = jnp.zeros((b, 3), jnp.float32)
        if b == 1:
            cam_b = sel[0]
            img, bg = img[0], bg[0]
        # the train step donates (scene, adam): fresh copies per batch size
        scene = ge._synthetic_scene(n, n, scale=0.01)
        adam = init_adam(scene.params)
        s, a, logs = step(scene, adam, 0, cam_b, img, bg)
        jax.block_until_ready(logs["loss"])
        t0 = time.perf_counter()
        s2, a2 = s, a
        for k in range(args.iters):
            s2, a2, logs = step(s2, a2, k + 1, cam_b, img, bg)
        jax.block_until_ready(logs["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        rows.append({
            "batch_views": b,
            "step_ms": round(1e3 * dt, 2),
            "ms_per_view": round(1e3 * dt / b, 2),
            "views_per_s": round(b / dt, 2),
        })
        print(json.dumps(rows[-1]))
    base = rows[0]["ms_per_view"]
    for r in rows:
        r["speedup_per_view"] = round(base / r["ms_per_view"], 2)
    print(json.dumps({"config": f"{w}x{h}, {n} splats, budget {budget}",
                      "rows": rows}))


if __name__ == "__main__":
    main()
