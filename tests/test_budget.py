"""Host-side pair-budget estimator vs the device binning's actual count."""

import dataclasses

import numpy as np

import jax.numpy as jnp

from gaussian_splatting_lightning_tpu.core.camera import make_camera
from gaussian_splatting_lightning_tpu.models import from_points
from gaussian_splatting_lightning_tpu.ops.budget import estimate_pairs, pair_budget
from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import (
    TilingConfig,
    rasterize_tiled,
)

RNG = np.random.default_rng(11)


def _scene(n=400, cap=512):
    xyz = RNG.normal(size=(n, 3)).astype(np.float32)
    rgb = RNG.uniform(0.2, 0.9, size=(n, 3)).astype(np.float32)
    scene = from_points(xyz, rgb, capacity=cap, sh_degree=1)
    return dataclasses.replace(
        scene,
        params=dataclasses.replace(
            scene.params,
            scales=jnp.asarray(
                RNG.normal(np.log(0.08), 0.4, size=(cap, 3)).astype(np.float32)
            ),
            opacity=jnp.asarray(
                RNG.normal(0.5, 1.0, size=(cap, 1)).astype(np.float32)
            ),
            quats=jnp.asarray(
                RNG.normal(size=(cap, 4)).astype(np.float32)
            ),
        ),
    )


def _cam(w, h):
    R = np.eye(3)
    t = np.array([0.0, 0.1, 4.0])
    return make_camera(np.concatenate([R, t[:, None]], 1), w * 0.8, w * 0.8, w, h)


def test_estimate_matches_device_binning():
    w, h = 160, 96
    scene = _scene()
    cam = _cam(w, h)
    from gaussian_splatting_lightning_tpu.training.trainer import render_scene

    cfg = TilingConfig(max_pairs=1 << 16, tile_capacity=1024, chunk=32)
    _, stats = render_scene(scene, cam, w, h, jnp.zeros(3), cfg)
    actual = int(stats["num_pairs"])
    assert actual > 0
    est = estimate_pairs(scene, cam, w, h, block=16)
    # the numpy replica runs the same math in f64: allow boundary-tie slack
    assert abs(est - actual) <= max(4, actual // 100)
    # the rounded budget must always cover the actual count
    budget = pair_budget(scene, cam, w, h, block=16)
    assert budget >= actual
    assert budget % 8192 == 0


def test_budget_respects_alive_mask():
    scene = _scene(n=50, cap=512)  # 462 dead padded slots
    cam = _cam(128, 96)
    est = estimate_pairs(scene, cam, 128, 96, block=16)
    # dead slots carry RNG garbage in scales/opacity above; if they leaked
    # into the estimate it would be far larger
    full = dataclasses.replace(scene, alive=jnp.ones(512, bool))
    est_full = estimate_pairs(full, cam, 128, 96, block=16)
    assert est < est_full
