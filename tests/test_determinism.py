"""Deterministic training: identical seeds produce identical runs."""

import dataclasses

import numpy as np

import jax.numpy as jnp

from gaussian_splatting_lightning_tpu.models import from_points
from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import TilingConfig
from gaussian_splatting_lightning_tpu.training import (
    DensifyConfig,
    OptimizerConfig,
    TrainConfig,
    Trainer,
)


_VIEWS_CACHE = {}


def _views():
    if "v" not in _VIEWS_CACHE:
        from tests.test_training import _synthetic_views

        _VIEWS_CACHE["v"] = _synthetic_views(n_views=4, w=48, h=32)[1]
    return _VIEWS_CACHE["v"]


def _run(seed):
    rng = np.random.default_rng(9)
    views = _views()
    xyz0 = rng.normal(size=(30, 3)).astype(np.float32)
    scene = from_points(xyz0, np.full((30, 3), 0.5, np.float32), 64, 1)
    cfg = TrainConfig(
        num_iters=40, capacity=64, log_interval=10, valid_interval=10_000,
        checkpoint_interval=10_000, seed=seed,
        tiling=TilingConfig(max_pairs=1 << 12, tile_capacity=64, chunk=32),
        densify=DensifyConfig(
            densify_since=5, densify_interval=15, densify_until=35,
            opacity_reset_interval=10_000,
        ),
        optimizer=OptimizerConfig(xyz_lr_max_steps=40),
    )
    t = Trainer(cfg, scene, 4.0, views, log_fn=lambda *a: None)
    t.train()
    return t


def test_same_seed_is_bitwise_identical():
    a, b = _run(7), _run(7)
    np.testing.assert_array_equal(
        np.asarray(a.scene.params.xyz), np.asarray(b.scene.params.xyz)
    )
    np.testing.assert_array_equal(
        np.asarray(a.scene.alive), np.asarray(b.scene.alive)
    )
    assert a.history[-1]["loss"] == b.history[-1]["loss"]


def test_different_seed_diverges():
    a, c = _run(7), _run(8)
    # different view order + split RNG -> different trajectories
    assert a.history[-1]["loss"] != c.history[-1]["loss"]
