"""Per-parameter-group Adam with densification-surgery-friendly state.

The reference builds one torch Adam over six named param groups with distinct
learning rates (``gs_lightning_module.py:114-134``) and, after every
densify/prune, permutes/zero-pads the exp_avg/exp_avg_sq moments by hand
(``gs_lightning_module.py:213-235``). Here the optimizer state is a plain
pytree shaped exactly like GaussianParams, so the surgery is a masked
gather/scatter inside the same compiled program (training/densify.py).

Update rule matches torch.optim.Adam (and optax.scale_by_adam):
m_hat = m/(1-b1^t), v_hat = v/(1-b2^t), p -= lr * m_hat/(sqrt(v_hat)+eps),
with the reference's eps=1e-15 (configs/train_gs.yaml:21-24).

Learning rates (gs_lightning_module.py:55-62,114-134): xyz follows the
warmup-exp-decay schedule scaled by the scene's spatial extent; the other five
groups are constant.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from gaussian_splatting_lightning_tpu.models.gaussians import GaussianParams
from gaussian_splatting_lightning_tpu.training.schedule import (
    constant_schedule,
    warmup_exp_decay_schedule,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AdamState:
    count: jnp.ndarray  # () int32 — steps taken
    mu: GaussianParams  # first moments
    nu: GaussianParams  # second moments


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Defaults are the reference's (CFGOptimizer/CFGScheduler,
    gs_lightning_module.py:54-71; configs/train_gs.yaml:21-30)."""

    xyz_lr_init: float = 0.00016  # x spatial_scale
    xyz_lr_final: float = 0.0000016  # x spatial_scale (lr_init/100 per yaml)
    xyz_lr_delay_steps: int = 0
    xyz_lr_delay_mult: float = 0.001
    xyz_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    r_dc2rest: float = 20.0  # features_rest lr = feature_lr / r_dc2rest
    opacity_lr: float = 0.025
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-15


def make_lr_schedules(
    cfg: OptimizerConfig, spatial_scale: float
) -> Dict[str, Callable]:
    return dict(
        xyz=warmup_exp_decay_schedule(
            cfg.xyz_lr_init * spatial_scale,
            cfg.xyz_lr_final * spatial_scale,
            cfg.xyz_lr_max_steps,
            cfg.xyz_lr_delay_steps,
            cfg.xyz_lr_delay_mult,
        ),
        features_dc=constant_schedule(cfg.feature_lr),
        features_rest=constant_schedule(cfg.feature_lr / cfg.r_dc2rest),
        opacity=constant_schedule(cfg.opacity_lr),
        scales=constant_schedule(cfg.scaling_lr),
        quats=constant_schedule(cfg.rotation_lr),
    )


def init_adam(params: GaussianParams) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(
        count=jnp.zeros((), jnp.int32),
        mu=zeros,
        nu=jax.tree.map(jnp.zeros_like, params),
    )


def adam_update(
    params: GaussianParams,
    grads: GaussianParams,
    state: AdamState,
    schedules: Dict[str, Callable],
    cfg: OptimizerConfig,
    step,
    visible=None,
):
    """One Adam step. ``step`` is the global training step (drives the lr
    schedule exactly like the reference's per-step scheduler.step cadence).

    ``visible`` (C,) bool enables sparse-Adam semantics: rows not rendered
    this step keep params AND moments untouched — the CUDA
    ``SparseGaussianAdam`` the reference lists as a TODO (README.md:42,
    third_party/.../gaussian_model.py:26-28,192-199).
    """
    b1, b2 = cfg.beta1, cfg.beta2
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    new_params = {}
    new_mu = {}
    new_nu = {}
    for name in ("xyz", "features_dc", "features_rest", "opacity", "scales", "quats"):
        p = getattr(params, name)
        g = getattr(grads, name)
        m = getattr(state.mu, name)
        v = getattr(state.nu, name)
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * g * g
        lr = schedules[name](step)
        update = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + cfg.eps)
        p_new = p - lr * update
        if visible is not None:
            vis = visible.reshape((-1,) + (1,) * (p.ndim - 1))
            p_new = jnp.where(vis, p_new, p)
            m_new = jnp.where(vis, m_new, m)
            v_new = jnp.where(vis, v_new, v)
        new_params[name] = p_new
        new_mu[name] = m_new
        new_nu[name] = v_new

    return (
        GaussianParams(**new_params),
        AdamState(count=count, mu=GaussianParams(**new_mu), nu=GaussianParams(**new_nu)),
    )
