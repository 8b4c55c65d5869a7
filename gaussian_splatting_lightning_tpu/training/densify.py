"""Densification (clone/split/prune) as device-side gather/scatter under jit.

Spec: reference ``GaussianModel.densify_and_prune`` + the Lightning module's
Adam surgery (``gs_lightning/modules/gaussian_model.py:174-300``,
``gs_lightning/lightning/gs_lightning_module.py:192-235``). The reference
physically re-allocates tensors every densify step; under the padded-capacity
design (models/gaussians.py) the same semantics become:

- prune    -> clear ``alive`` bits (moments of dead slots become garbage,
              exactly like the reference dropping their rows)
- clone    -> copy a row into a free slot, zero its Adam moments
- split    -> in-place move/shrink the parent (one sampled displacement),
              then clone the *modified* parent (the reference clones after
              mutating, so both children share position/scale —
              gaussian_model.py:251-265)
- surgery  -> surviving rows keep their moments in place (no permutation
              needed at all); activated slots zero theirs

Everything is fixed-shape; child-to-free-slot assignment is two stable
argsorts + a masked scatter. Overflow (more children than free slots) drops
the extra children and reports the count.

Threshold semantics preserved (gs_lightning_module.py:192-211 +
gaussian_model.py:184-237): screen-size/world-size pruning only activates
after the first opacity reset; the ``use_screensize_threshold`` flag keeps the
reference's (fixed) behavior toggleable.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gaussian_splatting_lightning_tpu.core import transforms as tf
from gaussian_splatting_lightning_tpu.models.gaussians import (
    DEAD_OPACITY_LOGIT,
    GaussianParams,
    GaussianScene,
)
from gaussian_splatting_lightning_tpu.training.optimizer import AdamState


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    """Defaults are the reference's CFGTrainer (gs_lightning_module.py:21-45)."""

    densify_since: int = 500
    densify_until: int = 15_000
    densify_interval: int = 100
    densify_grad_threshold: float = 0.0002
    clone_size_threshold: float = 0.01  # x spatial_scale
    prune_opacity_threshold: float = 0.005
    prune_size_threshold: float = 0.1  # x spatial_scale
    prune_screensize_threshold: float = 40.0
    opacity_reset_interval: int = 3000
    sh_degree_step_interval: int = 1000
    use_screensize_threshold: bool = True
    split_scale_shrink: float = 1.6  # gaussian_model.py:262


def accumulate_stats(
    scene: GaussianScene,
    radii: jnp.ndarray,  # (C,) or (B, C) from the render
    screenspace_grad: jnp.ndarray,  # (C, 2) or (B, C, 2) NDC mean gradients
) -> GaussianScene:
    """Spec: update_max_radii2D / update_xyz_gradient
    (gaussian_model.py:174-181), gated on radii > 0.

    A leading batch axis (batched multi-view step) reduces exactly as B
    sequential reference steps would: max over views for radii, per-view
    grad-norm sums, count += number of views that saw the splat."""
    seen = radii > 0
    norms = jnp.linalg.norm(screenspace_grad[..., :2], axis=-1)
    contrib = jnp.where(seen, norms, 0.0)
    if radii.ndim == 2:
        radii = jnp.max(radii, axis=0)
        contrib = jnp.sum(contrib, axis=0)
        count = jnp.sum(seen.astype(scene.grad_count.dtype), axis=0)
        seen = radii > 0
    else:
        count = seen.astype(scene.grad_count.dtype)
    return dataclasses.replace(
        scene,
        max_radii2d=jnp.where(
            seen, jnp.maximum(scene.max_radii2d, radii), scene.max_radii2d
        ),
        grad_accum=scene.grad_accum + contrib,
        grad_count=scene.grad_count + count,
    )


def densify_and_prune(
    scene: GaussianScene,
    adam: AdamState,
    key: jax.Array,
    cfg: DensifyConfig,
    spatial_scale: float,
    apply_screensize: bool,  # static: step > opacity_reset_interval
):
    """Returns (scene, adam, stats). Pure, jit-safe, fixed shapes."""
    p = scene.params
    capacity = scene.capacity
    opacity = jax.nn.sigmoid(p.opacity[:, 0])
    scales = jnp.exp(p.scales)
    size = jnp.max(scales, axis=-1)

    # ---- prune (gaussian_model.py:212-237) ------------------------------
    keep = scene.alive & (opacity > cfg.prune_opacity_threshold)
    n_pruned_opacity = jnp.sum(
        (scene.alive & (opacity <= cfg.prune_opacity_threshold)).astype(
            jnp.int32
        )
    )
    n_pruned_screen = jnp.zeros((), jnp.int32)
    n_pruned_size = jnp.zeros((), jnp.int32)
    if apply_screensize:
        if cfg.use_screensize_threshold:
            big_screen = scene.alive & (
                scene.max_radii2d >= cfg.prune_screensize_threshold
            )
            n_pruned_screen = jnp.sum(big_screen.astype(jnp.int32))
            keep = keep & ~big_screen
        big_world = scene.alive & (
            size >= cfg.prune_size_threshold * spatial_scale
        )
        n_pruned_size = jnp.sum(big_world.astype(jnp.int32))
        keep = keep & ~big_world

    # ---- densification signal (gaussian_model.py:198-205) ---------------
    grad = jnp.where(
        scene.grad_count > 0, scene.grad_accum / scene.grad_count, 0.0
    )
    bad = keep & (grad >= cfg.densify_grad_threshold)
    small = size < cfg.clone_size_threshold * spatial_scale
    clone_mask = bad & small
    split_mask = bad & ~small

    # ---- split: move + shrink parents in place (gaussian_model.py:251-265)
    displace = jax.random.normal(key, p.xyz.shape, p.xyz.dtype) * scales
    R = tf.quat_to_rotmat(tf.normalize_quat(p.quats))
    moved_xyz = p.xyz + jnp.einsum("nij,nj->ni", R, displace)
    shrunk_scales = p.scales - jnp.log(cfg.split_scale_shrink)
    new_xyz = jnp.where(split_mask[:, None], moved_xyz, p.xyz)
    new_scales = jnp.where(split_mask[:, None], shrunk_scales, p.scales)
    parent_params = dataclasses.replace(p, xyz=new_xyz, scales=new_scales)

    # ---- assign children to free slots ----------------------------------
    child = clone_mask | split_mask
    n_child = jnp.sum(child.astype(jnp.int32))
    n_free = capacity - jnp.sum(keep.astype(jnp.int32))
    rank = jnp.arange(capacity, dtype=jnp.int32)
    free_slots = jnp.argsort(keep)  # stable: dead-first, index order
    child_src = jnp.argsort(~child)  # stable: children-first, index order
    valid = (rank < n_child) & (rank < n_free)
    dst = jnp.where(valid, free_slots, capacity)  # OOB rows -> dropped

    def scatter_children(parent_leaf, extra_dead_fill=None):
        child_vals = parent_leaf[child_src]
        out = parent_leaf.at[dst].set(child_vals, mode="drop")
        return out

    new_params = jax.tree.map(scatter_children, parent_params)
    # pruned-but-unreused slots: force opacity dead so stale rows can never
    # render even if an alive mask is dropped somewhere downstream
    newly_dead = ~keep
    newly_dead = newly_dead.at[dst].set(False, mode="drop")
    new_params = dataclasses.replace(
        new_params,
        opacity=jnp.where(
            newly_dead[:, None], DEAD_OPACITY_LOGIT, new_params.opacity
        ),
    )

    alive = keep.at[dst].set(True, mode="drop")

    # ---- Adam surgery (gs_lightning_module.py:213-235) -------------------
    # surviving rows keep moments in place; activated slots get zeros
    def zero_new(leaf):
        return leaf.at[dst].set(0.0, mode="drop")

    adam = AdamState(
        count=adam.count,
        mu=jax.tree.map(zero_new, adam.mu),
        nu=jax.tree.map(zero_new, adam.nu),
    )

    # ---- reset accumulators (gs_lightning_module.py:207-208) -------------
    zeros = jnp.zeros_like(scene.max_radii2d)
    new_scene = GaussianScene(
        params=new_params,
        alive=alive,
        max_radii2d=zeros,
        grad_accum=zeros,
        grad_count=zeros,
        active_sh_degree=scene.active_sh_degree,
    )
    stats = {
        "n_cloned": jnp.sum(clone_mask.astype(jnp.int32)),
        "n_split": jnp.sum(split_mask.astype(jnp.int32)),
        "n_pruned": jnp.sum((scene.alive & ~keep).astype(jnp.int32)),
        "n_pruned_opacity": n_pruned_opacity,
        "n_pruned_screen": n_pruned_screen,
        "n_pruned_size": n_pruned_size,
        "n_dropped_children": jnp.maximum(n_child - n_free, 0),
        "n_alive": jnp.sum(alive.astype(jnp.int32)),
    }
    return new_scene, adam, stats
