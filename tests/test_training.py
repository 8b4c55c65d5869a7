"""Training-layer tests: schedule parity, SSIM sanity, Adam parity vs torch,
densify semantics, and a synthetic end-to-end training run."""

import dataclasses
import functools
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussian_splatting_lightning_tpu.core.camera import make_camera
from gaussian_splatting_lightning_tpu.models import from_points
from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import TilingConfig
from gaussian_splatting_lightning_tpu.ops.ssim import psnr, ssim
from gaussian_splatting_lightning_tpu.training import (
    DensifyConfig,
    OptimizerConfig,
    TrainConfig,
    Trainer,
    accumulate_stats,
    adam_update,
    densify_and_prune,
    init_adam,
    make_lr_schedules,
    warmup_exp_decay_schedule,
)
from gaussian_splatting_lightning_tpu.training.trainer import render_scene

RNG = np.random.default_rng(11)


def test_schedule_matches_reference():
    torch = pytest.importorskip("torch")
    from tests.ref_oracle import load_reference_module

    sched_mod = load_reference_module("scheduler")
    p = torch.nn.Parameter(torch.zeros(3))
    opt = torch.optim.Adam(
        [{"params": [p], "lr": 0.1, "name": "xyz"},
         {"params": [torch.nn.Parameter(torch.zeros(2))], "lr": 0.5, "name": "other"}]
    )
    ref = sched_mod.GSWarmUpExponentialDecayScheduler(
        optimizer=opt, param="xyz", max_steps=1000, lr_init=0.1,
        lr_final=0.001, lr_delay_multi=0.01, lr_delay_step=100,
    )
    ours = warmup_exp_decay_schedule(0.1, 0.001, 1000, 100, 0.01)
    for step in range(0, 1200, 37):
        # torch scheduler state: lr for step t is applied after t steps
        while ref.last_epoch < step:
            ref.step()
        ref_lr = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(float(ours(step)), ref_lr, rtol=1e-6)
        # non-target group untouched
        assert opt.param_groups[1]["lr"] == 0.5


def test_ssim_properties():
    a = jnp.asarray(RNG.uniform(size=(3, 32, 48)).astype(np.float32))
    assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
    b = jnp.clip(a + 0.25, 0, 1)
    val = float(ssim(a, b))
    assert 0.0 < val < 1.0
    # symmetric
    assert val == pytest.approx(float(ssim(b, a)), abs=1e-6)
    # psnr of identical images is huge, of noise is small
    assert float(psnr(a, a)) > 60
    assert float(psnr(a, jnp.zeros_like(a))) < 15


def test_pallas_blur_matches_xla(monkeypatch):
    """The Pallas separable-blur kernel (TPU SSIM path) in interpret mode:
    forward and gradient match the XLA depthwise-conv blur exactly."""
    import importlib

    ssim_lib = importlib.import_module(
        "gaussian_splatting_lightning_tpu.ops.ssim"
    )

    rng = np.random.default_rng(3)
    # odd width, not a multiple of 128: exercises lane masking; rows not a
    # multiple of the slab height: exercises row padding
    n, c, h, w = 1, 15, 37, 150
    win, sigma = 11, 1.5
    xp = rng.normal(size=(n, c, h + win - 1, w + win - 1)).astype(np.float32)

    def f_xla(x):
        return ssim_lib._blur_valid(x, win, sigma)

    def f_pl(x):
        return ssim_lib._blur_valid_pallas(x, win, sigma, interpret=True)

    a = np.asarray(f_xla(jnp.asarray(xp)))
    b = np.asarray(f_pl(jnp.asarray(xp)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    ct = rng.normal(size=a.shape).astype(np.float32)

    def loss(f, x):
        return jnp.sum(f(x) * jnp.asarray(ct))

    ga = np.asarray(jax.grad(lambda x: loss(f_xla, x))(jnp.asarray(xp)))
    gb = np.asarray(jax.grad(lambda x: loss(f_pl, x))(jnp.asarray(xp)))
    np.testing.assert_allclose(ga, gb, rtol=1e-5, atol=1e-6)


def test_pallas_ssim_map_matches_xla(monkeypatch):
    """Full ssim_map through the Pallas blur (interpret) == the XLA path,
    including under the batched-views vmap the trainer uses."""
    import importlib

    ssim_lib = importlib.import_module(
        "gaussian_splatting_lightning_tpu.ops.ssim"
    )

    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.uniform(size=(2, 3, 40, 150)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(2, 3, 40, 150)).astype(np.float32))
    want = np.asarray(ssim_lib.ssim_map(a, b))

    monkeypatch.setattr(ssim_lib, "_use_pallas_blur", lambda: True)
    monkeypatch.setattr(
        ssim_lib, "_blur_valid_pallas",
        functools.partial(ssim_lib._blur_valid_pallas, interpret=True),
    )
    got = np.asarray(ssim_lib.ssim_map(a, b))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # vmapped (the single-device batched train step vmaps the loss per view)
    got_v = np.asarray(
        jax.vmap(lambda x, y: ssim_lib.ssim_map(x[None], y[None])[0])(a, b)
    )
    np.testing.assert_allclose(got_v, want, rtol=1e-5, atol=1e-6)


def _ssim_f64_reference(img1, img2, window_size=11, sigma=1.5):
    """float64 NumPy SSIM oracle: separable Gaussian window, zero padding —
    exactly the fused-ssim semantics ssim() implements."""
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()

    def blur(im):  # (C, H, W) f64, zero-padded same conv
        from scipy.ndimage import correlate1d

        im = correlate1d(im, g, axis=1, mode="constant", cval=0.0)
        return correlate1d(im, g, axis=2, mode="constant", cval=0.0)

    i1 = img1.astype(np.float64)
    i2 = img2.astype(np.float64)
    mu1, mu2 = blur(i1), blur(i2)
    s1 = blur(i1 * i1) - mu1 * mu1
    s2 = blur(i2 * i2) - mu2 * mu2
    s12 = blur(i1 * i2) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2)
    )
    return m.mean()


def test_ssim_smooth_highres_precision():
    """Regression for the TPU/f32 catastrophic-cancellation bug: on smooth
    high-resolution renders the local variances are ~1e-8 while blur(x^2) is
    ~0.25, so the uncentered E[x^2]-E[x]^2 form (and any bf16 conv) produced
    SSIM far outside [-1, 1], corrupting the 1080p training loss. The
    centered zero-padding-exact form must track a float64 oracle."""
    from scipy.ndimage import zoom

    rng = np.random.default_rng(5)
    base = rng.uniform(0.2, 0.8, size=(3, 17, 30)).astype(np.float32)
    img = zoom(base, (1, 640 / 17, 960 / 30), order=1).astype(np.float32)
    tgt = np.clip(
        img + rng.normal(scale=0.03, size=img.shape), 0, 1
    ).astype(np.float32)
    got = float(ssim(jnp.asarray(img), jnp.asarray(tgt)))
    want = float(_ssim_f64_reference(img, tgt))
    assert -1.0 <= got <= 1.0
    assert got == pytest.approx(want, abs=2e-4)
    # identical smooth images: exactly the degenerate case that cancelled
    assert float(ssim(jnp.asarray(img), jnp.asarray(img))) == pytest.approx(
        1.0, abs=1e-4
    )


def test_adam_matches_torch():
    torch = pytest.importorskip("torch")
    n = 16
    init = {
        "xyz": RNG.normal(size=(n, 3)).astype(np.float32),
        "features_dc": RNG.normal(size=(n, 1, 3)).astype(np.float32),
        "features_rest": RNG.normal(size=(n, 15, 3)).astype(np.float32),
        "opacity": RNG.normal(size=(n, 1)).astype(np.float32),
        "scales": RNG.normal(size=(n, 3)).astype(np.float32),
        "quats": RNG.normal(size=(n, 4)).astype(np.float32),
    }
    from gaussian_splatting_lightning_tpu.models.gaussians import GaussianParams

    params = GaussianParams(**{k: jnp.asarray(v) for k, v in init.items()})
    cfg = OptimizerConfig()
    schedules = make_lr_schedules(cfg, spatial_scale=2.5)
    state = init_adam(params)

    tparams = {k: torch.nn.Parameter(torch.from_numpy(v.copy())) for k, v in init.items()}
    lr_rest = cfg.feature_lr / cfg.r_dc2rest
    topt = torch.optim.Adam(
        [
            {"params": [tparams["xyz"]], "lr": 0.0, "name": "xyz"},
            {"params": [tparams["features_dc"]], "lr": cfg.feature_lr},
            {"params": [tparams["features_rest"]], "lr": lr_rest},
            {"params": [tparams["opacity"]], "lr": cfg.opacity_lr},
            {"params": [tparams["scales"]], "lr": cfg.scaling_lr},
            {"params": [tparams["quats"]], "lr": cfg.rotation_lr},
        ],
        eps=1e-15,
    )
    xyz_sched = make_lr_schedules(cfg, 2.5)["xyz"]

    for step in range(5):
        grads = {
            k: RNG.normal(size=v.shape).astype(np.float32) for k, v in init.items()
        }
        gp = GaussianParams(**{k: jnp.asarray(v) for k, v in grads.items()})
        params, state = adam_update(params, gp, state, schedules, cfg, step)

        topt.param_groups[0]["lr"] = float(xyz_sched(step))
        for k, t in tparams.items():
            t.grad = torch.from_numpy(grads[k])
        topt.step()
        topt.zero_grad()

    for k, t in tparams.items():
        np.testing.assert_allclose(
            np.asarray(getattr(params, k)), t.detach().numpy(),
            rtol=2e-4, atol=2e-6, err_msg=k,
        )


def _small_scene(n=32, cap=64):
    xyz = RNG.normal(size=(n, 3)).astype(np.float32)
    rgb = RNG.uniform(size=(n, 3)).astype(np.float32)
    return from_points(xyz, rgb, capacity=cap, sh_degree=1)


def test_densify_clone_and_prune():
    scene = _small_scene()
    n0 = int(scene.n_alive())
    adam = init_adam(scene.params)
    # poke moments so surgery effects are observable
    adam = dataclasses.replace(
        adam, mu=jax.tree.map(lambda x: x + 1.0, adam.mu)
    )
    cfg = DensifyConfig(densify_grad_threshold=0.1)

    # mark the first 4 splats as high-gradient & small -> clone
    grad = np.zeros(scene.capacity, np.float32)
    grad[:4] = 1.0
    scene = dataclasses.replace(
        scene,
        grad_accum=jnp.asarray(grad),
        grad_count=jnp.asarray((grad > 0).astype(np.float32)),
    )
    # kill splats 10..14 via opacity
    new_op = np.array(scene.params.opacity)
    new_op[10:15] = -12.0
    scene = dataclasses.replace(
        scene,
        params=dataclasses.replace(scene.params, opacity=jnp.asarray(new_op)),
    )

    key = jax.random.PRNGKey(0)
    out, adam2, stats = densify_and_prune(
        scene, adam, key, cfg, spatial_scale=10000.0, apply_screensize=False
    )
    assert int(stats["n_cloned"]) == 4
    assert int(stats["n_split"]) == 0
    assert int(stats["n_pruned"]) == 5
    assert int(stats["n_alive"]) == n0 - 5 + 4
    # clones landed in freed slots with zeroed moments
    alive = np.asarray(out.alive)
    new_slots = [i for i in range(out.capacity) if alive[i] and (
        i >= n0 or 10 <= i < 15)]
    assert len(new_slots) == 4
    for i in new_slots:
        assert np.all(np.asarray(adam2.mu.xyz)[i] == 0)
    # survivors keep moments
    assert np.all(np.asarray(adam2.mu.xyz)[0] == 1.0)
    # cloned values equal their parents'
    parents = np.asarray(scene.params.xyz)[:4]
    children = np.asarray(out.params.xyz)[new_slots]
    np.testing.assert_allclose(np.sort(children, 0), np.sort(parents, 0), rtol=1e-6)
    # stats reset
    assert float(jnp.sum(out.grad_accum)) == 0.0


def test_densify_split_shrinks_and_moves():
    scene = _small_scene()
    adam = init_adam(scene.params)
    cfg = DensifyConfig(densify_grad_threshold=0.1, clone_size_threshold=0.01)
    grad = np.zeros(scene.capacity, np.float32)
    grad[:3] = 1.0
    scene = dataclasses.replace(
        scene,
        grad_accum=jnp.asarray(grad),
        grad_count=jnp.asarray((grad > 0).astype(np.float32)),
    )
    old_scales = np.asarray(scene.get_scales())[:3]
    old_xyz = np.asarray(scene.params.xyz)[:3]
    out, _, stats = densify_and_prune(
        scene, adam, jax.random.PRNGKey(1), cfg,
        spatial_scale=1e-6,  # everything counts as "large" -> split
        apply_screensize=False,
    )
    assert int(stats["n_split"]) == 3
    # parent scales shrunk by 1.6, positions moved
    np.testing.assert_allclose(
        np.asarray(out.get_scales())[:3], old_scales / 1.6, rtol=1e-5
    )
    assert np.abs(np.asarray(out.params.xyz)[:3] - old_xyz).max() > 0
    # both children identical (reference clones the modified parent)
    alive = np.asarray(out.alive)
    n0 = int(scene.n_alive())
    child_slots = [i for i in range(out.capacity) if alive[i] and i >= n0]
    assert len(child_slots) == 3
    parent_xyz = np.sort(np.asarray(out.params.xyz)[:3], axis=0)
    child_xyz = np.sort(np.asarray(out.params.xyz)[child_slots], axis=0)
    np.testing.assert_allclose(child_xyz, parent_xyz, rtol=1e-6)


def test_densify_capacity_overflow_drops_children():
    scene = _small_scene(n=60, cap=64)
    adam = init_adam(scene.params)
    cfg = DensifyConfig(densify_grad_threshold=0.0)
    scene = dataclasses.replace(
        scene,
        grad_accum=jnp.ones(scene.capacity),
        grad_count=jnp.ones(scene.capacity),
    )
    out, _, stats = densify_and_prune(
        scene, adam, jax.random.PRNGKey(2), cfg, 10000.0, False
    )
    assert int(stats["n_dropped_children"]) == 60 - 4
    assert int(stats["n_alive"]) == 64


def _synthetic_views(n_views=6, w=64, h=48):
    """Ground-truth splats rendered from a ring of cameras via the renderer
    itself — self-consistent supervision for the end-to-end loop."""
    from gaussian_splatting_lightning_tpu.data.dataset import ViewItem

    n_gt = 40
    xyz = RNG.normal(size=(n_gt, 3)).astype(np.float32) * 0.8
    rgb = RNG.uniform(0.2, 0.9, size=(n_gt, 3)).astype(np.float32)
    gt = from_points(xyz, rgb, capacity=n_gt, sh_degree=1)
    # make them chunky & opaque
    gt = dataclasses.replace(
        gt,
        params=dataclasses.replace(
            gt.params,
            scales=jnp.full_like(gt.params.scales, np.log(0.12)),
            opacity=jnp.full_like(gt.params.opacity, 2.0),
        ),
    )
    views = []
    fx = fy = 60.0
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        # camera on a ring of radius 4 looking at the origin
        fwd = -np.array([np.cos(ang), 0.2, np.sin(ang)])
        fwd /= np.linalg.norm(fwd)
        pos = -4.0 * fwd
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R = np.stack([right, up2, fwd], 0)  # world->cam rows
        t = -R @ pos
        cam = make_camera(np.concatenate([R, t[:, None]], 1), fx, fy, w, h)
        out, _ = render_scene(gt, cam, w, h, jnp.zeros(3),
                              TilingConfig(max_pairs=1 << 14, tile_capacity=128, chunk=32))
        views.append(
            ViewItem(
                image=np.asarray(out.image),
                viewmatrix=np.asarray(cam.viewmatrix),
                projmatrix=np.asarray(cam.projmatrix),
                campos=np.asarray(cam.campos),
                tanfovx=float(cam.tanfovx),
                tanfovy=float(cam.tanfovy),
                background=np.zeros(3, np.float32),
            )
        )
    return gt, views


def test_end_to_end_training_improves():
    gt, views = _synthetic_views()
    # init from jittered GT points
    xyz0 = np.asarray(gt.params.xyz) + RNG.normal(size=(40, 3)).astype(np.float32) * 0.05
    rgb0 = np.full((40, 3), 0.5, np.float32)
    scene = from_points(xyz0, rgb0, capacity=128, sh_degree=1)

    cfg = TrainConfig(
        num_iters=120,
        capacity=128,
        log_interval=20,
        valid_interval=10_000,
        checkpoint_interval=10_000,
        tiling=TilingConfig(max_pairs=1 << 14, tile_capacity=128, chunk=32),
        densify=DensifyConfig(
            densify_since=20, densify_interval=40, densify_until=100,
            opacity_reset_interval=10_000, sh_degree_step_interval=50,
        ),
        optimizer=OptimizerConfig(xyz_lr_max_steps=120),
    )
    trainer = Trainer(
        cfg, scene, spatial_scale=4.0, train_views=views,
        valid_views=views[:1], log_fn=lambda *a: None,
    )
    trainer.train()
    first = trainer.history[0]
    last = trainer.history[-1]
    assert last["loss"] < first["loss"] * 0.7
    assert last["psnr"] > first["psnr"] + 2.0
    # SH degree warmed up on cadence (steps 50 and 100 -> capped at max 1)
    assert int(trainer.scene.active_sh_degree) == 1
    metrics = trainer.validate()
    assert metrics["valid_psnr"] > first["psnr"]


def test_sparse_adam_skips_invisible_rows():
    from gaussian_splatting_lightning_tpu.models.gaussians import GaussianParams

    n = 8
    params = GaussianParams(
        xyz=jnp.ones((n, 3)), features_dc=jnp.ones((n, 1, 3)),
        features_rest=jnp.ones((n, 3, 3)), opacity=jnp.ones((n, 1)),
        scales=jnp.ones((n, 3)), quats=jnp.ones((n, 4)),
    )
    grads = jax.tree.map(jnp.ones_like, params)
    cfg = OptimizerConfig()
    schedules = make_lr_schedules(cfg, 1.0)
    state = init_adam(params)
    visible = jnp.asarray([True] * 4 + [False] * 4)
    new_params, new_state = adam_update(
        params, grads, state, schedules, cfg, 0, visible=visible
    )
    # invisible rows fully untouched (params and moments)
    np.testing.assert_array_equal(np.asarray(new_params.xyz)[4:], 1.0)
    np.testing.assert_array_equal(np.asarray(new_state.mu.xyz)[4:], 0.0)
    # visible rows moved
    assert np.abs(np.asarray(new_params.xyz)[:4] - 1.0).min() > 0
    assert np.abs(np.asarray(new_state.mu.xyz)[:4]).min() > 0


def test_exposure_compensation_learns_color_shift():
    """With a global color distortion on targets, exposure params absorb it."""
    from gaussian_splatting_lightning_tpu.training.exposure import (
        apply_exposure,
        exposure_update,
        init_exposure,
    )

    state = init_exposure(3)
    img = jnp.asarray(RNG.uniform(size=(3, 16, 16)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(apply_exposure(state.params[0], img)), np.asarray(img)
    )
    # gradient descent on a pure exposure mismatch converges
    target = img * 0.5 + 0.1

    def loss(mat):
        return jnp.mean((apply_exposure(mat, img) - target) ** 2)

    for _ in range(300):
        g = jax.grad(loss)(state.params[1])
        state = exposure_update(state, 1, g, lr=0.02)
    assert float(loss(state.params[1])) < 1e-4
    # untouched views stay identity
    np.testing.assert_allclose(
        np.asarray(state.params[2, :, :3]), np.eye(3), atol=1e-7
    )


def test_trainer_with_exposure_flag():
    gt, views = _synthetic_views(n_views=3, w=48, h=32)
    scene = from_points(
        np.asarray(gt.params.xyz), np.full((40, 3), 0.5, np.float32), 64, 1
    )
    cfg = TrainConfig(
        num_iters=10, capacity=64, log_interval=5, valid_interval=10_000,
        checkpoint_interval=10_000, use_exposure=True,
        tiling=TilingConfig(max_pairs=1 << 12, tile_capacity=64, chunk=32),
        densify=DensifyConfig(densify_since=100, densify_until=0),
    )
    tr = Trainer(cfg, scene, 4.0, views, log_fn=lambda *a: None)
    tr.train()
    assert np.isfinite(tr.history[-1]["loss"])
    assert tr.exposure is not None and int(tr.exposure.count) == 10


def test_batched_multi_view_step_trains_and_accumulates():
    """batch_views=2: one step covers two views; densify statistics reduce
    like two sequential reference steps (VERDICT r1 missing #4)."""
    gt, views = _synthetic_views(n_views=4, w=48, h=32)
    scene = from_points(
        np.asarray(gt.params.xyz), np.full((40, 3), 0.5, np.float32), 64, 1
    )
    cfg = TrainConfig(
        num_iters=8, capacity=64, log_interval=4, valid_interval=10_000,
        checkpoint_interval=10_000, batch_views=2,
        tiling=TilingConfig(max_pairs=1 << 12, tile_capacity=64, chunk=32),
        densify=DensifyConfig(densify_since=100, densify_until=0),
    )
    tr = Trainer(cfg, scene, 4.0, views, log_fn=lambda *a: None)
    tr.train()
    assert np.isfinite(tr.history[-1]["loss"])
    # every step saw 2 views: any splat visible in both has grad_count == 2*steps
    assert float(jnp.max(tr.scene.grad_count)) <= 2 * 8
    assert float(jnp.max(tr.scene.grad_count)) > 8  # some splat seen twice/step


def test_accumulate_stats_batched_matches_sequential():
    scene = _small_scene(n=16, cap=16)
    radii = jnp.asarray(RNG.uniform(0, 5, size=(3, 16)).astype(np.float32))
    radii = radii * (radii > 1.5)  # some zeros
    grads = jnp.asarray(RNG.normal(size=(3, 16, 2)).astype(np.float32))
    seq = scene
    for i in range(3):
        seq = accumulate_stats(seq, radii[i], grads[i])
    bat = accumulate_stats(scene, radii, grads)
    np.testing.assert_allclose(
        np.asarray(bat.max_radii2d), np.asarray(seq.max_radii2d), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(bat.grad_accum), np.asarray(seq.grad_accum), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(bat.grad_count), np.asarray(seq.grad_count)
    )


def test_exposure_update_batched_rows():
    from gaussian_splatting_lightning_tpu.training.exposure import (
        exposure_update,
        init_exposure,
    )

    state = init_exposure(4)
    g = jnp.ones((2, 3, 4))
    out = exposure_update(state, jnp.asarray([1, 3]), g, lr=0.1)
    assert int(out.count) == 1
    # rows 1 and 3 moved, rows 0 and 2 untouched
    moved = np.abs(np.asarray(out.params) - np.asarray(state.params)).sum((1, 2))
    assert moved[1] > 0 and moved[3] > 0
    assert moved[0] == 0 and moved[2] == 0


def test_adaptive_tile_capacity_grows_on_overflow():
    """XLA-path per-tile table overflow now triggers budget growth instead of
    silently dropping the deepest splats (VERDICT r1 weak #5)."""
    gt, views = _synthetic_views(n_views=3, w=48, h=32)
    scene = from_points(
        np.asarray(gt.params.xyz), np.full((40, 3), 0.5, np.float32), 64, 1
    )
    cfg = TrainConfig(
        num_iters=3, capacity=64, log_interval=100, valid_interval=10_000,
        checkpoint_interval=10_000, adaptive_pairs=True, rasterizer="xla",
        tiling=TilingConfig(max_pairs=1 << 12, tile_capacity=8, chunk=8),
        densify=DensifyConfig(densify_since=100, densify_until=0),
    )
    tr = Trainer(cfg, scene, 4.0, views, log_fn=lambda *a: None)
    tr.train()
    assert tr.cfg.tiling.tile_capacity > 8


def test_adaptive_pair_budget_grows_on_overflow():
    gt, views = _synthetic_views(n_views=3, w=48, h=32)
    scene = from_points(
        np.asarray(gt.params.xyz), np.full((40, 3), 0.5, np.float32), 64, 1
    )
    cfg = TrainConfig(
        num_iters=6, capacity=64, log_interval=100, valid_interval=10_000,
        checkpoint_interval=10_000, adaptive_pairs=True,
        tiling=TilingConfig(max_pairs=128, tile_capacity=64, chunk=32),
        densify=DensifyConfig(densify_since=100, densify_until=0),
    )
    tr = Trainer(cfg, scene, 4.0, views, log_fn=lambda *a: None)
    tr.train()
    assert tr.cfg.tiling.max_pairs > 128  # grew past the tiny initial budget


def test_adaptive_pair_budget_shrinks_when_idle():
    """A budget grown for a dense past phase (or a generous initial guess)
    sizes every per-pair stage; after `shrink_patience` consecutive checks
    below max_pairs/4 it shrinks to 2x the observed count."""
    gt, views = _synthetic_views(n_views=3, w=48, h=32)
    scene = from_points(
        np.asarray(gt.params.xyz), np.full((40, 3), 0.5, np.float32), 64, 1
    )
    cfg = TrainConfig(
        num_iters=12, capacity=64, log_interval=100, valid_interval=10_000,
        checkpoint_interval=10_000, adaptive_pairs=True,
        overflow_check_interval=1, shrink_patience=3,
        tiling=TilingConfig(max_pairs=1 << 17, tile_capacity=64, chunk=32),
        densify=DensifyConfig(densify_since=100, densify_until=0),
    )
    tr = Trainer(cfg, scene, 4.0, views, log_fn=lambda *a: None)
    tr.train()
    assert tr.cfg.tiling.max_pairs < 1 << 17
    assert tr.cfg.tiling.max_pairs >= 16384  # floor


def test_nan_loss_rolls_back_to_checkpoint(tmp_path):
    """Failure recovery (SURVEY §5 A2): a non-finite loss restores the newest
    checkpoint and training continues; it aborts only after
    max_nan_rollbacks."""
    gt, views = _synthetic_views(n_views=3, w=48, h=32)
    scene = from_points(
        np.asarray(gt.params.xyz), np.full((40, 3), 0.5, np.float32), 64, 1
    )
    cfg = TrainConfig(
        num_iters=20, capacity=64, log_interval=100, valid_interval=10_000,
        checkpoint_interval=5, adaptive_pairs=False,
        overflow_check_interval=1,
        tiling=TilingConfig(max_pairs=1 << 14, tile_capacity=64, chunk=32),
        densify=DensifyConfig(densify_since=100, densify_until=0),
    )
    tr = Trainer(
        cfg, scene, 4.0, views, out_dir=str(tmp_path), log_fn=lambda *a: None
    )
    orig = tr._train_step
    calls = {"n": 0}

    def poisoned(scene_, adam_, step_, cam_, img_, bg_):
        scene_, adam_, logs = orig(scene_, adam_, step_, cam_, img_, bg_)
        calls["n"] += 1
        if calls["n"] == 13:  # after the step-5 and step-10 checkpoints
            logs = dict(logs)
            logs["loss"] = jnp.asarray(np.nan, jnp.float32)
        return scene_, adam_, logs

    tr._train_step = poisoned
    tr.train()
    assert tr._nan_rollbacks == 1
    assert tr.step > 10  # resumed from ckpt-10 and kept going
    assert math.isfinite(float(tr.history[-1]["loss"]))
    # a completed run is resumable from its FINAL state, not just the last
    # interval checkpoint
    assert (tmp_path / f"ckpt-{tr.step:08d}").exists()


def test_rollback_reproduces_original_trajectory(tmp_path):
    """Checkpoint restore resumes the EXACT run that would have happened:
    the checkpoint now carries the sampler rng state, the in-flight view
    permutation, the jax key, and exposure params, so a NaN rollback (or
    --resume) replays the same view sequence and densify randomness —
    losses match the original run step for step (VERDICT r2 next #9)."""
    gt, views = _synthetic_views(n_views=3, w=48, h=32)

    def make(out):
        scene = from_points(
            np.asarray(gt.params.xyz), np.full((40, 3), 0.5, np.float32),
            64, 1,
        )
        cfg = TrainConfig(
            num_iters=10, capacity=64, log_interval=1, valid_interval=10_000,
            checkpoint_interval=5, adaptive_pairs=False, use_exposure=True,
            tiling=TilingConfig(max_pairs=1 << 14, tile_capacity=64, chunk=32),
            densify=DensifyConfig(densify_since=1, densify_interval=3,
                                  densify_until=10,
                                  densify_grad_threshold=0.0),
        )
        return Trainer(
            cfg, scene, 4.0, views, out_dir=str(out), log_fn=lambda *a: None
        )

    tr_a = make(tmp_path / "a")
    tr_a.train()
    losses_a = {h["step"]: h["loss"] for h in tr_a.history}

    tr_b = make(tmp_path / "b")
    tr_b.restore_checkpoint(tmp_path / "a" / "ckpt-00000005")
    assert tr_b.step == 5
    tr_b.train(num_iters=5)  # steps 5..9, replaying run A's tail
    for h in tr_b.history:
        assert h["loss"] == losses_a[h["step"]], (h, losses_a[h["step"]])
    np.testing.assert_array_equal(
        np.asarray(tr_b.scene.params.xyz), np.asarray(tr_a.scene.params.xyz)
    )
    np.testing.assert_array_equal(
        np.asarray(tr_b.exposure.params), np.asarray(tr_a.exposure.params)
    )


def test_depth_regularization_loss_decreases():
    """w_depth > 0 adds an inverse-depth L1 against dataset depth maps —
    the reference's unfinished "add depth regularization" roadmap item
    (reference README.md TODO). GT-rendered inverse depth supervises a
    jittered init; the depth term must appear in the logs and decrease."""
    import dataclasses as _dc

    gt, views = _synthetic_views(n_views=4, w=64, h=48)
    tiling = TilingConfig(max_pairs=1 << 14, tile_capacity=128, chunk=32)
    # attach GT inverse-depth maps to each view
    from gaussian_splatting_lightning_tpu.core.camera import Camera

    for v in views:
        cam = Camera(
            viewmatrix=jnp.asarray(v.viewmatrix),
            projmatrix=jnp.asarray(v.projmatrix),
            campos=jnp.asarray(v.campos),
            tanfovx=jnp.asarray(np.float32(v.tanfovx)),
            tanfovy=jnp.asarray(np.float32(v.tanfovy)),
        )
        out, _ = render_scene(gt, cam, 64, 48, jnp.zeros(3), tiling)
        v.depth = np.asarray(out.depth)

    xyz0 = np.asarray(gt.params.xyz) + RNG.normal(
        size=(40, 3)
    ).astype(np.float32) * 0.05
    scene = from_points(xyz0, np.full((40, 3), 0.5, np.float32), 64, 1)
    cfg = TrainConfig(
        num_iters=60, capacity=64, log_interval=10, valid_interval=10_000,
        checkpoint_interval=10_000, w_depth=0.2, tiling=tiling,
        densify=DensifyConfig(densify_since=100, densify_until=0),
        optimizer=OptimizerConfig(xyz_lr_max_steps=60),
    )
    tr = Trainer(cfg, scene, 4.0, views, log_fn=lambda *a: None)
    tr.train()
    assert "depth_l1" in tr.history[0]
    assert tr.history[-1]["depth_l1"] < tr.history[0]["depth_l1"] * 0.8
    assert tr.history[-1]["loss"] < tr.history[0]["loss"]

    # batched path carries per-view depth maps too
    cfg_b = _dc.replace(cfg, batch_views=2, num_iters=6, log_interval=2)
    tr_b = Trainer(cfg_b, from_points(
        xyz0, np.full((40, 3), 0.5, np.float32), 64, 1
    ), 4.0, views, log_fn=lambda *a: None)
    tr_b.train()
    assert "depth_l1" in tr_b.history[0]
    assert np.isfinite(tr_b.history[-1]["depth_l1"])


def test_nan_loss_without_checkpoint_aborts():
    import pytest as _pytest

    gt, views = _synthetic_views(n_views=2, w=48, h=32)
    scene = from_points(
        np.asarray(gt.params.xyz), np.full((40, 3), 0.5, np.float32), 64, 1
    )
    cfg = TrainConfig(
        num_iters=5, capacity=64, log_interval=100, valid_interval=10_000,
        checkpoint_interval=10_000, adaptive_pairs=False,
        overflow_check_interval=1,
        tiling=TilingConfig(max_pairs=1 << 14, tile_capacity=64, chunk=32),
        densify=DensifyConfig(densify_since=100, densify_until=0),
    )
    tr = Trainer(cfg, scene, 4.0, views, log_fn=lambda *a: None)
    orig = tr._train_step

    def poisoned(*a):
        scene_, adam_, logs = orig(*a)
        logs = dict(logs)
        logs["loss"] = jnp.asarray(np.inf, jnp.float32)
        return scene_, adam_, logs

    tr._train_step = poisoned
    with _pytest.raises(RuntimeError, match="non-finite loss"):
        tr.train()


def test_validate_regrows_budget_on_drops():
    """In-run validation must not silently under-render a view denser than
    the train-adapted budget: it grows a validation-only budget and
    re-renders until drop-free (VERDICT r2 #8), leaving the train budget
    untouched."""
    gt, views = _synthetic_views(n_views=2, w=64, h=48)
    xyz0 = np.asarray(gt.params.xyz)
    rgb0 = np.full((len(xyz0), 3), 0.5, np.float32)
    scene = from_points(xyz0, rgb0, capacity=64, sh_degree=1)
    # chunky opaque splats so every (splat, tile) pair materializes
    scene = dataclasses.replace(
        scene,
        params=dataclasses.replace(
            scene.params,
            scales=jnp.full_like(scene.params.scales, np.log(0.3)),
            opacity=jnp.full_like(scene.params.opacity, 3.0),
        ),
    )
    tiny = TilingConfig(max_pairs=64, tile_capacity=32, chunk=32)
    cfg = TrainConfig(
        num_iters=1, capacity=64, valid_interval=10_000,
        checkpoint_interval=10_000, adaptive_pairs=False, tiling=tiny,
    )
    logged = []
    trainer = Trainer(
        cfg, scene, spatial_scale=4.0, train_views=views,
        valid_views=views[:1], log_fn=lambda m: logged.append(m),
    )
    metrics = trainer.validate()
    # the tiny budget must have forced at least one re-render...
    assert any("re-rendering" in m for m in logged), logged
    # ...and the final reported metrics are drop-free, not degraded
    assert metrics["valid_num_dropped_pairs"] == 0
    # train budget untouched
    assert trainer.cfg.tiling.max_pairs == 64
    # grown validation budget is reused (no further growth on a second call)
    n_msgs = len(logged)
    trainer.validate()
    assert not any("re-rendering" in m for m in logged[n_msgs:])

def test_checkpoint_retention_keeps_last_n(tmp_path):
    """save_checkpoint garbage-collects all but the newest keep_last_ckpts
    checkpoints (VERDICT r3 weak #5: each is a full capacity-sized scene +
    2x Adam moments, unmanaged multi-GB per run)."""
    gt, views = _synthetic_views(n_views=2, w=48, h=32)
    scene = from_points(
        np.asarray(gt.params.xyz), np.full((40, 3), 0.5, np.float32), 64, 1
    )
    cfg = TrainConfig(
        num_iters=10, capacity=64, log_interval=100, valid_interval=10_000,
        checkpoint_interval=2, keep_last_ckpts=2, adaptive_pairs=False,
        tiling=TilingConfig(max_pairs=1 << 14, tile_capacity=64, chunk=32),
        densify=DensifyConfig(densify_since=100, densify_until=0),
    )
    tr = Trainer(
        cfg, scene, 4.0, views, out_dir=str(tmp_path), log_fn=lambda *a: None
    )
    tr.train()
    ckpts = sorted(p.name for p in tmp_path.glob("ckpt-*"))
    assert ckpts == ["ckpt-00000008", "ckpt-00000010"], ckpts
    # the survivor is restorable
    tr2 = Trainer(
        cfg, scene, 4.0, views, out_dir=str(tmp_path), log_fn=lambda *a: None
    )
    tr2.restore_checkpoint(tmp_path / "ckpt-00000010")
    assert tr2.step == 10


def test_restore_checkpoint_saved_without_exposure(tmp_path):
    """Backward-compatible resume (ADVICE r3 #2): a checkpoint saved by a
    non-exposure run restores into a use_exposure=True trainer (exposure
    keeps its fresh init) instead of orbax failing on the tree mismatch."""
    gt, views = _synthetic_views(n_views=2, w=48, h=32)
    scene = from_points(
        np.asarray(gt.params.xyz), np.full((40, 3), 0.5, np.float32), 64, 1
    )
    base = dict(
        num_iters=2, capacity=64, log_interval=100, valid_interval=10_000,
        checkpoint_interval=10_000, adaptive_pairs=False,
        tiling=TilingConfig(max_pairs=1 << 14, tile_capacity=64, chunk=32),
        densify=DensifyConfig(densify_since=100, densify_until=0),
    )
    tr_a = Trainer(
        TrainConfig(**base), scene, 4.0, views, out_dir=str(tmp_path),
        log_fn=lambda *a: None,
    )
    tr_a.train()
    ckpt = sorted(tmp_path.glob("ckpt-*"))[-1]

    tr_b = Trainer(
        TrainConfig(use_exposure=True, **base), scene, 4.0, views,
        log_fn=lambda *a: None,
    )
    tr_b.restore_checkpoint(ckpt)
    assert tr_b.step == 2
    assert tr_b.exposure is not None  # fresh init survives the fallback
    np.testing.assert_array_equal(
        np.asarray(tr_b.scene.params.xyz), np.asarray(tr_a.scene.params.xyz)
    )

    # and a checkpoint saved WITH exposure restores it (the metadata-probe
    # branch, ADVICE r4 #3): train an exposure run, restore, params match
    out_c = tmp_path / "exp_run"
    scene_c = from_points(  # fresh arrays: tr_a's step donated `scene`'s
        np.asarray(gt.params.xyz), np.full((40, 3), 0.5, np.float32), 64, 1
    )
    tr_c = Trainer(
        TrainConfig(use_exposure=True, **base), scene_c, 4.0, views,
        out_dir=str(out_c), log_fn=lambda *a: None,
    )
    tr_c.train()
    ckpt_c = sorted(out_c.glob("ckpt-*"))[-1]
    tr_d = Trainer(
        TrainConfig(use_exposure=True, **base), scene, 4.0, views,
        log_fn=lambda *a: None,
    )
    tr_d.restore_checkpoint(ckpt_c)
    assert tr_d.step == 2
    np.testing.assert_array_equal(
        np.asarray(tr_d.exposure.params), np.asarray(tr_c.exposure.params)
    )


def test_find_resume_checkpoint_picks_newest_run(tmp_path):
    """--resume auto selection (VERDICT r3 weak #4): newest run by mtime,
    newest checkpoint by STEP within it — not a lexicographic glob across
    every run of the experiment."""
    import os
    import time as _time

    from gaussian_splatting_lightning_tpu.training.trainer import (
        find_resume_checkpoint,
    )

    assert find_resume_checkpoint(tmp_path) is None

    # the lexicographic trap: an OLD run whose path sorts last and whose
    # step count is higher than the current run's
    old = tmp_path / "z-old-run"
    for step in (5, 99):
        (old / f"ckpt-{step:08d}").mkdir(parents=True)
    new = tmp_path / "a-new-run"
    for step in (3, 12):
        (new / f"ckpt-{step:08d}").mkdir(parents=True)
    now = _time.time()
    for p in old.glob("ckpt-*"):
        os.utime(p, (now - 1000, now - 1000))
    for p in new.glob("ckpt-*"):
        os.utime(p, (now, now))

    best = find_resume_checkpoint(tmp_path)
    assert best == new / "ckpt-00000012", best
