"""Unit tests: .splat export layout and camera-path interpolation."""

import numpy as np

RNG = np.random.default_rng(7)


def _small_scene(n=32, capacity=48):
    import dataclasses

    import jax.numpy as jnp

    from gaussian_splatting_lightning_tpu.models import from_points

    xyz = RNG.normal(size=(n, 3)).astype(np.float32)
    rgb = RNG.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    scene = from_points(xyz, rgb, capacity=capacity, sh_degree=2)
    quats = RNG.normal(size=(capacity, 4)).astype(np.float32)
    scene = dataclasses.replace(
        scene,
        params=dataclasses.replace(scene.params, quats=jnp.asarray(quats)),
    )
    return scene


def test_splat_bytes_layout():
    from gaussian_splatting_lightning_tpu.models import scene_to_splat_bytes

    scene = _small_scene()
    data = scene_to_splat_bytes(scene)
    n_alive = int(scene.n_alive())
    assert len(data) == n_alive * 32

    rec = np.frombuffer(data, dtype=np.dtype([
        ("position", np.float32, 3),
        ("scale", np.float32, 3),
        ("rgba", np.uint8, 4),
        ("rot", np.uint8, 4),
    ]))
    # positions are a permutation of the alive xyz
    alive_xyz = np.asarray(scene.params.xyz)[np.asarray(scene.alive)]
    got = rec["position"][np.lexsort(rec["position"].T)]
    want = alive_xyz[np.lexsort(alive_xyz.T)]
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # scales are linear (positive), importance sort is descending
    assert (rec["scale"] > 0).all()
    imp = (
        rec["rgba"][:, 3].astype(np.float64) * rec["scale"].prod(axis=1)
    )
    # quantized alpha makes exact monotonicity too strict; check the trend
    assert imp[0] >= imp[-1]
    # rotation bytes decode to ~unit quaternions
    q = (rec["rot"].astype(np.float32) - 128.0) / 128.0
    norms = np.linalg.norm(q, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=0.02)


def test_splat_skips_dead_slots(tmp_path):
    from gaussian_splatting_lightning_tpu.models import save_splat

    scene = _small_scene(n=10, capacity=64)
    n = save_splat(scene, tmp_path / "s.splat")
    assert n == 10
    assert (tmp_path / "s.splat").stat().st_size == 10 * 32


def test_slerp_and_path_interpolation():
    from scripts.render_path import (
        interpolate_path,
        quat_to_rotmat,
        rotmat_to_quat,
        slerp,
    )

    # slerp half-way of a 90 degree z-rotation is 45 degrees
    q0 = np.array([1.0, 0.0, 0.0, 0.0])
    q90 = rotmat_to_quat(np.array([
        [0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]
    ]))
    qh = slerp(q0, q90, 0.5)
    Rh = quat_to_rotmat(qh)
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    np.testing.assert_allclose(
        Rh, [[c, -s, 0], [s, c, 0], [0, 0, 1]], atol=1e-12
    )

    # round-trip quat <-> rotmat on random rotations (incl. trace<=0 branch)
    for _ in range(20):
        q = RNG.normal(size=4)
        q /= np.linalg.norm(q)
        R = quat_to_rotmat(q)
        q2 = rotmat_to_quat(R)
        np.testing.assert_allclose(quat_to_rotmat(q2), R, atol=1e-10)

    # open path endpoints hit the keyframes; rotations stay orthonormal
    keys = []
    for i in range(4):
        q = RNG.normal(size=4)
        q /= np.linalg.norm(q)
        keys.append((quat_to_rotmat(q), RNG.normal(size=3)))
    frames = list(interpolate_path(keys, 10, loop=False))
    np.testing.assert_allclose(frames[0][0], keys[0][0], atol=1e-9)
    np.testing.assert_allclose(frames[0][1], keys[0][1], atol=1e-9)
    np.testing.assert_allclose(frames[-1][0], keys[-1][0], atol=1e-9)
    np.testing.assert_allclose(frames[-1][1], keys[-1][1], atol=1e-9)
    for R, _ in frames:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)

    # closed loop: frame 0 is key 0, and the path has no duplicated frame
    loop_frames = list(interpolate_path(keys, 8, loop=True))
    np.testing.assert_allclose(loop_frames[0][0], keys[0][0], atol=1e-9)
    assert len(loop_frames) == 8
