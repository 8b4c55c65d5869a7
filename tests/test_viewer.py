"""Browser-viewer surface: HTTP serving and shader/pipeline parity.

The WebGL app itself cannot execute in this image (no browser/node), so
these tests pin what is checkable host-side: the server contract
(scripts/view.py) and that the shader source carries the exact rasterizer
constants (+0.3 dilation, 1.3-tan clamp, 0.99 alpha clamp, 1/255 kill) and
the .splat record layout assumptions the exporter writes.
"""

import struct
import threading
import urllib.request

import numpy as np

from gaussian_splatting_lightning_tpu.viewer import VIEWER_HTML


def test_viewer_html_matches_pipeline_constants():
    src = VIEWER_HTML.read_text()
    # value-spec constants shared with ops/common.py + core/transforms.py
    assert "+ 0.3" in src  # covariance dilation
    assert "1.3 * tanx" in src and "1.3 * tany" in src  # EWA tan clamping
    assert "min(0.99" in src  # ALPHA_CLAMP
    assert "1.0 / 255.0" in src  # ALPHA_THRESHOLD
    assert "3.0 * sqrt" in src  # 3-sigma quad extent
    # 32-byte .splat record: 8 floats stride, rgba at byte 24, quat at 28
    assert "i * 8" in src and "b + 24" in src and "b + 28" in src
    # dequantization must invert the exporter's q * 128 + 128
    assert "- 128) / 128" in src


def test_view_server_serves_checkpoint(tmp_path):
    from scripts.view import make_handler
    from http.server import ThreadingHTTPServer

    html = VIEWER_HTML.read_bytes()
    splat = struct.pack("<8f", 0, 0, 0, 1, 1, 1, 0, 0) * 3  # 3 fake records
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(html, splat))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10
        ).read()
        assert page == html and b"webgl2" in page
        data = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/scene.splat", timeout=10
        ).read()
        assert data == splat
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/etc/passwd", timeout=10
            )
            assert False, "unknown path must 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


def test_splat_record_layout_roundtrip():
    """The exporter's record layout is exactly what the viewer unpacks."""
    from gaussian_splatting_lightning_tpu.models import from_points
    from gaussian_splatting_lightning_tpu.models.splat_export import (
        scene_to_splat_bytes,
    )

    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(5, 3)).astype(np.float32)
    rgb = rng.uniform(0.2, 0.8, size=(5, 3)).astype(np.float32)
    scene = from_points(xyz, rgb, capacity=5, sh_degree=1)
    raw = scene_to_splat_bytes(scene)
    assert len(raw) == 5 * 32
    f32 = np.frombuffer(raw, np.float32).reshape(5, 8)
    u8 = np.frombuffer(raw, np.uint8).reshape(5, 32)
    # positions survive exactly (order is importance-sorted; compare as sets)
    np.testing.assert_allclose(
        np.sort(f32[:, 0:3], axis=0), np.sort(xyz, axis=0), rtol=1e-6
    )
    assert (f32[:, 3:6] > 0).all()  # linear scales
    # identity quat -> (w x y z) = (1, 0, 0, 0) -> bytes (255, 128, 128, 128)
    assert (u8[:, 28] == 255).all()
    assert (u8[:, 29:32] == 128).all()
