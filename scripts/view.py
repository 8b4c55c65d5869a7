"""Interactive browser viewer for a trained checkpoint.

Completes the reference's "connect to official GUI" roadmap item
(/root/reference/README.md:44) with a zero-dependency local GUI: converts
the PLY checkpoint to the .splat interchange in memory and serves a
self-contained WebGL2 viewer (gaussian_splatting_lightning_tpu/viewer/)
on localhost. No TPU, no network access, no JS dependencies.

Usage:
    python -m scripts.view runs/.../point_cloud-final.ply [--port 8642]
then open http://127.0.0.1:8642/ (drag = orbit, wheel = zoom,
shift-drag = pan).
"""

from __future__ import annotations

import argparse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def make_handler(html: bytes, splat: bytes):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path in ("/", "/index.html"):
                body, ctype = html, "text/html; charset=utf-8"
            elif self.path == "/scene.splat":
                body, ctype = splat, "application/octet-stream"
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", help="trained .ply (or .splat) file")
    parser.add_argument("--port", type=int, default=8642)
    parser.add_argument("--host", default="127.0.0.1")
    args = parser.parse_args()

    from gaussian_splatting_lightning_tpu.viewer import VIEWER_HTML

    if args.checkpoint.endswith(".splat"):
        with open(args.checkpoint, "rb") as f:
            splat = f.read()
    else:
        from gaussian_splatting_lightning_tpu.models import load_ply
        from gaussian_splatting_lightning_tpu.models.splat_export import (
            scene_to_splat_bytes,
        )

        splat = scene_to_splat_bytes(load_ply(args.checkpoint))
    html = VIEWER_HTML.read_bytes()
    n = len(splat) // 32
    server = ThreadingHTTPServer(
        (args.host, args.port), make_handler(html, splat)
    )
    print(
        f"serving {n} splats ({len(splat) / 1e6:.1f} MB) at "
        f"http://{args.host}:{args.port}/  (ctrl-c to stop)"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
