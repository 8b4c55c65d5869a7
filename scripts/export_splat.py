"""Convert a trained PLY checkpoint to the web-viewer .splat format.

The deployment rung of the reference's unfinished "connect to official GUI"
roadmap item (/root/reference/README.md:44): PLY checkpoints already load in
the SIBR viewer; this converter feeds the browser-viewer ecosystem
(antimatter15/splat format — see models/splat_export.py for the layout).

Usage: python -m scripts.export_splat CKPT.ply [--out scene.splat]
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from gaussian_splatting_lightning_tpu.models import load_ply, save_splat

    out = args.out or str(Path(args.checkpoint).with_suffix(".splat"))
    scene = load_ply(args.checkpoint)
    n = save_splat(scene, out)
    print(f"wrote {n} splats ({n * 32 / 1e6:.1f} MB) to {out}")


if __name__ == "__main__":
    main()
