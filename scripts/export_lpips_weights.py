"""Export LPIPS-VGG16 weights to the .npz layout ops/lpips.py loads.

Run this ONCE on any machine that has ``torchvision`` and ``lpips``
installed (this TPU image has neither and no network egress — BASELINE.md
"LPIPS" note), then copy the npz next to your checkpoints:

    python -m scripts.export_lpips_weights --out lpips_vgg16.npz

The layout matches gaussian_splatting_lightning_tpu/ops/lpips.py:
conv{0..12}_w/_b from torchvision VGG16 features, lin{0..4}_w from the lpips
package's trained linear heads (squeezed 1x1 convs).
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="lpips_vgg16.npz")
    args = parser.parse_args()

    import numpy as np

    try:
        import lpips as lpips_pkg
        import torch
    except ImportError as e:
        raise SystemExit(
            f"missing dependency: {e}. Run on a machine with torchvision + "
            "lpips installed (pip install lpips torchvision)."
        )

    model = lpips_pkg.LPIPS(net="vgg")
    out = {}
    convs = [
        m for m in model.net.slice1 + model.net.slice2 + model.net.slice3
        + model.net.slice4 + model.net.slice5
        if isinstance(m, torch.nn.Conv2d)
    ]
    assert len(convs) == 13, f"expected 13 VGG16 convs, got {len(convs)}"
    for i, conv in enumerate(convs):
        out[f"conv{i}_w"] = conv.weight.detach().numpy().astype(np.float32)
        out[f"conv{i}_b"] = conv.bias.detach().numpy().astype(np.float32)
    for j, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{j}_w"] = w.reshape(-1).astype(np.float32)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays")


if __name__ == "__main__":
    main()
