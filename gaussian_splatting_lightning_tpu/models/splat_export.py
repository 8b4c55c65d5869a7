"""Export a trained scene to the web-viewer ``.splat`` format.

The reference's roadmap ends with "connect to official GUI"
(/root/reference/README.md:44, unfinished upstream). The interchange this
framework ships for that rung is twofold: PLY checkpoints byte-compatible
with the Inria layout (models/ply.py — loadable by the SIBR viewer), and
this exporter for the de-facto web format consumed by browser viewers
(antimatter15/splat and descendants): 32 bytes per splat —

    float32[3] position | float32[3] scale (linear)
    uint8[4]   RGBA      | uint8[4]   rotation (normalized quat * 128 + 128)

sorted by descending opacity x volume so viewers can stream front-loaded
importance.
"""

from __future__ import annotations

import numpy as np

SH_C0 = 0.28209479177387814


def scene_to_splat_bytes(scene) -> bytes:
    """Serialize the alive splats of a GaussianScene to .splat bytes."""
    alive = np.asarray(scene.alive)
    xyz = np.asarray(scene.params.xyz, dtype=np.float32)[alive]
    scales = np.exp(np.asarray(scene.params.scales, dtype=np.float32))[alive]
    quats = np.asarray(scene.params.quats, dtype=np.float32)[alive]
    sh0 = np.asarray(scene.params.features_dc, dtype=np.float32)[alive][:, 0]
    opacity = 1.0 / (
        1.0 + np.exp(-np.asarray(scene.params.opacity, dtype=np.float32)[alive, 0])
    )

    order = np.argsort(-(opacity * scales.prod(axis=1)), kind="stable")
    xyz, scales, quats, sh0, opacity = (
        xyz[order], scales[order], quats[order], sh0[order], opacity[order]
    )

    rgb = np.clip(0.5 + SH_C0 * sh0, 0.0, 1.0)
    rgba = np.concatenate([rgb, opacity[:, None]], axis=1)
    rgba_u8 = np.clip(rgba * 255.0 + 0.5, 0, 255).astype(np.uint8)

    qn = quats / np.maximum(
        np.linalg.norm(quats, axis=1, keepdims=True), 1e-12
    )
    rot_u8 = np.clip(qn * 128.0 + 128.0, 0, 255).astype(np.uint8)

    n = len(xyz)
    rec = np.zeros(n, dtype=np.dtype([
        ("position", np.float32, 3),
        ("scale", np.float32, 3),
        ("rgba", np.uint8, 4),
        ("rot", np.uint8, 4),
    ]))
    rec["position"] = xyz
    rec["scale"] = scales
    rec["rgba"] = rgba_u8
    rec["rot"] = rot_u8
    return rec.tobytes()


def save_splat(scene, path) -> int:
    """Write the scene as .splat; returns the number of splats written."""
    data = scene_to_splat_bytes(scene)
    with open(path, "wb") as f:
        f.write(data)
    return len(data) // 32
