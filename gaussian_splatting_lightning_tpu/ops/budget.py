"""Host-side (splat, tile) pair estimation for sizing static budgets.

Every per-pair stage (expansion, counting sort, scatters, feature gather)
is shaped by ``TilingConfig.max_pairs``. The trainer adapts the budget at
runtime (grow on overflow / shrink with hysteresis, training/trainer.py);
inference CLIs render each view once, so they size the budget *up front*
with this numpy replica of the preprocess + tile-rect math (no device
compile needed). Mirrors ops/common.py ``preprocess`` + core.transforms
``tile_rect`` — the exact opacity-aware support radius included.

A too-small budget is NOT an error at render time: binning drops the
farthest splats and reports ``num_dropped_pairs`` (graceful degradation,
"no silent caps"). But silently rendering a degraded image from a CLI is a
quality bug — eval.py once lost 6 dB of PSNR to the default budget — so
the CLIs estimate first and also warn if a render still reports drops.
"""

from __future__ import annotations

import numpy as np


def estimate_pairs(scene, cam, width: int, height: int, block: int = 32) -> int:
    """Estimated (splat, tile) pair count of one view, computed host-side.

    ``scene`` is a GaussianScene (raw parameters; activations applied here
    in numpy), ``cam`` a Camera pytree. ``block`` is the tile edge of the
    rasterizer path that will run (TilingConfig.resolve_block: 32 Pallas,
    16 XLA).
    """
    xyz = np.asarray(scene.params.xyz)
    scales = np.exp(np.asarray(scene.params.scales))
    q = np.asarray(scene.params.quats)
    q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    view = np.asarray(cam.viewmatrix)
    ones = np.ones((len(xyz), 1), np.float32)
    p_view = np.concatenate([xyz, ones], 1) @ view
    z = p_view[:, 2]
    visible = z > 0.2
    alive = np.asarray(scene.alive)
    if alive is not None and alive.shape[0] == len(xyz):
        visible &= alive.astype(bool)

    wq, xq, yq, zq = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.stack([
        1 - 2 * (yq * yq + zq * zq), 2 * (xq * yq - wq * zq), 2 * (xq * zq + wq * yq),
        2 * (xq * yq + wq * zq), 1 - 2 * (xq * xq + zq * zq), 2 * (yq * zq - wq * xq),
        2 * (xq * zq - wq * yq), 2 * (yq * zq + wq * xq), 1 - 2 * (xq * xq + yq * yq),
    ], -1).reshape(-1, 3, 3)
    L = R * scales[:, None, :]
    V = L @ np.swapaxes(L, 1, 2)
    tanx, tany = float(cam.tanfovx), float(cam.tanfovy)
    fx, fy = width * 0.5 / tanx, height * 0.5 / tany
    zs = np.where(visible, z, 1.0)
    x = np.clip(p_view[:, 0] / zs, -1.3 * tanx, 1.3 * tanx) * zs
    y = np.clip(p_view[:, 1] / zs, -1.3 * tany, 1.3 * tany) * zs
    W3 = view[:3, :3].T
    t0 = (fx / zs)[:, None] * W3[0] + (-fx * x / zs ** 2)[:, None] * W3[2]
    t1 = (fy / zs)[:, None] * W3[1] + (-fy * y / zs ** 2)[:, None] * W3[2]
    a = np.einsum("ni,nij,nj->n", t0, V, t0) + 0.3
    b = np.einsum("ni,nij,nj->n", t0, V, t1)
    d = np.einsum("ni,nij,nj->n", t1, V, t1) + 0.3
    mid = 0.5 * (a + d)
    lam = mid + np.sqrt(np.maximum(mid * mid - (a * d - b * b), 0.1))
    radius = np.ceil(3.0 * np.sqrt(lam))
    # opacity-aware exact support radius (ops/common.py preprocess)
    op = 1.0 / (1.0 + np.exp(-np.asarray(scene.params.opacity[:, 0])))
    log_ratio = np.log(np.maximum(op * 255.0, 1.0))
    radius = np.minimum(radius, np.ceil(np.sqrt(2.0 * log_ratio * lam)) + 1.0)

    proj = np.asarray(cam.projmatrix)
    ph = np.concatenate([xyz, ones], 1) @ proj
    pw = 1.0 / (ph[:, 3] + 1e-7)
    px = ((ph[:, 0] * pw + 1) * width - 1) * 0.5
    py = ((ph[:, 1] * pw + 1) * height - 1) * 0.5
    gx, gy = -(-width // block), -(-height // block)
    x0 = np.clip(np.trunc((px - radius) / block), 0, gx)
    x1 = np.clip(np.trunc((px + radius + block - 1) / block), 0, gx)
    y0 = np.clip(np.trunc((py - radius) / block), 0, gy)
    y1 = np.clip(np.trunc((py + radius + block - 1) / block), 0, gy)
    return int(
        np.where(
            visible, np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0), 0
        ).sum()
    )


def pair_budget(
    scene, cams, width: int, height: int, block: int = 32,
    headroom: float = 1.2,
) -> int:
    """Budget covering the max estimated pair count over ``cams`` (a single
    Camera or an iterable), with headroom, rounded up to the 8192 sort-block
    granularity (power-of-two rounding would re-tax every per-pair stage by
    up to 2x)."""
    if hasattr(cams, "viewmatrix"):
        cams = [cams]
    worst = max(estimate_pairs(scene, c, width, height, block) for c in cams)
    return max(16384, -(-int(worst * headroom) // 8192) * 8192)
