"""LPIPS machinery tests (ops/lpips.py).

Pretrained VGG weights are not obtainable inside this image (zero egress —
BASELINE.md "LPIPS" note), so these tests validate the machinery with
random weights in the exact npz layout scripts/export_lpips_weights.py
produces: identical images score 0, perturbed images score > 0, batching
works, and the weight validator rejects malformed archives.
"""

import numpy as np
import pytest

from gaussian_splatting_lightning_tpu.ops import lpips as L


def _random_weights(rng):
    w = {}
    in_ch = 3
    for i, width in enumerate(L._WIDTHS):
        w[f"conv{i}_w"] = rng.normal(
            0, 0.05, size=(width, in_ch, 3, 3)
        ).astype(np.float32)
        w[f"conv{i}_b"] = rng.normal(0, 0.01, size=(width,)).astype(np.float32)
        in_ch = width
    for j, tap in enumerate(L._TAPS):
        w[f"lin{j}_w"] = np.abs(
            rng.normal(0, 1, size=(L._WIDTHS[tap],))
        ).astype(np.float32)
    return w


def test_lpips_zero_for_identical_and_positive_for_different():
    rng = np.random.default_rng(0)
    w = _random_weights(rng)
    img = rng.uniform(size=(3, 64, 96)).astype(np.float32)
    other = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1).astype(
        np.float32
    )
    d_same = float(L.lpips(img, img, w))
    d_diff = float(L.lpips(img, other, w))
    assert d_same == pytest.approx(0.0, abs=1e-9)
    assert d_diff > 1e-6

    batch = np.stack([img, other])
    ref = np.stack([img, img])
    d = np.asarray(L.lpips(batch, ref, w))
    assert d.shape == (2,)
    assert d[0] == pytest.approx(0.0, abs=1e-9)
    assert d[1] == pytest.approx(d_diff, rel=1e-4)


def test_lpips_more_perturbation_scores_higher():
    rng = np.random.default_rng(1)
    w = _random_weights(rng)
    img = rng.uniform(size=(3, 48, 48)).astype(np.float32)
    noise = rng.normal(0, 1, img.shape)
    small = np.clip(img + 0.02 * noise, 0, 1).astype(np.float32)
    large = np.clip(img + 0.3 * noise, 0, 1).astype(np.float32)
    assert float(L.lpips(img, small, w)) < float(L.lpips(img, large, w))


def test_load_weights_validates_layout(tmp_path):
    rng = np.random.default_rng(2)
    w = _random_weights(rng)
    good = tmp_path / "good.npz"
    np.savez(good, **w)
    loaded = L.load_weights(good)
    assert set(loaded) == set(w)

    bad = dict(w)
    bad["conv3_w"] = bad["conv3_w"][: 7]  # wrong width
    bad_path = tmp_path / "bad.npz"
    np.savez(bad_path, **bad)
    with pytest.raises(ValueError, match="conv3"):
        L.load_weights(bad_path)

    del bad["conv3_w"]
    missing_path = tmp_path / "missing.npz"
    np.savez(missing_path, **{k: v for k, v in bad.items()})
    with pytest.raises(ValueError, match="conv3"):
        L.load_weights(missing_path)
