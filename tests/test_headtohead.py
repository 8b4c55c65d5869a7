"""Cross-framework head-to-head smoke test (scripts/headtohead.py).

The full run (BASELINE.md round 4) matches the reference's PSNR trajectory
to 1e-7 dB over 800 steps; this pins the machinery at a tiny size so the
coupling (shared init, reference-rendered GT, live-imported scheduler,
identical view order) cannot silently rot.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_headtohead_trajectories_match(tmp_path, monkeypatch):
    from scripts import headtohead

    monkeypatch.setattr(
        "sys.argv",
        [
            "headtohead", "--steps", "20", "--every", "10",
            "--width", "48", "--height", "32", "--gt-splats", "150",
            "--train-splats", "100", "--views", "3", "--eval-views", "1",
            "--out", str(tmp_path),
        ],
    )
    headtohead.main()
    rec = json.loads((tmp_path / "headtohead_l1.json").read_text())
    assert rec["verdict"] == "PASS"
    for row in rec["table"]:
        # identical init + deterministic view order: the frameworks track
        # each other far inside the 0.5 dB gate at every checkpoint
        assert abs(row["delta"]) < 0.05, row
    assert abs(rec["held_out"]["delta"]) < 0.05
