"""YAML-backed configuration.

Replaces the reference's mlconfig/omegaconf registry (``configs/train_gs.yaml``
+ ``@mlconfig.register()``) with plain dataclasses + a YAML overlay: same
capability (one file drives data/model/trainer/optimizer/scheduler), no
registry indirection. ``${var}`` interpolation is supported for the small
subset the reference's config uses.
"""

from __future__ import annotations

import dataclasses
import re
from pathlib import Path
from typing import Any, Dict, Optional

import yaml

from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import TilingConfig
from gaussian_splatting_lightning_tpu.training.densify import DensifyConfig
from gaussian_splatting_lightning_tpu.training.optimizer import OptimizerConfig
from gaussian_splatting_lightning_tpu.training.trainer import TrainConfig


@dataclasses.dataclass(frozen=True)
class DataConfig:
    colmap_path: str = ""
    image_folder: str = ""
    train_idx_file: Optional[str] = None
    valid_idx_file: Optional[str] = None
    mask_folder: Optional[str] = None
    depth_folder: Optional[str] = None  # per-view <stem>.npy inverse-depth
    # maps for the optional depth-regularization loss (train.w_depth)
    resize_to: Optional[int] = None
    downscale: Optional[float] = None
    white_background: bool = False
    z_near: float = 0.01
    z_far: float = 100.0
    holdout_every: Optional[int] = None  # alternative to idx files


@dataclasses.dataclass(frozen=True)
class RunConfig:
    exp_name: str = "gs_tpu"
    run_name: str = "run"
    out_dir: str = "runs"
    seed: int = 42
    sh_degree: int = 3
    capacity: int = 1 << 20
    use_pallas: bool = True
    mesh_view: int = 1
    mesh_tile: Optional[int] = None
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()


def _interpolate(obj: Any, root: Dict[str, Any]) -> Any:
    """Minimal ${a.b} interpolation over a loaded YAML dict."""
    if isinstance(obj, dict):
        return {k: _interpolate(v, root) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_interpolate(v, root) for v in obj]
    if isinstance(obj, str):
        def repl(m):
            cur: Any = root
            for part in m.group(1).split("."):
                cur = cur[part]
            return str(cur)

        out = re.sub(r"\$\{([^}]+)\}", repl, obj)
        return out
    return obj


def _build(cls, data: Dict[str, Any]):
    names = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in (data or {}).items():
        if k not in names:
            raise KeyError(f"unknown config key '{k}' for {cls.__name__}")
        f = names[k]
        if dataclasses.is_dataclass(f.type) or f.name in (
            "data", "train", "densify", "optimizer", "tiling"
        ):
            sub_cls = {
                "data": DataConfig,
                "train": TrainConfig,
                "densify": DensifyConfig,
                "optimizer": OptimizerConfig,
                "tiling": TilingConfig,
            }.get(f.name)
            kwargs[k] = _build(sub_cls, v) if sub_cls else v
        else:
            kwargs[k] = v
    return cls(**kwargs)


def apply_overrides(raw: Dict[str, Any], overrides) -> Dict[str, Any]:
    """Apply ``a.b.c=value`` overrides onto the raw YAML dict (values parsed
    as YAML, so ``--set train.num_iters=100`` and ``--set data.mask_folder=
    null`` both work). Unknown keys are still rejected by _build."""
    for ov in overrides or ():
        key, sep, val = ov.partition("=")
        if not sep:
            raise ValueError(f"override '{ov}' is not of the form key=value")
        parts = key.strip().split(".")
        cur = raw
        for p in parts[:-1]:
            nxt = cur.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
                cur[p] = nxt
            cur = nxt
        v = yaml.safe_load(val)
        if isinstance(v, str):
            # YAML 1.1 misses dotless scientific floats like "5e-5"
            try:
                v = float(v)
            except ValueError:
                pass
        cur[parts[-1]] = v
    return raw


def load_config(path: str, overrides=()) -> RunConfig:
    raw = yaml.safe_load(Path(path).read_text()) or {}
    raw = apply_overrides(raw, overrides)
    raw = _interpolate(raw, raw)
    return _build(RunConfig, raw)
