"""Load the *reference repo's own* pure-PyTorch rasterizer as a test oracle.

The reference (read-only at /root/reference) is executed — never copied — to
verify our jnp implementation allclose against its actual behavior, the same
"executable parity" strategy the reference itself uses between its Python and
CUDA rasterizers (tests/rasterizer_python/test_mark_visible.py).

The reference's package __init__ pulls in pycolmap/mlconfig (absent here), and
render_tools imports kornia only for Quaternion->matrix. We install a parent
package stub that skips gs_lightning/__init__.py and a minimal kornia shim, so
gs_lightning.rasterize imports cleanly with torch-cpu.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def _install_kornia_shim():
    if "kornia" in sys.modules:
        return
    import torch

    class _Quaternion:
        def __init__(self, q):
            self.q = q

        def matrix(self):
            q = torch.nn.functional.normalize(self.q, dim=-1)
            w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
            row0 = torch.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1
            )
            row1 = torch.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1
            )
            row2 = torch.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1
            )
            return torch.stack([row0, row1, row2], -2)

    kornia = types.ModuleType("kornia")
    geometry = types.ModuleType("kornia.geometry")
    geometry.Quaternion = _Quaternion
    kornia.geometry = geometry
    sys.modules["kornia"] = kornia
    sys.modules["kornia.geometry"] = geometry


def load_reference_rasterize():
    """Import gs_lightning.rasterize from /root/reference without running the
    package __init__ (which needs deps absent from this image)."""
    if not REFERENCE_ROOT.exists():
        return None
    _install_kornia_shim()
    if "gs_lightning" not in sys.modules:
        stub = types.ModuleType("gs_lightning")
        stub.__path__ = [str(REFERENCE_ROOT / "gs_lightning")]
        sys.modules["gs_lightning"] = stub
    import importlib

    return importlib.import_module("gs_lightning.rasterize.rasterize")


def load_reference_module(name: str):
    """Import e.g. 'utils.camera' or 'utils.sh' from the reference package."""
    if not REFERENCE_ROOT.exists():
        return None
    _install_kornia_shim()
    if "gs_lightning" not in sys.modules:
        stub = types.ModuleType("gs_lightning")
        stub.__path__ = [str(REFERENCE_ROOT / "gs_lightning")]
        sys.modules["gs_lightning"] = stub
    import importlib

    return importlib.import_module(f"gs_lightning.{name}")


# --- Frozen camera fixtures -------------------------------------------------
# Re-derived from the treehill scene geometry the reference snapshots in
# tests/rasterizer_python/test_cases.py (viewmatrix/campos/tanfov). We load
# them from the reference at runtime rather than duplicating numbers.

def load_treehill_fixtures():
    """Returns list of dicts with viewmatrix/projmatrix/campos (numpy) and the
    53 frozen points, parsed out of the reference's test_cases.py without
    importing it (it imports diff_gaussian_rasterization)."""
    import ast

    import numpy as np

    src = (REFERENCE_ROOT / "tests/rasterizer_python/test_cases.py").read_text()
    tree = ast.parse(src)

    def tensor_literal(call_node):
        # Tensor([...]) possibly wrapped in .to(device)
        while isinstance(call_node, ast.Call) and isinstance(
            call_node.func, ast.Attribute
        ) and call_node.func.attr == "to":
            call_node = call_node.func.value
        assert isinstance(call_node, ast.Call)
        return np.array(ast.literal_eval(call_node.args[0]), dtype=np.float32)

    settings = []
    points = None
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and isinstance(node.targets[0], ast.Name):
            if node.targets[0].id == "points_3d":
                points = tensor_literal(node.value)
            if node.targets[0].id == "settings":
                for call in node.value.elts:
                    kw = {k.arg: k.value for k in call.keywords}
                    settings.append(
                        dict(
                            viewmatrix=tensor_literal(kw["viewmatrix"]),
                            projmatrix=tensor_literal(kw["projmatrix"]),
                            campos=tensor_literal(kw["campos"]),
                        )
                    )
    common = dict(
        image_height=416, image_width=634, tanfovx=0.600592, tanfovy=0.395425
    )
    return settings, points, common
