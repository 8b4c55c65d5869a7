"""PLY interchange, byte-compatible with the reference checkpoint format.

Write layout (property order and data) matches the reference's ``save_ply``
(``gs_lightning/modules/gaussian_model.py:150-171``), which itself matches the
Inria ecosystem: x y z, nx ny nz (zeros), f_dc_{0..2}, f_rest_{0..3(K-1)-1}
(channel-major: all coeffs of channel 0, then channel 1, ...), opacity,
scale_{0..2}, rot_{0..3} — float32, binary little-endian.

Read path divergence (documented, deliberate): the reference's
``load_model_ply`` sorts property names *lexicographically* and reshapes
``(N, -1, 3)`` (gaussian_model.py:119-140), which both scrambles f_rest
columns for K-1 >= 10 coefficients and transposes the channel-major layout its
own writer produced; it also mis-derives ``active_sh_degree`` from the channel
dimension (gaussian_model.py:132 — every checkpoint loads as degree 2). We
sort numerically, invert the writer layout exactly, and derive the degree from
the coefficient count.

No ``plyfile`` dependency: a small parser handles the binary/ascii vertex
elements we need (including COLMAP points3D.ply with uchar colors).
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

_PLY_DTYPES = {
    "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "ushort": "<u2", "uint16": "<u2", "short": "<i2", "int16": "<i2",
    "uint": "<u4", "uint32": "<u4", "int": "<i4", "int32": "<i4",
}


def read_ply_vertices(path) -> np.ndarray:
    """Parse the 'vertex' element of a PLY file into a structured array."""
    data = Path(path).read_bytes()
    end = data.find(b"end_header\n")
    if end < 0:
        raise ValueError(f"{path}: not a PLY file (no end_header)")
    header = data[:end].decode("ascii", errors="replace").splitlines()
    body = data[end + len(b"end_header\n") :]

    fmt = None
    elements = []  # (name, count, [(prop_name, dtype_str), ...])
    for line in header:
        tok = line.strip().split()
        if not tok:
            continue
        if tok[0] == "format":
            fmt = tok[1]
        elif tok[0] == "element":
            elements.append((tok[1], int(tok[2]), []))
        elif tok[0] == "property":
            if tok[1] == "list":
                elements[-1][2].append((tok[-1], ("list", tok[2], tok[3])))
            else:
                elements[-1][2].append((tok[-1], _PLY_DTYPES[tok[1]]))

    if fmt == "binary_big_endian":
        raise ValueError("big-endian PLY unsupported")

    if fmt == "ascii":
        # ASCII PLY: one line per element item, elements in declared order.
        # Walk every element's line range so 'vertex' parses correctly even
        # when it is not the first element or is followed by others.
        lines = body.decode("ascii").splitlines()
        row = 0
        for name, count, props in elements:
            if name != "vertex":
                row += count
                continue
            if any(isinstance(d, tuple) for _, d in props):
                raise ValueError("list properties on vertex element unsupported")
            rows = lines[row : row + count]
            if len(rows) < count:
                raise ValueError(
                    f"{path}: vertex element truncated "
                    f"({len(rows)}/{count} rows)"
                )
            dtype = np.dtype([(p, d) for p, d in props])
            arr = np.loadtxt(rows, dtype=np.float64, ndmin=2)
            if arr.shape[1] != len(props):
                raise ValueError(
                    f"{path}: vertex rows have {arr.shape[1]} columns, "
                    f"header declares {len(props)} properties"
                )
            out = np.zeros(count, dtype=dtype)
            for i, (p, _) in enumerate(props):
                out[p] = arr[:count, i]
            return out
        raise ValueError(f"{path}: no vertex element found")

    offset = 0
    for name, count, props in elements:
        if any(isinstance(d, tuple) for _, d in props):
            if name == "vertex":
                raise ValueError("list properties on vertex element unsupported")
            break  # list-bearing elements terminate fixed-stride parsing
        dtype = np.dtype([(p, d) for p, d in props])
        nbytes = dtype.itemsize * count
        if name == "vertex":
            return np.frombuffer(body, dtype=dtype, count=count, offset=offset)
        offset += nbytes
    raise ValueError(f"{path}: no vertex element found")


def _numeric_sorted(names, prefix):
    pat = re.compile(re.escape(prefix) + r"_(\d+)$")
    matched = [(int(m.group(1)), n) for n in names if (m := pat.match(n))]
    return [n for _, n in sorted(matched)]


def read_gaussian_ply(path):
    """Load a trained-splat checkpoint PLY.

    Returns dict of numpy arrays: xyz (N,3), features_dc (N,1,3),
    features_rest (N,K-1,3), opacity (N,1) [logit], scales (N,3) [log],
    quats (N,4), plus 'sh_degree'.
    """
    v = read_ply_vertices(path)
    names = v.dtype.names
    xyz = np.stack([v["x"], v["y"], v["z"]], -1).astype(np.float32)
    n = len(xyz)

    f_dc = np.stack(
        [v[p] for p in _numeric_sorted(names, "f_dc")], -1
    ).astype(np.float32)  # (N, 3) channel-major trivially
    rest_names = _numeric_sorted(names, "f_rest")
    if rest_names:
        rest_flat = np.stack([v[p] for p in rest_names], -1).astype(np.float32)
        k_rest = rest_flat.shape[1] // 3
        # writer layout is (channel, coeff): invert to (coeff, channel)
        f_rest = rest_flat.reshape(n, 3, k_rest).transpose(0, 2, 1)
    else:
        k_rest = 0
        f_rest = np.zeros((n, 0, 3), dtype=np.float32)

    opacity = np.asarray(v["opacity"], dtype=np.float32).reshape(n, 1)
    scales = np.stack(
        [v[p] for p in _numeric_sorted(names, "scale")], -1
    ).astype(np.float32)
    quats = np.stack(
        [v[p] for p in _numeric_sorted(names, "rot")], -1
    ).astype(np.float32)

    sh_degree = int(round(np.sqrt(k_rest + 1))) - 1
    return dict(
        xyz=xyz,
        features_dc=f_dc.reshape(n, 1, 3),
        features_rest=f_rest,
        opacity=opacity,
        scales=scales,
        quats=quats,
        sh_degree=sh_degree,
    )


def write_gaussian_ply(path, xyz, features_dc, features_rest, opacity, scales, quats):
    """Write the reference/Inria checkpoint layout (see module docstring)."""
    n = len(xyz)
    k_rest = features_rest.shape[1]
    f_dc = np.asarray(features_dc, np.float32).reshape(n, 1, 3)
    f_dc = f_dc.transpose(0, 2, 1).reshape(n, 3)  # channel-major
    f_rest = np.asarray(features_rest, np.float32).transpose(0, 2, 1).reshape(
        n, 3 * k_rest
    )

    cols = (
        [("x", xyz[:, 0]), ("y", xyz[:, 1]), ("z", xyz[:, 2])]
        + [("nx", np.zeros(n)), ("ny", np.zeros(n)), ("nz", np.zeros(n))]
        + [(f"f_dc_{i}", f_dc[:, i]) for i in range(3)]
        + [(f"f_rest_{i}", f_rest[:, i]) for i in range(3 * k_rest)]
        + [("opacity", np.asarray(opacity, np.float32).reshape(n))]
        + [(f"scale_{i}", np.asarray(scales, np.float32)[:, i]) for i in range(3)]
        + [(f"rot_{i}", np.asarray(quats, np.float32)[:, i]) for i in range(4)]
    )
    dtype = np.dtype([(name, "<f4") for name, _ in cols])
    out = np.empty(n, dtype=dtype)
    for name, col in cols:
        out[name] = np.asarray(col, np.float32)

    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {name}" for name, _ in cols]
    header += ["end_header", ""]
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        f.write(out.tobytes())


def read_points_ply(path):
    """COLMAP-style points3D.ply -> (xyz (N,3) f32, rgb (N,3) f32 in [0,1])."""
    v = read_ply_vertices(path)
    xyz = np.stack([v["x"], v["y"], v["z"]], -1).astype(np.float32)
    if "red" in v.dtype.names:
        rgb = np.stack([v["red"], v["green"], v["blue"]], -1)
        rgb = rgb.astype(np.float32)
        if rgb.max() > 1.0 + 1e-6:
            rgb = rgb / 255.0
    else:
        rgb = np.full_like(xyz, 0.5)
    return xyz, rgb
