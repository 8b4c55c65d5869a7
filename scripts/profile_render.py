"""Profile the renderer: capture a device trace and print the top HLO ops.

The framework's profiling loop (SURVEY §5 lists tracing as absent upstream):
runs the chosen rasterizer under jax.profiler, parses the Chrome-trace
export, and aggregates per-op device time — the tool used to find and fix
the binning bottlenecks in round 1.

Usage: python -m scripts.profile_render [--width 256 --height 192
       --splats 100000 --grad] [--impl pallas|xla]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--width", type=int, default=256)
    parser.add_argument("--height", type=int, default=192)
    parser.add_argument("--splats", type=int, default=100_000)
    parser.add_argument("--max-pairs", type=int, default=1 << 20)
    parser.add_argument(
        "--scale", type=float, default=0.05,
        help="splat scale; bench.py's headline scene uses 0.008",
    )
    parser.add_argument("--impl", default="pallas", choices=["pallas", "xla"])
    parser.add_argument("--grad", action="store_true")
    parser.add_argument("--top", type=int, default=20)
    parser.add_argument("--iters", type=int, default=3)
    args = parser.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    from gaussian_splatting_lightning_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    import __graft_entry__ as ge
    from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import TilingConfig
    from gaussian_splatting_lightning_tpu.training.loss import photometric_loss
    from gaussian_splatting_lightning_tpu.training.trainer import resolve_rasterizer

    w, h, n = args.width, args.height, args.splats
    scene = ge._synthetic_scene(n, n, scale=args.scale)
    cam = ge._camera(w, h)
    raster = resolve_rasterizer(args.impl)
    cfg = TilingConfig(max_pairs=args.max_pairs)
    target = jnp.zeros((3, h, w))

    def loss_fn(*a):
        out, _ = raster(*a, cam, w, h, jnp.zeros(3), 3, config=cfg)
        loss, _ = photometric_loss(out.image, target, 0.2)
        return loss

    fn = jax.grad(loss_fn, argnums=tuple(range(5))) if args.grad else loss_fn
    fn = jax.jit(fn)
    xs = (
        scene.params.xyz, scene.get_opacity(), scene.get_scales(),
        scene.get_rotation(), scene.get_features(),
    )
    r = fn(*xs)
    jax.block_until_ready(r)

    trace_dir = tempfile.mkdtemp(prefix="gs_profile_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.iters):
            r = fn(*xs)
        jax.block_until_ready(r)

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace produced (platform may not support device tracing)")
        return
    data = json.load(gzip.open(files[0]))
    events = data["traceEvents"] if isinstance(data, dict) else data
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    byname = collections.Counter()
    meta = {}
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            if "TPU" in pids.get(e.get("pid"), "") or "device" in pids.get(
                e.get("pid"), ""
            ).lower():
                if e["name"].startswith("jit_"):
                    total += e["dur"]
                else:
                    byname[e["name"]] += e["dur"]
                    if e["name"] not in meta and "args" in e:
                        a = e["args"]
                        src = a.get("source", "")
                        tf_op = a.get("tf_op", "")
                        shape = ""
                        ln = a.get("long_name", "")
                        if "=" in ln:
                            shape = ln.split("=", 2)[1].strip().split(" ")[0]
                        meta[e["name"]] = f"{shape} {tf_op} {src}"
    print(f"total device time: {total / args.iters / 1e3:.2f} ms/iter")
    print(f"{'us/iter':>10}  op")
    for name, d in byname.most_common(args.top):
        print(f"{d / args.iters:10.0f}  {name[:24]:<24} {meta.get(name, '')[:130]}")


if __name__ == "__main__":
    main()
