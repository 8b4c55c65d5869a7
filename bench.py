"""Benchmark: rays/s/chip (forward+backward) on the flagship rasterizer.

Driver contract: prints JSON lines {"metric", "value", "unit", "vs_baseline"};
the LAST line printed is always valid JSON. The reference publishes no numbers
(BASELINE.md), so vs_baseline is null; the absolute number is tracked round
over round.

Structured defensively against the driver timeout (VERDICT r3 #1 — the round-3
bench died compiling before printing a byte):

1. a small warmup rung (960x540, 250k splats) compiles first and prints a
   provisional JSON line — if the full-size compile is killed, the tail still
   carries a measured number;
2. the headline rung prints its JSON line IMMEDIATELY after the timed loop,
   before any parity work;
3. the stats (dropped-pair) check rides the grad program as an aux output —
   no separate stats compile (round 3 compiled the whole forward twice);
4. the on-device parity gate runs only inside a wall-clock budget
   (BENCH_TIME_BUDGET_S, default 1500 s) and is wrapped in try/except; the
   final enriched line is printed unconditionally.

Scene: synthetic 1M-splat cloud with garden-like screen footprint (a trained
MipNeRF-360 scene has millions of small splats), 1080p render, SH degree 3,
full forward + backward through the L1+SSIM loss — the BASELINE.json
"rays/s/chip (fwd+bwd) at 1080p" metric on one chip, Pallas kernels, pair
budget sized adaptively to the scene.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BENCH_BLOCK = 32  # compositor tile edge (px); see BASELINE.md round-4 notes
TIME_BUDGET_S = float(os.environ.get("BENCH_TIME_BUDGET_S", "1500"))
_T0 = time.monotonic()


def _elapsed():
    return time.monotonic() - _T0


def _note(msg):
    print(f"[bench +{_elapsed():.0f}s] {msg}", file=sys.stderr, flush=True)


def _emit(result):
    """Print one JSON result line (stdout), keeping it the last line."""
    sys.stderr.flush()
    print(json.dumps(result), flush=True)


def _estimate_pairs_numpy(scene, cam, w, h, block=BENCH_BLOCK):
    """Host-side pair estimate at the bench tile size (shared with the
    render/eval CLIs via ops/budget.py)."""
    from gaussian_splatting_lightning_tpu.ops.budget import estimate_pairs

    return estimate_pairs(scene, cam, w, h, block=block)


def run(w, h, n, iters=10, warmup=2):
    import jax

    from gaussian_splatting_lightning_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from gaussian_splatting_lightning_tpu.ops.rasterize_pallas import (
        rasterize_pallas,
    )
    from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import TilingConfig
    from gaussian_splatting_lightning_tpu.training.loss import photometric_loss

    scene = ge._synthetic_scene(n, n, scale=0.008)
    cam = ge._camera(w, h)
    # adaptive pair budget, like the trainer: estimate the scene's actual
    # (splat, tile) pair count host-side (no device compile), then size the
    # static budget to fit — every per-pair stage costs proportionally to it.
    actual_pairs = _estimate_pairs_numpy(scene, cam, w, h)
    # round to sort-block granularity, not the next power of two (which
    # would re-tax every per-pair stage by up to 2x). The host estimate is
    # the EXACT rect-level pair count (ops/budget.py mirrors tile_rect), so
    # 2% headroom suffices; the dropped-pair aux below guards it.
    budget = max(16384, -(-int(actual_pairs * 1.02) // 8192) * 8192)
    cfg = TilingConfig(max_pairs=budget, block=BENCH_BLOCK)
    target = jnp.asarray(
        np.random.default_rng(0).uniform(size=(3, h, w)).astype(np.float32)
    )

    # dropped-pair stat rides the grad program as aux: no second compile
    def loss_fn(xyz, opacity, scales, quats, sh):
        out, stats = rasterize_pallas(
            xyz, opacity, scales, quats, sh, cam, w, h,
            jnp.zeros(3, xyz.dtype), 3, config=cfg,
        )
        loss, _ = photometric_loss(out.image, target, 0.2)
        return loss, stats["num_dropped_pairs"]

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True))
    args = (
        scene.params.xyz, scene.get_opacity(), scene.get_scales(),
        scene.get_rotation(), scene.get_features(),
    )

    t0 = time.perf_counter()
    g, dropped = step(*args)
    jax.block_until_ready(g)
    compile_s = time.perf_counter() - t0
    dropped = int(dropped)

    for _ in range(warmup):
        g, _ = step(*args)
    jax.block_until_ready(g)

    t0 = time.perf_counter()
    for _ in range(iters):
        g, _ = step(*args)
    jax.block_until_ready(g)
    elapsed = time.perf_counter() - t0
    return elapsed / iters, compile_s, actual_pairs, budget, dropped


def parity_gate(w=512, h=384, n=100_000):
    """On-device parity: Pallas kernels vs the XLA tiled path, fwd + every
    parameter gradient, on the REAL backend.

    Round-5 upgrades (VERDICT r4 weak #2/#3): the fixture has random
    anisotropic scales, random unit quats, varied opacities, and live SH
    bands >= 1, so every gradient axis carries signal (the old isotropic
    scene made the quats row a tautology); and BOTH pair-cotangent routing
    dtypes are measured compiled — the production bf16 envelope AND the f32
    routing (previously only asserted in CPU interpret mode) — each with
    its measured step time so the bf16 speed/precision trade is explicit.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from gaussian_splatting_lightning_tpu.ops.rasterize_pallas import (
        rasterize_pallas,
    )
    from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import (
        TilingConfig,
        rasterize_tiled,
    )

    scene = ge._synthetic_scene(n, n, scale=0.01, aniso=True, seed=5)
    cam = ge._camera(w, h)
    target = jnp.asarray(
        np.random.default_rng(1).uniform(size=(3, h, w)).astype(np.float32)
    )
    budget = max(16384, -(-_estimate_pairs_numpy(scene, cam, w, h) * 2 // 8192) * 8192)
    cfg16 = TilingConfig(max_pairs=budget, tile_capacity=4096)
    cfg32 = dataclasses.replace(cfg16, pair_grad_bf16=False)
    args = (
        scene.params.xyz, scene.get_opacity(), scene.get_scales(),
        scene.get_rotation(), scene.get_features(),
    )

    def make_loss(raster, cfg):
        def loss(*p):
            out, _ = raster(*p, cam, w, h, jnp.zeros(3), 3, config=cfg)
            return (
                jnp.abs(out.image - target).mean(),
                out.image,
            )
        return loss

    def timed_grad(raster, cfg, iters=5):
        fn = jax.jit(
            jax.grad(make_loss(raster, cfg), argnums=(0, 1, 2, 3, 4),
                     has_aux=True)
        )
        g, img = fn(*args)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for _ in range(iters):
            g2, _ = fn(*args)
        jax.block_until_ready(g2)
        return g, img, (time.perf_counter() - t0) / iters

    grad_t, img_t, _ = timed_grad(rasterize_tiled, cfg16)

    names = ("xyz", "opacity", "scales", "quats", "sh")
    deltas = {}
    for tag, cfg in (("bf16", cfg16), ("f32", cfg32)):
        grad_p, img_p, step_s = timed_grad(rasterize_pallas, cfg)
        per_param = {}
        for name, gp, gt in zip(names, grad_p, grad_t):
            scale = float(jnp.abs(gt).max()) + 1e-12
            per_param[name] = round(float(jnp.abs(gp - gt).max()) / scale, 6)
        deltas[f"routing_{tag}"] = {
            "image_max_abs": float(jnp.abs(img_p - img_t).max()),
            "grad_rel_per_param": per_param,
            "grad_max_rel": max(per_param.values()),
            "step_ms": round(step_s * 1e3, 2),
        }
    return deltas


def roofline_ms(pairs: int, block: int, n_splats: int, w: int, h: int):
    """Speed-of-light model for the bench step (VERDICT r2 #6): the
    attainable ms given the irreducible work at this shape, so progress is a
    fraction, not an absolute. Two bounds (BASELINE.md "Roofline" section
    derives the constants):

    - hard floor: HBM bytes at 819 GB/s (v5e) + compositor pair-pixel blend
      at the best rate any kernel has achieved on this chip (fwd 413 G
      pair-px/s, bwd 275 — round-2 profile of the 32px-tile kernels, which
      are VPU-bound, not HBM-bound). Binning at its ~bytes-only floor.
    - attainable: same compositor bound + the binning kernels at their
      current measured per-pair rate (14.1 ns/pair across expansion +
      destinations + histogram) — what a zero-XLA-glue, zero-dispatch-gap
      step would cost without inventing new kernels.

    NOTE: the model is FROZEN at its round-3 constants so pct_of_roofline
    is comparable round over round. Two of its terms are now stale in our
    favour: the binning term models the round-3 three-kernel pipeline
    (14.1 ns/pair) while round 5's lone expansion kernel measures
    ~5.8 ns/pair, and the compositor 'best rates' were measured on an
    early-stop-heavy scene (full-walk scenes like the bench's run lower).
    The honest absolute numbers live in BASELINE.md's per-op device
    profiles; this fraction only tracks relative progress.
    """
    pair_px = pairs * block * block
    comp_ms = 1e3 * (pair_px / 413e9 + pair_px / 275e9)
    # HBM: params+grads+Adam moments (7 x 236 B/splat), prep, pair features
    # fwd+bwd (16 f32 + bf16 cotangents), images/loss/SSIM (~8 x 3HW f32)
    bytes_total = (
        7 * 236 * n_splats  # Adam + param grads
        + (236 + 2 * 52) * n_splats  # preprocess fwd read + prep + bwd
        + (3 * 16 * 4 + 16 * 2) * pairs  # pair features + cotangents
        + 10 * 3 * 4 * w * h  # image, target, SSIM maps, grads
        + 8 * 6 * pairs  # sort keys / ids / offsets passes
    )
    mem_ms = 1e3 * bytes_total / 819e9
    binning_attain_ms = 1e3 * pairs * 14.1e-9
    hard = comp_ms + mem_ms
    attain = comp_ms + mem_ms + binning_attain_ms
    return hard, attain


def _result_line(tag, w, h, n, step_s, compile_s, pairs, budget, dropped,
                 platform, extra=None):
    rays_per_s = w * h / step_s
    hard_ms, attain_ms = roofline_ms(pairs, BENCH_BLOCK, n, w, h)
    result = {
        "metric": f"rays/s/chip fwd+bwd, {h}p, {n // 1000}k splats, SH3",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": None,
        "extra": {
            "platform": platform,
            "rung": tag,
            "step_ms": round(1e3 * step_s, 2),
            "compile_s": round(compile_s, 1),
            "impl": "pallas",
            "block_px": BENCH_BLOCK,
            "pairs": pairs,
            "pair_budget": budget,
            "dropped_pairs": dropped,
            "roofline_hard_ms": round(hard_ms, 1),
            "roofline_attainable_ms": round(attain_ms, 1),
            "pct_of_roofline": round(100 * attain_ms / (1e3 * step_s), 1),
        },
    }
    if extra:
        result["extra"].update(extra)
    return result


def main():
    import jax

    platform = jax.devices()[0].platform
    _note(f"platform={platform}; small rung compile starting")

    # rung 1: small safety net — a measured line lands in the tail even if
    # the full-size compile is killed by the driver timeout
    w1, h1, n1 = 960, 540, 250_000
    small = None
    try:
        s_step, s_comp, s_pairs, s_budget, s_drop = run(
            w1, h1, n1, iters=5, warmup=1
        )
        small = _result_line(
            "small-540p", w1, h1, n1, s_step, s_comp, s_pairs, s_budget,
            s_drop, platform,
        )
        _emit(small)
        _note(f"small rung: {s_step * 1e3:.1f} ms/step, compile {s_comp:.0f}s")
    except Exception as e:  # keep going: the headline rung matters more
        _note(f"small rung failed: {e!r}")

    # rung 2: the headline number
    w, h, n = 1920, 1080, 1_000_000
    _note("headline rung compile starting")
    step_s, compile_s, pairs, budget, dropped = run(w, h, n)
    headline = _result_line(
        "headline-1080p", w, h, n, step_s, compile_s, pairs, budget, dropped,
        platform,
    )
    # provisional marker: this measurement is re-emitted below enriched with
    # the parity block; consumers parsing every line (not just the last)
    # must skip provisional=true to avoid double-counting (ADVICE r4 #5)
    headline["extra"]["provisional"] = True
    _emit(headline)
    headline["extra"].pop("provisional")
    _note(f"headline: {step_s * 1e3:.1f} ms/step, compile {compile_s:.0f}s")

    # rung 3: parity gate, only inside the wall-clock budget; the final
    # enriched line prints regardless of its outcome
    parity = None
    if _elapsed() < TIME_BUDGET_S - 120:
        try:
            _note("parity gate starting")
            parity = parity_gate()
        except Exception as e:
            parity = {"error": repr(e)}
            _note(f"parity gate failed: {e!r}")
    else:
        parity = {"skipped": f"time budget ({_elapsed():.0f}s elapsed)"}
        _note("parity gate skipped (time budget)")

    headline["extra"]["parity_512x384_100k"] = parity

    # rung 4: banded-kernel sidecar (VERDICT r4 #8) — re-validates the
    # compiled multi-chip band configuration against the full frame every
    # round, so artifacts/tpu_banded_check.json tracks kernel changes
    if _elapsed() < TIME_BUDGET_S - 90:
        try:
            _note("banded sidecar starting")
            from scripts.tpu_banded_check import run_check

            rec = run_check()
            headline["extra"]["banded_check"] = {
                "ok": rec["ok"],
                "psnr_vs_full_db": round(rec["banded_vs_full_psnr_db"], 1),
                "pair_lists_identical": rec["per_tile_pair_lists_identical"],
            }
        except Exception as e:
            headline["extra"]["banded_check"] = {"error": repr(e)}
            _note(f"banded sidecar failed: {e!r}")
    else:
        headline["extra"]["banded_check"] = {"skipped": "time budget"}

    _emit(headline)


if __name__ == "__main__":
    main()
