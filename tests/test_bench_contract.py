"""Driver-contract tests for bench.py's output structure.

Round 3's driver bench timed out before printing a byte (VERDICT r3 #1);
bench.py is now structured so the LAST stdout line is always valid JSON
with the required keys. These tests pin the result-line schema and the
roofline model's sanity without touching a TPU.
"""

import json

import bench


def test_result_line_schema():
    line = bench._result_line(
        "headline-1080p", 1920, 1080, 1_000_000, step_s=0.141,
        compile_s=50.0, pairs=2_094_637, budget=2_203_648, dropped=0,
        platform="tpu",
    )
    serialized = json.dumps(line)  # must be JSON-serializable as-is
    parsed = json.loads(serialized)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in parsed
    assert parsed["value"] > 0
    assert parsed["extra"]["dropped_pairs"] == 0
    # enrichment (the final print) keeps it serializable
    line["extra"]["parity_512x384_100k"] = {"error": "SomeError('x')"}
    json.loads(json.dumps(line))


def test_roofline_monotone_and_ordered():
    hard, attain = bench.roofline_ms(2_000_000, 32, 1_000_000, 1920, 1080)
    assert 0 < hard < attain
    hard2, attain2 = bench.roofline_ms(4_000_000, 32, 1_000_000, 1920, 1080)
    assert hard2 > hard and attain2 > attain
