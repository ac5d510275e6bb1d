"""Smoke-test the bench.py output contract (VERDICT r2 #1 regression guard).

Round 2's official perf record was lost because bench.py's output protocol
broke (secondaries ran before the primary; nothing was flushed). This test
pins the contract the driver relies on:

  - `python bench.py --mode eval` prints at least one JSON line on stdout
  - the LAST JSON line is the headline metric
    `oneshot_eval_images_per_sec_per_chip` with value > 0 and the
    vs_baseline / unit fields present

Runs the real flagship model end-to-end on CPU at tiny shapes — slow tier
(~2-4 min on the 1-core CI box).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_eval_primary_record_contract():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single CPU device is fine (and faster)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--mode", "eval", "--platform", "cpu",
         "--batch", "1", "--iters", "2", "--warmup", "1",
         "--query-hw", "128", "192", "--supp-hw", "64", "64"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    json_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert json_lines, f"no JSON line on stdout:\n{proc.stdout}"
    rec = json.loads(json_lines[-1])
    assert rec["metric"] == "oneshot_eval_images_per_sec_per_chip"
    assert rec["value"] > 0
    assert rec["unit"] == "images/sec"
    assert "vs_baseline" in rec


@pytest.mark.slow
def test_bench_multiclass_record_contract():
    """The round-5 headline lever stage: one query pass over S cached
    support classes. Pins the JSON contract + that the chained
    outer(K)/inner(S) scan program builds and runs end-to-end."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--mode", "multiclass", "--platform", "cpu",
         "--batch", "1", "--iters", "20", "--warmup", "1",
         "--multiclass-s", "3",
         "--query-hw", "128", "192", "--supp-hw", "64", "64"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    json_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert json_lines, f"no JSON line on stdout:\n{proc.stdout}"
    rec = json.loads(json_lines[-1])
    assert rec["metric"] == "oneshot_eval_multiclass_images_per_sec_per_chip"
    assert rec["value"] > 0
    assert rec["unit"] == "images/sec"
    assert "vs_baseline" in rec
