"""The bench's stdout contract: exactly ONE line on fd 1, and that line
is the JSON payload.

Round 15's driver artifact (BENCH_r15.json) recorded parsed: null — the
driver could not recover the payload from the bench's stdout — which
nuked every per-query round-over-round comparison in PERF_r16.json
(VERDICT r16 item 2). bench.claim_stdout()/emit_result() now enforce the
contract at the file-descriptor level so the JVM, child processes and
stray Python prints cannot reach fd 1. These tests drive that mechanism
in a real subprocess (no Spark needed): noise is written through every
channel a bench run has — print(), sys.stdout, os.write(1, ...), and a
child process inheriting fd 1 — and stdout must still be exactly the one
JSON line."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = r"""
import json, os, subprocess, sys
sys.path.insert(0, %(repo)r)
import bench

fd = bench.claim_stdout()

# every stdout channel a bench run has, post-claim:
print("python print noise")                      # Python-level print
sys.stdout.write("sys.stdout noise\n")           # direct stream write
os.write(1, b"raw fd1 noise\n")                  # raw fd 1 (the JVM's view)
subprocess.run(["echo", "child process noise"])  # inherited fd 1 (py4j/JVM)
sys.stderr.write("legit stderr line\n")

bench.emit_result(fd, {"metric": "headline_queries_total", "value": 1.5,
                       "unit": "sec", "queries": {"q": 1.5}, "sf": 0.0})
"""


def _run_driver() -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", DRIVER % {"repo": REPO}],
        capture_output=True,
        text=True,
        timeout=60,
    )


def test_stdout_is_exactly_one_json_line():
    proc = _run_driver()
    assert proc.returncode == 0, proc.stderr
    lines = proc.stdout.splitlines()
    assert len(lines) == 1, f"stdout must be ONE line, got {lines!r}"
    payload = json.loads(lines[0])
    assert payload["metric"] == "headline_queries_total"
    assert payload["unit"] == "sec"
    assert payload["queries"] == {"q": 1.5}


def test_noise_lands_on_stderr_not_stdout():
    proc = _run_driver()
    # the noise is preserved (diagnosability), just not on fd 1
    for marker in (
        "python print noise",
        "sys.stdout noise",
        "raw fd1 noise",
        "child process noise",
        "legit stderr line",
    ):
        assert marker in proc.stderr
        assert marker not in proc.stdout


def test_bench_main_routes_through_emit_result():
    """bench.main() must end with emit_result (the contract emitter), not
    a bare print — a regression reintroducing print() would put the
    payload on the redirected fd (stderr) and publish NOTHING on stdout."""
    src = open(os.path.join(REPO, "bench.py")).read()
    assert "emit_result(real_stdout, payload)" in src
    assert "real_stdout = claim_stdout()" in src
    assert "print(json.dumps(payload))" not in src
