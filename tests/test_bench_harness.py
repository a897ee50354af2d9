"""bench.py is the driver's perf contract — a smoke test that the
harness runs end to end and emits the r7 median-of-N schema
(VERDICT r6 #1/#8), on a 2-query subset at the tiny SF so it stays
unit-test-priced. Runs bench in a SUBPROCESS: bench owns its own
SparkSession config and must not fight the test session."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_smoke_subset_schema():
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_BENCH_ONLY="flagship_latest_mid,vwap_by_isin",
               SPARK_GRAFT_BENCH_ITERS="2",
               SPARK_GRAFT_CPUS="4")
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, timeout=420,
                         env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["metric"] == "headline_queries_total_wall"
    assert d["timing"] == "median_of_warm"
    assert d["n_iter"] == 2
    # subset run: cross-round totals must be withheld
    assert d["value"] is None and d["extended_total"] is None
    assert set(d["queries"]) == {"flagship_latest_mid", "vwap_by_isin"}
    assert "errors" not in d
    for name, det in d["detail"].items():
        assert set(det) == {"median", "n_iter", "warm", "cold", "spread"}
        assert det["n_iter"] == len(det["warm"]) == 2
        assert det["median"] > 0 and det["cold"] > 0
        assert d["queries"][name] == det["median"]
