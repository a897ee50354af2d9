"""bench.py is the driver's perf contract — a smoke test that the
harness runs end to end and emits the r8 TWO-LINE output contract
(VERDICT r7 #1): the full median-of-N record first, a compact
driver-parseable summary LAST (the driver tail-captures ~2000 chars of
stdout, so the final line must be small and self-sufficient). Runs
bench in a SUBPROCESS: bench owns its own SparkSession config and must
not fight the test session."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_smoke_subset_schema(tmp_path):
    # sidecar redirected to tmp_path (VERDICT r10 #3): a pytest run
    # must never overwrite the repo-root bench_detail.json — that file
    # is the driver's only complete per-round dispersion record
    detail_path = tmp_path / "bench_detail.json"
    import glob
    archives_before = set(glob.glob(os.path.join(REPO, "BENCH_DETAIL_r*")))
    root_detail = os.path.join(REPO, "bench_detail.json")
    root_detail_mtime = (os.path.getmtime(root_detail)
                         if os.path.exists(root_detail) else None)
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_BENCH_ONLY="flagship_latest_mid,vwap_by_isin",
               SPARK_GRAFT_BENCH_ITERS="2",
               SPARK_GRAFT_BENCH_OUT=str(detail_path),
               SPARK_GRAFT_CPUS="4")
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, timeout=420,
                         env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 2, out.stdout[-2000:]
    full, summary = json.loads(lines[0]), json.loads(lines[-1])

    # FINAL line: the driver-facing compact summary — small enough to
    # survive the ~2000-char stdout tail capture, no detail block
    assert len(lines[-1]) < 1800
    assert "detail" not in summary
    assert summary["metric"] == "headline_queries_total_wall"
    assert summary["timing"] == "median_of_warm"
    assert summary["n_iter"] == 2 and summary["n_err"] == 0
    # subset run: cross-round totals must be withheld
    assert summary["value"] is None and summary["extended_total"] is None
    # the compact line carries HEADLINE-only per-query medians (both
    # subset queries are headline members)
    assert summary["queries"] == full["queries"]

    # FIRST line + sidecar: the full record with per-query detail
    assert set(full["queries"]) == {"flagship_latest_mid", "vwap_by_isin"}
    assert "errors" not in full
    for name, det in full["detail"].items():
        assert set(det) == {"median", "n_iter", "warm", "cold", "spread",
                            "canary_t", "load_factor"}
        assert det["n_iter"] == len(det["warm"]) == 2
        assert det["median"] > 0 and det["cold"] > 0
        assert full["queries"][name] == det["median"]
        assert det["load_factor"] >= 1.0

    # load-canary block (VERDICT r11 #2): fixed-cell samples with
    # loadavg snapshots — at least the opening and closing rows even
    # on a 2-query subset run — and the compact line carries the
    # max/min ratio so a loaded run is visible from the driver's
    # ~2000-char capture alone
    can = full["canary"]
    assert len(can["samples"]) >= 2
    for s in can["samples"]:
        assert s["t"] > 0 and "after_n" in s and len(s["loadavg"]) == 3
    assert can["spread_ratio"] == summary["canary_ratio"] >= 1.0
    with open(detail_path) as fh:
        assert json.load(fh) == full
    # a redirected subset run must neither create a round archive nor
    # touch the repo-root sidecar (the driver's record stays intact)
    assert set(glob.glob(os.path.join(REPO, "BENCH_DETAIL_r*"))) \
        == archives_before
    if root_detail_mtime is not None:
        assert os.path.getmtime(root_detail) == root_detail_mtime


def test_bench_malformed_out_is_fatal_before_the_run():
    """ADVICE r11 (low): `--out` with a missing value used to warn and
    fall through to the DEFAULT sidecar — a full run would then write
    the repo-root bench_detail.json AND a fresh round archive, the
    exact driver-record clobber --out exists to prevent. Now it exits
    2 up front (before the SparkSession even starts — failing after an
    hour-long run would waste the measurement)."""
    import glob
    archives_before = set(glob.glob(os.path.join(REPO, "BENCH_DETAIL_r*")))
    for argv in (["--out"], ["--out", ""], ["--out", "--something"]):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), *argv],
            capture_output=True, text=True, timeout=60, cwd=REPO,
            env=dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001"))
        assert out.returncode == 2, (argv, out.stdout[-500:])
        assert "--out requires a path" in out.stderr
        # fatal BEFORE any Spark work: nothing on stdout, no sidecars
        assert not out.stdout.strip()
    assert set(glob.glob(os.path.join(REPO, "BENCH_DETAIL_r*"))) \
        == archives_before


def test_canary_ref_ignores_implausible_archived_minimum():
    """ADVICE r12 low: an archived canary captured on faster hardware
    (or one freak sample) must not arm the loaded gate permanently —
    hist_min participates only when this run's own floor is within
    1.5x of it; otherwise the run-local minimum stands alone."""
    sys.path.insert(0, REPO)
    from bench import _canary_ref

    # no history: the run's own floor
    assert _canary_ref(0.08, None) == 0.08
    # plausible history (same machine, idle): takes the min
    assert _canary_ref(0.08, 0.074) == 0.074
    assert _canary_ref(0.07, 0.074) == 0.07
    # implausible history (run floor > 1.5x hist_min): ignored
    assert _canary_ref(0.08, 0.03) == 0.08
    # boundary: exactly 1.5x is still plausible
    assert _canary_ref(0.075, 0.05) == 0.05
