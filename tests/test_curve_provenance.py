"""Curve-provenance ledger (VERDICT r10 #7): CURVES.json integrity +
the tool's check semantics. Pure driver-side JSON — no Spark."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "curve_provenance.py")


def _run(*args):
    return subprocess.run([sys.executable, TOOL, *args],
                          capture_output=True, text=True, timeout=60)


def test_ledger_check_is_green():
    out = _run("check")
    assert out.returncode == 0, out.stdout + out.stderr
    assert "check: OK" in out.stdout


def test_ledger_schema_and_supersession_chain():
    with open(os.path.join(REPO, "CURVES.json")) as fh:
        data = json.load(fh)
    ids = [c["id"] for c in data["curves"]]
    assert len(ids) == len(set(ids))
    for c in data["curves"]:
        assert {"id", "round", "commit", "section", "harness",
                "queries", "superseded_by", "note"} <= set(c)
        if c["superseded_by"] is not None:
            assert c["superseded_by"] in ids
            assert c["superseded_by"] != c["id"]
    # every pre-spread-fix blow-up curve must be marked superseded
    # (the whole reason the ledger exists)
    stale = {c["id"] for c in data["curves"] if c["superseded_by"]}
    assert {"r7-extended-tier-curves", "r8-headline-tier",
            "r8-dsir-curve", "r9-headline-tier",
            "r9-bpe-bloom-curves", "r9-dsir-bysource-curve"} <= stale


def test_perf_citations_resolve():
    import re
    with open(os.path.join(REPO, "CURVES.json")) as fh:
        ids = {c["id"] for c in json.load(fh)["curves"]}
    perf = open(os.path.join(REPO, "PERF.md")).read()
    cited = set(re.findall(r"curve:\s*([A-Za-z0-9._-]+)", perf))
    assert cited, "PERF.md cites no curves — the convention regressed"
    assert cited <= ids, cited - ids
