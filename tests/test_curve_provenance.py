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


def test_uncited_curve_section_fails_the_check(tmp_path):
    """VERDICT r11 #6: a PERF.md diff that adds a `###` curve section
    WITHOUT a `curve:` citation must fail the provenance check (and a
    cited one must pass). The check runs in the suite via
    test_ledger_check_is_green, so the gate is part of every green
    run; this pins its teeth on a deliberately uncited section."""
    real = open(os.path.join(REPO, "PERF.md")).read()
    bad = real + ("\n### New 10x/30x scale curve for frobnicator\n\n"
                  "| factor | wall |\n|---|---|\n| 10x | 1.0 |\n")
    p = tmp_path / "PERF_bad.md"
    p.write_text(bad)
    out = _run("check", "--perf", str(p))
    assert out.returncode == 1, out.stdout
    assert "without a `curve:` citation" in out.stdout
    assert "frobnicator" in out.stdout

    # the same section WITH a citation that resolves passes
    with open(os.path.join(REPO, "CURVES.json")) as fh:
        some_id = json.load(fh)["curves"][0]["id"]
    good = bad + f"\n*curve: {some_id}*\n"
    p2 = tmp_path / "PERF_good.md"
    p2.write_text(good)
    out2 = _run("check", "--perf", str(p2))
    assert out2.returncode == 0, out2.stdout
    # and a citation to an UNKNOWN id still fails
    p3 = tmp_path / "PERF_unknown.md"
    p3.write_text(bad + "\n*curve: no-such-curve-id*\n")
    out3 = _run("check", "--perf", str(p3))
    assert out3.returncode == 1
    assert "unknown curve ids" in out3.stdout


def test_perf_citations_resolve():
    import re
    with open(os.path.join(REPO, "CURVES.json")) as fh:
        ids = {c["id"] for c in json.load(fh)["curves"]}
    perf = open(os.path.join(REPO, "PERF.md")).read()
    cited = set(re.findall(r"curve:\s*([A-Za-z0-9._-]+)", perf))
    assert cited, "PERF.md cites no curves — the convention regressed"
    assert cited <= ids, cited - ids
