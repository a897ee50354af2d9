"""Rotation ledger (r10, + the ADVICE r10 ordering fix): history rows
must be ordered by PARSED round number, not by the glob's
lexicographic file order — zero-padding holds only to r99, and an
unpadded stray (CORRECTNESS_r9.json next to _r10) would otherwise
make rows[-1] read a stale round. Pure driver-side JSON — no Spark."""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "rotation_ledger", os.path.join(REPO, "tools",
                                        "rotation_ledger.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_history_sorted_by_parsed_round(tmp_path):
    rl = _load_tool()
    # lexicographic order of these files is r10 < r9 (unpadded) —
    # the exact stray the fix guards against
    (tmp_path / "CORRECTNESS_r9.json").write_text(json.dumps(
        {"q": {"rows_match": False, "schema_match": False,
               "hash_match": False, "err": "boom"}}))
    (tmp_path / "CORRECTNESS_r10.json").write_text(json.dumps(
        {"q": {"rows_match": True, "schema_match": True,
               "hash_match": True}}))
    hist = rl.load_history(str(tmp_path))
    rounds = [rnd for rnd, _ in hist["q"]]
    assert rounds == [9, 10]
    last_rnd, last = hist["q"][-1]
    assert last_rnd == 10 and rl.is_green(last)


def test_real_history_monotonic_and_green_counts():
    rl = _load_tool()
    hist = rl.load_history()
    assert hist, "no CORRECTNESS_r*.json found next to the repo root"
    for name, rows in hist.items():
        rounds = [rnd for rnd, _ in rows]
        assert rounds == sorted(rounds), name
    # the r10 verdict's recount: >=152 queries ever driver-green
    ever_green = sum(
        1 for rows in hist.values()
        if any(rl.is_green(rec) for _, rec in rows))
    assert ever_green >= 152
