#!/usr/bin/env python3
"""Driver-window rotation ledger (r10 — VERDICT r9 'what's wrong' #2:
the never-certified bookkeeping drifted off by two when it was kept by
hand; rotation decisions should rest on the RECORDED driver history,
not on notes).

Reads every CORRECTNESS_r*.json next to the repo root plus the live
registry order and prints, as one JSON document:

  never_windowed   registry queries that have never held ANY driver row
  last_is_error    queries whose most recent driver row is an error /
                   non-hash outcome (the rotation leads — a green sweep
                   locally is not a driver certificate)
  certified        queries with >=1 fully hash-green driver row, with
                   the rounds where that happened
  in_window_now    the current first-50 window (what the next driver
                   run will compare)
  suggestions      never-windowed + last-error entries NOT already in
                   the current window, in registry order — the natural
                   promotion list for the next rotation

A row counts as CERTIFIED only when rows+schema+hash all matched;
rows-only rows (err == 'no_oracle') and errors never do.

Usage:  python tools/rotation_ledger.py [--window N]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def load_history(root: str = REPO) -> dict[str, list[tuple[int, dict]]]:
    hist: dict[str, list[tuple[int, dict]]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        if not isinstance(data, dict):
            continue
        for name, rec in data.items():
            if isinstance(rec, dict):
                hist.setdefault(name, []).append((rnd, rec))
    # ADVICE r10: order by PARSED round, not by the glob's
    # lexicographic file order — zero-padding holds only to r99, and
    # an unpadded stray (CORRECTNESS_r9.json vs _r09) would otherwise
    # make rows[-1] read a stale round.
    for rows in hist.values():
        rows.sort(key=lambda t: t[0])
    return hist


def is_green(rec: dict) -> bool:
    return bool(rec.get("rows_match") and rec.get("schema_match")
                and rec.get("hash_match"))


def main() -> None:
    window = WINDOW
    if "--window" in sys.argv:
        window = int(sys.argv[sys.argv.index("--window") + 1])
    from stockanalyses_downloader_spark.queries import all_queries
    names = list(all_queries())
    hist = load_history()

    never_windowed, last_is_error, certified = [], [], {}
    for name in names:
        rows = hist.get(name)
        if not rows:
            never_windowed.append(name)
            continue
        green_rounds = [rnd for rnd, rec in rows if is_green(rec)]
        if green_rounds:
            certified[name] = green_rounds
        last_rnd, last = rows[-1]
        if not is_green(last):
            last_is_error.append(
                {"query": name, "round": last_rnd,
                 "err": last.get("err") or "hash/schema/rows mismatch"})
    in_window = names[:window]
    in_window_set = set(in_window)
    suggestions = [n for n in names
                   if n not in in_window_set
                   and (n in never_windowed
                        or any(e["query"] == n for e in last_is_error))]
    stale = [n for n, rec in ((e["query"], e) for e in last_is_error)
             if n in certified]
    print(json.dumps({
        "n_registry": len(names),
        "n_never_windowed": len(never_windowed),
        "never_windowed": never_windowed,
        "last_is_error": last_is_error,
        "n_certified": len(certified),
        "certified_rounds": certified,
        "recertify_candidates": stale,
        "in_window_now": in_window,
        "suggestions_next_rotation": suggestions,
    }, indent=1))


if __name__ == "__main__":
    main()
