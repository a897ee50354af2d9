#!/usr/bin/env python3
"""Scale-curve provenance ledger tool (VERDICT r10 #7).

The r10 spread()-vs-broadcast-join fix invalidated every pre-fix
blow-up slope — the scale harness's ``crossJoin(broadcast(range))``
amplifier was mis-classified as wide, so CPU-heavy cells ran
serialized and the recorded 10x/30x walls were overstated. That made
the second round in a row where "is this curve comparable to last
round's?" had to be answered from memory. Like the rotation ledger
(tools/rotation_ledger.py), this derives the answer from RECORDED
state instead: ``CURVES.json`` maps every PERF.md curve section to
the commit that produced its numbers, the harness that ran them, and
an optional ``superseded_by`` pointer to the measurement that
replaced it.

Usage:
  python tools/curve_provenance.py list [--stale]
      print the ledger (--stale: only superseded entries)
  python tools/curve_provenance.py record --id ID --section TEXT \
         --harness TEXT [--queries a,b] [--note TEXT] [--round N]
      append a new entry stamped with the CURRENT git HEAD (round
      defaults to 1 + the highest driver-committed BENCH_r*.json)
  python tools/curve_provenance.py supersede OLD_ID NEW_ID
      mark OLD_ID as superseded by NEW_ID
  python tools/curve_provenance.py check
      validate: unique ids, superseded_by targets exist, every
      `curve: <id>` citation in PERF.md resolves, and report ledger
      entries PERF.md never cites (exit 1 on any violation)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "CURVES.json")


def load() -> dict:
    with open(LEDGER) as fh:
        return json.load(fh)


def save(data: dict) -> None:
    with open(LEDGER, "w") as fh:
        json.dump(data, fh, indent=1)
        fh.write("\n")


def current_round() -> int:
    rounds = [int(m.group(1)) for p in
              glob.glob(os.path.join(REPO, "BENCH_r*.json"))
              if (m := re.search(r"_r(\d+)\.json$", p))]
    return (max(rounds) + 1) if rounds else 1


def git_head() -> str:
    return subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          cwd=REPO, capture_output=True,
                          text=True, check=True).stdout.strip()


def cmd_list(args) -> int:
    data = load()
    rows = data["curves"]
    if args.stale:
        rows = [c for c in rows if c.get("superseded_by")]
    print(json.dumps(rows, indent=1))
    return 0


def cmd_record(args) -> int:
    data = load()
    ids = {c["id"] for c in data["curves"]}
    if args.id in ids:
        print(f"id already exists: {args.id}", file=sys.stderr)
        return 1
    data["curves"].append({
        "id": args.id,
        "round": args.round or current_round(),
        "commit": git_head(),
        "section": args.section,
        "harness": args.harness,
        "queries": [q for q in (args.queries or "").split(",") if q],
        "superseded_by": None,
        "note": args.note or "",
    })
    save(data)
    print(f"recorded {args.id} @ {data['curves'][-1]['commit']}")
    return 0


def cmd_supersede(args) -> int:
    data = load()
    ids = {c["id"] for c in data["curves"]}
    if args.new_id not in ids:
        print(f"unknown new id: {args.new_id}", file=sys.stderr)
        return 1
    for c in data["curves"]:
        if c["id"] == args.old_id:
            c["superseded_by"] = args.new_id
            save(data)
            print(f"{args.old_id} superseded by {args.new_id}")
            return 0
    print(f"unknown id: {args.old_id}", file=sys.stderr)
    return 1


# Curve-SECTION citation rule (VERDICT r11 #6): any PERF.md `###`
# section whose TITLE looks like a measured curve/tier/A-B report
# must carry a `curve: <id>` citation in its body. The five titles
# below predate the r11 citation convention and are grandfathered BY
# EXACT TITLE — new sections never are.
_CURVEY_TITLE = re.compile(r"(scale|tier|curve|a/b|blow-?up|\b\d+x\b)",
                           re.IGNORECASE)
_GRANDFATHERED = frozenset({
    "Dedup scale curve (tools/bench_dedup_scale.py)",
    "Round-2 scale guards (no bench effect at sf0.1 by design)",
    "Round 5 — ANN compression tier",
    "Round 5 — entity-resolution scale curve (measured, "
    "tools/bench_linkage_scale.py)",
    "Expensive-tier scale curves (tools/bench_expensive_scale.py, "
    "sf0.1 base, local[32])",
})


def _uncited_curve_sections(perf_text: str) -> list[str]:
    """Titles of curve-looking `###` sections with no `curve:`
    citation anywhere in the section body (heading to next `###`)."""
    out = []
    for part in re.split(r"(?m)^### ", perf_text)[1:]:
        title = part.splitlines()[0].strip()
        if (title not in _GRANDFATHERED and _CURVEY_TITLE.search(title)
                and "curve:" not in part):
            out.append(title)
    return out


def cmd_check(args) -> int:
    data = load()
    ids = [c["id"] for c in data["curves"]]
    bad = 0
    dupes = {i for i in ids if ids.count(i) > 1}
    if dupes:
        print(f"duplicate ids: {sorted(dupes)}")
        bad += 1
    idset = set(ids)
    for c in data["curves"]:
        tgt = c.get("superseded_by")
        if tgt is not None and tgt not in idset:
            print(f"{c['id']}: superseded_by -> unknown id {tgt}")
            bad += 1
        if tgt == c["id"]:
            print(f"{c['id']}: supersedes itself")
            bad += 1
    perf = getattr(args, "perf", None) or os.path.join(REPO, "PERF.md")
    cited = set()
    if os.path.exists(perf):
        text = open(perf).read()
        cited = set(re.findall(r"curve:\s*([A-Za-z0-9._-]+)", text))
        unknown = cited - idset
        if unknown:
            print(f"PERF.md cites unknown curve ids: {sorted(unknown)}")
            bad += 1
        uncited_sections = _uncited_curve_sections(text)
        if uncited_sections:
            print("PERF.md curve sections without a `curve:` citation: "
                  f"{uncited_sections}")
            bad += 1
    uncited = idset - cited
    if uncited:
        # informational — pre-r11 sections predate the citation
        # convention and are mapped by their section titles instead
        print(f"note: ledger entries not yet cited in PERF.md: "
              f"{sorted(uncited)}")
    print("check:", "FAIL" if bad else "OK")
    return 1 if bad else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("list")
    p.add_argument("--stale", action="store_true")
    p.set_defaults(fn=cmd_list)
    p = sub.add_parser("record")
    p.add_argument("--id", required=True)
    p.add_argument("--section", required=True)
    p.add_argument("--harness", required=True)
    p.add_argument("--queries")
    p.add_argument("--note")
    p.add_argument("--round", type=int)
    p.set_defaults(fn=cmd_record)
    p = sub.add_parser("supersede")
    p.add_argument("old_id")
    p.add_argument("new_id")
    p.set_defaults(fn=cmd_supersede)
    p = sub.add_parser("check")
    p.add_argument("--perf", help="override the PERF.md path "
                   "(tests point it at a fixture)")
    p.set_defaults(fn=cmd_check)
    args = ap.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
