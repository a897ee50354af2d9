#!/usr/bin/env python3
"""Measured evidence for the compaction operator (r7): fragment the
sf0.1 documents table into N-file layouts, time the same full-scan
aggregate on each, compact, and time again. The point at 100 TB:
scan cost on a fragmented table is file-open-bound (a footer read +
a task per file), so wall grows with FILE COUNT at constant bytes;
compaction restores byte-bound scans. Also reports compaction wall
itself (the maintenance cost being amortized).

Usage:
    python tools/bench_compaction.py [n_files ...]   # default 64 512
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stockanalyses_downloader_spark.operators import compaction
from stockanalyses_downloader_spark.session import DEFAULT_SF_DIR, get_session
from stockanalyses_downloader_spark.sources.tables import load_table


def scan_wall(spark, path: str, n_iter: int = 3) -> float:
    """Median wall of a full-scan aggregate (forces every file open;
    the filter defeats footer-only count shortcuts)."""
    walls = []
    for _ in range(n_iter):
        t0 = time.monotonic()
        (spark.read.parquet(path)
         .filter(F.length("text") > 0)
         .agg(F.count("*"), F.sum(F.length("text")))
         .collect())
        walls.append(time.monotonic() - t0)
    return sorted(walls)[len(walls) // 2]


def main() -> None:
    fragments = [int(a) for a in sys.argv[1:]] or [64, 512]
    spark = get_session("bench-compaction")
    docs = load_table(spark, DEFAULT_SF_DIR, "documents")
    results = {}
    for n_files in fragments:
        work = tempfile.mkdtemp(prefix=f"compact-bench-{n_files}-")
        path = os.path.join(work, "documents")
        docs.repartition(n_files).write.mode("overwrite").parquet(path)
        n_before = len(compaction.list_data_files(path))
        frag_wall = scan_wall(spark, path)
        t0 = time.monotonic()
        stats = compaction.compact_parquet(spark, path,
                                           target_bytes=128 * 1024 * 1024)
        compact_wall = time.monotonic() - t0
        compacted_wall = scan_wall(spark, path)
        results[str(n_files)] = {
            "files_before": n_before,
            "files_after": stats["files_after"],
            "bytes_total": stats["bytes_total"],
            "scan_fragmented_s": round(frag_wall, 3),
            "scan_compacted_s": round(compacted_wall, 3),
            "speedup": round(frag_wall / compacted_wall, 2),
            "compact_wall_s": round(compact_wall, 3),
        }
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"bench": "compaction", "sf_dir": DEFAULT_SF_DIR,
                      "results": results}))


if __name__ == "__main__":
    main()
