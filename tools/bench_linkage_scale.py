#!/usr/bin/env python3
"""Entity-resolution scale curve: catalog size grows 25x while the
surface-form vocabulary stays fixed — resolve_entities' pairwise
stage runs over DISTINCT forms, so wall time should stay near-flat
(the |forms|^2-not-|records|^2 claim, measured). Prints one JSON
line per size."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stockanalyses_downloader_spark.operators import linkage  # noqa: E402
from stockanalyses_downloader_spark.session import get_session  # noqa: E402

ADJ = ["cold", "hot", "small", "large", "blue", "red", "new", "old"]
NOUN = ["widget", "gear", "bolt", "rod", "anvil", "ring"]
CATS = ["ECONOMY", "STANDARD", "PROMO"]


def catalog(spark, n):
    return (spark.range(n)
            .select(F.col("id").alias("rid"),
                    F.concat_ws(
                        " ",
                        F.element_at(F.array(*[F.lit(a) for a in ADJ]),
                                     (F.col("id") % 8 + 1).cast("int")),
                        F.element_at(F.array(*[F.lit(x) for x in NOUN]),
                                     (F.col("id") % 6 + 1).cast("int")))
                    .alias("name"),
                    F.element_at(F.array(*[F.lit(c) for c in CATS]),
                                 (F.col("id") % 3 + 1).cast("int"))
                    .alias("cat")))


def main():
    spark = get_session("linkage-scale")
    blk = F.element_at(F.split(F.col("name"), " "), -1)
    for n in (20_000, 100_000, 500_000):
        df = catalog(spark, n).persist()
        df.count()
        t0 = time.perf_counter()
        out = linkage.resolve_entities(df, "rid", blk, "name",
                                       agree_col="cat",
                                       threshold=0.8, w_name=0.7)
        n_out = out.count()
        secs = round(time.perf_counter() - t0, 2)
        df.unpersist()
        print(json.dumps({"n_records": n, "n_out": n_out,
                          "secs": secs}))


if __name__ == "__main__":
    main()
