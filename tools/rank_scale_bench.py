"""Scale evidence for operators/rank.py (round 6).

`ROW_NUMBER() OVER (ORDER BY ...)` with an empty PARTITION BY is the
canonical single-task sort: Spark plans one `Window` over ONE
partition, so a 100 TB rank would serialize through a single reducer.
`global_row_number` computes the identical ranks with the
range-partition + prefix-count shape.  This bench runs both on the
same synthetic relation, asserts bit-identical results via an
order-insensitive checksum, and reports wall time + the reduce-side
task count of the ranking stage (1 for the window form, n_partitions
for the distributed form).

Usage: python tools/rank_scale_bench.py [n_rows]
Prints one JSON line per measurement; summary lives in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from haensel_ams_data_engineer_challenge_spark.operators.rank import (
        global_row_number,
    )
    from haensel_ams_data_engineer_challenge_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "rank-scale-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    # ties on v are heavy (v has 1000 distinct values) so the id
    # tie-break is load-bearing in both forms
    df = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
        .persist()
    )
    df.count()

    def checksum(ranked, rank_col):
        # order-insensitive exact checksum of the (k -> rank) mapping
        return ranked.agg(
            F.sum(F.col(rank_col) * (F.col("k") % 997 + 1)).alias("c")
        ).collect()[0]["c"]

    results = {}
    for arm in ("window_single_task", "distributed_prefix"):
        for attempt in range(2):
            t0 = time.time()
            if arm == "window_single_task":
                ranked = df.withColumn(
                    "rn",
                    F.row_number().over(
                        Window.orderBy(F.col("v").asc(), F.col("k").asc())
                    ),
                )
            else:
                ranked = global_row_number(df, ["v", "k"], out_col="rn")
            c = checksum(ranked, "rn")
            wall = time.time() - t0
            results[arm] = c
            print(json.dumps({
                "bench": "global_rank", "arm": arm, "attempt": attempt,
                "n_rows": n_rows, "checksum": int(c),
                "wall_s": round(wall, 2),
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }), flush=True)
    assert results["window_single_task"] == results["distributed_prefix"], (
        "rank checksums diverge"
    )
    print(json.dumps({"bench": "global_rank", "identical": True}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
