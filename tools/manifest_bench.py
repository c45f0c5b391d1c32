"""Manifest-sink protocol cost vs the swap sink (round 11).

Measures, at a configurable batch count/size on local[32]:
- per-insert wall time, swap (`insert_if_absent`) vs manifest
  (`manifest_insert_if_absent`) — the manifest adds one dir listing,
  one listing diff and one small JSON write per insert;
- read-path cost, plain `spark.read.parquet` vs
  `read_manifest_sink` (manifest resolution + explicit file list);
- compaction, `compact_parquet_sink` vs `manifest_compact`.

Usage: python tools/manifest_bench.py [n_batches] [rows_per_batch]
Prints one JSON line per protocol.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    from pyspark.sql import SparkSession

    from haensel_ams_data_engineer_challenge_spark.operators import (
        manifest_sink as M,
        sinks,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )

    def batch(i: int):
        return spark.range(i * rows_per, (i + 1) * rows_per).selectExpr(
            "cast(id as string) as k", "cast(id as double) as v"
        )

    for proto in ("swap", "manifest"):
        work = tempfile.mkdtemp(prefix=f"manifest_bench_{proto}_")
        path = f"{work}/sink"
        insert = (
            sinks.insert_if_absent
            if proto == "swap"
            else M.manifest_insert_if_absent
        )
        t_ins = []
        for i in range(n_batches):
            t0 = time.perf_counter()
            insert(spark, batch(i), path, ["k"])
            t_ins.append(time.perf_counter() - t0)
        # read path (post-insert, fragmented)
        t0 = time.perf_counter()
        if proto == "swap":
            n = spark.read.parquet(path).count()
        else:
            n = M.read_manifest_sink(spark, path).count()
        t_read = time.perf_counter() - t0
        # compaction
        t0 = time.perf_counter()
        if proto == "swap":
            sinks.compact_parquet_sink(spark, path, target_partitions=4)
        else:
            M.manifest_compact(spark, path, target_partitions=4)
        t_compact = time.perf_counter() - t0
        # read path (post-compaction)
        t0 = time.perf_counter()
        if proto == "swap":
            n2 = spark.read.parquet(path).count()
        else:
            n2 = M.read_manifest_sink(spark, path).count()
        t_read2 = time.perf_counter() - t0
        assert n == n2 == n_batches * rows_per, (n, n2)
        print(
            json.dumps(
                {
                    "case": f"sink_protocol_{proto}",
                    "n_batches": n_batches,
                    "rows_per_batch": rows_per,
                    "insert_first_s": round(t_ins[0], 3),
                    "insert_mean_s": round(sum(t_ins) / len(t_ins), 3),
                    "insert_last_s": round(t_ins[-1], 3),
                    "read_fragmented_s": round(t_read, 3),
                    "compact_s": round(t_compact, 3),
                    "read_compacted_s": round(t_read2, 3),
                }
            )
        )
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
