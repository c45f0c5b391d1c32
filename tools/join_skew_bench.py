"""Skew evidence for salted_join (round 6).

Synthesizes a hot-key fact⋈dim join in the regime the operator exists
for — the dim too big (by policy) to broadcast, one key holding ~30%
of the fact — and measures the three strategies on identical data:

- plain sort-merge join, AQE OFF: the flooded-reducer baseline (one
  task sorts and joins the whole hot key);
- plain sort-merge join, AQE ON: what the runtime skew split buys
  (OptimizeSkewedJoin splits the oversized partition after the first
  shuffle has measured it);
- salted_join (static, AQE OFF): what known-skew salting buys with no
  runtime machinery — the hot key is spread over n_salts reducers
  before any shuffle statistics exist.

The fact pad is per-row md5 (incompressible) so shuffle sizes are
honest; every strategy returns the same row count (asserted).

Usage: python tools/join_skew_bench.py [n_fact] [n_dim] [n_salts]
Prints one JSON line per measurement; summary lives in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HOT_FRACTION = 0.3


def main() -> None:
    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_salts = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from pyspark.sql import SparkSession, functions as F

    from haensel_ams_data_engineer_challenge_spark.operators.scale import salted_join

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("join-skew-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # the operator's regime: the dim must NOT broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    hot_cut = int(HOT_FRACTION * 10)

    def fact():
        return spark.range(n_fact).select(
            F.col("id").alias("row_id"),
            F.when(F.pmod(F.hash("id"), F.lit(10)) < hot_cut, F.lit(0))
            .otherwise(F.pmod(F.hash(F.col("id") * 7), F.lit(n_dim)))
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )

    def dim():
        return spark.range(n_dim).select(
            F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("attr")
        )

    def timed(name: str, make_df, aqe: bool, skew_threshold: str | None = None) -> int:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        for key in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        ):
            if skew_threshold is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, skew_threshold)
        make_df().count()  # warm: plan + shuffle files + codegen
        t0 = time.perf_counter()
        n = make_df().count()
        dt = round(time.perf_counter() - t0, 3)
        print(json.dumps({
            "case": name, "rows_out": n, "sec": dt, "aqe": aqe,
            "skew_threshold": skew_threshold,
            "loadavg_1m": round(os.getloadavg()[0], 2),
        }), flush=True)
        return n

    a = timed("plain_smj_aqe_off", lambda: fact().join(dim(), "k"), aqe=False)
    # default thresholds (256MB): whether the split fires depends on the
    # COMPRESSED hot-partition size — at these row counts it may not
    b = timed("plain_smj_aqe_default", lambda: fact().join(dim(), "k"), aqe=True)
    # thresholds tuned so the split definitely fires (the operator of a
    # known-skew pipeline would set these — or salt statically, below)
    b2 = timed(
        "plain_smj_aqe_tuned",
        lambda: fact().join(dim(), "k"),
        aqe=True,
        skew_threshold="32MB",
    )
    c = timed(
        f"salted_join_{n_salts}_aqe_off",
        lambda: salted_join(
            fact(), dim(), on="k", salt_source="row_id", n_salts=n_salts
        ),
        aqe=False,
    )
    assert a == b == b2 == c, (a, b, b2, c)


if __name__ == "__main__":
    main()
