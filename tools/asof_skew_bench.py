"""As-of hot-user straggler cliff, measured (round 10): one bot user
owning an N-row timeline serializes the merged-stream window through
ONE task — the single skew point AQE cannot split (skew-join splitting
does not apply to window exchanges).  This bench measures the cliff and
the chunked-hybrid remedy (asof.asof_join hot_threshold) at growing N.

Fixture: one hot user with N sessions + N/100 conversions, plus 1000
cold users with 50 sessions + 2 conversions each — the 90%-hot regime.
Equality of the two forms is pytest-pinned
(test_journey_properties.test_asof_hot_hybrid_journey_90pct_hot);
this tool prices them.

Usage: python tools/asof_skew_bench.py [n_hot ...]
Prints one JSON line per (n_hot, form); summary lives in BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [250_000, 1_000_000, 4_000_000]

    from pyspark.sql import functions as F

    from haensel_ams_data_engineer_challenge_spark.operators.asof import (
        journey_asof_join,
    )
    from haensel_ams_data_engineer_challenge_spark.session import get_spark

    spark = get_spark("asof-skew-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def sessions(n_hot: int):
        hot = spark.range(n_hot).select(
            F.concat(F.lit("h"), F.col("id")).alias("session_id"),
            F.lit("hot").alias("user_id"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        )
        cold = spark.range(1000 * 50).select(
            F.concat(F.lit("c"), F.col("id")).alias("session_id"),
            F.concat(F.lit("u"), (F.col("id") % 1000)).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + (F.col("id") / F.lit(1000)).cast("long")
            ).alias("ts"),
        )
        base = hot.unionByName(cold)
        return base.select(
            "session_id", "user_id", "ts",
            F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
            F.date_format("ts", "HH:mm:ss").alias("event_time"),
            F.lit("x").alias("channel_name"),
            F.lit(0).alias("holder_engagement"),
            F.lit(0).alias("closer_engagement"),
            F.lit(0).alias("impression_interaction"),
        )

    def conversions(n_hot: int):
        hot = spark.range(max(1, n_hot // 100)).select(
            F.concat(F.lit("hc"), F.col("id")).alias("conv_id"),
            F.lit("hot").alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + F.col("id") * 100 + 50
            ).alias("conv_ts"),
            F.lit(1.0).alias("revenue"),
        )
        cold = spark.range(1000 * 2).select(
            F.concat(F.lit("cc"), F.col("id")).alias("conv_id"),
            F.concat(F.lit("u"), (F.col("id") % 1000)).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + 20 + (F.col("id") / F.lit(40)).cast("long")
            ).alias("conv_ts"),
            F.lit(1.0).alias("revenue"),
        )
        return hot.unionByName(cold)

    for n_hot in sizes:
        # materialize inputs so the bench prices the JOIN, not range()
        s = sessions(n_hot).localCheckpoint()
        c = conversions(n_hot).localCheckpoint()
        counts = {}
        for form, thr in (("plain", None), ("hybrid", 100_000)):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                n = journey_asof_join(s, c, hot_threshold=thr).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            counts[form] = n
            print(json.dumps({
                "n_hot": n_hot, "form": form, "sec": round(best, 2),
                "rows": n,
            }), flush=True)
        assert counts["plain"] == counts["hybrid"], counts
        s.unpersist()
        c.unpersist()


if __name__ == "__main__":
    main()
