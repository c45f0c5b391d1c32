"""Skew evidence for J4 (merged-stream as-of) and sessionize.

Synthesizes a hot-user corpus from sf0.1 events — a deterministic
~30% of sessions AND conversions are remapped to one user id — and
measures:

- merged-stream as-of (the registered J4 form) on uniform vs skewed,
  with AQE on and off (windows are NOT covered by AQE skew-join
  splitting, so the merged-stream's bound is the hot partition's
  local sort — this run quantifies it);
- the naive join+window form on the same skewed input (its
  |sessions x later-conversions| fan-out concentrates in the hot
  user — the shape AQE skew-join mitigates but cannot fix);
- sessionize on uniform vs skewed (same per-user window bound).

Usage: python tools/skew_bench.py [sf_dir]
Prints one JSON line per measurement; the summary table lives in
BASELINE.md ("Skew evidence").
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HOT_FRACTION = 0.30
_BUCKETS = 1 << 32


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession, functions as F

    from haensel_ams_data_engineer_challenge_spark.attribution import model as M
    from haensel_ams_data_engineer_challenge_spark.operators.asof import (
        journey_asof_join,
        journey_asof_join_naive,
    )
    from haensel_ams_data_engineer_challenge_spark.operators.sessionize import (
        sessionize,
    )
    from haensel_ams_data_engineer_challenge_spark.sources import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("skew-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    hot_threshold = int(HOT_FRACTION * _BUCKETS)

    def skewed(df, user_col="user_id"):
        """Deterministically remap ~HOT_FRACTION of rows to one user.

        Bucketing hashes the row's unique id (not the user) so the
        hot user absorbs rows from across the timeline.
        """
        key = F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in df.columns]))
        bucket = F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
        return df.withColumn(
            user_col,
            F.when(bucket < hot_threshold, F.lit("hot_user")).otherwise(
                F.col(user_col)
            ),
        )

    def timed(name, make_df, aqe=True):
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        make_df().count()  # warm (plan + shuffle files)
        t0 = time.perf_counter()
        n = make_df().count()
        dt = round(time.perf_counter() - t0, 3)
        print(json.dumps({"case": name, "aqe": aqe, "rows": n, "sec": dt}))
        return dt

    sessions = M.sessions(spark, sf_dir)
    convs = M.conversions(spark, sf_dir)
    sk_sessions = skewed(sessions)
    sk_convs = skewed(convs)
    hot_n = sk_sessions.filter("user_id = 'hot_user'").count()
    total_n = sessions.count()
    print(json.dumps({"case": "hot_share", "hot": hot_n, "total": total_n,
                      "share": round(hot_n / total_n, 3)}))

    timed("asof_stream_uniform", lambda: journey_asof_join(sessions, convs))
    timed("asof_stream_skewed", lambda: journey_asof_join(sk_sessions, sk_convs))
    timed("asof_stream_skewed_noaqe",
          lambda: journey_asof_join(sk_sessions, sk_convs), aqe=False)
    timed("asof_naive_uniform", lambda: journey_asof_join_naive(sessions, convs))
    timed("asof_naive_skewed", lambda: journey_asof_join_naive(sk_sessions, sk_convs))
    timed("asof_naive_skewed_noaqe",
          lambda: journey_asof_join_naive(sk_sessions, sk_convs), aqe=False)

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    timed("sessionize_uniform", lambda: sessionize(events))
    timed("sessionize_skewed", lambda: sessionize(skewed(events)))


if __name__ == "__main__":
    main()
