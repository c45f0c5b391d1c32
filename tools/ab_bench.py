"""Single-run leg of the interleaved A/B bench protocol (BASELINE.md).

Usage: python tools/ab_bench.py <repo_path> <query,query,...>

Imports the engine package FROM <repo_path> (a git worktree pinned at
the commit under test), runs each named registry query best-of-two with
the exact bench.py methodology (noop write for large results, collect
for small), and prints one JSON line {query: best_sec, ...} plus the
1-min loadavg at start/end. One process per leg so JVM/codegen state
never leaks across commits; the caller alternates A,B,A,B,... so host
drift cancels pairwise.
"""

from __future__ import annotations

import json
import os
import sys
import time

#: queries whose results are small enough to collect (mirror bench.py)
SMALL = {"q1_pricing_summary", "agg_channel_report", "report_metrics"}


def main() -> None:
    repo = sys.argv[1]
    names = sys.argv[2].split(",")
    sys.path.insert(0, repo)

    from haensel_ams_data_engineer_challenge_spark.registry import registry
    from haensel_ams_data_engineer_challenge_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-bench")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    load_start = os.getloadavg()[0]
    timings: dict[str, float] = {}
    for name in names:
        fn = reg[name][0]
        best = None
        for _ in range(2):
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            if name in SMALL:
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - start
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 3)
    print(
        json.dumps(
            {
                "repo": repo,
                "queries": timings,
                "load_1m_start": round(load_start, 2),
                "load_1m_end": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
