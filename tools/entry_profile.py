"""Profile a registry entry: wall time + Spark job/stage counts.

Usage: python tools/entry_profile.py <entry> [entry ...]

Runs each entry twice (same best-of-two discipline as bench.py) and
reports, for the SECOND (warm) run: wall seconds, job/stage/task
counts, and the per-job stage/task breakdown in job order — pulled
from the local Spark UI REST API. On stage-count-floor entries
(sf0.1's ~1.5 MB corpus) job/stage count is the cost model, so this is
the feedback loop for fusing actions and shaving diamonds.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from haensel_ams_data_engineer_challenge_spark.registry import registry
from haensel_ams_data_engineer_challenge_spark.session import get_spark


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    ui = spark.sparkContext.uiWebUrl
    app = _api(ui, "/api/v1/applications")[0]["id"]
    base = f"{ui}/api/v1/applications/{app}"

    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    for name in names:
        fn = reg[name][0]
        # warm attempt only is profiled
        for attempt in range(2):
            jobs_before = {j["jobId"] for j in _api(base, "/jobs")}
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - start
        jobs = [j for j in _api(base, "/jobs") if j["jobId"] not in jobs_before]
        n_stages = sum(len(j["stageIds"]) for j in jobs)
        n_tasks = sum(j["numTasks"] for j in jobs)
        print(f"\n=== {name}: {wall:.2f}s warm | jobs={len(jobs)} "
              f"stages={n_stages} tasks={n_tasks}")
        for j in sorted(jobs, key=lambda j: j["jobId"]):
            desc = (j.get("description") or j["name"])[:100]
            print(f"  job {j['jobId']}: stages={len(j['stageIds'])} "
                  f"tasks={j['numTasks']} {desc}")


if __name__ == "__main__":
    main()
