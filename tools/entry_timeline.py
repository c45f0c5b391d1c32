"""Timeline profile of a registry entry: per-job submission/completion
offsets (ms) for the warm run, plus driver-idle gaps (wall spans where
zero jobs are running — pure driver/planning/Python time).

Usage: python tools/entry_timeline.py <entry> [entry ...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from datetime import datetime, timezone
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from haensel_ams_data_engineer_challenge_spark.registry import registry
from haensel_ams_data_engineer_challenge_spark.session import get_spark


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def _ts(s: str) -> float:
    # The UI reports GMT timestamps; %Z parses the suffix but leaves
    # the datetime naive (= local time), which would skew every offset
    # against time.time() on a non-UTC host — pin tzinfo to UTC.
    return (
        datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f%Z")
        .replace(tzinfo=timezone.utc)
        .timestamp()
    )


def main() -> None:
    names = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("timeline")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    ui = spark.sparkContext.uiWebUrl
    app = _api(ui, "/api/v1/applications")[0]["id"]
    base = f"{ui}/api/v1/applications/{app}"

    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    for name in names:
        fn = reg[name][0]
        for _attempt in range(2):
            jobs_before = {j["jobId"] for j in _api(base, "/jobs")}
            t0 = time.perf_counter()
            wall0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
        jobs = [j for j in _api(base, "/jobs") if j["jobId"] not in jobs_before]
        spans = []
        for j in sorted(jobs, key=lambda j: j["jobId"]):
            sub = _ts(j["submissionTime"]) - wall0
            dur = _ts(j["completionTime"]) - _ts(j["submissionTime"])
            spans.append((sub, sub + dur, j))
        print(f"\n=== {name}: {wall:.2f}s warm | jobs={len(jobs)}")
        # busy intervals -> idle gaps
        spans.sort()
        cur = 0.0
        idle = 0.0
        for s, e, _ in spans:
            if s > cur:
                idle += s - cur
            cur = max(cur, e)
        print(f"  driver-idle (no job running): {idle:.2f}s of {wall:.2f}s")
        for s, e, j in spans:
            desc = (j.get("description") or j["name"])[:80]
            print(
                f"  [{s:6.2f} -> {e:6.2f}] ({e - s:5.2f}s) "
                f"job {j['jobId']} stages={len(j['stageIds'])} "
                f"tasks={j['numTasks']} {desc}"
            )


if __name__ == "__main__":
    main()
