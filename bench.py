"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is measured end-to-end per query: full plan execution with a
noop-format write for large results (no driver collect bottleneck) and
collect() for small aggregates.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from haensel_ams_data_engineer_challenge_spark.registry import registry
from haensel_ams_data_engineer_challenge_spark.session import get_spark

#: headline set: flagship attribution pipeline + analytic core.
#: name -> small_result (True = collect, False = noop write)
HEADLINE: dict[str, bool] = {
    "q1_pricing_summary": True,
    "q3_top_orders": True,
    "join_broadcast_dims": True,
    "window_topn_orders": False,
    "window_tumbling_hour": False,
    "json_extract_props": True,
    "journey_asof_join": False,
    "ihc_attribute": False,
    "agg_channel_report": True,
    "report_metrics": True,
    "ihc_redistributed": False,
    "dedup_exact": False,
    "dedup_minhash_lsh": False,
    # composed LSH->exact-verify near-dup is the headline path; the
    # standalone quadratic n-gram Jaccard is a pytest-only verifier
    "dedup_verify_candidates": False,
    "dedup_simhash": False,
    # round 6: substring near-dup pairs + span-cut arm (detect + remove)
    "dedup_substring_anchors": False,
    "ann_topk_bruteforce": False,
    "ann_topk_lsh": False,
    "text_stats": False,
    "doc_fingerprint": False,
    "pack_groups": False,
    "q5_region_revenue": True,
    "events_sessionize": False,
    "ann_topk_ivf": False,
    # round 3: LSH pairs -> connected components -> survivors -> split
    # (iterative driver loop included in the measured time)
    "corpus_survivors_split": False,
    # round 3: benchmark decontamination (broadcast eval vocab ->
    # pruned shingle equi-join -> flood cap)
    "contamination_check": False,
    # round 6: three-arm skew entry (salted agg + salted/plain join)
    "salted_sum_events": True,
    # round 6: full multimodal chain (decode/resize/frames/features)
    "multimodal_decode_stub": False,
}


#: BASELINE.md 2x-bar rows (idle band, arm-inclusive).  Round 14
#: (r13 verdict task 1a): entries whose bar sits under ~2 s are floor
#: entries where ONE loaded attempt ruins a min-of-two — they get a
#: third attempt; heavier entries keep best-of-two (their duration
#: already averages transient load out, and a third run of a 5-9 s
#: entry costs more wall than it buys in stability).
BAR_SECONDS: dict[str, float] = {
    "q1_pricing_summary": 1.26,
    "q3_top_orders": 1.36,
    "join_broadcast_dims": 0.44,
    "window_topn_orders": 0.36,
    "window_tumbling_hour": 0.30,
    "json_extract_props": 0.40,
    "journey_asof_join": 1.44,
    "ihc_attribute": 1.05,
    "agg_channel_report": 1.26,
    "report_metrics": 1.23,
    "ihc_redistributed": 1.67,
    "dedup_exact": 1.26,
    "dedup_minhash_lsh": 3.24,
    "dedup_verify_candidates": 2.31,
    "dedup_simhash": 1.60,
    "dedup_substring_anchors": 2.86,
    "ann_topk_bruteforce": 1.58,
    "ann_topk_lsh": 0.97,
    "text_stats": 6.52,
    "doc_fingerprint": 5.13,
    "pack_groups": 1.09,
    "q5_region_revenue": 0.60,
    "events_sessionize": 0.69,
    "ann_topk_ivf": 1.63,
    "corpus_survivors_split": 5.31,
    "contamination_check": 3.84,
    "salted_sum_events": 0.56,
    "multimodal_decode_stub": 4.00,
}

#: bar threshold below which an entry gets the extra attempt.
EXTRA_ATTEMPT_BAR = 2.0


def _sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    # Warm up the JVM + parquet footer caches with a trivial action.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # Host-load telemetry (round-5 verdict #2): the r3/r4/r5 A/B runs
    # proved this shared host swings bench totals ~10-25% with load;
    # recording loadavg makes a drifted round distinguishable from a
    # regressed one without a manual A/B (interpretation rule in
    # BASELINE.md).
    loadavg_start = list(os.getloadavg())
    load_after_query: dict[str, float] = {}

    timings: dict[str, float] = {}
    extras = {name: small for name, small in HEADLINE.items() if name in reg}
    for name, small in extras.items():
        fn = reg[name][0]
        # best of two: single-shot numbers swing with transient machine
        # load; the min is the reproducible figure (codegen caches warm
        # on the second run exactly as they would mid-workload).
        # Sub-2s-bar entries get a THIRD attempt (r13 verdict task 1a):
        # for floor entries a single loaded attempt ruins min-of-two,
        # and the extra run is cheap exactly because they're fast.
        n_attempts = (
            3 if BAR_SECONDS.get(name, EXTRA_ATTEMPT_BAR) < EXTRA_ATTEMPT_BAR
            else 2
        )
        best = None
        for _attempt in range(n_attempts):
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            if small:
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - start
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 3)
        load_after_query[name] = round(os.getloadavg()[0], 2)

    # the number directly comparable to the reference's runtime: the
    # whole pipeline (journeys -> native scoring -> idempotent upsert ->
    # invariant check -> partition-overwrite report -> CSV), cold sinks.
    import shutil
    import tempfile

    from haensel_ams_data_engineer_challenge_spark.plans.pipeline import run_pipeline

    # same best-of-two discipline as the query entries (codegen warms on
    # the second attempt exactly as it would mid-workload); each attempt
    # gets a FRESH work dir so both measure the full cold-sink pipeline.
    # BOTH figures are emitted (round-4 advice): `pipeline_e2e` stays
    # the best-of-two consistent with every other entry (and with
    # BENCH_r04), while the top-level `pipeline_e2e_cold` key is the
    # first attempt — the single-shot number directly comparable to the
    # reference's runtime and to BENCH_r01-r03 — kept OUT of `queries`
    # so the headline total's methodology stays uniform.
    attempts = []
    for _attempt in range(2):
        work = tempfile.mkdtemp(prefix="bench_pipeline_")
        start = time.perf_counter()
        run_pipeline(
            spark, sf_dir, f"{work}/acj", f"{work}/report",
            report_csv_path=f"{work}/csv",
        )
        attempts.append(time.perf_counter() - start)
        shutil.rmtree(work, ignore_errors=True)
    timings["pipeline_e2e"] = round(min(attempts), 3)

    # Per-arm timings (round-6 verdict task 1): method-tagged entries
    # are unions of plan branches carrying a literal `method` column;
    # filtering on one literal folds every other branch away
    # (PruneFilters), so the filtered run times that arm's plan alone.
    # Opt-in via SPARK_GRAFT_ARMS=1 — the driver's per-round run keeps
    # the uniform entry-level methodology (and runtime), while the
    # arm-inclusive BASELINE.md table is recorded from an idle-band
    # run with this flag on.
    arm_timings: dict[str, dict[str, float]] = {}
    if os.environ.get("SPARK_GRAFT_ARMS"):
        from pyspark.sql import functions as F

        for name, small in extras.items():
            df = reg[name][0](spark, sf_dir)
            if "method" not in df.columns:
                continue
            methods = sorted(
                r[0] for r in df.select("method").distinct().collect()
            )
            if len(methods) < 2:
                continue
            per_arm: dict[str, float] = {}
            for m in methods:
                best = None
                for _attempt in range(2):
                    start = time.perf_counter()
                    armed = reg[name][0](spark, sf_dir).filter(
                        F.col("method") == m
                    )
                    if small:
                        armed.collect()
                    else:
                        armed.write.format("noop").mode("overwrite").save()
                    elapsed = time.perf_counter() - start
                    best = elapsed if best is None else min(best, elapsed)
                per_arm[m] = round(best, 3)
            arm_timings[name] = per_arm

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                **({"arms": arm_timings} if arm_timings else {}),
                "pipeline_e2e_cold": round(attempts[0], 3),
                "loadavg": {
                    "start": [round(x, 2) for x in loadavg_start],
                    "end": [round(x, 2) for x in os.getloadavg()],
                    "after_query_1m": load_after_query,
                },
                "sf": _sf_from_dir(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
