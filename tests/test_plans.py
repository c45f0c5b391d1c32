"""Physical-plan assertions: guard the properties that make the
engine scale (SURVEY.md §7 M6). A correctness-preserving change that
silently drops a broadcast or adds a shuffle should fail HERE, not in
a 100 TB run.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.attribution import model as M
from haensel_ams_data_engineer_challenge_spark.registry import registry
from haensel_ams_data_engineer_challenge_spark.sources import load_table


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_conversion_filter_reaches_scan(spark, sf_dir):
    """The event_type predicate must be pushed into the parquet scan."""
    df = M.conversions(spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters" in plan
    assert "EqualTo(event_type,purchase)" in plan


def test_column_pruning_reads_only_needed_columns(spark, sf_dir):
    """A 2-column projection must not read the whole events schema."""
    df = M.conversions(spark, sf_dir).select("conv_id", "revenue")
    plan = plan_of(df)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "props" not in read_schema and "user_id" not in read_schema


def test_report_uses_broadcast_joins(spark, sf_dir):
    """Costs/conversions sides of the report join must broadcast —
    shuffling the session fact table on a dim join is the 100 TB
    failure mode."""
    fn, _sql = registry()["agg_channel_report"]
    plan = plan_of(fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q3_broadcasts_customer_dim(spark, sf_dir):
    fn, _sql = registry()["q3_top_orders"]
    plan = plan_of(fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q3_bucketed_arm_is_exchange_free(spark, sf_dir):
    """The co-located arm of q3_top_orders (round-5 verdict #5): with
    both big sides bucketed by orderkey, the fact-fact join AND the
    orderkey-clustered aggregate above it must run without any shuffle
    exchange. Broadcast is disabled so the join cannot degenerate into
    a small-SF BroadcastHashJoin — the pin must hold in the regime
    where both sides are too big to broadcast (the 100 TB case); the
    customer dim keeps its explicit broadcast hint, which is exempt
    from the threshold."""
    from haensel_ams_data_engineer_challenge_spark.registry import q3_bucketed_arm

    # build FIRST (load_table's ensure_engine_confs re-applies the
    # engine broadcast threshold), then disable broadcast, then plan —
    # physical planning is lazy, so it sees the -1
    df = q3_bucketed_arm(spark, sf_dir)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan  # the co-located fact-fact join


def test_q1_single_shuffle(spark, sf_dir):
    """Partial+final hash aggregation: exactly one exchange."""
    fn, _sql = registry()["q1_pricing_summary"]
    plan = plan_of(fn(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_merged_stream_single_user_shuffle(spark, sf_dir):
    """The merged-stream as-of join must shuffle ONCE (on user_id) —
    no join fan-out exchange."""
    df = M.journeys(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_whole_stage_codegen_in_hot_paths(spark, sf_dir):
    """Codegen spans only materialize in the AQE final plan — execute
    first, then inspect."""
    for name in ("q1_pricing_summary", "agg_channel_report", "text_stats"):
        fn, _sql = registry()[name]
        df = fn(spark, sf_dir)
        df.collect()
        # codegen spans print as "*(n) Operator" in the final plan
        assert "*(1)" in plan_of(df), name


def test_no_cartesian_anywhere_in_registry(spark, sf_dir):
    """Nested-loop joins are only legal against a broadcast side (the
    ANN query-vector joins); never a plain cartesian product."""
    for name, (fn, _sql) in registry().items():
        plan = plan_of(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name


def test_embedding_dedup_is_bucket_equijoin_not_theta(spark, sf_dir):
    """The registered near-dup op must generate candidates through the
    (band, bucket) EQUI-join — a BroadcastNestedLoopJoin/theta-join on
    id_a < id_b would be the all-pairs quadratic shape this op exists
    to avoid (round-1 finding)."""
    fn, _sql = registry()["dedup_embedding_cosine"]
    plan = plan_of(fn(spark, sf_dir))
    assert "band" in plan and "bucket" in plan
    joins = [l for l in plan.splitlines() if "Join" in l]
    assert any("band" in l and "bucket" in l for l in joins), joins
    # the only non-equi condition is the id ordering INSIDE the
    # equi-join, never a standalone nested-loop pairing
    assert "CartesianProduct" not in plan


def test_pack_groups_no_global_single_partition_window(spark, sf_dir):
    """Registered packing must window within conv_date partitions —
    a global Window.orderBy puts every journey through one task."""
    fn, _sql = registry()["pack_groups"]
    plan = plan_of(fn(spark, sf_dir))
    # a partition-less global window compiles to Exchange SinglePartition
    # feeding a Sort+Window; partitioned packing must not contain one
    # on the window path (the final single-partition coalesce of tiny
    # results is fine — look for the Window operator's input exchange)
    lines = plan.splitlines()
    for i, l in enumerate(lines):
        if "Window" in l and "windowspecdefinition" in l.lower():
            upstream = "\n".join(lines[i : i + 6])
            assert "SinglePartition" not in upstream, upstream


def test_ihc_redistributed_single_conv_shuffle(spark, sf_dir):
    """All redistribution window sums share the conv_id partitioning —
    one exchange on conv_id (plus the as-of join's user_id shuffle),
    never one exchange per phase."""
    fn, _sql = registry()["ihc_redistributed"]
    plan = plan_of(fn(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning(conv_id") == 1


def test_pack_cumsum_single_exchange(spark):
    """Both cumsum passes (different sort keys) share ONE exchange on
    the packing partition — hashpartitioning(conv_date) satisfies the
    (conv_date, __prov) windows' clustering; only local sorts differ
    (pack.py docstring's measured claim)."""
    from haensel_ams_data_engineer_challenge_spark.operators.pack import pack_cumsum

    sizes = spark.createDataFrame(
        [("d1", str(i), (i * 7) % 30 + 1) for i in range(100)],
        "conv_date string, conv_id string, n_sessions long",
    )
    plan = plan_of(
        pack_cumsum(sizes, max_journeys=10, max_sessions=50,
                    partition_by=["conv_date"])
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


def test_ihc_plus_linear_shares_conv_exchange(spark, sf_dir):
    """The tagged ihc_linear column's windows ride the SAME conv_id
    exchange as the IHC windows — 2 exchanges total (user_id as-of +
    conv_id scoring), unchanged from the plain entry."""
    fn, _sql = registry()["ihc_attribute"]
    plan = plan_of(fn(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning(conv_id") == 1
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_dedup_diamonds_stay_materialized(spark, sf_dir):
    """Exchange reuse does not fire across self-join / multi-consumer
    branches on current Spark, so the dedup-similarity family
    materializes each expensive stream once (non-eager localCheckpoint
    at the narrowest representation).  Guard the executed plans: if a
    refactor drops a checkpoint, the duplicated tokenize/explode
    subtrees reappear here (dedup_verify_candidates had 22 explode
    operators before the sweep)."""
    bounds = {
        # entry -> max Generate operators (explode + posexplode) in the
        # FINAL executed plan (checkpointed subtrees run once, earlier)
        # dedup_minhash_lsh: the full arm's capped band stream is
        # checkpointed (pure self-join over materialized rows, 0);
        # the round-9 index arm's verify stage re-expands the
        # CANDIDATE-ONLY shingle streams per consumer (batch + index
        # side, x inter/sizes) — the dedup_verify_candidates shape:
        # candidate universes are LSH-bounded small, so recompute
        # beats a checkpoint round-trip
        "dedup_minhash_lsh": 4,
        "dedup_verify_candidates": 4,  # ngram a/b/sizes over candidates + pairs tail
        "contamination_check": 2,      # eval-side + bm25 query-term explodes;
                                       # ngram hits + bm25 postings checkpointed
        "dedup_embedding_cosine": 0,   # bucket stream checkpointed
    }
    for name, max_gen in bounds.items():
        fn, _sql = registry()[name]
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        plan = plan_of(df)
        n_gen = plan.count("Generate ")
        assert n_gen <= max_gen, f"{name}: {n_gen} Generate ops (> {max_gen})"


def test_pii_redaction_is_row_local_and_pruned(spark, sf_dir):
    """The redaction work is pure per-row regex; the round-8 blocklist
    flag may only add BROADCAST joins plus one exchange on the tiny
    blocked-id set — never a shuffle or a window over the corpus.  The
    scan must stay pruned to the columns the query needs (a redaction
    pass over 100 TB must not read the metadata columns)."""
    fn, _sql = registry()["pii_redaction"]
    plan = plan_of(fn(spark, sf_dir))
    # corpus-side work stays unshuffled: the only hash exchange allowed
    # is the blocked-id distinct (input = the exploded suffix semi-join
    # survivors, a tiny fraction of the corpus)
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "SortMergeJoin" not in plan  # joins must all broadcast
    assert "windowspecdefinition" not in plan.lower()
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "lang" not in read_schema and "n_chars" not in read_schema


def test_salted_sum_two_phase_shape(spark, sf_dir):
    """The skew-salted sum must keep exactly its two-phase shape: one
    exchange on (key, salt) for the heavy partial aggregate, one on
    the key for the tiny merge — never a single-partition collapse.
    (Asserted on the operator itself: the registry entry unions three
    method arms since round 6, so its plan is the sum of theirs.)"""
    from haensel_ams_data_engineer_challenge_spark.operators.scale import salted_sum
    from haensel_ams_data_engineer_challenge_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = plan_of(salted_sum(ev, "event_type", "value", salt_source="event_id"))
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Exchange SinglePartition" not in plan
    assert "__salt" in plan
    # the three-arm registry entry still must never collapse to a
    # single partition, and both salted arms keep their salt columns
    fn, _sql = registry()["salted_sum_events"]
    entry_plan = plan_of(fn(spark, sf_dir))
    assert "Exchange SinglePartition" not in entry_plan
    assert "__salt" in entry_plan


def test_dedup_family_has_no_windows(spark, sf_dir):
    """Flood caps in the dedup family are groupBy + broadcast
    anti-join, never count-over-window: a window partitioned by the
    band bucket (or shingle) makes the very key the cap exists to kill
    the hottest single-task sort partition BEFORE the filter drops it.
    DESIGN.md names this shape an anti-pattern; pin it here so the cap
    cannot regress to the window form (round-4 verdict #1)."""
    for name in (
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_verify_candidates",
        "dedup_simhash",
        "dedup_substring_anchors",
        "contamination_check",
        "dedup_embedding_cosine",
    ):
        fn, _sql = registry()[name]
        plan = plan_of(fn(spark, sf_dir))
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        # contamination_check's bm25 arm legitimately windows for its
        # two-stage TopK — but ONLY partitioned by query_id(, __pid),
        # the bounded per-query rank (ann_topk_brute's accepted shape).
        # No window in the family may ever partition by a data-derived
        # hot key (band, band_key, shingle, anchor).
        allowed = [s for s in specs if s.startswith("query_id")]
        assert len(specs) == len(allowed), (name, specs)
        if name != "contamination_check":
            assert not specs, (name, specs)
