"""Property tests for the journey/attribution core (SURVEY.md §5).

These encode the reference's runtime validation contract:
- exclusivity: each session belongs to at most one journey
  (journey_builder.py:92-107);
- strict membership: no journey session at/after its conversion
  (journey_builder.py:84);
- earliest-first: a session is claimed by the EARLIEST qualifying
  conversion of its user (closed form of journey_builder.py:48-52);
- exactly one conversion-flagged session per journey
  (journey_builder.py:288-294);
- ihc in [0,1] (api_utils.py:270-271) and per-conversion sum = 1 ± 1e-3
  (db_utils.check_attribution_sums:227-258).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.attribution import model as M
from haensel_ams_data_engineer_challenge_spark.operators.asof import (
    asof_join,
    journey_asof_join,
    journey_asof_join_naive,
)
from haensel_ams_data_engineer_challenge_spark.operators.ihc import (
    attribution_sum_violations,
    flag_conversion_session,
    ihc_attribute,
)


@pytest.fixture(scope="module")
def journeys(spark, sf_dir):
    df = journey_asof_join(M.sessions(spark, sf_dir), M.conversions(spark, sf_dir))
    df.cache().count()
    yield df
    df.unpersist()


def test_session_exclusivity(journeys):
    dup = journeys.groupBy("session_id").count().filter(F.col("count") > 1)
    assert dup.count() == 0


def test_strict_membership(journeys):
    assert journeys.filter(F.col("ts") >= F.col("conv_ts")).count() == 0


def test_earliest_qualifying_conversion(spark, sf_dir, journeys):
    """Recompute the claimed conversion independently with a plain
    min-aggregate and check it matches the window formulation."""
    s = M.sessions(spark, sf_dir).select("session_id", "user_id", "ts")
    c = M.conversions(spark, sf_dir).select("user_id", "conv_id", "conv_ts")
    expected = (
        s.join(c, "user_id")
        .filter(F.col("ts") < F.col("conv_ts"))
        .groupBy("session_id")
        .agg(F.min(F.struct("conv_ts", "conv_id")).alias("m"))
        .select("session_id", F.col("m.conv_id").alias("conv_id_expected"))
    )
    got = journeys.select("session_id", "conv_id")
    mismatches = got.join(expected, "session_id").filter(
        F.col("conv_id") != F.col("conv_id_expected")
    )
    assert mismatches.count() == 0
    assert got.count() == expected.count()


def test_merged_stream_matches_naive_join_form(spark, sf_dir, journeys):
    """The O(n log n) merged-stream implementation and the generic
    join+window closed form must produce identical journey rows."""
    naive = journey_asof_join_naive(
        M.sessions(spark, sf_dir), M.conversions(spark, sf_dir)
    )
    cols = journeys.columns
    a = {tuple(r) for r in journeys.select(*cols).collect()}
    b = {tuple(r) for r in naive.select(*cols).collect()}
    assert a == b


def test_exactly_one_flag_per_journey(journeys):
    flagged = flag_conversion_session(journeys)
    per_conv = flagged.groupBy("conv_id").agg(F.sum("conversion").alias("nflags"))
    assert per_conv.filter(F.col("nflags") != 1).count() == 0


def test_ihc_range_and_sum(journeys):
    scored = ihc_attribute(journeys)
    out_of_range = scored.filter((F.col("ihc") < 0) | (F.col("ihc") > 1))
    assert out_of_range.count() == 0
    assert attribution_sum_violations(scored).count() == 0


def test_single_session_journey_gets_full_credit(journeys):
    scored = ihc_attribute(journeys)
    singles = (
        scored.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"), F.min("ihc").alias("ihc"))
        .filter(F.col("n") == 1)
    )
    assert singles.filter(F.abs(F.col("ihc") - 1.0) > 1e-9).count() == 0


def test_asof_backward_and_left(spark):
    """Generic asof_join: backward direction + left outer semantics."""
    left = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 3, 10)], "k string, id int, ts int"
    )
    right = spark.createDataFrame(
        [("a", 5), ("a", 15), ("c", 1)], "k string, rts int"
    )
    out = asof_join(
        left, right, by=["k"], left_on="ts", right_on="rts",
        left_key=["id"], direction="backward", how="left",
    ).collect()
    by_id = {r["id"]: r["rts"] for r in out}
    assert by_id == {1: 5, 2: 15, 3: None}


@pytest.mark.parametrize("direction,allow_exact,how", [
    ("forward", False, "inner"),
    ("forward", True, "inner"),
    ("backward", False, "left"),
    ("backward", True, "inner"),
])
def test_generic_asof_stream_matches_join_strategy(spark, direction, allow_exact, how):
    """Both strategies must agree on every (direction, exactness, how)
    combination, including payload NULLs and co-timed rows."""
    left = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("a", 3, 20), ("b", 4, 5), ("c", 5, 7)],
        "k string, id int, ts int",
    )
    right = spark.createDataFrame(
        [("a", 100, 10, 1.0), ("a", 101, 20, None), ("a", 102, 25, 3.0),
         ("b", 103, 5, 4.0), ("d", 104, 1, 5.0)],
        "k string, rid int, rts int, payload double",
    )
    kw = dict(
        by=["k"], left_on="ts", right_on="rts", left_key=["id"],
        direction=direction, allow_exact=allow_exact,
        tie_cols=["rid"], how=how,
    )
    stream = asof_join(left, right, strategy="stream", **kw)
    join = asof_join(left, right, strategy="join", **kw)
    key = lambda r: r["id"]
    s = sorted(({c: r[c] for c in stream.columns} for r in stream.collect()), key=key)
    j = sorted(({c: r[c] for c in stream.columns} for r in join.collect()), key=key)
    assert s == j


def test_asof_hot_user_partition(spark):
    """A pathological hot user (one user owning most of the timeline)
    must still produce exact earliest-following assignments — the
    merged-stream form funnels that user through one sorted partition."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    sessions = [(str(i), "hot", base + timedelta(seconds=i)) for i in range(5000)]
    sessions += [(str(9000 + i), f"u{i}", base + timedelta(seconds=i)) for i in range(50)]
    convs = [(f"c{j}", "hot", base + timedelta(seconds=j * 100), 1.0) for j in range(1, 50)]
    s_df = spark.createDataFrame(
        sessions, "session_id string, user_id string, ts timestamp_ntz"
    ).selectExpr(
        "session_id", "user_id", "ts",
        "date_format(ts,'yyyy-MM-dd') as event_date",
        "date_format(ts,'HH:mm:ss') as event_time",
        "'x' as channel_name", "0 as holder_engagement",
        "0 as closer_engagement", "0 as impression_interaction",
    )
    c_df = spark.createDataFrame(
        convs, "conv_id string, user_id string, conv_ts timestamp_ntz, revenue double"
    )
    got = {r.session_id: r.conv_id for r in journey_asof_join(s_df, c_df).collect()}
    # expected: session at second i -> conversion at the next multiple of 100
    import math

    for i in range(5000):
        nxt = (i // 100) + 1
        expected = f"c{nxt}" if nxt <= 49 else None
        assert got.get(str(i)) == expected, (i, got.get(str(i)), expected)
    assert not any(k.startswith("9") and len(k) == 4 for k in got)  # other users unmatched


@pytest.mark.parametrize("direction,allow_exact,how", [
    ("forward", False, "inner"),
    ("forward", True, "inner"),
    ("backward", False, "left"),
    ("backward", True, "inner"),
])
def test_asof_hot_hybrid_matches_join_strategy(
    spark, direction, allow_exact, how
):
    """Round 10: the chunked hot-key hybrid must be semantically
    invisible on every (direction, exactness, how) combination —
    hot_threshold=2 forces multi-chunk routing for key 'a' (5+ rows)
    while 'b'/'c' stay cold, so both paths and the stitch are live."""
    left = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("a", 3, 20), ("b", 4, 5), ("c", 5, 7)],
        "k string, id int, ts int",
    )
    right = spark.createDataFrame(
        [("a", 100, 10, 1.0), ("a", 101, 20, None), ("a", 102, 25, 3.0),
         ("b", 103, 5, 4.0), ("d", 104, 1, 5.0)],
        "k string, rid int, rts int, payload double",
    )
    kw = dict(
        by=["k"], left_on="ts", right_on="rts", left_key=["id"],
        direction=direction, allow_exact=allow_exact,
        tie_cols=["rid"], how=how,
    )
    hybrid = asof_join(left, right, strategy="stream", hot_threshold=2, **kw)
    join = asof_join(left, right, strategy="join", **kw)
    key = lambda r: r["id"]
    h = sorted(({c: r[c] for c in hybrid.columns} for r in hybrid.collect()), key=key)
    j = sorted(({c: r[c] for c in hybrid.columns} for r in join.collect()), key=key)
    assert h == j


def test_asof_hot_hybrid_journey_90pct_hot(spark):
    """The 90%-hot fixture (one user owns ~99% of the timeline):
    journey assignments under the chunked hybrid are identical to the
    plain single-window stream, row for row — including conversions at
    chunk boundaries, ties, and the cold users."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    sessions = [(str(i), "hot", base + timedelta(seconds=i)) for i in range(5000)]
    sessions += [(str(9000 + i), f"u{i}", base + timedelta(seconds=i)) for i in range(50)]
    convs = [(f"c{j}", "hot", base + timedelta(seconds=j * 100), 1.0) for j in range(1, 50)]
    # a cold user with its own conversion: must route through the
    # unchanged plain path inside the SAME call
    convs += [("ccold", "u7", base + timedelta(seconds=30), 2.0)]
    s_df = spark.createDataFrame(
        sessions, "session_id string, user_id string, ts timestamp_ntz"
    ).selectExpr(
        "session_id", "user_id", "ts",
        "date_format(ts,'yyyy-MM-dd') as event_date",
        "date_format(ts,'HH:mm:ss') as event_time",
        "'x' as channel_name", "0 as holder_engagement",
        "0 as closer_engagement", "0 as impression_interaction",
    )
    c_df = spark.createDataFrame(
        convs, "conv_id string, user_id string, conv_ts timestamp_ntz, revenue double"
    )
    plain = journey_asof_join(s_df, c_df, hot_threshold=None)
    hybrid = journey_asof_join(s_df, c_df, hot_threshold=100)  # ~50 chunks
    key = lambda r: r["session_id"]
    p = sorted(({c: r[c] for c in plain.columns} for r in plain.collect()), key=key)
    h = sorted(({c: r[c] for c in plain.columns} for r in hybrid.collect()), key=key)
    assert p == h
    assert len(p) == 4900 + 1  # hot sessions before c49 + u7's session
