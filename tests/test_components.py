"""Connected-components duplicate-cluster resolution.

Reference implementation: plain union-find in Python — indisputable,
and exactly the semantics large-star/small-star must reproduce.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.operators.components import (
    connected_components,
    dedup_survivors,
)
from haensel_ams_data_engineer_challenge_spark.operators.dedup import dedup_minhash_lsh
from haensel_ams_data_engineer_challenge_spark.sources import load_table


def _union_find(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member id
    comp: dict = {}
    for x in list(parent):
        comp.setdefault(find(x), []).append(x)
    return {x: root for root, members in comp.items() for x in members}


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("local_cap", [100_000, 0])
def test_cc_matches_union_find_random(spark, seed, local_cap):
    """Both the adaptive driver-side path (local_cap=100k: these edge
    sets fit) and the distributed star rounds (local_cap=0 forces
    them) must reproduce plain union-find exactly."""
    rng = random.Random(seed)
    n, m = 60, 45  # sparse: mix of clusters, chains, singletons-by-absence
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find(edges)
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    got = {
        r.node: r.component
        for r in connected_components(df, max_local_edges=local_cap).collect()
    }
    assert got == expected


def test_cc_path_graph_log_rounds(spark):
    """P64 (diameter 63) must converge inside the O(log n) budget —
    plain min-label propagation would need ~63 rounds."""
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    rows = connected_components(df, max_rounds=12, max_local_edges=0).collect()
    assert len(rows) == 64
    assert all(r.component == 0 for r in rows)


def test_cc_duplicate_and_reversed_pairs(spark):
    """Edge list hygiene: self-loops dropped, duplicates and reversed
    duplicates collapse to one edge."""
    edges = [(1, 2), (2, 1), (1, 2), (3, 3), (2, 3)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_survivors_min_id_policy(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a: long, id_b: long")
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in (1, 2, 3, 10, 11, 99)], "doc_id: long, text: string"
    )
    out = dedup_survivors(docs, pairs).collect()
    flags = {r.doc_id: (r.component, r.is_survivor) for r in out}
    assert flags == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        10: (10, True),
        11: (10, False),
        99: (99, True),  # singleton: own component, survives
    }


def test_survivors_order_col_policy(spark):
    """order_col keeps the largest value, id ascending as tie-break."""
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a: long, id_b: long")
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30)], "doc_id: long, n_chars: long"
    )
    out = dedup_survivors(docs, pairs, order_col="n_chars").collect()
    assert {r.doc_id: r.is_survivor for r in out} == {1: False, 2: True, 3: False}


def test_survivors_on_minhash_pairs(spark, sf_dir):
    """End-to-end over the documents table: LSH pairs -> clusters ->
    exactly one survivor per component, every doc labeled."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh(docs)
    out = dedup_survivors(docs, pairs, order_col="n_chars")
    per_comp = (
        out.groupBy("component")
        .agg(
            F.sum(F.col("is_survivor").cast("int")).alias("nsurv"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert per_comp, "documents table produced no components"
    assert all(r.nsurv == 1 for r in per_comp)
    assert sum(r.n for r in per_comp) == docs.count()
    # survivor count == component count: dedup keeps one doc per cluster
    assert out.filter("is_survivor").count() == len(per_comp)


def test_cc_two_actions_per_round(spark, monkeypatch):
    """The convergence check is ONE cached stats aggregation per round
    (plus the eager checkpoint) — the round-2 form ran THREE actions
    per round (checkpoint + count + exceptAll-count, the latter a full
    join of two edge sets).  Asserted structurally (driver-side action
    calls) because AQE fans each action into a variable number of
    scheduler jobs."""
    # patch the concrete class: pyspark.sql.DataFrame is the facade,
    # classic.dataframe.DataFrame overrides the methods we count
    from pyspark.sql.classic.dataframe import DataFrame

    calls = {"first": 0, "ckpt": 0}
    orig_first, orig_ckpt = DataFrame.first, DataFrame.localCheckpoint
    monkeypatch.setattr(
        DataFrame, "first",
        lambda self: (calls.__setitem__("first", calls["first"] + 1),
                      orig_first(self))[1])
    monkeypatch.setattr(
        DataFrame, "localCheckpoint",
        lambda self, eager=True: (calls.__setitem__("ckpt", calls["ckpt"] + 1),
                                  orig_ckpt(self, eager=eager))[1])
    edges = [(i, i + 1) for i in range(15)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    cc = connected_components(df, max_rounds=12, max_local_edges=0)
    rounds = connected_components.last_rounds
    assert 2 <= rounds <= 12
    assert calls["first"] == rounds + 1  # stats: 1 init + 1/round
    assert calls["ckpt"] == rounds + 1   # checkpoint: 1 init + 1/round
    assert {r.node: r.component for r in cc.collect()} == {
        i: 0 for i in range(16)
    }


def test_cc_reliable_checkpoint_dir(spark, ckpt_dir, tmp_path):
    """checkpoint_dir= switches lineage truncation to reliable
    checkpoints (cluster fault-tolerance path); same results.  Uses
    the session-owned ckpt_dir fixture (round-5 advice): the dir is
    session-global, so the test asserts file GROWTH under it rather
    than assuming it was unset before this test ran."""
    import os

    ckpt = ckpt_dir

    def n_files() -> int:
        return sum(len(fs) for _, _, fs in os.walk(ckpt))

    edges = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    before = n_files()
    got = {
        r.node: r.component
        for r in connected_components(
            df, checkpoint_dir=ckpt, max_local_edges=0
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert n_files() > before, "reliable checkpoint dir unused"
    # repeated use with the SAME plain path must not trip the clobber
    # guard: getCheckpointDir() reports a fully-qualified file: URI of
    # the UUID subdir Spark created, and the guard compares
    # scheme-stripped (round-3 advice item)
    again = {
        r.node: r.component
        for r in connected_components(
            df, checkpoint_dir=ckpt, max_local_edges=0
        ).collect()
    }
    assert again == got
    # a DIFFERENT dir still refuses to clobber the session-global setting
    with pytest.raises(ValueError):
        connected_components(
            df, checkpoint_dir=str(tmp_path / "other"), max_local_edges=0
        )
    # separator boundary: a sibling dir that is a string-prefix of the
    # active one (or vice versa) must not be silently accepted
    with pytest.raises(ValueError):
        connected_components(df, checkpoint_dir=ckpt[: -1], max_local_edges=0)


def test_cc_exact_convergence_flag_and_rounds_attr(spark):
    """exact_convergence=True swaps the probabilistic hash-sum triple
    for count + exceptAll (validation/debug path); the returned frame
    carries its own cc_rounds so concurrent callers don't race on the
    function attribute."""
    edges = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    cc = connected_components(df, exact_convergence=True, max_local_edges=0)
    got = {r.node: r.component for r in cc.collect()}
    assert got == {i: 0 for i in range(11)}
    assert cc.cc_rounds == connected_components.last_rounds
    assert cc.cc_rounds >= 2


def test_cc_local_path_reports_zero_rounds(spark):
    """The adaptive small-graph path labels identically and reports
    cc_rounds == 0 (no star rounds ran)."""
    edges = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    cc = connected_components(df)  # 3 edges: well under the local cap
    got = {r.node: r.component for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert cc.cc_rounds == 0 and cc.cc_round_secs == []


@pytest.mark.parametrize("local_cap", [100_000, 0])
def test_cc_empty_edge_list(spark, local_cap):
    """No pairs at all (a clean corpus): both paths return an empty
    labeling and dedup_survivors marks every doc its own survivor."""
    empty = spark.createDataFrame([], "id_a: long, id_b: long")
    assert connected_components(empty, max_local_edges=local_cap).count() == 0
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(5)], "doc_id: long, text: string"
    )
    out = dedup_survivors(docs, empty).collect()
    assert all(r.is_survivor and r.component == r.doc_id for r in out)


def test_cc_default_cap_derived_from_session_budgets(spark):
    """The default max_local_edges is derived from the session's
    broadcast/driver budgets (round-5 advice), not a bare constant:
    broadcast disabled -> distributed rounds even for tiny graphs; a
    tiny threshold scales the cap down proportionally."""
    from haensel_ams_data_engineer_challenge_spark.operators.components import (
        LOCAL_EDGE_BYTES,
        _derived_max_local_edges,
        _parse_byte_conf,
    )

    assert _parse_byte_conf("10MB") == 10 * 1024 * 1024
    assert _parse_byte_conf("10485760b") == 10485760
    assert _parse_byte_conf("-1") == -1
    assert _parse_byte_conf("2g") == 2 << 30
    assert _parse_byte_conf("garbage") == -1

    # engine session (64MB threshold, 1g maxResultSize): the cap sits
    # at the 100k ceiling, so default behavior is unchanged
    assert _derived_max_local_edges(spark) == 100_000

    edges = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    want = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    thr_conf = "spark.sql.autoBroadcastJoinThreshold"
    orig = spark.conf.get(thr_conf)
    spark.conf.set(thr_conf, "-1")
    try:
        # broadcast disabled: the driver shortcut is off by default
        assert _derived_max_local_edges(spark) == 0
        cc = connected_components(df)
        assert {r.node: r.component for r in cc.collect()} == want
        assert cc.cc_rounds >= 1

        # tuned-down threshold: cap scales with the budget
        spark.conf.set(thr_conf, "1k")
        assert _derived_max_local_edges(spark) == 1024 // LOCAL_EDGE_BYTES
        cc2 = connected_components(df)  # 3 edges <= 16: local path
        assert {r.node: r.component for r in cc2.collect()} == want
        assert cc2.cc_rounds == 0
    finally:
        spark.conf.set(thr_conf, orig)
