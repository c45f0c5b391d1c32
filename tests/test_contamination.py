"""Benchmark decontamination: planted-overlap correctness against an
independent pure-Python reference, flood-control semantics, and the
broadcast-equi-join plan shape."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.operators.contamination import (
    contamination_check,
)


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = re.split(r"\s+", text.strip().lower())
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _py_contamination(train, eval_docs, n=3, min_frac=0.5):
    out = {}
    for eid, etext in eval_docs:
        esh = _py_shingles(etext, n)
        if not esh:
            continue
        for tid, ttext in train:
            shared = len(esh & _py_shingles(ttext, n))
            frac = shared / len(esh)
            if frac >= min_frac:
                out[(tid, eid)] = (shared, frac)
    return out


TRAIN = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "completely unrelated text about spark window functions and shuffles"),
    (3, "the quick brown fox jumps over the lazy dog"),  # near-copy of eval 100
    (4, "short"),
]
EVAL = [
    (100, "the quick brown fox jumps over the lazy dog"),  # planted in 1 and 3
    (101, "nothing here matches any training document at all today"),
    (102, "tiny"),  # < n tokens -> no shingles, no rows
]


def test_contamination_matches_python_reference(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    got = {
        (r.train_id, r.eval_id): (r.n_shared, r.overlap_frac)
        for r in contamination_check(train, ev, min_overlap_frac=0.5).collect()
    }
    expected = _py_contamination(TRAIN, EVAL, min_frac=0.5)
    assert set(got) == set(expected)
    for k, (n_shared, frac) in expected.items():
        assert got[k][0] == n_shared
        assert abs(got[k][1] - frac) < 1e-12
    # the near-copy and the superset doc are both flagged against eval 100
    assert (3, 100) in got and got[(3, 100)][1] == 1.0
    assert (1, 100) in got
    # unrelated eval doc and sub-n eval doc flag nothing
    assert not any(eid in (101, 102) for _tid, eid in got)


def test_contamination_flood_control_drops_stop_grams(spark):
    # one shingle present in every training doc: with a cap of 2 the
    # stop-gram is dropped, so no pair reaches the 1.0 threshold
    train = spark.createDataFrame(
        [(i, f"alpha beta gamma filler{i}") for i in range(5)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(9, "alpha beta gamma")], "doc_id long, text string")
    full = contamination_check(train, ev, min_overlap_frac=0.9)
    assert full.count() == 5  # cap 64: all five docs share the one shingle
    capped = contamination_check(
        train, ev, min_overlap_frac=0.9, max_shingle_train_docs=2
    )
    assert capped.count() == 0


def test_contamination_plan_broadcasts_eval_side(spark):
    """The train side must join the eval vocabulary via broadcast —
    shuffling the full training corpus on a benchmark join is the
    100 TB failure mode."""
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    plan = (
        contamination_check(train, ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_contamination_flood_control_has_no_window(spark):
    """Flood control must be groupBy + broadcast anti-join, never a
    count-over-window on the shingle key — the stop-gram the cap
    exists to kill would be the hottest (single-task) window partition
    before the filter (round-3 verdict item #4)."""
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    plan = (
        contamination_check(train, ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan
    # the over-cap shingle set reaches the anti-join as a broadcast
    assert "LeftAnti, BuildRight" in plan or "BroadcastHashJoin" in plan


def test_contamination_property_random_docs(spark):
    """Random small-vocab docs force shared n-grams; the operator must
    agree with the python reference everywhere (no Hypothesis round-
    trips — one seeded batch keeps the Spark cost to a single run)."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]

    def doc(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    train = [(i, doc(rng.randint(0, 15))) for i in range(25)]
    ev = [(100 + i, doc(rng.randint(0, 10))) for i in range(6)]
    got = {
        (r.train_id, r.eval_id): (r.n_shared, r.overlap_frac)
        for r in contamination_check(
            spark.createDataFrame(train, "doc_id long, text string"),
            spark.createDataFrame(ev, "doc_id long, text string"),
            min_overlap_frac=0.3,
        ).collect()
    }
    expected = _py_contamination(train, ev, min_frac=0.3)
    assert set(got) == set(expected)
    for k, (n_shared, frac) in expected.items():
        assert got[k][0] == n_shared
        assert abs(got[k][1] - frac) < 1e-12
