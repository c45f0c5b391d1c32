"""Deterministic sampling/splitting: DuckDB parity + partition
properties + plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.operators import sampling as S
from haensel_ams_data_engineer_challenge_spark.sources import load_table
from tools.paritycheck import compare

FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


def test_hash_split_duckdb_parity(docs, duck):
    sp = S.hash_split(docs, "doc_id", FRACTIONS).select("doc_id", "split").toPandas()
    op = duck.execute(
        f"SELECT doc_id, {S.hash_split_sql('doc_id', FRACTIONS)} FROM documents"
    ).fetchdf()
    assert not compare("hash_split", sp, op)


def test_hash_split_is_partition_and_deterministic(docs):
    """Every row gets exactly one split; the assignment is a pure
    function of the key — unchanged under repartitioning."""
    a = {r.doc_id: r.split for r in S.hash_split(docs, "doc_id", FRACTIONS).collect()}
    b = {
        r.doc_id: r.split
        for r in S.hash_split(docs.repartition(7), "doc_id", FRACTIONS).collect()
    }
    assert a == b
    assert set(a.values()) <= set(FRACTIONS)
    assert len(a) == docs.count()


def test_hash_split_fractions_approx(docs):
    n = docs.count()
    counts = {
        r.split: r["count"]
        for r in S.hash_split(docs, "doc_id", FRACTIONS)
        .groupBy("split")
        .count()
        .collect()
    }
    for name, frac in FRACTIONS.items():
        assert abs(counts.get(name, 0) / n - frac) < 0.06, (name, counts)


def test_hash_split_rejects_bad_fractions(docs):
    with pytest.raises(ValueError):
        S.hash_split(docs, "doc_id", {"a": 0.5, "b": 0.2})


def test_hash_split_no_shuffle(docs):
    """The operator itself adds zero exchanges (the loader's
    repartition is the only one in the plan either way)."""
    base = docs._jdf.queryExecution().executedPlan().toString().count("Exchange")
    plan = S.hash_split(docs, "doc_id", FRACTIONS)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == base


def test_stratum_cap_duckdb_parity(docs, duck):
    sp = (
        S.stratum_cap(docs, ["lang", "source"], 5, "doc_id")
        .select("doc_id", "lang", "source")
        .toPandas()
    )
    op = duck.execute(
        "SELECT doc_id, lang, source FROM ("
        + S.stratum_cap_sql("documents", ["lang", "source"], 5, "doc_id")
        + ")"
    ).fetchdf()
    assert not compare("stratum_cap", sp, op)


def test_stratum_cap_bounds_and_subset(docs):
    capped = S.stratum_cap(docs, ["lang"], 3, "doc_id")
    sizes = capped.groupBy("lang").count().collect()
    assert sizes and all(r["count"] <= 3 for r in sizes)
    # kept rows are a subset of the input
    assert capped.join(docs, "doc_id", "left_anti").count() == 0
    # strata smaller than the cap are kept whole
    small = docs.groupBy("lang").count().filter("count <= 3").count()
    kept_whole = capped.groupBy("lang").count().filter("count <= 3").count()
    assert kept_whole >= small


def test_stratum_cap_independent_of_input_partitioning(docs):
    """The two-stage form consults spark_partition_id in stage 1, but
    the RESULT is a pure function of the data: any per-partition top-n
    prune preserves the global top-n, so repartitioning cannot change
    the kept set."""
    a = sorted(r.doc_id for r in S.stratum_cap(docs, ["lang"], 3, "doc_id").collect())
    b = sorted(
        r.doc_id
        for r in S.stratum_cap(docs.repartition(13), ["lang"], 3, "doc_id").collect()
    )
    assert a == b


def test_stratum_cap_two_stage_no_full_stratum_sort(docs):
    """No task may sort a whole stratum: stage 1 must window on
    (stratum, input-partition), so the only exchange keyed on the bare
    stratum sees <= n x n_partitions pre-pruned rows (the 100 TB
    dominant-language guard — round-3 verdict item #2)."""
    plan = (
        S.stratum_cap(docs, ["lang"], 3, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    windows = [l for l in plan.splitlines() if "windowspecdefinition" in l.lower()]
    assert len(windows) == 2, plan
    # executed plan prints root-first: windows[0] is the final rank,
    # windows[-1] the deepest (stage 1) — which must include __pid
    assert "__pid" in windows[-1], windows
    assert "__pid" not in windows[0], windows


def test_weighted_interleave_weights_and_determinism(docs):
    mix = S.weighted_interleave({"a": (docs, 0.5), "b": (docs, 1.0)}, "doc_id")
    counts = {r.source_name: r["count"] for r in mix.groupBy("source_name").count().collect()}
    n = docs.count()
    assert counts["b"] == n
    assert abs(counts["a"] / n - 0.5) < 0.1
    again = S.weighted_interleave({"a": (docs, 0.5), "b": (docs, 1.0)}, "doc_id")
    assert sorted(
        (r.source_name, r.doc_id) for r in mix.select("source_name", "doc_id").collect()
    ) == sorted(
        (r.source_name, r.doc_id) for r in again.select("source_name", "doc_id").collect()
    )


def test_weighted_mix_filter_matches_interleave(docs):
    """The row-local pre-unioned form and the union-of-tables form
    keep bit-identical row sets (same salts, same integer
    thresholds) — and the row-local form adds zero exchanges."""
    even, odd = docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")
    via_union = S.weighted_interleave(
        {"head": (even, 1.0), "tail": (odd, 0.37)}, "doc_id"
    )
    src = F.when(F.col("doc_id") % 2 == 0, F.lit("head")).otherwise(F.lit("tail"))
    via_filter = S.weighted_mix_filter(
        docs, src, {"head": 1.0, "tail": 0.37}, "doc_id"
    )
    a = sorted(
        (r.source_name, r.doc_id)
        for r in via_union.select("source_name", "doc_id").collect()
    )
    b = sorted(
        (r.source_name, r.doc_id)
        for r in via_filter.select("source_name", "doc_id").collect()
    )
    assert a == b and len(a) > 0
    base = docs._jdf.queryExecution().executedPlan().toString().count("Exchange")
    plan = via_filter._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == base
    with pytest.raises(ValueError):
        S.weighted_mix_filter(docs, src, {"head": 1.2}, "doc_id")
    with pytest.raises(ValueError):
        S.weighted_mix_filter(docs, src, {}, "doc_id")


def test_weighted_mix_filter_unknown_source_raises(docs):
    """A row whose source is not a weights key must fail loudly at
    execution, never silently vanish from the mixture (a case typo in
    weights would otherwise drop a whole corpus)."""
    bad = S.weighted_mix_filter(docs, F.lit("nope"), {"head": 1.0}, "doc_id")
    with pytest.raises(Exception, match="source not in weights"):
        bad.collect()


def test_weighted_mix_filter_weight_one_is_hash_free(docs):
    """weight 1.0 compiles to a constant keep — the dominant
    keep-everything source must not pay a per-row md5."""
    only = S.weighted_mix_filter(docs, F.lit("all"), {"all": 1.0}, "doc_id")
    assert only.count() == docs.count()
    plan = only._jdf.queryExecution().executedPlan().toString()
    assert "md5" not in plan, plan


def test_weighted_interleave_zero_weight_and_validation(docs):
    mix = S.weighted_interleave({"a": (docs, 0.0), "b": (docs, 1.0)}, "doc_id")
    assert mix.filter("source_name = 'a'").count() == 0
    with pytest.raises(ValueError):
        S.weighted_interleave({"a": (docs, 1.5)}, "doc_id")
    with pytest.raises(ValueError):
        S.weighted_interleave({}, "doc_id")


def test_token_budget_cap_matches_reference_and_partitioning(spark):
    """token_budget_cap == the maximal hash-order prefix within budget
    (python reference), bit-stable across input partitionings, and the
    plan never sorts a full stratum (distributed prefix sum)."""
    import hashlib

    from haensel_ams_data_engineer_challenge_spark.operators.sampling import (
        token_budget_cap,
    )

    rows = [("en" if i % 4 else "de", i, (i * 13) % 50 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, w long")
    budget = 800

    def bucket(doc_id):
        return int(hashlib.md5(f"tokcap|{doc_id}".encode()).hexdigest()[:8], 16)

    expected = set()
    for lang in ("en", "de"):
        cum = 0
        for _, doc_id, w in sorted(
            (r for r in rows if r[0] == lang), key=lambda r: (bucket(r[1]), r[1])
        ):
            cum += w
            if cum <= budget:
                expected.add((lang, doc_id))

    got = {
        (r.lang, r.doc_id)
        for r in token_budget_cap(df, ["lang"], budget, "w", "doc_id").collect()
    }
    assert got == expected

    # partitioning invariance: the range boundaries cancel out
    got2 = {
        (r.lang, r.doc_id)
        for r in token_budget_cap(
            df.repartition(7), ["lang"], budget, "w", "doc_id"
        ).collect()
    }
    assert got2 == expected

    # plan shape: the row-stream cumsum window partitions on
    # (stratum, __pid) — bounded by the input partition size — and the
    # only stratum-wide window is the per-partition-totals offset pass
    # ordered by __pid, whose input is at most n_partitions rows per
    # stratum. No window sorts a full raw stratum.
    plan = (
        token_budget_cap(df, ["lang"], budget, "w", "doc_id")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    specs = [
        seg.split(")")[0]
        for seg in plan.split("windowspecdefinition(")[1:]
    ]
    assert specs, "no windows found in plan"
    for spec in specs:
        assert "__pid" in spec, spec  # partitions with __pid or orders by it
    from haensel_ams_data_engineer_challenge_spark.operators.sampling import (
        token_budget_cap_sql,
    )

    # DuckDB twin agrees row-for-row
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (lang VARCHAR, doc_id BIGINT, w BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    oracle = {
        (lang, doc_id)
        for lang, doc_id in con.execute(
            "SELECT lang, doc_id FROM ("
            + token_budget_cap_sql("t", ["lang"], budget, "w", "doc_id")
            + ")"
        ).fetchall()
    }
    assert oracle == expected


def test_temperature_weights_math():
    """p ∝ n^alpha by downsampling: smallest stratum keeps all, keep
    rates follow (n_min/n)^(1-alpha); alpha=1 is natural proportions;
    invalid inputs raise."""
    import math

    w = S.temperature_weights({"en": 400, "de": 100, "fr": 25}, alpha=0.5)
    assert w["fr"] == 1.0
    assert w["de"] == math.sqrt(25 / 100)
    assert w["en"] == math.sqrt(25 / 400)
    # expected kept counts n*w are proportional to n^alpha
    kept = {s: n * w[s] for s, n in {"en": 400, "de": 100, "fr": 25}.items()}
    assert abs(kept["en"] / kept["de"] - math.sqrt(400 / 100)) < 1e-12
    assert S.temperature_weights({"a": 7, "b": 3}, alpha=1.0) == {"a": 1.0, "b": 1.0}
    w2 = S.temperature_weights({"a": 81, "b": 1}, alpha=0.75)
    assert abs(w2["a"] - (1 / 81) ** 0.25) < 1e-12
    for bad in ({}, {"a": 0}):
        with pytest.raises(ValueError):
            S.temperature_weights(bad, alpha=0.5)
    for alpha in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError):
            S.temperature_weights({"a": 1}, alpha=alpha)


def test_temperature_mix_proportions_and_determinism(spark):
    """temperature_mix keeps ~n^alpha per stratum (md5 acceptance is
    uniform), keeps the smallest stratum intact, and the kept row set
    is identical across reruns and input partitionings."""
    rows = [("en", i) for i in range(4000)] + [("de", i + 10_000) for i in range(1000)] + [
        ("fr", i + 20_000) for i in range(250)
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id long")
    out = S.temperature_mix(df, "lang", "doc_id", alpha=0.5)
    kept = {r.lang: r.cnt for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert kept["fr"] == 250  # smallest stratum untouched
    # expected: en 4000*sqrt(250/4000)=1000, de 1000*sqrt(250/1000)=500
    assert abs(kept["en"] - 1000) < 120  # ~3.9 sigma of binomial(4000, .25)
    assert abs(kept["de"] - 500) < 90
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    again = {
        r.doc_id
        for r in S.temperature_mix(df.repartition(13), "lang", "doc_id", alpha=0.5)
        .select("doc_id")
        .collect()
    }
    assert ids == again


def test_temperature_thresholds_match_duckdb_sqrt(spark, duck):
    """The alpha=0.5 integer thresholds derived in Python equal the
    ones DuckDB derives from its own counts — the bit-determinism the
    text_stats temp_hi column's hash check relies on."""
    counts = {
        r[0]: r[1]
        for r in duck.execute("SELECT lang, COUNT(*) FROM documents GROUP BY lang").fetchall()
    }
    thr = S.temperature_thresholds(counts, alpha=0.5)
    sql_thr = {
        r[0]: r[1]
        for r in duck.execute(
            """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
                    m AS (SELECT MIN(n) AS nmin FROM c)
               SELECT lang, CAST(floor(sqrt(CAST(nmin AS DOUBLE)/CAST(n AS DOUBLE))
                                  * 4294967296) AS BIGINT) FROM c, m"""
        ).fetchall()
    }
    assert thr == sql_thr


# ---------------------------------------------------------------------------
# deterministic global training-order shuffle — round 9
# ---------------------------------------------------------------------------


def _gs_df(spark, n=200):
    return spark.range(0, n).withColumnRenamed("id", "doc_id")


def test_global_shuffle_is_a_permutation(spark):
    from haensel_ams_data_engineer_challenge_spark.operators.sampling import (
        global_shuffle,
    )

    out = global_shuffle(_gs_df(spark), n_shards=8, seed="t").collect()
    assert len(out) == 200
    assert {r.doc_id for r in out} == set(range(200))
    by_shard: dict[int, list[int]] = {}
    for r in out:
        assert 0 <= r.shard < 8
        by_shard.setdefault(r.shard, []).append(r.pos)
    # positions within each shard are exactly 1..len (dense, 1-based)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_global_shuffle_partitioning_invariant(spark):
    """The permutation must not depend on the input's physical layout
    — the reproducible-training-order contract."""
    from haensel_ams_data_engineer_challenge_spark.operators.sampling import (
        global_shuffle,
    )

    a = global_shuffle(_gs_df(spark), n_shards=4, seed="x")
    b = global_shuffle(
        _gs_df(spark).repartition(7, "doc_id"), n_shards=4, seed="x"
    )
    ra = {(r.doc_id, r.shard, r.pos) for r in a.collect()}
    rb = {(r.doc_id, r.shard, r.pos) for r in b.collect()}
    assert ra == rb


def test_global_shuffle_seed_changes_order(spark):
    from haensel_ams_data_engineer_challenge_spark.operators.sampling import (
        global_shuffle,
    )

    a = {(r.doc_id, r.shard, r.pos)
         for r in global_shuffle(_gs_df(spark), 4, seed="s1").collect()}
    b = {(r.doc_id, r.shard, r.pos)
         for r in global_shuffle(_gs_df(spark), 4, seed="s2").collect()}
    assert a != b  # 200 docs: collision probability ~0


def test_global_shuffle_looks_shuffled(spark):
    """Sanity: the within-shard order must not be the identity order
    (md5 keys decorrelate position from id)."""
    from haensel_ams_data_engineer_challenge_spark.operators.sampling import (
        global_shuffle,
    )

    rows = [r for r in global_shuffle(_gs_df(spark), 1, seed="t").collect()]
    in_id_order = sorted(rows, key=lambda r: r.doc_id)
    assert [r.pos for r in in_id_order] != list(range(1, 201))


def test_global_shuffle_rejects_bad_shards(spark):
    import pytest as _pytest

    from haensel_ams_data_engineer_challenge_spark.operators.sampling import (
        global_shuffle,
    )

    with _pytest.raises(ValueError):
        global_shuffle(_gs_df(spark), 0)
