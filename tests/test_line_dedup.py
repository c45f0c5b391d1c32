"""Line-level boilerplate removal vs a python reference."""

from __future__ import annotations

from collections import Counter

from haensel_ams_data_engineer_challenge_spark.operators.dedup import (
    remove_duplicate_lines,
)

BOILER = "subscribe to our newsletter today"
SHORT = "-- --"   # repeated but under min_chars: never removed

DOCS = [
    (1, f"{BOILER}\nunique article one body text\n{SHORT}"),
    (2, f"{BOILER}\nanother distinct body of text\n{SHORT}"),
    (3, f"completely standalone document\nno shared lines at all"),
    (4, f"{BOILER}\n{BOILER}\nrepeated banner twice here"),  # both copies cut
]


def _py(docs, min_df=2, min_chars=10):
    df = Counter()
    for _i, t in docs:
        for ln in set(l for l in t.split("\n") if len(l) >= min_chars):
            df[ln] += 1
    dup = {l for l, n in df.items() if n >= min_df}
    out = {}
    for i, t in docs:
        lines = t.split("\n")
        kept = [l for l in lines if not (len(l) >= min_chars and l in dup)]
        removed = len(lines) - len(kept)
        if removed:
            cut = "\n".join(kept)
            out[i] = (len(lines), removed, len(t) - len(cut), cut)
    return out


def test_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_lines_removed"],
                      r["chars_removed"], r["text_cut"])
        for r in remove_duplicate_lines(docs).collect()
    }
    assert got == _py(DOCS)
    assert set(got) == {1, 2, 4}          # doc 3 untouched -> absent
    assert got[4][1] == 2                 # both in-doc copies excised


def test_short_repeated_lines_survive(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    texts = {r["doc_id"]: r["text_cut"]
             for r in remove_duplicate_lines(docs).collect()}
    assert SHORT in texts[1] and SHORT in texts[2]


def test_all_lines_removed_yields_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, BOILER), (2, BOILER)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in remove_duplicate_lines(docs).collect()}
    assert rows[1]["text_cut"] == "" and rows[1]["chars_removed"] == len(BOILER)


def test_partitioning_invariance(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(remove_duplicate_lines(docs.coalesce(1)).collect())
    b = sorted(remove_duplicate_lines(docs.repartition(5)).collect())
    assert a == b


def test_on_real_docs_with_injected_boilerplate(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("shared legal footer applies to every page"),
            F.col("text"),
        ).alias("text"),
    )
    out = remove_duplicate_lines(docs)
    assert out.count() == docs.count()    # every doc loses the footer
    assert out.filter("n_lines_removed < 1").count() == 0
    survivors = out.select("text_cut").collect()
    assert all("shared legal footer" not in r["text_cut"] for r in survivors)
