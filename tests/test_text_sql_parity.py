"""The functions/text.py single-parse SQL branch (round 16, guide §5:
batched expression construction) must stay bit-identical to the
Column-API branch — both branches and the DuckDB twins are one
contract.  A string column NAME takes the SQL branch; passing
``F.col(name)`` forces the Column branch, so comparing the two on the
same rows pins the rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.functions import text as T

ROWS = [
    ("plain english the and of to is in text here",),
    ("  Der Hund und die Katze ist nicht ein Tier  ",),
    ("one-word",),
    ("",),
    ("   ",),
    ("a b",),
    ("Punct!?.,;: heavy!!! ... ;;&()[]{}",),
    ("repeat repeat repeat repeat repeat repeat repeat",),
    ("12345 67890 999 mixed42tokens 3.14159",),
    ("el los y que en una es de la et les des un est",),
    ("de le shi bu wo zai you",),
    ("CAPS LOWER MiXeD tabs\tnewlines\nweird  spacing",),
    ("x" * 200 + " " + "y" * 3,),
    ("short",),
    (None,),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "text string")


@pytest.mark.parametrize(
    "fn",
    [
        T.tokens,
        T.token_count,
        T.bpe_ish_count,
        lambda c: T.word_shingles(c, 2),
        lambda c: T.word_shingles(c, 3),
        lambda c: T.char_shingles(c, 4),
        lambda c: T.char_shingles(c, 8),
        lambda c: T.repetition_ratio(c, 3),
        T.punct_ratio,
        T.stopword_ratio,
        T.mean_word_len,
        T.alpha_word_frac,
        lambda c: T.stopword_hits(c, T.GOPHER_STOPWORDS),
        T.gopher_quality_pass,
        T.langid,
    ],
    ids=[
        "tokens", "token_count", "bpe_ish_count", "word_shingles2",
        "word_shingles3", "char_shingles4", "char_shingles8",
        "repetition_ratio", "punct_ratio", "stopword_ratio",
        "mean_word_len", "alpha_word_frac", "stopword_hits",
        "gopher_quality_pass", "langid",
    ],
)
def test_sql_branch_equals_column_branch(docs, fn):
    mism = (
        docs.select(fn("text").alias("a"), fn(F.col("text")).alias("b"))
        .filter("NOT (a <=> b)")
        .count()
    )
    assert mism == 0


def test_langid_scores_branches_agree(docs):
    sql = T.langid_scores("text")
    col = T.langid_scores(F.col("text"))
    assert sorted(sql) == sorted(col)
    for lang in sql:
        mism = (
            docs.select(sql[lang].alias("a"), col[lang].alias("b"))
            .filter("NOT (a <=> b)")
            .count()
        )
        assert mism == 0, lang


def test_non_identifier_name_falls_back(spark):
    # a dotted name must keep F.col's nested-field semantics (the SQL
    # branch only fires for simple identifiers)
    df = spark.createDataFrame(
        [(("some text here",),)], "s struct<text: string>"
    )
    out = df.select(T.token_count("s.text").alias("n")).collect()
    assert out[0]["n"] == 3
