"""JSON-Lines document source — the common LLM-corpus wire format.

Web-scale text corpora (C4, The Pile, Dolma, RedPajama dumps) ship as
.jsonl / .jsonl.gz files of one document object per line.  This reader
maps them onto the engine's ``documents`` schema with an explicit
corrupt-record policy — at 100 TB some lines WILL be malformed, and
the default DROPMALFORMED silently shrinks the corpus, so the policy
here is explicit and audited:

- schema is DECLARED, never inferred (inference is a full extra pass
  over 100 TB and is unstable across dumps);
- malformed lines are captured in a ``_corrupt_record`` column
  (PERMISSIVE mode) and split into a quarantine DataFrame the caller
  can count/persist — dropped data is always observable;
- missing ids are derived deterministically from the text content
  (md5 -> bigint) so re-reads of the same dump produce identical ids
  with no order dependence (monotonically_increasing_id is partition-
  order-dependent and forbidden here);
- lang/source default to sentinel values when absent — downstream
  stratified ops (stratum caps, temperature mixing) need non-NULL
  strata.

Spark's json reader is splittable per line for plain .jsonl; .gz
files are single-split each — shard dumps into many files for scan
parallelism (same layout rule as DESIGN.md's parquet table row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: declared wire schema: the common field names across public dumps.
JSONL_SCHEMA = StructType([
    StructField("id", LongType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
    StructField("source", StringType(), True),
    StructField("_corrupt_record", StringType(), True),
])


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read a jsonl dump -> (documents, quarantine).

    ``documents`` carries the engine schema (doc_id, text, lang,
    source, n_chars); ``quarantine`` the raw malformed lines.  Rows
    with a null/empty text are quarantined too (a document with no
    text is malformed for every downstream operator).
    """
    raw = (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # Spark quirk: a PERMISSIVE corrupt row may still populate valid
    # fields; _corrupt_record non-null is the authoritative signal
    bad = raw.filter(
        F.col("_corrupt_record").isNotNull()
        | F.col("text").isNull()
        | (F.length("text") == 0)
    ).select(
        F.coalesce(F.col("_corrupt_record"), F.to_json(F.struct("id", "text")))
        .alias("raw_line")
    )
    good = raw.filter(
        F.col("_corrupt_record").isNull()
        & F.col("text").isNotNull()
        & (F.length("text") > 0)
    )
    docs = good.select(
        F.coalesce(
            F.col("id"),
            # deterministic content-derived id: first 15 hex digits of
            # md5(text) -> bigint (positive, order-independent)
            F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long"),
        ).alias("doc_id"),
        F.col("text"),
        F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
        F.coalesce(F.col("source"), F.lit("jsonl")).alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return docs, bad
