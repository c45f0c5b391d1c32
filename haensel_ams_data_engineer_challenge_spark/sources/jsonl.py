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
- the wire ``id`` is declared STRING — the public dumps (C4, Dolma,
  The Pile) ship string ids/URLs, and a LongType declaration would
  quarantine every such corpus wholesale (round-6 advice); the
  engine's long ``doc_id`` is DERIVED after parsing by hashing the
  raw wire id string UNIFORMLY (xxhash64), missing ids hashing the
  text content — deterministic and order-independent
  (monotonically_increasing_id is partition-order-dependent and
  forbidden here).  Hashing ALL ids — numeric ones included — gives
  ONE collision model (round-7 advice #4): a former cast-through path
  both collapsed distinct wire ids ('42', '042', ' 42' -> 42) and let
  small numeric ids silently collide with hash-derived ids of string
  keys in mixed dumps, neither covered by the birthday bound.
  Collision model: xxhash64 is a full 64-bit hash, so distinct keys
  collide at the birthday bound (~50% at ~5e9 docs); corpora beyond
  that scale should carry a (source, offset) composite key instead;
- lang/source default to sentinel values when absent — downstream
  stratified ops (stratum caps, temperature mixing) need non-NULL
  strata.

Spark's json reader is splittable per line for plain .jsonl; .gz
files are single-split each — shard dumps into many files for scan
parallelism (same layout rule as DESIGN.md's parquet table row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: declared wire schema: the common field names across public dumps.
#: ``id`` is STRING on the wire (dumps ship URLs/UUIDs); the long
#: ``doc_id`` is derived after parsing (module docstring).
JSONL_SCHEMA = StructType([
    StructField("id", StringType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
    StructField("source", StringType(), True),
    # the crawl URL when the dump carries one (C4/Dolma ship "url") —
    # round 14: rides through as ``uri`` so the ingest URL tier
    # (canonical_url dedup ahead of content work) keys on it
    StructField("url", StringType(), True),
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
        # ALL wire ids hash uniformly — numeric, URL, UUID — and
        # missing ids hash the text content: one 64-bit collision
        # model (module docstring, round-7 advice #4).  xxhash64 is
        # order-independent and keeps birthday collisions out to ~5e9
        # distinct keys.
        F.xxhash64(F.coalesce(F.col("id"), F.col("text"))).alias("doc_id"),
        F.col("text"),
        F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
        F.coalesce(F.col("source"), F.lit("jsonl")).alias("source"),
        F.length("text").cast("long").alias("n_chars"),
        # empty-string urls become NULL like warc.py does, so the
        # ingest URL tier (which only passes NULL keys through) never
        # collides every url-less row onto one canonical key
        F.nullif(F.col("url"), F.lit("")).alias("uri"),
    )
    return docs, bad
