"""Streaming corpus ingestion with incremental exact dedup.

The production shape of corpus growth: new document batches land in a
feed directory; each micro-batch is deduplicated (a) WITHIN itself,
(b) against the static base corpus, and (c) against everything earlier
batches already admitted — then appended idempotently.  (b) and (c)
run through `operators/dedup.incremental_new_docs`, i.e. the
broadcast Bloom-bitmap prefilter + exact anti-join verify, so the
admitted-docs store is probed without ever shuffling the corpus.

foreachBatch deliberately reuses the BATCH operators (the
streaming/journeys.py discipline — one codepath, one set of oracle
tests) and the sink is `insert_if_absent` on doc_id, so replays of a
partially-committed batch after a crash write exactly the missing
remainder: Structured Streaming's at-least-once delivery composes
with the idempotent sink to effectively-once admission.

Cross-batch dedup soundness mirrors the attribution stream's claimed-
sessions pattern (journeys.py): the set of already-admitted texts is
persisted in the SINK, not in driver memory, so a restart — even with
a fresh checkpoint — cannot re-admit a duplicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedup import dedup_exact, incremental_new_docs
from ..operators.sinks import insert_if_absent


def dedup_batch_within(batch: DataFrame) -> DataFrame:
    """Keep one doc per distinct normalized text WITHIN a batch
    (min doc_id — dedup_exact's keep policy)."""
    keep = dedup_exact(batch).select(F.col("keep_id").alias("doc_id"))
    return batch.join(keep, "doc_id", "left_semi")


def run_streaming_ingest(
    spark: SparkSession,
    corpus_path: str,
    feed_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    feed_glob: str = "*.parquet",
    max_files_per_trigger: int | None = None,
    drop_gopher_fail: bool = False,
) -> None:
    """Drain the feed with an availableNow trigger, admitting only
    genuinely-new documents into ``sink_path``.

    ``corpus_path``: the static base corpus (parquet).  The admitted
    store at ``sink_path`` accumulates across batches and runs; both
    are dedup targets for every micro-batch.

    ``drop_gopher_fail``: apply the Gopher quality rules row-locally
    BEFORE dedup (the corpus CLI's gate, at ingestion time) — a
    rejected doc is rejected forever, so the filter must run before
    its text can claim a slot in the admitted store.
    """
    from pyspark.errors import AnalysisException

    corpus = spark.read.parquet(corpus_path)
    reader = (
        spark.readStream.schema(corpus.schema)
        .option("pathGlobFilter", feed_glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    feed = reader.parquet(feed_dir)

    def admit_batch(batch: DataFrame, batch_id: int) -> None:
        ss = batch.sparkSession
        if drop_gopher_fail:
            from ..functions.text import gopher_quality_pass

            batch = batch.filter(gopher_quality_pass("text"))
        existing = corpus
        # probe the sink THROUGH Spark, not os.path: the sink may live
        # on HDFS/S3/ABFS where a driver-local isdir() is always False
        # and would silently exclude admitted docs from the dedup
        # target, re-admitting cross-batch duplicates (round-6 advice
        # #1).  A missing/empty sink raises AnalysisException
        # (PATH_NOT_FOUND / UNABLE_TO_INFER_SCHEMA) at read time —
        # exactly the "first batch" case.  Only THOSE error classes are
        # tolerated (round-7 advice #3): an invalid/inaccessible path
        # or unreadable metadata also surfaces as AnalysisException,
        # and swallowing it would silently exclude admitted docs from
        # the dedup target — re-raise anything else.
        try:
            existing = existing.unionByName(
                ss.read.schema(corpus.schema).parquet(sink_path)
            )
        except AnalysisException as e:
            if e.getCondition() not in {
                "PATH_NOT_FOUND",
                "UNABLE_TO_INFER_SCHEMA",
            }:
                raise
        once = dedup_batch_within(batch)
        new_ids = incremental_new_docs(once, existing).select("doc_id")
        admitted = once.join(new_ids, "doc_id", "left_semi")
        insert_if_absent(ss, admitted, sink_path, ["doc_id"])

    (
        feed.writeStream.foreachBatch(admit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
