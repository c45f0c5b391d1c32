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

from ..operators.dedup import (
    BLOOM_K,
    BLOOM_M_BITS,
    bloom_bitmap,
    dedup_exact,
    incremental_new_docs,
    normalize_text,
)
from ..operators.sinks import insert_if_absent

#: AnalysisException conditions meaning "no data here yet" — the only
#: ones the sink/state probes may tolerate (round-7 advice #3).
_MISSING = {"PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"}


def dedup_batch_within(batch: DataFrame) -> DataFrame:
    """Keep one doc per distinct normalized text WITHIN a batch
    (min doc_id — dedup_exact's keep policy)."""
    keep = dedup_exact(batch).select(F.col("keep_id").alias("doc_id"))
    return batch.join(keep, "doc_id", "left_semi")


def _try_read(ss: SparkSession, path: str, schema=None) -> DataFrame | None:
    from pyspark.errors import AnalysisException

    try:
        reader = ss.read.schema(schema) if schema is not None else ss.read
        df = reader.parquet(path)
        df.schema
        return df
    except AnalysisException as e:
        if e.getCondition() not in _MISSING:
            raise
        return None


def _bloom_checksum(words: dict[int, int]) -> int:
    """Deterministic (unsalted) 64-bit content mix — python's builtin
    hash() is process-salted and useless across restarts."""
    acc = 0
    for idx, bits in words.items():
        acc ^= ((idx * 1099511628211) ^ bits) & 0xFFFFFFFFFFFFFFFF
    return acc


def _load_bloom_words(
    ss: SparkSession, state_dir: str, m_bits: int, k: int
) -> dict[int, int] | None:
    """Committed persisted bitmap as a driver dict, or None when the
    state is absent or TORN (params missing, or its content checksum
    does not match the bitmap — a crash mid-overwrite must reseed,
    because serving a partial bitmap yields false negatives).  An
    m_bits/k mismatch is a hard error instead — that is caller
    misconfiguration, and reseeding would silently change the fpr.
    The words dict is broadcast-budget class by construction
    (<= m_bits/64 entries — size m_bits to the corpus AND the
    driver/broadcast budget together; past that, partition the
    keyspace)."""
    params = _try_read(ss, f"{state_dir}/params")
    if params is None:
        return None
    got = {r["key"]: r["value"] for r in params.collect()}
    exp = {"m_bits": str(m_bits), "k": str(k)}
    if {k2: got.get(k2) for k2 in exp} != exp:
        raise ValueError(
            f"bloom state at {state_dir} was built with {got}; caller "
            f"expects {exp} — use a different state dir or delete it"
        )
    bm = _try_read(ss, f"{state_dir}/bitmap")
    if bm is None:
        return None
    words = {r["word_idx"]: r["bits"] for r in bm.collect()}
    if got.get("checksum") != str(_bloom_checksum(words)):
        return None  # torn write — reseed from corpus+sink
    return words


def _write_bloom_state(
    ss: SparkSession, state_dir: str, words: dict[int, int],
    m_bits: int, k: int,
) -> None:
    """Bitmap first, then params carrying the bitmap's checksum: a
    crash between the two (or mid-bitmap) leaves params disagreeing
    with the bitmap content, which `_load_bloom_words` treats as torn
    and reseeds — never a silent partial bitmap.

    Single-partition layout via ``parallelize(rows, 1)``, NOT
    ``coalesce(1)``: coalescing a parallelized local relation costs a
    pathological ~3.5 s per write on local[32] (measured — plan
    compile, not data), which at two writes per micro-batch would eat
    the entire bitmap-reuse win."""
    sc = ss.sparkContext
    ss.createDataFrame(
        sc.parallelize(sorted(words.items()), 1),
        "word_idx long, bits long",
    ).write.mode("overwrite").parquet(f"{state_dir}/bitmap")
    ss.createDataFrame(
        sc.parallelize(
            [
                ("m_bits", str(m_bits)),
                ("k", str(k)),
                ("checksum", str(_bloom_checksum(words))),
            ],
            1,
        ),
        "key string, value string",
    ).write.mode("overwrite").parquet(f"{state_dir}/params")


def run_streaming_ingest(
    spark: SparkSession,
    corpus_path: str,
    feed_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    feed_glob: str = "*.parquet",
    max_files_per_trigger: int | None = None,
    drop_gopher_fail: bool = False,
    bloom_state_dir: str | None = None,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    near_dup_index_dir: str | None = None,
    near_dup_threshold: float | None = None,
    quality_model_dir: str | None = None,
    keep_pred: list[str] | None = None,
    semantic_index_dir: str | None = None,
    semantic_threshold: float = 0.9,
    encoder_model_dir: str | None = None,
    lm_model_dir: str | None = None,
    max_xent: float | None = None,
    sink_protocol: str = "swap",
    url_dedup_col: str | None = None,
    url_bloom_state_dir: str | None = None,
    unicode_normalize: bool = True,
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

    ``bloom_state_dir``: PERSIST the Bloom bitmap and OR-merge each
    batch's admitted bits into it (bit_or is associative and
    idempotent, so a replayed batch re-ORs as a no-op) instead of
    rebuilding the bitmap from corpus+sink on EVERY micro-batch —
    at real scale the rebuild is a full corpus aggregation per batch,
    the one O(corpus)-per-batch step in this pipeline (the exact
    verify stays, but touches only the maybe-dup sliver and the
    column-pruned hash).  Crash-ordering: the updated bitmap is
    written BEFORE the sink insert — a crash between the two leaves
    orphan bits, which are only false positives (caught by the exact
    verify); the reverse order could leave admitted docs without bits,
    i.e. false negatives that re-admit duplicates.  First batch (or a
    torn state with no committed manifest) rebuilds from corpus+sink.
    SINGLE WRITER assumed — one streaming query owns a state dir (the
    checkpoint dir already enforces that for the stream itself);
    concurrent writers would race the overwrite like any
    non-transactional parquet state.

    ``near_dup_index_dir``: add the NEAR-dup tier beside the exact
    one (round-9, r8 verdict task 2).  A persisted MinHash band index
    (operators/minhash_index.py, manifest protocol since round 12) is
    built from
    corpus+sink on first use; each batch's exact-tier survivors are
    (a) near-dup-collapsed WITHIN the batch (verify_candidates pairs
    -> dedup_survivors, min-id keep — the batch operators, reused),
    (b) probed against the index + exact-verified (near_dup_probe), and
    (c) the admitted remainder's band rows are APPENDED to the index.
    Crash ordering mirrors the Bloom tier: index append runs BEFORE
    the sink insert, because orphan band rows are only false-positive
    candidates (killed at the probe's verify join — the corpus has no
    text for them), while the reverse order could leave admitted docs
    unindexed, i.e. near-dups that slip in forever after.  The append
    itself is replay-idempotent (anti-join on already-indexed ids).
    ``near_dup_threshold``: exact-Jaccard acceptance (default
    minhash_index.NEAR_DUP_THRESHOLD).

    ``semantic_index_dir``: the SEMANTIC tier (round 9, closing the
    incremental set: exact Bloom / lexical MinHash / semantic) — a
    persisted banded-LSH bucket index over FEATURE-HASHED embeddings
    of the dedup target (hash_embed: no external model), built from
    corpus+sink on first use with the streaming 16x10 layout.  Each
    batch's surviving docs are (a) semantically collapsed WITHIN the
    batch (embedding_dup_pairs_lsh over the batch's hashed vectors +
    min-id survivors), (b) probed against the index with exact-cosine
    verify >= ``semantic_threshold`` (similarity.semantic_dup_probe —
    corpus-side embeddings computed for CANDIDATE docs only, so no
    batch pays an O(corpus) embed), and (c) the admitted remainder's
    bucket rows APPENDED before the sink insert (the same orphan-rows-
    are-only-false-positives crash ordering as the other tiers; the
    probe's candidate semi-join against the text store is what kills
    orphans).  Runs AFTER the lexical tier: it is the loosest signal.

    ``encoder_model_dir`` (round 10): run the semantic tier on the
    MODEL-INFERENCE SEAM (operators/embed.embed_with_model —
    executor-cached encoder artifact) instead of ``hash_embed``.  The
    encoder artifact is built from the current dedup target on first
    use (build-if-absent, the tiers' shared discipline) and its
    IDENTITY (encoder kind + artifact version) is pinned in the
    semantic index's committed params: probing or appending an index
    built under a different encoder — including a REBUILT one, whose
    vector space differs — raises instead of silently mixing spaces.
    This is the paraphrase upgrade: synonym-swapped near-dups that the
    lexical tier and hash_embed both admit are caught here
    (pytest-contrast-proven).

    ``lm_model_dir`` + ``max_xent`` (round 10): the PERPLEXITY gate —
    the CCNet filter proper: score each batch against the persisted
    unigram LM artifact (lm.lm_model_build; feature key pins the
    tokenizer) and keep only documents whose cross-entropy is at most
    ``max_xent`` nats.  Model-unseen tokens score at the artifact's
    unseen-term mass, so OOV gibberish lands at maximum xent and is
    dropped — exactly the tail the filter exists to cut.  Runs BEFORE
    dedup like the other quality gates (a rejected doc must never
    claim an admitted-store slot); zero-token docs are unscorable and
    rejected, the classifier gate's argument verbatim.

    ``quality_model_dir`` + ``keep_pred``: the trained-classifier gate
    (round 9, the FineWeb-Edu/CCNet shape) — score each batch with the
    PERSISTED NB model artifact (classify.nb_model_build; the marker's
    ``feature`` key selects the tokenizer, so the gate can never score
    mismatched tokens) and keep only documents whose predicted class
    is in ``keep_pred``.  Runs BEFORE dedup, like the Gopher gate: a
    rejected doc is rejected forever and must not claim an
    admitted-store slot.  Zero-token documents score as no class and
    are rejected — a document the tokenizer cannot see is not
    classifiable, and admitting it unscored would bypass the gate.

    ``url_dedup_col`` (round 14, r13 verdict task 5): the URL tier —
    the FIRST tier, ahead of every quality gate and content tier: a
    re-crawl of an already-admitted URL (utm/gclid-tagged, case /
    default-port / trailing-slash variants) is rejected on
    ``functions.url.canonical_url`` of the named column before any
    content work happens.  Within-batch keep is min doc_id (the dedup
    tiers' shared rule); rows with no usable URL pass through to the
    content tiers untouched.  The cross-batch probe anti-joins the
    column-pruned canonical-URL projection of corpus+sink; at real
    scale the same Bloom-bitmap state the exact tier uses applies
    verbatim keyed on the canonical URL (documented scale path).

    ``unicode_normalize`` (round 15, r14 verdict #3, default ON): the
    text-seam normalization — NFC, double-encoded-UTF-8 repair and
    invisible-character strip (``functions.unicodenorm.clean_text``)
    applied right after the URL tier and BEFORE every quality gate
    and content tier, so an NFD / zero-width / mojibake re-save of an
    admitted document collides at the EXACT tier instead of slipping
    through as a byte-distinct twin.  One Arrow stage per batch,
    row-local; ASCII corpora pass through bit-unchanged.

    ``url_bloom_state_dir`` (round 14): that scale path, real — a
    persisted Bloom bitmap over the canonical URLs of the dedup
    target, maintained exactly like the text tier's
    (``bloom_state_dir``): seeded from corpus+sink on first batch,
    OR-merged with each batch's ADMITTED urls and flushed BEFORE the
    sink insert (orphan bits are only false positives, killed at the
    exact verify over the maybe-dup sliver — the
    ``incremental_new_keys`` contract).  The per-batch O(corpus) URL
    anti-join becomes a broadcast bitmap probe + a sliver-sized
    verify.  Requires ``url_dedup_col``.  MEASURED guidance
    (tools/url_tier_scale_bench.py, BASELINE.md): the bitmap form
    carries a flat ~2.5 s/batch of state-write + probe floors on
    local[32], while the anti form's per-batch corpus projection scan
    is <0.5 s even at a 320k-URL target — leave the bitmap OFF until
    the target's URL projection costs more than that per batch
    (hundreds of millions of URLs); admissions are identical either
    way (asserted in-bench at every size).
    """
    # round-11 review fix: the lm gate's two halves were validated only
    # in the CLI — API callers passing one without the other got a bare
    # TypeError (float(None)) MID-BATCH instead of an upfront error.
    if (lm_model_dir is None) != (max_xent is None):
        raise ValueError(
            "lm_model_dir and max_xent go together: the perplexity gate "
            "needs both the LM artifact and its cross-entropy ceiling "
            f"(got lm_model_dir={lm_model_dir!r}, max_xent={max_xent!r})"
        )
    # round 11: the admitted store can run on the manifest-committed
    # protocol — each micro-batch's rows become visible to readers
    # ATOMICALLY at one manifest rename, and compaction never leaves a
    # window where the sink path reads empty.  Replay semantics are
    # unchanged (manifest_insert_if_absent anti-joins committed rows).
    if sink_protocol not in ("swap", "manifest"):
        raise ValueError(
            f"sink_protocol must be 'swap' or 'manifest', got {sink_protocol!r}"
        )
    if url_bloom_state_dir is not None and url_dedup_col is None:
        raise ValueError(
            "url_bloom_state_dir needs url_dedup_col: the bitmap is "
            "keyed on the canonical form of that column"
        )
    corpus = spark.read.parquet(corpus_path)
    reader = (
        spark.readStream.schema(corpus.schema)
        .option("pathGlobFilter", feed_glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    feed = reader.parquet(feed_dir)

    # driver-cached bitmap words for the life of THIS query: loaded
    # from disk (or seeded) once, OR-merged in python per batch, and
    # flushed to disk per batch — a restart reloads the last committed
    # flush.  Caching avoids re-reading the state per micro-batch; the
    # python merge replaces a union+groupBy job (the whole dict is
    # broadcast-budget class, see _load_bloom_words).
    bloom_words: dict[int, int] | None = None
    url_bloom_words: dict[int, int] | None = None

    def admit_batch(batch: DataFrame, batch_id: int) -> None:
        nonlocal bloom_words, url_bloom_words
        ss = batch.sparkSession
        existing = corpus
        # probe the sink THROUGH Spark, not os.path: the sink may live
        # on HDFS/S3/ABFS where a driver-local isdir() is always False
        # and would silently exclude admitted docs from the dedup
        # target, re-admitting cross-batch duplicates (round-6 advice
        # #1).  A missing/empty sink raises AnalysisException
        # (PATH_NOT_FOUND / UNABLE_TO_INFER_SCHEMA) at read time —
        # exactly the "first batch" case; only those conditions are
        # tolerated (round-7 advice #3, `_try_read`).
        if sink_protocol == "manifest":
            from ..operators.manifest_sink import read_manifest_sink

            # committed rows only; pre-adoption (first manifest run
            # over a legacy sink) falls back to the plain listing
            sink = read_manifest_sink(ss, sink_path)
            if sink is None:
                sink = _try_read(ss, sink_path, corpus.schema)
        else:
            sink = _try_read(ss, sink_path, corpus.schema)
        if sink is not None:
            existing = existing.unionByName(sink)
        if url_dedup_col is not None:
            from ..functions.url import canonical_url

            # URL tier (round 14): a re-crawl of an already-admitted
            # URL is rejected before ANY content work (quality gates,
            # hashing, decode) — utm/gclid-tagged and case / port /
            # trailing-slash variant re-crawls of the same resource
            # collide on canonical_url.  NULL-url rows pass through.
            batch = batch.withColumn(
                "__cu", canonical_url(url_dedup_col)
            )
            keyed = batch.filter(F.col("__cu").isNotNull())
            survivors = keyed.join(
                keyed.groupBy("__cu").agg(
                    F.min("doc_id").alias("doc_id")
                ),
                ["__cu", "doc_id"],
                "left_semi",
            )
            target_urls = existing.select(
                canonical_url(url_dedup_col).alias("__cu")
            ).filter(F.col("__cu").isNotNull())
            if url_bloom_state_dir is not None:
                from ..operators.dedup import incremental_new_keys

                # the scale path (docstring): persisted bitmap probe +
                # exact verify over the maybe-dup sliver only
                if url_bloom_words is None:
                    url_bloom_words = _load_bloom_words(
                        ss, url_bloom_state_dir, m_bits, k
                    )
                if url_bloom_words is None:
                    url_bloom_words = {
                        r["word_idx"]: r["bits"]
                        for r in bloom_bitmap(
                            target_urls, "__cu", m_bits, k
                        ).collect()
                    }
                url_bitmap = ss.createDataFrame(
                    sorted(url_bloom_words.items()),
                    "word_idx long, bits long",
                )
                new_url_ids = incremental_new_keys(
                    survivors.select("doc_id", "__cu"), target_urls,
                    "__cu", m_bits=m_bits, k=k, bitmap=url_bitmap,
                    verify_short_circuit=True,
                ).select("doc_id")
                survivors = survivors.join(
                    new_url_ids, "doc_id", "left_semi"
                )
            else:
                survivors = survivors.join(target_urls, "__cu", "left_anti")
            from ..checkpoint import materialize

            # EITHER form's tier subtree (anti-join against the
            # corpus-sized URL projection, or the bitmap probe's
            # join+groupBy+semi) would otherwise re-execute inside
            # EVERY downstream action of this micro-batch (gates,
            # content tiers, bitmap flushes, the sink insert all
            # re-run the batch plan) — measured 4x drain inflation on
            # the bloom form and a per-action corpus re-scan on the
            # anti form without this cut
            batch = materialize(
                survivors
                .unionByName(batch.filter(F.col("__cu").isNull()))
                .drop("__cu")
            )
        if unicode_normalize:
            from ..functions.unicodenorm import normalize_docs

            # round 15 (r14 verdict #3): NFC + mojibake repair +
            # invisible strip BEFORE every quality gate and content
            # tier, so an NFD/zero-width/double-encoded re-save of an
            # admitted document collides at the EXACT tier.  After the
            # URL tier (URL rejects need no text work), one Arrow
            # stage, row-local.
            batch = normalize_docs(batch)
        if drop_gopher_fail:
            from ..functions.text import gopher_quality_pass

            batch = batch.filter(gopher_quality_pass("text"))
        if lm_model_dir is not None:
            from ..operators.lm import lm_score_model
            from ..operators.similarity import _read_index_params

            lm_params = _read_index_params(ss, lm_model_dir)
            if not lm_params:
                raise ValueError(
                    f"no committed LM artifact at {lm_model_dir}; "
                    "train one first (lm.lm_model_build / corpus "
                    "--save-lm-model)"
                )
            lm_terms = ss.read.parquet(f"{lm_model_dir}/terms")
            lm_stats = ss.read.parquet(f"{lm_model_dir}/stats")
            keep_lm = (
                lm_score_model(batch, lm_terms, lm_stats)
                .filter(F.col("lm_xent") <= float(max_xent))
                .select("doc_id")
            )
            batch = batch.join(keep_lm, "doc_id", "left_semi")
        if quality_model_dir is not None:
            from ..operators.classify import nb_classify_model
            from ..operators.similarity import _read_index_params

            params = _read_index_params(ss, quality_model_dir)
            if not params:
                raise ValueError(
                    f"no committed NB model at {quality_model_dir}; "
                    "train one first (classify CLI / nb_model_build)"
                )
            feature = params.get("feature", "search_tokens")
            terms = ss.read.parquet(f"{quality_model_dir}/terms")
            classes = ss.read.parquet(f"{quality_model_dir}/classes")
            to_score, tokens_col = batch, None
            if feature.startswith("char_trigram"):
                from ..operators.classify import char_ngram_tokens_col

                to_score = char_ngram_tokens_col(
                    batch, max_chars=int(feature.rsplit("_", 1)[1])
                )
                tokens_col = "__cg"
            keep_ids = (
                nb_classify_model(
                    to_score, terms, classes, tokens_col=tokens_col
                )
                .filter(F.col("nb_pred").isin(list(keep_pred or [])))
                .select("doc_id")
            )
            batch = batch.join(keep_ids, "doc_id", "left_semi")
        once = dedup_batch_within(batch)
        bitmap = None
        if bloom_state_dir is not None:
            if bloom_words is None:
                bloom_words = _load_bloom_words(
                    ss, bloom_state_dir, m_bits, k
                )
            if bloom_words is None:
                # first batch ever / torn state: seed from the full
                # dedup target once; later batches OR-merge deltas
                bloom_words = {
                    r["word_idx"]: r["bits"]
                    for r in bloom_bitmap(
                        existing.select(
                            F.md5(normalize_text("text")).alias("text_hash")
                        ),
                        "text_hash", m_bits, k,
                    ).collect()
                }
            bitmap = ss.createDataFrame(
                sorted(bloom_words.items()), "word_idx long, bits long"
            )
        new_ids = incremental_new_docs(
            once, existing, m_bits=m_bits, k=k, bitmap=bitmap
        ).select("doc_id")
        admitted = once.join(new_ids, "doc_id", "left_semi")
        if near_dup_index_dir is not None:
            from ..checkpoint import materialize
            from ..operators.components import dedup_survivors
            from ..operators.dedup import verify_candidates
            from ..operators.minhash_index import (
                NEAR_DUP_THRESHOLD,
                minhash_index_append,
                minhash_index_build,
                near_dup_probe,
            )

            thr = (
                near_dup_threshold
                if near_dup_threshold is not None
                else NEAR_DUP_THRESHOLD
            )
            # build-if-absent from the full current dedup target; every
            # later batch just reads the committed artifact
            index_bands = minhash_index_build(existing, near_dup_index_dir)
            # the exact-tier survivors feed the within-batch pair
            # search, the survivor filter, the probe AND the append —
            # materialize the batch-bounded set once
            admitted = materialize(admitted)
            # (a) within-batch near-dup collapse: the exact tier only
            # collapses byte-identical text; this reuses the batch
            # operators (one codepath — the journeys.py discipline)
            pairs = verify_candidates(admitted, threshold=thr)
            keep = (
                dedup_survivors(admitted.select("doc_id"), pairs)
                .filter("is_survivor")
                .select("doc_id")
            )
            admitted = admitted.join(keep, "doc_id", "left_semi")
            # (b) cross-corpus probe: persisted buckets + exact verify
            dups = near_dup_probe(
                admitted, index_bands, existing, threshold=thr
            )
            admitted = materialize(
                admitted.join(
                    dups.select("doc_id").distinct(), "doc_id", "left_anti"
                )
            )
            # (c) index append BEFORE the sink insert (crash ordering:
            # orphan band rows are only false-positive candidates;
            # unindexed admitted docs would be permanent blind spots)
            minhash_index_append(admitted, near_dup_index_dir)
        if semantic_index_dir is not None:
            from ..checkpoint import materialize
            from ..operators.components import dedup_survivors
            from ..operators.similarity import (
                MAX_VECTOR_BUCKET,
                embedding_dup_pairs_lsh,
                hash_embed,
                lsh_index_append,
                lsh_index_persistent,
                semantic_dup_probe,
            )
            from .vectors import VECTOR_DEDUP_BANDS, VECTOR_DEDUP_PLANES

            if encoder_model_dir is not None:
                from ..operators.embed import (
                    embed_with_model,
                    encoder_model_ensure,
                )
                from ..operators.similarity import _read_index_params

                # encoder artifact build-if-absent from the current
                # dedup target (the tiers' shared discipline); its
                # identity rides into the index marker below so two
                # vector spaces can never mix in one bucket store
                encoder_model_ensure(existing, encoder_model_dir)
                enc = _read_index_params(ss, encoder_model_dir)
                embedder = {
                    "embedder":
                        f"{enc['encoder']}@v{enc.get('version', '1')}"
                }

                def embed(d):
                    return embed_with_model(d, encoder_model_dir)

                # the artifact's dim sizes the hyperplane family: a
                # non-64-dim imported encoder under the 64-dim default
                # collapses every bucket to 0 and the banded joins go
                # quadratic (round-12 fix; the exact-cosine verify
                # hides it from correctness checks)
                enc_dim = int(enc.get("dim", 64))
            else:
                embedder = {"embedder": "hash_embed"}
                embed = hash_embed
                enc_dim = 64
            # one-time migration (review fix): pre-round-10 semantic
            # indexes carry no embedder key — they were hash_embed by
            # construction, so backfill the marker instead of failing
            # every legacy drain.  A legacy index under a MODEL run
            # still mismatches after the backfill (correct: it holds
            # hash-space buckets).
            from ..operators.similarity import (
                _read_index_params,
                _write_index_params,
            )

            got = _read_index_params(ss, semantic_index_dir)
            if got and "embedder" not in got:
                _write_index_params(
                    ss, semantic_index_dir,
                    {**got, "embedder": "hash_embed"},
                )
            # build-if-absent over the current dedup target (one-time
            # O(corpus) embed); later batches read the committed
            # artifact and append batch-bounded bucket rows
            sbuckets = lsh_index_persistent(
                embed(existing),
                semantic_index_dir,
                tables=VECTOR_DEDUP_BANDS,
                planes_per_table=VECTOR_DEDUP_PLANES,
                extra_params=embedder,
                dim=enc_dim,
            )
            admitted = materialize(admitted)
            # (a) within-batch semantic collapse over the batch's
            # vectors (batch-bounded; flood cap because text-derived
            # vectors are correlated)
            bvecs = materialize(embed(admitted))
            spairs = embedding_dup_pairs_lsh(
                bvecs, semantic_threshold,
                VECTOR_DEDUP_BANDS, VECTOR_DEDUP_PLANES,
                max_bucket=MAX_VECTOR_BUCKET,
                dim=enc_dim,
            )
            skeep = (
                dedup_survivors(
                    bvecs.select(F.col("vec_id").alias("doc_id")),
                    spairs,
                )
                .filter("is_survivor")
                .select("doc_id")
            )
            # docs with no tokens have no vector: they pass this tier
            # untouched (the exact tier already byte-deduped them)
            tokenless = admitted.join(
                bvecs.select(F.col("vec_id").alias("doc_id")),
                "doc_id", "left_anti",
            ).select("doc_id")
            admitted = admitted.join(
                skeep.unionByName(tokenless), "doc_id", "left_semi"
            )
            # (b) cross-corpus probe: persisted buckets + exact cosine
            # over candidate-only corpus embeddings
            sdups = semantic_dup_probe(
                admitted, sbuckets, existing, semantic_threshold,
                VECTOR_DEDUP_BANDS, VECTOR_DEDUP_PLANES,
                embed_fn=embed,
                dim=enc_dim,
            )
            admitted = materialize(
                admitted.join(
                    sdups.select("doc_id").distinct(), "doc_id", "left_anti"
                )
            )
            # (c) index append BEFORE the sink insert (same crash
            # ordering; the probe's text-store semi-join kills orphans)
            lsh_index_append(
                embed(admitted), semantic_index_dir,
                tables=VECTOR_DEDUP_BANDS,
                planes_per_table=VECTOR_DEDUP_PLANES,
                extra_params=embedder,
                dim=enc_dim,
            )
        if bloom_state_dir is not None:
            from ..checkpoint import materialize

            # two consumers (the delta bitmap action + the sink
            # insert) — materialize the batch-bounded admit set once
            # instead of re-running the dedup subtree per action.
            # Skip when a dedup tier already truncated it: a second
            # localCheckpoint of a checkpointed frame is a pure extra
            # caching pass
            if near_dup_index_dir is None and semantic_index_dir is None:
                admitted = materialize(admitted)
            # bitmap flush BEFORE the sink insert (docstring crash-
            # ordering argument): orphan bits are only false positives
            for r in bloom_bitmap(
                admitted.select(
                    F.md5(normalize_text("text")).alias("text_hash")
                ),
                "text_hash", m_bits, k,
            ).collect():
                bloom_words[r["word_idx"]] = (
                    bloom_words.get(r["word_idx"], 0) | r["bits"]
                )
            _write_bloom_state(ss, bloom_state_dir, bloom_words, m_bits, k)
        if url_bloom_state_dir is not None and url_bloom_words is not None:
            from ..checkpoint import materialize
            from ..functions.url import canonical_url

            # the flush action below re-executes the admit subtree
            # otherwise (the text tier's materialize argument)
            if (
                bloom_state_dir is None
                and near_dup_index_dir is None
                and semantic_index_dir is None
            ):
                admitted = materialize(admitted)
            # same crash ordering as the text bitmap: flush BEFORE the
            # sink insert; orphan URL bits are only false positives
            # (the sliver verify anti-joins the REAL target urls)
            for r in bloom_bitmap(
                admitted.select(
                    canonical_url(url_dedup_col).alias("__cu")
                ).filter(F.col("__cu").isNotNull()),
                "__cu", m_bits, k,
            ).collect():
                url_bloom_words[r["word_idx"]] = (
                    url_bloom_words.get(r["word_idx"], 0) | r["bits"]
                )
            _write_bloom_state(
                ss, url_bloom_state_dir, url_bloom_words, m_bits, k
            )
        if sink_protocol == "manifest":
            from ..operators.manifest_sink import manifest_insert_if_absent

            manifest_insert_if_absent(ss, admitted, sink_path, ["doc_id"])
        else:
            insert_if_absent(ss, admitted, sink_path, ["doc_id"])

    (
        feed.writeStream.foreachBatch(admit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
