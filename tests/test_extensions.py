"""Behavioral tests for the LLM-data-pipeline tier: the oracle gate
proves Spark==DuckDB; these prove the operators do the RIGHT thing
(find the planted near-dups, rank neighbors correctly, pack within
caps...)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.operators import dedup as D
from haensel_ams_data_engineer_challenge_spark.operators import similarity as S
from haensel_ams_data_engineer_challenge_spark.operators.pack import (
    greedy_pack,
    pack_cumsum,
    pack_greedy,
)
from haensel_ams_data_engineer_challenge_spark.sources import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    df.cache().count()
    yield df
    df.unpersist()


def test_minhash_lsh_finds_planted_near_dups(spark, docs):
    """The testdata plants ~0.99-Jaccard pairs; LSH candidates must
    cover every pair the exact verifier confirms at >= 0.8."""
    exact = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    candidates = {(r.id_a, r.id_b) for r in D.dedup_minhash_lsh(docs).collect()}
    assert exact, "testdata should contain planted near-duplicates"
    missed = exact - candidates
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_simhash_near_dups_have_small_hamming(spark, docs):
    """Planted near-dup pairs should land within small Hamming distance
    of each other; random pairs should not, on average."""
    fp = D.simhash32(docs)
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.9).select("id_a", "id_b")
    a = fp.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("fa"))
    b = fp.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("fb"))
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    dup_ham = (
        pairs.join(a, "id_a").join(b, "id_b").agg(F.avg(ham)).first()[0]
    )
    rand_ham = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .limit(2000)
        .agg(F.avg(ham))
        .first()[0]
    )
    assert dup_ham < rand_ham / 2, (dup_ham, rand_ham)


def test_ann_brute_matches_naive_topk(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 3)
    got = S.ann_topk_brute(vecs, queries, k=4).collect()
    # naive recompute driver-side
    import numpy as np

    data = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in vecs.collect()}
    for qid in (0, 1, 2):
        q = data[qid]
        scores = sorted(
            (
                (float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), nid)
                for nid, v in data.items()
                if nid != qid
            ),
            key=lambda t: (-t[0], t[1]),
        )[:4]
        expected = [nid for _, nid in scores]
        mine = [r.neighbor_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == qid]
        assert mine == expected, f"query {qid}: {mine} != {expected}"


def test_ann_lsh_neighbors_share_bucket_and_rank_correctly(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 10)
    out = S.ann_topk_lsh(vecs, queries, k=3)
    # ranks are 1..k without gaps per query, cosine non-increasing
    rows = sorted(out.collect(), key=lambda r: (r.query_id, r.rank))
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_pack_greedy_matches_reference_semantics(spark):
    sizes = [(str(i), (i * 37) % 90 + 1) for i in range(500)]
    expected = greedy_pack(sizes, max_journeys=10, max_sessions=150)
    df = spark.createDataFrame(sizes, "conv_id string, n_sessions long")
    got = sorted(
        pack_greedy(df, max_journeys=10, max_sessions=150).collect(),
        key=lambda r: int(r.conv_id),
    )
    # NB: greedy_pack input order is conv_id-as-int order
    expected_sorted = sorted(expected, key=lambda t: int(t[0]))
    assert [(r.conv_id, r.n_sessions, r.chunk_id) for r in got] != []
    # compare against the python reference applied in the same order
    ordered = sorted(sizes, key=lambda t: int(t[0]))
    expected2 = {t[0]: t[2] for t in greedy_pack(ordered, 10, 150)}
    for r in got:
        assert r.chunk_id == expected2[r.conv_id]


def test_pack_caps_hold(spark):
    sizes = [(str(i), (i * 13) % 40 + 1) for i in range(400)]
    df = spark.createDataFrame(sizes, "conv_id string, n_sessions long")
    for packed in (
        pack_greedy(df, max_journeys=25, max_sessions=300),
        pack_cumsum(df, max_journeys=25, max_sessions=300),
    ):
        per_chunk = (
            packed.groupBy("chunk_id")
            .agg(F.count(F.lit(1)).alias("nj"), F.sum("n_sessions").alias("ns"))
            .collect()
        )
        assert all(r.nj <= 25 for r in per_chunk)


def test_sessionize_gap_semantics(spark):
    from datetime import datetime

    from haensel_ams_data_engineer_challenge_spark.operators.sessionize import (
        sessionize,
    )

    rows = [
        (1, 10, datetime(2024, 1, 1, 10, 0, 0)),
        (2, 10, datetime(2024, 1, 1, 10, 20, 0)),   # 20 min gap -> same session
        (3, 10, datetime(2024, 1, 1, 11, 0, 0)),    # 40 min gap -> new session
        (4, 10, datetime(2024, 1, 1, 11, 30, 0)),   # exactly 30 min -> same (strict >)
        (5, 11, datetime(2024, 1, 1, 10, 0, 0)),    # other user -> own session
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp_ntz")
    got = {r.event_id: r.session_key for r in sessionize(df).collect()}
    assert got == {1: "10-1", 2: "10-1", 3: "10-2", 4: "10-2", 5: "11-1"}


def test_verify_candidates_subset_of_exact(spark, docs):
    from haensel_ams_data_engineer_challenge_spark.operators.dedup import (
        ngram_jaccard_pairs,
        verify_candidates,
    )

    verified = {(r.id_a, r.id_b) for r in verify_candidates(docs, threshold=0.8).collect()}
    exact = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    assert verified, "planted near-dups should survive verification"
    assert verified <= exact  # verification can only keep true pairs


def test_multimodal_decode_deterministic(spark, sf_dir):
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        decode_stub_query,
    )

    a = {r.doc_id: (r.n_bytes, r.format, r.width, r.height) for r in decode_stub_query(spark, sf_dir).collect()}
    b = {r.doc_id: (r.n_bytes, r.format, r.width, r.height) for r in decode_stub_query(spark, sf_dir).collect()}
    assert a == b and len(a) > 0
    assert all(64 <= w < 2048 and 64 <= h < 2048 for (_, _, w, h) in a.values())


def test_multimodal_fused_stub_equals_separate(spark, sf_dir):
    """Round 15 (optimization): the fused one-stage stub-pipeline form
    must be row-identical to the separate decode ⋈ resize ⋈ frames ⋈
    features plan it replaces in the gate — the fusion is a plan
    change only (guide §4: one Arrow chain instead of four)."""
    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        multimodal_pipeline_fused_query,
        multimodal_pipeline_query,
    )

    sep = multimodal_pipeline_query(spark, sf_dir)
    fused = multimodal_pipeline_fused_query(spark, sf_dir)
    assert fused.schema == sep.schema
    rows_sep = sorted(map(tuple, sep.collect()))
    rows_fused = sorted(map(tuple, fused.collect()))
    assert rows_fused == rows_sep and len(rows_fused) > 0


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    """HLL sketches differ across engines, so this is tolerance-tested
    rather than oracle-hashed (see registry comment)."""
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select("user_id").distinct().count()
    approx = ev.agg(F.approx_count_distinct("user_id", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.1


def test_multimodal_resize_frames_features(spark, sf_dir):
    from pyspark.sql import functions as SF

    from haensel_ams_data_engineer_challenge_spark.multimodal.binary import (
        FEATURE_DIM,
        feature_extract,
        frame_sample,
        resize_image_meta,
    )

    docs = load_table(spark, sf_dir, "documents").limit(50).select(
        "doc_id", SF.encode(SF.col("text"), "UTF-8").alias("payload")
    )
    resized = resize_image_meta(docs, max_side=256).collect()
    assert all(max(r.width, r.height) <= 256 and 0 < r.scale <= 1.0 for r in resized)

    frames = frame_sample(docs, n_frames=4)
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in per_doc)
    assert frames.filter(SF.col("frame_offset") < 0).count() == 0

    feats = feature_extract(docs).collect()
    assert all(len(r.features) == FEATURE_DIM for r in feats)
    assert all(0.0 <= v < 1.0 for r in feats for v in r.features)
    # deterministic across runs
    again = {r.doc_id: r.features for r in feature_extract(docs).collect()}
    assert all(again[r.doc_id] == r.features for r in feats)


def test_ann_ivf_cell_locality_and_ranks(spark, sf_dir):
    from haensel_ams_data_engineer_challenge_spark.operators.similarity import (
        IVF_PROBES,
        ann_topk_ivf,
        ivf_kmeans,
    )

    vecs = load_table(spark, sf_dir, "embeddings")
    out = ann_topk_ivf(vecs, vecs.filter(F.col("vec_id") < 10), k=3)
    rows = out.collect()
    assert rows
    # every neighbor comes from its k-means cell's inverted list, and
    # each query touches at most n_probe distinct cells
    assign, _cents = ivf_kmeans(vecs)
    cells = {r.vec_id: r.cell for r in assign.collect()}
    probed_by_q: dict[int, set] = {}
    for r in rows:
        assert cells[r.neighbor_id] == r.cell
        probed_by_q.setdefault(r.query_id, set()).add(r.cell)
    assert all(len(cs) <= IVF_PROBES for cs in probed_by_q.values())
    by_q = {}
    for r in sorted(rows, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(ranks == list(range(1, len(ranks) + 1)) for ranks in by_q.values())


def test_ann_recall_floor_vs_bruteforce(spark):
    """Round-5 verdict #7: the approximate ANN paths are hash-checked
    against their own bucketed twins, which proves correct bucketing
    but not retrieval quality — this pins recall@3 vs exact brute
    force on the sf0.01 embeddings so a parameter change cannot
    silently trash recall while staying hash-green.

    Measured on the round-6 testdata (documented floors leave margin
    for per-round testdata regeneration, ~2.5 sigma of the binomial
    sampling noise at 30 neighbor slots):

    - multi-table LSH (32 tables x 6 planes): recall@3 = 0.83 -> floor 0.65
    - k-means IVF (10 cells, 3 iters, 3 probes): recall@3 = 1.00 -> floor 0.70

    (The pre-round-6 single-bucket/label-cell forms measured 0.03 and
    0.10 on the same protocol — the regression this test exists to
    catch.)
    """
    from haensel_ams_data_engineer_challenge_spark.operators.similarity import (
        ann_topk_ivf,
    )

    sf = "/root/testdata/sf0.01"
    vecs = load_table(spark, sf, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 10)
    k = 3
    exact: dict[int, set] = {}
    for r in S.ann_topk_brute(vecs, queries, k=k).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    n_slots = sum(len(v) for v in exact.values())
    assert n_slots == 10 * k

    lsh = {(r.query_id, r.neighbor_id) for r in S.ann_topk_lsh(vecs, queries, k=k).collect()}
    ivf = {(r.query_id, r.neighbor_id) for r in ann_topk_ivf(vecs, queries, k=k).collect()}
    lsh_recall = sum(1 for q, n in lsh if n in exact.get(q, set())) / n_slots
    ivf_recall = sum(1 for q, n in ivf if n in exact.get(q, set())) / n_slots
    assert lsh_recall >= 0.65, f"LSH recall@3 collapsed: {lsh_recall:.2f}"
    assert ivf_recall >= 0.70, f"IVF recall@3 collapsed: {ivf_recall:.2f}"


# ---------------------------------------------------------------------------
# round 2: bucket cap, banded embedding dedup, partitioned packing
# ---------------------------------------------------------------------------

def test_lsh_bucket_cap_bounds_flooded_corpus(spark):
    """A corpus of identical boilerplate floods one bucket per band;
    the cap must drop those buckets (bounded pair count) while leaving
    a normal corpus's output unchanged."""
    import pandas as pd

    n = 3 * D.MAX_BAND_BUCKET  # well above the cap
    flooded = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [f"d{i}" for i in range(n)],
                "text": ["the same boilerplate text repeated verbatim here"] * n,
            }
        )
    )
    capped = D.dedup_minhash_lsh(flooded).count()
    uncapped = D.dedup_minhash_lsh(flooded, max_bucket_size=None).count()
    assert uncapped == n * (n - 1) // 2  # quadratic blow-up without cap
    assert capped == 0  # flooded buckets dropped entirely

    # sub-cap duplicate groups are untouched by the cap
    small = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [f"s{i}" for i in range(6)],
                "text": ["a perfectly ordinary duplicated sentence"] * 6,
            }
        )
    )
    assert (
        D.dedup_minhash_lsh(small).count()
        == D.dedup_minhash_lsh(small, max_bucket_size=None).count()
        == 15
    )


def test_lsh_bucket_cap_no_change_on_testdata(spark, docs):
    """The registered corpus has no flooded bucket, so the cap must be
    a no-op there (oracle parity then holds trivially)."""
    capped = {(r.id_a, r.id_b) for r in D.dedup_minhash_lsh(docs).collect()}
    uncapped = {
        (r.id_a, r.id_b)
        for r in D.dedup_minhash_lsh(docs, max_bucket_size=None).collect()
    }
    assert capped == uncapped


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings")
    df.cache().count()
    yield df
    df.unpersist()


def test_embedding_dup_lsh_subset_and_recall(spark, vecs):
    """Banded-LSH pairs are exactly the brute pairs that share a band
    bucket (no false positives; recall measured against all-pairs)."""
    brute = {
        (r.id_a, r.id_b): r.cosine
        for r in S.embedding_dup_pairs(vecs, threshold=0.45).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cosine
        for r in S.embedding_dup_pairs_lsh(vecs, threshold=0.45).collect()
    }
    assert set(lsh) <= set(brute)
    for pair, cos in lsh.items():
        assert cos == brute[pair]  # exact cosine, bit-identical
    # the synthetic corpus has only moderate-similarity pairs
    # (cosine 0.45-0.6), where banded recall is theoretically ~0.9;
    # assert a conservative floor so data drift fails loudly
    assert len(lsh) / len(brute) >= 0.5


def test_embedding_dup_lsh_full_recall_on_planted_near_dups(spark):
    """In the regime near-dup dedup targets (cosine >= 0.9) the banded
    scheme must find every planted pair: B=8 bands of r=3 planes give
    per-pair miss probability (1 - p^3)^8 with p = 1 - arccos(c)/pi
    ~= 0.0004 at c = 0.99."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, S.EMBEDDING_DIM))
    rows = []
    for i, v in enumerate(base):
        rows.append((f"v{i}a", (v / np.linalg.norm(v)).tolist()))
        w = v + rng.normal(scale=0.02, size=S.EMBEDDING_DIM)  # ~0.999 cosine
        rows.append((f"v{i}b", (w / np.linalg.norm(w)).tolist()))
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [r[1] for r in rows]})
    )
    found = {
        (r.id_a, r.id_b)
        for r in S.embedding_dup_pairs_lsh(df, threshold=0.9).collect()
    }
    planted = {(f"v{i}a", f"v{i}b") for i in range(40)}
    assert planted <= found


def test_pack_cumsum_strict_journey_cap(spark):
    """ADVICE r01 counterexample: an oversized journey inflating the
    session cumsum must not pull >max_journeys journeys into a chunk
    (J=2, S=10, sizes [20,1,1,1] previously put 3 journeys in one)."""
    import pandas as pd
    from collections import Counter

    df = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["1", "2", "3", "4"],
                      "n_sessions": [20, 1, 1, 1]})
    )
    out = pack_cumsum(df, max_journeys=2, max_sessions=10).collect()
    per_chunk = Counter(r.chunk_id for r in out)
    assert max(per_chunk.values()) <= 2


def test_pack_partitioned_restarts_per_partition(spark):
    """Partition-scoped packing: chunk ids restart within each
    partition value and journeys never cross partitions."""
    import pandas as pd

    rows = [("d1", str(i), 5) for i in range(30)] + [
        ("d2", str(100 + i), 5) for i in range(7)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["day", "conv_id", "n_sessions"])
    )
    for packed in (
        pack_cumsum(df, max_journeys=10, max_sessions=1000, partition_by=["day"]),
        pack_greedy(df, max_journeys=10, max_sessions=1000, partition_by=["day"]),
    ):
        out = packed.collect()
        by_day: dict[str, list] = {}
        for r in out:
            by_day.setdefault(r.day, []).append(r)
        assert sorted(by_day) == ["d1", "d2"]
        assert {r.chunk_id for r in by_day["d1"]} == {0, 1, 2}  # 30 / 10
        assert {r.chunk_id for r in by_day["d2"]} == {0}  # restarts at 0


def test_pack_greedy_typed_partition_columns(spark):
    """Non-string partition columns (date, int tenant) round-trip
    typed through the applyInPandas schema (derived from the input,
    not hardcoded string)."""
    from datetime import date

    from haensel_ams_data_engineer_challenge_spark.operators.pack import pack_greedy

    sizes = spark.createDataFrame(
        [(date(2024, 1, d), 7, str(i), 5) for d in (1, 2) for i in range(4)],
        "d date, tenant int, conv_id string, n_sessions long",
    )
    out = pack_greedy(sizes, max_journeys=3, max_sessions=100,
                      partition_by=["d", "tenant"])
    assert dict(out.dtypes) == {
        "d": "date", "tenant": "int", "conv_id": "string",
        "n_sessions": "bigint", "chunk_id": "bigint",
    }
    rows = out.collect()
    assert len(rows) == 8
    # per-partition restart: each date packs 4 journeys into chunks 0,0,0,1
    for d in (date(2024, 1, 1), date(2024, 1, 2)):
        chunks = sorted(r.chunk_id for r in rows if r.d == d)
        assert chunks == [0, 0, 0, 1]


def test_repetition_ratio_edge_cases(spark):
    """Gopher-style repeated-trigram fraction: 0 for unique text and
    sub-n inputs, high for looping boilerplate."""
    from haensel_ams_data_engineer_challenge_spark.functions.text import (
        repetition_ratio,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),            # all trigrams unique -> 0.0
            (2, "spam ham " * 20),              # loop -> mostly repeats
            (3, "one two"),                     # < 3 tokens -> 0.0
            (4, ""),                            # empty -> 0.0
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.rr
        for r in df.select(
            "doc_id", repetition_ratio("text", 3).alias("rr")
        ).collect()
    }
    assert got[1] == 0.0
    # 40 tokens -> 38 trigrams, only 2 distinct ("spam ham spam",
    # "ham spam ham") -> 1 - 2/38
    assert abs(got[2] - (1.0 - 2.0 / 38.0)) < 1e-12
    assert got[3] == 0.0
    assert got[4] == 0.0


def test_gopher_quality_rules(spark):
    """Gopher document-filter signals (Rae et al. 2021 §A1.1): mean
    word length, alpha-word fraction, and the composite threshold
    flag, each at its published boundary."""
    from haensel_ams_data_engineer_challenge_spark.functions.text import (
        alpha_word_frac,
        gopher_quality_pass,
        mean_word_len,
    )

    passing = "the cat and dog ran " * 10  # 50 words, stopwords, alpha
    too_short = "the cat and dog ran"  # 5 words < 50
    numeric = " ".join(["123"] * 40 + ["the", "a"] + ["456"] * 8)  # alpha 2/50
    long_words = " ".join(["the", "a"] + ["wwwwwwwwwwww"] * 48)  # mean len > 10
    df = spark.createDataFrame(
        [(1, passing), (2, too_short), (3, numeric), (4, long_words), (5, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            mean_word_len("text").alias("mwl"),
            alpha_word_frac("text").alias("awf"),
            gopher_quality_pass("text").alias("ok"),
        ).collect()
    }
    # 50 words x (3+3+3+3+3=15 chars)/5 words = 3.0 mean — boundary passes
    assert abs(got[1].mwl - 3.0) < 1e-12
    assert got[1].awf == 1.0
    assert got[1].ok is True
    assert got[2].ok is False  # word count below 50
    assert abs(got[3].awf - 2.0 / 50.0) < 1e-12
    assert got[3].ok is False  # alpha fraction below 0.8
    assert got[4].ok is False  # mean word length above 10
    assert got[5].mwl == 0.0 and got[5].awf == 0.0 and got[5].ok is False


def test_pii_redaction_matches_duckdb(spark):
    """PII scrub (C4/Dolma-style): typed placeholders for emails,
    IPv4 addresses and phone numbers.  The synthetic corpus contains
    no PII, so there is no driver row — this test IS the oracle: the
    same patterns run through DuckDB's RE2 and must agree with Spark's
    Java regex on every fixture, keeping the documented twin honest."""
    import duckdb

    from haensel_ams_data_engineer_challenge_spark.functions.text import (
        PII_PATTERNS,
        pii_counts,
        redact_pii,
    )

    fixtures = [
        (1, "contact bob.smith+spam@example.co.uk for details"),
        (2, "server at 10.0.255.7 responded; fallback 192.168.1.1"),
        (3, "call +4915123456789 or 555-123-4567 today"),
        (4, "no pii here, just text with numbers 12345 and a dot."),
        (5, "mixed: a@b.io on 8.8.8.8 at 555.867.5309"),
        (6, "version 1.2.3.4 of the lib"),  # dotted quad: redacted by design
        (7, ""),
        # sequential-count divergence case (round-4 advice): the email
        # pattern consumes the dotted quad inside the hostname, so the
        # ipv4 count must be 0 — exactly what redact_pii replaces
        (8, "x@1.2.3.4.com ping"),
    ]
    df = spark.createDataFrame(fixtures, "doc_id long, text string")
    counts = pii_counts("text")
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            redact_pii("text").alias("clean"),
            *[c.alias(f"n_{n}") for n, c in counts.items()],
        ).collect()
    }
    assert got[1].clean == "contact <EMAIL> for details"
    assert got[2].clean == "server at <IP> responded; fallback <IP>"
    assert got[3].clean == "call <PHONE> or <PHONE> today"
    assert got[4].clean == fixtures[3][1]
    assert got[5].clean == "mixed: <EMAIL> on <IP> at <PHONE>"
    assert (got[1].n_email, got[2].n_ipv4, got[3].n_phone) == (1, 2, 2)
    assert got[7].clean == ""
    assert got[8].clean == "<EMAIL> ping"
    assert (got[8].n_email, got[8].n_ipv4) == (1, 0)

    # idempotence over an adversarial generated corpus: placeholders
    # must not re-match any pattern, and nothing matchable survives a
    # first pass (one Spark job for all rows)
    import itertools
    import random

    rng = random.Random(7)
    snippets = [
        "x@y.zz", "a.b-c@d.e.museum", "1.2.3.4", "255.255.255.255",
        "+123456789", "999-999-9999", "12.34", "a@b", "10.0.0", "..@..",
        "word", "3.14159", "v1.2.3.4-rc", "@", ".", "+", "-",
    ]
    adversarial = [
        (100 + i, " ".join(rng.choices(snippets, k=rng.randint(0, 12))))
        for i in range(60)
    ]
    adf = spark.createDataFrame(adversarial, "doc_id long, text string")
    once = adf.select("doc_id", redact_pii("text").alias("t1"))
    twice = once.select(
        "doc_id",
        "t1",
        redact_pii("t1").alias("t2"),
        *[c.alias(f"n_{n}") for n, c in pii_counts("t1").items()],
    ).collect()
    for r in twice:
        assert r.t2 == r.t1, f"redaction not idempotent: {r.t1!r}"
        for n in PII_PATTERNS:
            assert r[f"n_{n}"] == 0, f"residual {n} match in {r.t1!r}"

    con = duckdb.connect()
    for doc_id, text in fixtures:
        # counts are sequential (each on the preceding patterns'
        # output), mirroring pii_counts == what redact_pii replaces
        clean = text
        for name, (pat, repl) in PII_PATTERNS.items():
            n = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [clean, pat]
            ).fetchone()[0]
            assert n == got[doc_id][f"n_{name}"], f"{name} count mismatch doc {doc_id}"
            clean = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [clean, pat, repl]
            ).fetchone()[0]
        assert clean == got[doc_id].clean, f"engine mismatch on doc {doc_id}"


def test_substring_dup_pairs_planted_runs(spark):
    """Exact-substring near-dup detection: docs sharing a long verbatim
    run pair up; unrelated docs don't; a run shared by MORE than
    max_anchor_docs documents is boilerplate and is flood-capped out
    (windowless groupBy + anti-join)."""
    import random

    from haensel_ams_data_engineer_challenge_spark.operators.dedup import (
        substring_dup_pairs,
    )

    rng = random.Random(5)

    def noise(n):
        return "".join(rng.choice("abcdefghij ") for _ in range(n))

    # planted runs must be long enough that 1/16 anchor sampling
    # keeps some of their ~(len-31) distinct grams with near-certainty
    # ((15/16)^370 ~ 5e-11); generated, so the grams are unique
    shared = noise(400)
    boiler = noise(400)
    rows = [
        (1, noise(200) + shared + noise(200)),
        (2, noise(200) + shared + noise(200)),
        (3, noise(400)),  # unrelated
    ]
    # 4..23: twenty docs sharing only the boilerplate run
    rows += [(i, noise(150) + boiler + noise(150)) for i in range(4, 24)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    rows_out = substring_dup_pairs(df, max_anchor_docs=8).collect()
    got = {(r.id_a, r.id_b): r.n_shared for r in rows_out}
    assert (1, 2) in got and got[(1, 2)] >= 1  # planted pair found
    # span columns (round-5 verdict #4): the shared run occupies chars
    # 201..600 in BOTH docs (200-char noise prefixes), and shared
    # anchors are grams fully inside it, so each side's matched span
    # must lie within the planted range — and, prefixes being equal
    # length, the two sides' spans must coincide exactly
    span = next(r for r in rows_out if (r.id_a, r.id_b) == (1, 2))
    assert 201 <= span.a_span_start <= span.a_span_end <= 600
    assert span.a_span_end - span.a_span_start >= 31  # covers >= 1 gram
    assert (span.a_span_start, span.a_span_end) == (
        span.b_span_start, span.b_span_end
    )
    assert all(3 not in pair for pair in got)  # unrelated doc never pairs
    # the boilerplate run shared by 20 > 8 docs is flood-capped: its
    # INTERIOR grams (in all 20 docs) pair nobody. A few pairs may
    # remain via grams straddling the noise/boiler boundary — genuine
    # shared 32-char runs unique to 2-3 docs, which the cap rightly
    # keeps — so assert the cluster stays far below quadratic.
    boiler_ids = set(range(4, 24))
    n_capped = sum(1 for a, b in got if a in boiler_ids and b in boiler_ids)
    assert n_capped < 20, got
    # with the cap lifted the boilerplate cluster explodes into ALL
    # C(20,2) pairs — the quadratic shape the cap exists to prevent
    uncapped = substring_dup_pairs(df, max_anchor_docs=10_000).collect()
    assert sum(
        1 for r in uncapped if r.id_a in boiler_ids and r.id_b in boiler_ids
    ) == 20 * 19 // 2
    # chunked generation is an implementation detail: results (pairs,
    # counts AND spans) must be bit-identical for any chunk size —
    # including one that forces every planted run across many chunk
    # boundaries (chunk=57 on 800-char docs) and the single-chunk case
    def as_set(rows):
        return {tuple(r) for r in rows}

    assert as_set(rows_out) == as_set(
        substring_dup_pairs(df, max_anchor_docs=8, chunk=57).collect()
    )
    assert as_set(rows_out) == as_set(
        substring_dup_pairs(df, max_anchor_docs=8, chunk=100_000).collect()
    )


def test_merge_spans_islands(spark):
    """Interval-island merging: overlapping, nested, adjacent and
    duplicate spans collapse exactly as a Python sweep does."""
    from haensel_ams_data_engineer_challenge_spark.operators.dedup import merge_spans

    cases = {
        1: [(2, 4), (3, 6), (9, 20), (9, 20)],   # overlap + duplicate
        2: [(1, 10), (5, 7)],                     # nested
        3: [(1, 5), (6, 10)],                     # adjacent stays split
        4: [(10, 12)],
    }
    rows = [(d, s, e) for d, sp in cases.items() for s, e in sp]
    got = {}
    out = merge_spans(
        spark.createDataFrame(rows, "doc_id long, span_start long, span_end long")
    ).collect()
    for r in out:
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_end))

    def py_merge(spans):
        merged = []
        for s, e in sorted(set(spans)):
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        return merged

    for d, sp in cases.items():
        assert sorted(got[d]) == py_merge(sp), f"doc {d}"


def test_cut_spans_matches_python_slicing(spark):
    """cut_spans excises merged islands exactly as Python slicing does,
    clamps out-of-range spans, and omits docs with no spans."""
    from haensel_ams_data_engineer_challenge_spark.operators.dedup import cut_spans

    texts = {1: "abcdefghijklmnopqrst", 2: "0123456789", 3: "untouched"}
    spans = {1: [(3, 5), (4, 9), (15, 99)], 2: [(1, 10)]}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    sp = spark.createDataFrame(
        [(d, s, e) for d, v in spans.items() for s, e in v],
        "doc_id long, span_start long, span_end long",
    )
    out = {r.doc_id: r for r in cut_spans(docs, sp).collect()}
    assert set(out) == {1, 2}  # doc 3 untouched -> absent

    def py_cut(text, sp):
        keep = [True] * len(text)
        for s, e in sp:
            for i in range(max(s, 1) - 1, min(e, len(text))):
                keep[i] = False
        return "".join(c for c, k in zip(text, keep) if k)

    for d in (1, 2):
        expect = py_cut(texts[d], spans[d])
        assert out[d].text_cut == expect, f"doc {d}"
        assert out[d].chars_removed == len(texts[d]) - len(expect)
    assert out[1].n_islands == 2  # [3,9] merged + clamped [15,20]
    assert out[2].text_cut == "" and out[2].chars_removed == 10


def test_cut_duplicate_spans_removes_planted_run(spark):
    """The composed detect->cut pipeline: the LATER doc of a planted
    verbatim pair loses the duplicated run (keep-first policy leaves
    the earlier doc intact), and re-running detection on the cut
    corpus finds no pair between them."""
    import random

    from haensel_ams_data_engineer_challenge_spark.operators.dedup import (
        cut_duplicate_spans,
        substring_dup_pairs,
    )

    rng = random.Random(11)

    def noise(n):
        return "".join(rng.choice("abcdefghij ") for _ in range(n))

    shared = noise(400)
    texts = {
        1: noise(200) + shared + noise(200),
        2: noise(200) + shared + noise(200),
        3: noise(400),
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = {r.doc_id: r for r in cut_duplicate_spans(df, max_anchor_docs=8).collect()}
    # only the id_b side of the (1, 2) pair is cut
    assert set(out) == {2}
    r = out[2]
    assert shared not in r.text_cut  # the duplicated run is gone
    # span = [first anchor, last anchor + 31] inside the planted range:
    # at 1/16 sampling of ~369 grams the expected uncovered tail is
    # ~16 chars/side; 100 is a generous deterministic bound
    assert r.chars_removed >= 300
    assert len(r.text_cut) == len(texts[2]) - r.chars_removed
    # detection on the cut corpus: the (1, 2) pair is dead (leftover
    # fragments hold no shared anchors — their grams were non-anchors
    # in the original, and seam grams exist only in doc 2)
    cut_corpus = spark.createDataFrame(
        [(1, texts[1]), (2, r.text_cut), (3, texts[3])], "doc_id long, text string"
    )
    again = substring_dup_pairs(cut_corpus, max_anchor_docs=8).collect()
    assert not any((p.id_a, p.id_b) == (1, 2) for p in again)


def test_bloom_bitmap_no_false_negatives(spark):
    """Every inserted key probes positive (all k bits set) — the Bloom
    build/probe pair can prune but never drop a true member."""
    from haensel_ams_data_engineer_challenge_spark.operators.dedup import (
        BLOOM_K,
        _bloom_positions,
        bloom_bitmap,
    )
    from pyspark.sql import functions as F

    keys = spark.createDataFrame([(f"k{i}",) for i in range(200)], "text_hash string")
    m_bits = 1 << 12
    bloom = bloom_bitmap(keys, m_bits=m_bits)
    probes = keys.select(
        "text_hash", F.explode(_bloom_positions(F.col("text_hash"), m_bits, BLOOM_K)).alias("pos")
    ).withColumn("word_idx", (F.col("pos") / 64).cast("long"))
    hits = probes.join(F.broadcast(bloom), "word_idx", "left").select(
        "text_hash",
        F.coalesce(
            F.expr("(shiftright(bits, cast(pos % 64 as int)) & 1) = 1"), F.lit(False)
        ).alias("hit"),
    )
    assert hits.groupBy("text_hash").agg(F.min("hit").alias("m")).filter(
        ~F.col("m")
    ).count() == 0
    # bitmap is bounded by construction: <= m_bits/64 words
    assert bloom.count() <= m_bits // 64


def test_incremental_new_docs_equals_plain_anti_join(spark):
    """incremental_new_docs (bloom prefilter + exact verify) returns
    EXACTLY the plain anti-join result — including under a deliberately
    undersized bitmap where nearly every probe is a false positive."""
    from haensel_ams_data_engineer_challenge_spark.operators.dedup import (
        incremental_new_docs,
        normalize_text,
    )
    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(
        [(i, f"corpus doc number {i} body") for i in range(100)],
        "doc_id long, text string",
    )
    # batch: 40 true dups (text copied, whitespace-mangled so only the
    # NORMALIZED hash matches), 60 new docs
    batch = spark.createDataFrame(
        [(1000 + i, f"  corpus  doc number {i}   body ") for i in range(40)]
        + [(2000 + i, f"fresh doc {i}") for i in range(60)],
        "doc_id long, text string",
    )

    def plain(b, c):
        h = lambda d: d.select("doc_id", F.md5(normalize_text("text")).alias("text_hash"))
        return {r.doc_id for r in h(b).join(h(c).select("text_hash"), "text_hash", "left_anti").collect()}

    expect = plain(batch, corpus)
    assert expect == {2000 + i for i in range(60)}
    got = {r.doc_id for r in incremental_new_docs(batch, corpus).collect()}
    assert got == expect
    # 64-bit bitmap: false-positive city; exact verify must still win
    tiny = {r.doc_id for r in incremental_new_docs(batch, corpus, m_bits=64, k=2).collect()}
    assert tiny == expect


def test_incremental_bloom_probe_is_broadcast(spark):
    """The bitmap probe join must be broadcast (the bitmap is the
    broadcast-sized corpus summary — shuffling batch probes against it
    would defeat the design)."""
    from haensel_ams_data_engineer_challenge_spark.operators.dedup import (
        incremental_new_docs,
    )

    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(100 + i, f"doc {i * 2}") for i in range(50)], "doc_id long, text string"
    )
    plan = incremental_new_docs(batch, corpus)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_ivf_index_cache_amortizes_training(spark, sf_dir):
    """ivf_kmeans with a cache_key trains once per session: the second
    call returns the SAME lineage-truncated frames (no retraining) and
    ann_topk_ivf results are identical with and without the cache."""
    from haensel_ams_data_engineer_challenge_spark.operators import similarity as S
    from haensel_ams_data_engineer_challenge_spark.sources import load_table

    vecs = load_table(spark, sf_dir, "embeddings")
    key = f"{sf_dir}:cache-test"
    a1, c1 = S.ivf_kmeans(vecs, cache_key=key)
    a2, c2 = S.ivf_kmeans(vecs, cache_key=key)
    assert a1 is a2 and c1 is c2  # cache hit: same objects, zero jobs

    q = vecs.filter(F.col("vec_id") < 5)
    fresh = S.ann_topk_ivf(vecs, q)  # no cache: full retrain
    cached = S.ann_topk_ivf(vecs, q, index_cache_key=key)
    rows = lambda df: sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cell, round(r.cosine, 12))
        for r in df.collect()
    )
    assert rows(cached) == rows(fresh)


def test_lsh_index_cache_identical_results(spark, sf_dir):
    """ann_topk_lsh with an index_cache_key reuses the materialized
    (id, table, bucket) stream across calls, with identical results."""
    from haensel_ams_data_engineer_challenge_spark.operators import similarity as S
    from haensel_ams_data_engineer_challenge_spark.sources import load_table

    vecs = load_table(spark, sf_dir, "embeddings")
    q = vecs.filter(F.col("vec_id") < 5)
    key = f"{sf_dir}:lsh-cache-test"
    rows = lambda df: sorted(
        (r.query_id, r.rank, r.neighbor_id, round(r.cosine, 12))
        for r in df.collect()
    )
    fresh = rows(S.ann_topk_lsh(vecs, q))
    cached1 = rows(S.ann_topk_lsh(vecs, q, index_cache_key=key))
    cached2 = rows(S.ann_topk_lsh(vecs, q, index_cache_key=key))
    assert cached1 == fresh and cached2 == fresh
    # the cache actually holds the stream for this key
    ck = (
        spark.sparkContext.applicationId, key,
        S.ANN_LSH_TABLES, S.ANN_LSH_PLANES_PER_TABLE, "vec_id", "embedding",
        S.EMBEDDING_DIM,
    )
    assert ck in S._LSH_INDEX_CACHE


def test_chunk_sequences_reconstruction_and_overlap(spark):
    """Sequence chunking: chunk 0 plus each later chunk's tokens after
    the overlap reconstruct the exact token stream; consecutive chunks
    share exactly `overlap` tokens; short docs give one chunk, empty
    docs none; invalid overlap raises."""
    import re

    import pytest as _pytest

    from haensel_ams_data_engineer_challenge_spark.functions.text import (
        BPE_ISH_PATTERN,
    )
    from haensel_ams_data_engineer_challenge_spark.operators.pack import (
        chunk_sequences,
    )

    texts = {
        1: " ".join(f"tok{i}" for i in range(150)),  # 300 bpe-ish tokens
        2: "short doc only",
        3: "",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    seq_len, overlap = 64, 8
    out = {}
    for r in chunk_sequences(docs, seq_len=seq_len, overlap=overlap).collect():
        out.setdefault(r.doc_id, {})[r.chunk_idx] = r
    assert 3 not in out  # zero tokens -> no chunks
    assert list(out[2]) == [0] and out[2][0].chunk_text == "short doc only"
    for doc_id, text in list(texts.items())[:2]:
        toks = re.findall(BPE_ISH_PATTERN, text)
        chunks = [out[doc_id][i] for i in sorted(out[doc_id])]
        # full reconstruction: chunk 0 whole, later chunks minus overlap
        rebuilt = chunks[0].chunk_text.split(" ")
        for c in chunks[1:]:
            rebuilt += c.chunk_text.split(" ")[overlap:]
        assert rebuilt == toks, doc_id
        # every chunk obeys the length cap; all but the last are full
        assert all(c.n_tokens <= seq_len for c in chunks)
        assert all(c.n_tokens == seq_len for c in chunks[:-1])
        # consecutive chunks share exactly the overlap window
        for a, b in zip(chunks, chunks[1:]):
            assert a.chunk_text.split(" ")[-overlap:] == b.chunk_text.split(" ")[:overlap]
    with _pytest.raises(ValueError):
        chunk_sequences(docs, seq_len=8, overlap=8)


def test_dup_shingle_fraction_reference(spark):
    """Inter-doc duplication share vs a python reference: shared
    boilerplate counts, within-doc repetition alone does not."""
    from collections import Counter

    from haensel_ams_data_engineer_challenge_spark.operators.dedup import (
        dup_shingle_fraction,
    )

    texts = {
        1: "one two three alpha beta gamma",
        2: "one two three delta epsilon zeta",   # shares 'one two three'
        3: "spark spark spark spark spark",       # self-repetition only
        4: "xy",                                  # < 3 tokens: no shingles
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["dup_shingle_frac"]
        for r in dup_shingle_fraction(docs).collect()
    }
    sh = {
        i: set(
            " ".join(ws)
            for ws in zip(*(t.lower().split()[k:] for k in range(3)))
        )
        for i, t in texts.items()
    }
    df = Counter(s for ss in sh.values() for s in ss)
    for i, ss in sh.items():
        if not ss:
            assert i not in got
            continue
        exp = sum(1 for s in ss if df[s] >= 2) / len(ss)
        assert got[i] == exp, i
    assert got[1] == got[2] == 0.25  # exactly the shared trigram
    assert got[3] == 0.0             # intra-doc repetition is not dup


def test_hash_embed_matches_python_reference(spark):
    """Feature-hashed vectors are exact signed token counts: bitwise
    equal to a python model (md5 buckets/signs, no quantization)."""
    import hashlib
    import re

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat"),        # exact dup -> same vector
        (3, "completely different words here"),
        (4, "???"),                           # no tokens -> absent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    dim = 16
    got = {r["vec_id"]: r["embedding"]
           for r in S.hash_embed(docs, dim=dim).collect()}

    def py_vec(text):
        v = [0.0] * dim
        for t in re.findall(r"[a-z0-9]+", text.lower()):
            b = int(hashlib.md5(f"he|{t}".encode()).hexdigest()[:15], 16) % dim
            s = 1 if int(hashlib.md5(f"hs|{t}".encode()).hexdigest()[:1], 16) % 2 == 0 else -1
            v[b] += s
        return v

    assert set(got) == {1, 2, 3}
    for i, text in rows[:3]:
        assert got[i] == py_vec(text), i
    assert got[1] == got[2]


def test_hash_embed_feeds_embedding_dedup(spark, sf_dir):
    """documents -> hash_embed -> banded near-dup: exact-dup texts
    surface as cosine-1.0 pairs, matching dedup_exact's groups."""
    from haensel_ams_data_engineer_challenge_spark.operators.dedup import (
        dedup_exact,
    )
    from haensel_ams_data_engineer_challenge_spark.sources import load_table

    base = load_table(spark, sf_dir, "documents")
    # plant exact duplicates of three real docs under fresh ids
    planted = base.filter("doc_id < 3").withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    docs = base.unionByName(planted)
    assert dedup_exact(docs).filter("n_copies >= 2").count() >= 3
    vecs = S.hash_embed(docs)
    pairs = S.embedding_dup_pairs_lsh(vecs, threshold=0.999999)
    got_pairs = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(3):
        assert (i, i + 1_000_000) in got_pairs, i


def test_quantize_embedding_matches_python(spark):
    """Symmetric int8 floor quantization is bit-reproducible by a
    python model, per-vector scale, zero-vector passthrough."""
    import math

    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),     # negative max
        (2, [2.0, 1.0, -0.5, 0.125]),    # positive max
        (3, [0.0, 0.0, 0.0, 0.0]),       # zero vector -> unchanged
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: list(r["embedding"])
           for r in S.quantize_embedding(df).collect()}

    def py(v):
        mx = max(abs(x) for x in v)
        if mx == 0.0:
            return v
        return [float(math.floor(x * 127.0 / mx)) for x in v]

    for i, v in rows:
        assert got[i] == py(v), i
    # the grid is symmetric int8: -127 at the negative max (floor can
    # reach -128 only through off-grid float noise, absent here)
    assert got[1][1] == -127.0 and got[2][0] == 127.0


def test_int8_ann_recall_floor(spark, sf_dir):
    """Scalar-quantized brute top-k keeps >= 0.9 recall@5 vs full
    precision on the driver embeddings (measured 0.98-1.0; the 8x
    memory cut must never silently trash ranking quality)."""
    from haensel_ams_data_engineer_challenge_spark.sources import load_table

    vecs = load_table(spark, sf_dir, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.ann_topk_brute(vecs, queries, k=5).collect()}
    int8 = {(r["query_id"], r["neighbor_id"])
            for r in S.ann_topk_brute_int8(vecs, queries, k=5).collect()}
    assert len(exact) == 50 and len(int8) == 50
    assert len(exact & int8) / len(exact) >= 0.9


def test_int8_composes_through_ivf_index(spark, sf_dir):
    """Quantized vectors are plain integer-valued embeddings, so the
    WHOLE index stack composes unchanged: IVF (train + probe) over
    int8-quantized vectors keeps >= 0.8 of full-precision IVF's own
    top-k agreement with exact search — the storage cut applies to the
    index path, not just brute force."""
    from haensel_ams_data_engineer_challenge_spark.sources import load_table

    vecs = load_table(spark, sf_dir, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.ann_topk_brute(vecs, queries, k=3).collect()}

    def ivf_hits(vv, qq):
        return {(r["query_id"], r["neighbor_id"])
                for r in S.ann_topk_ivf(vv, qq, k=3).collect()}

    full = ivf_hits(vecs, queries)
    q8 = ivf_hits(S.quantize_embedding(vecs), S.quantize_embedding(queries))
    recall_full = len(full & exact) / len(exact)
    recall_q8 = len(q8 & exact) / len(exact)
    assert recall_q8 >= 0.8 * recall_full
