"""Zstd-compressed wire formats (round 15, r14 verdict #5).

The Pile / RedPajama-class corpora ship ``.jsonl.zst`` and Common
Crawl is moving to ``.warc.zst`` — without a decompression rung at
the source seam the ingestion story stops at gzip.  This module is
that rung:

- :func:`zstd_decompress` resolves the first available decompressor:
  the stdlib ``compression.zstd`` (Python 3.14+), else the
  ``zstandard`` package.  When NEITHER is importable it refuses
  LOUDLY with actionable guidance (never a silent empty corpus);
  corrupt/truncated streams raise ``ValueError`` so callers
  quarantine them under the same audit discipline as corrupt gzip
  members (sources/warc.py) and malformed jsonl lines
  (sources/jsonl.py).
- :func:`is_zstd` sniffs the frame magic, so suffix-less objects
  still route correctly.
- :func:`read_documents_jsonl_zst` — the ``.jsonl.zst`` reader:
  binaryFile scan -> per-file decompress + line split inside ONE
  Arrow stage -> the SAME schema/quarantine split as
  ``read_documents_jsonl`` (from_json PERMISSIVE with a corrupt-
  record column).  A file whose stream is corrupt quarantines WHOLE
  (one raw_line row naming the file) — observable, like the WARC
  reader's malformed-gzip audit row.

The WARC readers (``read_documents_warc`` / ``read_links_warc``)
gained the matching ``.warc.zst`` rung in sources/warc.py.

Executors can't see driver-side monkeypatches (closures re-import
modules in the Python workers), so the readers accept an explicit
``_decompress`` injection point; tests exercise the full plumbing
with a stand-in codec and pin the refusal/corrupt paths directly.

Scale shape: one whole file per decompress call — zstd frames are
not splittable without a seekable-format index, so shard dumps into
many files for scan parallelism (the .gz rule of sources/jsonl.py,
verbatim).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

#: zstd frame magic number (RFC 8878), little-endian on the wire.
ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def is_zstd(blob: bytes) -> bool:
    """True when ``blob`` starts a zstd frame."""
    return blob[:4] == ZSTD_MAGIC


def _resolve_decompressor() -> Callable[[bytes], bytes] | None:
    """First importable rung: stdlib (3.14+) -> zstandard -> None."""
    try:
        from compression import zstd  # type: ignore[import-not-found]

        return zstd.decompress
    except ImportError:
        pass
    try:
        import zstandard  # type: ignore[import-not-found]

        def _d(blob: bytes) -> bytes:
            # decompressobj handles frames without a declared content
            # size (streaming encoders omit it)
            return zstandard.ZstdDecompressor().decompressobj().decompress(
                blob
            )

        return _d
    except ImportError:
        return None


def zstd_decompress(blob: bytes, origin: str = "") -> bytes:
    """Decompress one zstd stream (module docstring ladder).

    Raises ``RuntimeError`` with guidance when no decompressor is
    available in the interpreter, ``ValueError`` when the stream is
    corrupt or truncated (callers quarantine)."""
    d = _resolve_decompressor()
    if d is None:
        raise RuntimeError(
            f"cannot decompress zstd input {origin or '(stream)'}: this "
            "interpreter has neither the stdlib compression.zstd module "
            "(Python >= 3.14) nor the 'zstandard' package. Install one "
            "of them on driver AND executors, or re-compress the dump "
            "as .gz/.jsonl, which this engine reads natively."
        )
    try:
        return d(blob)
    except Exception as exc:
        raise ValueError(
            f"corrupt or truncated zstd stream {origin or '(stream)'}: "
            f"{exc}"
        ) from exc


def read_documents_jsonl_zst(
    spark: SparkSession,
    path: str,
    glob: str = "*.jsonl.zst",
    _decompress: Callable[[bytes], bytes] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read ``.jsonl.zst`` shards -> (documents, quarantine) with the
    exact contract of ``read_documents_jsonl`` (schema, doc_id
    derivation, empty-text and corrupt-line quarantine), plus the
    whole-file quarantine row for undecodable streams.

    ``_decompress``: injection seam (module docstring); production
    leaves it None -> :func:`zstd_decompress`."""
    import pandas as pd

    from .jsonl import JSONL_SCHEMA

    dec = _decompress or zstd_decompress
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def _lines(batches):
        for pdf in batches:
            for p, blob in zip(pdf["path"], pdf["content"]):
                try:
                    text = dec(bytes(blob)).decode("utf-8", "replace")
                except ValueError as exc:
                    yield pd.DataFrame(
                        {"line": [f"__zstd_quarantine__ {p}: {exc}"],
                         "bad_file": [True]}
                    )
                    continue
                rows = [ln for ln in text.split("\n") if ln.strip()]
                yield pd.DataFrame(
                    {"line": rows, "bad_file": [False] * len(rows)}
                )

    lines = files.mapInPandas(_lines, "line string, bad_file boolean")
    parsed = lines.select(
        "bad_file",
        "line",
        F.from_json(
            "line",
            JSONL_SCHEMA,
            {"mode": "PERMISSIVE",
             "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("j"),
    ).select("bad_file", "line", "j.*")
    bad = parsed.filter(
        F.col("bad_file")
        | F.col("_corrupt_record").isNotNull()
        | F.col("text").isNull()
        | (F.length("text") == 0)
    ).select(F.col("line").alias("raw_line"))
    good = parsed.filter(
        ~F.col("bad_file")
        & F.col("_corrupt_record").isNull()
        & F.col("text").isNotNull()
        & (F.length("text") > 0)
    )
    docs = good.select(
        F.xxhash64(F.coalesce(F.col("id"), F.col("text"))).alias("doc_id"),
        F.col("text"),
        F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
        F.coalesce(F.col("source"), F.lit("jsonl")).alias("source"),
        F.length("text").cast("long").alias("n_chars"),
        F.nullif(F.col("url"), F.lit("")).alias("uri"),
    )
    return docs, bad
