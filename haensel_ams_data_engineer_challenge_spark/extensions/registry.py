"""LLM-training-data pipeline extension operators (BASELINE.json
north star): dedup, similarity search, text analysis, multimodal.

Filled in milestone M5; each entry follows the same
(spark_fn, oracle_sql | None) contract as the core registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def extension_entries() -> dict[str, tuple[QueryFn, str | None]]:
    return {}
