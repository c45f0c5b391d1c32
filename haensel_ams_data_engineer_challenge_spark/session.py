"""SparkSession factory and engine configuration.

Scale posture (SURVEY.md §7 M6): AQE handles runtime re-planning,
partition coalescing and skew-join splitting; dynamic partition
overwrite gives idempotent date-partitioned report rebuilds
(reference delete-and-replace semantics, reporting.py:36-50); UTC
session timezone keeps timestamp semantics deterministic across
engines; Arrow speeds the few pandas boundaries (grouped-map UDFs).

``spark.sql.legacy.parquet.nanosAsLong`` is required because the
driver testdata stores ``events.ts`` as parquet TIMESTAMP(NANOS),
which Spark otherwise refuses to read; ``sources.tables`` converts
the raw nanos to microsecond ``timestamp_ntz`` (exactly what DuckDB
does when reading the same file).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are runtime-settable (SQLConf) — safe to apply to an
#: externally created session (the verify driver builds its own).
ENGINE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # dims up to 64 MiB broadcast: at 100 TB the fact side dwarfs every
    # dimension table; broadcasting avoids shuffling the fact table.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


#: Static confs (session-build time only — CANNOT_MODIFY_STATIC_CONFIG
#: at runtime, so these go through the builder, not ensure_engine_confs).
#: dataFrameDebugging: PySpark 4's per-DataFrame-API-call site capture
#: (error-context aid) costs ~3 extra py4j round-trips per API call on
#: the driver — measured 2x the construction-time socket traffic of
#: every large query build (text_stats: 7786 -> 3416 round-trips/call;
#: optimization guide §5: the driver should do almost no work).  The
#: cost scales with query-graph size, not data size, so turning it off
#: is a production setting, not a local tune; error messages lose only
#: the Python call-site annotation.
STATIC_CONFS: dict[str, str] = {
    "spark.python.sql.dataFrameDebugging.enabled": "false",
}


def default_parallelism() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or 0) or (os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


#: Runtime conf: partition width for explicit scan-layout re-spreads
#: (sources.tables._SPREAD_TABLES, the corpus spine's post-window
#: repartition).  Unset -> local default_parallelism.
RESPREAD_CONF = "spark.haenselams.respreadPartitions"


def respread_width(spark: SparkSession) -> int:
    """Width for the explicit ``repartition(n)`` layout repairs.

    These repairs exist because AQE rightly coalesces tiny shuffles to
    ~1 partition by byte count, which serializes CPU-heavy downstream
    work (trigram explodes) at local SF.  The right width is
    data-dependent on a real cluster, so it is conf-driven
    (``spark.haenselams.respreadPartitions``) rather than hardcoded to
    the local machine's CPU count; the local default keeps every core
    busy, which is the only regime where the repair matters — at real
    scale AQE never coalesces below real parallelism and the re-spread
    is one extra narrow pass at whatever width is configured.
    """
    try:
        width = int(spark.conf.get(RESPREAD_CONF, "") or 0)
    except ValueError:
        width = 0
    return width if width > 0 else default_parallelism()


def get_spark(app_name: str = "haensel-ams-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's configuration."""
    if master is None:
        master = f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if shuffle_partitions is None:
        shuffle_partitions = default_parallelism()
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    for k, v in STATIC_CONFS.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    # static conf: catalog tables (bucketed layouts) land here, not in cwd
    import tempfile

    builder = builder.config(
        "spark.sql.warehouse.dir",
        os.environ.get(
            "SPARK_WAREHOUSE_DIR", f"{tempfile.gettempdir()}/spark-warehouse-{os.getpid()}"
        ),
    )
    spark = builder.getOrCreate()
    return spark


def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to a session we did not build.

    The correctness driver passes its own SparkSession into
    ``__spark_entry__.entry/queries``; without ``nanosAsLong`` reading
    ``events.parquet`` raises PARQUET_TYPE_ILLEGAL, so loaders call this
    defensively before every read.
    """
    for k, v in ENGINE_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - static conf builds
            # deliberately swallow-and-continue: the wording of the
            # "cannot modify at runtime" error varies across Spark
            # builds (error-class vs legacy vs connect), so matching
            # on it would turn a tolerable static-conf refusal into a
            # startup crash; the loader that actually NEEDS the conf
            # raises its own targeted error (e.g. PARQUET_TYPE_ILLEGAL
            # names the nanosAsLong flag)
            continue
    return spark
