"""S4-S8 write-side semantics (SURVEY.md §2.1)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.operators import sinks


def test_create_and_verify_tables(spark, tmp_path):
    base = str(tmp_path / "warehouse")
    sinks.create_tables(spark, base)
    schemas = sinks.verify_tables(spark, base)
    assert set(schemas) == set(sinks.ATTRIBUTION_DDL)
    # IF NOT EXISTS: a second run must not clobber data
    df = spark.createDataFrame([("c1", "s1", 0.5)], "conv_id string, session_id string, ihc double")
    df.write.mode("append").parquet(f"{base}/attribution_customer_journey")
    sinks.create_tables(spark, base)
    assert spark.read.parquet(f"{base}/attribution_customer_journey").count() == 1


def test_insert_if_absent_is_insert_or_ignore(spark, tmp_path):
    path = str(tmp_path / "acj")
    rows1 = spark.createDataFrame(
        [("c1", "s1", 0.4), ("c1", "s2", 0.6)],
        "conv_id string, session_id string, ihc double",
    )
    assert sinks.insert_if_absent(spark, rows1, path, ["conv_id", "session_id"]) == 2
    # re-run with overlap + one new row: only the new row lands
    rows2 = spark.createDataFrame(
        [("c1", "s1", 9.9), ("c2", "s3", 1.0)],
        "conv_id string, session_id string, ihc double",
    )
    assert sinks.insert_if_absent(spark, rows2, path, ["conv_id", "session_id"]) == 1
    got = {(r.conv_id, r.session_id): r.ihc for r in spark.read.parquet(path).collect()}
    assert got[("c1", "s1")] == 0.4  # original kept, duplicate ignored
    assert len(got) == 3


def test_overwrite_partitions_is_delete_and_replace(spark, tmp_path):
    path = str(tmp_path / "report")
    v1 = spark.createDataFrame(
        [("d1", "a", 1.0), ("d2", "b", 2.0)], "date string, ch string, v double"
    )
    sinks.overwrite_partitions(v1, path, "date")
    # rebuild only d2 with new content; d1 must survive
    v2 = spark.createDataFrame([("d2", "b", 9.0)], "date string, ch string, v double")
    sinks.overwrite_partitions(v2, path, "date")
    got = {(r.date, r.ch): r.v for r in spark.read.parquet(path).collect()}
    assert got == {("d1", "a"): 1.0, ("d2", "b"): 9.0}


def test_export_csv_single_file_with_header(spark, tmp_path):
    path = str(tmp_path / "out_csv")
    df = spark.createDataFrame([("x", 1.5)], "channel_name string, cost double")
    sinks.export_csv(df, path)
    files = list(Path(path).glob("*.csv"))
    assert len(files) == 1
    lines = files[0].read_text().strip().splitlines()
    assert lines[0] == "channel_name,cost"
    assert lines[1] == "x,1.5"


def test_export_json_roundtrip(spark, tmp_path):
    path = str(tmp_path / "out_json")
    df = spark.createDataFrame([("c1", 0.25)], "conv_id string, ihc double")
    sinks.export_json(df, path)
    rows = [
        json.loads(line)
        for f in Path(path).glob("*.json")
        for line in f.read_text().strip().splitlines()
    ]
    assert rows == [{"conv_id": "c1", "ihc": 0.25}]


def test_journeys_as_api_payload_shape(spark, sf_dir):
    from haensel_ams_data_engineer_challenge_spark.attribution import model as M
    from haensel_ams_data_engineer_challenge_spark.operators.ihc import (
        flag_conversion_session,
    )

    flagged = flag_conversion_session(M.journeys(spark, sf_dir))
    payload = sinks.journeys_as_api_payload(flagged).limit(5).collect()
    for row in payload:
        records = json.loads(row.journey_json)
        assert all(r["conversion_id"] == row.conv_id for r in records)
        assert sum(r["conversion"] for r in records) == 1  # exactly one flag
        ts = [r["timestamp"] for r in records]
        assert ts == sorted(ts)  # journey order (db_utils.py:176)
        assert set(records[0]) == {
            "conversion_id", "session_id", "timestamp", "channel_label",
            "holder_engagement", "closer_engagement", "conversion",
            "impression_interaction",
        }


def test_insert_if_absent_rejects_null_keys(spark, tmp_path):
    """NULL-key rows can never match a left_anti condition, so keeping
    them would re-append on every run — they are rejected instead and
    the sink stays idempotent (ADVICE r01)."""
    path = str(tmp_path / "acj_null")
    rows = spark.createDataFrame(
        [("c1", "s1", 0.4), (None, "s2", 0.6), ("c2", None, 1.0)],
        "conv_id string, session_id string, ihc double",
    )
    assert sinks.insert_if_absent(spark, rows, path, ["conv_id", "session_id"]) == 1
    # replay: nothing new, NULL rows not re-appended
    assert sinks.insert_if_absent(spark, rows, path, ["conv_id", "session_id"]) == 0
    assert spark.read.parquet(path).count() == 1


def test_export_csv_golden_cells_null_metrics_empty(spark, tmp_path):
    """Reference fidelity: NULL CPO/ROAS render as EMPTY cells exactly
    like channel_reporting.csv rows 2-4 (e.g.
    'Affiliate & Partnerships,2023-08-29,11.795,0.0,0.0,,0.0') —
    asserted on the written CSV text, not parsed values."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Affiliate & Partnerships", "2023-08-29", 11.795, 0.0, 0.0)],
        "channel_name string, date string, cost double, ihc double, ihc_revenue double",
    ).select(
        "*",
        F.when(F.col("ihc") != 0.0, F.col("cost") / F.col("ihc")).alias("CPO"),
        F.when(F.col("cost") != 0.0, F.col("ihc_revenue") / F.col("cost")).alias("ROAS"),
    )
    path = str(tmp_path / "golden_csv")
    sinks.export_csv(df, path)
    [f] = list(Path(path).glob("*.csv"))
    lines = f.read_text().strip().splitlines()
    assert lines[0] == "channel_name,date,cost,ihc,ihc_revenue,CPO,ROAS"
    # byte-identical to channel_reporting.csv line 2
    assert lines[1] == "Affiliate & Partnerships,2023-08-29,11.795,0.0,0.0,,0.0"


def test_export_csv_guard_branches(spark, tmp_path):
    """Past max_single_file_rows the sink warns and writes partitioned
    CSV instead of serializing through one coalesce(1) task."""
    import warnings

    df = spark.createDataFrame(
        [(str(i), float(i)) for i in range(8)], "k string, v double"
    ).repartition(4)
    small = str(tmp_path / "small_csv")
    assert sinks.export_csv(df, small, max_single_file_rows=100) == "single"
    assert len(list(Path(small).glob("*.csv"))) == 1

    big = str(tmp_path / "big_csv")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mode = sinks.export_csv(df, big, max_single_file_rows=3)
    assert mode == "partitioned"
    assert any("max_single_file_rows" in str(x.message) for x in w)
    parts = list(Path(big).glob("*.csv"))
    assert len(parts) > 1  # not funneled through one task
    rows = [
        line
        for f in parts
        for line in f.read_text().strip().splitlines()
        if line and line != "k,v"
    ]
    assert len(rows) == 8

    # n_rows short-circuits the count (caller already knows)
    again = str(tmp_path / "again_csv")
    assert sinks.export_csv(df, again, max_single_file_rows=3, n_rows=2) == "single"


# ---------------------------------------------------------------------------
# round 10: writer lease on the idempotent sink + lease-guarded
# compaction (r9 verdict tasks 3 and 5).
# ---------------------------------------------------------------------------


def _df(spark, ids):
    return spark.createDataFrame(
        [(str(i), float(i)) for i in ids], "k string, v double"
    )


def test_writer_lease_blocks_concurrent_insert(spark, tmp_path):
    """Two interleaved insert_if_absent calls on one path: the second
    refuses loudly (ConcurrentWriterError) while the first's lease is
    held, and succeeds after release — no duplicate keys ever."""
    path = str(tmp_path / "sink")
    assert sinks.insert_if_absent(spark, _df(spark, [1, 2]), path, ["k"]) == 2
    # the lease is released after a successful insert
    assert not Path(path + "__lease").exists()

    # writer A holds the lease mid-window; writer B must refuse
    token = sinks.acquire_writer_lease(spark, path)
    with pytest.raises(sinks.ConcurrentWriterError, match="another writer"):
        sinks.insert_if_absent(spark, _df(spark, [2, 3]), path, ["k"])
    # refusal appended nothing
    assert spark.read.parquet(path).count() == 2
    sinks.release_writer_lease(spark, path, token)
    assert sinks.insert_if_absent(spark, _df(spark, [2, 3]), path, ["k"]) == 1
    got = sorted(r["k"] for r in spark.read.parquet(path).collect())
    assert got == ["1", "2", "3"]


def test_writer_lease_stale_takeover(spark, tmp_path):
    """A lease older than the TTL belongs to a crashed writer: the next
    insert takes it over (with a warning) instead of deadlocking."""
    import os
    import time

    path = str(tmp_path / "sink")
    sinks.acquire_writer_lease(spark, path)  # crashed writer: no release
    lease = Path(path + "__lease")
    old = time.time() - (sinks.LEASE_TTL_MS / 1000 + 60)
    os.utime(lease, (old, old))
    with pytest.warns(UserWarning, match="stale writer lease"):
        n = sinks.insert_if_absent(spark, _df(spark, [7]), path, ["k"])
    assert n == 1
    assert not lease.exists()  # the takeover's own lease was released


def test_release_lease_verifies_token(spark, tmp_path):
    """A writer that lost its lease to a takeover must not release the
    new owner's lease."""
    path = str(tmp_path / "sink")
    sinks.acquire_writer_lease(spark, path)
    lease = Path(path + "__lease")
    with pytest.warns(UserWarning, match="taken over"):
        sinks.release_writer_lease(spark, path, "not-my-token")
    assert lease.exists()


def test_compact_sink_row_invariant_and_file_count(spark, tmp_path):
    """Compaction: identical row set, fewer files, lease released,
    sink still insertable afterwards."""
    path = str(tmp_path / "sink")
    for batch in ([1, 2], [3, 4], [5], [6, 7, 8]):
        sinks.insert_if_absent(spark, _df(spark, batch), path, ["k"])
    files_before = len(list(Path(path).glob("*.parquet")))
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    n = sinks.compact_parquet_sink(spark, path, target_partitions=1)
    assert n == 8
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before
    files_after = len(list(Path(path).glob("*.parquet")))
    assert files_after == 1 < files_before
    assert not Path(path + "__lease").exists()
    assert not Path(path + "__old").exists()
    assert not Path(path + "__compact").exists()
    # still a normal sink afterwards
    assert sinks.insert_if_absent(spark, _df(spark, [8, 9]), path, ["k"]) == 1


def test_compact_sink_recovers_crashed_swap(spark, tmp_path):
    """Crash between the two renames leaves the sink missing and the
    backup intact; the next compaction restores it before working."""
    import shutil

    path = str(tmp_path / "sink")
    sinks.insert_if_absent(spark, _df(spark, [1, 2, 3]), path, ["k"])
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    shutil.move(path, path + "__old")  # the mid-swap crash state
    n = sinks.compact_parquet_sink(spark, path, target_partitions=1)
    assert n == 3
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before


def test_compact_refuses_while_insert_holds_lease(spark, tmp_path):
    path = str(tmp_path / "sink")
    sinks.insert_if_absent(spark, _df(spark, [1]), path, ["k"])
    token = sinks.acquire_writer_lease(spark, path)
    with pytest.raises(sinks.ConcurrentWriterError):
        sinks.compact_parquet_sink(spark, path)
    sinks.release_writer_lease(spark, path, token)
