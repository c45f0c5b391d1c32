"""End-to-end on the reference's NATIVE storage and schema: a SQLite
database with the five challenge tables (challenge_db_create.sql),
loaded through the partitioned SQLite source, processed by the engine,
written back with INSERT OR IGNORE — every FIXTURES.md §1 edge case
included:

- a session with ts exactly equal to the conv ts (strict < excludes it)
- a conversion with zero prior sessions (drops silently)
- two conversions of one user competing for the same sessions
  (earliest-first exclusive assignment)
- NULL and 0.0 costs (COALESCE + divide-by-zero paths)
- duplicate attribution insert on re-run (INSERT OR IGNORE)
"""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.operators.asof import journey_asof_join
from haensel_ams_data_engineer_challenge_spark.operators.ihc import ihc_attribute
from haensel_ams_data_engineer_challenge_spark.plans.report import (
    channel_report,
    report_metrics,
)
from haensel_ams_data_engineer_challenge_spark.sources.sqlite import (
    read_sqlite,
    sqlite_schema,
    write_sqlite_insert_or_ignore,
)

DDL = """
CREATE TABLE conversions (conv_id TEXT PRIMARY KEY, user_id TEXT,
    conv_date TEXT, conv_time TEXT, revenue REAL);
CREATE TABLE session_sources (session_id TEXT PRIMARY KEY, user_id TEXT,
    event_date TEXT, event_time TEXT, channel_name TEXT,
    holder_engagement INTEGER, closer_engagement INTEGER,
    impression_interaction INTEGER);
CREATE TABLE session_costs (session_id TEXT PRIMARY KEY, cost REAL);
CREATE TABLE attribution_customer_journey (conv_id TEXT, session_id TEXT,
    ihc REAL, PRIMARY KEY (conv_id, session_id));
"""

SESSIONS = [
    # user u1: s1 before both convs, s2 between them, s3 exactly at c2's ts
    ("s1", "u1", "2023-09-01", "08:00:00", "FB & IG Ads", 1, 0, 1),
    ("s2", "u1", "2023-09-01", "12:00:00", "Paid Search Brand", 1, 1, 0),
    ("s3", "u1", "2023-09-01", "18:00:00", "Direct Traffic", 0, 1, 0),
    # user u2: one session, one conv
    ("s4", "u2", "2023-09-02", "09:00:00", "Newsletter & Email", 0, 0, 0),
]
CONVERSIONS = [
    ("c1", "u1", "2023-09-01", "10:00:00", 50.0),   # claims s1 only
    ("c2", "u1", "2023-09-01", "18:00:00", 80.0),   # claims s2; s3 is AT 18:00 -> excluded
    ("c3", "u2", "2023-09-02", "10:00:00", 30.0),   # claims s4
    ("c4", "u3", "2023-09-03", "10:00:00", 99.0),   # zero prior sessions -> dropped
]
COSTS = [("s1", 2.5), ("s2", None), ("s3", 0.0)]  # s4 has no cost row


@pytest.fixture()
def ref_db(tmp_path):
    path = str(tmp_path / "challenge.db")
    with sqlite3.connect(path) as conn:
        conn.executescript(DDL)
        conn.executemany("INSERT INTO session_sources VALUES (?,?,?,?,?,?,?,?)", SESSIONS)
        conn.executemany("INSERT INTO conversions VALUES (?,?,?,?,?)", CONVERSIONS)
        conn.executemany("INSERT INTO session_costs VALUES (?,?)", COSTS)
    return path


def _frames(spark, ref_db):
    sessions = read_sqlite(spark, ref_db, "session_sources").withColumn(
        "ts",
        F.to_timestamp(F.concat_ws(" ", "event_date", "event_time"), "yyyy-MM-dd HH:mm:ss")
        .cast("timestamp_ntz"),
    ).withColumn("holder_engagement", F.col("holder_engagement").cast("int")) \
     .withColumn("closer_engagement", F.col("closer_engagement").cast("int")) \
     .withColumn("impression_interaction", F.col("impression_interaction").cast("int"))
    convs = read_sqlite(spark, ref_db, "conversions").withColumn(
        "conv_ts",
        F.to_timestamp(F.concat_ws(" ", "conv_date", "conv_time"), "yyyy-MM-dd HH:mm:ss")
        .cast("timestamp_ntz"),
    )
    costs = read_sqlite(spark, ref_db, "session_costs")
    return sessions, convs, costs


def test_sqlite_source_schema_and_rows(spark, ref_db):
    assert sqlite_schema(ref_db, "session_costs") == [
        ("session_id", "string"), ("cost", "double"),
    ]
    rows = read_sqlite(spark, ref_db, "session_sources", num_partitions=3).collect()
    assert {r.session_id for r in rows} == {"s1", "s2", "s3", "s4"}
    # NULL cost survives the boundary
    costs = {r.session_id: r.cost for r in read_sqlite(spark, ref_db, "session_costs").collect()}
    assert costs == {"s1": 2.5, "s2": None, "s3": 0.0}


def test_edge_case_journey_semantics(spark, ref_db):
    sessions, convs, _costs = _frames(spark, ref_db)
    journeys = journey_asof_join(sessions, convs)
    got = {(r.conv_id, r.session_id) for r in journeys.collect()}
    assert got == {
        ("c1", "s1"),   # earliest-first: c1 takes s1 away from c2
        ("c2", "s2"),   # s3 at exactly conv_ts is EXCLUDED (strict <)
        ("c3", "s4"),
    }  # c4 (zero sessions) produces no rows


def test_full_cycle_with_insert_or_ignore_writeback(spark, ref_db):
    sessions, convs, costs = _frames(spark, ref_db)
    scored = ihc_attribute(journey_asof_join(sessions, convs))
    acj = scored.select("conv_id", "session_id", "ihc")
    n1 = write_sqlite_insert_or_ignore(acj, ref_db, "attribution_customer_journey")
    assert n1 == 3
    # re-run: PK dedup ignores every duplicate
    n2 = write_sqlite_insert_or_ignore(acj, ref_db, "attribution_customer_journey")
    assert n2 == 0
    stored = read_sqlite(spark, ref_db, "attribution_customer_journey")
    assert stored.count() == 3
    sums = {r.conv_id: r.s for r in stored.groupBy("conv_id").agg(F.sum("ihc").alias("s")).collect()}
    assert all(abs(v - 1.0) < 1e-6 for v in sums.values())

    # report over native-schema frames: single-session journeys get full
    # credit; NULL cost coalesces to 0; CPO/ROAS null only on 0 divisor
    report = report_metrics(
        channel_report(sessions, costs, stored, convs.select("conv_id", "revenue"))
    ).collect()
    by_ch = {r.channel_name: r for r in report}
    assert by_ch["FB & IG Ads"].cost == 2.5 and by_ch["FB & IG Ads"].ihc == 1.0
    assert by_ch["Paid Search Brand"].cost == 0.0          # NULL coalesced
    assert by_ch["Paid Search Brand"].ROAS is None          # 0 cost -> NULL
    assert by_ch["Newsletter & Email"].CPO is not None
    assert "Direct Traffic" not in by_ch                    # s3 unattributed


def test_sqlite_rejects_unknown_table(spark, ref_db):
    """Table names are interpolated into SQL — unknown names must raise
    before reaching the engine (injection guard, ADVICE r01)."""
    import pytest

    from haensel_ams_data_engineer_challenge_spark.sources.sqlite import read_sqlite

    with pytest.raises(ValueError, match="not found"):
        read_sqlite(spark, ref_db, "conversions; DROP TABLE conversions")


def test_sqlite_without_rowid_falls_back_to_single_scan(spark, tmp_path):
    """WITHOUT ROWID tables have no implicit rowid to slice on; the
    reader must detect that and fall back instead of erroring."""
    import sqlite3

    from haensel_ams_data_engineer_challenge_spark.sources.sqlite import read_sqlite

    db = str(tmp_path / "wr.db")
    with sqlite3.connect(db) as conn:
        conn.execute(
            "CREATE TABLE kv (k TEXT PRIMARY KEY, v REAL) WITHOUT ROWID"
        )
        conn.executemany(
            "INSERT INTO kv VALUES (?, ?)", [(f"k{i}", float(i)) for i in range(25)]
        )
    rows = read_sqlite(spark, db, "kv", num_partitions=4).collect()
    assert {(r.k, r.v) for r in rows} == {(f"k{i}", float(i)) for i in range(25)}
