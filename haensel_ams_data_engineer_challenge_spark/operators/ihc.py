"""Native IHC (Initializer–Holder–Closer) attribution scoring.

The reference scores journeys by POSTing them to the external IHC API
(api_utils.IHCApiClient.compute_ihc:68-138) and only *validates* the
result shape: per-session ihc in [0,1] (api_utils.py:270-271) summing
to 1.0 +- 0.001 per conversion (db_utils.check_attribution_sums:227-258).
The engine implements the scoring natively as a deterministic,
window-expressible model honouring the published IHC structure — the
conversion's credit is split across three phases:

- Initializer  W_I = 0.3 -> the journey's first session (min ts);
- Closer       W_C = 0.3 -> the journey's last session (max ts);
- Holder       W_H = 0.4 -> spread over sessions with
  ``holder_engagement = 1`` proportionally; if the journey has no
  holder-engaged session, spread evenly over all sessions.

A single-session journey receives all three phases = 1.0. The output
satisfies the reference's invariants by construction (ihc in [0,1],
per-conversion sum = 1 within fp rounding), which the engine re-checks
with ``attribution_sum_violations`` (A2).

Everything is window functions over ``partitionBy(conv_id)`` — pure
Catalyst, whole-stage-codegen'd, one shuffle on conv_id. The
journey-sized groups are tiny, so no skew risk. An
``applyInPandas`` variant is not needed: the model is closed-form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

W_INITIALIZER = 0.3
W_HOLDER = 0.4
W_CLOSER = 0.3


def _journey_windows(conv_col: str, ts_col: str, session_col: str):
    by_conv = Window.partitionBy(conv_col)
    asc = by_conv.orderBy(F.col(ts_col).asc(), F.col(session_col).asc())
    desc = by_conv.orderBy(F.col(ts_col).desc(), F.col(session_col).desc())
    return by_conv, asc, desc


def flag_conversion_session(
    journeys: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    session_col: str = "session_id",
    flag_col: str = "conversion",
) -> DataFrame:
    """W3: mark exactly one session per journey as the converting one.

    Reference: the latest session with ts <= conv_ts gets conversion=1
    (journey_builder.py:136-156, argmax via idxmax). Journey membership
    is already strict (< conv_ts), so the flag is simply the journey's
    latest session. Ties on identical ts break on MAX session_id — a
    deliberate engine-side deterministic tie-break, not a reference
    reproduction: pandas idxmax keeps the first max in frame order,
    which for the reference is DB-insertion order and therefore not
    reproducible from the data itself.
    """
    _, _, desc = _journey_windows(conv_col, ts_col, session_col)
    return journeys.withColumn(
        flag_col, (F.row_number().over(desc) == 1).cast("int")
    )


def ihc_attribute(
    journeys: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    session_col: str = "session_id",
    holder_col: str = "holder_engagement",
) -> DataFrame:
    """Score journey rows with the native IHC model (module docstring).

    Input: one row per (conv_id, session_id) as produced by
    ``journey_asof_join``. Output: input columns + ``ihc`` double.
    """
    by_conv, asc, _desc = _journey_windows(conv_col, ts_col, session_col)
    rn_asc = F.row_number().over(asc)
    holder_sum = F.sum(holder_col).over(by_conv)
    n = F.count(F.lit(1)).over(by_conv)
    # (ts, session_id) is a total order within a journey, so the
    # descending rank is derivable: one window SORT instead of two
    # (the unordered aggregates share the same exchange regardless).
    rn_desc = n - rn_asc + 1
    holder_share = F.when(
        holder_sum > 0, F.col(holder_col).cast("double") / holder_sum.cast("double")
    ).otherwise(F.lit(1.0) / n.cast("double"))
    ihc = (
        F.lit(W_INITIALIZER) * (rn_asc == 1).cast("int").cast("double")
        + F.lit(W_CLOSER) * (rn_desc == 1).cast("int").cast("double")
        + F.lit(W_HOLDER) * holder_share
    )
    return journeys.withColumn("ihc", ihc)


#: Reference redistribution defaults (api_utils.create_redistribution_parameter,
#: api_utils.py:304-339): per-phase direction + receive_threshold; credit earned
#: by sessions of the excluded channels ("Direct" in the reference) is handed to
#: other sessions.
REDIST_DIRECTIONS = {
    "initializer": "earlier_sessions_only",
    "holder": "any_session",
    "closer": "later_sessions_only",
}
REDIST_THRESHOLDS = {"initializer": 0.0, "holder": 0.0, "closer": 0.1}


def ihc_attribute_redistributed(
    journeys: DataFrame,
    excluded_channels: tuple[str, ...] = ("Direct",),
    thresholds: dict[str, float] | None = None,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    session_col: str = "session_id",
    holder_col: str = "holder_engagement",
    channel_col: str = "channel_name",
    out_col: str = "ihc_redistributed",
) -> DataFrame:
    """IHC scoring with the reference's redistribution parameter
    (api_utils.create_redistribution_parameter, api_utils.py:304-339):
    per-phase credit earned by ``excluded_channels`` sessions is
    reassigned to other sessions, preserving the per-conversion
    sum-to-1 invariant.

    Per phase p with weight W_p and phase fraction f_p (initializer: 1
    on the first session; closer: 1 on the last; holder: the holder
    share), per journey:

    - donors: excluded-channel sessions with f_p > 0; donated mass
      d_p = sum(f_p * excluded).
    - receivers, tried in order until non-empty:
        1. non-excluded sessions satisfying the phase direction
           relative to the donor position (earlier_sessions_only /
           later_sessions_only / any_session) with f_p >=
           receive_threshold_p, weighted by f_p;
        2. same set, equal split (when every directional receiver has
           zero phase credit);
        3. direction relaxed to any_session (same threshold),
           weighted by f_p, then equal split;
        4. nobody qualifies -> the donor keeps its credit (the closer
           phase with the reference's 0.1 threshold lands here
           whenever the last session is excluded: no other session
           has closer credit >= 0.1).
    - res_p(s) = f_p(s) * (1 - excluded(s)) + d_p * share_p(s).

    In this closed-form model the initializer/closer donor is the
    journey's first/last session, so the strictly-directional receiver
    sets of step 1 are empty by construction and redistribution
    resolves through steps 3-4 — the documented deviation from the
    reference's learned model, where mid-journey sessions can hold
    initializer/closer credit. Step ordering, not the direction, is
    what the data can observe here.

    Float-parity design: every window SUM is over 0/1 integers (flags,
    ``holder_engagement``), so aggregation order cannot change a bit;
    fractions appear only through per-row divisions of those integer
    sums, mirrored operation-for-operation in ``redistributed_sql``.
    """
    t = {**REDIST_THRESHOLDS, **(thresholds or {})}
    by_conv, asc, _desc = _journey_windows(conv_col, ts_col, session_col)
    rn = F.row_number().over(asc)
    n = F.count(F.lit(1)).over(by_conv)
    h = F.sum(holder_col).over(by_conv)
    base = (
        journeys.withColumn("__rn", rn)
        .withColumn("__n", n)
        .withColumn("__h", h)
        .withColumn("__x", F.col(channel_col).isin(*excluded_channels).cast("int"))
    )
    nx = 1 - F.col("__x")

    def ints(expr):  # integer window sum: order-independent by construction
        return F.sum(expr).over(Window.partitionBy(conv_col))

    def phase(f_int, f_dbl, dir_ok, thr):
        """res_p for one phase. ``f_int`` is the 0/1 integer fraction
        (None for the holder phase, whose fraction is ``f_dbl`` with
        integer numerators ``holder_col``/1 over ``__h``/``__n``)."""
        meets = (f_dbl >= F.lit(thr)).cast("int")
        e1 = nx * dir_ok * meets
        e2 = nx * meets
        if f_int is not None:  # initializer / closer: f in {0, 1}
            d = ints(f_int * F.col("__x"))
            w1, w2 = ints(f_int * e1), ints(f_int * e2)
            num1 = (f_int * e1).cast("double")
            num2 = (f_int * e2).cast("double")
            d_dbl, w1_dbl, w2_dbl = (
                d.cast("double"), w1.cast("double"), w2.cast("double"))
            keep_num = (f_int * F.col("__x")).cast("double")
        else:  # holder: f = holder/h (or 1/n when h == 0), per-conv constant h
            hx = ints(F.col(holder_col) * F.col("__x"))
            he1, he2 = ints(F.col(holder_col) * e1), ints(F.col(holder_col) * e2)
            xs = ints(F.col("__x"))
            e1s_f, e2s_f = ints(e1), ints(e2)
            hpos = F.col("__h") > 0
            hd = F.col("__h").cast("double")
            nd = F.col("__n").cast("double")
            d_dbl = F.when(hpos, hx.cast("double") / hd).otherwise(
                xs.cast("double") / nd)
            w1_dbl = F.when(hpos, he1.cast("double") / hd).otherwise(
                e1s_f.cast("double") / nd)
            w2_dbl = F.when(hpos, he2.cast("double") / hd).otherwise(
                e2s_f.cast("double") / nd)
            num1 = F.when(hpos, (F.col(holder_col) * e1).cast("double") / hd).otherwise(
                e1.cast("double") / nd)
            num2 = F.when(hpos, (F.col(holder_col) * e2).cast("double") / hd).otherwise(
                e2.cast("double") / nd)
            keep_num = f_dbl * F.col("__x").cast("double")
        cnt1, cnt2 = ints(e1), ints(e2)
        share = (
            F.when(w1_dbl > 0, num1 / w1_dbl)
            .when(cnt1 > 0, e1.cast("double") / cnt1.cast("double"))
            .when(w2_dbl > 0, num2 / w2_dbl)
            .when(cnt2 > 0, e2.cast("double") / cnt2.cast("double"))
            .otherwise(F.when(d_dbl > 0, keep_num / d_dbl).otherwise(F.lit(0.0)))
        )
        return f_dbl * nx.cast("double") + d_dbl * share

    i1 = (F.col("__rn") == 1).cast("int")
    c1 = (F.col("__rn") == F.col("__n")).cast("int")
    f_h = F.when(
        F.col("__h") > 0,
        F.col(holder_col).cast("double") / F.col("__h").cast("double"),
    ).otherwise(F.lit(1.0) / F.col("__n").cast("double"))

    res_i = phase(i1, i1.cast("double"),
                  (F.col("__rn") < 1).cast("int"), t["initializer"])
    res_c = phase(c1, c1.cast("double"),
                  (F.col("__rn") > F.col("__n")).cast("int"), t["closer"])
    res_h = phase(None, f_h, F.lit(1), t["holder"])

    out = (
        F.lit(W_INITIALIZER) * res_i
        + F.lit(W_CLOSER) * res_c
        + F.lit(W_HOLDER) * res_h
    )
    return base.withColumn(out_col, out).drop("__rn", "__n", "__h", "__x")


def redistributed_sql(
    excluded_channels: tuple[str, ...],
    thresholds: dict[str, float] | None = None,
) -> str:
    """DuckDB CTE twin of ``ihc_attribute_redistributed`` (appended
    after JOURNEYS_CTE): operation-for-operation the same arithmetic,
    so scores are bit-identical."""
    t = {**REDIST_THRESHOLDS, **(thresholds or {})}
    xl = ", ".join(f"'{c}'" for c in excluded_channels)

    def phase_exprs(p: str, f_int: str | None, dir_sql: str, thr: float):
        """Per-phase column lists for the three nested levels."""
        meets = f"CAST(__f_{p} >= CAST({thr!r} AS DOUBLE) AS INT)"
        lvl2 = [
            f"(1 - __x) * {dir_sql} * {meets} AS __e1_{p}",
            f"(1 - __x) * {meets} AS __e2_{p}",
        ]
        win = "OVER (PARTITION BY conv_id)"
        if f_int is not None:
            lvl3 = [
                f"SUM({f_int} * __x) {win} AS __d_{p}",
                f"SUM({f_int} * __e1_{p}) {win} AS __w1_{p}",
                f"SUM({f_int} * __e2_{p}) {win} AS __w2_{p}",
                f"SUM(__e1_{p}) {win} AS __c1_{p}",
                f"SUM(__e2_{p}) {win} AS __c2_{p}",
            ]
            d = f"CAST(__d_{p} AS DOUBLE)"
            w1 = f"CAST(__w1_{p} AS DOUBLE)"
            w2 = f"CAST(__w2_{p} AS DOUBLE)"
            num1 = f"CAST({f_int} * __e1_{p} AS DOUBLE)"
            num2 = f"CAST({f_int} * __e2_{p} AS DOUBLE)"
            keep = f"CAST({f_int} * __x AS DOUBLE)"
        else:
            lvl3 = [
                f"SUM(holder_engagement * __x) {win} AS __hx",
                f"SUM(holder_engagement * __e1_{p}) {win} AS __he1",
                f"SUM(holder_engagement * __e2_{p}) {win} AS __he2",
                f"SUM(__x) {win} AS __xs",
                f"SUM(__e1_{p}) {win} AS __c1_{p}",
                f"SUM(__e2_{p}) {win} AS __c2_{p}",
            ]
            hpos, hd, nd = "__h > 0", "CAST(__h AS DOUBLE)", "CAST(__n AS DOUBLE)"
            d = f"CASE WHEN {hpos} THEN CAST(__hx AS DOUBLE) / {hd} ELSE CAST(__xs AS DOUBLE) / {nd} END"
            w1 = f"CASE WHEN {hpos} THEN CAST(__he1 AS DOUBLE) / {hd} ELSE CAST(__c1_{p} AS DOUBLE) / {nd} END"
            w2 = f"CASE WHEN {hpos} THEN CAST(__he2 AS DOUBLE) / {hd} ELSE CAST(__c2_{p} AS DOUBLE) / {nd} END"
            num1 = f"CASE WHEN {hpos} THEN CAST(holder_engagement * __e1_{p} AS DOUBLE) / {hd} ELSE CAST(__e1_{p} AS DOUBLE) / {nd} END"
            num2 = f"CASE WHEN {hpos} THEN CAST(holder_engagement * __e2_{p} AS DOUBLE) / {hd} ELSE CAST(__e2_{p} AS DOUBLE) / {nd} END"
            keep = f"__f_{p} * CAST(__x AS DOUBLE)"
        share = (
            f"CASE WHEN {w1} > 0 THEN {num1} / {w1} "
            f"WHEN __c1_{p} > 0 THEN CAST(__e1_{p} AS DOUBLE) / CAST(__c1_{p} AS DOUBLE) "
            f"WHEN {w2} > 0 THEN {num2} / {w2} "
            f"WHEN __c2_{p} > 0 THEN CAST(__e2_{p} AS DOUBLE) / CAST(__c2_{p} AS DOUBLE) "
            f"ELSE CASE WHEN {d} > 0 THEN {keep} / {d} ELSE CAST(0.0 AS DOUBLE) END END"
        )
        res = f"(__f_{p} * CAST(1 - __x AS DOUBLE) + ({d}) * ({share}))"
        return lvl2, lvl3, res

    li2, li3, res_i = phase_exprs(
        "i", "__i1", "CAST(__rn < 1 AS INT)", t["initializer"])
    lc2, lc3, res_c = phase_exprs(
        "c", "__c1", "CAST(__rn > __n AS INT)", t["closer"])
    lh2, lh3, res_h = phase_exprs("h", None, "1", t["holder"])

    return f"""
redistributed AS (
    SELECT conv_id, session_id, channel_name,
           CAST(0.3 AS DOUBLE) * {res_i}
         + CAST(0.3 AS DOUBLE) * {res_c}
         + CAST(0.4 AS DOUBLE) * {res_h} AS ihc_redistributed
    FROM (
        SELECT *, {', '.join(li3 + lc3 + lh3)}
        FROM (
            SELECT *, {', '.join(li2 + lc2 + lh2)}
            FROM (
                SELECT *,
                       CAST(__rn = 1 AS INT)   AS __i1,
                       CAST(__rn = __n AS INT) AS __c1,
                       CAST(CAST(__rn = 1 AS INT) AS DOUBLE)   AS __f_i,
                       CAST(CAST(__rn = __n AS INT) AS DOUBLE) AS __f_c
                FROM (
                    SELECT j.*,
                           ROW_NUMBER() OVER (PARTITION BY conv_id
                                              ORDER BY ts, session_id) AS __rn,
                           COUNT(*) OVER (PARTITION BY conv_id) AS __n,
                           SUM(holder_engagement) OVER (PARTITION BY conv_id) AS __h,
                           CAST(channel_name IN ({xl}) AS INT) AS __x,
                           CASE WHEN SUM(holder_engagement) OVER (PARTITION BY conv_id) > 0
                                THEN CAST(holder_engagement AS DOUBLE)
                                     / CAST(SUM(holder_engagement) OVER (PARTITION BY conv_id) AS DOUBLE)
                                ELSE CAST(1.0 AS DOUBLE)
                                     / CAST(COUNT(*) OVER (PARTITION BY conv_id) AS DOUBLE)
                           END AS __f_h
                    FROM journeys j)
            )
        )
    )
)
"""


# ---------------------------------------------------------------------------
# conv_type_id: the scoring-model selector (api_utils.py:87 routes every
# request to `/compute_ihc?conv_type_id=...` — the API's per-tenant model
# choice). The engine's selector dispatches to named closed-form models;
# every model satisfies the A2 sum-to-1 invariant by construction.
# ---------------------------------------------------------------------------

def _positional(journeys, expr_fn, conv_col, ts_col, session_col):
    by_conv, asc, _ = _journey_windows(conv_col, ts_col, session_col)
    rn = F.row_number().over(asc)
    n = F.count(F.lit(1)).over(by_conv)
    return journeys.withColumn("ihc", expr_fn(rn, n))


def last_touch_attribute(journeys, conv_col="conv_id", ts_col="ts",
                         session_col="session_id") -> DataFrame:
    """All credit to the journey's final session."""
    return _positional(
        journeys, lambda rn, n: (rn == n).cast("int").cast("double"),
        conv_col, ts_col, session_col)


def first_touch_attribute(journeys, conv_col="conv_id", ts_col="ts",
                          session_col="session_id") -> DataFrame:
    """All credit to the journey's first session."""
    return _positional(
        journeys, lambda rn, n: (rn == 1).cast("int").cast("double"),
        conv_col, ts_col, session_col)


def linear_attribute(journeys, conv_col="conv_id", ts_col="ts",
                     session_col="session_id") -> DataFrame:
    """Equal credit to every session."""
    return _positional(
        journeys, lambda rn, n: F.lit(1.0) / n.cast("double"),
        conv_col, ts_col, session_col)


def position_based_attribute(journeys, w_first: float = 0.4,
                             w_last: float = 0.4, conv_col="conv_id",
                             ts_col="ts", session_col="session_id") -> DataFrame:
    """U-shaped: w_first to the first session, w_last to the last, the
    remainder split over the middle; n=1 -> 1.0, n=2 -> renormalized
    endpoints (the standard degenerate cases)."""
    w_mid = 1.0 - w_first - w_last

    def expr(rn, n):
        nd = n.cast("double")
        two_way = F.when(rn == 1, F.lit(w_first) / F.lit(w_first + w_last)).otherwise(
            F.lit(w_last) / F.lit(w_first + w_last))
        u = (
            F.when(rn == 1, F.lit(w_first))
            .when(rn == n, F.lit(w_last))
            .otherwise(F.lit(w_mid) / (nd - F.lit(2.0)))
        )
        return F.when(n == 1, F.lit(1.0)).when(n == 2, two_way).otherwise(u)

    return _positional(journeys, expr, conv_col, ts_col, session_col)


#: conv_type_id -> scoring model (engine twin of the API's model
#: routing). Every model emits its scores in an ``ihc`` column so
#: downstream (report, sinks, A2 check) is model-agnostic.
CONV_TYPE_MODELS = {
    "ihc": ihc_attribute,
    "ihc_redistributed": lambda j, **kw: ihc_attribute_redistributed(
        j, out_col="ihc", **kw
    ),
    "last_touch": last_touch_attribute,
    "first_touch": first_touch_attribute,
    "linear": linear_attribute,
    "position_based": position_based_attribute,
}


def attribute_by_conv_type(
    journeys: DataFrame, conv_type_id: str = "ihc", **model_kwargs
) -> DataFrame:
    """Score journeys with the model selected by ``conv_type_id``
    (api_utils.py:87). Unknown ids raise with the available choices —
    the engine's version of the API's 4xx on a bad conv_type_id."""
    try:
        model = CONV_TYPE_MODELS[conv_type_id]
    except KeyError:
        raise ValueError(
            f"unknown conv_type_id {conv_type_id!r}; "
            f"available: {sorted(CONV_TYPE_MODELS)}"
        ) from None
    return model(journeys, **model_kwargs)


def save_scoring_audit(
    scored: DataFrame,
    output_dir: str,
    prefix: str = "ihc_response",
    run_id: str = "run",
    conv_col: str = "conv_id",
    ihc_col: str = "ihc",
) -> str:
    """Audit dump of scoring results (api_utils.save_api_response:
    215-244): scores as JSON-lines plus a small meta file with the
    invariant stats an auditor checks first. Deviations from the
    reference, deliberately: the filename key is an explicit ``run_id``
    (not a wall-clock timestamp — engine outputs are deterministic) and
    the scores go through the distributed JSON sink, not the driver.
    Returns the meta file path."""
    import json
    import os

    scores_path = os.path.join(output_dir, f"{prefix}_{run_id}")
    scored.write.mode("overwrite").json(scores_path)
    stats = scored.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct(conv_col).alias("conversions"),
        F.min(ihc_col).alias("min_score"),
        F.max(ihc_col).alias("max_score"),
    ).collect()[0]
    violations = attribution_sum_violations(scored, conv_col, ihc_col).count()
    os.makedirs(output_dir, exist_ok=True)
    meta_path = os.path.join(output_dir, f"{prefix}_{run_id}_meta.json")
    with open(meta_path, "w") as f:
        json.dump(
            {
                "rows": stats.rows,
                "conversions": stats.conversions,
                "min_score": stats.min_score,
                "max_score": stats.max_score,
                "sum_to_one_violations": violations,
                "scores_path": scores_path,
            },
            f,
            indent=2,
        )
    return meta_path


def attribution_sum_violations(
    attribution: DataFrame,
    conv_col: str = "conv_id",
    ihc_col: str = "ihc",
    tolerance: float = 0.001,
) -> DataFrame:
    """A2: conversions whose ihc does not sum to 1 +- tolerance
    (db_utils.check_attribution_sums:227-258)."""
    return (
        attribution.groupBy(conv_col)
        .agg(F.sum(ihc_col).alias("ihc_sum"))
        .filter(F.abs(F.col("ihc_sum") - 1.0) > tolerance)
    )
