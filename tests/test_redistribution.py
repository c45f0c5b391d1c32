"""Property tests for the IHC redistribution parameter
(operators/ihc.py::ihc_attribute_redistributed — the native form of the
reference's api_utils.create_redistribution_parameter:304-339).

Spark==oracle parity is covered by the registry gate
(tests/test_oracle_parity.py, entry `ihc_redistributed`); these prove
the semantics: invariant preservation, credit actually moving off the
excluded channel, the closer threshold protecting last-touch credit,
and no-op behavior where no excluded session exists.
"""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from haensel_ams_data_engineer_challenge_spark.attribution import model as M
from haensel_ams_data_engineer_challenge_spark.operators.ihc import (
    ihc_attribute,
    ihc_attribute_redistributed,
)

EXCLUDED = ("view",)


@pytest.fixture(scope="module")
def journeys(spark, sf_dir):
    df = M.journeys(spark, sf_dir)
    df.cache().count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def scored_both(journeys):
    base = ihc_attribute(journeys).select("conv_id", "session_id", "channel_name", "ihc")
    redist = ihc_attribute_redistributed(journeys, excluded_channels=EXCLUDED).select(
        "conv_id", "session_id", "channel_name", "ihc_redistributed"
    )
    return (
        base.join(redist, ["conv_id", "session_id", "channel_name"])
        .collect()
    )


def test_sum_to_one_preserved(scored_both):
    sums: dict[str, float] = defaultdict(float)
    for r in scored_both:
        sums[r.conv_id] += r.ihc_redistributed
    bad = {c: s for c, s in sums.items() if abs(s - 1.0) > 1e-9}
    assert not bad


def test_credit_moves_off_excluded_channel(scored_both):
    base_x = sum(r.ihc for r in scored_both if r.channel_name in EXCLUDED)
    red_x = sum(r.ihc_redistributed for r in scored_both if r.channel_name in EXCLUDED)
    assert red_x < base_x * 0.5  # the bulk of excluded credit moved
    # and scores stay valid probabilities
    assert all(-1e-12 <= r.ihc_redistributed <= 1.0 + 1e-12 for r in scored_both)


def test_journeys_without_excluded_sessions_unchanged(scored_both):
    by_conv: dict[str, list] = defaultdict(list)
    for r in scored_both:
        by_conv[r.conv_id].append(r)
    untouched = [
        rs for rs in by_conv.values()
        if all(r.channel_name not in EXCLUDED for r in rs)
    ]
    assert untouched, "testdata should contain journeys with no excluded session"
    for rs in untouched:
        for r in rs:
            assert r.ihc_redistributed == pytest.approx(r.ihc, abs=1e-12)


def test_closer_threshold_protects_last_touch(journeys):
    """With the reference's closer receive_threshold=0.1, no other
    session has closer-phase credit >= 0.1, so an excluded LAST session
    keeps its 0.3 closer weight — lowering the threshold to 0 releases
    it. Verified on the aggregate: threshold-0 moves strictly more
    credit off the excluded channel."""
    default = ihc_attribute_redistributed(journeys, excluded_channels=EXCLUDED)
    relaxed = ihc_attribute_redistributed(
        journeys, excluded_channels=EXCLUDED, thresholds={"closer": 0.0}
    )

    def x_total(df):
        return (
            df.filter(F.col("channel_name").isin(*EXCLUDED))
            .agg(F.sum("ihc_redistributed"))
            .collect()[0][0]
        )

    t_default, t_relaxed = x_total(default), x_total(relaxed)
    assert t_relaxed < t_default
