"""conv_type_id scoring-model selector (api_utils.py:87) + audit dump
(api_utils.save_api_response:215-244): every selectable model preserves
the A2 sum-to-1 invariant; the classic models produce their textbook
credit assignments; unknown ids fail loudly like the API's 4xx.
"""

from __future__ import annotations

import json
from collections import defaultdict

import pytest

from haensel_ams_data_engineer_challenge_spark.attribution import model as M
from haensel_ams_data_engineer_challenge_spark.operators.ihc import (
    CONV_TYPE_MODELS,
    attribute_by_conv_type,
    save_scoring_audit,
)


@pytest.fixture(scope="module")
def journeys(spark, sf_dir):
    df = M.journeys(spark, sf_dir)
    df.cache().count()
    yield df
    df.unpersist()


@pytest.mark.parametrize("conv_type_id", sorted(CONV_TYPE_MODELS))
def test_every_model_sums_to_one(journeys, conv_type_id):
    kwargs = (
        {"excluded_channels": ("view",)}
        if conv_type_id == "ihc_redistributed"
        else {}
    )
    scored = attribute_by_conv_type(journeys, conv_type_id, **kwargs)
    rows = scored.select("conv_id", "ihc").collect()
    sums: dict[str, float] = defaultdict(float)
    for r in rows:
        assert -1e-12 <= r.ihc <= 1.0 + 1e-12, conv_type_id
        sums[r.conv_id] += r.ihc
    bad = {c: s for c, s in sums.items() if abs(s - 1.0) > 1e-9}
    assert not bad, (conv_type_id, list(bad.items())[:3])


def test_classic_models_textbook_credit(journeys):
    """On a known multi-session journey: last/first touch put all
    credit on one end, linear splits evenly, position-based is
    U-shaped."""
    by_conv: dict[str, list] = defaultdict(list)
    sample = journeys.select("conv_id", "session_id", "ts").collect()
    for r in sample:
        by_conv[r.conv_id].append(r)
    conv_id, sess = next(
        (c, sorted(rs, key=lambda r: (r.ts, r.session_id)))
        for c, rs in by_conv.items()
        if len(rs) >= 3
    )
    n = len(sess)

    def scores(model):
        out = attribute_by_conv_type(journeys, model).filter(
            f"conv_id = '{conv_id}'"
        )
        return {r.session_id: r.ihc for r in out.collect()}

    last = scores("last_touch")
    assert last[sess[-1].session_id] == 1.0
    assert sum(last.values()) == 1.0

    first = scores("first_touch")
    assert first[sess[0].session_id] == 1.0

    linear = scores("linear")
    assert all(v == pytest.approx(1.0 / n) for v in linear.values())

    u = scores("position_based")
    assert u[sess[0].session_id] == pytest.approx(0.4)
    assert u[sess[-1].session_id] == pytest.approx(0.4)
    for mid in sess[1:-1]:
        assert u[mid.session_id] == pytest.approx(0.2 / (n - 2))


def test_unknown_conv_type_id_raises(journeys):
    with pytest.raises(ValueError, match="unknown conv_type_id"):
        attribute_by_conv_type(journeys, "nope")


def test_save_scoring_audit_writes_scores_and_meta(spark, sf_dir, tmp_path, journeys):
    scored = attribute_by_conv_type(journeys, "linear").select(
        "conv_id", "session_id", "ihc"
    )
    meta_path = save_scoring_audit(
        scored, str(tmp_path), prefix="audit", run_id="t1"
    )
    meta = json.loads(open(meta_path).read())
    assert meta["sum_to_one_violations"] == 0
    assert meta["rows"] > 0 and meta["conversions"] > 0
    assert 0.0 <= meta["min_score"] <= meta["max_score"] <= 1.0
    dumped = spark.read.json(meta["scores_path"])
    assert dumped.count() == meta["rows"]
    assert set(dumped.columns) == {"conv_id", "session_id", "ihc"}
