from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from haensel_ams_data_engineer_challenge_spark.session import get_spark

    spark = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def ckpt_dir(spark, tmp_path_factory) -> str:
    """Session-owned SparkContext checkpoint dir (round-5 advice).

    The checkpoint dir is session-global and ensure_checkpoint_dir
    refuses to move it once set, so exactly one fixture owns it: every
    test that exercises reliable checkpoints depends on this fixture
    and uses ITS path — file ordering, ``-k`` selection, and xdist
    scheduling are all irrelevant to which dir wins.
    """
    from haensel_ams_data_engineer_challenge_spark.checkpoint import (
        ensure_checkpoint_dir,
    )

    d = str(tmp_path_factory.mktemp("spark-ckpt"))
    ensure_checkpoint_dir(spark.sparkContext, d)
    return d


def pytest_collection_modifyitems(config, items):
    """Auto-mark the tests listed in tests/slow_tests.txt as `slow`
    (round 16): pytest.ini deselects them by default so the round
    driver's `pytest tests/ -x -q` completes inside its budget; the
    full tier runs with -m "slow or not slow".  Node ids that no
    longer exist are ignored (the list is regenerated from
    --durations=0 runs, not hand-maintained)."""
    listing = Path(__file__).parent / "slow_tests.txt"
    if not listing.exists():
        return
    slow_ids = {
        line.strip()
        for line in listing.read_text().splitlines()
        if line.strip() and not line.startswith("#")
    }
    for item in items:
        if item.nodeid in slow_ids:
            item.add_marker(pytest.mark.slow)
