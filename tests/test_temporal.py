"""Temporal joins (operators/temporal.py) with hand-checkable answers."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from neo4j_graphdb_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def events(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2026-01-01 10:00:30")),
            (2, 10, _ts("2026-01-01 10:02:00")),
            (3, 20, _ts("2026-01-01 09:00:00")),  # no earlier right event
            (4, 30, _ts("2026-01-01 12:00:00")),  # exact-ts tie with right
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (101, 10, _ts("2026-01-01 10:00:00"), 5.0),
            (102, 10, _ts("2026-01-01 10:01:00"), 7.0),
            (103, 20, _ts("2026-01-01 09:30:00"), 9.0),
            (104, 30, _ts("2026-01-01 12:00:00"), 3.0),
        ],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    return left, right


def test_asof_join_backward_inclusive(spark, events):
    left, right = events
    out = {
        r["event_id"]: (r["event_id_m"], r["value_m"])
        for r in asof_join(
            left, right, ["user_id"], "ts", right_cols=["event_id", "value"]
        ).collect()
    }
    assert out[1] == (101, 5.0)  # 10:00:30 → latest right at 10:00:00
    assert out[2] == (102, 7.0)  # 10:02:00 → 10:01:00 beats 10:00:00
    assert out[3] == (None, None)  # right event is later — no match
    assert out[4] == (104, 3.0)  # equal ts matches (inclusive)


def test_range_join_band(spark, events):
    left, right = events
    pairs = {
        (r["l_event_id"], r["r_event_id"]): r["gap_sec"]
        for r in range_join(left, right, ["user_id"], window_sec=90.0).collect()
    }
    # click 1 @10:00:30: right 101 @10:00:00 is 30s before (in band)
    # click 2 @10:02:00: right 102 @10:01:00 is 60s (in), 101 is 120s (out)
    # click 3: right is after it (out); click 4: gap 0 excluded (gap > 0)
    assert pairs == {(1, 101): 30.0, (2, 102): 60.0}


def test_range_join_bucket_boundary(spark):
    """A match whose gap equals the window lands in the previous bucket —
    the 2-bucket probe must still find it."""
    left = spark.createDataFrame(
        [(1, 1, _ts("2026-01-01 10:01:40"))],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(2, 1, _ts("2026-01-01 10:00:00"))],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    got = range_join(left, right, ["user_id"], window_sec=100.0).collect()
    assert len(got) == 1 and got[0]["gap_sec"] == 100.0
