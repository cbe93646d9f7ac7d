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


def test_time_rollup_hierarchical_equals_direct(spark):
    """Hand-checkable multi-resolution rollup: minute buckets aggregate
    raw rows; hour and day levels re-aggregate the previous rollup and
    must equal direct aggregation (decimal sums are associative)."""
    from neo4j_graphdb_spark.operators.temporal import time_rollup

    rows = [
        ("a", 1.1, _ts("2026-01-01 10:00:10")),
        ("a", 2.2, _ts("2026-01-01 10:00:50")),  # same minute as above
        ("a", 4.4, _ts("2026-01-01 10:59:00")),  # same hour, new minute
        ("a", 8.8, _ts("2026-01-01 23:30:00")),  # same day, new hour
        ("b", 0.5, _ts("2026-01-01 10:00:20")),  # other dim, same minute
        ("a", 16.0, _ts("2026-01-02 00:00:00")),  # next day
    ]
    ev = spark.createDataFrame(rows, "event_type string, value double, ts timestamp")
    out = time_rollup(ev, "ts", ["event_type"], "value")
    got = {
        (r["resolution"], str(r["bucket"]), r["event_type"]): (
            r["n_events"], r["sum_value"], r["min_value"], r["max_value"]
        )
        for r in out.collect()
    }
    assert got[("minute", "2026-01-01 10:00:00", "a")] == (2, 3.3, 1.1, 2.2)
    assert got[("minute", "2026-01-01 10:00:00", "b")] == (1, 0.5, 0.5, 0.5)
    assert got[("hour", "2026-01-01 10:00:00", "a")] == (3, 7.7, 1.1, 4.4)
    assert got[("day", "2026-01-01 00:00:00", "a")] == (4, 16.5, 1.1, 8.8)
    assert got[("day", "2026-01-02 00:00:00", "a")] == (1, 16.0, 16.0, 16.0)
    # 4 a-minutes + 1 b-minute + 3 a-hours + 1 b-hour + 2 a-days + 1 b-day
    assert len(got) == 12


def test_gap_fill_locf_and_interp(spark):
    from neo4j_graphdb_spark.operators.temporal import gap_fill

    # key "a": bucket 0 holds two events (sum 10), buckets 1-2 are a gap,
    # bucket 3 observes 4 — LOCF carries 10 across the gap while the
    # interpolation walks 10 -> 4 linearly
    df = spark.createDataFrame(
        [
            ("a", _ts("2026-01-01 00:00:10"), 4.0),
            ("a", _ts("2026-01-01 00:00:40"), 6.0),   # bucket 0 sum=10
            ("a", _ts("2026-01-01 00:03:30"), 4.0),   # bucket 3
            ("b", _ts("2026-01-01 00:00:00"), 1.0),   # single-bucket key
        ],
        "k string, ts timestamp, value double",
    )
    out = {
        (r["k"], r["bucket"].minute): r
        for r in gap_fill(df, ["k"], "ts", "value", bucket_sec=60).collect()
    }
    assert len(out) == 5  # a: minutes 0-3, b: minute 0
    a0, a1, a2, a3 = (out[("a", m)] for m in range(4))
    assert a0["is_observed"] and a0["value_locf"] == 10.0 and a0["value_interp"] == 10.0
    # gap buckets: LOCF carries 10.0; interp walks 10 -> 4 linearly
    assert not a1["is_observed"] and a1["value_locf"] == 10.0
    assert a1["value_interp"] == pytest.approx(8.0)
    assert a2["value_interp"] == pytest.approx(6.0)
    assert a3["is_observed"] and a3["value_locf"] == 4.0
    b0 = out[("b", 0)]
    assert b0["is_observed"] and b0["value_locf"] == 1.0 and b0["value_interp"] == 1.0


def test_gap_fill_leading_buckets_stay_null(spark):
    from neo4j_graphdb_spark.operators.temporal import gap_fill

    # span starts at the key's FIRST observation — no leading buckets are
    # invented; a trailing gap would carry LOCF but NULL interp (no next)
    df = spark.createDataFrame(
        [
            ("a", _ts("2026-01-01 00:05:00"), 2.0),
            ("a", _ts("2026-01-01 00:07:30"), 8.0),
        ],
        "k string, ts timestamp, value double",
    )
    rows = sorted(
        gap_fill(df, ["k"], "ts", "value", bucket_sec=60).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"].minute for r in rows] == [5, 6, 7]
    assert [r["is_observed"] for r in rows] == [True, False, True]
    mid = rows[1]
    assert mid["value_locf"] == 2.0 and mid["value_interp"] == pytest.approx(5.0)


def test_incremental_rollup_fold_equals_recompute(spark, tmp_path):
    """Three arbitrary slices folded into the versioned rollup equal one
    direct aggregation — including buckets present in only one slice —
    and each merge publishes a new version."""
    from datetime import datetime

    from neo4j_graphdb_spark.operators.temporal import incremental_rollup, time_rollup
    from neo4j_graphdb_spark.writer import TableVersions

    rows = [
        (i, datetime(2024, 1, 1, 10, i % 3, 5 * (i % 7)), float(i) / 8)
        for i in range(40)
    ]
    ev = spark.createDataFrame(rows, "event_id bigint, ts timestamp, value double")
    versions = TableVersions(str(tmp_path / "tv"))
    v0 = versions.current_version()
    out = None
    for i in range(3):
        out = incremental_rollup(spark, versions, ev.filter(F.col("event_id") % 3 == i))
    assert versions.current_version() == v0 + 3  # one published version per merge

    direct = {
        str(r["bucket"]): (r["n_events"], float(r["_s"]), r["min_value"], r["max_value"])
        for r in ev.groupBy(F.date_trunc("minute", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("_s"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    got = {
        str(r["bucket"]): (
            r["n_events"], float(r["sum_value"]), r["min_value"], r["max_value"]
        )
        for r in out.collect()
    }
    assert got == direct


def test_pit_join_validity_semantics(spark, monkeypatch):
    """PIT containment: a fact picks the version valid AT its timestamp
    (inclusive start, exclusive end); same-ts duplicate versions
    collapse to the later one; facts before any version drop."""
    from datetime import datetime

    import neo4j_graphdb_spark.registry as reg

    t = lambda s: datetime(2024, 1, 1, 12, 0, s)
    ev = spark.createDataFrame(
        [
            # user 1 profile versions at t0, t10 (dup at t10), t20
            (100, t(0), 1, "view", 1.0, None),
            (101, t(10), 1, "view", 2.0, None),
            (102, t(10), 1, "view", 3.0, None),  # same ts: 101's interval empty
            (103, t(20), 1, "view", 4.0, None),
            # purchases: before any version / at a boundary / between / after last
            (200, t(5), 1, "purchase", 0.0, None),
            (201, t(10), 1, "purchase", 0.0, None),
            (202, t(15), 1, "purchase", 0.0, None),
            (203, t(30), 1, "purchase", 0.0, None),
            (204, t(1), 2, "purchase", 0.0, None),  # user with no versions
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    monkeypatch.setattr(reg, "load_table", lambda s, d, n: ev)
    got = {
        r["purchase_id"]: (r["profile_id"], r["profile_value"])
        for r in reg.q_rel_pit_join(spark, "ignored").collect()
    }
    assert got == {
        200: (100, 1.0),   # only v100 valid at t5
        201: (102, 3.0),   # boundary: inclusive start of the t10 version; dup 101 empty
        202: (102, 3.0),
        203: (103, 4.0),   # open-ended last version
    }


def test_sax_words_hand_checked(spark):
    """SAX on a hand-built two-week series: rising ramp maps to a
    monotone word, constant series has σ=0 handled by construction
    (no constant groups in fixture; here we assert the ramp only)."""
    from datetime import datetime
    from neo4j_graphdb_spark.operators.temporal import sax_words

    rows = []
    for d in range(12):
        # daily totals 1..12: strictly rising ramp
        rows.append(("ramp", datetime(2026, 1, 1 + d), float(d + 1)))
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double")
    out = sax_words(df, "ts", "value", "g", days_per_seg=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 12
    assert r["mu"] == 6.5
    # 4 segments averaging (2, 5, 8, 11) → z strictly rising → word
    # visits a < b < c < d in order
    assert r["sax_word"] == "abcd"
    out2 = sax_words(df.repartition(5), "ts", "value", "g").collect()
    assert out == out2


def test_session_markov_hand_checked(spark):
    """Transitions stay inside session boundaries: a >30-min gap breaks
    the chain, probabilities normalize per source state."""
    from datetime import datetime, timedelta
    import __spark_entry__  # noqa: F401  (ensures registry importable)
    from neo4j_graphdb_spark.registry import q_c128_session_markov
    import tempfile, os
    from pyspark.sql import functions as F

    base = datetime(2026, 3, 1, 12, 0, 0)
    rows = [
        # user 1, session 1: A -> B -> A
        (1, 1, base, "A", 0.0, "{}"),
        (2, 1, base + timedelta(minutes=1), "B", 0.0, "{}"),
        (3, 1, base + timedelta(minutes=2), "A", 0.0, "{}"),
        # gap > 30 min: new session, single event (no transition out)
        (4, 1, base + timedelta(minutes=60), "B", 0.0, "{}"),
        # user 2: B -> B
        (5, 2, base, "B", 0.0, "{}"),
        (6, 2, base + timedelta(minutes=5), "B", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        # the fixture layout is a single parquet FILE per table
        p = os.path.join(d, "events.parquet")
        df.toPandas().to_parquet(p, index=False)
        out = {(r["src"], r["dst"]): r
               for r in q_c128_session_markov(spark, d).collect()}
    # transitions: A->B (1), B->A (1), B->B (1); the 60-min B never
    # links back to the earlier session
    assert out[("A", "B")]["cnt"] == 1 and out[("A", "B")]["p"] == 1.0
    assert out[("B", "A")]["cnt"] == 1 and out[("B", "A")]["p"] == 0.5
    assert out[("B", "B")]["cnt"] == 1 and out[("B", "B")]["p"] == 0.5
    assert len(out) == 3


def test_where_temporal_expression_operands(spark):
    """Temporal expressions compose as GENERAL WHERE operands (r15):
    `datetime() - duration(…) < datetime()` — a sentinel landing in an
    expression-form conjunct unstashes back to its source text, which
    the scalar compiler handles natively (the stash exists only for the
    simple prop-op-value grammar)."""
    from neo4j_graphdb_spark.model import as_nodes
    from neo4j_graphdb_spark.operators.cypher import Graph
    from neo4j_graphdb_spark.operators.cypher_text import run_cypher
    from neo4j_graphdb_spark.session import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        F.col("event_id").cast("string").alias("k"), "ts"
    )
    g = Graph(as_nodes(ev, "Ev", "k", ["ts"]), None)
    total = run_cypher(
        spark, "MATCH (e:Ev) RETURN count(*) AS n", graph=g
    ).df.collect()[0]["n"]
    n = run_cypher(
        spark,
        "MATCH (e:Ev) WHERE datetime() - duration('P1D') < datetime() "
        "RETURN count(*) AS n",
        graph=g,
    ).df.collect()[0]["n"]
    assert n == total  # constant-true temporal conjunct keeps all rows
    n = run_cypher(
        spark,
        "MATCH (e:Ev) WHERE datetime() + duration('P1D') < datetime() "
        "RETURN count(*) AS n",
        graph=g,
    ).df.collect()[0]["n"]
    assert n == 0  # constant-false drops all
