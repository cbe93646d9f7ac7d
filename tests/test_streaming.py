"""Tier C13-C17: streaming operators on the real streaming engine
(availableNow triggers, memory/foreachBatch sinks)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from neo4j_graphdb_spark.session import load_table, stream_table
from neo4j_graphdb_spark.streaming.ingest import run_stream_to_memory, stream_upsert_sink
from neo4j_graphdb_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    stream_dedup,
    tumbling_window_agg,
)


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def tiny_events(spark):
    rows = [
        (1, ts("2024-01-01 00:05:00"), 7, "click", 1.0),
        (2, ts("2024-01-01 00:20:00"), 7, "click", 2.0),
        (3, ts("2024-01-01 01:10:00"), 7, "view", 4.0),
        (4, ts("2024-01-01 00:30:00"), 8, "click", 8.0),
        (1, ts("2024-01-01 00:05:00"), 7, "click", 1.0),  # duplicate event_id
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )


def test_tumbling_window_batch(spark, tiny_events):
    out = {
        (r["window_start"].isoformat(), ): (r["n_events"], r["sum_value"])
        for r in tumbling_window_agg(tiny_events, width="1 hour", value_col="value").collect()
    }
    assert out[("2024-01-01T00:00:00",)] == (4, 12.0)
    assert out[("2024-01-01T01:00:00",)] == (1, 4.0)


def test_sliding_window_batch(spark, tiny_events):
    rows = sliding_window_agg(tiny_events, width="1 hour", slide="30 minutes").collect()
    got = {r["window_start"].isoformat(): r["n_events"] for r in rows}
    # events at 00:05(x2),00:20,00:30 → window 23:30 has 3, 00:00 has 4,
    # 00:30 has 2 (00:30 event + 01:10), 01:00 has 1
    assert got["2024-01-01T00:00:00"] == 4
    assert got["2023-12-31T23:30:00"] == 3


def test_session_window_batch(spark, tiny_events):
    rows = session_window_agg(tiny_events, gap="30 minutes", key_col="user_id").collect()
    sess = {(r["user_id"], r["session_start"].isoformat()): r["n_events"] for r in rows}
    # user 7: 00:05,00:05,00:20 chain (gap<=30m) = one session of 3;
    # 01:10 separate; user 8: one session
    assert sess[(7, "2024-01-01T00:05:00")] == 3
    assert sess[(7, "2024-01-01T01:10:00")] == 1
    assert sess[(8, "2024-01-01T00:30:00")] == 1


def test_stream_windows_on_real_stream(spark, sf_dir):
    """The same tumbling transformation over readStream must agree with
    the batch run — stream/batch parity is the Structured Streaming
    contract."""
    stream = stream_table(spark, sf_dir, "events")
    agg = tumbling_window_agg(stream, width="1 day", watermark="1 day", value_col="value")
    streamed = run_stream_to_memory(spark, agg, output_mode="complete")
    batch = tumbling_window_agg(
        load_table(spark, sf_dir, "events"), width="1 day", value_col="value"
    )
    s = {(r["window_start"], r["n_events"], round(r["sum_value"], 6)) for r in streamed.collect()}
    b = {(r["window_start"], r["n_events"], round(r["sum_value"], 6)) for r in batch.collect()}
    assert s == b


def test_stream_dedup(spark, tmp_path, tiny_events):
    src_dir = str(tmp_path / "events_src")
    tiny_events.write.parquet(src_dir)
    stream = spark.readStream.schema(tiny_events.schema).parquet(src_dir)
    deduped = stream_dedup(stream, ["event_id"], ts_col="ts", watermark="1 day")
    out = run_stream_to_memory(spark, deduped, output_mode="append")
    assert out.count() == 4  # 5 rows, one duplicate event_id dropped


def test_stateful_running_totals(spark, tmp_path, tiny_events):
    """applyInPandasWithState: state must persist ACROSS micro-batches —
    two files + maxFilesPerTrigger=1 forces two batches; the final
    running totals must equal the global batch aggregate."""
    from neo4j_graphdb_spark.streaming.stateful import running_totals

    src = str(tmp_path / "src")
    rows = tiny_events.collect()
    for chunk in (rows[:3], rows[3:]):  # subtract would drop the dup row
        spark.createDataFrame(chunk, tiny_events.schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(tiny_events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = run_stream_to_memory(
        spark, running_totals(stream, key_col="user_id"), output_mode="update"
    )
    # update mode emits one row per key per batch and the sink does not
    # guarantee order — running totals are monotone, so max = latest
    pdf = out.toPandas()
    last = pdf.groupby("key").max()
    expected = {
        r["user_id"]: (r["n"], r["v"])
        for r in tiny_events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    for k, (n, v) in expected.items():
        assert last.loc[k, "total_events"] == n
        assert last.loc[k, "total_value"] == pytest.approx(v)


def test_embedding_near_dup_exact_vs_lsh(spark, sf_dir):
    from neo4j_graphdb_spark.operators.dedup import embedding_near_dup_pairs
    from neo4j_graphdb_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.35, method="exact").collect()
    }
    assert exact  # threshold chosen to be non-trivial on the fixtures
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            emb, threshold=0.35, method="lsh", dim=64, num_tables=8, num_bits=3
        ).collect()
    }
    assert lsh <= exact  # LSH candidates are verified exactly → no false positives
    assert len(lsh) / len(exact) >= 0.5  # recall floor


def test_stream_upsert_sink(spark, tmp_path, sf_dir):
    """C13: micro-batch MERGE via foreachBatch, then idempotent re-run."""
    from neo4j_graphdb_spark.writer import GraphStore

    stream = stream_table(spark, sf_dir, "documents").select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("link"),
        F.substring("text", 1, 40).alias("title"),
    )
    store = GraphStore(spark, str(tmp_path / "g"))
    q = stream_upsert_sink(
        stream, store, label="Article", key_col="link", prop_cols=["title"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    n = store.nodes().count()
    assert n == load_table(spark, sf_dir, "documents").count()
    assert sum(s.nodes_created for s in q._upsert_summaries) == n


def test_stream_interval_join_matches_batch_range_join(spark):
    """C19: the watermarked stream-stream join yields exactly the batch
    range_join's pairs on the same data (same interval semantics), and
    the same definition runs on plain batch frames."""
    from neo4j_graphdb_spark.operators.temporal import range_join
    from neo4j_graphdb_spark.streaming.joins import stream_interval_join

    rows = [
        # (user, ts, id) — u1: purchase 30m before click (match), purchase
        # 2h before (no), simultaneous (no); u2: cross-user (no)
        ("u1", "2024-01-01 10:00:00", 1),
        ("u2", "2024-01-01 10:00:00", 2),
    ]
    buys = [
        ("u1", "2024-01-01 09:30:00", 101),
        ("u1", "2024-01-01 07:55:00", 102),
        ("u1", "2024-01-01 10:00:00", 103),
        ("u2", "2024-01-01 09:59:00", 104),
    ]
    mk = lambda data: spark.createDataFrame(
        data, "user_id string, ts_s string, event_id int"
    ).selectExpr("user_id", "cast(ts_s as timestamp) as ts", "event_id")
    clicks_df, buys_df = mk(rows), mk(buys)

    batch = stream_interval_join(clicks_df, buys_df, ["user_id"], 3600.0)
    got = sorted(
        (r["l_event_id"], r["r_event_id"], r["gap_sec"]) for r in batch.collect()
    )
    assert got == [(1, 101, 1800.0), (2, 104, 60.0)]

    rj = range_join(clicks_df, buys_df, ["user_id"], 3600.0)
    ref = sorted(
        (r["l_event_id"], r["r_event_id"], r["gap_sec"]) for r in rj.collect()
    )
    assert got == ref


def test_stream_static_enrich_matches_batch_and_broadcasts(spark, sf_dir):
    """C26: the stream-static join equals the plain batch join on the
    same data, and the dimension side is broadcast (the stream side must
    never shuffle for a dimension lookup)."""
    from neo4j_graphdb_spark.session import load_table, stream_table
    from neo4j_graphdb_spark.streaming.ingest import run_stream_to_memory
    from neo4j_graphdb_spark.streaming.joins import stream_static_enrich

    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    ev_stream = stream_table(spark, sf_dir, "events")
    got = run_stream_to_memory(
        spark, stream_static_enrich(ev_stream, dim, on=["user_id"]), output_mode="append"
    )
    ev_batch = load_table(spark, sf_dir, "events")
    ref = stream_static_enrich(ev_batch, dim, on=["user_id"])
    assert got.count() == ref.count()
    g = got.groupBy("c_nationkey").count().collect()
    r = {x["c_nationkey"]: x["count"] for x in ref.groupBy("c_nationkey").count().collect()}
    assert {x["c_nationkey"]: x["count"] for x in g} == r

    plan = ref._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_stream_rollup_cascade_matches_batch_rollup(spark, sf_dir):
    """C35: minute level maintained by the streaming engine, hour/day
    re-aggregated from it in batch — value-identical to the all-batch
    time_rollup cascade (decimal sums are associative, so maintenance
    strategy cannot change the numbers)."""
    from neo4j_graphdb_spark.operators.temporal import time_rollup
    from neo4j_graphdb_spark.registry import q_c35_stream_rollup
    from neo4j_graphdb_spark.session import load_table

    got = {
        (r["resolution"], r["bucket"], r["event_type"]): (
            r["n_events"], r["sum_value"], r["min_value"], r["max_value"]
        )
        for r in q_c35_stream_rollup(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select("event_type", "value", "ts")
    want = {
        (r["resolution"], r["bucket"], r["event_type"]): (
            r["n_events"], r["sum_value"], r["min_value"], r["max_value"]
        )
        for r in time_rollup(ev, "ts", ["event_type"], "value").collect()
    }
    assert got == want


def test_stateful_sessions_gap_close_and_timeout(spark, tmp_path):
    """C51 emit rules across micro-batches: a later event breaking the
    30-min gap closes the open session (user 1), and the event-time
    timeout closes a silent user's session once the watermark passes
    end+gap (user 2). Open tails never emit."""
    from neo4j_graphdb_spark.streaming.ingest import run_stream_to_memory
    from neo4j_graphdb_spark.streaming.stateful import stateful_sessions

    schema = "user_id bigint, ts timestamp"
    batches = [
        [(1, ts("2024-01-01 10:00:00")), (1, ts("2024-01-01 10:10:00")),
         (2, ts("2024-01-01 09:00:00"))],
        [(1, ts("2024-01-01 10:20:00")), (1, ts("2024-01-01 12:00:00"))],
        [(3, ts("2024-01-01 13:00:00"))],
    ]
    src = str(tmp_path / "sess_src")
    for chunk in batches:
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = run_stream_to_memory(
        spark,
        stateful_sessions(stream, gap_seconds=1800, watermark="1 minutes"),
        output_mode="append",
    )
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in out.collect()
    }
    assert got == {
        # closed by the 12:00 event breaking the gap
        (1, "2024-01-01 10:00:00", "2024-01-01 10:20:00", 3),
        # closed by event-time timeout (final watermark 12:59 > 09:30)
        (2, "2024-01-01 09:00:00", "2024-01-01 09:00:00", 1),
        # closed by timeout in the trailing no-data batch (12:59 > 12:30)
        (1, "2024-01-01 12:00:00", "2024-01-01 12:00:00", 1),
        # u3 @13:00 stays open: its timeout 13:30 is past the last watermark
    }


def test_stream_outer_join_emits_unmatched(spark, tmp_path):
    """LEFT OUTER stream-stream join must emit BOTH the matched click
    (with its purchase) and the never-matched click (null-extended) —
    the latter only after heartbeat batches advance both watermarks past
    its eviction point."""
    import os
    import time

    from neo4j_graphdb_spark.streaming.ingest import run_stream_to_memory
    from neo4j_graphdb_spark.streaming.joins import stream_interval_join

    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    b0 = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 12, 10, 0), 100, "click"),
            (2, datetime(2024, 1, 1, 12, 5, 0), 100, "purchase"),
            (3, datetime(2024, 1, 1, 12, 0, 0), 200, "click"),
        ],
        schema,
    )
    hb1 = spark.createDataFrame(
        [
            (-1, datetime(2024, 3, 1), -1, "click"),
            (-2, datetime(2024, 3, 1), -1, "purchase"),
        ],
        schema,
    )
    hb2 = spark.createDataFrame(
        [
            (-3, datetime(2024, 5, 1), -1, "click"),
            (-4, datetime(2024, 5, 1), -1, "purchase"),
        ],
        schema,
    )
    sdir = str(tmp_path / "c69")
    for i, df in enumerate((b0, hb1, hb2)):
        sub = os.path.join(sdir, f"b{i}")
        df.coalesce(1).write.parquet(sub)
        for fn in os.listdir(sub):
            os.utime(os.path.join(sub, fn), (time.time() + 60 * i,) * 2)
    stream = (
        spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sdir + "/b*")
    )

    def side(etype):
        return stream.filter(F.col("event_type") == etype).select(
            "user_id", "ts", "event_id"
        )

    j = stream_interval_join(
        side("click"), side("purchase"), ["user_id"], 3600.0,
        watermark="1 hour", how="left_outer",
    )
    out = run_stream_to_memory(spark, j, output_mode="append")
    rows = {
        r["l_event_id"]: r["r_event_id"]
        for r in out.filter(F.col("user_id") >= 0).collect()
    }
    assert rows == {1: 2, 3: None}


def test_merge_delta_components_composes_across_batches(spark):
    """Folding edge batches one at a time through merge_delta_components
    must land on the same labels as one full CC over everything — the
    exactness claim behind the streaming maintenance entry."""
    from neo4j_graphdb_spark.graph.algorithms import (
        connected_components,
        merge_delta_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(8)], "node_id bigint")
    labels = nodes.selectExpr("node_id AS id", "node_id AS comp")
    batches = [
        [(0, 1), (2, 3)],
        [(4, 5)],
        [(1, 2), (5, 6)],  # merges {0,1}+{2,3}; extends {4,5}
    ]
    alle = []
    for b in batches:
        bdf = spark.createDataFrame(b, "src bigint, dst bigint")
        labels = merge_delta_components(labels, bdf)
        alle += b
    full = connected_components(
        nodes, spark.createDataFrame(alle, "src bigint, dst bigint")
    )
    got = {r["id"]: r["comp"] for r in labels.collect()}
    want = {r["id"]: r["comp"] for r in full.collect()}
    assert got == want
    assert got[3] == 0 and got[6] == 4 and got[7] == 7
