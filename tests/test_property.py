"""Differential property tests (hypothesis): the Spark operators against
independent pure-Python references on randomized small inputs.

Each property uses few, small examples — every example executes real
Spark jobs, so the budget goes to input diversity, not volume.
"""

import hashlib
from datetime import datetime, timedelta

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from neo4j_graphdb_spark.operators.dedup import simhash
from neo4j_graphdb_spark.operators.skew import salted_join
from neo4j_graphdb_spark.operators.temporal import asof_join

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_EPOCH = datetime(2026, 1, 1)


@st.composite
def event_tables(draw):
    n_left = draw(st.integers(1, 12))
    n_right = draw(st.integers(0, 12))
    keys = st.integers(1, 3)
    secs = st.integers(0, 500)

    def rows(n, start_id):
        out, seen = [], set()
        for i in range(n):
            k = draw(keys)
            s = draw(secs)
            if (k, s) in seen:  # unique (key, ts) — asof determinism contract
                continue
            seen.add((k, s))
            out.append((start_id + i, k, _EPOCH + timedelta(seconds=s), float(s)))
        return out

    return rows(n_left, 1000), rows(n_right, 2000)


@given(event_tables())
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, tables):
    lrows, rrows = tables
    schema = "event_id bigint, k bigint, ts timestamp, value double"
    left = spark.createDataFrame(lrows, schema)
    right = spark.createDataFrame(rrows, schema)
    got = {
        r["event_id"]: r["event_id_m"]
        for r in asof_join(
            left, right, ["k"], "ts", right_cols=["event_id", "value"]
        ).collect()
    }

    lp = pd.DataFrame(lrows, columns=["event_id", "k", "ts", "value"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["event_id", "k", "ts", "value"]).sort_values("ts")
    if len(rp):
        merged = pd.merge_asof(
            lp, rp, on="ts", by="k", direction="backward", suffixes=("", "_m")
        )
        want = {
            int(r.event_id): (None if pd.isna(r.event_id_m) else int(r.event_id_m))
            for r in merged.itertuples()
        }
    else:
        want = {int(r.event_id): None for r in lp.itertuples()}
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.floats(0, 100, allow_nan=False)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_salted_join_parity_random(spark, rows):
    big = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "rid bigint, k bigint, v double"
    )
    small = big.select("k").distinct().withColumn("t", F.col("k") * 10)
    plain = sorted((r["rid"], r["t"]) for r in big.join(small, on="k").collect())
    salted = sorted(
        (r["rid"], r["t"]) for r in salted_join(big, small, ["k"], num_salts=4).collect()
    )
    assert plain == salted


def _simhash_md5_py(text: str) -> int:
    """Pure-Python reference of simhash(hash_mode='md5_60')."""
    toks = text.strip().lower().split()
    if not toks:
        toks = [""]
    votes = [0] * 60
    for tok in toks:
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        for i in range(60):
            votes[i] += 1 if (h >> i) & 1 else -1
    return sum(1 << i for i in range(60) if votes[i] > 0)


@given(
    st.lists(
        st.text(alphabet="abc XYZ09", min_size=0, max_size=40),
        min_size=1,
        max_size=10,
        unique=True,
    )
)
@settings(**_SETTINGS)
def test_simhash_md5_matches_pure_python(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash(df, "text", "doc_id", hash_mode="md5_60").collect()
    }
    want = {i: _simhash_md5_py(t) for i, t in enumerate(texts)}
    assert got == want
