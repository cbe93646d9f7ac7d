"""Salted skew-join (operators/skew.py): result parity with the plain
join and actual spreading of a hot key across salts."""

import pytest
from pyspark.sql import functions as F

from neo4j_graphdb_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one pathologically hot key (900 of 1000 rows) + a long tail
    rows = [(i, 1 if i < 900 else i, float(i)) for i in range(1000)]
    big = spark.createDataFrame(rows, "row_id bigint, k bigint, v double")
    small = big.select("k").distinct().withColumn("tag", F.concat(F.lit("t"), F.col("k")))
    return big, small


def test_salted_join_matches_plain_join(spark, skewed):
    big, small = skewed
    plain = sorted(
        (r["row_id"], r["tag"]) for r in big.join(small, on="k").collect()
    )
    salted = sorted(
        (r["row_id"], r["tag"])
        for r in salted_join(big, small, ["k"], num_salts=8).collect()
    )
    assert salted == plain and len(salted) == 1000


def test_salt_spreads_hot_key(spark, skewed):
    big, _ = skewed
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
    per_salt = (
        big.filter(F.col("k") == 1)
        .select(salt.alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    # the 900-row hot key must occupy every salt, none holding > 1/4
    assert len(per_salt) == 8
    assert max(r["count"] for r in per_salt) < 900 / 4


def test_salted_join_rejects_outer(spark, skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        salted_join(big, small, ["k"], how="left")
