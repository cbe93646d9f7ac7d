"""Deterministic sampling and sequence packing for training-data curation.

Two operators a large-scale pipeline runs between dedup and tokenization:

* :func:`stratified_sample` — per-stratum downsampling at exact,
  reproducible rates (e.g. keep 10% of English, 100% of low-resource
  languages). Hash-gated, not ``df.sample``: the same row survives on
  every run, every engine, and every re-ingest, so the mixture is
  auditable with plain SQL.
* :func:`pack_sequences` — greedy first-fit-sequential packing of
  documents into fixed-capacity context windows ("sequence packing"),
  the standard trick for filling training batches without padding
  waste. Packing is per-bucket, so it parallelizes across the cluster
  with zero coordination; within a bucket the fill order is
  deterministic (ascending id).

Scale shape: stratified_sample is a pure filter (no shuffle — the gate
is a column expression over md5). pack_sequences shuffles once on the
bucket key and then runs a linear scan per bucket inside an Arrow-batched
``applyInPandas``; buckets are independent, so skew is bounded by the
bucket count you choose, not by the data.

No reference twin: the reference (a Neo4j ingest crawler) has no
sampling/packing stage; north-star extension per the training-pipeline
mandate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_graphdb_spark.functions.hashing import md5_bucket, md5_hex

_SLOTS = 1_000_000


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Keep each row iff its hash bucket falls under its stratum's rate.

    ``rates`` maps stratum value → keep-fraction in [0, 1]; strata not
    listed use ``default_rate``. Rows keep their full schema. Sampling
    is by ``md5(salt || key)`` so re-runs (and the SQL oracle) agree
    row-for-row — no RNG, no partition-order sensitivity.
    """
    for name, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0,1] (got {r})")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1] (got {default_rate})")
    bucket = md5_bucket(key_col, salt, _SLOTS)
    thresh = None
    for name, r in rates.items():
        bound = F.lit(int(r * _SLOTS))
        cond = F.col(strata_col) == F.lit(name)
        thresh = F.when(cond, bound) if thresh is None else thresh.when(cond, bound)
    thresh = (
        F.lit(int(default_rate * _SLOTS))
        if thresh is None
        else thresh.otherwise(F.lit(int(default_rate * _SLOTS)))
    )
    return df.filter(bucket < thresh)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col,
    k: int,
    salt: str = "ws",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — the Efraimidis–Spirakis
    A-ES scheme (2006): each row draws a key ``u^(1/w)`` from a uniform
    ``u``; the ``k`` largest keys are exactly a weighted sample without
    replacement. The uniform is a HASH of the row key (no RNG):
    ``u = (md5_60(salt‖key) + 1) / 2^60 ∈ (0, 1]``, so re-runs, other
    engines, and the SQL oracle draw the identical sample. Selection
    compares ``ln(u)/w`` (monotone in the key, numerically tame);
    weights must be strictly positive.

    This is the one-pass distributed answer to "sample 10M docs
    proportional to quality score" that rejection or prefix-sum schemes
    can't give: per-row arithmetic (no sums across rows → no
    float-order sensitivity), then a ``top-k`` that runs as
    per-partition heads + a driver merge (TakeOrdered), never a global
    sort. Returns the sampled rows with their draw key (``_k``,
    rounded 6 dp), ordered nowhere — order is the consumer's concern.
    """
    if k <= 0:
        raise ValueError(f"k must be positive (got {k})")
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    draw = F.ln(u) / wcol
    return (
        df.withColumn("_k", draw)
        .orderBy(F.col("_k").desc(), F.col(key_col).asc())
        .limit(k)
        .withColumn("_k", F.round("_k", 6))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    capacity: int,
    n_buckets: int = 8,
) -> DataFrame:
    """Greedy first-fit-sequential sequence packing.

    Documents are routed to ``id % n_buckets`` buckets; within a bucket,
    in ascending ``id_col`` order, each document joins the current pack
    if its tokens still fit, else opens a new pack. A document longer
    than ``capacity`` gets a pack of its own (callers truncate/chunk
    upstream via ``chunk_documents``).

    Returns ``(id_col, bucket, pack_id, pack_pos, n_tokens)`` —
    ``pack_id`` numbers packs within a bucket from 0, ``pack_pos`` the
    document's position within its pack. Greedy-sequential (not best-fit)
    is the industry default: it needs one linear pass, keeps documents
    in stable order, and wastes <3% capacity at realistic length mixes.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    id_type = dict(df.dtypes)[id_col]
    numeric_id = id_type in {"tinyint", "smallint", "int", "bigint"}
    # numeric ids bucket by value (SQL-auditable, `id % n`); other types
    # bucket by xxhash64 — never by cast-to-long, which would NULL out
    # every non-numeric id and silently collapse packing into one bucket
    bucket_expr = (
        F.pmod(F.col(id_col).cast("long"), F.lit(n_buckets))
        if numeric_id
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    )
    out_schema = (
        f"`{id_col}` {id_type}, bucket bigint, pack_id bigint, "
        f"pack_pos bigint, n_tokens bigint"
    )
    cap = capacity

    def pack_one_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        pack_ids, positions = [], []
        pack, pos, acc = 0, 0, 0
        first = True
        for tok in pdf["_toks"]:
            t = int(tok)
            if first:
                acc, pos, first = t, 0, False
            elif acc + t <= cap:
                acc += t
                pos += 1
            else:
                pack += 1
                acc, pos = t, 0
            pack_ids.append(pack)
            positions.append(pos)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "bucket": pdf["_bucket"].astype("int64"),
                "pack_id": pd.Series(pack_ids, dtype="int64"),
                "pack_pos": pd.Series(positions, dtype="int64"),
                "n_tokens": pdf["_toks"].astype("int64"),
            }
        )

    prepared = df.select(
        F.col(id_col),
        bucket_expr.alias("_bucket"),
        F.col(n_tokens_col).cast("long").alias("_toks"),
    )
    return prepared.groupBy("_bucket").applyInPandas(pack_one_bucket, out_schema)


def global_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int = 16,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic corpus shuffle for training-order randomization:
    every row gets a ``shard`` (md5 hash bucket) and a ``pos`` within
    its shard (rank of the hash, ties broken by key) — together a
    reproducible random permutation of the corpus, the thing
    ``ORDER BY rand()`` cannot give you twice.

    Scale shape: one shuffle on the shard key; the rank window is
    PARTITIONED by shard, so no single-partition global sort ever
    happens — at 100 TB you pick n_shards ≈ output file count and each
    shard sorts independently (exactly how training shards are laid
    out). Readers stream shards in order, or interleave them for
    between-shard randomness.
    """
    from pyspark.sql import Window

    out = df.withColumn("_hkey", md5_hex(key_col, salt)).withColumn(
        "shard", md5_bucket(key_col, salt, n_shards)
    )
    w = Window.partitionBy("shard").orderBy("_hkey", key_col)
    return out.withColumn("pos", F.row_number().over(w).cast("long")).drop("_hkey")


def mixture_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    target_shares: dict[str, float],
    salt: str = "mixture",
) -> DataFrame:
    """C42 — downsample to a TARGET MIXTURE (the dataset-mixing step of
    a training-data pipeline: "make the corpus 50% en / 30% de / 20%
    fr"). Unlike :func:`stratified_sample`, the keep-rates are not given
    — they are DERIVED from the observed stratum counts: the output is
    the largest corpus achievable without upsampling any stratum
    (``N_out = min over strata of n_s / share_s``; the binding stratum
    keeps everything), and each stratum keeps
    ``share_s · N_out / n_s`` of its rows. Strata outside the target
    drop entirely.

    The rate computation is a one-row aggregate over per-stratum counts
    broadcast back into the same deterministic md5-bucket gate as
    ``stratified_sample`` — one count shuffle plus one scan with a
    row-local filter, no RNG, replayable row-for-row by the SQL oracle.
    Realized shares converge to the targets as strata grow (hash
    granularity is 1e-6).
    """
    spark = df.sparkSession
    t = spark.createDataFrame(
        [(k, float(v)) for k, v in target_shares.items()],
        f"{strata_col} string, share double",
    )
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    j = counts.join(F.broadcast(t), on=strata_col)
    nout = j.agg(F.min(F.col("_n") / F.col("share")).alias("_nout"))
    rates = j.crossJoin(F.broadcast(nout)).select(
        strata_col,
        F.least(
            F.lit(1.0), F.col("share") * F.col("_nout") / F.col("_n")
        ).alias("_rate"),
    )
    bucket = md5_bucket(key_col, salt, _SLOTS)
    return (
        df.join(F.broadcast(rates), on=strata_col)
        .filter(bucket < F.floor(F.col("_rate") * _SLOTS).cast("bigint"))
        .drop("_rate")
    )


def temperature_mixture(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    alpha: float = 0.7,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based corpus mixing (the multilingual-pretraining
    alpha-sampling of mT5/XLM-R lineage: sampling probability of
    stratum s ∝ ``n_s^alpha``, ``alpha < 1`` upweights small strata
    RELATIVE to their raw proportion — English stops drowning out
    Swahili). Downsample-only: target shares are derived from the
    observed counts (``share_s = n_s^alpha / Σ n^alpha``), the output is
    the largest corpus achievable without upsampling
    (``N_out = min n_s / share_s``), and rows gate through the same
    deterministic md5 bucket as :func:`mixture_sample` — no RNG, the
    SQL oracle replays row-for-row. ``alpha = 1`` keeps everything
    (shares equal raw proportions); ``alpha = 0`` equalizes strata.
    Rates round to 6 dp BEFORE the slot gate so double-precision ulp
    differences between engines cannot flip a boundary row.

    100 TB shape: one per-stratum count shuffle, a strata-sized
    broadcast of derived rates, one scan with a row-local hash filter.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    z = counts.agg(F.sum(F.pow("_n", F.lit(alpha))).alias("_z"))
    shares = counts.crossJoin(F.broadcast(z)).select(
        strata_col,
        "_n",
        (F.pow("_n", F.lit(alpha)) / F.col("_z")).alias("_share"),
    )
    nout = shares.agg(F.min(F.col("_n") / F.col("_share")).alias("_nout"))
    rates = shares.crossJoin(F.broadcast(nout)).select(
        strata_col,
        F.round(
            F.least(
                F.lit(1.0), F.col("_share") * F.col("_nout") / F.col("_n")
            ),
            6,
        ).alias("_rate"),
    )
    bucket = md5_bucket(key_col, salt, _SLOTS)
    return (
        df.join(F.broadcast(rates), on=strata_col)
        .filter(bucket < F.round(F.col("_rate") * _SLOTS).cast("bigint"))
        .drop("_rate")
    )


def quota_sample(
    df: DataFrame,
    stratum_cols: list[str],
    key_col: str,
    n_per_stratum: int,
    salt: str = "quota",
) -> DataFrame:
    """C53 — exact per-stratum quotas: the ``n_per_stratum``
    deterministically-chosen rows of every stratum (vs
    :func:`stratified_sample`'s RATE-based keep, which only hits quotas
    in expectation). The pick order is the md5 of the salted key — a
    uniform, engine-agnostic shuffle order — with the key as
    tiebreaker, so re-runs, engines, and partitionings all select the
    same rows. Strata smaller than the quota keep everything.

    One window shuffle keyed by the stratum — the same partitioning the
    downstream per-stratum work wants anyway. No driver-side state, no
    reservoir: at 100 TB the quota is enforced inside each stratum's
    partition stream.
    """
    from pyspark.sql import Window

    order = F.md5(F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(*stratum_cols).orderBy(order, F.col(key_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def morton_code(a, b, bits: int = 8):
    """Interleave the low ``bits`` of two bucket ids into a Z-order
    (Morton) code — pure bitwise column expressions, JVM-side."""
    code = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1))
        code = code.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return code


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 8,
    n_files: int = 8,
) -> DataFrame:
    """C61 — Z-order clustering (Delta/Iceberg ``OPTIMIZE ZORDER BY``):
    rows sort by the Morton interleave of two key columns' bucket ids,
    so file-level min/max statistics become selective for BOTH columns
    at once — a range scan on either key prunes most files, which
    single-column sorting only gives you for one of them. The classic
    multi-dimensional layout move for 100 TB fact tables.

    ``repartitionByRange`` on the code + an in-partition sort produces
    the write-ready layout (each output task = one z-contiguous file);
    the code itself is deterministic bit algebra, value-checkable in
    SQL.
    """
    z = morton_code(F.col(col_a) % (1 << bits), F.col(col_b) % (1 << bits), bits)
    return (
        df.withColumn("zorder", z)
        .repartitionByRange(n_files, "zorder")
        .sortWithinPartitions("zorder")
    )


def interleave_sources(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    salt: str = "interleave",
) -> DataFrame:
    """C64 — source-interleaved training order: a deterministic
    in-stratum shuffle rank plus a round-robin composite key
    ``rank · n_strata + stratum_index``, so reading in key order draws
    from every source in rotation — the data-mixing schedule that stops
    a training run from seeing one source in a giant contiguous block
    (the failure mode of concatenate-then-shuffle-badly pipelines).

    No global sort anywhere: the key IS the order (same contract as
    the md5 global shuffle), the in-stratum rank is one window keyed by
    the stratum, and the stratum index/count ride in as a broadcast of
    the tiny stratum dimension. Fully deterministic → replayable in
    SQL.

    Returns ``(id_col, stratum_col, intra_rank, train_key)``.
    """
    from pyspark.sql import Window

    dim = (
        df.select(stratum_col)
        .distinct()
        .withColumn(
            "_sidx",
            F.row_number().over(Window.orderBy(stratum_col)) - 1,
        )
    )
    n = dim.agg(F.count(F.lit(1)).alias("_ns"))
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    return (
        df.select(id_col, stratum_col)
        .withColumn("intra_rank", (F.row_number().over(w) - 1).cast("bigint"))
        .join(F.broadcast(dim), on=stratum_col)
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            stratum_col,
            "intra_rank",
            (F.col("intra_rank") * F.col("_ns") + F.col("_sidx"))
            .cast("bigint")
            .alias("train_key"),
        )
    )


def negative_sample(
    positives,
    user_col: str,
    item_col: str,
    n_items: int,
    k: int = 3,
    salt: str = "neg",
):
    """Deterministic negative sampling for implicit-feedback training
    (the BPR / SGNS data-prep step): ``k`` candidate negatives per
    positive interaction, item ids drawn by the md5-fold over
    ``user:item:r`` modulo the dense item-id space, then any candidate
    that collides with a TRUE positive of the same user is dropped by
    one anti-join. No RNG state, no driver loop: at 100 TB this is one
    narrow projection (k-way explode) plus one shuffle (the anti-join
    on (user, candidate)), and the same rows regenerate on every run
    and engine — resumable training-data builds without storing the
    negatives.

    Returns ``(user, pos_item, neg_item, r)``; r in ``1..k`` (gaps where
    a candidate collided with a positive).
    """
    from pyspark.sql import functions as F

    from neo4j_graphdb_spark.functions.hashing import md5_bucket

    cand = positives.select(
        F.col(user_col).alias("user"),
        F.col(item_col).alias("pos_item"),
        F.explode(F.array(*[F.lit(r) for r in range(1, k + 1)])).alias("r"),
    ).withColumn(
        "neg_item",
        md5_bucket(
            F.concat(
                F.col("user").cast("string"),
                F.lit(":"),
                F.col("pos_item").cast("string"),
                F.lit(":"),
                F.col("r").cast("string"),
            ),
            salt,
            n_items,
        ),
    )
    pos_set = positives.select(
        F.col(user_col).alias("user"), F.col(item_col).alias("neg_item")
    ).distinct()
    return cand.join(pos_set, on=["user", "neg_item"], how="left_anti").select(
        "user", "pos_item", "neg_item", F.col("r").cast("int").alias("r")
    )


def dsir_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_col: str,
    dim: int = 256,
) -> DataFrame:
    """DSIR-style importance scores (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): estimate a target
    and a raw unigram distribution over ``dim`` hashed buckets, then
    score every document by the sum of per-token log importance ratios
    ``ln(p_target[b] / p_raw[b])``. Select-top-fraction by score to
    resample the raw corpus toward the target domain.

    ``target_col`` is a boolean column marking the target-domain rows
    (they stay in the raw estimate too — DSIR's raw distribution is the
    whole pool). Laplace +1 smoothing keeps empty buckets finite.

    Scale shape: one token scan feeding two ``dim``-row aggregations
    (map-side combined), the log-ratio table is ``dim`` rows →
    broadcast to the token stream, and the per-doc score is one more
    (id)-keyed aggregation. No vocabulary, no driver loop, nothing
    proportional to corpus size but the scans. The md5-fold bucket hash
    makes every score SQL-replayable.

    No reference twin (the reference has no curation stage);
    training-pipeline mandate. Returns ``(id, n_tokens, score)`` with
    the score rounded to 4 places for cross-engine hash stability.
    """
    toks = df.select(
        F.col(id_col),
        F.col(target_col).alias("_t"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("_tok"),
    ).withColumn("_b", md5_bucket("_tok", "dsir:", dim).cast("int"))
    tgt = toks.filter(F.col("_t")).groupBy("_b").agg(
        F.count(F.lit(1)).alias("_np")
    )
    raw = toks.groupBy("_b").agg(F.count(F.lit(1)).alias("_nq"))
    tot_t = tgt.agg(F.sum("_np").alias("_tp"))
    tot_r = raw.agg(F.sum("_nq").alias("_tq"))
    ratio = (
        raw.join(tgt, "_b", "left")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_r))
        .select(
            "_b",
            (
                F.log(
                    (F.coalesce(F.col("_np"), F.lit(0)) + F.lit(1.0))
                    / (F.col("_tp") + F.lit(float(dim)))
                )
                - F.log(
                    (F.col("_nq") + F.lit(1.0))
                    / (F.col("_tq") + F.lit(float(dim)))
                )
            ).alias("_lr"),
        )
    )
    return (
        toks.join(F.broadcast(ratio), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.sum("_lr"), 4).alias("score"),
        )
    )


def k_anonymize(
    df: DataFrame,
    qi_cols: list[str],
    k: int,
) -> DataFrame:
    """Hierarchical small-cell suppression over a quasi-identifier
    hierarchy — the statistical-disclosure-control gate a training-data
    governance pass runs before releasing per-group statistics (census
    "cell suppression"): a row is reported under the MOST SPECIFIC
    quasi-identifier prefix whose group holds at least ``k`` rows;
    columns beyond the prefix generalize to ``'*'``, and rows whose
    coarsest prefix (the first column alone) is still smaller than
    ``k`` are suppressed outright (level −1, identifiers all ``'*'``).

    ``qi_cols`` orders the hierarchy most→least identifying; level *j*
    keeps the first ``len(qi_cols) − j`` columns. Returns one row per
    released cell: the generalized identifier columns, ``level``, and
    ``n`` — integer counts only, deterministic under any partitioning.

    Caveat (documented, not hidden): the PREFIX is guaranteed ≥ k, but
    a generalized residual cell — "(a, b, *) minus its released
    children" — can hold < k rows; strict k-anonymity needs
    Mondrian-style global recoding, which slots in upstream of this
    release step without changing its shape.

    Scale shape: one ``groupBy`` per hierarchy level over shrinking
    column sets (all map-side combinable), joined back broadcast (group
    dimension tables are bounded by the identifier domain, not the data);
    the row side never shuffles more than once per level.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    n = len(qi_cols)
    rows = df.select(*[F.col(c).cast("string").alias(c) for c in qi_cols])
    # level j count: rows sharing the first (n - j) identifier values —
    # one shrinking groupBy per level, joined back (broadcast: identifier
    # domains, not data volume)
    for j in range(n):
        prefix = qi_cols[: n - j]
        cnt = rows.groupBy(*prefix).agg(F.count(F.lit(1)).alias(f"_c{j}"))
        rows = rows.join(F.broadcast(cnt), on=prefix)
    level = F.lit(-1)
    for j in range(n - 1, -1, -1):
        level = F.when(F.col(f"_c{j}") >= k, F.lit(j)).otherwise(level)
    rows = rows.withColumn("_lvl", level)
    gen_cols = [
        F.when(F.col("_lvl").between(0, n - 1 - i), F.col(c))
        .otherwise(F.lit("*"))
        .alias(c)
        for i, c in enumerate(qi_cols)
    ]
    return (
        rows.select(*gen_cols, F.col("_lvl").alias("level"))
        .groupBy(*qi_cols, "level")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
