"""Text operators: the reference's cleaning/filter pipeline (tier B) plus
the north-star text-analysis suite (tier C10).

Everything here is a pure JVM-side column expression — no Python UDFs in
the hot path — so the whole pipeline stays inside whole-stage codegen and
scales linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------- tier B


def clean_text(col: Column | str) -> Column:
    """B5 — port of ``clean_text`` (``/root/reference/src/crwling.py:37-43``):
    strip HTML tags, collapse ``\\n\\t\\r`` and zero-width space to ' ',
    squeeze runs of spaces, trim."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"<[^>]*>", "")
    # zero-width space is *deleted* (not blanked) — the reference does
    # .replace('​',''), so 'foo​bar' must become 'foobar'.
    c = F.regexp_replace(c, "​", "")
    c = F.regexp_replace(c, "[\\n\\t\\r]", " ")
    c = F.regexp_replace(c, " {2,}", " ")
    return F.trim(c)


def ingest_filter(df: DataFrame, link_col: str = "link", title_col: str = "title") -> DataFrame:
    """B6 — the reference's record filters: drop google.com self-links
    (``src/crwling.py:147``) and titles shorter than 5 chars (``:153``)."""
    return df.filter(~F.col(link_col).contains("google.com")).filter(
        F.length(F.trim(F.col(title_col))) >= 5
    )


def impute_publisher(col: Column | str) -> Column:
    """B7 — NULL publisher falls back to 'Google News' (``src/crwling.py:168``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit("Google News"))


# -------------------------------------------------------------------- tier C10


def word_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(col: Column | str) -> Column:
    """Token count with a BPE-ish regex: word runs, digit runs, and single
    punctuation marks each count as one token (a cheap cl100k-style proxy
    for budgeting training data)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.regexp_extract_all(c, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0))
    )


def quality_score_cols(col: Column | str) -> dict[str, Column]:
    """Quality-scoring signals: length, punctuation ratio, stopword ratio,
    mean word length. Each is a plain expression → zero-UDF scoring."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    n_words = word_count(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^a-zA-Z0-9\s]", ""))
    stop_pat = r"(?i)\b(the|a|an|and|or|of|to|in|is|it|for|on|with)\b"
    n_stop = F.size(F.regexp_extract_all(c, F.lit(stop_pat), F.lit(0)))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0)),
        "mean_word_len": F.when(
            n_words > 0, F.length(F.regexp_replace(c, r"\s+", "")) / n_words
        ).otherwise(F.lit(0.0)),
    }


def doc_fingerprint(col: Column | str, shingle: int = 8, window: int = 256) -> Column:
    """Rolling-hash document fingerprint: min MD5 over character shingles
    of the (whitespace-normalized, lowercased) first ``window`` chars —
    a cheap winnowing-style fingerprint for near-identity checks that is
    deterministic and engine-agnostic (MD5 everywhere)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.substring(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")), 1, window)
    starts = F.sequence(F.lit(1), F.greatest(F.length(norm) - F.lit(shingle - 1), F.lit(1)))
    return F.array_min(F.transform(starts, lambda i: F.md5(F.substring(norm, i, F.lit(shingle)))))


_LANG_HINTS: list[tuple[str, str]] = [
    # (lang, regex of characteristic charset/stopwords) — a tiny heuristic
    # router; swap in a real model via pandas_udf without changing the plan.
    ("zh", r"[一-鿿]"),
    ("ja", r"[぀-ヿ]"),
    ("ko", r"[가-힯]"),
    ("ru", r"[Ѐ-ӿ]"),
    ("de", r"(?i)(\b(und|der|die|das|nicht|ist)\b|[äöüß])"),
    ("fr", r"(?i)(\b(le|la|les|est|une|dans)\b|[àâçéèê])"),
    ("es", r"(?i)(\b(el|los|las|es|una|para)\b|[ñ¿¡])"),
]


def detect_language(col: Column | str, default: str = "en") -> Column:
    """C10 language-ID: first-match charset/stopword heuristic."""
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for lang, pat in _LANG_HINTS:
        cond = F.regexp_count(c, F.lit(pat)) > 0
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    assert expr is not None
    return expr.otherwise(F.lit(default))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the context
    windowing stage of a training-data pipeline (tokens here = whitespace
    words; swap in a real tokenizer upstream without changing the plan).

    Pure column expressions: split → strided ``sequence`` of window
    starts → ``slice``/``array_join`` per window → ``posexplode``. One
    narrow stage, no shuffle, no UDF — at 100 TB this runs at scan speed.
    Output: ``(id, chunk_id, chunk, n_tokens)``; the final window is the
    remainder (shorter than ``chunk_tokens``), windows advance by
    ``chunk_tokens - overlap``.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    # split-then-drop-empties, NOT trim-then-split: trim strips only
    # literal spaces, so a tab/newline-only document (or leading \t)
    # would smuggle empty-string "tokens" into the windows
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
    n = F.size(toks)
    # window starts: 0, stride, 2*stride, … while start < n (1-indexed slice)
    n_windows = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    starts = F.transform(
        F.sequence(F.lit(0), n_windows - 1), lambda i: i * stride + 1
    )
    windows = F.transform(starts, lambda s: F.slice(toks, s, chunk_tokens))
    # whitespace-only documents produce NO chunks (mirrors word_count's
    # 0-for-empty), never a phantom chunk of empty tokens
    exploded = df.filter(F.size(toks) > 0).select(
        F.col(id_col),
        F.posexplode(windows).alias("chunk_id", "_w"),
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.array_join(F.col("_w"), " ").alias("chunk"),
        F.size("_w").cast("bigint").alias("n_tokens"),
    )


def deterministic_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Reproducible train/val/test assignment by hashed key — the same
    row lands in the same split on every run, every engine, every scale
    (the property random ``df.sample`` cannot give you on re-ingest).

    Buckets the md5 of ``salt || key`` into 10^6 slots and maps
    cumulative weight ranges to split names; the md5 fold is the engine's
    cross-checkable hash (digit-identical in DuckDB), so the split is
    SQL-auditable. Adds a ``split`` column; weights must sum to ~1.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1 (got {total})")
    from neo4j_graphdb_spark.functions.hashing import md5_bucket

    slots = 1_000_000
    bucket = md5_bucket(key_col, salt, slots)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        bound = int(acc * slots)
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def redact_pii(col: Column | str) -> Column:
    """Scrub common PII patterns from free text — emails, IPv4s, and
    phone/card-shaped digit runs — replacing each with a typed token.
    Pure JVM regexes (no UDF); patterns deliberately conservative
    (precision over recall) and portable between Java regex and RE2 —
    no lookarounds — so the oracle can reproduce them verbatim.

    The phone pattern requires 10-19 digits (separated by at most two
    of ``space ( ) -`` between digits), so ISO dates (8 digits), year
    pairs, and short decimals survive; 10+-digit runs — phone and
    card shaped — redact even inside decimals."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>")
    c = F.regexp_replace(c, r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>")
    c = F.regexp_replace(c, r"\+?\b(?:[0-9][ ()-]{0,2}){9,18}[0-9]\b", "<PHONE>")
    return c


def repetition_stats(col: Column | str) -> dict[str, Column]:
    """Repetition-based quality signals (the Gopher-rules family):

    * ``dup_word_frac`` — fraction of word occurrences beyond each
      word's first (1 - distinct/total);
    * ``top_word_frac`` — occurrences of the single most frequent word
      over total words;
    * ``dup_line_frac`` — fraction of newline-split lines beyond each
      line's first.

    All built-in array/higher-order expressions — no shuffle, no UDF;
    boilerplate-heavy documents score high and get filtered upstream of
    dedup, where they would otherwise flood LSH buckets.
    """
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.lower(F.trim(c)), r"\s+")
    nw = F.size(words)
    distinct_w = F.size(F.array_distinct(words))
    # top word count = longest equal-run in the sorted word array: an
    # O(n log n) fold, not the O(n^2) count-per-distinct-word shape that
    # dies on long documents
    top = F.aggregate(
        F.array_sort(words),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )["best"]
    lines = F.split(c, r"\n")
    nl = F.size(lines)
    distinct_l = F.size(F.array_distinct(lines))
    safe = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))
    return {
        "dup_word_frac": safe((nw - distinct_w).cast("double"), nw),
        "top_word_frac": safe(top.cast("double"), nw),
        "dup_line_frac": safe((nl - distinct_l).cast("double"), nl),
    }


def quality_filter(
    col: Column | str,
    min_words: int = 30,
    max_punct_ratio: float = 0.10,
    min_stopword_ratio: float = 0.01,
    max_dup_line_frac: float = 0.20,
    max_top_word_frac: float = 0.12,
) -> dict[str, Column]:
    """Aggregate keep/drop verdict from the individual quality signals —
    the Gopher-rules-style gate a corpus passes before dedup (filtering
    first shrinks every later stage). Returns ``keep`` (boolean) and
    ``drop_reason`` (first failing rule in a fixed precedence order, or
    NULL when kept). All the underlying signals are pure column
    expressions, so the whole verdict stays inside whole-stage codegen —
    zero UDFs, zero shuffles, SQL-reproducible."""
    c = F.col(col) if isinstance(col, str) else col
    q = quality_score_cols(c)
    r = repetition_stats(c)
    reason = (
        F.when(q["n_words"] < min_words, F.lit("too_short"))
        .when(q["punct_ratio"] > max_punct_ratio, F.lit("punct_heavy"))
        .when(q["stopword_ratio"] < min_stopword_ratio, F.lit("no_stopwords"))
        .when(r["dup_line_frac"] > max_dup_line_frac, F.lit("dup_lines"))
        .when(r["top_word_frac"] > max_top_word_frac, F.lit("repetitive"))
    )
    return {"keep": reason.isNull(), "drop_reason": reason}


def lexical_diversity(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document lexical-diversity quality signals — the
    repetition/gibberish filter axis every pretraining-data pipeline
    scores (Gopher's repetition rules' statistical sibling):

    * ``ttr`` — type-token ratio (distinct words / words),
    * ``simpson`` — Gini–Simpson diversity ``1 − Σc²/n²`` (the
      probability two sampled tokens differ; ~0 for degenerate
      repeated-token docs),
    * ``top_ratio`` — most-frequent-token share (template/boilerplate
      concentration).

    All three are EXACT integer ratios (counts and Σc² are exact longs;
    one IEEE division each), so values are bit-identical across
    engines and partitionings — deliberately chosen over Shannon
    entropy, whose Σ p·log p both sums order-dependently and leans on
    libm's non-correctly-rounded log. Shape: one explode (linear in
    corpus tokens, the c86/c96 class) + two map-side-combined groupBys.
    Docs with zero word tokens drop out (nothing to score).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("_w"),
    )
    per_word = toks.groupBy(id_col, "_w").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return (
        per_word.groupBy(id_col)
        .agg(
            F.sum("_c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("distinct_tokens"),
            F.sum(F.col("_c") * F.col("_c")).cast("bigint").alias("_sc2"),
            F.max("_c").cast("bigint").alias("_cmax"),
        )
        .select(
            id_col,
            "n_tokens",
            "distinct_tokens",
            F.round(
                F.col("distinct_tokens").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("ttr"),
            F.round(
                (
                    F.col("n_tokens").cast("double")
                    * F.col("n_tokens").cast("double")
                    - F.col("_sc2").cast("double")
                )
                / (
                    F.col("n_tokens").cast("double")
                    * F.col("n_tokens").cast("double")
                ),
                6,
            ).alias("simpson"),
            F.round(
                F.col("_cmax").cast("double") / F.col("n_tokens").cast("double"),
                6,
            ).alias("top_ratio"),
        )
    )


def build_vocab(
    df: DataFrame, text_col: str, top_n: int = 1000
) -> DataFrame:
    """Corpus vocabulary: the ``top_n`` most frequent whitespace tokens
    with deterministic ids (rank by count desc, token asc — re-runs and
    engines agree). Returns ``(token, n_occurrences, token_id)``.

    Scale shape: one ``groupBy(token)`` shuffle over the exploded
    corpus (map-side partial counts do the heavy lifting), then a
    ``top_n``-bounded TakeOrdered — the id-assignment window only ever
    sees ``top_n`` rows, so the "global" rank is driver-bounded by the
    vocab size you asked for, not by the corpus.
    """
    from pyspark.sql import Window

    words = df.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    counts = (
        words.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(top_n)
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
    return counts.withColumn("token_id", F.row_number().over(w).cast("long"))


def tfidf_scores(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-(document, term) TF-IDF over whitespace tokens:
    ``tf · ln(N / df)`` with raw term counts and unsmoothed idf — the
    textbook formula, deterministic and SQL-reproducible. Returns
    ``(id_col, token, tf, score)`` for every term of every document
    (consumers take their own top-k; emitting the full matrix keeps the
    operator's output independent of float-ranking ties across engines).

    Scale shape: explode → ``groupBy(id, token)`` (one shuffle, partial
    counts), document frequencies from the same frame (second shuffle on
    token), then a token-keyed join — no broadcast assumption on the
    vocabulary, which at corpus scale is itself large. The corpus size
    N rides along as a lazy 1-row aggregate broadcast into the score
    expression (no driver-side count at plan-build time, no extra scan
    when the plan runs).
    """
    n_docs = df.agg(
        F.countDistinct(id_col).cast("double").alias("_n_docs")
    )
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    tf = words.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(dfreq, on="token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "token",
            F.col("tf").cast("long").alias("tf"),
            (F.col("tf") * F.log(F.col("_n_docs") / F.col("df"))).alias("score"),
        )
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-(document, term) Okapi BM25 over whitespace tokens:

    ``idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`` with the
    Robertson idf ``ln((N − df + 0.5)/(df + 0.5) + 1)`` — the ranking
    function search engines actually use, one notch past TF-IDF.
    Returns ``(id_col, token, tf, score)`` for every term (full matrix,
    same rationale as :func:`tfidf_scores`).

    Scale shape mirrors :func:`tfidf_scores`; the two corpus constants
    (N, avgdl) ride along as ONE lazy 1-row aggregate broadcast into the
    score expression — no driver-side action, no extra scan.
    """
    consts = df.agg(
        F.countDistinct(id_col).cast("double").alias("_n_docs"),
        F.avg(word_count(F.col(text_col)).cast("double")).alias("_avgdl"),
    )
    words = df.select(
        F.col(id_col),
        word_count(F.col(text_col)).cast("double").alias("_dl"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    tf = words.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf"), F.first("_dl").alias("_dl")
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("_n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
    return (
        tf.join(dfreq, on="token")
        .crossJoin(F.broadcast(consts))
        .select(
            F.col(id_col),
            "token",
            F.col("tf").cast("long").alias("tf"),
            (idf * F.col("tf") * (k1 + 1.0) / denom).alias("score"),
        )
    )


def lm_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """C43 — unigram language-model quality score: each document's mean
    token log-probability under the corpus's OWN unigram distribution
    (``mean ln(count_token / total_tokens)``) — the classic
    fluency/quality signal a curation pipeline thresholds on (documents
    full of rare junk tokens score far below fluent ones). No smoothing
    term: every scored token exists in the corpus by construction.

    Scale shape: one token-count shuffle over the exploded corpus
    (map-side partials), the total as a 1-row broadcast, then the
    per-document re-aggregation joins the exploded tokens against the
    vocabulary-sized count table — a broadcast-or-bucketed dimension
    join, never a corpus-sized shuffle of anything but the token stream
    itself. Tokenization is the same whitespace contract as
    :func:`build_vocab` / :func:`tfidf_scores`.

    Returns ``(id_col, n_tokens, avg_logp)``; documents with no tokens
    drop out (nothing to score).
    """
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    counts = words.groupBy("token").agg(F.count(F.lit(1)).alias("_n"))
    total = words.agg(F.count(F.lit(1)).alias("_t"))
    logp = counts.crossJoin(F.broadcast(total)).select(
        "token", F.log(F.col("_n") / F.col("_t")).alias("_lp")
    )
    return (
        words.join(logp, on="token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.sum("_lp") / F.count(F.lit(1)), 6).alias("avg_logp"),
        )
    )


def bigram_lm_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """C48 — bigram language-model quality score: each document's mean
    conditional log-probability ``mean ln(c(w1,w2) / c_prefix(w1))``
    under the corpus's OWN bigram distribution — the next step up from
    :func:`lm_score`'s unigram signal (fluent word ORDER now matters:
    shuffled-word junk that fools a unigram model scores low here). No
    smoothing: every scored bigram exists in the corpus by
    construction, and the prefix counts come from the same bigram
    table, so probabilities per prefix sum to exactly 1.

    Scale shape: tokens explode once with positions, adjacency is a
    ``lead`` window over the per-document ordering (one shuffle keyed
    by document — same key the re-aggregation needs), the bigram and
    prefix count tables are vocabulary²-bounded dimension joins. No
    corpus-sized shuffle beyond the token stream.

    Returns ``(id_col, n_bigrams, avg_logp)``; documents with fewer
    than 2 tokens drop out (nothing to score).
    """
    from pyspark.sql import Window

    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "_pos", "_w1"
        ),
    ).filter(F.col("_w1") != "")
    w = Window.partitionBy(id_col).orderBy("_pos")
    bi = words.withColumn("_w2", F.lead("_w1").over(w)).filter(
        F.col("_w2").isNotNull()
    )
    counts2 = bi.groupBy("_w1", "_w2").agg(F.count(F.lit(1)).alias("_n2"))
    counts1 = bi.groupBy("_w1").agg(F.count(F.lit(1)).alias("_n1"))
    logp = counts2.join(counts1, on="_w1").select(
        "_w1", "_w2", F.log(F.col("_n2") / F.col("_n1")).alias("_lp")
    )
    return (
        bi.join(logp, on=["_w1", "_w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.sum("_lp") / F.count(F.lit(1)), 6).alias("avg_logp"),
        )
    )


def kneser_ney_bigrams(
    df: DataFrame, id_col: str, text_col: str, top_n: int = 200
) -> DataFrame:
    """Interpolated Kneser-Ney smoothed bigram probabilities — the
    classic n-gram LM smoothing (Kneser & Ney 1995; the KenLM default)
    and the natural upgrade of :func:`bigram_lm_score`'s unsmoothed
    estimator. Absolute discount ``D = n1/(n1 + 2·n2)`` (counts of
    bigram types seen once/twice), and

        P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
                 + [D · N1+(w1·)/c(w1·)] · [N1+(·w2)/types]

    where ``N1+(w1·)``/``N1+(·w2)`` are distinct-successor/-predecessor
    type counts and ``types`` the distinct-bigram total — the
    continuation-probability backoff that makes "Francisco" rare after
    anything but "San".

    Returns the ``top_n`` bigrams by raw count (ties broken on the
    token strings): ``(w1, w2, c, p_kn)`` with ``p_kn`` rounded to 6 dp.

    Determinism + scale shape: every aggregate is an INTEGER count
    (map-side combinable; no float sums anywhere, so no partition-order
    sensitivity), the discount and probability are per-row expressions
    over those integers with IEEE divisions in a fixed tree — bit-equal
    on any engine. The count tables are vocabulary²-bounded dimension
    frames; the scalar (n1, n2, types) row broadcasts; the top-k is
    TakeOrdered (per-partition heads + driver merge), never a global
    sort.
    """
    from pyspark.sql import Window

    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "_pos", "_w1"
        ),
    ).filter(F.col("_w1") != "")
    w = Window.partitionBy(id_col).orderBy("_pos")
    bi = words.withColumn("_w2", F.lead("_w1").over(w)).filter(
        F.col("_w2").isNotNull()
    )
    bc = bi.groupBy("_w1", "_w2").agg(F.count(F.lit(1)).alias("_c"))
    bc = bc.localCheckpoint(eager=False)  # feeds ctx/prec/scalars + output
    ctx = bc.groupBy("_w1").agg(
        F.sum("_c").alias("_ctx"), F.count(F.lit(1)).alias("_nfollow")
    )
    prec = bc.groupBy("_w2").agg(F.count(F.lit(1)).alias("_nprec"))
    scalars = bc.agg(
        F.count(F.when(F.col("_c") == 1, F.lit(1))).alias("_s1"),
        F.count(F.when(F.col("_c") == 2, F.lit(1))).alias("_s2"),
        F.count(F.lit(1)).alias("_types"),
    )
    j = (
        bc.join(ctx, on="_w1")
        .join(prec, on="_w2")
        .crossJoin(F.broadcast(scalars))
    )
    # degenerate-corpus guard: with NO singleton/doubleton bigram types
    # (every bigram repeats 3+ times — real at sf0.1's templated docs)
    # the discount denominator n1 + 2*n2 is 0; KN degrades to D = 0
    # (plain MLE, no mass to redistribute) instead of a divide-by-zero
    d = F.when(
        F.col("_s1") + F.lit(2) * F.col("_s2") == 0, F.lit(0.0)
    ).otherwise(
        F.col("_s1").cast("double") / (F.col("_s1") + F.lit(2) * F.col("_s2"))
    )
    p_kn = (
        F.greatest(F.col("_c") - d, F.lit(0.0)) / F.col("_ctx")
    ) + (
        (d * F.col("_nfollow") / F.col("_ctx"))
        * (F.col("_nprec").cast("double") / F.col("_types"))
    )
    return (
        j.select(
            F.col("_w1").alias("w1"),
            F.col("_w2").alias("w2"),
            F.col("_c").cast("bigint").alias("c"),
            F.round(p_kn, 6).alias("p_kn"),
        )
        .orderBy(F.col("c").desc(), "w1", "w2")
        .limit(top_n)
    )


def kneser_ney_doc_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_logp: float = -9.0,
) -> DataFrame:
    """C134 — per-document PERPLEXITY gate under the corpus's own
    interpolated Kneser-Ney bigram LM: the standard quality filter a
    curation pipeline runs (CCNet/KenLM-style — docs whose mean bigram
    log-probability falls below a threshold are flagged as junk). This
    composes :func:`kneser_ney_bigrams`'s probability table (FULL, not
    top-k) with a per-document scoring pass — VERDICT r12 next #10.

    Determinism discipline (the c102 lesson): each bigram's ``ln p_kn``
    is one fixed IEEE expression tree, snapped to a MICRO fixed-point
    grid per bigram TYPE (``floor(ln(p)·1e6 + 0.5)`` as int64) BEFORE
    the per-document sum, so the sum is an integer — order-independent
    under any partitioning — and the keep-gate compares integers:
    ``Σ lp_fp ≥ threshold_fp · n_bigrams``. No float crosses an
    aggregation or the output boundary.

    Scale shape: the bigram-type table (vocabulary²-bounded) carries the
    probability; the corpus bigram stream joins it on (w1, w2) — a
    dimension join, broadcast-or-bucketed; the scalar (n1, n2, types)
    row broadcasts; the per-document aggregation is one groupBy(id)
    with map-side integer partials. 100× corpus = 100× token stream,
    sub-linear bigram-type growth — linear end to end.

    Returns ``(id_col, n_bigrams, lp_sum_fp, keep)``; documents with
    fewer than 2 tokens drop out (no bigram to score).
    """
    from pyspark.sql import Window

    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "_pos", "_w1"
        ),
    ).filter(F.col("_w1") != "")
    w = Window.partitionBy(id_col).orderBy("_pos")
    bi = words.withColumn("_w2", F.lead("_w1").over(w)).filter(
        F.col("_w2").isNotNull()
    )
    bc = bi.groupBy("_w1", "_w2").agg(F.count(F.lit(1)).alias("_c"))
    bc = bc.localCheckpoint(eager=False)  # feeds ctx/prec/scalars + join
    ctx = bc.groupBy("_w1").agg(
        F.sum("_c").alias("_ctx"), F.count(F.lit(1)).alias("_nfollow")
    )
    prec = bc.groupBy("_w2").agg(F.count(F.lit(1)).alias("_nprec"))
    scalars = bc.agg(
        F.count(F.when(F.col("_c") == 1, F.lit(1))).alias("_s1"),
        F.count(F.when(F.col("_c") == 2, F.lit(1))).alias("_s2"),
        F.count(F.lit(1)).alias("_types"),
    )
    j = (
        bc.join(ctx, on="_w1")
        .join(prec, on="_w2")
        .crossJoin(F.broadcast(scalars))
    )
    # IDENTICAL expression tree to kneser_ney_bigrams (and its oracle)
    # degenerate-corpus guard: with NO singleton/doubleton bigram types
    # (every bigram repeats 3+ times — real at sf0.1's templated docs)
    # the discount denominator n1 + 2*n2 is 0; KN degrades to D = 0
    # (plain MLE, no mass to redistribute) instead of a divide-by-zero
    d = F.when(
        F.col("_s1") + F.lit(2) * F.col("_s2") == 0, F.lit(0.0)
    ).otherwise(
        F.col("_s1").cast("double") / (F.col("_s1") + F.lit(2) * F.col("_s2"))
    )
    p_kn = (
        F.greatest(F.col("_c") - d, F.lit(0.0)) / F.col("_ctx")
    ) + (
        (d * F.col("_nfollow") / F.col("_ctx"))
        * (F.col("_nprec").cast("double") / F.col("_types"))
    )
    lp_fp = F.floor(F.log(p_kn) * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "long"
    )
    table = j.select("_w1", "_w2", lp_fp.alias("_lp_fp"))
    threshold_fp = int(round(threshold_logp * 1_000_000))
    return (
        bi.join(table, on=["_w1", "_w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("_lp_fp").cast("bigint").alias("lp_sum_fp"),
        )
        .withColumn(
            "keep",
            F.col("lp_sum_fp")
            >= F.lit(threshold_fp) * F.col("n_bigrams"),
        )
    )


def zipf_fit(df: DataFrame, text_col: str, top_n: int = 200) -> DataFrame:
    """C49 — Zipf's-law fit of the corpus token distribution: the
    least-squares slope/intercept of ln(frequency) against ln(rank)
    over the ``top_n`` most frequent tokens. Natural-language corpora
    sit near slope −1; scraped boilerplate, spam, and synthetic word
    soup bend away from it — a one-number corpus-health signal for a
    curation dashboard.

    Shape: one token-count shuffle (map-side partials), a rank-ordered
    ``top_n`` head (TakeOrdered — top-k per partition then a driver-k
    merge, never a global sort), then the closed-form normal equations
    as a single aggregate over ``top_n`` rows. Rank ties break on the
    token string, so the fit is deterministic across partitionings.

    Returns one row ``(n_fit, slope, intercept)``.
    """
    from pyspark.sql import Window

    words = df.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    counts = words.groupBy("token").agg(F.count(F.lit(1)).alias("_n"))
    top = counts.orderBy(F.col("_n").desc(), F.col("token").asc()).limit(top_n)
    w = Window.orderBy(F.col("_n").desc(), F.col("token").asc())
    xy = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("_x"),
        F.log(F.col("_n").cast("double")).alias("_y"),
    )
    return xy.agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    ).select(
        F.col("_k").cast("bigint").alias("n_fit"),
        F.round(
            (F.col("_k") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
            / (F.col("_k") * F.col("_sxx") - F.col("_sx") * F.col("_sx")),
            6,
        ).alias("slope"),
        F.round(
            (F.col("_sy") - F.col("_sx")
             * (F.col("_k") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
             / (F.col("_k") * F.col("_sxx") - F.col("_sx") * F.col("_sx")))
            / F.col("_k"),
            6,
        ).alias("intercept"),
    )


def oov_rate(
    df: DataFrame, id_col: str, text_col: str, top_n: int = 32
) -> DataFrame:
    """C54 — per-document out-of-vocabulary rate against the corpus's
    own ``top_n`` vocabulary (:func:`build_vocab`): the tokenizer-fit /
    domain-shift signal a pipeline tracks per source before training
    (a slice whose OOV rate spikes is drifting away from the
    tokenizer). Same whitespace token contract as the rest of the NLP
    suite.

    The vocabulary is ``top_n`` rows — broadcast to the token stream,
    so the whole pass is one explode + one broadcast join + one
    per-document aggregation; the rate divides two exact counts.

    Returns ``(id_col, n_tokens, n_oov, oov_rate)``; blank documents
    drop out.
    """
    vocab = build_vocab(df, text_col, top_n=top_n).select(
        "token", F.lit(1).alias("_in_vocab")
    )
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    return (
        words.join(F.broadcast(vocab), on="token", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_rate", F.round(F.col("n_oov") / F.col("n_tokens"), 6)
        )
    )


def bm25_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
) -> DataFrame:
    """C63 — BM25 retrieval: rank documents against a query token list
    by the sum of their per-term Okapi weights (:func:`bm25_scores`) —
    the actual search-engine scoring loop, and the lexical half of a
    RAG retriever.

    One corpus scan: the matrix filters to the query terms, pivots to
    one column per term (explicit value list — no extra distinct pass),
    and the final score adds those columns in FIXED term order, so the
    float sum is deterministic across engines and partitionings (an
    arbitrary-order SUM aggregate would not be). Top-k with the id as
    tiebreaker = TakeOrdered, no global sort.

    Returns the ``k`` best ``(id_col, score)`` rows, score > 0.
    """
    bm = bm25_scores(df, id_col, text_col)
    piv = (
        bm.filter(F.col("token").isin(list(query_terms)))
        .groupBy(id_col)
        .pivot("token", list(query_terms))
        .agg(F.first("score"))
    )
    score = None
    for t in query_terms:
        term = F.coalesce(F.col(f"`{t}`"), F.lit(0.0))
        score = term if score is None else score + term
    return (
        piv.select(F.col(id_col), score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("score", 6).alias("score"))
    )


def _merge_adjacent(arr, x, y):
    """Greedy left-to-right non-overlapping merge of adjacent (x, y) ->
    x||y inside a symbol array: fold each symbol in; when the
    accumulated tail is x and the incoming symbol is y, replace the tail
    with the merged token. Shared by BPE training and application so the
    two stages are guaranteed the same rewrite."""
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == x) & (s == y),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), s)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 4,
    top_words: int = 200,
) -> DataFrame:
    """BPE merge training (Sennrich et al. 2016, "Neural Machine
    Translation of Rare Words with Subword Units") — the tokenizer-
    induction stage of a training-data pipeline, as DataFrame algebra.

    The corpus collapses FIRST to a word-frequency table (one
    ``groupBy(word)`` shuffle; ``top_words`` most-frequent words by
    count desc / word asc — the standard min-frequency cut every BPE
    trainer applies), so every merge iteration runs over a
    vocabulary-sized table, never the corpus: at 100 TB the corpus is
    scanned exactly once, and each merge is a pair-count aggregation
    plus an array rewrite over ≤ ``top_words`` rows. Each iteration:

    1. count adjacent symbol pairs weighted by word frequency,
    2. pick the most frequent pair (ties: lexicographically smallest),
    3. greedily merge its non-overlapping occurrences left-to-right in
       every word (a pure ``F.aggregate`` fold — no UDFs).

    The winning pair rides back into the rewrite as a broadcast 1-row
    crossJoin, so no driver collect happens per iteration. Returns the
    merge table ``(step, left_sym, right_sym, pair_count)`` — the
    artifact a BPE tokenizer ships.
    """
    from pyspark.sql import Window

    words = (
        df.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(top_words)
        .select("word", "cnt", F.split(F.col("word"), "").alias("syms"))
        # the docstring's "corpus is scanned exactly once" promise needs
        # this cut: step 1's winner broadcast, step 1's rewrite AND the
        # step-1 row of the returned merge table all reference this frame
        # — without the checkpoint each re-executed the corpus scan +
        # word-frequency shuffle (3 full input passes; guide §5)
        .localCheckpoint(eager=False)
    )

    merges = []
    for step in range(1, n_merges + 1):
        pairs = (
            words.filter(F.size("syms") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("x"), b.alias("y")),
                    )
                ).alias("p"),
            )
            .groupBy("p.x", "p.y")
            .agg(F.sum("cnt").alias("pair_count"))
        )
        best = pairs.orderBy(
            F.col("pair_count").desc(), F.col("x").asc(), F.col("y").asc()
        ).limit(1)
        merges.append(
            best.select(
                F.lit(step).alias("step"),
                F.col("x").alias("left_sym"),
                F.col("y").alias("right_sym"),
                F.col("pair_count").cast("bigint").alias("pair_count"),
            )
        )
        words = (
            words.crossJoin(
                F.broadcast(
                    best.select(F.col("x").alias("_bx"), F.col("y").alias("_by"))
                )
            )
            .select(
                "word",
                "cnt",
                _merge_adjacent(F.col("syms"), F.col("_bx"), F.col("_by")).alias(
                    "syms"
                ),
            )
            # EAGER: `best` derives from `words`, so the rewrite embeds
            # two copies of the previous iteration's plan — the same
            # 2^iters analysis blowup as the pointer-doubling self-join.
            # The table is <= top_words rows; materializing is free.
            .localCheckpoint(eager=True)
        )
    out = merges[0]
    for mdf in merges[1:]:
        out = out.unionByName(mdf)
    return out


def bpe_apply(
    df: DataFrame,
    text_col: str,
    merges: DataFrame,
    n_merges: int,
) -> DataFrame:
    """Tokenize the corpus with a trained BPE merge table
    (:func:`bpe_train`'s output) and return the resulting subword
    vocabulary ``(token, n_occurrences)``.

    Same two-level shape as training: the corpus collapses once to the
    word-frequency table, the merge list applies word-by-word in rank
    order (each step one broadcast 1-row crossJoin + the shared
    :func:`_merge_adjacent` fold — training and application cannot
    drift), and the final explode+sum weighs each word's tokens by its
    corpus frequency. Corpus scanned once; everything after is
    vocabulary-sized.
    """
    words = (
        df.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("word", "cnt", F.split(F.col("word"), "").alias("syms"))
    )
    for step in range(1, n_merges + 1):
        m = merges.filter(F.col("step") == step).select(
            F.col("left_sym").alias("_bx"), F.col("right_sym").alias("_by")
        )
        words = (
            words.crossJoin(F.broadcast(m))
            .select(
                "word",
                "cnt",
                _merge_adjacent(F.col("syms"), F.col("_bx"), F.col("_by")).alias(
                    "syms"
                ),
            )
            # merges is itself a (checkpointed) result of the training
            # loop, so this chain stays linear; eager keeps each step's
            # plan from restacking the previous rewrites
            .localCheckpoint(eager=True)
        )
    return (
        words.select("cnt", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").cast("bigint").alias("n_occurrences"))
    )


def hashed_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 64,
) -> DataFrame:
    """Hashing-trick feature vectors (Weinberger et al. 2009): each
    token hashes to a bucket in ``[0, dim)`` with a ±1 sign from an
    independent hash, and a document's feature is the signed count sum
    per bucket — fixed-width features with NO vocabulary pass, the
    property that matters at 100 TB (one corpus scan, one
    ``(id, bucket)`` aggregation, no dictionary to build, broadcast, or
    grow stale). Both hashes are the engine's md5-fold, so every cell
    value replays in SQL.

    Returns the sparse long form ``(id, bucket, val)`` — the natural
    join shape for downstream linear models; densify only at the edge.
    """
    from neo4j_graphdb_spark.functions.hashing import md5_bucket

    toks = df.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("token"),
    )
    return (
        toks.select(
            id_col,
            md5_bucket("token", "fh:", dim).cast("int").alias("bucket"),
            (md5_bucket("token", "fhsign:", 2) * 2 - 1).cast("bigint").alias("_s"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("_s").cast("bigint").alias("val"))
    )


def ppmi_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 2,
    min_count: int = 5,
) -> DataFrame:
    """Positive pointwise mutual information over forward co-occurrence
    pairs (the count statistics under SGNS/GloVe-style embeddings —
    Levy & Goldberg 2014's PPMI matrix): token w co-occurs with each of
    the next ``window`` tokens in its document; PPMI(w,c) =
    max(0, ln(n_wc·T / (n_w·n_c))) over the pair table's own marginals.

    Adjacency comes from ``window`` lead() columns over one per-document
    sort — no self-join of the position table — then everything is
    integer aggregation; the single ln() per surviving pair runs on
    integer-exact inputs, so 6-dp rounding is engine-stable. Pairs below
    ``min_count`` drop before the marginal join (noise in PMI, and the
    cut keeps the output bounded).

    Returns ``(w, c, n_wc, ppmi)``.
    """
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("pos", "w"),
    )
    ww = W.partitionBy("_doc").orderBy("pos")
    pair_cols = [F.lead("w", d).over(ww).alias(f"_c{d}") for d in range(1, window + 1)]
    pairs = (
        toks.select("w", *pair_cols)
        .select(
            "w",
            F.explode(
                F.array(*[F.col(f"_c{d}") for d in range(1, window + 1)])
            ).alias("c"),
        )
        .filter(F.col("c").isNotNull())
        .groupBy("w", "c")
        .agg(F.count(F.lit(1)).alias("n_wc"))
        .localCheckpoint(eager=False)  # reused by totals + both marginals
    )
    total = pairs.agg(F.sum("n_wc").alias("_t"))
    n_w = pairs.groupBy("w").agg(F.sum("n_wc").alias("_nw"))
    n_c = pairs.groupBy("c").agg(F.sum("n_wc").alias("_nc"))
    return (
        pairs.filter(F.col("n_wc") >= min_count)
        .join(n_w, on="w")
        .join(n_c, on="c")
        .crossJoin(F.broadcast(total))
        .select(
            "w",
            "c",
            F.col("n_wc").cast("bigint").alias("n_wc"),
            F.round(
                F.greatest(
                    F.lit(0.0),
                    F.log(
                        F.col("n_wc").cast("double")
                        * F.col("_t").cast("double")
                        / (F.col("_nw").cast("double") * F.col("_nc").cast("double"))
                    ),
                ),
                6,
            ).alias("ppmi"),
        )
    )


def dup_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 20,
) -> DataFrame:
    """Cross-document duplicated-span detection — the memorization-risk
    signal of an LLM training corpus (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", found verbatim ~50-token
    spans repeated across web corpora drive memorization): every
    ``window``-token sliding span is hashed, spans occurring in 2+
    DISTINCT documents are flagged, and each document reports how much
    of it is made of flagged spans.

    Returns ``(id_col, n_spans, n_dup_spans, dup_fraction)`` — one row
    per document with at least ``window`` tokens; ``dup_fraction``
    rounded to 6 dp.

    Scale shape: the explode produces ~one row per token (the same
    order of magnitude as any tokenization pass); the duplicate-span
    set comes from ONE map-side-combined ``groupBy(span_hash)`` whose
    agg is ``count(distinct doc) >= 2`` capped semantics via two-level
    aggregation, and flags flow back by a single semi-joinable hash
    join on the span hash. No pairwise document comparison exists
    anywhere — cost is linear in corpus tokens, the only shape that
    survives 100 TB. The span hash is md5 over the joined window, so
    the entire pipeline replays in SQL.
    """
    c = F.lower(F.trim(F.col(text_col)))
    words = F.split(c, r"\s+")
    # parallelize the span explode even off a single-file corpus (one
    # input split otherwise serializes the md5-per-span work on a core)
    from neo4j_graphdb_spark.session import spread_partitions

    base = spread_partitions(df).select(
        F.col(id_col), words.alias("_w"), F.size(words).alias("_n")
    ).filter(F.col("_n") >= window)
    spans = base.select(
        id_col,
        F.explode(
            F.sequence(F.lit(1), F.col("_n") - F.lit(window - 1))
        ).alias("_i"),
        F.col("_w"),
    ).select(
        id_col,
        F.md5(
            F.concat_ws(" ", F.slice(F.col("_w"), F.col("_i"), window))
        ).alias("_span"),
    )
    spans = spans.localCheckpoint(eager=False)  # reused: flag build + stats
    dup = (
        spans.select("_span", id_col)
        .distinct()
        .groupBy("_span")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("_span")
    )
    flagged = spans.join(dup, on="_span", how="left_semi")
    tot = spans.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_spans"))
    hit = flagged.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_dup_spans"))
    return (
        tot.join(hit, on=id_col, how="left")
        .select(
            id_col,
            F.col("n_spans").cast("bigint").alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("bigint").alias("n_dup_spans"),
            F.round(
                F.coalesce("n_dup_spans", F.lit(0)) / F.col("n_spans"), 6
            ).alias("dup_fraction"),
        )
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Per-document n-gram NOVELTY against everything that came before
    it in corpus order — the "how much new text does each increment
    add" curve a growing training set is steered by (novelty collapsing
    toward 0 = the crawl is re-reading the web; the doc-level signal
    behind RefinedWeb/FineWeb's diminishing-returns analyses). A
    document's distinct word ``n``-grams split into *novel* (this doc
    is the minimum ``id_col`` ever containing the gram) vs *seen*;
    ``novelty = novel / n_grams``.

    Corpus order is ``id_col`` (ingest sequence). Same first-occurrence
    algebra as :func:`paragraph_dedup`, one level down: a
    map-side-combinable ``groupBy(gram).min(id)`` election (skew-immune
    — no windows), one join back, integer counts, one rounded ratio.
    Documents shorter than ``n`` tokens drop out.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    grams = df.select(
        F.col(id_col),
        toks.alias("_w"),
        F.size(toks).alias("_n"),
    ).filter(F.col("_n") >= n).select(
        id_col,
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.col("_n") - F.lit(n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("_w"), i, n)),
                )
            )
        ).alias("_g"),
    )
    grams = grams.localCheckpoint(eager=False)  # reused: election + counts
    first = grams.groupBy("_g").agg(F.min(F.col(id_col)).alias("_first"))
    flagged = grams.join(first, on="_g")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.when(F.col(id_col) == F.col("_first"), F.lit(1))).alias(
                "novel"
            ),
        )
        .select(
            id_col,
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.col("novel").cast("bigint").alias("novel"),
            F.round(F.col("novel") / F.col("n_grams"), 6).alias("novelty"),
        )
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    para_tokens: int = 20,
) -> DataFrame:
    """CCNet-style cross-corpus paragraph deduplication (Wenzek et al.
    2020: hash every paragraph, keep one copy corpus-wide, drop the
    rest) — the removal counterpart of :func:`dup_span_stats`' flagging.
    The fixture corpus carries no newline structure, so the paragraph
    unit here is consecutive NON-overlapping ``para_tokens``-word
    windows; on real data swap the splitter for ``split(text, '\\n\\n')``
    without changing the rest of the plan.

    Every distinct paragraph survives exactly at its FIRST occurrence —
    minimum ``(doc id, paragraph index)``, the deterministic total order
    CCNet's shard-sequential scan induces — and every later copy
    (cross-document AND intra-document) is dropped. Returns one row per
    non-empty document: ``(id_col, n_paras, kept, kept_chars)`` — the
    post-dedup retention profile (a doc whose every paragraph appeared
    earlier reports ``kept = 0``: the "document dissolves" case a
    downstream length filter then removes).

    Scale shape: one narrow chunk-explode, one map-side-combinable
    ``groupBy(paragraph).agg(min(struct(id, idx)))`` to elect winners,
    one hash join back, one per-doc groupBy. The min-struct aggregation
    deliberately replaces the rank-1 window a naive port would use: a
    viral paragraph repeated 10^9 times partial-aggregates to one row
    per map task instead of sorting 10^9 rows inside a single window
    partition — skew-immune at 100 TB. Grouping is by the paragraph
    string itself (exact; at petabyte scale substitute
    ``xxhash64(paragraph)`` to shrink the shuffle, accepting the
    2^-64 collision odds every production pipeline accepts).
    """
    from neo4j_graphdb_spark.session import spread_partitions

    # bind the token array to a column first: slicing the raw
    # split+filter EXPRESSION would re-tokenize once per paragraph
    base = spread_partitions(df).select(
        F.col(id_col),
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
        ).alias("_w"),
    )
    toks = F.col("_w")
    n = F.size(toks)
    n_para = F.ceil(n / F.lit(para_tokens)).cast("int")
    paras_arr = F.transform(
        F.sequence(F.lit(0), n_para - 1),
        lambda i: F.array_join(
            F.slice(toks, i * para_tokens + 1, para_tokens), " "
        ),
    )
    ex = (
        base.filter(n > 0)
        .select(F.col(id_col), F.posexplode(paras_arr).alias("_p", "_para"))
        .localCheckpoint(eager=False)  # reused: winner election + both counts
    )
    winners = ex.groupBy("_para").agg(
        F.min(F.struct(F.col(id_col).alias("_i"), F.col("_p").alias("_x"))).alias("_w")
    )
    kept = ex.join(winners, on="_para").filter(
        (F.col(id_col) == F.col("_w._i")) & (F.col("_p") == F.col("_w._x"))
    )
    tot = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_paras"))
    won = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("kept"),
        F.sum(F.length("_para")).alias("kept_chars"),
    )
    return tot.join(won, on=id_col, how="left").select(
        id_col,
        F.col("n_paras").cast("bigint").alias("n_paras"),
        F.coalesce("kept", F.lit(0)).cast("bigint").alias("kept"),
        F.coalesce("kept_chars", F.lit(0)).cast("bigint").alias("kept_chars"),
    )


def term_cooccurrence_graph(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 3,
    max_df: int = 40,
    per_doc_cap: int = 12,
    min_co: int = 2,
    top_n: int = 200,
    term_ngram: int = 1,
) -> DataFrame:
    """Term co-occurrence graph construction — the build step of a
    GraphRAG pipeline (the reference ships langchain-neo4j + the
    literal "GraphRAG" label, /root/reference/requirements.txt:2-6,
    main.py:9, but never constructs the graph; c84 retrieves over one):
    mid-frequency "entity" terms (document frequency in
    [``min_df``, ``max_df``] — frequent enough to connect, rare enough
    to discriminate) become nodes, and two terms sharing ≥ ``min_co``
    documents become an edge weighted by co-document count and NPMI
    (normalized pointwise mutual information, +1 ≈ perfect
    association).

    Returns the ``top_n`` edges by (co-count desc, a, b):
    ``(a, b, co, npmi)`` with a < b and npmi rounded to 6 dp.

    Scale shape + skew bound: the quadratic step — pairing terms within
    a document — is capped at ``per_doc_cap``² per document by a
    DETERMINISTIC per-doc term head (rarest-first: df asc, term asc),
    so a pathological 10⁶-term document contributes 66 pairs, not
    10¹². The df filter itself kills the power-law head (stopwords)
    before any join. All counts are integers; NPMI is one per-row IEEE
    tree over them — no float sums, no partition sensitivity.

    ``term_ngram=2`` uses adjacent word bigrams (joined with ``_``) as
    the entity unit — the discriminative stand-in when a real NER
    tagger isn't in the loop (swap one in upstream as a column without
    touching the graph shape).
    """
    from pyspark.sql import Window

    from neo4j_graphdb_spark.session import spread_partitions

    # Materialize the token array behind a projection boundary BEFORE
    # the bigram transform references it: element_at over the raw
    # split+filter EXPRESSION would re-evaluate the whole tokenization
    # per lambda element (O(tokens²) per document — measured 18 s vs
    # <2 s at sf0.1); over a bound column it evaluates once per row.
    # spread_partitions parallelizes the tokenize/zip stage off a
    # single-split local parquet (no-op on a pre-split cluster input).
    base = spread_partitions(df).select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda x: x != F.lit(""),
        ).alias("_toks"),
    )
    toks = F.col("_toks")
    if term_ngram == 1:
        units = toks
    elif term_ngram == 2:
        # adjacent pairs as zip_with over two shifted slices — the array
        # evaluates O(1) times per row, vs per-element with an
        # element_at(…, i) transform
        n = F.size(toks)
        units = F.when(
            n >= 2,
            F.zip_with(
                F.slice(toks, F.lit(1), n - 1),
                F.slice(toks, F.lit(2), n - 1),
                lambda a, b: F.concat(a, F.lit("_"), b),
            ),
        ).otherwise(F.array().cast("array<string>"))
    else:
        raise ValueError(f"term_ngram must be 1 or 2 (got {term_ngram})")
    terms = base.select(
        F.col(id_col),
        F.explode(F.array_distinct(units)).alias("term"),
    ).localCheckpoint(eager=False)  # reused: df counts + per-doc term join
    # distinct-doc total as a broadcast 1-row frame, not a separate
    # driver-side count() job — one less full pass over the corpus
    ndocs = F.broadcast(
        df.agg(F.countDistinct(F.col(id_col)).alias("_nd"))
    )
    dfreq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    kept = dfreq.filter(
        (F.col("_df") >= min_df) & (F.col("_df") <= max_df)
    )
    doc_terms = terms.join(F.broadcast(kept), on="term")
    w = Window.partitionBy(id_col).orderBy(F.col("_df").asc(), F.col("term").asc())
    capped = (
        doc_terms.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_doc_cap)
        .drop("_rn")
        .localCheckpoint(eager=False)  # both sides of the pair join
    )
    lhs = capped.select(
        F.col(id_col), F.col("term").alias("a"), F.col("_df").alias("_dfa")
    )
    rhs = capped.select(
        F.col(id_col), F.col("term").alias("b"), F.col("_df").alias("_dfb")
    )
    pairs = (
        lhs.join(rhs, on=id_col)
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b", "_dfa", "_dfb")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= min_co)
        .crossJoin(ndocs)
    )
    npmi = F.ln(
        (F.col("co") * F.col("_nd")).cast("double")
        / (F.col("_dfa") * F.col("_dfb"))
    ) / (-F.ln(F.col("co").cast("double") / F.col("_nd")))
    return (
        pairs.select(
            "a",
            "b",
            F.col("co").cast("bigint").alias("co"),
            F.round(npmi, 6).alias("npmi"),
        )
        .orderBy(F.col("co").desc(), "a", "b")
        .limit(top_n)
    )


_MULTI_TLDS = ("co.uk", "com.au", "co.jp", "com.br", "co.in")


def registrable_domain(
    host: Column | str, multi_tlds: tuple[str, ...] = _MULTI_TLDS
) -> Column:
    """The registrable ("eTLD+1") domain of a hostname: the label just
    above the public suffix — ``a.b.evil.co.uk`` → ``evil.co.uk``,
    ``cdn.evil.com`` → ``evil.com``. ``multi_tlds`` is the multi-label
    public-suffix subset in play (a stand-in for the full Mozilla PSL,
    which slots in as a broadcast lookup without changing the shape).
    Pure column expressions — split, negative ``element_at``, one
    ``isin`` against a literal set — whole-stage-codegen all the way.
    """
    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(h, r"\.")
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".",
        F.element_at(parts, -3),
        F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    return F.when(last2.isin(*multi_tlds), last3).otherwise(last2)


def domain_blocklist_filter(
    df: DataFrame,
    url_col: str,
    blocked: DataFrame,
    multi_tlds: tuple[str, ...] = _MULTI_TLDS,
) -> DataFrame:
    """Opt-out / compliance domain filtering — the step a responsible
    crawl pipeline runs first: drop every document whose URL's
    REGISTRABLE domain appears in the blocklist, so ``evil.com``,
    ``www.evil.com`` and ``a.b.evil.com`` all fall to one blocklist row
    (suffix-blind exact-host matching, the naive alternative, misses
    the subdomain forms). ``blocked``'s first column holds registrable
    domains, lowercase.

    Scale shape: host extraction and eTLD+1 derivation are per-row
    regexp/split expressions (JVM, codegen); the drop is a BROADCAST
    left-anti hash join — opt-out lists are thousands of rows against
    billions of documents, so the doc side never shuffles at all.
    Returns the surviving rows plus ``_host`` / ``_reg`` columns (the
    audit trail a compliance review asks for).
    """
    host = F.lower(
        F.regexp_extract(
            F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1
        )
    )
    out = df.withColumn("_host", host).withColumn(
        "_reg", registrable_domain(F.col("_host"), multi_tlds)
    )
    bl = blocked.select(F.lower(F.col(blocked.columns[0])).alias("_reg"))
    return out.join(F.broadcast(bl), on="_reg", how="left_anti")


def canonical_url(col: Column | str) -> Column:
    """URL canonicalization for crawl-style dedup — the normalization
    every common-crawl pipeline applies before exact URL dedup (cf. the
    reference's link-keyed upsert, /root/reference/src/crwling.py:47-56,
    which dedups on the RAW link and so re-crawls http/https/utm
    variants of the same page).

    Steps, in order: trim → drop the #fragment → lowercase scheme+host →
    strip a redundant default port (:80 on http, :443 on https) → strip
    a leading www. → drop tracking query params (utm_*, fbclid, gclid)
    → collapse the ?/& debris that leaves behind → strip one trailing
    slash. A pure regexp_replace chain: JVM-side, whole-stage-codegen,
    and every pattern is RE2-safe (no lookarounds) so the same chain
    replays verbatim in DuckDB for the oracle.
    """
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    u = F.regexp_replace(u, r"#.*$", "")
    # lowercase ONLY scheme://host (path/query stay case-significant)
    head = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    tail = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    u = F.concat(head, tail)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?#].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?#].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(https?://)www\.", r"$1")
    u = F.regexp_replace(u, r"([?&])(utm_[^=&#]*|fbclid|gclid)=[^&#]*", r"$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"(.)/$", r"$1")
    return u


def linear_quality_gate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 64,
    threshold_milli: int = 0,
) -> DataFrame:
    """Model-based quality gate: score every document with a PRETRAINED
    linear classifier over hashing-trick features and keep the docs
    above a margin threshold — the DCLM / DataComp-LM selection recipe
    (Li et al. 2024: a fasttext linear model over bag-of-words is the
    single strongest curation filter), same shape as the CCNet/GPT-3
    "looks-like-reference-corpus" logistic gate.

    Spark-first decomposition: one corpus scan through
    :func:`hashed_features` (signed hashed unigram counts — no
    vocabulary pass, fixed width at any corpus size), one broadcast-free
    per-``(id, bucket)`` aggregation it already does, then a per-doc
    weighted sum — a sparse dot product as plain column algebra. The
    coefficient table is DETERMINISTIC (Knuth multiplicative residues of
    the bucket id, milli units: ``w(b) = ((b+1)·2654435761) % 2001 −
    1000``): the container ships no model file, so a reproducible
    stand-in takes its place — swap ``weight_expr`` for a real
    coefficient join at deployment; the plumbing (feature hash, sparse
    dot product, integer margin) is the production path. Integer
    end-to-end: no float crosses an aggregation or the driver hash.

    Returns ``(id, n_features, logit_milli, kept)``.
    """
    feats = hashed_features(df, text_col, id_col, dim)
    w = (
        (F.col("bucket").cast("bigint") + 1) * F.lit(2654435761)
    ) % 2001 - 1000
    return (
        feats.withColumn("_w", w)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_features"),
            F.sum(F.col("val") * F.col("_w")).cast("bigint").alias(
                "logit_milli"
            ),
        )
        .withColumn("kept", F.col("logit_milli") >= F.lit(threshold_milli))
    )
