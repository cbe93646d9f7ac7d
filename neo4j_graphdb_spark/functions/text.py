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
