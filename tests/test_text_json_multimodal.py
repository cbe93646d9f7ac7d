"""Tier B5-B7 + C10-C12: text analysis, JSON access, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from neo4j_graphdb_spark.functions.text import (
    bpe_ish_token_count,
    clean_text,
    detect_language,
    doc_fingerprint,
    impute_publisher,
    ingest_filter,
    quality_score_cols,
    word_count,
)
from neo4j_graphdb_spark.operators.json_ops import json_get, json_get_int, json_parse
from neo4j_graphdb_spark.operators.multimodal import (
    embedding_features,
    extract_media_features,
    synthetic_media,
)


def _one(spark, text):
    return spark.createDataFrame([(text,)], "s string")


def test_clean_text_vectors(spark):
    """The reference's clean_text contract (src/crwling.py:37-43)."""
    cases = {
        "<b>hello</b> world": "hello world",
        "a\nb\tc\rd": "a b c d",
        "foo​bar": "foobar",  # zero-width DELETED, not blanked
        "  padded  ": "padded",
        "": "",
        "<div><p>x</p></div>": "x",
    }
    for raw, want in cases.items():
        got = _one(spark, raw).select(clean_text("s").alias("c")).collect()[0]["c"]
        assert got == want, f"{raw!r} -> {got!r}, want {want!r}"


def test_ingest_filter_and_impute(spark):
    df = spark.createDataFrame(
        [
            ("https://news.example/a", "long enough title", None),
            ("https://google.com/x", "long enough title", "P"),
            ("https://news.example/b", "tiny", "P"),
        ],
        "link string, title string, publisher string",
    )
    kept = ingest_filter(df).select(
        "link", impute_publisher("publisher").alias("publisher")
    ).collect()
    assert len(kept) == 1
    assert kept[0]["link"] == "https://news.example/a"
    assert kept[0]["publisher"] == "Google News"


def test_word_and_token_counts(spark):
    df = _one(spark, "Hello, world! 42 times")
    r = df.select(
        word_count("s").alias("w"), bpe_ish_token_count("s").alias("t")
    ).collect()[0]
    assert r["w"] == 4
    # Hello , world ! 42 times → 6 bpe-ish tokens
    assert r["t"] == 6
    assert _one(spark, "   ").select(word_count("s").alias("w")).collect()[0]["w"] == 0


def test_quality_scores(spark):
    q = quality_score_cols(F.col("s"))
    r = _one(spark, "the cat!").select(
        q["n_chars"].alias("c"), q["n_words"].alias("w"),
        q["punct_ratio"].alias("p"), q["stopword_ratio"].alias("st"),
        q["mean_word_len"].alias("m"),
    ).collect()[0]
    assert r["c"] == 8 and r["w"] == 2
    assert r["p"] == pytest.approx(1 / 8)
    assert r["st"] == pytest.approx(0.5)  # 'the' of 2 words
    assert r["m"] == pytest.approx(7 / 2)  # 'thecat!' / 2


def test_detect_language(spark):
    cases = {
        "der Hund ist nicht hier": "de",
        "le chat est dans la maison": "fr",
        "el perro es una mascota": "es",
        "这是一个中文句子": "zh",
        "plain english text": "en",
    }
    for text, want in cases.items():
        got = _one(spark, text).select(detect_language("s").alias("l")).collect()[0]["l"]
        assert got == want, f"{text!r} -> {got}"


def test_doc_fingerprint_stability(spark):
    a = _one(spark, "Some document   body text").select(doc_fingerprint("s").alias("f"))
    b = _one(spark, "some DOCUMENT body\t\ttext").select(doc_fingerprint("s").alias("f"))
    # whitespace/case-normalized → identical fingerprints
    assert a.collect()[0]["f"] == b.collect()[0]["f"]


def test_json_access(spark):
    df = spark.createDataFrame([('{"k": 87, "tag": "x"}',)], "props string")
    r = df.select(
        json_get("props", "k").alias("ks"),
        json_get_int("props", "k").alias("ki"),
        json_get("props", "tag").alias("t"),
        json_parse("props", "k bigint, tag string").alias("st"),
    ).collect()[0]
    assert r["ks"] == "87" and r["ki"] == 87 and r["t"] == "x"
    assert r["st"]["k"] == 87 and r["st"]["tag"] == "x"


def test_multimodal_plumbing(spark, sf_dir):
    from neo4j_graphdb_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(30)
    media = synthetic_media(docs, "doc_id", "text")
    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert r["kind"] in {"image", "audio", "video"}
        assert r["n_bytes"] > 0
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-9  # histogram normalized


def test_embedding_features(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0])], "vec_id bigint, embedding array<float>"
    )
    r = embedding_features(df).collect()[0]
    assert r["l2_norm"] == pytest.approx(5.0)
    assert r["mean_val"] == pytest.approx(3.5)
    assert r["max_val"] == pytest.approx(4.0)


def test_decoder_registry_swap(spark):
    """C11: a registered kernel replaces the stub for its kind without
    touching the Spark stage; other kinds keep the default."""
    from neo4j_graphdb_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(0, "aaa"), (1, "bbb"), (2, "ccc"), (3, "ddd")], "doc_id long, text string"
    )
    media = mm.synthetic_media(docs, "doc_id", "text")
    try:
        mm.register_decoder("image", lambda payload, kind: [42.0])
        out = {r["media_id"]: r for r in mm.extract_media_features(media).collect()}
    finally:
        mm.register_decoder("image", mm._decode_stub)
    image_ids = [r["media_id"] for r in media.filter("kind = 'image'").collect()]
    assert image_ids
    for mid, row in out.items():
        if mid in image_ids:
            assert row["feature"] == [42.0]
        else:
            assert len(row["feature"]) == 8  # stub histogram

    import pytest as _pytest

    with _pytest.raises(ValueError):
        mm.register_decoder("hologram", lambda p, k: [])


def test_resize_media_crop_and_registry(spark):
    """C11 resize plumbing: stub crops to max_bytes; a registered kernel
    replaces it per kind without touching the mapInPandas stage."""
    from neo4j_graphdb_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(0, "x" * 50), (1, "y" * 5), (2, "z" * 50)], "doc_id long, text string"
    )
    media = mm.synthetic_media(docs, "doc_id", "text")
    out = {r["media_id"]: r for r in mm.resize_media(media, max_bytes=16).collect()}
    assert out[0]["out_bytes"] == 16 and out[0]["thumb"] == b"x" * 16
    assert out[1]["out_bytes"] == 5 and out[1]["thumb"] == b"y" * 5  # shorter than box

    try:
        mm.register_resizer("image", lambda p, k, n: b"IMG")
        swapped = {
            r["media_id"]: r["thumb"]
            for r in mm.resize_media(media, max_bytes=16).collect()
        }
    finally:
        mm.register_resizer("image", mm._resize_stub)
    assert swapped[0] == b"IMG"  # doc 0 -> image kind
    assert swapped[2] == b"z" * 16  # video keeps the stub

    import pytest as _p

    with _p.raises(ValueError):
        mm.register_resizer("hologram", lambda p, k, n: b"")


def test_sample_frames_fanout(spark):
    """C11 frame sampling: fixed-size frame slicing with stride, video
    rows only, last frame is the remainder."""
    from neo4j_graphdb_spark.operators import multimodal as mm

    # doc 2 -> video; payload 10 bytes, frame_bytes=3 -> frames 0..3,
    # stride 2 keeps 0 and 2; frame 3 (remainder, 1 byte) is skipped
    docs = spark.createDataFrame(
        [(2, "abcdefghij"), (0, "not-a-video")], "doc_id long, text string"
    )
    media = mm.synthetic_media(docs, "doc_id", "text")
    rows = {
        (r["media_id"], r["frame_idx"]): (r["n_bytes"], r["frame"])
        for r in mm.sample_frames(media, frame_bytes=3, stride=2).collect()
    }
    assert rows == {(2, 0): (3, b"abc"), (2, 2): (3, b"ghi")}

    # stride 1 keeps every frame incl. the 1-byte remainder
    rows = {
        r["frame_idx"]: r["frame"]
        for r in mm.sample_frames(media, frame_bytes=3, stride=1).collect()
    }
    assert rows == {0: b"abc", 1: b"def", 2: b"ghi", 3: b"j"}


def test_chunk_documents_windows(spark):
    from neo4j_graphdb_spark.functions.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "solo"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, "text", "doc_id", chunk_tokens=4, overlap=1)
    rows = {(r["doc_id"], r["chunk_id"]): (r["chunk"], r["n_tokens"]) for r in out.collect()}
    # doc 1: stride 3 -> starts 0,3,6 (ceil((10-1)/3)=3 windows)
    assert rows[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert rows[(1, 1)] == ("w3 w4 w5 w6", 4)
    assert rows[(1, 2)] == ("w6 w7 w8 w9", 4)
    assert (1, 3) not in rows
    assert rows[(2, 0)] == ("solo", 1)  # short doc: one remainder window
    assert not any(d == 3 for d, _ in rows)  # empty text yields NO chunks

    import pytest as _p

    with _p.raises(ValueError):
        chunk_documents(docs, "text", "doc_id", chunk_tokens=4, overlap=4)


def test_chunking_oracle_agrees_on_blank_documents(spark):
    """Engine vs DuckDB oracle on a corpus that CONTAINS blank and
    whitespace-only documents: both must emit zero chunks for them
    (the oracle once produced a phantom ('', 1) chunk — green on the
    fixtures only because they had no blank text)."""
    import duckdb
    import pandas as pd

    from neo4j_graphdb_spark.functions.text import chunk_documents
    from neo4j_graphdb_spark.registry import ORACLES

    rows = [
        (1, " ".join(f"w{i}" for i in range(150))),
        (2, "short doc"),
        (3, ""),  # blank
        (4, "   \t\n  "),  # whitespace-only (tabs/newlines beat trim)
        (5, "\t lead  and   trail \n"),  # empty split-tokens at both ends
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk"], r["n_tokens"])
        for r in chunk_documents(docs, "text", "doc_id", chunk_tokens=64, overlap=16).collect()
    }

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {
        (int(d), int(c)): (ch, int(n))
        for d, c, ch, n in con.execute(ORACLES["c10_chunking"]).fetchall()
    }
    assert got == want
    assert not any(d in (3, 4) for d, _ in got)  # blank docs -> no chunks
    assert got[(5, 0)] == ("lead and trail", 3)  # no empty tokens survive


def test_deterministic_split_reproducible(spark):
    from neo4j_graphdb_spark.functions.text import deterministic_split

    docs = spark.range(2000).withColumnRenamed("id", "k")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["k"]: r["split"] for r in deterministic_split(docs, "k", w).collect()}
    b = {r["k"]: r["split"] for r in deterministic_split(docs, "k", w).collect()}
    assert a == b  # same assignment every run
    from collections import Counter

    frac = Counter(a.values())
    assert 0.75 < frac["train"] / 2000 < 0.85
    assert 0.07 < frac["val"] / 2000 < 0.13
    # different salt -> different assignment
    c = {r["k"]: r["split"] for r in deterministic_split(docs, "k", w, salt="x").collect()}
    assert a != c

    import pytest as _p

    with _p.raises(ValueError):
        deterministic_split(docs, "k", {"train": 0.5, "val": 0.1})


def test_redact_pii_patterns(spark):
    from neo4j_graphdb_spark.functions.text import redact_pii

    rows = [
        (1, "mail a.b+c@foo-bar.co.uk now"),
        (2, "server at 192.168.1.254 up"),
        (3, "call +1 (555) 010-9999 today"),
        (4, "clean text with no pii 42"),
        (5, "released 2026-08-13 and spans 1998 2024 fine"),
        (6, "card 4111 1111 1111 1111 leaked"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    out = {r["id"]: r["red"] for r in df.select("id", redact_pii("t").alias("red")).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "server at <IP> up"
    assert out[3] == "call <PHONE> today"
    assert out[4] == "clean text with no pii 42"
    # dates and year pairs are NOT phone-shaped (under the 10-digit floor)
    assert out[5] == "released 2026-08-13 and spans 1998 2024 fine"
    # 16-digit card redacts
    assert out[6] == "card <PHONE> leaked"


def test_repetition_stats_values(spark):
    from neo4j_graphdb_spark.functions.text import repetition_stats

    rows = [
        (1, "a a a a"),            # 1 distinct of 4 -> dup .75, top 1.0
        (2, "a b c d"),            # all distinct
        (3, "x y\nx y\nz w"),      # 3 lines, 1 dup line
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    st = repetition_stats("t")
    out = {
        r["id"]: (r["dw"], r["tw"], r["dl"])
        for r in df.select(
            "id",
            st["dup_word_frac"].alias("dw"),
            st["top_word_frac"].alias("tw"),
            st["dup_line_frac"].alias("dl"),
        ).collect()
    }
    assert out[1] == (0.75, 1.0, 0.0)
    assert out[2] == (0.0, 0.25, 0.0)
    assert out[3][2] == 1.0 / 3.0


def test_build_vocab_rank_and_determinism(spark):
    from neo4j_graphdb_spark.functions.text import build_vocab

    rows = [(1, "b a a c c c"), (2, "a  c"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = [(r["token"], r["n_occurrences"], r["token_id"]) for r in
           build_vocab(df, "text", top_n=2).orderBy("token_id").collect()]
    # c: 4, a: 3, b: 1 -> top-2 keeps c then a; empty strings dropped
    assert out == [("c", 4, 1), ("a", 3, 2)]
    # count tie -> token asc decides the id order
    tie = spark.createDataFrame([(1, "z y z y")], "doc_id long, text string")
    t = [(r["token"], r["token_id"]) for r in
         build_vocab(tie, "text").orderBy("token_id").collect()]
    assert t == [("y", 1), ("z", 2)]


def test_tfidf_scores_formula(spark):
    import math

    from neo4j_graphdb_spark.functions.text import tfidf_scores

    rows = [(1, "a a b"), (2, "a c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_id"], r["token"]): (r["tf"], r["score"])
           for r in tfidf_scores(df, "doc_id", "text").collect()}
    # 'a' appears in both docs -> idf = ln(2/2) = 0
    assert out[(1, "a")] == (2, 0.0) and out[(2, "a")] == (1, 0.0)
    # 'b' and 'c' are singletons -> idf = ln(2/1)
    assert out[(1, "b")][1] == pytest.approx(math.log(2.0))
    assert out[(2, "c")][1] == pytest.approx(math.log(2.0))


def test_bm25_scores_formula(spark):
    import math

    from neo4j_graphdb_spark.functions.text import bm25_scores

    rows = [(1, "a a b"), (2, "a c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_id"], r["token"]): r["score"]
           for r in bm25_scores(df, "doc_id", "text").collect()}
    n, avgdl, k1, b = 2.0, 2.5, 1.2, 0.75

    def ref(tf, dfreq, dl):
        idf = math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert out[(1, "a")] == pytest.approx(ref(2, 2, 3))
    assert out[(1, "b")] == pytest.approx(ref(1, 1, 3))
    assert out[(2, "c")] == pytest.approx(ref(1, 1, 2))
    # common term scores below rare term at same tf
    assert out[(2, "a")] < out[(2, "c")]


def test_lm_score_ranks_fluent_above_junk(spark):
    """Common-token documents outscore rare-token ones; a doc repeating
    the corpus's dominant token has the highest mean log-prob, and the
    hand-computed value matches."""
    import math

    from neo4j_graphdb_spark.functions.text import lm_score

    docs = spark.createDataFrame(
        [
            (1, "the the the the"),
            (2, "the the rare1 rare2"),
            (3, "zzz qqq xxx yyy"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in lm_score(docs, "doc_id", "text").collect()}
    assert out[1]["avg_logp"] > out[2]["avg_logp"] > out[3]["avg_logp"]
    assert out[1]["n_tokens"] == 4
    # corpus: 12 tokens, 'the' appears 6 times -> doc1 score = ln(6/12)
    assert out[1]["avg_logp"] == pytest.approx(math.log(0.5), abs=1e-6)
    # doc3: four singletons -> ln(1/12)
    assert out[3]["avg_logp"] == pytest.approx(math.log(1 / 12), abs=1e-6)


def test_bigram_lm_score_hand_checked(spark):
    """Corpus 'a b', 'a b', 'a c': bigrams ab,ab,ac -> p(b|a)=2/3,
    p(c|a)=1/3; every doc has exactly 1 bigram."""
    import math

    from neo4j_graphdb_spark.functions.text import bigram_lm_score

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "solo"), (5, "  ")],
        "id bigint, text string",
    )
    got = {r["id"]: (r["n_bigrams"], r["avg_logp"]) for r in
           bigram_lm_score(docs, "id", "text").collect()}
    assert set(got) == {1, 2, 3}  # <2 tokens drops out
    assert got[1] == (1, round(math.log(2 / 3), 6))
    assert got[2] == got[1]
    assert got[3] == (1, round(math.log(1 / 3), 6))


def test_bigram_lm_orders_matter(spark):
    """The same word multiset in different orders gets different bigram
    scores (the property the unigram model lacks)."""
    from neo4j_graphdb_spark.functions.text import bigram_lm_score, lm_score

    import math

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a c b")],
        "id bigint, text string",
    )
    uni = {r["id"]: r["avg_logp"] for r in lm_score(docs, "id", "text").collect()}
    assert len(set(uni.values())) == 1  # unigram: identical scores
    bi = {r["id"]: r["avg_logp"] for r in bigram_lm_score(docs, "id", "text").collect()}
    # p(b|a)=2/3, p(c|b)=1; p(c|a)=1/3, p(b|c)=1
    assert bi[1] == bi[2] == round(math.log(2 / 3) / 2, 6)
    assert bi[3] == round(math.log(1 / 3) / 2, 6)
    assert bi[1] > bi[3]  # the repeated order wins


def test_zipf_fit_exact_power_law(spark):
    """A 4-token corpus with frequencies 64/32/16/8: the engine's
    closed-form fit matches a hand-computed least squares on the same
    (ln rank, ln freq) points."""
    import math

    from neo4j_graphdb_spark.functions.text import zipf_fit

    docs = []
    did = 0
    for i, tok in enumerate(["t0", "t1", "t2", "t3"]):
        freq = 64 >> i  # frequencies 64, 32, 16, 8 at ranks 1..4
        for _ in range(freq):
            docs.append((did, tok))
            did += 1
    df = spark.createDataFrame(docs, "id bigint, text string")
    row = zipf_fit(df, "text", top_n=4).collect()[0]
    # freq_k = 64 * 2^-k at rank k+1: ln f = ln 64 - k ln 2, ln r = ln(k+1)
    # -> NOT an exact line in ln r; instead assert the closed form matches
    # a NumPy-free manual least squares on the same 4 points
    xs = [math.log(r) for r in (1, 2, 3, 4)]
    ys = [math.log(f) for f in (64, 32, 16, 8)]
    k = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    intercept = (sy - sx * slope) / k
    assert row["n_fit"] == 4
    assert abs(row["slope"] - round(slope, 6)) <= 1e-6
    assert abs(row["intercept"] - round(intercept, 6)) <= 1e-6


def test_zipf_fit_rank_ties_deterministic(spark):
    """Equal-frequency tokens rank by token string, so the fit is
    reproducible across partitionings."""
    from neo4j_graphdb_spark.functions.text import zipf_fit

    df = spark.createDataFrame(
        [(1, "b a"), (2, "a b")], "id bigint, text string"
    )
    r1 = zipf_fit(df, "text", top_n=2).collect()[0]
    r2 = zipf_fit(df.repartition(7), "text", top_n=2).collect()[0]
    assert (r1["slope"], r1["intercept"]) == (r2["slope"], r2["intercept"])


def test_oov_rate_hand_checked(spark):
    """top_n=2 vocab is {a, b} (count desc, token asc ties): doc 3's
    'c d' is fully OOV, doc 1 fully in-vocab, doc 2 half."""
    from neo4j_graphdb_spark.functions.text import oov_rate

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "c d"), (4, "   ")],
        "id bigint, text string",
    )
    got = {
        r["id"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in oov_rate(docs, "id", "text", top_n=2).collect()
    }
    # counts: a=2, b=2, c=2, d=1 -> vocab {a, b} (token asc tiebreak)
    assert got == {1: (3, 0, 0.0), 2: (2, 1, 0.5), 3: (2, 2, 1.0)}


def test_tar_shards_deterministic_and_round_trip(spark):
    """Shard tar BYTES are identical across runs/partitionings (zeroed
    headers, sorted members), and the unpack inventory matches the
    input payloads."""
    import hashlib

    from neo4j_graphdb_spark.operators.multimodal import synthetic_media
    from neo4j_graphdb_spark.sources.datafmt import pack_tar_shards, unpack_tar_shards

    docs = spark.createDataFrame(
        [(i, f"payload {i}") for i in range(9)], "doc_id long, text string"
    )
    media = synthetic_media(docs, "doc_id", "text")
    s1 = {r["shard"]: bytes(r["tar"]) for r in pack_tar_shards(media, n_shards=3).collect()}
    s2 = {
        r["shard"]: bytes(r["tar"])
        for r in pack_tar_shards(media.repartition(5), n_shards=3).collect()
    }
    assert s1 == s2  # byte-identical archives

    inv = {
        r["member"]: (r["n_bytes"], r["payload_md5"])
        for r in unpack_tar_shards(pack_tar_shards(media, n_shards=3)).collect()
    }
    for i in range(9):
        text = f"payload {i}".encode()
        assert inv[f"{i}.bin"] == (len(text), hashlib.md5(text).hexdigest())


def test_bm25_search_ranks_matching_docs(spark):
    """Documents repeating a query term outrank ones mentioning it
    once; non-matching docs never appear; scores are deterministic
    across partitionings."""
    from neo4j_graphdb_spark.functions.text import bm25_search

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark engine"),
            (2, "spark engine"),
            (3, "completely different words"),
            (4, "engine only here"),
        ],
        "id bigint, text string",
    )
    got = [(r["id"], r["score"]) for r in
           bm25_search(docs, "id", "text", ["spark"], k=10).collect()]
    assert [i for i, _ in got] == [1, 2]
    assert got[0][1] > got[1][1]

    again = [(r["id"], r["score"]) for r in
             bm25_search(docs.repartition(7), "id", "text", ["spark"], k=10).collect()]
    assert got == again


def test_bpe_train_hand_checked(spark):
    """Textbook BPE on 'aaab'×3 + 'ab'×1: (a,a) wins round 1 with 6
    weighted occurrences (two per 'aaab'), the greedy rewrite leaves
    [aa,a,b], then (a,b) with 4, then (aa,ab) with 3."""
    from neo4j_graphdb_spark.functions.text import bpe_train

    docs = spark.createDataFrame(
        [("aaab aaab aaab ab",)], "text string"
    )
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(docs, "text", n_merges=3, top_words=10)
        .orderBy("step")
        .collect()
    ]
    assert got == [(1, "a", "a", 6), (2, "a", "b", 4), (3, "aa", "ab", 3)]


def test_bpe_apply_textbook(spark):
    """Applying the 3 trained merges to the training corpus itself fully
    re-fuses 'aaab' ('aa'+'ab' -> 'aaab') and leaves 'ab' one token."""
    from neo4j_graphdb_spark.functions.text import bpe_apply, bpe_train

    docs = spark.createDataFrame([("aaab aaab aaab ab",)], "text string")
    merges = bpe_train(docs, "text", n_merges=3, top_words=10)
    got = {
        r["token"]: r["n_occurrences"]
        for r in bpe_apply(docs, "text", merges, n_merges=3).collect()
    }
    assert got == {"aaab": 3, "ab": 1}


def test_hashed_features_consistent_and_signed(spark):
    """Same token → same (bucket, sign) everywhere: a doc with one token
    repeated n times has exactly one feature cell of magnitude n, and
    two docs sharing a token land in the same bucket."""
    from neo4j_graphdb_spark.functions.text import hashed_features

    docs = spark.createDataFrame(
        [(1, "zebra zebra zebra"), (2, "zebra"), (3, "aardvark")],
        "doc_id bigint, text string",
    )
    rows = hashed_features(docs, "text", "doc_id", dim=16).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["bucket"], r["val"]))
    assert len(by_doc[1]) == 1 and abs(by_doc[1][0][1]) == 3
    assert len(by_doc[2]) == 1 and abs(by_doc[2][0][1]) == 1
    assert by_doc[1][0][0] == by_doc[2][0][0]  # same token, same bucket
    assert by_doc[1][0][1] // 3 == by_doc[2][0][1]  # same sign too


def test_ppmi_hand_checked(spark):
    """'x y x y x y' with window 2: forward pairs (x,y)=3, (x,x)=2,
    (y,x)=2, (y,y)=2, T=9; PPMI(x,y)=ln(3·9/(5·5))."""
    import math

    from neo4j_graphdb_spark.functions.text import ppmi_pairs

    docs = spark.createDataFrame([(1, "x y x y x y")], "doc_id bigint, text string")
    rows = {
        (r["w"], r["c"]): (r["n_wc"], r["ppmi"])
        for r in ppmi_pairs(docs, "text", "doc_id", window=2, min_count=1).collect()
    }
    assert {k: v[0] for k, v in rows.items()} == {
        ("x", "y"): 3, ("x", "x"): 2, ("y", "x"): 2, ("y", "y"): 2,
    }
    # marginals: nw(x)=5, nw(y)=4, nc(x)=4, nc(y)=5
    assert rows[("x", "y")][1] == round(max(0.0, math.log(3 * 9 / (5 * 5))), 6)
    # ln(2·9/(4·5)) = ln(0.9) < 0 → clipped to exactly 0 (the P in PPMI)
    assert rows[("y", "y")][1] == 0.0


def test_bmp_encode_decode_roundtrip_and_errors(spark):
    """The real BMP kernel recovers dimensions and exact channel means
    from spec-conformant bytes (wraparound included) and rejects
    non-BMP / non-24-bit payloads instead of fabricating features."""
    import pytest as _p

    from neo4j_graphdb_spark.operators.multimodal import (
        bmp_decode_kernel,
        bmp_encode,
    )

    m = 99
    b = bmp_encode(8, 6, lambda x, y, c: 31 * m + 7 * x + 13 * y + 5 * c)
    w, h, mb, mg, mr = bmp_decode_kernel(b, "image")
    assert (w, h) == (8.0, 6.0)
    exp = [
        sum((31 * m + 7 * x + 13 * y + 5 * c) % 256 for x in range(8) for y in range(6)) / 48
        for c in range(3)
    ]
    assert [mb, mg, mr] == exp
    with _p.raises(ValueError):
        bmp_decode_kernel(b"JUNKJUNKJUNKJUNK", "image")
    # 24-bit only: flip the bpp field
    bad = bytearray(b)
    bad[28] = 8
    with _p.raises(ValueError):
        bmp_decode_kernel(bytes(bad), "image")


def test_wav_encode_decode_roundtrip_and_errors(spark):
    """The real WAV kernel walks RIFF chunks (padding respected),
    recovers rate/count/mean/RMS exactly, and rejects non-RIFF or
    non-PCM16 payloads."""
    import math

    import pytest as _p

    from neo4j_graphdb_spark.operators.multimodal import (
        wav_decode_kernel,
        wav_encode,
    )

    vals = [(37 * i * i + 11 * i) % 2001 - 1000 for i in range(48)]
    b = wav_encode(48, 8000, lambda i: vals[i])
    sr, n, mean, rms = wav_decode_kernel(b, "audio")
    assert (sr, n) == (8000.0, 48.0)
    assert mean == sum(vals) / 48
    assert rms == math.sqrt(sum(v * v for v in vals) / 48)
    with _p.raises(ValueError):
        wav_decode_kernel(b"NOTRIFFDATA0", "audio")
    bad = bytearray(b)
    bad[20] = 3  # audio_fmt = IEEE float -> unsupported
    with _p.raises(ValueError):
        wav_decode_kernel(bytes(bad), "audio")


def test_gif_probe_blocks_and_errors(spark):
    """The GIF probe walks the real block stream: frames counted through
    image descriptors, extensions skipped, malformed containers
    rejected."""
    import pytest as _p

    from neo4j_graphdb_spark.operators.multimodal import (
        gif_encode,
        gif_probe_kernel,
    )

    b = gif_encode(16, 9, 3)
    assert gif_probe_kernel(b, "video") == [16.0, 9.0, 3.0, 2.0]
    # splice a graphic-control extension before the trailer: still 3 frames
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = b[:-1] + ext + b"\x3b"
    assert gif_probe_kernel(spliced, "video") == [16.0, 9.0, 3.0, 2.0]
    with _p.raises(ValueError):
        gif_probe_kernel(b"NOTAGIF89a....", "video")
    with _p.raises(ValueError):
        gif_probe_kernel(b[:-1], "video")  # trailer chopped off


def test_dup_span_stats_known_duplicates(spark):
    """Two docs sharing an exact 20-token block are mutually flagged for
    exactly the block's spans; the unique doc reports zero; short docs
    (under the window) drop out."""
    from neo4j_graphdb_spark.functions.text import dup_span_stats

    block = " ".join(f"tok{i}" for i in range(20))
    rows = [
        (1, block + " tailA unique alpha"),
        (2, "headB leading " + block),
        (3, " ".join(f"other{i}" for i in range(25))),
        (4, "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in dup_span_stats(df, "doc_id", "text").collect()}
    assert set(got) == {1, 2, 3}  # doc 4 < 20 tokens
    # doc1: 23 tokens -> 4 spans, only the leading pure block span dups
    assert got[1]["n_spans"] == 4 and got[1]["n_dup_spans"] == 1
    # doc2: 22 tokens -> 3 spans, only the trailing pure block span dups
    assert got[2]["n_spans"] == 3 and got[2]["n_dup_spans"] == 1
    assert got[3]["n_dup_spans"] == 0
    assert abs(got[1]["dup_fraction"] - 0.25) < 1e-9


def test_lexical_diversity_exact_ratios(spark):
    """Hand-checked TTR / Gini-Simpson / top-share: 'a a a b' → n=4,
    distinct=2, ttr=0.5, simpson=1-(9+1)/16=0.375, top=0.75; a
    degenerate single-token doc scores simpson 0; an empty doc drops."""
    from neo4j_graphdb_spark.functions.text import lexical_diversity

    df = spark.createDataFrame(
        [
            (1, "a a a b"),
            (2, "x x x x"),
            (3, "ww xx yy zz"),
            (4, "?!#"),  # no word tokens
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["distinct_tokens"],
            r["ttr"], r["simpson"], r["top_ratio"],
        )
        for r in lexical_diversity(df, "doc_id", "text").collect()
    }
    assert got == {
        1: (4, 2, 0.5, 0.375, 0.75),
        2: (4, 1, 0.25, 0.0, 1.0),
        3: (4, 4, 1.0, 0.75, 0.25),
    }
