"""Tier C7-C9: dedup and similarity with hand-checkable answers."""

import math

import pytest
from pyspark.sql import functions as F

from neo4j_graphdb_spark.operators.dedup import (
    exact_dedup,
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from neo4j_graphdb_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_cosine_topk,
)


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base.replace("today", "tonight")  # one-word change: high jaccard
    far = "completely different text about spark dataframes and shuffle partitions"
    return spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base)],  # 4 = exact dup of 1
        "doc_id bigint, text string",
    )


def test_exact_dedup(spark, corpus):
    kept = sorted(r["doc_id"] for r in exact_dedup(corpus, "text", "doc_id").collect())
    assert kept == [1, 2, 3]  # 4 deduped into 1 (min id wins)
    groups = {r["keeper_id"]: r["n_dups"] for r in exact_dup_groups(corpus, "text", "doc_id").collect()}
    assert groups == {1: 2, 2: 1, 3: 1}


def test_minhash_signature_shape_and_determinism(spark, corpus):
    s1 = minhash_signatures(corpus, "text", "doc_id", num_hashes=32).collect()
    s2 = minhash_signatures(corpus, "text", "doc_id", num_hashes=32).collect()
    sig = {r["doc_id"]: r["minhash"] for r in s1}
    assert all(len(v) == 32 for v in sig.values())
    assert sig == {r["doc_id"]: r["minhash"] for r in s2}  # deterministic
    assert sig[1] == sig[4]  # identical text → identical signature
    # near-dup shares most mins; unrelated shares few
    shared_near = sum(a == b for a, b in zip(sig[1], sig[2]))
    shared_far = sum(a == b for a, b in zip(sig[1], sig[3]))
    assert shared_near > shared_far


def test_minhash_lsh_finds_near_dups(spark, corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            corpus, "text", "doc_id", num_hashes=64, bands=16, jaccard_threshold=0.5
        ).collect()
    }
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs and 0.5 < pairs[(1, 2)] < 1.0
    assert not any(3 in p for p in pairs)


def test_ngram_jaccard_blocked(spark, corpus):
    blocked = corpus.withColumn("blk", F.lit(1))
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            blocked, "text", "doc_id", block_cols=["blk"], shingle_n=1, threshold=0.5
        ).collect()
    }
    assert pairs[(1, 4)] == 1.0
    # word sets: base has 12 distinct words, near swaps 1 → J = 11/13
    assert abs(pairs[(1, 2)] - 11 / 13) < 1e-9


def test_simhash_proximity(spark, corpus):
    h = {r["doc_id"]: r["simhash"] for r in simhash(corpus, "text", "doc_id").collect()}
    assert h[1] == h[4]

    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert hamming(h[1], h[2]) < hamming(h[1], h[3])
    assert hamming(h[1], h[2]) <= 16


def test_cosine_topk_hand_computed(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id bigint, embedding array<float>",
    )
    q = spark.createDataFrame(
        [(100, [2.0, 0.0])], "query_id bigint, embedding array<float>"
    )
    rows = cosine_topk(corpus, q, k=3).collect()
    got = {r["vec_id"]: (r["cosine"], r["rank"]) for r in rows}
    assert got[1][0] == pytest.approx(1.0) and got[1][1] == 1
    assert got[3][0] == pytest.approx(1 / math.sqrt(2)) and got[3][1] == 2
    assert got[2][0] == pytest.approx(0.0) and got[2][1] == 3


def test_lsh_ann_recall_vs_exact(spark, sf_dir):
    """LSH ANN must recover most of the exact top-5 on the fixture
    embeddings (recall measured against the exact baseline)."""
    from neo4j_graphdb_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, q, k=5).collect()
        if r["query_id"] != r["vec_id"]
    }
    # fixture embeddings are near-random (top-5 cosine ≈ 0.3), so the
    # sign-bit collision probability is only ~0.6/bit — few bits + many
    # tables is the right operating point (p_table=0.21, 8 tables → 0.85
    # expected recall); clustered real corpora would use 10-12 bits.
    approx = {
        (r["query_id"], r["vec_id"])
        for r in lsh_cosine_topk(emb, q, dim=64, k=5, num_tables=8, num_bits=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_ivf_topk_recall_and_determinism(spark, sf_dir):
    """IVF ANN: deterministic output (seeded centroids, no RNG) and
    reasonable recall against the exact baseline when probing a quarter
    of the cells."""
    from neo4j_graphdb_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    r1 = sorted(
        (r["query_id"], r["vec_id"], r["rank"])
        for r in ivf_topk(emb, q, n_centroids=16, nprobe=4, k=5).collect()
    )
    r2 = sorted(
        (r["query_id"], r["vec_id"], r["rank"])
        for r in ivf_topk(emb, q, n_centroids=16, nprobe=4, k=5).collect()
    )
    assert r1 == r2  # no RNG anywhere in the path
    assert len(r1) == 15  # k results per query — cells are never empty here

    exact = {
        (r["query_id"], r["vec_id"]) for r in cosine_topk(emb, q, k=5).collect()
    }
    approx = {(a, b) for a, b, _ in r1}
    recall = len(exact & approx) / len(exact)
    # near-random fixture embeddings scatter neighbors across cells;
    # probing 4/16 cells must still beat the 25% random-probe floor
    assert recall >= 0.25, f"IVF recall too low: {recall}"

    # probing ALL cells makes IVF exhaustive — must equal the exact top-k
    full = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(emb, q, n_centroids=16, nprobe=16, k=5).collect()
    }
    assert full == exact


def test_kmeans_fit_and_ivf_recall(spark, sf_dir):
    """kmeans_fit: deterministic, k bounded, 64-dim double centroids;
    feeding it to ivf_topk keeps rank-1 self-recall perfect and overall
    recall vs exact top-k reasonable for nprobe=3/8 cells."""
    from neo4j_graphdb_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_fit,
    )
    from neo4j_graphdb_spark.session import load_table

    embeddings = load_table(spark, sf_dir, "embeddings")

    cents1 = kmeans_fit(embeddings, k=8, iters=2)
    cents2 = kmeans_fit(embeddings, k=8, iters=2)
    rows1 = sorted((r["centroid_id"], tuple(r["centroid"])) for r in cents1.collect())
    rows2 = sorted((r["centroid_id"], tuple(r["centroid"])) for r in cents2.collect())
    assert rows1 == rows2  # deterministic
    assert 1 <= len(rows1) <= 8
    assert all(len(v) == 64 for _, v in rows1)

    qs = embeddings.orderBy("vec_id").limit(10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = ivf_topk(embeddings, qs, nprobe=3, k=5, centroids=cents1)
    exact = cosine_topk(embeddings, qs, k=5)
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    # every query finds itself at rank 1 (cosine 1.0 lives in its own cell)
    assert {(q, q) for q, _ in e} <= a
    recall = len(a & e) / len(e)
    assert recall >= 0.5, recall


def test_stream_near_dup_batch_equivalence(spark, corpus):
    """The stream-static gate is stream/batch agnostic: run it on the
    corpus split odd/even as plain batch frames and check it finds
    exactly the cross-split near-dups that minhash_lsh_pairs finds on
    the full corpus — including the exact-dup pair (1, 4), which crosses
    the split (1 streams, 4 is history) at jaccard 1.0."""
    from neo4j_graphdb_spark.operators.dedup import stream_near_dup

    stream = corpus.filter(F.col("doc_id") % 2 == 1)
    hist = corpus.filter(F.col("doc_id") % 2 == 0)
    hits = stream_near_dup(
        stream, hist, hash_mode="md5_60", jaccard_threshold=0.6
    )
    got = {(r["stream_id"], r["hist_id"]) for r in hits.collect()}
    full = minhash_lsh_pairs(
        corpus, "text", "doc_id", num_hashes=64, bands=16,
        jaccard_threshold=0.6, hash_mode="md5_60",
    )
    expect = set()
    for r in full.collect():
        a, b = r["id_a"], r["id_b"]
        if a % 2 != b % 2:
            s, h = (a, b) if a % 2 == 1 else (b, a)
            expect.add((s, h))
    assert got == expect
    assert (1, 4) in got  # exact dup across the split, jaccard 1.0
    jac = {(r["stream_id"], r["hist_id"]): r["jaccard"] for r in hits.collect()}
    assert jac[(1, 4)] == pytest.approx(1.0)


def test_quantize_int8_round_trip(spark):
    """Known vector: max_abs 2.0 -> scale 2/127; the max element hits
    ±127 exactly; dequantized values land within scale/2 of the input;
    the zero vector keeps scale 0 / all-zero codes / zero error."""
    from neo4j_graphdb_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(1, [2.0, -1.0, 0.5, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    r1 = out[1]
    assert r1["scale"] == pytest.approx(2.0 / 127.0, abs=1e-6)
    assert r1["q8"] == [127, -63, 32, 0]  # floor(x*63.5 + 0.5)
    assert r1["rmse"] < 2.0 / 127.0 / 2  # within half a quant step
    r2 = out[2]
    assert (r2["scale"], r2["q8"], r2["rmse"]) == (0.0, [0, 0, 0, 0], 0.0)


def test_containment_subset_duplicate(spark):
    """A short doc fully embedded in a long one: Jaccard is low but
    containment of the short side is 1.0 — the pair LSH-by-Jaccard
    misses by design."""
    from neo4j_graphdb_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta"
    long_ = short + " " + " ".join(f"w{i}" for i in range(40))
    other = "zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, other)], "doc_id bigint, text string"
    )
    out = {
        (r["src"], r["dst"]): (r["n_shared"], r["containment"])
        for r in containment_pairs(
            df, "text", "doc_id", shingle_n=3, max_df=5, threshold=0.5
        ).collect()
    }
    # short doc has 2 distinct 3-shingles, both inside the long doc
    assert out[(1, 2)] == (2, 1.0)
    # reverse direction: 2 of the long doc's 43 shingles -> below 0.5
    assert (2, 1) not in out
    assert all(3 not in p for p in out)


def test_containment_rare_blocking_bounds_candidates(spark):
    """A shingle shared by MORE than max_df documents generates no
    candidates (the documented blindness that bounds the fan-out)."""
    from neo4j_graphdb_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(
        [(i, "common phrase here") for i in range(10)],
        "doc_id bigint, text string",
    )
    out = containment_pairs(
        df, "text", "doc_id", shingle_n=3, max_df=5, threshold=0.1
    )
    assert out.count() == 0


def test_random_projection_signs_hand_checked(spark):
    """1-dim vectors expose each component's sign directly: it must
    match the md5 parity the docstring promises, scaled by 1/sqrt(k)."""
    import hashlib
    import math

    from neo4j_graphdb_spark.operators.similarity import random_projection

    df = spark.createDataFrame([(1, [2.0]), (2, [-1.5])], "vec_id bigint, embedding array<float>")
    rows = {r["vec_id"]: r for r in random_projection(df, "embedding", "vec_id", out_dim=4).collect()}
    for k in range(4):
        first_hex = hashlib.md5(f"rp:{k}:0".encode()).hexdigest()[0]
        sign = 1.0 if int(first_hex, 16) < 8 else -1.0
        assert rows[1][f"y{k}"] == round(sign * 2.0 / math.sqrt(4), 6)
        assert rows[2][f"y{k}"] == round(sign * -1.5 / math.sqrt(4), 6)


def test_ann_recall_hand_checked(spark):
    """Recall counts exact-set hits: 2 of 3 approx ids correct for q1,
    full miss for q2."""
    from neo4j_graphdb_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20)], "query_id bigint, vec_id bigint"
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 12), (1, 99), (2, 98)], "query_id bigint, vec_id bigint"
    )
    got = {
        r["query_id"]: (r["n_exact"], r["n_hit"], r["recall"])
        for r in ann_recall(exact, approx).collect()
    }
    assert got == {1: (3, 2, round(2 / 3, 6)), 2: (1, 0, 0.0)}


def test_pq_topk_clustered_recall_and_self_hit(spark):
    """PQ ADC on two tight clusters: a query drawn from cluster A must
    rank its own vector first (its encoding reconstructs to the same
    codes → minimal table distance) and fill its top-3 with cluster-A
    members only."""
    from neo4j_graphdb_spark.operators.similarity import pq_topk

    a = [[1.0, 0.0, 1.0, 0.0] * 2 for _ in range(4)]
    b = [[0.0, 5.0, 0.0, 5.0] * 2 for _ in range(4)]
    rows = [(i, [v + 0.01 * i for v in vec]) for i, vec in enumerate(a)] + [
        (10 + i, [v + 0.01 * i for v in vec]) for i, vec in enumerate(b)
    ]
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = corpus.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = pq_topk(corpus, q, dim=8, m=2, k_codes=4, iters=1, k=3).collect()
    assert [r["rank"] for r in got] == [1, 2, 3]
    assert all(r["vec_id"] < 10 for r in got), got
    assert all(
        got[i]["approx_dist"] <= got[i + 1]["approx_dist"] for i in range(len(got) - 1)
    )


def test_pq_fit_shape_and_determinism(spark):
    """Codebook: one entry per (subspace, surviving code), subvector
    width dim/m; two runs produce identical doubles (seeded init +
    rounded means)."""
    from neo4j_graphdb_spark.operators.similarity import pq_fit
    from neo4j_graphdb_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    c1 = pq_fit(emb, dim=64, m=4, k=8, iters=1).collect()
    c2 = pq_fit(emb, dim=64, m=4, k=8, iters=1).collect()
    key = lambda r: (r["sub"], r["code_id"])
    assert sorted(map(key, c1)) == sorted(map(key, c2))
    assert {r["sub"] for r in c1} == {0, 1, 2, 3}
    assert all(len(r["code"]) == 16 for r in c1)
    d1 = {key(r): r["code"] for r in c1}
    d2 = {key(r): r["code"] for r in c2}
    assert d1 == d2


def test_semdedup_known_duplicates(spark):
    """Three exact-duplicate vectors and one orthogonal vector: the
    duplicates land in one cluster, only the min-id survives; the
    orthogonal vector keeps regardless of cluster."""
    from neo4j_graphdb_spark.operators.dedup import semdedup

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r["vec_id"]: r for r in semdedup(df, k=2, iters=1, threshold=0.9).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[3]["keep"] is False
    assert out[4]["keep"] is True
    assert out[2]["cluster"] == out[1]["cluster"] == out[3]["cluster"]
    # determinism: same output on a second run
    again = {r["vec_id"]: tuple(r) for r in semdedup(df, k=2, iters=1, threshold=0.9).collect()}
    assert again == {k2: tuple(v) for k2, v in out.items()}


def test_remove_boilerplate_strips_shared_blocks(spark):
    """remove_boilerplate: a 10-word block shared by 2+ docs is stripped
    from every doc carrying it; unique blocks survive in order; a doc
    with no shared blocks is untouched; min_df=3 keeps a 2-doc block."""
    from neo4j_graphdb_spark.operators.dedup import remove_boilerplate

    header = "h1 h2 h3 h4 h5 h6 h7 h8 h9 h10"
    rows = [
        (1, header + " a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),
        (2, header + " b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"),
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_boilerplate(df, chunk_words=10, min_df=2).collect()
    }
    assert out[1] == ("a1 a2 a3 a4 a5 a6 a7 a8 a9 a10", 1)
    assert out[2] == ("b1 b2 b3 b4 b5 b6 b7 b8 b9 b10", 1)
    assert out[3] == ("c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12", 0)
    # higher df threshold: the 2-doc header is no longer boilerplate
    kept = {
        r["doc_id"]: r["n_removed"]
        for r in remove_boilerplate(df, chunk_words=10, min_df=3).collect()
    }
    assert kept == {1: 0, 2: 0, 3: 0}


def test_remove_boilerplate_keeps_null_text_docs(spark):
    """A NULL-text document must still appear in the output with
    clean_text = '' and n_removed = 0 (per-doc contract): the chunk
    explode would otherwise drop it and a downstream rejoin on doc_id
    would silently lose the document."""
    from neo4j_graphdb_spark.operators.dedup import remove_boilerplate

    header = "h1 h2 h3 h4 h5 h6 h7 h8 h9 h10"
    rows = [
        (1, header + " a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),
        (2, header),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_boilerplate(df, chunk_words=10, min_df=2).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[3] == ("", 0)
    assert out[1] == ("a1 a2 a3 a4 a5 a6 a7 a8 a9 a10", 1)
    assert out[2] == ("", 1)


def test_hamming_near_dup_and_bmp_dhash(spark):
    """hamming_near_dup: pigeonhole-exact for distance <= bands-1 —
    known 64-bit hashes at distances 0/1/3/heavy verify against the
    closed-form answer; bands must divide 64 and cover the distance;
    bmp_dhash packs the 9x8 gradient bits MSB-first."""
    from neo4j_graphdb_spark.operators.dedup import hamming_near_dup
    from neo4j_graphdb_spark.operators.multimodal import (
        bmp_dhash_bits,
        bmp_encode,
    )

    base = 0x0123456789ABCDEF
    rows = [
        (1, base),
        (2, base),                 # distance 0
        (3, base ^ 0x1),           # distance 1
        (4, base ^ 0b10101),       # distance 3
        (5, base ^ ((1 << 50) | (1 << 30) | (1 << 10) | 1)),  # distance 4: out
    ]
    df = spark.createDataFrame(rows, "media_id long, dhash long")
    got = {
        (r["a"], r["b"]): r["distance"]
        for r in hamming_near_dup(df, max_distance=3, bands=4).collect()
    }
    assert got == {
        (1, 2): 0, (1, 3): 1, (2, 3): 1, (1, 4): 3, (2, 4): 3, (3, 4): 2,
        (3, 5): 3,  # bit0 flips cancel in the xor: 4 ^ 1 flip -> 3 apart
    }
    with pytest.raises(ValueError):
        hamming_near_dup(df, max_distance=4, bands=4)  # pigeonhole broken
    with pytest.raises(ValueError):
        hamming_near_dup(df, bands=5)  # 5 does not divide 64

    # dHash bit rule: column-gradient image -> bits follow gray(x) > gray(x+1)
    img = bmp_encode(9, 8, lambda x, y, c: (10 * x) % 256)
    # gray strictly increases with x (10x < 256 everywhere), so every
    # comparison gray(x) > gray(x+1) is False -> hash == 0
    assert bmp_dhash_bits(img) == 0
    img2 = bmp_encode(9, 8, lambda x, y, c: (255 - 10 * x) % 256)
    # strictly decreasing -> all 64 bits set -> signed -1
    assert bmp_dhash_bits(img2) == -1


def test_stream_hamming_gate_batch_equivalence(spark):
    """The perceptual-hash stream gate (band-slice stream-static join +
    bit_count verify) finds exactly the cross-split pairs hamming_near_dup
    finds on the union, with identical distances; multi-band hits
    collapse under distinct; the pigeonhole guard still enforces."""
    from neo4j_graphdb_spark.operators.dedup import (
        hamming_near_dup,
        stream_hamming_near_dup,
    )

    base = 0x0123456789ABCDEF
    rows = [
        (1, base), (2, base ^ 0x1), (3, base ^ 0b111),
        (11, base), (12, base ^ (1 << 40)), (13, ~base),
    ]
    df = spark.createDataFrame(rows, "media_id long, dhash long")
    hist = df.filter("media_id < 10")
    stream = df.filter("media_id >= 10")
    got = {
        (r["stream_id"], r["hist_id"]): r["distance"]
        for r in stream_hamming_near_dup(stream, hist, max_distance=3, bands=4)
        .select("stream_id", "hist_id", "distance")
        .distinct()
        .collect()
    }
    full = hamming_near_dup(df, max_distance=3, bands=4).collect()
    expect = {}
    for r in full:
        a, b = r["a"], r["b"]
        if (a < 10) != (b < 10):
            s, h = (b, a) if a < 10 else (a, b)
            expect[(s, h)] = r["distance"]
    assert got == expect
    assert (11, 1) in got and got[(11, 1)] == 0
    assert (13, 1) not in got  # ~base is 64 bits away
    with pytest.raises(ValueError):
        stream_hamming_near_dup(stream, hist, max_distance=4, bands=4)


def test_remove_duplicated_spans(spark):
    """ExactSubstr-style removal: a 20-token span verbatim in 2 docs is
    cut from both (case-insensitive match), unique text survives in
    order, short and NULL-text docs pass through untouched."""
    from neo4j_graphdb_spark.operators.dedup import remove_duplicated_spans

    shared = " ".join(f"s{i}" for i in range(20))
    rows = [
        (1, shared + " a1 a2 a3"),
        (2, "b1 b2 " + shared.upper()),
        (3, "c1 c2 c3 c4"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicated_spans(df, window=20).collect()
    }
    assert out[1] == ("a1 a2 a3", 23, 20)
    assert out[2] == ("b1 b2", 22, 20)  # uppercased copy still matches
    assert out[3] == ("c1 c2 c3 c4", 4, 0)
    assert out[4] == ("", 1, 0)
    # overlapping flagged spans: a doc with the span twice loses both
    # occurrences, coverage positions dedup via DISTINCT
    df2 = spark.createDataFrame(
        [(1, shared + " mid " + shared), (2, shared)],
        "doc_id long, text string",
    )
    out2 = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_duplicated_spans(df2, window=20).collect()
    }
    assert out2[1] == ("mid", 40)
    assert out2[2] == ("", 20)


def test_quality_dedup_keeps_best_per_cluster(spark):
    """quality_dedup keeps the highest-score doc per near-dup cluster
    (ties toward the smallest id); singletons keep themselves; every
    input row comes back exactly once."""
    from neo4j_graphdb_spark.operators.dedup import quality_dedup

    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (4, 1)], "doc_id long, nt int"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: (r["cluster"], r["quality"], r["is_kept"])
        for r in quality_dedup(
            docs, pairs, "doc_id", F.col("nt").cast("bigint")
        ).collect()
    }
    assert len(out) == 4
    # cluster {1,2,3}: 2 and 3 tie on quality 9 -> smaller id 2 wins
    assert out[1] == (1, 5, False)
    assert out[2] == (1, 9, True)
    assert out[3] == (1, 9, False)
    assert out[4] == (4, 1, True)  # singleton keeps itself


def test_null_payload_hash_is_null_and_excluded(spark):
    """Regression (ADVICE r7, low): a NULL payload must hash to NULL, and
    null hashes must never surface as candidates — previously
    bmp_dhash_bits(None) returned 0, pairing every missing image with
    every other missing/blank image at distance 0."""
    from neo4j_graphdb_spark.operators.dedup import (
        hamming_near_dup,
        stream_hamming_near_dup,
    )
    from neo4j_graphdb_spark.operators.multimodal import bmp_dhash, bmp_dhash_bits

    assert bmp_dhash_bits(None) is None

    media = spark.createDataFrame(
        [(1, "image", None), (2, "image", None)],
        "media_id long, kind string, payload binary",
    )
    hashes = bmp_dhash(media)
    assert [r["dhash"] for r in hashes.collect()] == [None, None]
    assert hamming_near_dup(hashes).count() == 0

    mixed = spark.createDataFrame(
        [(1, None), (2, None), (3, 7)], "media_id long, dhash long"
    )
    assert hamming_near_dup(mixed).count() == 0
    assert (
        stream_hamming_near_dup(
            mixed, spark.createDataFrame([(9, None)], "media_id long, dhash long")
        ).count()
        == 0
    )


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    from neo4j_graphdb_spark.operators.similarity import embedding_covariance

    rng = np.random.RandomState(7)
    x = rng.randn(50, 4).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    out = {
        (r["i"], r["j"]): r["cov"]
        for r in embedding_covariance(df, "embedding", dim=4).collect()
    }
    ref = np.cov(x.astype(np.float64), rowvar=False)
    assert len(out) == 16
    for i in range(4):
        for j in range(4):
            assert abs(out[(i, j)] - round(ref[i, j], 6)) < 2e-6


def test_bitext_margin_matches_reference(spark):
    """Margin mining equals a quadratic numpy reference (same ratio
    margin, same k-NN neighborhoods, ties to smallest id), and the
    margin actually corrects hubs: a vector near EVERYTHING gets its
    raw-cosine win demoted once its neighborhood mean divides it."""
    import numpy as np

    from neo4j_graphdb_spark.operators.similarity import bitext_margin_mine

    rng = np.random.RandomState(7)
    va = rng.randn(12, 8).astype("float32")
    vb = rng.randn(12, 8).astype("float32")
    vb[0] = 0.05 * rng.randn(8) + vb.mean(axis=0)  # a hub-ish centroid
    a_rows = [(i, [float(x) for x in va[i]]) for i in range(12)]
    b_rows = [(100 + i, [float(x) for x in vb[i]]) for i in range(12)]
    a = spark.createDataFrame(a_rows, "vec_id long, embedding array<float>")
    b = spark.createDataFrame(b_rows, "vec_id long, embedding array<float>")
    got = {
        r["a_id"]: (r["b_id"], r["margin"])
        for r in bitext_margin_mine(a, b, k=4).collect()
    }

    def cos(x, y):
        x = x.astype("float64"); y = y.astype("float64")
        return float(np.dot(x, y) / (np.linalg.norm(x) * np.linalg.norm(y)))

    k = 4
    # top-k neighbor index lists: cosine desc, id asc on ties
    fwd = {
        i: sorted(range(12), key=lambda j: (-cos(va[i], vb[j]), j))[:k]
        for i in range(12)
    }
    bwd = {
        j: sorted(range(12), key=lambda i: (-cos(vb[j], va[i]), i))[:k]
        for j in range(12)
    }
    dena = {i: sum(cos(va[i], vb[j]) for j in fwd[i]) / (2 * k) for i in fwd}
    denb = {j: sum(cos(vb[j], va[i]) for i in bwd[j]) / (2 * k) for j in bwd}
    want = {}
    for i in range(12):
        best = min(
            ((-(cos(va[i], vb[j]) / (dena[i] + denb[j])), j) for j in fwd[i])
        )
        want[i] = (100 + best[1], -best[0])
    assert set(got) == set(want)
    for i in got:
        assert got[i][0] == want[i][0], (i, got[i], want[i])
        assert abs(got[i][1] - want[i][1]) < 1e-6, (i, got[i], want[i])


def test_mmr_rerank_greedy_matches_reference(spark):
    """MMR greedy on a hand-built geometry: q = [1,0]; candidates a
    (aligned), b (near-duplicate of a), c (orthogonal-ish). Plain top-2
    would take a then b; MMR with lam=0.5 must take a then c (b is
    penalized by its similarity to the already-selected a)."""
    from neo4j_graphdb_spark.operators.similarity import mmr_rerank

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),        # a — on the x axis
            (2, [0.999, 0.0447]),   # b — near-dup of a, most relevant to q
            (3, [0.0, 1.0]),        # c — orthogonal to a/b, diverse
        ],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 1.0])], "query_id long, embedding array<float>"
    )
    out = {
        r["round"]: (r["vec_id"], r["mmr"])
        for r in mmr_rerank(
            corpus, queries, k=2, pool=3, lam=0.5
        ).collect()
    }
    assert out[1][0] == 2                      # b: most relevant first
    # round 2: a scores 0.5*0.7071 - 0.5*cos(a,b)≈0.999 < 0;
    # c scores 0.5*0.7071 - 0.5*cos(c,b)≈0.0447 > 0 → diversity wins
    assert out[2][0] == 3, out
    assert out[2][1] > 0.3

    # with lam=1.0 MMR degenerates to plain relevance order; a and c tie
    # on cos(q,·)=1/sqrt(2) and the smaller id breaks it
    out = {
        r["round"]: r["vec_id"]
        for r in mmr_rerank(
            corpus, queries, k=2, pool=3, lam=1.0
        ).collect()
    }
    assert out == {1: 2, 2: 1}


def test_levenshtein_near_dup_blocking_is_exact(spark):
    """The banded blocking misses nothing a direct quadratic scan finds
    (band >= max_dist pigeonhole), dedupes multi-bucket pairs, respects
    block_cols, and the distances equal Python's reference DP."""
    from neo4j_graphdb_spark.operators.dedup import levenshtein_near_dup

    rows = [
        (1, "s1", "the quick brown fox"),
        (2, "s1", "the quick brown fix"),    # dist 1 to #1
        (3, "s1", "the quick brown foxes"),  # dist 2 to #1 (prefix 20)
        (4, "s2", "the quick brown fox"),    # other block: no cross pair
        (5, "s1", "completely different"),
        (6, "s1", "xx"),                     # far length: band excludes
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in levenshtein_near_dup(
            df, "text", "doc_id", block_cols=["source"], max_dist=3, prefix=20
        ).collect()
    }

    def lev(a, b):
        import itertools
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {}
    for (i1, s1_, t1), (i2, s2_, t2) in (
        (x, y) for x in rows for y in rows if x[0] < y[0]
    ):
        if s1_ != s2_:
            continue
        d = lev(t1.lower()[:20], t2.lower()[:20])
        if d <= 3 and abs(len(t1[:20]) - len(t2[:20])) <= 3:
            want[(i1, i2)] = d
    assert got == want and (1, 2) in got and got[(1, 2)] == 1
    assert all(a_[0] != 4 and a_[1] != 4 for a_ in got)  # block isolation


def test_cosine_isotropy_histogram(spark):
    """Isotropy histogram: orthonormal basis vectors pair to cosine 0
    (bin 0); identical-direction pairs land in the top bin."""
    import tempfile, os
    import pandas as pd
    from neo4j_graphdb_spark.registry import q_c131_cosine_isotropy

    # 4 orthonormal basis vectors: every (i, (i+97)%4=(i+1)%4) pair is
    # orthogonal -> cosine exactly 0.0, all four pairs in bin 0
    vecs = [[0.0] * 4 for _ in range(4)]
    for i in range(4):
        vecs[i][i] = 1.0
    pdf = pd.DataFrame({"vec_id": range(4), "embedding": vecs})
    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(os.path.join(d, "embeddings.parquet"), index=False)
        out = q_c131_cosine_isotropy(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["bin"] == 0 and r["n_pairs"] == 4
    assert r["min_cos"] == 0.0 and r["max_cos"] == 0.0


def test_levenshtein_segments_blocking_is_exact(spark):
    """PassJoin pigeonhole blocking misses nothing a quadratic scan
    finds — including the front-insert/delete SHIFT case that breaks
    naive fixed-position segment matching — and distances equal the
    reference DP."""
    from neo4j_graphdb_spark.operators.dedup import levenshtein_near_dup_segments

    rows = [
        (1, "the quick brown fox jumps over the lazy dog now"),
        (2, "he quick brown fox jumps over the lazy dog noww"),  # front del
        (3, "the quick brown fox jumps over the lazy dog n"),
        (4, "the quick brwn fox jumps over the lzy dog nowadays"),
        (5, "completely unrelated text about spark and parquet"),
        (6, "the quick brown fox jumps over a lazy dog now"),
        (7, "short"),
        (8, "shirt"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in levenshtein_near_dup_segments(
            df, "text", "doc_id", max_dist=4, prefix=40
        ).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {}
    for x in rows:
        for y in rows:
            if x[0] < y[0]:
                d = lev(x[1].lower()[:40], y[1].lower()[:40])
                if d <= 4:
                    want[(x[0], y[0])] = d
    assert got == want
    assert (1, 2) in got  # the shift pair must survive blocking


def test_levenshtein_max_dist_zero_rejected(spark):
    """max_dist=0 would zero the position-bucket width (division by
    zero inside the plan); both PassJoin operators must reject it
    eagerly with a pointer at the exact-equality alternative
    (ADVICE r12)."""
    import pytest

    from neo4j_graphdb_spark.operators.dedup import (
        levenshtein_join,
        levenshtein_near_dup_segments,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_dist must be >= 1"):
        levenshtein_near_dup_segments(df, "text", "doc_id", max_dist=0)
    with pytest.raises(ValueError, match="max_dist must be >= 1"):
        levenshtein_join(
            df, df, "text", "text", "doc_id", "doc_id", max_dist=0
        )


def test_levenshtein_join_cross_table_exact(spark):
    """Cross-table PassJoin fuzzy join: exactness vs the quadratic scan
    (incl. the front-shift case), asymmetric blocking (only the
    dimension indexes segments)."""
    from neo4j_graphdb_spark.operators.dedup import levenshtein_join

    left = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "he quick brown fox jumps over the lazy dogg"),
            (3, "a completely different string about parquet"),
            (4, "spark sql engine"),
        ],
        "lid long, name string",
    )
    right = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "spark sql enginee"),
            (12, "unrelated canonical value"),
        ],
        "rid long, canon string",
    )
    got = {
        (r["lid"], r["rid"]): r["dist"]
        for r in levenshtein_join(
            left, right, "name", "canon", "lid", "rid", max_dist=4, prefix=40
        ).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {}
    for l in left.collect():
        for r in right.collect():
            d = lev(l["name"].lower()[:40], r["canon"].lower()[:40])
            if d <= 4:
                want[(l["lid"], r["rid"])] = d
    assert got == want and (2, 10) in got
