"""Vector transforms (operators/vectors.py) and corpus rebalancing
(sampling.domain_mix / token_budget)."""

import math

from pyspark.sql import functions as F

from kstream_spark.operators import vectors as V
from kstream_spark.operators.sampling import domain_mix, token_budget


def _vecs(spark):
    return spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-1.0, 1.0])],
        "vec_id long, embedding array<double>")


def test_l2_normalize_known_values(spark):
    out = {r["vec_id"]: r for r in
           V.l2_normalize(_vecs(spark), "embedding").collect()}
    assert out[1]["norm"] == 5.0
    assert out[1]["unit"] == [0.6, 0.8]
    # zero vector: zero norm, zero unit (no NaN)
    assert out[2]["norm"] == 0.0
    assert out[2]["unit"] == [0.0, 0.0]
    assert out[3]["norm"] == round(math.sqrt(2), 6)


def test_quantize_int8_roundtrip_error_bound(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = V.quantize_int8(emb, "embedding")
    deq = q.select(
        "vec_id", "embedding",
        V.dequantize(F.col("qvec"), F.col("scale")).alias("approx"))
    err = deq.select(F.array_max(F.zip_with(
        F.col("embedding").cast("array<double>"), F.col("approx"),
        lambda a, b: F.abs(a - b))).alias("maxerr"))
    worst = err.agg(F.max("maxerr")).first()[0]
    # symmetric int8: per-component error <= scale/2 = max|x|/254 < 0.005
    # for unit-ish embeddings
    assert worst < 0.01
    # codes stay in int8 range
    rng = q.select(F.array_max(F.transform("qvec", F.abs)).alias("m")) \
        .agg(F.max("m")).first()[0]
    assert rng <= 127


def test_quantize_int8_zero_vector(spark):
    out = {r["vec_id"]: r for r in
           V.quantize_int8(_vecs(spark), "embedding").collect()}
    assert out[2]["scale"] == 0.0
    assert out[2]["qvec"] == [0, 0]
    assert out[1]["qvec"] == [95, 127]  # 3/4*127 rounded, 127


def test_domain_mix_rebalances(spark):
    rows = [(i, "big") for i in range(400)] + \
        [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = domain_mix(df, "doc_id", "lang")
    kept = {r["lang"]: r["cnt"] for r in
            out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # small keeps everything, big keeps ~sqrt(100/400)=50%
    assert kept["small"] == 100
    assert 150 <= kept["big"] <= 250
    # deterministic
    again = domain_mix(df, "doc_id", "lang")
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())


def test_token_budget_greedy_fill(spark):
    df = spark.createDataFrame(
        [(i, "en", 40) for i in range(10)] + [(100, "de", 999)],
        "doc_id long, lang string, tokens long")
    out = token_budget(df, "doc_id", "lang", "tokens", budget=100)
    by_lang = {}
    for r in out.collect():
        by_lang.setdefault(r["lang"], []).append(r)
    # en: 40-token docs -> exactly 2 fit within 100
    assert len(by_lang["en"]) == 2
    assert max(r["cum_tokens"] for r in by_lang["en"]) <= 100
    # de: single doc exceeds the budget but the first doc is always kept
    assert len(by_lang["de"]) == 1


def test_weighted_sample_prefers_heavy_weights(spark):
    """Efraimidis-Spirakis weighted sampling: with a 1000:1 weight ratio,
    a 10-of-100 sample should be dominated by the 10 heavy rows; output
    is deterministic (md5-derived u) and excludes non-positive weights."""
    from kstream_spark.operators.sampling import weighted_sample
    rows = [(i, 1000.0 if i < 10 else 1.0) for i in range(100)]
    rows.append((100, 0.0))          # never sampled
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got1 = [r.doc_id for r in weighted_sample(df, "doc_id", "w", 10).collect()]
    got2 = [r.doc_id for r in weighted_sample(df, "doc_id", "w", 10).collect()]
    assert got1 == got2                       # deterministic
    assert 100 not in got1                    # zero weight excluded
    assert sum(1 for i in got1 if i < 10) >= 8, got1


# -- JL random projection ----------------------------------------------------
def test_rp_sign_matrix_deterministic_and_pm1(spark):
    m1 = V.rp_sign_matrix(8, 4)
    m2 = V.rp_sign_matrix(8, 4)
    assert m1 == m2
    assert all(s in (1, -1) for row in m1 for s in row)
    # a different seed gives a different matrix
    assert V.rp_sign_matrix(8, 4, seed="other") != m1


def test_random_projection_one_hot_exact(spark):
    # projecting the d-th basis vector must yield exactly
    # sign[j][d] / sqrt(out_dim) in every output component
    dim, out = 8, 4
    signs = V.rp_sign_matrix(dim, out)
    rows = [(d, [1.0 if i == d else 0.0 for i in range(dim)])
            for d in range(dim)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["rp"] for r in
           V.random_projection(df, "embedding", dim, out).collect()}
    for d in range(dim):
        assert got[d] == [signs[j][d] * 0.5 for j in range(out)]


def test_rp_rerank_equals_exact_when_shortlist_covers_corpus(spark, sf_dir):
    # with shortlist >= |corpus| the re-rank sees every candidate, so the
    # composed path must return EXACTLY the brute-force top-k
    from kstream_spark.builder import StreamBuilder
    from kstream_spark.operators import similarity as S
    emb = StreamBuilder(spark).table(f"{sf_dir}/embeddings.parquet").to_df() \
        .filter(F.col("vec_id") < 60)
    composed = S.rp_rerank_topk(emb, "vec_id", "embedding", query_ids=[0, 1],
                                k=5, shortlist=100).toPandas()
    exact = S.cosine_topk(emb, "vec_id", "embedding", query_ids=[0, 1],
                          k=5).toPandas()
    lhs = sorted(map(tuple, composed[["query_id", "neighbor_id", "rank"]]
                     .itertuples(index=False, name=None)))
    rhs = sorted(map(tuple, exact[["query_id", "neighbor_id", "rank"]]
                     .itertuples(index=False, name=None)))
    assert lhs == rhs


def test_rp_rerank_no_sort_merge_join(spark, sf_dir):
    from kstream_spark.builder import StreamBuilder
    from kstream_spark.operators import similarity as S
    from kstream_spark.plans import inspect as P
    emb = StreamBuilder(spark).table(f"{sf_dir}/embeddings.parquet").to_df()
    df = S.rp_rerank_topk(emb, "vec_id", "embedding", query_ids=[0, 1],
                          k=5, shortlist=20)
    # both the shortlist pass and the exact re-rank broadcast the small
    # side; the corpus is never the build side of a shuffle join
    P.assert_no_sort_merge_join(df)
