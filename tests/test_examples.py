"""End-to-end topology tests mirroring the reference's example apps.

example_1 (banking): transaction stream -> branch by event type (first-match)
-> timestamp filter -> inner lookup join to account_detail -> inner lookup
join to customer_profile -> project message -> sink.
Ref: examples/example_1/stream/account_credited.go:44-63, events/*.go
(fixture F2 in FIXTURES.md).

example_2 (abc): one common topic carrying three event types -> branch 3
ways -> A joins B on key -> AB joins C on key.
Ref: examples/example_2/stream/a.go:17-104, events/{a,b,c,ab,abc}.go
(fixture F3).
"""

import pyspark.sql.functions as F
import pytest

from kstream_spark import StreamBuilder
from kstream_spark.operators.joins import DLQ


def test_example_1_banking_pipeline(spark):
    b = StreamBuilder(spark)
    tx = b.from_df(spark.createDataFrame(
        [("t1", "account_credited", 1000, 101, 25.0),
         ("t2", "account_debited", 1001, 102, 10.0),
         ("t3", "account_credited", 900, 101, 5.0),     # too old -> filtered
         ("t4", "account_credited", 1002, 999, 7.0)],   # unknown account -> DLQ
        "id string, type string, ts long, account_no long, amount double"),
        name="transaction")
    account_detail = b.global_table(spark.createDataFrame(
        [(101, "saving", "c-1"), (102, "current", "c-2")],
        "account_no long, account_type string, customer_id string"),
        key="account_no", name="account_detail", sync=False)
    customer_profile = b.global_table(spark.createDataFrame(
        [("c-1", "Ann", "ann@x.io"), ("c-2", "Bob", "bob@x.io")],
        "customer_id string, customer_name string, email string"),
        key="customer_id", name="customer_profile", sync=False)

    branches = tx.branch([
        ("credited", F.col("type") == "account_credited"),
        ("debited", F.col("type") == "account_debited"),
    ])
    dlq = DLQ()
    # ref filters on timestamp recency (account_credited.go:65-73)
    message = (branches["credited"]
               .filter(F.col("ts") >= 950)
               .join_global_table(account_detail, on="account_no", dlq=dlq)
               .join_global_table(customer_profile, on="customer_id", dlq=dlq)
               .select("id", "customer_name", "email",
                       F.concat(F.lit("credited "), F.col("amount"))
                       .alias("text")))
    rows = message.to_df().collect()
    assert [(r.id, r.customer_name) for r in rows] == [("t1", "Ann")]
    # inner-join miss went to the DLQ, not silently dropped
    assert [r.id for r in dlq.df().collect()] == ["t4"]


def test_example_2_three_way_stream_join(spark):
    b = StreamBuilder(spark)
    # one common topic, discriminated union (abcCommonStream.go:9-27)
    abc = b.from_df(spark.createDataFrame(
        [("k1", "AA", "a-one", 10), ("k1", "BB", "b-one", 11),
         ("k1", "CC", "c-one", 12),
         ("k2", "AA", "a-two", 20), ("k2", "BB", "b-two", 21),
         ("k3", "CC", "c-three", 30)],
        "key string, type string, payload string, ts long"), name="abc")
    br = abc.branch([
        ("a", F.col("type") == "AA"),
        ("b", F.col("type") == "BB"),
        ("c", F.col("type") == "CC"),
    ])
    ab = br["a"].join_stream(
        br["b"], on="key",
        select=[F.col("l.key").alias("key"),
                F.col("l.payload").alias("aaa"),
                F.col("r.payload").alias("bbb"),
                F.col("l.ts").alias("timestamp_a"),
                F.col("r.ts").alias("timestamp_b")])
    abc_joined = ab.join_stream(
        br["c"], on="key",
        select=[F.col("l.key").alias("key"), F.col("l.aaa").alias("aaa"),
                F.col("l.bbb").alias("bbb"),
                F.col("r.payload").alias("ccc")])
    rows = abc_joined.to_df().collect()
    # only k1 has all three arms
    assert [(r.key, r.aaa, r.bbb, r.ccc) for r in rows] == \
        [("k1", "a-one", "b-one", "c-one")]
    # AB sees k1 and k2 (both have A and B)
    assert {r.key for r in ab.to_df().collect()} == {"k1", "k2"}


def test_example_3_corpus_pipeline(capsys):
    import examples.corpus_pipeline as ex3
    ex3.main()
    out = capsys.readouterr().out
    assert "corpus funnel" in out
    assert "near_dedup" in out


def test_example_4_corpus_admission(capsys):
    import examples.corpus_admission as ex4
    admitted = ex4.main()
    assert admitted == [1, 2, 5]
    out = capsys.readouterr().out
    assert "admitted: [1, 2, 5]" in out


def test_example_5_vector_search(capsys):
    import examples.vector_search as ex5
    recall = ex5.main()
    out = capsys.readouterr().out
    assert "recall@5 vs brute force" in out
    assert recall >= 0.4  # 3 of 8 cells probed on near-random vectors


def test_example_6_data_selection(capsys):
    import examples.data_selection as ex6
    radii = ex6.main()
    out = capsys.readouterr().out
    assert "coverage radii:" in out
    assert len(radii) == 5
    assert all(a >= b for a, b in zip(radii, radii[1:]))  # non-increasing


def test_example_7_tokenizers(capsys):
    import examples.tokenizers as ex7
    bpe_fert, uni_fert = ex7.main()
    out = capsys.readouterr().out
    assert "BPE: the 6 learned merges" in out
    assert "Unigram: final vocabulary" in out
    # subword tokenizers emit more tokens than words but fewer than chars
    assert 1.0 < bpe_fert < 8.0
    assert 1.0 < uni_fert < 8.0


def test_example_8_ingest_pipeline(capsys):
    import examples.ingest_pipeline as ex8
    admitted, n_tokens = ex8.main()
    out = capsys.readouterr().out
    assert admitted == [1, 2, 4]     # exact re-ingest (3) rejected
    assert n_tokens > 0
    assert "per-batch drift PSI" in out


def test_example_9_ann_retrain(capsys):
    import examples.ann_retrain as ex9
    before, after = ex9.main()
    out = capsys.readouterr().out
    assert "retrain=" in out
    if after is not None:            # trigger fired: recovery is printed
        assert "recall@5 after retrain" in out
        assert after >= before       # full-corpus books never score worse


def test_example_10_dedup_strategies(capsys):
    import examples.dedup_strategies as ex10
    results = ex10.main()
    out = capsys.readouterr().out
    assert "duplicate pairs found per strategy" in out
    assert results["jaccard"] == results["prefix_jaccard"]
    # winnowing sees verbatim runs Jaccard's whole-set view misses
    assert results["winnowing"] >= results["jaccard"]


def test_example_11_corpus_filters(capsys):
    import examples.corpus_filters as ex11
    results = ex11.main()
    out = capsys.readouterr().out
    assert "gopher rejection ledger" in out and "funnel" in out
    # each stage can only shrink the corpus, and none may empty it
    assert (results["input"] >= results["gopher"] >= results["c4"]
            >= results["entropy"] > 0)
