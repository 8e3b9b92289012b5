"""Runnable tokenizer-family comparison — the THREE subword algorithms a
training-data pipeline chooses between, all trained on the same corpus
(capability superset; the reference carries opaque bytes and leaves text
processing to user callbacks):

  1. BPE (Sennrich 2016)        — grow from characters by merging the
                                  most frequent adjacent pair; inference
                                  replays the merges in order.
  2. WordPiece (Schuster 2012)  — same growth loop but merges are scored
                                  by likelihood gain ln P(ab) - ln P(a)
                                  - ln P(b), not raw frequency.
  3. Unigram LM (Kudo 2018)     — start from a substring SUPERSET vocab
                                  and prune with (hard) EM; inference is
                                  a Viterbi segmentation per word.

Every step is exact-integer / deterministically tie-broken, which is what
lets each stage carry a DuckDB oracle in the registered inventory
(text_bpe_*, text_wordpiece_pairs, text_unigram_*).

Run:  python examples/tokenizers.py
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kstream_spark import StreamBuilder, get_spark  # noqa: E402
from kstream_spark.operators import text as T  # noqa: E402

SF = "/root/testdata/sf0.001"


def main():
    spark = get_spark("tokenizers")
    docs = StreamBuilder(spark).table(f"{SF}/documents.parquet").to_df()

    # 1. BPE: train 6 merges, tokenize, top tokens
    merges_df = T.bpe_train(docs, "text", n_merges=6)
    print("== BPE: the 6 learned merges (rank, pair -> merged, cnt) ==")
    merges_df.orderBy("merge_rank").show(truncate=False)
    merges = [r["pair"] for r in merges_df.orderBy("merge_rank").collect()]
    bpe_top = (T.bpe_tokenize(docs, "text", merges)
               .select(F.explode("tokens").alias("token"))
               .groupBy("token").count()
               .orderBy(F.desc("count"), "token"))
    print("== BPE: top-10 corpus tokens ==")
    bpe_top.show(10, truncate=False)

    # 2. WordPiece: the likelihood-scored merge candidates (one round)
    print("== WordPiece: top-10 merge pairs by likelihood gain ==")
    T.wordpiece_pair_scores(docs, "text", top_k=10).show(truncate=False)

    # 3. Unigram LM: seed vocab -> hard-EM train/prune -> Viterbi tokenize
    vocab_df = T.unigram_train(docs, "text", seed_v=40, keep_v=25,
                               iters=2, max_piece_len=3, max_word_len=12)
    print("== Unigram: final vocabulary (piece, usage cnt, logp_micro) ==")
    vocab_df.orderBy(F.desc("cnt"), "piece").show(10, truncate=False)
    vocab = [(r["piece"], int(r["logp_micro"])) for r in vocab_df.collect()]
    uni_top = T.unigram_tokenize(docs, "text", vocab, max_piece_len=3,
                                 max_word_len=12)
    print("== Unigram: top-10 corpus tokens ==")
    uni_top.orderBy(F.desc("cnt"), "token").show(10, truncate=False)

    # side-by-side fertility (tokens per word) — the number a pipeline
    # actually budgets by
    all_words = docs.select(F.explode(
        F.filter(F.split(F.lower("text"), r"\s+"),
                 lambda w: w != F.lit(""))).alias("w"))
    n_words = all_words.count()
    # the unigram arm tokenized only words <= 12 chars, so its fertility
    # denominator must count the same population
    n_words_le12 = all_words.filter(F.length("w") <= 12).count()
    bpe_tokens = bpe_top.agg(F.sum("count")).first()[0]
    uni_tokens = uni_top.agg(F.sum("cnt")).first()[0]
    print(f"corpus words: {n_words} ({n_words_le12} of <= 12 chars)")
    print(f"BPE fertility:     {bpe_tokens / n_words:.3f} tokens/word")
    print(f"Unigram fertility: {uni_tokens / n_words_le12:.3f} tokens/word "
          f"(over words <= 12 chars)")
    return bpe_tokens / n_words, uni_tokens / n_words_le12


if __name__ == "__main__":
    main()
