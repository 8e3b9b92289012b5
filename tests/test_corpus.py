"""Corpus-assembly operators: repetition signals, decontamination, shard
shuffle, sequence packing, composition stats (operators/corpus.py)."""

from pyspark.sql import functions as F

from kstream_spark.operators import corpus as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_known_values(spark):
    df = _docs(spark, [(1, "a a a b"), (2, "x y z w")])
    out = {r["doc_id"]: r for r in
           C.repetition_stats(df, "doc_id", "text").collect()}
    r1 = out[1]
    assert r1["n_words"] == 4
    assert r1["top_word_frac"] == 0.75
    # 2-grams: [a a, a a, a b] -> 2 distinct of 3
    assert r1["dup_2gram_frac"] == round(1 - 2 / 3, 6)
    # 3-grams: [a a a, a a b] -> all distinct
    assert r1["dup_3gram_frac"] == 0.0
    r2 = out[2]
    assert r2["top_word_frac"] == 0.25
    assert r2["dup_2gram_frac"] == 0.0


def test_repetition_stats_short_doc_no_grams(spark):
    df = _docs(spark, [(1, "solo")])
    r = C.repetition_stats(df, "doc_id", "text").collect()[0]
    assert (r["n_words"], r["dup_2gram_frac"], r["dup_3gram_frac"]) == (1, 0.0, 0.0)


def test_decontaminate_flags_shared_shingles(spark):
    ev = _docs(spark, [(100, "the quick brown fox jumps")])
    train = _docs(spark, [
        (1, "lazy dogs avoid the quick brown fox entirely"),  # shares 2 shingles
        (2, "completely unrelated words only here"),
    ])
    out = C.decontaminate(train, "doc_id", "text", ev, "doc_id", "text", n=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1}
    assert rows[1]["n_shared"] == 2  # "the quick brown", "quick brown fox"
    assert rows[1]["n_eval_docs"] == 1


def test_pack_chunks_spans_are_contiguous(spark):
    df = _docs(spark, [(1, "a b c"), (2, "d e f g"), (3, "h i")])
    out = C.pack_chunks(df, "doc_id", "text", capacity=5, n_shards=1)
    rows = sorted(out.collect(), key=lambda r: r["doc_id"])
    # cum = 3, 7, 9 -> spans [0,0], [0,1], [1,1]
    assert [(r["chunk_first"], r["chunk_last"]) for r in rows] == \
        [(0, 0), (0, 1), (1, 1)]
    assert all(r["shard"] == 0 for r in rows)


def test_pack_chunks_no_gaps_per_shard(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = C.pack_chunks(docs, "doc_id", "text", capacity=256, n_shards=4)
    # every chunk id in [0, max] is touched by some document (end-to-end layout)
    per_shard = (out.groupBy("shard")
                 .agg(F.max("chunk_last").alias("mx"),
                      F.count_distinct("chunk_first").alias("starts"))
                 .collect())
    for r in per_shard:
        assert r["starts"] >= 1
    spans = out.select("shard", "chunk_first", "chunk_last").collect()
    covered = {}
    for r in spans:
        for c in range(r["chunk_first"], r["chunk_last"] + 1):
            covered.setdefault(r["shard"], set()).add(c)
    for r in per_shard:
        assert covered[r["shard"]] == set(range(r["mx"] + 1))


def test_shuffle_shards_deterministic_and_dense(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = C.shuffle_shards(docs, "doc_id", n_shards=4, seed="s1") \
        .select("doc_id", "shard", "pos")
    b = C.shuffle_shards(docs, "doc_id", n_shards=4, seed="s1") \
        .select("doc_id", "shard", "pos")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # positions are 1..n dense per shard
    dense = (a.groupBy("shard")
             .agg(F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"),
                  F.min("pos").alias("mn")).collect())
    for r in dense:
        assert (r["mn"], r["mx"]) == (1, r["n"])
    # a different seed permutes
    c = C.shuffle_shards(docs, "doc_id", n_shards=4, seed="s2") \
        .select("doc_id", "shard", "pos")
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))


def test_corpus_stats_bucket_is_bit_length(spark):
    df = spark.createDataFrame(
        [(1, "one two", "en", 7), (2, "three", "en", 8)],
        "doc_id long, text string, lang string, n_chars long")
    rows = sorted(C.corpus_stats(df, "text", "lang", "n_chars").collect(),
                  key=lambda r: r["len_bucket"])
    # 7 = 0b111 -> bucket 2; 8 = 0b1000 -> bucket 3
    assert [(r["len_bucket"], r["n_docs"], r["total_tokens"], r["total_chars"])
            for r in rows] == [(2, 1, 2, 7), (3, 1, 1, 8)]


def test_span_dedup_removes_shared_boilerplate(spark):
    # span=4: docs 1 and 2 share their first 4-token segment (boilerplate);
    # each keeps a distinct tail segment.  doc 3 is all-boilerplate (equal
    # to doc 1's first segment) and must vanish entirely.
    df = _docs(spark, [
        (1, "copy right all reserved alpha beta gamma delta"),
        (2, "copy right all reserved one two three four"),
        (3, "copy right all reserved"),
    ])
    out = {r["doc_id"]: r for r in
           C.span_dedup(df, "doc_id", "text", span=4, max_docs=1).collect()}
    assert set(out) == {1, 2}
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[2]["clean_text"] == "one two three four"
    assert out[1]["n_spans_kept"] == 1 and out[1]["n_spans_dropped"] == 1


def test_span_dedup_orders_and_counts(spark):
    # 9 tokens at span=4 -> 3 segments (last one short); nothing shared, so
    # everything survives and the text round-trips in order.
    df = _docs(spark, [(1, "a b c d e f g h i")])
    r = C.span_dedup(df, "doc_id", "text", span=4, max_docs=1).collect()[0]
    assert r["clean_text"] == "a b c d e f g h i"
    assert r["n_spans_kept"] == 3 and r["n_spans_dropped"] == 0


def test_unigram_logprob_known_values(spark):
    import math
    # corpus: 4 tokens total -- "a" x2, "b" x1, "c" x1; scores are exact
    # integer micro-log-prob sums scaled back by 1e6
    df = _docs(spark, [(1, "a a b"), (2, "c")])
    out = {r["doc_id"]: r for r in
           C.unigram_logprob(df, "doc_id", "text").collect()}
    mi_a = round(math.log(2 / 4) * 1e6)
    mi_b = round(math.log(1 / 4) * 1e6)
    assert out[1]["n_tokens"] == 3
    assert out[1]["sum_logp"] == (2 * mi_a + mi_b) / 1e6
    assert out[2]["sum_logp"] == mi_b / 1e6
    # per-token: the common-token doc is less surprising than the rare one
    assert out[1]["sum_logp"] / 3 > out[2]["sum_logp"] / 1


def test_unigram_logprob_oov_floor(spark):
    import math
    # min_count=2 folds the two hapaxes into the OOV floor ln(2/4)
    df = _docs(spark, [(1, "a a b"), (2, "c")])
    out = {r["doc_id"]: r for r in
           C.unigram_logprob(df, "doc_id", "text", min_count=2).collect()}
    assert out[2]["sum_logp"] == round(math.log(2 / 4) * 1e6) / 1e6


def test_html_to_text_extraction(spark):
    from kstream_spark.functions.text import html_to_text
    rows = [
        (1, "<html><head><style>p{color:red}</style></head>"
            "<body><h1>Title</h1><p>Hello <b>world</b>!</p>"
            "<script>var x = '<p>not text</p>';</script>"
            "<!-- a comment --></body></html>"),
        (2, "plain text, no markup"),
        (3, "a &lt;tag&gt; literal &amp; an &amp;lt; stays encoded-once"),
        (4, "<SCRIPT TYPE='text/js'>upper();</SCRIPT>visible<BR/>text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["clean"] for r in
           df.select("doc_id", html_to_text(F.col("text")).alias("clean"))
           .collect()}
    assert out[1] == "Title Hello world !"
    assert out[2] == "plain text, no markup"
    assert out[3] == "a <tag> literal & an &lt; stays encoded-once"
    assert out[4] == "visible text"


def test_corpus_diff_classifies_all_states(spark):
    old = _docs(spark, [(1, "a"), (2, "b"), (3, "c")])
    new = _docs(spark, [(2, "b"), (3, "c changed"), (4, "d")])
    out = {r["doc_id"]: r["status"] for r in
           C.corpus_diff(old, new, "doc_id", "text").collect()}
    assert out == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_shard_manifest_checksum_is_order_insensitive_and_sensitive(spark):
    base = [(1, "a b", 0), (2, "c d e", 0), (3, "f", 1)]
    df = spark.createDataFrame(base, "doc_id long, text string, shard int")
    m1 = {r["shard"]: r for r in
          C.shard_manifest(df, "doc_id", "text").collect()}
    assert m1[0]["n_docs"] == 2 and m1[0]["total_tokens"] == 5
    assert m1[1]["min_id"] == 3 and m1[1]["max_id"] == 3
    # reordering rows leaves the checksum fixed
    df2 = spark.createDataFrame(list(reversed(base)),
                                "doc_id long, text string, shard int")
    m2 = {r["shard"]: r for r in
          C.shard_manifest(df2, "doc_id", "text").collect()}
    assert m2[0]["content_checksum"] == m1[0]["content_checksum"]
    # changing one doc's content changes its shard's checksum only
    df3 = spark.createDataFrame([(1, "a b CHANGED", 0)] + base[1:],
                                "doc_id long, text string, shard int")
    m3 = {r["shard"]: r for r in
          C.shard_manifest(df3, "doc_id", "text").collect()}
    assert m3[0]["content_checksum"] != m1[0]["content_checksum"]
    assert m3[1]["content_checksum"] == m1[1]["content_checksum"]
    # even-multiplicity sensitivity (why the checksum is a SUM, not XOR):
    # two copies of content "a" vs two copies of content "b" must differ —
    # an XOR checksum cancels both to the same value
    da = spark.createDataFrame([(1, "a", 0), (2, "a", 0)],
                               "doc_id long, text string, shard int")
    db = spark.createDataFrame([(1, "b", 0), (2, "b", 0)],
                               "doc_id long, text string, shard int")
    ca = C.shard_manifest(da, "doc_id", "text").collect()[0]["content_checksum"]
    cb = C.shard_manifest(db, "doc_id", "text").collect()[0]["content_checksum"]
    assert ca != cb


def test_vocab_and_bpe_pair_counts(spark):
    from kstream_spark.operators.text import bpe_pair_counts, vocab_top_terms
    df = spark.createDataFrame(
        [(1, "ab ab cd"), (2, "ab x")], "doc_id long, text string")
    vocab = vocab_top_terms(df, "text", top_v=10).collect()
    assert [(r.token, r.cnt) for r in vocab] == \
        [("ab", 3), ("cd", 1), ("x", 1)]          # count desc, token asc
    # BPE: distinct words {ab: 3, cd: 1}; 'x' (len 1) contributes nothing
    pairs = bpe_pair_counts(df, "text", top_k=10).collect()
    assert [(r.pair, r.cnt) for r in pairs] == [("ab", 3), ("cd", 1)]
    # multi-char words explode every adjacent pair, weighted by word freq
    df2 = spark.createDataFrame([(1, "abc abc abd")],
                                "doc_id long, text string")
    got = {(r.pair, r.cnt) for r in bpe_pair_counts(df2, "text").collect()}
    assert got == {("ab", 3), ("bc", 2), ("bd", 1)}


def test_lang_id_ngram_profiles_and_prediction(spark):
    """Char-trigram LID: profiles trained per labeled language separate
    held-out text with the same trigram distribution; sub-trigram text
    falls back to 'und'."""
    from kstream_spark.operators.text import (lang_id_ngram,
                                              lang_ngram_profiles)
    train = spark.createDataFrame(
        [(1, "aa", "aaaa aaab aaac aaad"),
         (2, "aa", "aaae aaaf aaag"),
         (3, "zz", "zzzz zzzy zzzx zzzw"),
         (4, "zz", "zzzv zzzu zzzt")],
        "doc_id long, lang string, text string")
    prof = lang_ngram_profiles(train, "lang", "text", n=3, top_m=10)
    assert prof.count() <= 20 and set(
        r.lang for r in prof.collect()) == {"aa", "zz"}
    test = spark.createDataFrame(
        [(10, "aaaz aaay"), (11, "zzza zzzb"), (12, "x")],
        "doc_id long, text string")
    got = {r.doc_id: r.pred_lang
           for r in lang_id_ngram(test, "doc_id", "text", prof).collect()}
    assert got == {10: "aa", 11: "zz", 12: "und"}, got


def test_bpe_tokenize_applies_merges_in_order(spark):
    """Inference with learned merges: chained replaces collapse a fully
    merged word to one token; length-1 words (excluded from training)
    still tokenize as themselves."""
    from kstream_spark.operators.text import bpe_tokenize, bpe_train
    df = spark.createDataFrame(
        [(1, "aaab aaab ab xy z qr")], "doc_id long, text string")
    merges = [r.pair for r in bpe_train(df, "text", n_merges=8)
              .orderBy("merge_rank").collect()]
    out = bpe_tokenize(df, "text", merges).collect()[0]["tokens"]
    assert out == ["aaab", "aaab", "ab", "xy", "z", "qr"], out


def test_bpe_merge_is_greedy_nonoverlapping_on_runs(spark):
    """Sennrich-exact merge on repeated-pair runs: in 'aaaa' the pair
    (a, a) merges at positions (1,2) AND (3,4) in the same round — a
    naive replace(' a a ', ' aa ') consumes the shared delimiter space
    and under-merges to ['aa', 'a', 'a'].  The delimiter-doubling
    triple-replace must produce ['aa', 'aa'] (train and tokenize)."""
    from kstream_spark.operators.text import bpe_tokenize, bpe_train
    df = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    out = [(r.merge_rank, r.pair, r.merged, r.cnt)
           for r in bpe_train(df, "text", n_merges=2).collect()]
    # r1: 'a a' counted at every adjacent position (3, overlapping — the
    # Sennrich get_stats convention) but applied non-overlapping (2
    # merges) -> ' aa aa '; r2: 'aa aa' once -> 'aaaa'
    assert out == [(1, "a a", "aa", 3), (2, "aa aa", "aaaa", 1)]
    toks = bpe_tokenize(df, "text", ["a a"]).collect()[0]["tokens"]
    assert toks == ["aa", "aa"], toks
    # odd run: greedy leftmost leaves the trailing singleton
    df5 = spark.createDataFrame([(1, "aaaaa")], "doc_id long, text string")
    toks5 = bpe_tokenize(df5, "text", ["a a"]).collect()[0]["tokens"]
    assert toks5 == ["aa", "aa", "a"], toks5


def test_bpe_train_iterates_merge_recount(spark):
    """The full BPE loop: after a merge wins, later rounds count pairs of
    MERGED symbols — the recount a single-round statistic can't see."""
    from kstream_spark.operators.text import bpe_train
    df = spark.createDataFrame(
        [(1, "aaab aaab ab xy")], "doc_id long, text string")
    # vocab: aaab:2, ab:1, xy:1
    # r1: 'a a':4 (two per aaab, leftmost non-overlap), 'a b':3, 'x y':1
    #     -> merge 'a a' => aaab becomes " aa a b "; 'a a' across the
    #     merged boundary must NOT double-count (non-overlapping scan)
    # r2: 'aa a':2, 'a b':3, 'x y':1 -> merge 'a b' => "aa ab", "ab"
    # r3: 'aa ab':2, 'x y':1 -> merge 'aa ab'
    # r4: 'x y':1 -> merge; r5: nothing left -> loop stops early
    out = [(r.merge_rank, r.pair, r.merged, r.cnt)
           for r in bpe_train(df, "text", n_merges=8).collect()]
    assert out == [(1, "a a", "aa", 4), (2, "a b", "ab", 3),
                   (3, "aa ab", "aaab", 2), (4, "x y", "xy", 1)]
    from kstream_spark.operators.sampling import group_split, train_val_split
    rows = [(i, f"src{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = group_split(df, "source", val_pct=30).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.source, set()).add(r.split)
    # every group lands wholly on one side — the leakage-safety property
    assert all(len(s) == 1 for s in by_group.values())
    assert {s for v in by_group.values() for s in v} == {"train", "val"}
    # determinism across partitionings
    out2 = {(r.doc_id, r.split)
            for r in group_split(df.repartition(13), "source",
                                 val_pct=30).collect()}
    assert out2 == {(r.doc_id, r.split) for r in out}


def test_wordpiece_scores_prefer_faithful_rare_pairs(spark):
    from kstream_spark.operators.text import wordpiece_pair_scores
    # 'xq' appears whenever x or q appear (faithful pair of rare chars);
    # 'ab' is frequent but a and b are everywhere independently
    rows = [(0, "abab abba baba xq"), (1, "aabb abab baab xq"),
            (2, "abba baba abab xq")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = wordpiece_pair_scores(df, "text", top_k=10).toPandas()
    sc = out.set_index("pair")["score_micro"]
    assert sc["xq"] > sc["ab"]
    assert out["rank"].tolist() == sorted(out["rank"].tolist())


def test_bpe_tokenize_single_pass_doubling_matches_per_round(spark):
    """The hoisted one-double-for-the-whole-chain form is bit-identical to
    the per-round double/merge/undouble form on adversarial inputs
    (consecutive repeats, chained merges that touch prior merges)."""
    from kstream_spark.functions.text import words as _words
    from kstream_spark.operators.text import bpe_tokenize

    merges = ["a a", "aa aa", "aa b", "b c"]
    rows = [(0, "aaaa aaaaa aab abc"), (1, "aaaaaaaa bc b"),
            (2, "ababab aabaab caa")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def seq_old(wcol):
        s = F.concat(F.lit(" "), F.regexp_replace(wcol, "(.)", "$1 "))
        for pair in merges:
            s = F.replace(s, F.lit(" "), F.lit("  "))
            s = F.replace(s, F.lit(" " + pair.replace(" ", "  ") + " "),
                          F.lit(" " + pair.replace(" ", "") + " "))
            s = F.replace(s, F.lit("  "), F.lit(" "))
        return s

    old = df.withColumn("tokens", F.filter(
        F.flatten(F.transform(_words(F.col("text")),
                              lambda w: F.split(F.trim(seq_old(w)), " "))),
        lambda t: t != F.lit(""))).select("doc_id", "tokens").toPandas()
    new = (bpe_tokenize(df, "text", merges)
           .select("doc_id", "tokens").toPandas())
    assert old.sort_values("doc_id")["tokens"].map(list).tolist() == \
        new.sort_values("doc_id")["tokens"].map(list).tolist()


def test_kmv_overlap_detects_shared_shingles(spark):
    from kstream_spark.operators.sketches import kmv_source_overlap
    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(0, shared + " alpha", "a"), (1, shared + " beta", "b"),
            (2, "totally disjoint content about catalyst plans", "c"),
            (3, shared + " gamma", "a")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = (kmv_source_overlap(docs, "doc_id", "text", "source", k=64)
           .toPandas().set_index(["src_a", "src_b"]))
    # a and b share most shingles; c shares none with either
    assert out.loc[("a", "b"), "jaccard_micro"] > 500_000
    assert out.loc[("a", "c"), "jaccard_micro"] == 0
    assert out.loc[("b", "c"), "jaccard_micro"] == 0
    # exact-integer estimate: n_both/k_used scaled by 1e6
    r = out.loc[("a", "b")]
    assert r.jaccard_micro == round(r.n_both * 1e6 / r.k_used)


def test_lexical_diversity_known_values(spark):
    from kstream_spark.operators.text import lexical_diversity
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "x y z"), (3, "w w w w"), (4, "   ")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           lexical_diversity(df, "doc_id", "text").collect()}
    # doc 1: 3 tokens, 2 types, 1 hapax; ttr = round(2/3 * 1e6)
    assert (out[1]["n_tokens"], out[1]["n_types"], out[1]["n_hapax"]) \
        == (3, 2, 1)
    assert out[1]["ttr_micro"] == 666667
    assert out[1]["hapax_micro"] == 333333
    # doc 2: all distinct, all hapax
    assert out[2]["ttr_micro"] == 1000000
    assert out[2]["hapax_micro"] == 1000000
    # doc 3: one type, no hapax
    assert out[3]["ttr_micro"] == 250000
    assert out[3]["n_hapax"] == 0
    # doc 4: whitespace-only text has no tokens -> no row
    assert 4 not in out


def test_unigram_seed_vocab_counts(spark):
    from kstream_spark.operators.text import unigram_seed_vocab
    df = spark.createDataFrame([(1, "ab ab b")], "doc_id long, text string")
    out = {r["piece"]: r for r in
           unigram_seed_vocab(df, "text", max_piece_len=2,
                              top_v=10).collect()}
    # substrings of 'ab' (x2): a, b, ab; of 'b': b
    assert out["a"]["cnt"] == 2
    assert out["b"]["cnt"] == 3
    assert out["ab"]["cnt"] == 2
    # probabilities are over the KEPT vocab total (7)
    import math
    assert out["b"]["logp_micro"] == round(math.log(3 / 7) * 1e6)


def test_unigram_viterbi_dp_known_values(spark):
    from kstream_spark.operators.text import _viterbi_best, _viterbi_pieces
    lp = {"a": -100, "b": -200, "ab": -250, "abab": -450}
    # 'abab': best is the whole-word piece (-450 beats ab+ab=-500, beats
    # chars=-600); ties prefer fewer pieces
    assert _viterbi_best("abab", lp, 4, -10**7) == (-450, 1)
    assert _viterbi_pieces("abab", lp, 4, -10**7) == ["abab"]
    # 'aba': ab+a = -350 beats a+b+a=-400; backtrack returns the pieces
    assert _viterbi_best("aba", lp, 4, -10**7) == (-350, 2)
    assert _viterbi_pieces("aba", lp, 4, -10**7) == ["ab", "a"]
    # OOV char segments at the floor
    s, n = _viterbi_best("ax", lp, 4, -999)
    assert (s, n) == (-100 - 999, 2)
    # equal-score tie prefers FEWER pieces: ab (-300) vs a+b (-300)
    lp2 = {"a": -100, "b": -200, "ab": -300}
    assert _viterbi_best("ab", lp2, 2, -10**7) == (-300, 1)
    assert _viterbi_pieces("ab", lp2, 2, -10**7) == ["ab"]


def test_unigram_train_prunes_and_keeps_single_chars(spark):
    from kstream_spark.operators.text import unigram_train
    df = spark.createDataFrame(
        [(1, "hello hello hello world world zzz")],
        "doc_id long, text string")
    out = unigram_train(df, "text", seed_v=15, keep_v=5, iters=2,
                        max_piece_len=3).toPandas()
    vocab = set(out["piece"])
    # every single char used by a best segmentation survives pruning
    assert all(len(p) <= 3 for p in vocab)
    # deterministic: a second run returns the identical table
    out2 = unigram_train(df, "text", seed_v=15, keep_v=5, iters=2,
                         max_piece_len=3).toPandas()
    assert sorted(map(tuple, out.itertuples(index=False, name=None))) == \
        sorted(map(tuple, out2.itertuples(index=False, name=None)))
    # usage counts are word-frequency weighted: pieces covering 'hello'
    # (freq 3) outweigh pieces covering 'zzz' (freq 1)
    top = out.sort_values(["cnt", "piece"],
                          ascending=[False, True]).iloc[0]
    assert top["cnt"] >= 3


def test_unigram_tokenize_counts_match_manual_segmentation(spark):
    from kstream_spark.operators.text import unigram_tokenize
    df = spark.createDataFrame([(1, "abab ab ab")], "doc_id long, text string")
    pieces = [("ab", -100), ("a", -500), ("b", -600)]
    out = {r["token"]: r["cnt"] for r in
           unigram_tokenize(df, "text", pieces,
                            max_piece_len=2).collect()}
    # 'abab' -> ab+ab (1 word), 'ab' x2 -> ab each: total ab count 4
    assert out == {"ab": 4}


def test_wordpiece_train_likelihood_winner_and_recount(spark):
    """The full WordPiece loop: round 1's winner is the LIKELIHOOD-GAIN
    top pair (xq — rare chars always together — beats the more frequent
    ab), and later rounds score pairs of MERGED symbols."""
    from kstream_spark.operators.text import (wordpiece_pair_scores,
                                              wordpiece_train)
    rows = [(0, "abab abba baba xq"), (1, "aabb abab baab xq"),
            (2, "abba baba abab xq")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = wordpiece_train(df, "text", n_merges=3).collect()
    assert out[0].pair == "xq"[0] + " " + "xq"[1]
    assert out[0].merged == "xq"
    # round 1's (pair, cnt, score) equals the single-round statistic
    # (pair_scores spells the pair as a 2-char substring, the train loop
    # as space-separated symbols — same pair, different notation)
    r1 = wordpiece_pair_scores(df, "text", top_k=1).collect()[0]
    assert (out[0].merged, out[0].cnt, out[0].score_micro) == \
        (r1["pair"], r1["cnt"], r1["score_micro"])
    # every later winner is a space-separated pair of current symbols
    for r in out:
        assert r.merged == r.pair.replace(" ", "")
        assert r.merge_rank >= 1 and r.cnt >= 1


def test_wordpiece_tokenize_is_longest_match_first(spark):
    from kstream_spark.operators.text import wordpiece_tokenize
    df = spark.createDataFrame([(0, "abcd abd zz")],
                               "doc_id long, text string")
    out = {r["token"]: r["cnt"] for r in
           wordpiece_tokenize(df, "text", ["ab", "abc"]).collect()}
    # 'abcd' -> greedy takes 'abc' (longest prefix), then char 'd';
    # 'abd' -> 'ab' + 'd'; 'zz' -> OOV chars
    assert out == {"abc": 1, "ab": 1, "d": 2, "z": 2}


def test_wordpiece_train_tokenize_roundtrip(spark):
    """Tokenizing with the learned vocab reconstructs every word (the
    single-char OOV floor guarantees segmentability) and the corpus
    token total equals the corpus character total minus merged savings."""
    from kstream_spark.operators.text import (wordpiece_tokenize,
                                              wordpiece_train)
    df = spark.createDataFrame(
        [(0, "hello hello world"), (1, "hold the world")],
        "doc_id long, text string")
    vocab = [r.merged for r in wordpiece_train(df, "text", n_merges=4)
             .orderBy("merge_rank").collect()]
    toks = wordpiece_tokenize(df, "text", vocab).collect()
    # token counts weighted by word frequency cover every character
    n_chars = sum(len(w) for w in
                  "hello hello world hold the world".split())
    assert sum(len(r["token"]) * r["cnt"] for r in toks) == n_chars


def test_prefix_filter_shrinks_candidates(spark):
    """The prefix index is a strict subset of the inverted index (the
    scale claim), while the result set stays identical (losslessness —
    also hash-proven by dedup_prefix_jaccard's brute-force oracle)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W
    from kstream_spark.operators.dedup import shingle_sets
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    sh = shingle_sets(docs, "doc_id", "text", 3)
    t_micro = 800_000
    dfreq = sh.groupBy("s").agg(F.count("*").alias("_df"))
    sized = (sh.join(dfreq, "s")
             .withColumn("_n", F.count("*").over(W.partitionBy("doc_id"))))
    plen = (F.col("_n")
            - F.expr(f"({t_micro}L * _n + 999999) div 1000000") + 1)
    rn = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.asc("_df"), F.asc("s")))
    prefix = sized.withColumn("_rn", rn).filter(F.col("_rn") <= plen)
    n_full, n_pref = sh.count(), prefix.count()
    # t=0.8 keeps ~20% of each doc's shingles in the prefix
    assert n_pref < 0.45 * n_full
    # prefix tokens are the RAREST: their max df can't exceed the global
    max_df_pref = prefix.agg(F.max("_df")).collect()[0][0]
    med_df = dfreq.agg(F.expr("percentile(_df, 0.99)")).collect()[0][0]
    assert max_df_pref is not None and med_df is not None


def test_prefix_filter_skips_boilerplate(spark):
    """On a boilerplate-skewed corpus (every doc shares a license
    header) the full inverted index pairs every doc with every other
    through the hot header shingles — quadratic candidates — while the
    rare-first prefix indexes each doc's unique tail and generates
    near-zero candidates, with an identical final result set."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W
    from kstream_spark.operators.dedup import (ngram_jaccard_pairs,
                                               prefix_jaccard_pairs,
                                               shingle_sets)
    header = " ".join(f"lic{i}" for i in range(12))
    rows = [(i, f"{header} unique{i}a unique{i}b unique{i}c unique{i}d")
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # candidate space: pairs sharing ANY indexed shingle
    sh = shingle_sets(df, "doc_id", "text", 3)
    full_cand = (sh.select(F.col("doc_id").alias("a"), "s")
                 .join(sh.select(F.col("doc_id").alias("b"), "s"), "s")
                 .filter(F.col("a") < F.col("b"))
                 .select("a", "b").distinct().count())
    dfreq = sh.groupBy("s").agg(F.count("*").alias("_df"))
    sized = (sh.join(dfreq, "s")
             .withColumn("_n", F.count("*").over(W.partitionBy("doc_id"))))
    plen = (F.col("_n")
            - F.expr("(800000L * _n + 999999) div 1000000") + 1)
    rn = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.asc("_df"), F.asc("s")))
    prefix = sized.withColumn("_rn", rn).filter(F.col("_rn") <= plen)
    pref_cand = (prefix.select(F.col("doc_id").alias("a"), "s")
                 .join(prefix.select(F.col("doc_id").alias("b"), "s"), "s")
                 .filter(F.col("a") < F.col("b"))
                 .select("a", "b").distinct().count())
    assert full_cand == 60 * 59 // 2        # every pair, via boilerplate
    assert pref_cand == 0                   # rare tails never collide
    # identical results regardless (here: no pair clears t=0.8)
    full = ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.8).count()
    pref = prefix_jaccard_pairs(df, "doc_id", "text", 3, 0.8).count()
    assert full == pref == 0


def test_tokenizer_training_local_arm_bit_identical(spark):
    """The r13 driver-local training arms of bpe_train / wordpiece_train /
    unigram_train must return row-identical results to the distributed
    loops — including on a Unicode-adversarial corpus (NBSP inside a
    token, CJK, an astral emoji whose surrogate-pair char-splitting
    happens JVM-side before either arm's loop runs, mixed case) so the
    space-mechanics-only Python rounds provably see the same symbol
    sequences the distributed projection builds."""
    from kstream_spark.operators.text import (bpe_train, unigram_train,
                                              wordpiece_train)
    rows = [
        (1, "banana banana bandana"),
        (2, "low lower lowest low low"),
        (3, "café cafe cafés naïve"),
        (4, "漢字漢字 漢字"),
        (5, "a b a b plain"),          # NBSP is NOT Java \s
        (6, "\U0001F600x \U0001F600x \U0001F600y"),  # astral surrogate pair
        (7, "Mixed MIXED mixed miXed"),
    ]
    df = _docs(spark, rows)
    for fn, kw, key in (
            (bpe_train, {"n_merges": 5}, None),
            (wordpiece_train, {"n_merges": 5}, None),
            (unigram_train, {"seed_v": 25, "keep_v": 12, "iters": 2,
                             "max_piece_len": 3}, None)):
        loc = [tuple(r) for r in fn(df, "text", local=True, **kw).collect()]
        dist = [tuple(r) for r in fn(df, "text", local=False, **kw).collect()]
        assert loc == dist, f"{fn.__name__} arms diverged"
        assert len(loc) > 0
