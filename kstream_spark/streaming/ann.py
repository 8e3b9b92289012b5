"""Streaming ANN index maintenance: encode arriving vectors against the
PERSISTED index (coarse centroids + PQ codebooks — train once, encode
forever) and append their m-byte codes to a code store; searches run over
the accumulated store without ever touching raw vectors again.

This is the streaming arm of the IVF-PQ lifecycle (operators/similarity:
kmeans_centroids -> save_centroids, pq_codebooks -> save_codebooks):
``admit_stream`` keeps the index CURRENT as data arrives —
the batch-mode counterpart of FAISS's add() — and ``adc_topk_from_codes``
is the search half that reads codes only.  Per micro-batch cost is one
literal-projection cell assignment + one Arrow encode pass over JUST the
new vectors; the 100 TB standing corpus is never re-scanned.

Capability superset: the reference has no vector tooling; the lifecycle
mirrors its changelog-backed store maintenance (continuously-updated
derived state) applied to an ANN index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kstream_spark.util import local_df


def encode_against_index(batch: DataFrame, id_col: str, vec_col: str,
                         centroids: list, codebooks: list,
                         residual: bool = False) -> DataFrame:
    """Encode vectors against a FIXED index: nearest-cell assignment as a
    literal projection (no join/shuffle), PQ codes as one Arrow pass —
    the identical arithmetic (round-6 HALF_UP, lowest-index ties) as
    training-time encode, so codes are reproducible from any engine.
    ``residual=True`` encodes the spherical residual v/||v|| -
    centroid[cell] (the ivfpq_residual_topk formulation — codebooks
    must have been trained on residuals); the centroid subtraction
    happens inside the same Arrow pass.  Returns
    (id, cell_id, codes array<int>)."""

    import numpy as np
    import pandas as pd

    from kstream_spark.functions.vectors import (as_double,
                                                 cell_cosine_scores, norm)

    src = batch.select(F.col(id_col).alias("_id"),
                       as_double(F.col(vec_col)).alias("v")) \
        .withColumn("n", norm(F.col("v")))
    cell_scores = cell_cosine_scores(F.col("v"), F.col("n"), centroids)
    v_out = (F.transform(F.col("v"), lambda x: x / F.col("n"))
             if residual else F.col("v"))
    assigned = src.withColumn(
        "cell_id",
        (F.array_position(cell_scores, F.array_max(cell_scores)) - 1)
        .cast("long")).select("_id", "cell_id", v_out.alias("v"))

    cents_mat = np.asarray(centroids, dtype=np.float64)
    bks = [np.asarray(b, dtype=np.float64) for b in codebooks]
    sub = bks[0].shape[1]
    id_dt = batch.schema[id_col].dataType.simpleString()

    def encode(batches):
        import numpy as np  # noqa: F811
        import pandas as pd  # noqa: F811
        for pdf in batches:
            mat = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            if residual:
                cells = pdf["cell_id"].to_numpy().astype(np.int64)
                mat = mat - cents_mat[cells]
            cols = []
            for j, cb in enumerate(bks):
                x = mat[:, j * sub:(j + 1) * sub]
                raw = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
                d = np.copysign(np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6, raw)
                cols.append(np.argmin(d, axis=1))
            codes = np.stack(cols, axis=1)
            yield pd.DataFrame(
                {"_id": pdf["_id"].to_numpy(dtype=object),
                 "cell_id": pdf["cell_id"].to_numpy(dtype=object),
                 "codes": list(codes.astype(int).tolist())})

    return (assigned.mapInPandas(
        encode, schema=f"_id {id_dt}, cell_id long, codes array<int>")
        .withColumnRenamed("_id", id_col))


def admit_stream(emb_stream: DataFrame, id_col: str, vec_col: str,
                 centroids: list, codebooks: list, store_dir: str,
                 checkpoint_dir: str, epoch_col: str = "__epoch",
                 residual: bool = False):
    """Continuously encode arriving vectors against the persisted index
    and append (id, cell_id, codes) to the code store.  Epoch-keyed
    partitions keep replays idempotent (the admit_stream discipline of
    streaming/corpus.py).  Returns the StreamingQuery."""
    def _admit(batch: DataFrame, epoch_id: int) -> None:
        if not batch.head(1):
            return
        codes = encode_against_index(batch, id_col, vec_col,
                                     centroids, codebooks,
                                     residual=residual)
        (codes.withColumn(epoch_col, F.lit(int(epoch_id)))
         .write.mode("overwrite")
         .partitionBy(epoch_col)
         .option("partitionOverwriteMode", "dynamic")
         .parquet(store_dir))

    return (emb_stream.writeStream.foreachBatch(_admit)
            .option("checkpointLocation", checkpoint_dir).start())


def adc_topk_from_codes(codes: DataFrame, queries: DataFrame,
                        id_col: str, vec_col: str, codebooks: list,
                        k: int = 10, centroids: list | None = None,
                        n_probe: int | None = None) -> DataFrame:
    """ADC top-k over a CODE STORE: identical ranking to
    operators/similarity.pq_adc_topk, but the corpus side is the
    (id, codes) relation admit_stream maintains — the search job reads
    m bytes per vector and never the raw embeddings.  ``queries`` is a
    small DataFrame of (id, vector) rows.  With ``centroids`` the store
    is a residual index and each query gets per-(query, cell) tables;
    ``n_probe`` then restricts scoring to the query's nearest cells
    (candidates in unprobed cells drop out of the equi-join on cell_id
    — the IVF cost dial; None scores every cell).  Returns (query_id,
    neighbor_id, adist, rank)."""
    import numpy as np

    from kstream_spark.functions.vectors import as_double
    from kstream_spark.operators.similarity import _per_query_topk

    bks = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m_, sub = len(bks), bks[0].shape[1]
    qrows = queries.select(F.col(id_col).alias("query_id"),
                           as_double(F.col(vec_col)).alias("qv")).collect()
    spark = codes.sparkSession
    id_dt = queries.schema[id_col].dataType.simpleString()

    def dist_tabs(vec):
        tabs = []
        for j, cb in enumerate(bks):
            x = vec[j * sub:(j + 1) * sub]
            raw = ((cb - x[None, :]) ** 2).sum(-1)
            d = np.copysign(np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6, raw)
            tabs.append([float(v) for v in d])
        return tabs

    adist = None
    for j in range(m_):
        term = F.element_at(F.element_at("tabs", j + 1),
                            F.element_at("codes", j + 1) + 1)
        adist = term if adist is None else adist + term

    if centroids is None:           # plain ADC: one table per query
        tab_rows = [(r["query_id"],
                     dist_tabs(np.asarray(r["qv"], dtype=np.float64)))
                    for r in qrows]
        tables = F.broadcast(local_df(
            spark, tab_rows, f"query_id {id_dt}, tabs array<array<double>>"))
        scored = (codes.select(F.col(id_col).alias("neighbor_id"), "codes")
                  .join(tables, F.col("query_id") != F.col("neighbor_id"))
                  .select("query_id", "neighbor_id",
                          F.round(adist, 6).alias("adist")))
    else:                           # residual store: table per (q, cell)
        cents_mat = np.asarray(centroids, dtype=np.float64)
        cnorm = np.sqrt((cents_mat ** 2).sum(-1))
        tab_rows = []
        for r in qrows:
            qv = np.asarray(r["qv"], dtype=np.float64)
            acc = 0.0                       # fold-order norm (oracle parity)
            for x in qv:
                acc += float(x) * float(x)
            qvn = qv / float(np.sqrt(acc))
            if n_probe is None:             # exhaustive: every cell
                probe_cells = range(cents_mat.shape[0])
            else:                           # ivfpq probing: nearest cells
                raw = (cents_mat @ qv) / (cnorm * float(np.sqrt(acc)))
                cos = np.copysign(
                    np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6, raw)
                order = np.lexsort((np.arange(len(cos)), -cos))
                probe_cells = [int(c) for c in order[:n_probe]]
            for cell in probe_cells:
                tab_rows.append((r["query_id"], cell,
                                 dist_tabs(qvn - cents_mat[cell])))
        tables = F.broadcast(local_df(
            spark, tab_rows,
            f"query_id {id_dt}, cell_id long, "
            "tabs array<array<double>>"))
        scored = (codes.select(F.col(id_col).alias("neighbor_id"),
                               "cell_id", "codes")
                  .join(tables, on="cell_id")
                  .filter(F.col("query_id") != F.col("neighbor_id"))
                  .select("query_id", "neighbor_id",
                          F.round(adist, 6).alias("adist")))
    return _per_query_topk(scored, k)


def compact_code_store(spark, store_dir: str, out_dir: str, id_col: str,
                       epoch_col: str = "__epoch") -> DataFrame:
    """Compact the epoch partitions ``admit_stream`` accumulates into one
    cell-partitioned layout — the maintenance op a production vector
    pipeline runs periodically.

    Two things happen: (1) LATEST-WINS dedup — a vector re-admitted in a
    later micro-batch supersedes its earlier codes (the same
    latest-by-key compaction the changelog stores use,
    global_table.compact_latest), so the store stays one row per id no
    matter how many epochs replayed it; (2) the output is repartitioned
    and PARTITIONED BY cell_id, so a probed search
    (``adc_topk_from_codes`` with n_probe) reading the compacted store
    prunes whole partitions at the scan — at 100 TB the probe dial then
    bounds IO, not just compute.  Epoch dirs collapse into a single
    epoch-0 partition column (kept so a fresh ``admit_stream`` can
    resume appending epochs next to it).

    Out-of-place: writes ``out_dir`` and leaves ``store_dir`` untouched —
    swap directories (or re-point the reader) only after the write
    commits, and only while the admitting query is stopped (the
    stop-compact-swap-resume discipline; compacting under a live writer
    would race the epoch listing).  Returns the compacted DataFrame.
    """
    from pyspark.sql import Window as W
    codes = spark.read.parquet(store_dir)
    w = W.partitionBy(id_col).orderBy(F.desc(epoch_col))
    latest = (codes.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .select(id_col, "cell_id", "codes"))
    (latest.withColumn(epoch_col, F.lit(0))
     .repartition("cell_id")
     .write.mode("overwrite").partitionBy("cell_id", epoch_col)
     .parquet(out_dir))
    return spark.read.parquet(out_dir)


def recall_report(emb: DataFrame, id_col: str, vec_col: str,
                  query_ids: list, codebooks: list, k: int = 10) -> DataFrame:
    """Recall@k audit of a PQ index against brute-force cosine over the
    same corpus: per query, how many of the true top-k the ADC ranking
    recovers.  The measurement half of the drift->retrain loop (the
    sim_ann_drift / sim_ann_retrain driver rows run exactly this shape).
    Returns (query_id, n_hits)."""
    from kstream_spark.operators.similarity import cosine_topk, pq_adc_topk
    exact = cosine_topk(emb, id_col, vec_col, query_ids=query_ids,
                        k=k).select("query_id", "neighbor_id")
    approx = pq_adc_topk(emb, id_col, vec_col, query_ids, codebooks,
                         k=k).select("query_id", "neighbor_id")
    ind = F.broadcast(approx.withColumn("_hit", F.lit(1)))
    return (exact.join(ind, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(F.count("_hit").cast("long").alias("n_hits")))


def retrain_if_drifted(emb: DataFrame, id_col: str, vec_col: str,
                       query_ids: list, codebooks: list,
                       threshold_hits: int, k: int = 10,
                       m: int = 4, pq_k: int = 16, pq_iters: int = 2):
    """The drift DECISION wired end-to-end: audit the current codebooks'
    recall@k (``recall_report``); when total hits across the probe
    queries fall below ``threshold_hits``, retrain codebooks on the full
    corpus and return them (the caller then re-encodes via
    ``encode_against_index`` and swaps stores with the
    stop-compact-swap-resume discipline — see examples/ingest_pipeline).

    Driver traffic: the |Q|-row recall report — the same bounded
    1-action contract as the training loops.  Returns
    ``(books, report_df, retrained)``: ``books`` is the retrained set
    when triggered, the incoming ``codebooks`` otherwise; ``report_df``
    is the BEFORE audit either way."""
    from kstream_spark.operators.similarity import pq_codebooks
    report = recall_report(emb, id_col, vec_col, query_ids, codebooks, k=k)
    total = report.agg(F.sum("n_hits")).collect()[0][0] or 0
    if total >= threshold_hits:
        return codebooks, report, False
    fresh = pq_codebooks(emb, vec_col, m=m, k=pq_k, iters=pq_iters,
                         id_col=id_col)
    return fresh, report, True
