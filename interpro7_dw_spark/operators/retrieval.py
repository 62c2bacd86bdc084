"""Sparse lexical retrieval: BM25 top-k document ranking over an
inverted-index join.

Training-data pipelines use lexical retrieval constantly — nearest
neighbours for decontamination audits, seed expansion for domain
corpora, eval-set leakage triage — and BM25 remains the standard
sparse baseline next to the embedding ANN family
(operators/similarity.py). The reference's EBI-search export
(interpro7dw/interpro/ebisearch.py) builds documents FOR such an
engine; this operator IS the query side, Spark-native.

Scoring is the classic Okapi form with one engine-portability twist:
every per-term weight is computed in integer-exact PPM space (the
:mod:`sampling` DSIR pattern) instead of float ``ln``/``log`` calls,
whose libm rounding differs across engines:

- ``idf_ppm  = floor(1e6 * (2N - 2df + 1) / (2df + 1))`` — the
  rational core of the BM25 idf (its ``ln`` is monotone, so ranking
  by the rational keeps rare-term dominance; the PPM floor makes it
  replayable bit-for-bit in any SQL engine),
- ``tfn_ppm  = floor(1e6 * tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl)))``
  cleared of fractions by milli-scaling: with ``k1 = k1_milli/1000``,
  ``b = b_milli/1000`` and ``avgdl_m = floor(1000*total_tokens/N)``
  both operands of the single double division are exact int64
  products (int64→double conversion and IEEE division are identical
  everywhere),
- ``score_ppm = Σ_terms tfn_ppm * idf_ppm`` — a BIGINT sum, exact and
  order-free.

Scale shape: term frequencies and document frequencies are plain
``groupBy`` aggregates (map-side partials; df is vocabulary-sized);
the query join touches only postings of query terms (inverted-index
semantics — the corpus never fans out past its matching rows); corpus
stats travel as a broadcast single-row frame. The final top-k NEVER
windows on the bare query id (a query matching half the corpus would
pin that half in one task): local top-k within deterministic doc-hash
buckets, then top-k of the ≤ 64·k survivors — top-k of bucket top-ks
is exactly the global top-k, so the bucketing never shows in the
result (the DuckDB oracle uses a plain window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    k1_milli: int = 1200,
    b_milli: int = 750,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Rank documents for each query by integer-exact BM25.

    ``query_terms`` is a tiny (qid, term) relation — one row per query
    term, duplicates allowed (they score twice, matching the bag-of-
    words reading). Ties break on ascending document id.

    Returns (qid, rank, doc_id, n_terms_matched, score_ppm).
    """
    toks = F.split(F.col(text_col), " ")
    stats = docs.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.size(toks)).cast("long").alias("__tt"),
    ).select("__n", F.expr("__tt * 1000 DIV __n").alias("__avgdl_m"))

    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(toks).cast("long").alias("dl"),
            F.explode(toks).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"), F.max("dl").alias("dl"))
    )
    df_tab = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    # per-query-term df: tiny (|query terms| rows) — terms absent from
    # the corpus drop here, exactly as a zero posting list would
    qdf = query_terms.join(df_tab, "term")

    c1 = k1_milli * (1000 - b_milli)  # k1*(1-b) cleared to milli^2
    c2 = k1_milli * b_milli
    matched = (
        tf.join(F.broadcast(qdf), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "qid",
            "doc_id",
            F.floor(
                F.lit(1_000_000.0)
                * (F.lit(2) * F.col("__n") - F.lit(2) * F.col("df") + F.lit(1)).cast("double")
                / (F.lit(2) * F.col("df") + F.lit(1)).cast("double")
            ).alias("__idf_ppm"),
            F.floor(
                F.lit(1_000_000.0)
                * (F.col("tf") * F.lit((k1_milli + 1000) * 1000) * F.col("__avgdl_m")).cast("double")
                / (
                    F.col("tf") * F.lit(1_000_000) * F.col("__avgdl_m")
                    + F.lit(c1) * F.col("__avgdl_m")
                    + F.lit(c2) * F.col("dl") * F.lit(1000)
                ).cast("double")
            ).alias("__tfn_ppm"),
        )
    )
    scored = matched.groupBy("qid", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        F.sum(F.col("__tfn_ppm") * F.col("__idf_ppm")).cast("long").alias("score_ppm"),
    )
    # two-stage exact top-k (bucket choice is invisible in the result)
    bucketed = scored.withColumn(
        "__b", F.pmod(F.abs(F.hash("doc_id")), F.lit(n_buckets))
    )
    order = (F.desc("score_ppm"), F.asc("doc_id"))
    w_local = Window.partitionBy("qid", "__b").orderBy(*order)
    pruned = bucketed.withColumn("__lr", F.row_number().over(w_local)).filter(
        F.col("__lr") <= k
    )
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "n_terms_matched", "score_ppm")
    )
