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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _idf_ppm(n: Column, df: Column) -> Column:
    """floor(1e6 * (2N-2df+1)/(2df+1)) — the rational BM25 idf core
    in PPM space; both division operands are exact int64."""
    return F.floor(
        F.lit(1_000_000.0)
        * (F.lit(2) * n - F.lit(2) * df + F.lit(1)).cast("double")
        / (F.lit(2) * df + F.lit(1)).cast("double")
    )


def _tfn_ppm(
    tf: Column, dl: Column, avgdl_m: Column, k1_milli: int, b_milli: int
) -> Column:
    """Milli-cleared Okapi tf normalization in PPM space (see module
    docstring); ONE double division of exact int64 products."""
    c1 = k1_milli * (1000 - b_milli)
    c2 = k1_milli * b_milli
    return F.floor(
        F.lit(1_000_000.0)
        * (tf * F.lit((k1_milli + 1000) * 1000) * avgdl_m).cast("double")
        / (
            tf * F.lit(1_000_000) * avgdl_m
            + F.lit(c1) * avgdl_m
            + F.lit(c2) * dl * F.lit(1000)
        ).cast("double")
    )


def _two_stage_topk(scored: DataFrame, k: int, n_buckets: int) -> DataFrame:
    """Exact per-qid top-k without a corpus-sized qid window group:
    local top-k inside deterministic doc-hash buckets, then top-k of
    the <= n_buckets*k survivors. Bucket choice never shows in the
    result."""
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

    matched = (
        tf.join(F.broadcast(qdf), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "qid",
            "doc_id",
            _idf_ppm(F.col("__n"), F.col("df")).alias("__idf_ppm"),
            _tfn_ppm(
                F.col("tf"), F.col("dl"), F.col("__avgdl_m"), k1_milli, b_milli
            ).alias("__tfn_ppm"),
        )
    )
    scored = matched.groupBy("qid", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        F.sum(F.col("__tfn_ppm") * F.col("__idf_ppm")).cast("long").alias("score_ppm"),
    )
    return _two_stage_topk(scored, k, n_buckets)


def _term_shard(term: Column, n_shards: int) -> Column:
    return F.pmod(F.crc32(term.cast("binary")), F.lit(n_shards)).cast("int")


def write_inverted_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 32,
) -> None:
    """Persist the BM25 index: postings (term, doc_id, tf, dl) written
    as parquet PARTITIONED BY a crc32 term shard, the vocabulary table
    (term, df) under the same sharding, and the corpus stats
    (N, avgdl_m) as a single-row parquet. The build-once half of the
    retrieval path: tokenization, tf and df run exactly once; every
    later query batch (:func:`bm25_topk_on_index`) reads only the
    shards its terms hash to — partition pruning on ``shard=``
    directories — instead of re-scanning and re-tokenizing the corpus.
    Same layout idea as :func:`similarity.write_ivf_index`, with the
    term shard playing the cell-id role."""
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
        .withColumn("shard", _term_shard(F.col("term"), n_shards))
    )
    # persist across the two consumers (postings write + df aggregate)
    # so the corpus is tokenized ONCE; this function fully materializes
    # before returning, so the cache is released in the finally — no
    # persist outlives the builder
    tf = tf.persist()
    try:
        tf.write.mode("overwrite").partitionBy("shard").parquet(path + "/postings")
        (
            tf.groupBy("shard", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("df"))
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(path + "/terms")
        )
        stats.write.mode("overwrite").parquet(path + "/stats")
    finally:
        tf.unpersist()


def bm25_topk_on_index(
    query_terms: DataFrame,
    path: str,
    k: int = 10,
    k1_milli: int = 1200,
    b_milli: int = 750,
    n_buckets: int = 64,
    n_shards: int = 32,
) -> DataFrame:
    """The query half of :func:`write_inverted_index`: BM25 top-k for
    each query against the persisted index. The query side recomputes
    the crc32 shard of every term, and the reads of the
    shard-partitioned vocabulary and postings tables carry a STATIC
    ``shard IN (...)`` partition filter built from the query's
    distinct shard set — a driver-side collect bounded by n_shards
    values regardless of query-batch size (the shard domain is
    finite), which prunes harder and more predictably than the DPP
    benefit heuristic. A batch touching s distinct shards reads
    s/n_shards of the index files; the shard stays a leading equi-key
    on both joins so the broadcast probe never fans out past matching
    postings.

    Same result contract as :func:`bm25_topk` with the same
    (k, k1_milli, b_milli) on the same corpus (``n_shards`` must match
    the build)."""
    spark = query_terms.sparkSession
    stats = spark.read.parquet(path + "/stats")
    q = query_terms.withColumn("shard", _term_shard(F.col("term"), n_shards))
    shards = sorted(
        r["shard"] for r in q.select("shard").distinct().collect()
    )
    terms = spark.read.parquet(path + "/terms").filter(
        F.col("shard").isin(shards)
    )
    postings = spark.read.parquet(path + "/postings").filter(
        F.col("shard").isin(shards)
    )
    qdf = q.join(terms, ["shard", "term"])
    matched = (
        postings.join(F.broadcast(qdf), ["shard", "term"])
        .crossJoin(F.broadcast(stats))
        .select(
            "qid",
            "doc_id",
            _idf_ppm(F.col("__n"), F.col("df")).alias("__idf_ppm"),
            _tfn_ppm(
                F.col("tf"), F.col("dl"), F.col("__avgdl_m"), k1_milli, b_milli
            ).alias("__tfn_ppm"),
        )
    )
    scored = matched.groupBy("qid", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        F.sum(F.col("__tfn_ppm") * F.col("__idf_ppm")).cast("long").alias("score_ppm"),
    )
    return _two_stage_topk(scored, k, n_buckets)
