"""Byte-pair-encoding tokenization as a distributed operator.

Applies a LEARNED merges table (the (rank, left, right) list a BPE
trainer emits — Sennrich et al. 2016) to text, producing real token
ids, replacing the whitespace / ``bpe_ish`` regex proxies the packing
and chunking family counted with until round 8.

Algorithm (the standard application loop): a word starts as its
character sequence; while any adjacent symbol pair appears in the
merges table, merge every LEFTMOST-NONOVERLAPPING occurrence of the
LOWEST-RANKED applicable pair, then rescan (newly formed symbols
create new candidate pairs). The loop is deterministic — rank order
plus left-to-right tie handling — so any engine replays it exactly;
the bpe_tokenize DuckDB oracle does, with a recursive CTE running
the identical pass structure.

Scale shape: tokenization is a FUNCTION OF THE WORD, so the merge
loop runs over the corpus' DISTINCT words (Zipf: the working set is
the vocabulary, orders of magnitude smaller than the token stream)
and joins back to (doc, word-position) rows at the end. Each pass is
one map-side column fold over the symbol array against the BROADCAST
merges maps (vocab-sized single-row map columns — merge DATA, not
Catalyst literals, the IVF-centroid pattern) plus one cheap
vocab-sized termination aggregate; the pass count is bounded by the
longest word's merge chain. No Python UDFs anywhere.

Token ids follow the byte-level convention: a single-character symbol
is its code point; a merged symbol is ``256 + rank`` of the merge
that creates it (merge results are unique strings in a valid BPE
vocab — enforced by :func:`merges_table`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# (left, right) in rank order — a small deterministic English-ish
# demo vocabulary; swap for a trainer's merges file in production.
DEFAULT_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("e", "n"), ("o", "r"),
    ("a", "t"), ("e", "s"), ("o", "u"), ("i", "s"), ("in", "g"),
    ("t", "o"), ("s", "t"), ("a", "r"), ("o", "f"), ("l", "l"),
    ("e", "d"), ("a", "l"), ("c", "o"), ("s", "e"), ("d", "e"),
]

# pair-key separator: without one ("a","bc") and ("ab","c") would
# collide on the same lookup key; \x01 never occurs in tokens
_SEP = "\x01"


def merges_table(
    spark: SparkSession,
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """(rank long, l string, r string) merges relation. Validates the
    BPE invariant that every merge's RESULT string is unique (token
    ids depend on it)."""
    ms = merges if merges is not None else DEFAULT_MERGES
    results = [l + r for l, r in ms]
    if len(set(results)) != len(results):
        raise ValueError("duplicate merge result strings break token ids")
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(ms)], "rank long, l string, r string"
    )


def _attach_merge_maps(df: DataFrame, merges: DataFrame) -> DataFrame:
    """Broadcast the merges as single-row map columns: pair-key ->
    rank (``__mp``), rank -> left / right symbol (``__ml`` / ``__mr``)
    and merged-token -> rank (``__mt``) — merge DATA, not Catalyst
    literals, so vocab size is bounded by broadcast bytes (a
    32k-merge vocab is ~1 MB), same pattern as the IVF centroids."""
    one = merges.agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(F.concat("l", F.lit(_SEP), "r").alias("k"), F.col("rank"))
            )
        ).alias("__mp"),
        F.map_from_entries(
            F.collect_list(F.struct(F.col("rank"), F.col("l")))
        ).alias("__ml"),
        F.map_from_entries(
            F.collect_list(F.struct(F.col("rank"), F.col("r")))
        ).alias("__mr"),
        F.map_from_entries(
            F.collect_list(F.struct(F.concat("l", "r").alias("k"), F.col("rank")))
        ).alias("__mt"),
    )
    return df.crossJoin(F.broadcast(one))


def _best_rank() -> Column:
    """Lowest merge rank among the row's adjacent symbol pairs (null
    when no pair is mergeable — the loop's termination signal).
    ``array_min`` skips the nulls unmergeable pairs produce. The
    single-symbol guard matters: Spark's ``sequence(1, 0)`` counts
    DOWN, it is not empty."""
    scan = F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.element_at(
                F.col("__mp"),
                F.concat(
                    F.element_at(F.col("syms"), i),
                    F.lit(_SEP),
                    F.element_at(F.col("syms"), i + 1),
                ),
            ),
        )
    )
    return F.when(F.size("syms") >= 2, scan)


def _one_pass() -> Column:
    """Merge every leftmost-nonoverlapping occurrence of the row's
    best-ranked pair (``__lb``/``__rb``): a single left fold — when
    the accumulator's tail equals the pair's left and the next symbol
    equals its right, the two collapse; a symbol just produced by a
    merge is a fresh tail, which is exactly the nonoverlap rule."""
    return F.aggregate(
        F.col("syms"),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.col("__lb"))
            & (x == F.col("__rb")),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_tokenize(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_passes: int = 64,
) -> DataFrame:
    """Tokenize whitespace-pretokenized text with the given merges.

    Returns one row per token: (doc_id, wpos, tpos, token, token_id)
    — ``wpos`` the word's 0-based position in the document, ``tpos``
    the token's 0-based position within the word, ``token_id`` the
    byte-level id (code point for single chars, 256 + merge rank for
    merged symbols). Concatenating a word's tokens in ``tpos`` order
    reproduces the word (token conservation — property-tested).
    """
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("wpos", "word"),
    ).filter(F.col("word") != "")
    # the merge loop runs over DISTINCT words only
    uniq = words.select("word").distinct()
    state = _attach_merge_maps(
        uniq.withColumn("syms", F.split("word", "")), merges
    ).localCheckpoint()
    for _ in range(max_passes):
        state = state.withColumn("__best", _best_rank())
        # driver-side termination probe: one vocab-sized aggregate
        if state.agg(F.max("__best").alias("m")).first().m is None:
            state = state.drop("__best")
            break
        state = (
            state.withColumn("__lb", F.element_at(F.col("__ml"), F.col("__best")))
            .withColumn("__rb", F.element_at(F.col("__mr"), F.col("__best")))
            .withColumn(
                "syms",
                F.when(F.col("__best").isNull(), F.col("syms")).otherwise(
                    _one_pass()
                ),
            )
            .drop("__best", "__lb", "__rb")
            .localCheckpoint()  # truncate the per-pass lineage
        )
    else:
        raise RuntimeError(f"BPE did not converge in {max_passes} passes")
    tok_ids = state.select(
        "word",
        F.posexplode("syms").alias("tpos", "token"),
        F.col("__mt"),
    ).select(
        "word",
        "tpos",
        "token",
        F.when(
            F.length("token") > 1,
            F.lit(256) + F.element_at(F.col("__mt"), F.col("token")),
        )
        .otherwise(F.ascii("token").cast("long"))
        .cast("long")
        .alias("token_id"),
    )
    return words.join(tok_ids, "word").select(
        "doc_id",
        F.col("wpos").cast("long").alias("wpos"),
        F.col("tpos").cast("long").alias("tpos"),
        "token",
        "token_id",
    )


def bpe_learn_merges(
    docs: DataFrame,
    n_merges: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Learn a BPE merges table FROM the corpus (Sennrich et al. 2016
    training loop): start from character symbols, repeatedly count
    every adjacent symbol pair across the corpus (weighted by word
    frequency, overlapping occurrences counted — the reference
    ``get_stats`` convention) and merge the globally most frequent
    pair, ties broken lexicographically on (l, r) so the result is
    deterministic on any engine.

    Scale shape: the working set is (distinct word, corpus frequency)
    — vocabulary-sized, not corpus-sized; each of the ``n_merges``
    iterations is ONE pair-count shuffle (map-side partial aggregate)
    + a driver-side 1-row argmax + a map-side merge fold +
    ``localCheckpoint`` (lineage stays flat, so a production 32k-merge
    run is 32k linear vocab scans — the standard distributed BPE
    trainer). The z_bpe_learn_merges oracle replays every iteration
    as an unrolled CTE chain (pair counts → argmax → merged words),
    the same structure as the Lloyd-iteration oracles.

    Result uniqueness: two distinct pairs can produce the SAME merged
    string (('a','bc') and ('ab','c') once 'ab' and 'bc' exist), which
    would break :func:`bpe_tokenize`'s merged-token -> rank map (and
    trip :func:`merges_table`'s validation). A candidate pair whose
    concatenation collides with an earlier merge's result is SKIPPED
    at the argmax — the oracle replays the identical exclusion — so
    the returned table always feeds :func:`bpe_tokenize` directly.

    Returns the learned (rank long, l string, r string) table —
    feed it straight into :func:`bpe_tokenize`.
    """
    spark = docs.sparkSession
    words = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    state = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wcount"))
        .withColumn("syms", F.split("word", ""))
        .localCheckpoint()
    )
    learned: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        pairs = (
            state.filter(F.size("syms") >= 2)
            .select(
                "wcount",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("syms"), i).alias("l"),
                            F.element_at(F.col("syms"), i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wcount").alias("c"))
        )
        # skip candidates whose merged string collides with an earlier
        # merge result (result uniqueness — see docstring); the learned
        # list is rank-sized, a cheap NOT-IN literal
        taken = [l + r for _, l, r in learned]
        if taken:
            pairs = pairs.filter(~F.concat("l", "r").isin(taken))
        best = pairs.orderBy(F.desc("c"), F.asc("l"), F.asc("r")).first()
        if best is None:
            break
        learned.append((rank, best.l, best.r))
        lb, rb = F.lit(best.l), F.lit(best.r)
        fold = F.aggregate(
            F.col("syms"),
            F.expr("CAST(array() AS array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == lb)
                & (x == rb),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(F.element_at(acc, -1), x)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        state = state.withColumn("syms", fold).localCheckpoint()
    return spark.createDataFrame(
        learned or [], "rank long, l string, r string"
    )
