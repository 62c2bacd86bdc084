"""Deterministic corpus sampling and shard packing.

Training-data curation needs two operations the dedup/quality stack
doesn't cover: cutting a corpus DOWN to a target mix (stratified
sampling) and cutting it UP into fixed-budget shards (token packing).
Both are expressed here without RNG state — selection order is the
md5 of the document id — so reruns, retries and engines agree
bit-for-bit (same property the MinHash/LSH operators rely on), unlike
``DataFrame.sample``, whose output depends on partitioning.

Scale design — NO single-task-per-stratum window anywhere. A naive
``Window.partitionBy(stratum).orderBy(md5(id))`` serializes each
stratum into one task: at 100 TB with a "web" stratum holding 90% of
the corpus that is a terabyte sort on one core. Both operators
instead run the two-phase range-split plan (the same shape as the
flat-file sinks' per-range framing, and the reference's
range-partitioned fan-out in interpro/xrefs/utils.py:6-19):

1. ``repartitionByRange(n, stratum, md5(id), id)`` — every stratum is
   SPLIT across many ordered ranges (range partition i's keys all
   precede partition i+1's, per stratum, because the stratum is the
   range key prefix);
2. a window keyed by ``(range_id, stratum)`` computes LOCAL ranks /
   running token sums — each window group is bounded by the range
   size, never by the stratum size;
3. a tiny per-``(range_id, stratum)`` aggregate (#ranges × #strata
   rows) is prefix-summed and broadcast back: global value =
   range offset + local value.

The range exchange is shared by the local-window branch and the
counts branch (ReusedExchange in the physical plan), so the corpus is
shuffled once. ``pack_token_shards``'s final ``shard_pos`` window
partitions by ``(stratum, shard_id)`` — safe at any scale because a
shard holds at most ``budget`` documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_order(id_col: str) -> Column:
    """Deterministic pseudo-random sort key: md5 of the id. NOT a
    total order on its own — md5 collisions are possible in
    principle — so every caller appends the id column itself as the
    tiebreak when ordering by this."""
    return F.md5(F.col(id_col).cast("string").cast("binary"))


def _num_ranges(df: DataFrame, num_ranges: int | None) -> int:
    if num_ranges is not None:
        return num_ranges
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))


def _range_annotated(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    num_ranges: int | None,
    token_col: str | None = None,
) -> DataFrame:
    """Two-phase global rank (and, with ``token_col``, global running
    token sum) per ``keys`` group in md5(id) order, with every group
    split across up to ``num_ranges`` tasks.

    Adds ``__h`` (the md5 sort key), ``__pid`` (ordered range id —
    kept so tests can assert a stratum spans >1 range), ``__rank``
    (1-based global rank within the group) and, when ``token_col`` is
    given, ``__run`` (inclusive global running sum of ``token_col``).

    Correctness of the renumbering rests on range partitioning: rows
    are ranged on ``(*keys, __h, id)``, so within one group every row
    of range i precedes every row of range i+1 in ``(__h, id)``
    order; local rank + (sum of earlier ranges' group counts) is
    therefore the exact global rank.
    """
    n = _num_ranges(df, num_ranges)
    keyed = df.withColumn("__h", _hash_order(id_col))
    order = [F.col(c) for c in (*keys, "__h", id_col)]
    ranged = keyed.repartitionByRange(n, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid", *keys).orderBy("__h", F.col(id_col))
    local = ranged.withColumn("__lrank", F.row_number().over(w_local))
    aggs = [F.count(F.lit(1)).alias("__cnt")]
    if token_col is not None:
        local = local.withColumn(
            "__lrun",
            F.sum(F.col(token_col)).over(
                w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        aggs.append(F.sum(F.col(token_col)).alias("__tok"))
    counts = ranged.groupBy("__pid", *keys).agg(*aggs)
    w_off = (
        Window.partitionBy(*keys)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__cnt_off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).cast("long")
    )
    off_cols = ["__pid", *keys, "__cnt_off"]
    if token_col is not None:
        offsets = offsets.withColumn(
            "__tok_off", F.coalesce(F.sum("__tok").over(w_off), F.lit(0)).cast("long")
        )
        off_cols.append("__tok_off")
    out = local.join(F.broadcast(offsets.select(*off_cols)), ["__pid", *keys])
    out = out.withColumn(
        "__rank", (F.col("__cnt_off") + F.col("__lrank")).cast("long")
    ).drop("__lrank", "__cnt_off")
    if token_col is not None:
        out = out.withColumn(
            "__run", (F.col("__tok_off") + F.col("__lrun")).cast("long")
        ).drop("__lrun", "__tok_off")
    return out


def stratified_sample(
    docs: DataFrame,
    caps: dict[str, int],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_cap: int | None = None,
    num_ranges: int | None = None,
) -> DataFrame:
    """Keep at most ``caps[stratum]`` documents per stratum, selected
    by md5(id) rank — a reproducible uniform sample without RNG.

    ``default_cap`` applies to strata absent from ``caps``; ``None``
    keeps them whole. Adds ``sample_rank`` (1-based position in the
    stratum's hash order) so downstream stages can tighten the mix
    without re-sampling. Caps are a small driver-side dict (one entry
    per stratum — sources/languages number in the hundreds, not
    billions).

    Scale: the rank is computed by the two-phase range-split plan
    (module docstring) — one full shuffle, every stratum spread over
    ``num_ranges`` tasks (default ``spark.sql.shuffle.partitions``).
    """
    ranked = _range_annotated(docs, [stratum_col], id_col, num_ranges)
    cap_expr = F.lit(None).cast("long")
    for value, cap in sorted(caps.items()):
        cap_expr = F.when(F.col(stratum_col) == value, cap).otherwise(cap_expr)
    if default_cap is not None:
        cap_expr = F.coalesce(cap_expr, F.lit(default_cap))
    out = ranked.withColumn("sample_rank", F.col("__rank").cast("integer")).drop(
        "__h", "__pid", "__rank"
    )
    return out.where(cap_expr.isNull() | (F.col("sample_rank") <= cap_expr))


def pack_token_shards(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    stratum_col: str | None = "source",
    id_col: str = "doc_id",
    num_ranges: int | None = None,
) -> DataFrame:
    """Assign each document to a token-budget shard: documents are
    laid out in md5(id) order (per stratum when ``stratum_col`` is
    set) and the stream is cut at every ``budget``-token mark.

    ``shard_id`` = floor((cumulative tokens - own tokens) / budget) —
    a document belongs to the shard whose token span its FIRST token
    falls in. Each shard therefore covers exactly ``budget`` tokens of
    stream mass; its own document total can deviate from ``budget``
    only by the straddling documents at its two boundaries. A document
    longer than ``budget`` consumes several marks, so the next
    document lands a correspondingly later shard id (ids are ordered,
    not necessarily dense). This fixed-mark chunking needs only a
    running sum; a reset-on-overflow greedy packer is instead a
    sequential recurrence — express it with the W4 aggregate-fold
    pattern (domain/hmm.py) if exact per-shard capacity is required.
    Output adds ``shard_id`` and ``shard_pos`` (0-based position
    within the shard).

    Scale: the running sum is two-phase range-split (module
    docstring) — local running sums per range plus broadcast
    prefix-sum token offsets, so a stratum (or the whole corpus when
    ``stratum_col=None``) is never one task. The ``shard_pos`` window
    partitions by shard — bounded by ``budget`` documents per group.
    """
    keys = [stratum_col] if stratum_col else []
    annotated = _range_annotated(
        docs, keys, id_col, num_ranges, token_col=token_col
    )
    out = annotated.withColumn(
        "shard_id",
        F.floor((F.col("__run") - F.col(token_col)) / F.lit(budget)).cast("long"),
    )
    w_shard = Window.partitionBy(*keys, "shard_id").orderBy("__h", F.col(id_col))
    return (
        out.withColumn(
            "shard_pos", (F.row_number().over(w_shard) - 1).cast("long")
        )
        .drop("__h", "__pid", "__rank", "__run")
    )
