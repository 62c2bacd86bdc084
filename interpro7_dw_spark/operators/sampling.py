"""Deterministic corpus sampling and shard packing.

Training-data curation needs two operations the dedup/quality stack
doesn't cover: cutting a corpus DOWN to a target mix (stratified
sampling) and cutting it UP into fixed-budget shards (token packing).
Both are expressed here without RNG state — selection order is the
md5 of the document id — so reruns, retries and engines agree
bit-for-bit (same property the MinHash/LSH operators rely on), unlike
``DataFrame.sample``, whose output depends on partitioning.

Scale notes:
- ``stratified_sample`` is one shuffle (the per-stratum window); the
  md5 rank needs no global sort. Caps are a small driver-side dict
  (one entry per stratum — sources/languages number in the hundreds,
  not billions).
- ``pack_token_shards`` is one shuffle per stratum column set: a
  running-sum window keyed by the same hash order. Shard ids are
  assigned by cumulative token count, so shard sizes stay within one
  document of the budget without any sequential driver loop. At 100
  TB, partition by (stratum) and let each stratum's window run in
  parallel; a global (stratum-less) packing of a petabyte corpus
  should instead pack per partition-range and renumber shards by
  prefix sums of per-range counts (same plan shape as the flat-file
  sinks' per-range framing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_order(id_col: str) -> Column:
    """Deterministic pseudo-random total order: md5 of the id, with
    the id itself as tiebreak (md5 collisions are possible in
    principle; the tiebreak keeps the order total either way)."""
    return F.md5(F.col(id_col).cast("string").cast("binary"))


def stratified_sample(
    docs: DataFrame,
    caps: dict[str, int],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_cap: int | None = None,
) -> DataFrame:
    """Keep at most ``caps[stratum]`` documents per stratum, selected
    by md5(id) rank — a reproducible uniform sample without RNG.

    ``default_cap`` applies to strata absent from ``caps``; ``None``
    keeps them whole. Adds ``sample_rank`` (1-based position in the
    stratum's hash order) so downstream stages can tighten the mix
    without re-sampling.
    """
    w = Window.partitionBy(stratum_col).orderBy(
        _hash_order(id_col), F.col(id_col)
    )
    cap_expr = F.lit(None).cast("long")
    for value, cap in sorted(caps.items()):
        cap_expr = F.when(F.col(stratum_col) == value, cap).otherwise(cap_expr)
    if default_cap is not None:
        cap_expr = F.coalesce(cap_expr, F.lit(default_cap))
    ranked = docs.withColumn("sample_rank", F.row_number().over(w))
    return ranked.where(
        cap_expr.isNull() | (F.col("sample_rank") <= cap_expr)
    )


def pack_token_shards(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    stratum_col: str | None = "source",
    id_col: str = "doc_id",
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
    not necessarily dense). This fixed-mark chunking is one
    running-sum window; a reset-on-overflow greedy packer is instead a
    sequential recurrence — express it with the W4 aggregate-fold
    pattern (domain/hmm.py) if exact per-shard capacity is required.
    Output adds ``shard_id`` and ``shard_pos`` (0-based position
    within the shard).
    """
    keys = [stratum_col] if stratum_col else []
    order = [_hash_order(id_col), F.col(id_col)]
    w = Window.partitionBy(*keys).orderBy(*order)
    run = F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = docs.withColumn(
        "shard_id",
        F.floor((run - F.col(token_col)) / F.lit(budget)).cast("long"),
    )
    w_shard = Window.partitionBy(*keys, "shard_id").orderBy(*order)
    return out.withColumn(
        "shard_pos", (F.row_number().over(w_shard) - 1).cast("long")
    )
