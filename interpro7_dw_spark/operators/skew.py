"""Skew-safe per-group order statistics.

``Window.partitionBy(hot_key)`` is the recurring scale killer: a
window puts EVERY row of a partition value in ONE task, so a single
celebrity key — one viral user, one boilerplate source, one market
segment holding 90% of a 100 TB table — serializes the whole query
behind one straggler, and AQE cannot split a window partition. The
engine-wide discipline (sampling's two-phase bucket-split rank,
gapfill/ewma's chunk carries, the hot-shingle DF cap) is the same
shape everywhere: phase 1 computes a bounded per-(hash-bucket, group)
statistic — every bucket holds ~|group|/n_buckets rows regardless of
key skew — and phase 2 runs the true per-group computation over the
SURVIVORS only, whose count is bounded by construction.

Reference anchor: the celebrity-key hazard is exactly the reference's
per-protein fan-out discipline (interpro7dw/utils/store.py:296-317 —
proteins are dealt into fixed buckets BEFORE any per-key processing;
the "one subject owns most rows" case is the biggest InterPro entries
in entry2xrefs, budgeted 100 GB of RAM, cli.py:355, solved there with
per-worker partial dicts — the salted pre-aggregate is the same
trick, declaratively).

AQE's skew-join splitting handles skewed SHUFFLE JOINS at runtime
(session.py enables it); the helpers here cover the shapes AQE cannot
fix: per-group windows (:func:`topk_per_group`), hot-key aggregates
expressed as partial/final pairs (:func:`salted_aggregate`), and
broadcast joins with per-task output skew
(:func:`salted_broadcast_join`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_exprs: list[Column],
    final_exprs: list[Column],
    num_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-stage aggregation via an explicit salt.

    ``partial_exprs`` aggregate within (keys, salt); ``final_exprs``
    combine the partials per key (e.g. partial ``sum(x) AS s`` +
    final ``sum(s) AS total``). ``salt_source`` (any column name)
    makes the salt deterministic; otherwise a uniform random salt is
    used (fine for aggregation — the result is salt-invariant).
    """
    salt = (
        F.pmod(F.hash(F.col(salt_source)), F.lit(num_salts))
        if salt_source
        else (F.rand() * num_salts).cast("int")
    )
    return (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*final_exprs)
    )


def salted_broadcast_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    num_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join with the small side replicated per salt so hot left
    keys spread over ``num_salts`` tasks. Right side must be broadcast-
    sized (it is replicated num_salts times). ``salt_source`` (any
    left column name, e.g. the row's primary key) makes the salt
    deterministic — same plan-replay parity option as
    :func:`salted_aggregate`; the JOIN RESULT is salt-invariant either
    way, but a deterministic salt makes reruns and plan audits
    reproduce task-level placement exactly."""
    salt = (
        F.pmod(F.hash(F.col(salt_source)), F.lit(num_salts))
        if salt_source
        else (F.rand() * num_salts).cast("int")
    )
    salted_left = left.withColumn("__salt", salt)
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return salted_left.join(
        F.broadcast(salted_right), [key, "__salt"]
    ).drop("__salt")


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    bucket_cols: list[str],
    num_buckets: int | None = None,
    rank_col: str = "rk",
) -> DataFrame:
    """Exact top-``k`` rows per group under ``order_by``, with NO
    window over the bare group key on the full data — safe when one
    group holds most of the table.

    Phase 1 ranks within (hash-bucket, group) — each bucket carries
    ~|group|/``num_buckets`` rows whatever the group skew — and keeps
    each bucket's local top-k. Phase 2 ranks the survivors (at most
    ``num_buckets * k`` rows per group) with the true per-group
    window; the global top-k per group is a subset of the union of
    per-bucket top-k, so the result is EXACTLY the naive
    ``row_number() OVER (PARTITION BY group)`` top-k.

    ``order_by`` must be a total order (include a unique tiebreak
    column) for the ranks to be deterministic — same contract as the
    naive window. ``bucket_cols`` feed the bucket hash and should
    together be high-cardinality (e.g. the row's primary key).

    Honest scoping (measured in tools/skew_audit.py / PERF.md r11):
    Spark 4's ``InferWindowGroupLimit`` already rewrites the exact
    ``row_number() + filter(rank <= LITERAL)`` pattern into a
    map-side group limit, so THAT shape does not straggle on modern
    Spark. This operator is for the shapes Catalyst cannot rewrite —
    data-dependent per-group caps (see ``sampling.stratified_sample``),
    ranks consumed without a literal filter, compositions where the
    rank feeds further windows — and as an explicit plan-guarded
    contract that does not depend on an optimizer rule firing.
    """
    n = int(
        num_buckets
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    bucketed = df.withColumn(
        "__b", F.pmod(F.xxhash64(*[F.col(c) for c in bucket_cols]), F.lit(n))
    )
    w_local = Window.partitionBy("__b", *group_cols).orderBy(*order_by)
    survivors = (
        bucketed.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
        .drop("__b", "__lr")
    )
    w_group = Window.partitionBy(*group_cols).orderBy(*order_by)
    return survivors.withColumn(
        rank_col, F.row_number().over(w_group)
    ).filter(F.col(rank_col) <= k)
