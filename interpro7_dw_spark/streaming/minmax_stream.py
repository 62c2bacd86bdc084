"""Continuous MIN/MAX view maintenance — the streaming habitat of
``operators/cdc.py::ivm_apply_group_minmax``.

MIN/MAX are the retract-HARD aggregates: a deleted extremum forces a
re-aggregation of the touched group from the FACTS, so a changelog
stream alone is not enough state — the maintainer must keep the fact
table too. Rewriting |facts| per epoch would break the IVM cost
contract, so the facts live in a miniature COPY-ON-WRITE bucket store
(the Delta/Iceberg idea in one directory tree):

    state_dir/facts/b<i>/v<n>/   — bucket i's rows as of mart version n

Each epoch rewrites ONLY the buckets holding changed groups (bucket =
hash(group) % n_buckets, so a group's rows colocate and the rescan
semi-join reads just-touched buckets); untouched buckets stay as
older versions, and a reader resolves each bucket's newest committed
version <= the mart version it wants — the directory tree IS the
manifest. Per-epoch cost: |micro-batch delta| + the touched buckets'
data + touched groups, never |facts|.

Mart versions, epoch idempotence (``v<n>_e<epoch>`` + skip on replay)
and retention reuse the machinery of :mod:`.ivm_stream`; facts-bucket
retention keeps, per bucket, every version from its newest one at or
below the keep floor (older ones can no longer be referenced).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import ivm_apply_group_minmax
from .ivm_stream import _fs, _latest_committed, _list_versions


def _bucket(col, n_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets))


def _bucket_versions(spark, state_dir: str, bucket: int) -> list[int]:
    """Committed version numbers present for one facts bucket."""
    return [
        v
        for v, _e, committed, _name in _list_versions(
            spark, f"{state_dir}/facts/b{bucket}"
        )
        if committed
    ]


def _read_bucket(
    spark, state_dir: str, bucket: int, at_version: int
) -> DataFrame | None:
    vs = [v for v in _bucket_versions(spark, state_dir, bucket) if v <= at_version]
    if not vs:
        return None
    return spark.read.parquet(f"{state_dir}/facts/b{bucket}/v{max(vs)}")


def resolve_facts(
    spark: SparkSession, state_dir: str, at_version: int, n_buckets: int
) -> DataFrame:
    """Reader view of the copy-on-write fact store as of a mart
    version: per bucket, the newest committed version <= it."""
    parts = [
        df
        for b in range(n_buckets)
        if (df := _read_bucket(spark, state_dir, b, at_version)) is not None
    ]
    if not parts:
        raise RuntimeError(f"no facts buckets at or below v{at_version}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def seed_minmax_state(
    spark: SparkSession,
    facts: DataFrame,
    state_dir: str,
    group_col: str,
    value_col: str,
    n_buckets: int = 16,
) -> None:
    """Materialize version 0: every facts bucket plus the mart."""
    bucketed = facts.withColumn("__b", _bucket(F.col(group_col), n_buckets))
    for b in range(n_buckets):
        bucketed.filter(F.col("__b") == b).drop("__b").write.parquet(
            f"{state_dir}/facts/b{b}/v0"
        )
    facts.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    ).write.parquet(f"{state_dir}/mart/v0")


def _vacuum_buckets(
    spark, state_dir: str, n_buckets: int, keep_floor: int | None
) -> None:
    if keep_floor is None:
        return
    fs, _root, jpath_cls = _fs(spark, state_dir)
    for b in range(n_buckets):
        vs = _bucket_versions(spark, state_dir, b)
        anchored = max((v for v in vs if v <= keep_floor), default=None)
        for v in vs:
            # a version older than the bucket's anchor at the keep
            # floor can never be referenced by a retained mart version
            if anchored is not None and v < anchored:
                fs.delete(jpath_cls(f"{state_dir}/facts/b{b}/v{v}"), True)


def maintain_group_minmax_stream(
    spark: SparkSession,
    changes: DataFrame,
    state_dir: str,
    group_col: str,
    value_col: str,
    key_cols: list[str],
    n_buckets: int = 16,
    keep_last: int | None = None,
) -> DataFrame:
    """Fold a STREAM of both-images change rows
    (``snapshot_delta_images`` shape) into a continuously-maintained
    ``(group, n_rows, min_v, max_v)`` mart, keeping the fact table
    current in the copy-on-write bucket store. Requires a seeded v0
    (:func:`seed_minmax_state`). Runs with ``trigger(availableNow)``;
    returns the latest committed mart version."""
    mart_dir = state_dir + "/mart"

    def step(batch: DataFrame, epoch: int) -> None:
        prev = _latest_committed(spark, mart_dir)
        if prev is None:
            raise RuntimeError(
                "minmax maintenance requires a seeded v0 "
                "(seed_minmax_state) — the rescan path reads facts"
            )
        if prev[1] is not None and epoch <= prev[1]:
            return  # replayed epoch already committed — no-op
        nxt = prev[0] + 1
        batch = batch.persist()
        try:
            old_b = _bucket(F.col(f"old_{group_col}"), n_buckets)
            new_b = _bucket(F.col(f"new_{group_col}"), n_buckets)
            # a row's OLD image is meaningful for delete/update, its
            # NEW image for insert/update — bucket each side only
            # where it exists (a NULL group value is a legal group
            # and buckets deterministically on both sides)
            touched = sorted(
                r[0]
                for r in batch.filter(
                    F.col("change_type").isin("delete", "update")
                )
                .select(old_b.alias("b"))
                .unionByName(
                    batch.filter(
                        F.col("change_type").isin("insert", "update")
                    ).select(new_b.alias("b"))
                )
                .distinct()
                .collect()
            )
            merged_parts: list[DataFrame] = []
            for b in touched:
                cur = _read_bucket(spark, state_dir, b, prev[0])
                if cur is None:
                    raise RuntimeError(f"facts bucket b{b} missing below v{prev[0]}")
                changed_keys = batch.select(
                    *[F.col(k).alias(k) for k in key_cols]
                ).distinct()
                on = cur[key_cols[0]].eqNullSafe(changed_keys[key_cols[0]])
                for k in key_cols[1:]:
                    on = on & cur[k].eqNullSafe(changed_keys[k])
                survivors = cur.join(changed_keys, on, "left_anti")
                incoming = (
                    batch.filter(F.col("change_type").isin("insert", "update"))
                    .filter(new_b == b)
                    .select(
                        *key_cols,
                        *[
                            F.col(f"new_{c}").alias(c)
                            for c in cur.columns
                            if c not in key_cols
                        ],
                    )
                )
                nb = survivors.unionByName(incoming)
                nb.write.mode("overwrite").parquet(
                    f"{state_dir}/facts/b{b}/v{nxt}"
                )
                merged_parts.append(
                    spark.read.parquet(f"{state_dir}/facts/b{b}/v{nxt}")
                )
            # every extremum-retracted group changed in this batch, so
            # its bucket is in `touched` — the rescan facts are
            # exactly the just-merged buckets
            rescan_facts = merged_parts[0]
            for p in merged_parts[1:]:
                rescan_facts = rescan_facts.unionByName(p)
            mart = spark.read.parquet(f"{mart_dir}/{prev[3]}")
            out = ivm_apply_group_minmax(
                mart, batch, rescan_facts, group_col, value_col
            )
            out.write.mode("overwrite").parquet(f"{mart_dir}/v{nxt}_e{epoch}")
        finally:
            batch.unpersist()
        if keep_last is not None:
            committed = [t for t in _list_versions(spark, mart_dir) if t[2]]
            if len(committed) > keep_last:
                keep_floor = committed[-keep_last][0]
                fs, _r, jp = _fs(spark, mart_dir)
                for v, _e, is_c, name in _list_versions(spark, mart_dir):
                    if (is_c and v < keep_floor) or (not is_c and v < nxt):
                        fs.delete(jp(f"{mart_dir}/{name}"), True)
                _vacuum_buckets(spark, state_dir, n_buckets, keep_floor)

    q = (
        changes.writeStream.foreachBatch(step)
        .option("checkpointLocation", state_dir + "_chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest = _latest_committed(spark, mart_dir)
    if latest is None:
        raise RuntimeError("mart never materialized")
    return spark.read.parquet(f"{mart_dir}/{latest[3]}")
