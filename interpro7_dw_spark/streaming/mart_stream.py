"""Continuous maintenance of the REAL taxon-xrefs warehouse mart —
the streaming habitat of :mod:`..domain.mart_ivm`.

The batch maintainer folds one release-to-release changelog; here the
protein changelog and the match changelog arrive as ONE unified
stream (a discriminated union — two tables cannot ride two separate
foreachBatch streams and stay epoch-consistent), and every
micro-batch advances three pieces of versioned state together:

    state_dir/proteins/v<n>_e<e>/__b=<i>/   protein dim COW store
                                            (bucket = key = protein)
    state_dir/matches/v<n>_e<e>/__b=<i>/    match facts COW store
                                            (keyed match_id, bucketed
                                            by protein so the bilinear
                                            rescan reads only touched
                                            proteins' buckets)
    state_dir/mart/v<n>_e<e>/<support>/     the five count-pyramid
                                            supports, committed
                                            atomically by ONE
                                            _SUCCESS at the version
                                            root written LAST

Per-epoch cost: |micro-batch| + touched COW buckets + |supports| —
the reference's whole-DAG release rebuild
(`/root/reference/interpro7dw/cli.py:101-986`) becomes a standing
query. Epoch idempotence, ``_SUCCESS`` gating, ``keep_last`` vacuum
and the COW machinery are all shared with :mod:`.ivm_stream` /
:mod:`.minmax_stream`; the streamed result equals the batch
maintainer on the same total changelog, which equals the full
rebuild of the final snapshot (the ``z_stream_ivm_mart`` oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..domain.mart_ivm import (
    SUPPORT_NAMES,
    maintain_taxon_supports,
    seed_taxon_supports,
    taxon_mart_from_supports,
)
from .ivm_stream import _fs, _latest_committed, _list_versions, _vacuum
from .minmax_stream import (
    _bucket,
    _bucket_sources,
    _read_sources,
    _vacuum_facts,
    cow_apply_images,
)

_PROTEIN_COLS = ["protein_acc", "change_type", "old_tax_id", "new_tax_id"]
_MATCH_COLS = [
    "match_id", "change_type",
    "old_protein_acc", "old_signature_acc", "old_database",
    "new_protein_acc", "new_signature_acc", "new_database",
]


def unify_changelogs(delta_p: DataFrame, delta_m: DataFrame) -> DataFrame:
    """Interleave the protein and match changelogs into the one
    discriminated stream shape the maintainer consumes (``src`` =
    'protein' | 'match'; the other table's columns ride NULL)."""
    p = delta_p.select(
        F.lit("protein").alias("src"),
        F.lit(None).cast("long").alias("match_id"),
        *_PROTEIN_COLS,
        *[F.lit(None).cast("string").alias(c) for c in _MATCH_COLS[2:]],
    )
    m = delta_m.select(
        F.lit("match").alias("src"),
        "match_id",
        F.lit(None).cast("string").alias("protein_acc"),
        "change_type",
        F.lit(None).cast("string").alias("old_tax_id"),
        F.lit(None).cast("string").alias("new_tax_id"),
        *_MATCH_COLS[2:],
    )
    return p.unionByName(m)


def seed_mart_state(
    spark: SparkSession,
    proteins: DataFrame,            # protein_acc, tax_id
    matches: DataFrame,             # match_id, protein_acc, signature_acc, database
    protein_proteomes: DataFrame,
    protein_structures: DataFrame,
    taxon_ancestors: DataFrame,
    state_dir: str,
    n_buckets: int = 16,
) -> None:
    """Materialize version 0 of all three state pieces from the base
    snapshot (the one full rebuild a mart ever needs)."""
    proteins.withColumn(
        "__b", _bucket(F.col("protein_acc"), n_buckets)
    ).write.partitionBy("__b").parquet(f"{state_dir}/proteins/v0")
    matches.withColumn(
        "__b", _bucket(F.col("protein_acc"), n_buckets)
    ).write.partitionBy("__b").parquet(f"{state_dir}/matches/v0")
    sup = seed_taxon_supports(
        proteins,
        matches.drop("match_id"),
        protein_proteomes,
        protein_structures,
        taxon_ancestors,
    )
    for name in SUPPORT_NAMES:
        sup[name].write.parquet(f"{state_dir}/mart/v0/{name}")
    _commit_marker(spark, f"{state_dir}/mart/v0")
    spark.catalog.clearCache()  # drop the seed's spine/matched persists


def _commit_marker(spark: SparkSession, version_dir: str) -> None:
    """The atomic commit for a multi-directory version: the root
    ``_SUCCESS`` is created LAST, after every support's own write
    finished — readers (`_list_versions`) gate on it."""
    fs, _root, jpath_cls = _fs(spark, version_dir)
    fs.create(jpath_cls(f"{version_dir}/_SUCCESS"), True).close()


def read_mart_supports(
    spark: SparkSession, state_dir: str, version_name: str
) -> dict[str, DataFrame]:
    return {
        name: spark.read.parquet(f"{state_dir}/mart/{version_name}/{name}")
        for name in SUPPORT_NAMES
    }


def maintain_taxon_mart_stream(
    spark: SparkSession,
    changes: DataFrame,             # streaming DF in unify_changelogs shape
    state_dir: str,
    protein_proteomes: DataFrame,
    protein_structures: DataFrame,
    taxon_ancestors: DataFrame,
    n_buckets: int = 16,
    keep_last: int | None = None,
) -> DataFrame:
    """Drain the unified changelog with ``trigger(availableNow)``,
    folding each micro-batch through the batch maintainer against the
    COW-stored protein/match state; returns the RENDERED mart
    (taxon_xrefs_mart schema) at the latest committed version.

    Bilinear-rescan pruning is physical here: the match store is
    bucketed by protein, so ``M_old`` under the protein delta's
    touched proteins is a partition-pruned read of just their
    buckets, and ``P_new`` under the match delta's proteins likewise.
    A replayed epoch (at-least-once foreachBatch) no-ops exactly as
    in :mod:`.ivm_stream`."""
    mart_dir = f"{state_dir}/mart"
    p_dir = f"{state_dir}/proteins"
    m_dir = f"{state_dir}/matches"

    def step(batch: DataFrame, epoch: int) -> None:
        prev = _latest_committed(spark, mart_dir)
        if prev is None:
            raise RuntimeError(
                "mart maintenance requires a seeded v0 (seed_mart_state)"
            )
        if prev[1] is not None and epoch <= prev[1]:
            return  # replayed epoch already committed — no-op
        nxt = prev[0] + 1
        batch = batch.persist()
        try:
            dp = batch.filter(F.col("src") == "protein").select(*_PROTEIN_COLS)
            dm = batch.filter(F.col("src") == "match").select(*_MATCH_COLS)

            # advance both COW stores (one partitioned write each)
            cow_apply_images(
                spark, p_dir, dp, "protein_acc", ["protein_acc"],
                n_buckets, prev[0], nxt, epoch,
            )
            cow_apply_images(
                spark, m_dir, dm, "protein_acc", ["match_id"],
                n_buckets, prev[0], nxt, epoch,
            )

            # pruned bilinear rescan sources: P_new under dm's
            # proteins (from the just-written protein version),
            # M_old under dp's proteins (from the PREVIOUS match
            # version) — both partition-pruned bucket reads
            dm_buckets = sorted(
                r[0]
                for r in dm.select(
                    F.explode(
                        F.array(
                            _bucket(F.col("old_protein_acc"), n_buckets),
                            _bucket(F.col("new_protein_acc"), n_buckets),
                        )
                    ).alias("b")
                )
                .distinct()
                .collect()
            )
            dp_buckets = sorted(
                r[0]
                for r in dp.select(
                    _bucket(F.col("protein_acc"), n_buckets).alias("b")
                )
                .distinct()
                .collect()
            )
            p_new = _read_sources(
                spark, p_dir, _bucket_sources(spark, p_dir, nxt, dm_buckets)
            )
            m_old = _read_sources(
                spark, m_dir, _bucket_sources(spark, m_dir, prev[0], dp_buckets)
            )
            if p_new is None:
                p_new = dp.select(
                    "protein_acc", F.col("new_tax_id").alias("tax_id")
                ).limit(0)
            if m_old is None:
                m_old = dm.select(
                    F.col("new_protein_acc").alias("protein_acc"),
                    F.col("new_signature_acc").alias("signature_acc"),
                    F.col("new_database").alias("database"),
                ).limit(0)

            sup = maintain_taxon_supports(
                read_mart_supports(spark, state_dir, prev[3]),
                dp,
                dm,
                p_new,
                m_old.drop("match_id"),
                protein_proteomes,
                protein_structures,
                taxon_ancestors,
            )
            vdir = f"{mart_dir}/v{nxt}_e{epoch}"
            for name in SUPPORT_NAMES:
                sup[name].write.mode("overwrite").parquet(f"{vdir}/{name}")
            _commit_marker(spark, vdir)
        finally:
            batch.unpersist()
            # the maintainer's internal persists (dp_lift, d_matched)
            # are epoch-scoped; the differ-wide clearCache convention
            # applies per micro-batch here
            spark.catalog.clearCache()
        _vacuum(spark, mart_dir, nxt, keep_last)
        keep_floor = None
        if keep_last is not None:
            committed = [t for t in _list_versions(spark, mart_dir) if t[2]]
            if committed:
                keep_floor = committed[0][0]
        _vacuum_facts(spark, p_dir, keep_floor, nxt)
        _vacuum_facts(spark, m_dir, keep_floor, nxt)

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
    return taxon_mart_from_supports(
        read_mart_supports(spark, state_dir, latest[3])
    )


def read_taxon_mart_version(
    spark: SparkSession,
    state_dir: str,
    version: int | None = None,
    epoch: int | None = None,
) -> DataFrame:
    """Time travel over the maintained warehouse mart: render the
    supports of a specific committed version, or the newest committed
    version applied at-or-before ``epoch`` (the as-of read against
    the changelog clock), or the latest (both None). Same
    ``_SUCCESS``-gated isolation as
    ``ivm_stream.read_mart_version`` — the atomic per-version commit
    marker means a reader can never see a torn set of supports; the
    rendered output is the exact taxon_xrefs_mart schema AS OF that
    release point, which is what the reference's per-release mart
    dumps would have been."""
    mart_dir = f"{state_dir}/mart"
    versions = [t for t in _list_versions(spark, mart_dir) if t[2]]
    if not versions:
        raise KeyError(f"no committed versions under {mart_dir!r}")
    if version is not None:
        match = [t for t in versions if t[0] == version]
        if not match:
            raise KeyError(f"version {version} not committed under {mart_dir!r}")
        pick = match[0]
    elif epoch is not None:
        match = [t for t in versions if t[1] is not None and t[1] <= epoch]
        if not match:
            raise KeyError(f"no committed version at or before epoch {epoch}")
        pick = match[-1]
    else:
        pick = versions[-1]
    return taxon_mart_from_supports(
        read_mart_supports(spark, state_dir, pick[3])
    )
