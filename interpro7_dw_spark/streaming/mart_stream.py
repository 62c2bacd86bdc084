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
    state_dir/mart/v<n>_e<e>/<support>/     the AGGREGATE-SIZED
                                            count-pyramid supports
                                            (taxonomy / proteome /
                                            structure / signature
                                            cardinality), rewritten
                                            whole per version and
                                            committed atomically by
                                            ONE _SUCCESS at the
                                            version root written LAST
    state_dir/sup_cow/<support>/v<n>_e<e>/__b=<i>/
                                            the FACTS-SCALE supports
                                            (sup_prot_db ≈ proteins ×
                                            lineage × dbs) in the
                                            same COW bucket layout as
                                            the fact stores: only the
                                            delta-touched buckets are
                                            read, merged and
                                            rewritten per epoch

Per-epoch cost: |micro-batch| + touched COW buckets (facts AND
facts-scale supports) + the aggregate-sized supports — never
Θ(|support|) for the big ones; the reference's whole-DAG release
rebuild (`/root/reference/interpro7dw/cli.py:101-986`) becomes a
standing query. Epoch idempotence, ``_SUCCESS`` gating, ``keep_last`` vacuum
and the COW machinery are all shared with :mod:`.ivm_stream` /
:mod:`.minmax_stream`; the streamed result equals the batch
maintainer on the same total changelog, which equals the full
rebuild of the final snapshot (the ``z_stream_ivm_mart`` oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import engine_cache_scope
from ..domain.mart_ivm import (
    BUCKETED_SUPPORTS,
    ENTRY_BUCKETED_SUPPORTS,
    ENTRY_LEVEL2_ROLLUPS,
    ENTRY_SUPPORT_KEYS,
    ENTRY_SUPPORT_NAMES,
    LEVEL2_ROLLUPS,
    SUPPORT_KEYS,
    SUPPORT_NAMES,
    apply_count_delta,
    apply_count_delta_with_transitions,
    entry_mart_from_supports,
    entry_support_deltas,
    level2_names,
    seed_entry_supports,
    seed_taxon_supports,
    taxon_mart_from_supports,
    taxon_support_deltas,
)
from .ivm_stream import _fs, _latest_committed, _list_versions, _pick_version, _vacuum
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
    snapshot (the one full rebuild a mart ever needs) — plus the
    protein-keyed STATIC dims in the same bucket layout, so each
    epoch's bilinear delta joins read only the delta-touched buckets
    of them instead of the whole (protein-scale at 100 TB) relations
    (the PERF.md r14 footnote, closed)."""
    proteins.withColumn(
        "__b", _bucket(F.col("protein_acc"), n_buckets)
    ).write.partitionBy("__b").parquet(f"{state_dir}/proteins/v0")
    matches.withColumn(
        "__b", _bucket(F.col("protein_acc"), n_buckets)
    ).write.partitionBy("__b").parquet(f"{state_dir}/matches/v0")
    _seed_static_dim(state_dir, "pp", protein_proteomes, n_buckets)
    _seed_static_dim(state_dir, "ps", protein_structures, n_buckets)
    sup = seed_taxon_supports(
        proteins,
        matches.drop("match_id"),
        protein_proteomes,
        protein_structures,
        taxon_ancestors,
    )
    _seed_supports(
        spark, state_dir, sup, SUPPORT_NAMES, BUCKETED_SUPPORTS, n_buckets
    )


def _seed_static_dim(
    state_dir: str, name: str, dim: DataFrame, n_buckets: int
) -> None:
    """Write a protein-keyed static dim once, bucketed like the fact
    stores (``dims/<name>/v0``) — it never advances, so every epoch's
    delta join against it is a partition-pruned read of the delta's
    touched buckets."""
    dim.withColumn(
        "__b", _bucket(F.col("protein_acc"), n_buckets)
    ).write.partitionBy("__b").parquet(f"{state_dir}/dims/{name}/v0")


def _read_static_dim(
    spark: SparkSession,
    state_dir: str,
    name: str,
    buckets: list[int],
    fallback: DataFrame,
) -> DataFrame:
    """The bucketed static dim pruned to ``buckets`` — correct for any
    delta join keyed by protein, because the pruned set is a superset
    of the delta's proteins (rows outside them are dropped by the join
    anyway). States seeded before the dim stores existed fall back to
    the caller-passed whole relation (the pre-r14 behavior)."""
    dim_dir = f"{state_dir}/dims/{name}"
    fs, _r, jp = _fs(spark, dim_dir)
    if not fs.exists(jp(f"{dim_dir}/v0")):
        return fallback
    df = _read_sources(
        spark, dim_dir, _bucket_sources(spark, dim_dir, 0, buckets)
    )
    return df if df is not None else fallback.limit(0)


def _seed_supports(
    spark: SparkSession,
    state_dir: str,
    sup: dict[str, DataFrame],
    names: tuple,
    bucketed: dict[str, str],
    n_buckets: int,
) -> None:
    """v0 of the support state: aggregate-sized supports as plain
    parquet under the mart version root, facts-scale ones as bucketed
    COW stores (each with a ``_schema.json`` artifact so an emptied or
    seed-empty store can still be served with its REAL schema); the
    mart root ``_SUCCESS`` written LAST commits all."""
    for name in names:
        if name in bucketed:
            sup_dir = f"{state_dir}/sup_cow/{name}"
            sup[name].withColumn(
                "__b", _bucket(F.col(bucketed[name]), n_buckets)
            ).write.partitionBy("__b").parquet(f"{sup_dir}/v0")
            _write_schema_artifact(spark, sup_dir, sup[name].schema)
        else:
            sup[name].write.parquet(f"{state_dir}/mart/v0/{name}")
    _commit_marker(spark, f"{state_dir}/mart/v0")


def _write_schema_artifact(spark: SparkSession, sup_dir: str, schema) -> None:
    """Persist a COW store's logical schema (keys + count, WITHOUT the
    ``__b`` partition column) beside its version directories: the
    empty-store read fallback derives its served schema from this
    artifact instead of guessing column types."""
    fs, _root, jp = _fs(spark, sup_dir)
    out = fs.create(jp(f"{sup_dir}/_schema.json"), True)
    out.write(bytearray(schema.json().encode("utf-8")))
    out.close()


def _read_schema_artifact(spark: SparkSession, sup_dir: str):
    """The stored schema of :func:`_write_schema_artifact`, or None
    for stores seeded before the artifact existed."""
    import json as _json

    from pyspark.sql.types import StructType

    fs, _root, jp = _fs(spark, sup_dir)
    p = jp(f"{sup_dir}/_schema.json")
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return StructType.fromJson(_json.loads(text))


def cow_apply_count_delta(
    spark: SparkSession,
    sup_dir: str,
    delta: DataFrame,
    keys: list[str],
    bucket_col: str,
    n_buckets: int,
    prev_version: int,
    next_version: int,
    epoch: int,
    roll_keys: list[str] | None = None,
) -> DataFrame | None:
    """Merge a SIGNED count delta (``keys`` + ``s``) into a COW-
    bucketed count support: resolve ONLY the delta-touched buckets at
    ``prev_version``, run :func:`..domain.mart_ivm.apply_count_delta`
    on those rows alone, and write them as the new version in ONE
    ``partitionBy`` action (explicit empty dirs for fully-emptied
    touched buckets, exactly like ``cow_apply_images``). Untouched
    buckets are never read, shuffled or rewritten — they stay served
    by older versions through the same per-bucket manifest resolution
    as the fact stores — so per-epoch support IO is
    Θ(|touched buckets|), not Θ(|support|) (the r12 verdict's one
    scale finding, measured in tests/test_mart_ivm.py +
    PERF.md r13).

    With ``roll_keys`` the merge runs through
    ``apply_count_delta_with_transitions`` and RETURNS the enter/exit
    transitions (``roll_keys`` + ``s``) — the complete signed delta of
    the level-2 rollup, complete because untouched buckets cannot
    transition. The transitions branch off the same persisted merge
    plan the write materializes, so emitting them costs no second
    bucket read; the caller must consume them inside the same
    ``engine_cache_scope``."""
    touched = sorted(
        r[0]
        for r in delta.select(
            _bucket(F.col(bucket_col), n_buckets).alias("b")
        )
        .distinct()
        .collect()
    )
    served = _bucket_sources(spark, sup_dir, prev_version, touched)
    cur = _read_sources(spark, sup_dir, served)
    if cur is None:
        cur = (
            delta.select(*keys)
            .limit(0)
            .withColumn("n", F.lit(0).cast("long"))
        )
    transitions = None
    if roll_keys is None:
        merged = apply_count_delta(cur, delta, keys)
    else:
        merged, transitions = apply_count_delta_with_transitions(
            cur, delta, keys, roll_keys
        )
    ver = f"{sup_dir}/v{next_version}_e{epoch}"
    merged.withColumn(
        "__b", _bucket(F.col(bucket_col), n_buckets)
    ).write.partitionBy("__b").mode("overwrite").parquet(ver)
    fs, _r, jp = _fs(spark, sup_dir)
    for b in touched:
        fs.mkdirs(jp(f"{ver}/__b={b}"))
    return transitions


def _commit_marker(spark: SparkSession, version_dir: str) -> None:
    """The atomic commit for a multi-directory version: the root
    ``_SUCCESS`` is created LAST, after every support's own write
    finished — readers (`_list_versions`) gate on it."""
    fs, _root, jpath_cls = _fs(spark, version_dir)
    fs.create(jpath_cls(f"{version_dir}/_SUCCESS"), True).close()


def read_mart_supports(
    spark: SparkSession, state_dir: str, version_name: str
) -> dict[str, DataFrame]:
    """All five supports AS OF a committed mart version: aggregate-
    sized ones from the version directory itself, facts-scale ones
    resolved per bucket from their COW stores at that version number
    (a bucket not rewritten at v_n is served by the newest older
    version carrying it — the fact-store manifest discipline)."""
    return _read_supports(
        spark, state_dir, version_name, SUPPORT_NAMES, BUCKETED_SUPPORTS,
        SUPPORT_KEYS,
    )


def _read_supports(
    spark: SparkSession,
    state_dir: str,
    version_name: str,
    names: tuple,
    bucketed: dict[str, str],
    support_keys: dict[str, list[str]],
) -> dict[str, DataFrame]:
    ver = int(version_name[1:].partition("_e")[0])
    out: dict[str, DataFrame] = {}
    for name in names:
        if name in bucketed:
            sup_dir = f"{state_dir}/sup_cow/{name}"
            df = _read_sources(
                spark, sup_dir, _bucket_sources(spark, sup_dir, ver)
            )
            if df is None:
                # a LEGITIMATELY EMPTY support (e.g. a seed release
                # with zero matches): the partitioned write produced
                # no data files to infer a schema from, so serve the
                # schema from the artifact the seed wrote beside the
                # store (_schema.json); only a store seeded before
                # the artifact existed falls back to the historical
                # all-string-keys derivation
                schema = _read_schema_artifact(spark, sup_dir)
                if schema is None:
                    schema = (
                        ", ".join(
                            f"{k} string" for k in support_keys[name]
                        )
                        + ", n long"
                    )
                df = spark.createDataFrame([], schema)
            out[name] = df
        else:
            out[name] = spark.read.parquet(
                f"{state_dir}/mart/{version_name}/{name}"
            )
    return out


def _advance_supports(
    spark: SparkSession,
    state_dir: str,
    deltas: dict[str, DataFrame],
    prev: tuple,
    nxt: int,
    epoch: int,
    names: tuple,
    support_keys: dict[str, list[str]],
    bucketed: dict[str, str],
    n_buckets: int,
    rollups: dict[str, tuple[str, list[str]]] | None = None,
) -> None:
    """Fold one epoch's signed support deltas into version ``nxt``:
    aggregate-sized supports merge whole against the previous version
    and rewrite whole under the mart version root; facts-scale ones
    COW-merge only their delta-touched buckets, EMITTING enter/exit
    transitions when they feed a level-2 rollup — those transitions
    are then the entire delta of the (aggregate-sized) level-2
    support, which rewrites whole under the version root like any
    other aggregate-sized support. The mart-root ``_SUCCESS``,
    written LAST, commits every piece atomically."""
    rollups = rollups or {}
    l2 = level2_names(rollups)
    vdir = f"{state_dir}/mart/v{nxt}_e{epoch}"
    for name in names:
        keys = support_keys[name]
        if name in l2:
            continue  # maintained from its level-1's transitions below
        if name in bucketed:
            trans = cow_apply_count_delta(
                spark, f"{state_dir}/sup_cow/{name}", deltas[name], keys,
                bucketed[name], n_buckets, prev[0], nxt, epoch,
                roll_keys=rollups[name][1] if name in rollups else None,
            )
            if name in rollups:
                l2_name = rollups[name][0]
                cur = spark.read.parquet(
                    f"{state_dir}/mart/{prev[3]}/{l2_name}"
                )
                apply_count_delta(
                    cur, trans, support_keys[l2_name]
                ).write.mode("overwrite").parquet(f"{vdir}/{l2_name}")
        else:
            cur = spark.read.parquet(f"{state_dir}/mart/{prev[3]}/{name}")
            apply_count_delta(cur, deltas[name], keys).write.mode(
                "overwrite"
            ).parquet(f"{vdir}/{name}")
    _commit_marker(spark, vdir)


def _discover_touched_buckets(
    batch: DataFrame, dim_src: str, n_buckets: int
) -> tuple[list[int], list[int]]:
    """EVERY bucket set one mart epoch needs, in ONE driver job (the
    r13 verdict's per-epoch job-count finding): the unified changelog
    carries the dimension rows (``src == dim_src``, protein-keyed
    unprefixed) and the fact rows (both-images ``old_/new_protein_acc``);
    each row contributes its exact change-type-filtered buckets tagged
    'd' (dimension) or 'f' (facts), and one distinct-collect returns
    both sets. The sets are EXACT — identical to what
    ``cow_apply_images``'s own discovery would compute per store — so
    they double as the stores' ``touched`` lists AND the bilinear
    rescans' partition prunes."""
    ct = F.col("change_type")

    def entry(tag: str, b: Column) -> Column:
        return F.struct(F.lit(tag).alias("t"), b.alias("b"))

    tagged = F.when(
        F.col("src") == dim_src,
        F.array(entry("d", _bucket(F.col("protein_acc"), n_buckets))),
    ).otherwise(
        F.filter(
            F.array(
                F.when(
                    ct.isin("delete", "update"),
                    entry("f", _bucket(F.col("old_protein_acc"), n_buckets)),
                ),
                F.when(
                    ct.isin("insert", "update"),
                    entry("f", _bucket(F.col("new_protein_acc"), n_buckets)),
                ),
            ),
            lambda x: x.isNotNull(),
        )
    )
    rows = (
        batch.select(F.explode(tagged).alias("tb"))
        .select(F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
        .distinct()
        .collect()
    )
    dim = sorted(r.b for r in rows if r.t == "d")
    fact = sorted(r.b for r in rows if r.t == "f")
    return dim, fact


def apply_taxon_mart_epoch(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,               # ONE epoch in unify_changelogs shape
    epoch: int,
    protein_proteomes: DataFrame,
    protein_structures: DataFrame,
    taxon_ancestors: DataFrame,
    n_buckets: int = 16,
    keep_last: int | None = None,
) -> None:
    """Fold one changelog epoch into the COW-stored taxon-mart state —
    the shared epoch body of the STREAMING habitat (each foreachBatch
    micro-batch) and the one-shot BATCH habitat
    (:func:`maintain_taxon_mart_batch`). Replay-guarded by ``epoch``
    against the last committed version; all bucket discovery runs as
    ONE driver job (:func:`_discover_touched_buckets`)."""
    mart_dir = f"{state_dir}/mart"
    p_dir = f"{state_dir}/proteins"
    m_dir = f"{state_dir}/matches"
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
        dp_buckets, dm_buckets = _discover_touched_buckets(
            batch, "protein", n_buckets
        )

        # advance both COW stores (one partitioned write each; the
        # exact touched sets were discovered above)
        cow_apply_images(
            spark, p_dir, dp, "protein_acc", ["protein_acc"],
            n_buckets, prev[0], nxt, epoch, touched=dp_buckets,
        )
        cow_apply_images(
            spark, m_dir, dm, "protein_acc", ["match_id"],
            n_buckets, prev[0], nxt, epoch, touched=dm_buckets,
        )

        # pruned bilinear rescan sources: P_new under dm's proteins
        # (from the just-written protein version), M_old under dp's
        # proteins (from the PREVIOUS match version) — both
        # partition-pruned bucket reads
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

        # the protein-keyed static dims join the delta on protein, so
        # only the delta-touched buckets of them can contribute —
        # partition-pruned reads of the seed-time bucketed dim stores
        pp_use = _read_static_dim(
            spark, state_dir, "pp", dp_buckets, protein_proteomes
        )
        ps_use = _read_static_dim(
            spark, state_dir, "ps", dp_buckets, protein_structures
        )

        # the delta computation's owned persists (dp_lift, d_matched)
        # are epoch-scoped: the scope releases them once every
        # support consumed them
        with engine_cache_scope():
            deltas = taxon_support_deltas(
                dp,
                dm,
                p_new,
                m_old.drop("match_id"),
                pp_use,
                ps_use,
                taxon_ancestors,
            )
            _advance_supports(
                spark, state_dir, deltas, prev, nxt, epoch,
                SUPPORT_NAMES, SUPPORT_KEYS, BUCKETED_SUPPORTS, n_buckets,
                LEVEL2_ROLLUPS,
            )
    finally:
        batch.unpersist()
    _vacuum(spark, mart_dir, nxt, keep_last)
    keep_floor = None
    if keep_last is not None:
        committed = [t for t in _list_versions(spark, mart_dir) if t[2]]
        if committed:
            keep_floor = committed[0][0]
    _vacuum_facts(spark, p_dir, keep_floor, nxt)
    _vacuum_facts(spark, m_dir, keep_floor, nxt)
    for name in BUCKETED_SUPPORTS:
        _vacuum_facts(spark, f"{state_dir}/sup_cow/{name}", keep_floor, nxt)


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
    folding each micro-batch through the bilinear delta rule against
    the COW-stored protein/match state; returns the RENDERED mart
    (taxon_xrefs_mart schema) at the latest committed version.

    Pruning is physical at BOTH ends here: the match store is
    bucketed by protein, so ``M_old`` under the protein delta's
    touched proteins is a partition-pruned read of just their
    buckets (``P_new`` under the match delta's proteins likewise),
    and the facts-scale ``sup_prot_db`` support lives in its own COW
    bucket store, so the count merge reads and rewrites only the
    delta-touched buckets — per-epoch support IO tracks |touched
    buckets|, never |support| — while its transitions maintain the
    level-2 ``sup_db`` the render reads. A replayed epoch
    (at-least-once foreachBatch) no-ops exactly as in
    :mod:`.ivm_stream`."""

    def step(batch: DataFrame, epoch: int) -> None:
        apply_taxon_mart_epoch(
            spark, state_dir, batch, epoch,
            protein_proteomes, protein_structures, taxon_ancestors,
            n_buckets, keep_last,
        )

    q = (
        changes.writeStream.foreachBatch(step)
        .option("checkpointLocation", state_dir + "_chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest = _latest_committed(spark, f"{state_dir}/mart")
    if latest is None:
        raise RuntimeError("mart never materialized")
    return taxon_mart_from_supports(
        read_mart_supports(spark, state_dir, latest[3])
    )


def maintain_taxon_mart_batch(
    spark: SparkSession,
    state_dir: str,
    delta_p: DataFrame,
    delta_m: DataFrame,
    protein_proteomes: DataFrame,
    protein_structures: DataFrame,
    taxon_ancestors: DataFrame,
    n_buckets: int = 16,
    keep_last: int | None = None,
) -> DataFrame:
    """One-shot BATCH release epoch against the SAME COW-stored state
    the stream uses — the batch maintainer pointed at the COW store
    (r13 verdict item 3): the facts-scale ``sup_prot_db`` merge is a
    partition-pruned read of the delta-touched buckets ONLY, read
    once, instead of the storeless pruned merge's two full
    column-pruned support scans (broadcast semi + anti branches).
    Seed with :func:`seed_mart_state`; returns the rendered mart at
    the new committed version. The same changelog folded here or
    through the stream (in any micro-batch partitioning) converges to
    identical supports."""
    mart_dir = f"{state_dir}/mart"
    prev = _latest_committed(spark, mart_dir)
    if prev is None:
        raise RuntimeError(
            "mart maintenance requires a seeded v0 (seed_mart_state)"
        )
    epoch = (prev[1] if prev[1] is not None else -1) + 1
    apply_taxon_mart_epoch(
        spark, state_dir, unify_changelogs(delta_p, delta_m), epoch,
        protein_proteomes, protein_structures, taxon_ancestors,
        n_buckets, keep_last,
    )
    latest = _latest_committed(spark, mart_dir)
    return taxon_mart_from_supports(
        read_mart_supports(spark, state_dir, latest[3])
    )


# ---------------------------------------------------------------------------
# The ENTRY pyramid's streaming habitat — the reference's single worst
# release cost (export-entry2xrefs <=24h/100GB,
# /root/reference/interpro7dw/cli.py:355) as a STANDING QUERY. Same
# discriminated-stream / COW-store / atomic-version machinery as the
# taxon mart above: the protein->entry ASSIGNMENT changelog (keyed
# pe_id, bucketed by protein) and the protein-dim changelog interleave
# in one stream; the three assignment-scale supports (sup_ep, sup_etp,
# sup_eep) live in COW bucket stores, the two aggregate-sized ones
# rewrite whole per version.

_EPROT_COLS = ["protein_acc", "change_type", "old_tax_id", "new_tax_id"]
_ASSIGN_COLS = [
    "pe_id", "change_type",
    "old_protein_acc", "old_entry_acc",
    "new_protein_acc", "new_entry_acc",
]


def unify_entry_changelogs(delta_pe: DataFrame, delta_p: DataFrame) -> DataFrame:
    """Interleave the assignment and protein-dim changelogs into one
    discriminated stream (``src`` = 'assign' | 'protein')."""
    a = delta_pe.select(
        F.lit("assign").alias("src"),
        "pe_id",
        F.lit(None).cast("string").alias("protein_acc"),
        "change_type",
        F.lit(None).cast("string").alias("old_tax_id"),
        F.lit(None).cast("string").alias("new_tax_id"),
        *_ASSIGN_COLS[2:],
    )
    p = delta_p.select(
        F.lit("protein").alias("src"),
        F.lit(None).cast("long").alias("pe_id"),
        *_EPROT_COLS,
        *[F.lit(None).cast("string").alias(c) for c in _ASSIGN_COLS[2:]],
    )
    return a.unionByName(p)


def seed_entry_mart_state(
    spark: SparkSession,
    protein_taxa: DataFrame,        # protein_acc, tax_id
    protein_entries: DataFrame,     # pe_id, protein_acc, entry_acc
    protein_proteomes: DataFrame,
    protein_structures: DataFrame,
    protein_ecs: DataFrame,
    state_dir: str,
    n_buckets: int = 16,
) -> None:
    """Version 0 of the entry-mart state: both fact stores bucketed by
    protein, the protein-keyed static dims in the same bucket layout
    (epoch delta joins read only touched buckets of them), and the
    entry supports per their storage discipline."""
    protein_taxa.withColumn(
        "__b", _bucket(F.col("protein_acc"), n_buckets)
    ).write.partitionBy("__b").parquet(f"{state_dir}/proteins/v0")
    protein_entries.withColumn(
        "__b", _bucket(F.col("protein_acc"), n_buckets)
    ).write.partitionBy("__b").parquet(f"{state_dir}/assignments/v0")
    _seed_static_dim(state_dir, "pp", protein_proteomes, n_buckets)
    _seed_static_dim(state_dir, "ps", protein_structures, n_buckets)
    _seed_static_dim(state_dir, "pec", protein_ecs, n_buckets)
    sup = seed_entry_supports(
        protein_entries.drop("pe_id"),
        protein_taxa,
        protein_proteomes,
        protein_structures,
        protein_ecs,
    )
    _seed_supports(
        spark, state_dir, sup, ENTRY_SUPPORT_NAMES,
        ENTRY_BUCKETED_SUPPORTS, n_buckets,
    )


def read_entry_mart_supports(
    spark: SparkSession, state_dir: str, version_name: str
) -> dict[str, DataFrame]:
    return _read_supports(
        spark, state_dir, version_name, ENTRY_SUPPORT_NAMES,
        ENTRY_BUCKETED_SUPPORTS, ENTRY_SUPPORT_KEYS,
    )


def maintain_entry_mart_stream(
    spark: SparkSession,
    changes: DataFrame,             # streaming DF in unify_entry_changelogs shape
    state_dir: str,
    protein_proteomes: DataFrame,
    protein_structures: DataFrame,
    protein_ecs: DataFrame,
    entry_go: DataFrame | None = None,
    n_buckets: int = 16,
    keep_last: int | None = None,
) -> DataFrame:
    """Drain the unified assignment+protein changelog with
    ``trigger(availableNow)``; each epoch advances the protein-dim
    and assignment COW stores, folds the bilinear support deltas
    (assignment-scale supports COW-merged into touched buckets only),
    and commits atomically. Returns the RENDERED entry mart
    (entry_xrefs_mart schema, EC coverage filter + GO lists applied
    to the MAINTAINED counts) at the latest committed version. Same
    epoch-idempotent replay guard, ``_SUCCESS`` gating and
    ``keep_last`` vacuum as the taxon maintainer."""
    def step(batch: DataFrame, epoch: int) -> None:
        apply_entry_mart_epoch(
            spark, state_dir, batch, epoch,
            protein_proteomes, protein_structures, protein_ecs,
            n_buckets, keep_last,
        )

    q = (
        changes.writeStream.foreachBatch(step)
        .option("checkpointLocation", state_dir + "_chk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest = _latest_committed(spark, f"{state_dir}/mart")
    if latest is None:
        raise RuntimeError("entry mart never materialized")
    return entry_mart_from_supports(
        read_entry_mart_supports(spark, state_dir, latest[3]),
        entry_go=entry_go,
    )


def apply_entry_mart_epoch(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,               # ONE epoch in unify_entry_changelogs shape
    epoch: int,
    protein_proteomes: DataFrame,
    protein_structures: DataFrame,
    protein_ecs: DataFrame,
    n_buckets: int = 16,
    keep_last: int | None = None,
) -> None:
    """Fold one changelog epoch into the COW-stored entry-mart state —
    the shared epoch body of the streaming habitat and the one-shot
    batch habitat (:func:`maintain_entry_mart_batch`); same replay
    guard, one-job bucket discovery, and atomic version commit as
    :func:`apply_taxon_mart_epoch`."""
    mart_dir = f"{state_dir}/mart"
    p_dir = f"{state_dir}/proteins"
    a_dir = f"{state_dir}/assignments"
    prev = _latest_committed(spark, mart_dir)
    if prev is None:
        raise RuntimeError(
            "entry-mart maintenance requires a seeded v0 "
            "(seed_entry_mart_state)"
        )
    if prev[1] is not None and epoch <= prev[1]:
        return  # replayed epoch already committed — no-op
    nxt = prev[0] + 1
    batch = batch.persist()
    try:
        dp = batch.filter(F.col("src") == "protein").select(*_EPROT_COLS)
        dpe = batch.filter(F.col("src") == "assign").select(*_ASSIGN_COLS)
        dp_buckets, dpe_buckets = _discover_touched_buckets(
            batch, "protein", n_buckets
        )

        cow_apply_images(
            spark, p_dir, dp, "protein_acc", ["protein_acc"],
            n_buckets, prev[0], nxt, epoch, touched=dp_buckets,
        )
        cow_apply_images(
            spark, a_dir, dpe, "protein_acc", ["pe_id"],
            n_buckets, prev[0], nxt, epoch, touched=dpe_buckets,
        )

        p_new = _read_sources(
            spark, p_dir, _bucket_sources(spark, p_dir, nxt, dpe_buckets)
        )
        pe_old = _read_sources(
            spark, a_dir, _bucket_sources(spark, a_dir, prev[0], dp_buckets)
        )
        if p_new is None:
            p_new = dp.select(
                "protein_acc", F.col("new_tax_id").alias("tax_id")
            ).limit(0)
        if pe_old is None:
            pe_old = dpe.select(
                F.col("new_protein_acc").alias("protein_acc"),
                F.col("new_entry_acc").alias("entry_acc"),
            ).limit(0)
        else:
            pe_old = pe_old.drop("pe_id")

        # static dims pruned to the assignment delta's touched buckets
        # (entry_support_deltas joins each against dpe on protein)
        pp_use = _read_static_dim(
            spark, state_dir, "pp", dpe_buckets, protein_proteomes
        )
        ps_use = _read_static_dim(
            spark, state_dir, "ps", dpe_buckets, protein_structures
        )
        pec_use = _read_static_dim(
            spark, state_dir, "pec", dpe_buckets, protein_ecs
        )

        # epoch-scoped owned persists (dpe) released by the scope
        with engine_cache_scope():
            deltas = entry_support_deltas(
                dpe,
                dp,
                p_new,
                pe_old,
                pp_use,
                ps_use,
                pec_use,
            )
            _advance_supports(
                spark, state_dir, deltas, prev, nxt, epoch,
                ENTRY_SUPPORT_NAMES, ENTRY_SUPPORT_KEYS,
                ENTRY_BUCKETED_SUPPORTS, n_buckets,
                ENTRY_LEVEL2_ROLLUPS,
            )
    finally:
        batch.unpersist()
    _vacuum(spark, mart_dir, nxt, keep_last)
    keep_floor = None
    if keep_last is not None:
        committed = [t for t in _list_versions(spark, mart_dir) if t[2]]
        if committed:
            keep_floor = committed[0][0]
    _vacuum_facts(spark, p_dir, keep_floor, nxt)
    _vacuum_facts(spark, a_dir, keep_floor, nxt)
    for name in ENTRY_BUCKETED_SUPPORTS:
        _vacuum_facts(spark, f"{state_dir}/sup_cow/{name}", keep_floor, nxt)


def maintain_entry_mart_batch(
    spark: SparkSession,
    state_dir: str,
    delta_pe: DataFrame,
    delta_p: DataFrame,
    protein_proteomes: DataFrame,
    protein_structures: DataFrame,
    protein_ecs: DataFrame,
    entry_go: DataFrame | None = None,
    n_buckets: int = 16,
    keep_last: int | None = None,
) -> DataFrame:
    """One-shot BATCH release epoch for the ENTRY mart against the
    same COW-stored state the stream uses (r13 verdict item 3): the
    three assignment-scale supports merge as partition-pruned
    touched-bucket reads, read once each. Seed with
    :func:`seed_entry_mart_state`; returns the rendered mart at the
    new committed version."""
    mart_dir = f"{state_dir}/mart"
    prev = _latest_committed(spark, mart_dir)
    if prev is None:
        raise RuntimeError(
            "entry-mart maintenance requires a seeded v0 "
            "(seed_entry_mart_state)"
        )
    epoch = (prev[1] if prev[1] is not None else -1) + 1
    apply_entry_mart_epoch(
        spark, state_dir, unify_entry_changelogs(delta_pe, delta_p), epoch,
        protein_proteomes, protein_structures, protein_ecs,
        n_buckets, keep_last,
    )
    latest = _latest_committed(spark, mart_dir)
    return entry_mart_from_supports(
        read_entry_mart_supports(spark, state_dir, latest[3]),
        entry_go=entry_go,
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
    pick = _pick_version(versions, mart_dir, version, epoch)
    return taxon_mart_from_supports(
        read_mart_supports(spark, state_dir, pick[3])
    )
