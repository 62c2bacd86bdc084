"""Release-note statistics (SURVEY.md §2.4 A13; reference
interpro/mysql/databases.py:126-312): per-sequence-database protein
counts / hit counts / integrated counts with the AntiFam skip rule,
plus the reviewed+unreviewed = uniprot total row.

The reference walks all proteins with three KVStores open; here it is
one protein-grained join + conditional aggregation — partial aggs do
the rest. The AntiFam rule: a protein whose matches are empty or
AntiFam-only does not count as "hit".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sequence_database_stats(
    proteins: DataFrame,         # protein_acc, reviewed (bool)
    protein_matches: DataFrame,  # protein_acc, match_db (lowercase), entry_acc nullable
) -> DataFrame:
    """One row per sequence database (reviewed / unreviewed / uniprot)
    with count / hit / integrated columns."""
    per_protein = (
        protein_matches.groupBy("protein_acc")
        .agg(
            F.collect_set("match_db").alias("dbs"),
            F.max((F.col("match_db") == "interpro").cast("int")).alias("is_integrated"),
        )
        .withColumn(
            "counts_as_hit",
            ~((F.size("dbs") == 0) | (F.col("dbs") == F.array(F.lit("antifam")))),
        )
    )
    base = (
        proteins.join(per_protein, "protein_acc", "left")
        .select(
            F.when(F.col("reviewed"), "reviewed").otherwise("unreviewed").alias("database"),
            F.coalesce("counts_as_hit", F.lit(False)).alias("hit"),
            (F.coalesce("is_integrated", F.lit(0)) == 1).alias("integrated"),
        )
    )
    per_db = base.groupBy("database").agg(
        F.count("*").alias("count"),
        F.sum(F.col("hit").cast("long")).alias("hit"),
        # integrated implies hit (interpro is never AntiFam-only)
        F.sum((F.col("hit") & F.col("integrated")).cast("long")).alias("integrated"),
    )
    total = per_db.groupBy().agg(
        F.lit("uniprot").alias("database"),
        F.sum("count").alias("count"),
        F.sum("hit").alias("hit"),
        F.sum("integrated").alias("integrated"),
    )
    return per_db.unionByName(total)


def entry_type_counts(entries: DataFrame) -> DataFrame:
    """InterPro entry counts per lowercase type (reference
    databases.py:236-248 interpro_types), public and non-deleted only."""
    return (
        entries.filter(
            (F.lower("database") == "interpro")
            & F.col("public")
            & ~F.col("deleted")
        )
        .groupBy(F.lower("type").alias("entry_type"))
        .agg(F.count("*").alias("n_entries"))
    )


def interpro_release_stats(
    entries: DataFrame,
    previous_public: DataFrame,
    entry_pubmed: DataFrame | None = None,
    entry_go_counts: DataFrame | None = None,
) -> DataFrame:
    """One-row InterPro release summary (databases.py:236-258):
    new-entry list vs the previous release, distinct PubMed citation
    count, total InterPro2GO mappings, and the latest entry (last in
    creation order). ``entries`` needs a sortable ``creation_ord``.
    ``entry_pubmed``: (entry_acc, pmid); ``entry_go_counts``:
    (entry_acc, n_go)."""
    ipr = entries.filter(
        (F.lower("database") == "interpro") & F.col("public") & ~F.col("deleted")
    )
    new = ipr.join(previous_public, "entry_acc", "left_anti")
    agg = ipr.groupBy().agg(
        F.max_by("entry_acc", "creation_ord").alias("latest_entry"),
    )
    new_list = new.groupBy().agg(
        F.array_join(F.array_sort(F.collect_list("entry_acc")), ",").alias("new_entries"),
        F.count("*").alias("n_new"),
    )
    out = agg.crossJoin(new_list)
    if entry_pubmed is not None:
        pm = (
            ipr.join(entry_pubmed, "entry_acc")
            .groupBy()
            .agg(F.countDistinct("pmid").alias("pubmed_citations"))
        )
        out = out.crossJoin(pm)
    if entry_go_counts is not None:
        go = (
            ipr.join(entry_go_counts, "entry_acc")
            .groupBy()
            .agg(F.sum("n_go").alias("interpro2go"))
        )
        out = out.crossJoin(go)
    return out


def member_database_stats(
    entries: DataFrame,
    signature_clans: DataFrame,
    staging_databases: DataFrame,  # db, name_long, version
    public_databases: DataFrame,   # db, version
    previous_integrated: DataFrame,  # entry_acc (signatures integrated last release)
) -> DataFrame:
    """Per member-database release block (databases.py:259-295):
    signature / integrated-signature counts, the recently-integrated
    list (integrated now, not in the previous release), distinct clan
    ("set") counts, and is_new / is_updated flags from the staging vs
    public version comparison. AntiFam is excluded like the reference."""
    sigs = entries.filter(
        (~F.lower("database").isin("interpro", "antifam"))
        & F.col("public")
        & ~F.col("deleted")
    ).withColumn("db", F.lower("database"))

    prev = previous_integrated.select("entry_acc").withColumn("was_integrated", F.lit(True))
    clans = signature_clans.select(
        F.col("signature_acc").alias("entry_acc"), "clan_acc"
    )
    enriched = sigs.join(F.broadcast(prev), "entry_acc", "left").join(
        F.broadcast(clans), "entry_acc", "left"
    )
    per_db = enriched.groupBy("db").agg(
        F.count("*").alias("signatures"),
        F.sum(F.col("integrated_in").isNotNull().cast("long")).alias(
            "integrated_signatures"
        ),
        F.array_join(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("integrated_in").isNotNull()
                        & F.col("was_integrated").isNull(),
                        F.col("entry_acc"),
                    )
                )
            ),
            ",",
        ).alias("recently_integrated"),
        F.countDistinct("clan_acc").alias("sets"),
    )
    staged = staging_databases.select(
        F.lower("db").alias("db"), "name_long", F.col("version").alias("stg_version")
    )
    public = public_databases.select(
        F.lower("db").alias("db"), F.col("version").alias("pub_version")
    )
    return (
        per_db.join(F.broadcast(staged), "db", "left")
        .join(F.broadcast(public), "db", "left")
        .select(
            "db",
            F.col("name_long").alias("name"),
            F.col("stg_version").alias("version"),
            "signatures",
            "integrated_signatures",
            "recently_integrated",
            "sets",
            F.col("pub_version").isNull().alias("is_new"),
            (
                F.col("pub_version").isNotNull()
                & (F.col("pub_version") != F.col("stg_version"))
            ).alias("is_updated"),
        )
    )
