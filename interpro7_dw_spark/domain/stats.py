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
