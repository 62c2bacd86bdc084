"""Domain-pipeline catalog entries: run the InterPro match-merge
pipeline (domain/pipeline.py — the reference's X1 task) over
match-shaped data synthesized deterministically from the star schema,
so its throughput shows up in bench and its plumbing in the
correctness run (rows-only: the pipeline's repr-selection search is
not SQL-expressible; its semantics are covered by golden + property
tests in tests/test_domain.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..domain.pipeline import REPR_DOM_DATABASES, merge_protein_matches
from .spec import QuerySpec, register, t

_SIG_DBS = REPR_DOM_DATABASES + ["panther", "hamap"]
_SIG_TYPES = ["domain"] * len(REPR_DOM_DATABASES) + ["family", "region"]


def synth_matches(spark: SparkSession, sf: str):
    """lineitem -> match-shaped rows: order = protein, part = signature,
    positions derived from line number/quantity (deterministic)."""
    li = t(spark, sf, "lineitem")
    pos_from = (F.col("l_partkey") * 13 + F.col("l_linenumber") * 7) % 400 + 1
    return li.select(
        F.concat(F.lit("P"), F.col("l_orderkey")).alias("protein_acc"),
        F.concat(F.lit("SIG"), F.col("l_partkey") % 200).alias("signature_acc"),
        F.lit(None).cast("string").alias("model_acc"),
        pos_from.cast("long").alias("pos_from"),
        (pos_from + (F.col("l_quantity") * 3).cast("long") + 10).alias("pos_to"),
        F.lit(None).cast("string").alias("fragments"),
        F.col("l_discount").alias("score"),
    )


def synth_signatures(spark: SparkSession, sf: str):
    n_dbs = len(_SIG_DBS)
    idx = F.col("sig_id") % n_dbs
    db = F.lit(None).cast("string")
    typ = F.lit(None).cast("string")
    for i, (d, ty) in enumerate(zip(_SIG_DBS, _SIG_TYPES)):
        db = F.when(idx == i, d).otherwise(db)
        typ = F.when(idx == i, ty).otherwise(typ)
    return spark.range(200).select(
        F.concat(F.lit("SIG"), F.col("id")).alias("signature_acc"),
        F.concat(F.lit("name"), F.col("id")).alias("name"),
        F.concat(F.lit("sn"), F.col("id")).alias("short_name"),
        F.col("id").alias("sig_id"),
    ).select(
        "signature_acc",
        "name",
        "short_name",
        db.alias("database"),
        typ.alias("type"),
        F.lit("hmm").alias("evidence"),
        # every third signature integrated into an InterPro entry
        F.when(F.col("sig_id") % 3 == 0,
               F.concat(F.lit("IPR"), F.col("sig_id") % 40)).alias("entry_acc"),
    )


def synth_entries(spark: SparkSession, sf: str):
    return spark.range(40).select(
        F.concat(F.lit("IPR"), F.col("id")).alias("entry_acc"),
        F.concat(F.lit("Entry "), F.col("id")).alias("name"),
        F.concat(F.lit("entry_"), F.col("id")).alias("short_name"),
        F.lit("Domain").alias("type"),
        F.lit(None).cast("string").alias("parent_acc"),
    )


register(QuerySpec(
    name="domain_merge_matches",
    tags=("X1", "G5", "W3", "F1", "J2"),
    description="Full InterPro match-merge pipeline (classify -> repr "
    "selection -> signature grouping -> entry condensation) on synthesized "
    "matches; rows-only (search not SQL-expressible; goldens in tests/).",
    build=lambda spark, sf: merge_protein_matches(
        synth_matches(spark, sf), synth_signatures(spark, sf), synth_entries(spark, sf)
    ),
    oracle=None,
))
