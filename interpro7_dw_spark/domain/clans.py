"""Clan alignment graph (SURVEY.md §2.9 G6; reference
interpro/oracle/clans.py:89-162).

Nodes are clan members; links keep the best (lowest) e-value per
unordered member pair, only for pairs inside the same clan, only
under the e-value threshold. The reference canonicalizes with
``if query > target: swap`` and keeps the min e-value per pair — here
that is least/greatest + min(), one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVALUE_THRESHOLD = 1e-2


def clan_alignment_graph(
    members: DataFrame,       # clan_acc, signature_acc
    alignments: DataFrame,    # query_acc, target_acc, evalue
    threshold: float = EVALUE_THRESHOLD,
) -> DataFrame:
    """(clan_acc, source, target, score) best-e-value edges."""
    q = members.select(
        F.col("signature_acc").alias("query_acc"), F.col("clan_acc").alias("q_clan")
    )
    t_ = members.select(
        F.col("signature_acc").alias("target_acc"), F.col("clan_acc").alias("t_clan")
    )
    return (
        alignments.filter(F.col("evalue") <= threshold)
        .join(F.broadcast(q), "query_acc")           # query must be in a clan
        .join(F.broadcast(t_), "target_acc", "left")  # target may not be
        .filter(F.col("q_clan") == F.col("t_clan"))
        .select(
            F.col("q_clan").alias("clan_acc"),
            F.least("query_acc", "target_acc").alias("source"),
            F.greatest("query_acc", "target_acc").alias("target"),
            "evalue",
        )
        .groupBy("clan_acc", "source", "target")
        .agg(F.min("evalue").alias("score"))
    )
