"""Taxonomy operators (SURVEY.md §2.4 A9/A10, §2.9 G1).

``main_rank_lineage`` — each taxon's lineage projected onto the fixed
8 major ranks (reference MAIN_RANKS + lineage projection,
interpro/xrefs/entries.py:16-25,349-368): ranks absent from a lineage
stay null (e.g. no family between an order and a genus).

``taxon_distribution_tree`` — the per-entry taxonomic distribution
tree (interpro/xrefs/entries.py:405-466): every matched taxon adds its
protein count to each node along its main-rank path; gap nodes get
synthetic ids ``<last_real_id>-<rank_index>``; species increment the
species counters; the 8-level forest is wrapped in a "root" node and
serialized as canonical JSON (children ordered by id — the
reference's dict-insertion order, canonicalized here).

Scale shape: lineage projection is a closure join + conditional
aggregation (no driver walk); per-entry node accumulation is one
groupBy over (entry, node-path); only the final nesting of each
entry's <=~200 tree nodes happens in an Arrow batch kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.graph import transitive_closure

MAIN_RANKS = [
    "domain", "kingdom", "phylum", "class", "order", "family", "genus", "species",
]


def main_rank_lineage(taxa: DataFrame) -> DataFrame:
    """(tax_id, parent_id, rank, sci_name) -> (tax_id, main_ranks
    array<string> of length 8, slot i = ancestor at MAIN_RANKS[i] or null)."""
    edges = taxa.filter(F.col("parent_id").isNotNull()).select(
        F.col("tax_id").alias("child"), F.col("parent_id").alias("parent")
    )
    closure = transitive_closure(edges, "child", "parent")
    ranked = closure.join(
        taxa.select(F.col("tax_id").alias("anc"), F.col("rank").alias("anc_rank")),
        "anc",
    ).filter(F.col("anc_rank").isin(MAIN_RANKS))
    slots = [
        F.max(F.when(F.col("anc_rank") == r, F.col("anc"))).alias(f"r{i}")
        for i, r in enumerate(MAIN_RANKS)
    ]
    return (
        closure.select("node").distinct()
        .join(ranked.groupBy("node").agg(*slots), "node", "left")
        .select(
            F.col("node").alias("tax_id"),
            F.array(*[F.col(f"r{i}") for i in range(len(MAIN_RANKS))]).alias("main_ranks"),
        )
    )


_NODE_SCHEMA = (
    "array<struct<uid string, rank string, name string, level int, "
    "proteins bigint, species bigint>>"
)


def taxon_distribution_nodes(
    facts: DataFrame,
    taxa: DataFrame,
    entry_col: str = "entry_acc",
) -> DataFrame:
    """Flat node relation of the per-entry distribution tree: one row
    per (entry, uid) with (level, parent_uid, nid, name, proteins,
    species). This is the complete information content of the tree —
    ``taxon_distribution_tree`` only nests it — so it is the
    value-oracle surface (the nesting kernel is golden-tested)."""
    lineages = main_rank_lineage(taxa)
    names = taxa.select(F.col("tax_id").alias("name_tax_id"), F.col("sci_name").alias("nname"))

    # unique-id path along the 8 slots: synthetic ids for gaps
    # (fold keeps the running last real id, reference entries.py:413-421)
    path = F.aggregate(
        F.zip_with(
            F.col("main_ranks"),
            F.sequence(F.lit(0), F.lit(len(MAIN_RANKS) - 1)),
            lambda nid, i: F.struct(nid.alias("nid"), i.alias("i")),
        ),
        F.expr("CAST(array() AS array<struct<uid string, nid string, i int>>)"),
        lambda acc, s: F.concat(
            acc,
            F.array(
                F.struct(
                    F.when(s["nid"].isNotNull(), s["nid"])
                    .otherwise(
                        F.concat(
                            # lazy branch: element_at on the empty initial
                            # accumulator must not be evaluated (ANSI)
                            F.when(F.size(acc) > 0, F.element_at(acc, -1)["uid"])
                            .otherwise(F.lit("1")),
                            F.lit("-"),
                            s["i"].cast("string"),
                        )
                    )
                    .alias("uid"),
                    s["nid"].alias("nid"),
                    s["i"].alias("i"),
                )
            ),
        ),
    )

    # parent uid: carried per fact-path row, aggregated with the node
    with_parent = (
        facts.join(lineages, "tax_id")
        .withColumn("path", path)
        .select(
            entry_col,
            "num_proteins",
            "is_species",
            F.posexplode("path").alias("lvl", "p"),
            F.col("path").alias("fullpath"),
        )
        .select(
            entry_col,
            "num_proteins",
            "is_species",
            F.col("lvl").cast("int").alias("lvl"),
            F.col("p.uid").alias("uid"),
            F.col("p.nid").alias("nid"),
            F.when(F.col("lvl") > 0, F.element_at("fullpath", F.col("lvl"))["uid"]).alias("parent_uid"),
        )
    )
    return (
        with_parent.groupBy(entry_col, "lvl", "uid")
        .agg(
            F.max("nid").alias("nid"),
            F.max("parent_uid").alias("parent_uid"),
            F.sum("num_proteins").alias("proteins"),
            F.sum(F.col("is_species").cast("long")).alias("species"),
        )
        .join(F.broadcast(names), F.col("nid") == F.col("name_tax_id"), "left")
        .select(
            entry_col,
            "uid",
            F.col("lvl").alias("level"),
            "parent_uid",
            "nid",
            F.col("nname").alias("name"),
            "proteins",
            "species",
        )
    )


def taxon_distribution_tree(
    facts: DataFrame,
    taxa: DataFrame,
    entry_col: str = "entry_acc",
) -> DataFrame:
    """Per-entry distribution tree JSON.

    ``facts``: (entry_acc, tax_id, num_proteins, is_species) — one row
    per (entry, matched taxon). ``taxa``: (tax_id, parent_id, rank,
    sci_name). Returns (entry_acc, tree) with canonical JSON. Nests
    the ``taxon_distribution_nodes`` relation in an Arrow batch.
    """
    ranks = MAIN_RANKS

    def _make_tree_udf():
        import json

        @F.pandas_udf(T.StringType())
        def build_tree(node_lists):
            import pandas as pd

            def build(rows):
                # uid prefixes encode the hierarchy: a node's parent is
                # the level-above node whose path this row descended —
                # reconstruct by stacking per level in uid-path order
                by_level: dict[int, dict[str, dict]] = {}
                for r in rows:
                    by_level.setdefault(int(r["level"]), {})[r["uid"]] = {
                        "id": r["uid"],
                        "rank": ranks[int(r["level"])],
                        "name": r["name"],
                        "proteins": int(r["proteins"]),
                        "species": int(r["species"]),
                        "children": [],
                        "_parent": r["parent_uid"],
                    }
                for lvl in sorted(by_level)[1:]:
                    for node in by_level[lvl].values():
                        parent = by_level[lvl - 1].get(node["_parent"])
                        if parent is not None:
                            parent["children"].append(node)
                roots = sorted(by_level.get(0, {}).values(), key=lambda n: n["id"])

                def clean(n):
                    n.pop("_parent", None)
                    n["children"] = [clean(c) for c in sorted(n["children"], key=lambda x: x["id"])]
                    return n

                top = [clean(r) for r in roots]
                return json.dumps(
                    {
                        "id": "1",
                        "rank": None,
                        "name": "root",
                        "proteins": sum(r["proteins"] for r in top),
                        "species": sum(r["species"] for r in top),
                        "children": top,
                    },
                    separators=(",", ":"),
                )

            return pd.Series([build(rows) for rows in node_lists])

        return build_tree

    node_rows = taxon_distribution_nodes(facts, taxa, entry_col).select(
        entry_col,
        F.struct(
            F.col("uid").alias("uid"),
            F.col("level").alias("level"),
            F.col("parent_uid").alias("parent_uid"),
            F.col("name").alias("name"),
            F.col("proteins").alias("proteins"),
            F.col("species").alias("species"),
        ).alias("node"),
    )
    build_tree = _make_tree_udf()
    return (
        node_rows.groupBy(entry_col)
        .agg(F.collect_list("node").alias("nodes"))
        .select(entry_col, build_tree(F.col("nodes")).alias("tree"))
    )
