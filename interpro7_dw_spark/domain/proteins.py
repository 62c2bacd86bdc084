"""webfront_protein mart — one row per protein composing the
per-protein aggregations (reference interpro/mysql/proteins.py:273-540):
organism JSON, per-database match counts, clan ("set") counts via
signature->clan membership, GO terms inherited from matched entries,
domain-organisation id/key and its architecture count, isoform /
structure counts, and the final ``counts`` JSON blob.

Spark-first: every ingredient is a pre-aggregated groupBy joined onto
the protein dim — the reference streams proteins one-by-one through
nine KVStores; here each store becomes a DataFrame and the composition
is a star join, shuffle-partitioned on protein_acc. Canonical-order
divergence (documented): the reference's ``entries`` map and GO list
keep Python dict insertion order (match iteration order); we sort by
key so the JSON is deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.json_out import jsonify


def protein_mart(
    proteins: DataFrame,
    matches: DataFrame,
    signature_clans: DataFrame | None = None,
    entry_go: DataFrame | None = None,
    proteomes: DataFrame | None = None,
    structures: DataFrame | None = None,
    domorgs: DataFrame | None = None,
    isoforms: DataFrame | None = None,
) -> DataFrame:
    """Compose the webfront_protein row.

    - ``proteins``: protein_acc, identifier, name, length, tax_id,
      sci_name, full_name, reviewed bool, fragment bool, evidence int,
      gene (nullable).
    - ``matches``: protein_acc, signature_acc, database.
    - ``signature_clans``: signature_acc, clan_acc (reference
      member2clan, proteins.py:296-300).
    - ``entry_go``: signature_acc, go_id, go_name, category
      (entry2go keyed by match accession, proteins.py:302-306,434-440).
    - ``proteomes``: protein_acc, proteome_id.
    - ``structures``: protein_acc, pdb_id (counts distinct pdb ids,
      proteins.py:315-325).
    - ``domorgs``: protein_acc, dom_id, dom_key, dom_count
      (proteins.py:464-471).
    - ``isoforms``: protein_acc (one row per isoform,
      proteins.py:327-334).
    """
    m = matches.select("protein_acc", "signature_acc", F.lower("database").alias("db"))

    # ONE pass over the matches fact: clan and GO dims are broadcast
    # (GO pre-aggregated per signature so the join stays 1:1 and match
    # multiplicities feed the per-db counts undistorted), then a single
    # groupBy(protein) computes the db-count map, distinct clan count,
    # and the flattened/deduped GO set — instead of three scans + three
    # shuffles of the biggest input.
    enriched = m
    aggs = [F.collect_list("db").alias("dbs")]
    if signature_clans is not None:
        enriched = enriched.join(F.broadcast(signature_clans), "signature_acc", "left")
        aggs.append(F.countDistinct("clan_acc").alias("n_sets"))
    if entry_go is not None:
        go_by_sig = entry_go.groupBy("signature_acc").agg(
            F.collect_set(F.struct("go_id", "go_name", "category")).alias("gos")
        )
        enriched = enriched.join(F.broadcast(go_by_sig), "signature_acc", "left")
        aggs.append(
            F.expr(
                """
                transform(
                  array_sort(array_distinct(flatten(collect_list(gos)))),
                  g -> struct(g.go_id as identifier, g.go_name as name,
                              g.category as category))
                """
            ).alias("go_terms_raw")
        )
    per_protein = enriched.groupBy("protein_acc").agg(*aggs)
    per_protein = per_protein.withColumn(
        "entries_map",
        F.expr(
            """
            map_from_entries(
              array_sort(transform(array_distinct(dbs),
                d -> struct(d, cast(size(filter(dbs, x -> x = d)) as bigint)))))
            """
        ),
    ).drop("dbs")
    if entry_go is not None:
        per_protein = per_protein.withColumn(
            "go_terms", F.when(F.size("go_terms_raw") > 0, F.col("go_terms_raw"))
        ).drop("go_terms_raw")

    parts = [per_protein]

    if proteomes is not None:
        parts.append(
            proteomes.groupBy("protein_acc").agg(
                F.min("proteome_id").alias("proteome_id")
            )
        )
    if structures is not None:
        parts.append(
            structures.groupBy("protein_acc").agg(
                F.countDistinct("pdb_id").alias("n_structures")
            )
        )
    if domorgs is not None:
        parts.append(domorgs.select("protein_acc", "dom_id", "dom_key", "dom_count"))
    if isoforms is not None:
        parts.append(
            isoforms.groupBy("protein_acc").agg(F.count("*").alias("n_isoforms"))
        )

    out = proteins
    for p in parts:
        out = out.join(p, "protein_acc", "left")
    for c, t in [
        ("n_sets", "long"),
        ("proteome_id", "string"),
        ("n_structures", "long"),
        ("dom_id", "string"),
        ("dom_key", "string"),
        ("dom_count", "long"),
        ("n_isoforms", "long"),
    ]:
        if c not in out.columns:
            out = out.withColumn(c, F.lit(None).cast(t))
    if "go_terms" not in out.columns:
        out = out.withColumn(
            "go_terms",
            F.lit(None).cast(
                "array<struct<identifier:string,name:string,category:string>>"
            ),
        )

    counts_json = F.to_json(
        F.struct(
            F.coalesce("dom_count", F.lit(0)).alias("domain_architectures"),
            F.coalesce(
                "entries_map", F.expr("cast(map() as map<string,bigint>)")
            ).alias("entries"),
            F.coalesce("n_isoforms", F.lit(0)).alias("isoforms"),
            F.when(F.col("proteome_id").isNotNull(), 1).otherwise(0).alias("proteomes"),
            F.coalesce("n_sets", F.lit(0)).alias("sets"),
            F.coalesce("n_structures", F.lit(0)).alias("structures"),
            F.lit(1).alias("taxa"),
        )
    )

    return out.select(
        F.col("protein_acc").alias("accession"),
        "identifier",
        F.to_json(
            F.struct(
                F.col("tax_id").alias("taxId"),
                F.col("sci_name").alias("scientificName"),
                F.col("full_name").alias("fullName"),
            )
        ).alias("organism"),
        "name",
        "length",
        "proteome_id",
        "gene",
        jsonify(F.col("go_terms")).alias("go_terms"),
        F.col("evidence").alias("evidence_code"),
        F.when(F.col("reviewed"), "reviewed").otherwise("unreviewed").alias(
            "source_database"
        ),
        F.when(F.col("fragment"), 1).otherwise(0).alias("is_fragment"),
        "tax_id",
        "dom_id",
        F.col("dom_key").alias("ida"),
        counts_json.alias("counts"),
    )
