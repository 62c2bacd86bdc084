"""Search-document generation (reference interpro/elastic/export.py:
15-323 — SURVEY.md §3.3): the n-way join that fans each protein out to
one document per (protein x entry x structure-chain), with fallback
documents when a protein has no entries or no chains, and leftover
documents for entries / structures / taxa that matched no protein at
all (the reference tracks seen_* sets and anti-joins at the end,
export.py:129-284).

Spark-first shape: the per-protein fan-out is a pair of left joins +
a coalesced explode (LEFT JOIN keeps the fallback rows — no
full-outer gymnastics); the leftovers are left-anti joins from the
dimensions; everything unions into one document relation written as
JSONL batches (sources/sinks.py). One shuffle per join key, all
dimension sides broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOC_COLUMNS = ["doc_id", "protein_acc", "entry_acc", "pdb_chain", "tax_id", "doc_type"]


def relationship_documents(
    proteins: DataFrame,          # protein_acc, tax_id
    protein_entries: DataFrame,   # protein_acc, entry_acc
    protein_chains: DataFrame,    # protein_acc, pdb_chain
    entries: DataFrame,           # entry_acc
    structures: DataFrame,        # pdb_chain
    taxa: DataFrame,              # tax_id
) -> DataFrame:
    """One row per search document; ``doc_type`` in
    {relationship, entry, structure, taxon}. ``doc_id`` is the
    deterministic join of its components (the reference concatenates
    field values, export.py:415-422)."""
    pe = protein_entries.groupBy("protein_acc").agg(
        F.collect_set("entry_acc").alias("entry_accs")
    )
    pc = protein_chains.groupBy("protein_acc").agg(
        F.collect_set("pdb_chain").alias("chains")
    )
    fan = (
        proteins.join(pe, "protein_acc", "left")
        .join(pc, "protein_acc", "left")
        # empty set -> [null] so the explode keeps the fallback row
        .withColumn(
            "entry_acc",
            F.explode(
                F.when(
                    F.col("entry_accs").isNull() | (F.size("entry_accs") == 0),
                    F.array(F.lit(None).cast("string")),
                ).otherwise(F.col("entry_accs"))
            ),
        )
        .withColumn(
            "pdb_chain",
            F.explode(
                F.when(
                    F.col("chains").isNull() | (F.size("chains") == 0),
                    F.array(F.lit(None).cast("string")),
                ).otherwise(F.col("chains"))
            ),
        )
        .select(
            "protein_acc",
            "entry_acc",
            "pdb_chain",
            "tax_id",
            F.lit("relationship").alias("doc_type"),
        )
    )

    def leftover(dim: DataFrame, key: str, doc_type: str) -> DataFrame:
        seen = fan.select(key).filter(F.col(key).isNotNull()).distinct()
        out = dim.select(key).join(seen, key, "left_anti")
        for c in ("protein_acc", "entry_acc", "pdb_chain", "tax_id"):
            if c != key:
                out = out.withColumn(c, F.lit(None).cast("string"))
        return out.withColumn("doc_type", F.lit(doc_type)).select(
            "protein_acc", "entry_acc", "pdb_chain", "tax_id", "doc_type"
        )

    docs = (
        fan
        .unionByName(leftover(entries, "entry_acc", "entry"))
        .unionByName(leftover(structures, "pdb_chain", "structure"))
        .unionByName(leftover(taxa, "tax_id", "taxon"))
    )
    return docs.withColumn(
        "doc_id",
        F.concat_ws(
            "-",
            F.coalesce("protein_acc", F.lit("")),
            F.coalesce("entry_acc", F.lit("")),
            F.coalesce("pdb_chain", F.lit("")),
            F.coalesce("tax_id", F.lit("")),
        ),
    ).select(*DOC_COLUMNS)


def ida_documents(domorgs: DataFrame, entry_names: DataFrame) -> DataFrame:
    """Domain-architecture (IDA) search documents, one per distinct
    ida_id (reference gen_ida_docs, interpro/elastic/export.py:296-316,
    429-475): the per-protein domain-organisation stream dedups to its
    first-seen ida — equivalently any member, since the re-merge
    (interpro/xrefs/domorgs.py:140-156) stamps every member with the
    SAME representative block (oldest protein, ties to the smallest
    accession — the reference's strict ``date <`` update over
    accession-sorted iteration).

    ``domorgs`` per-protein grain: protein_acc, dom_id, dom_key, date
    (comparable string), length, locations
    array<struct<pfam string, interpro string, start long, end long>>
    (sorted by (start, end) like domorgs.py:44-45).
    ``entry_names``: (entry_acc, short_name) dim for the per-domain
    name lookups (export.py:438,452).

    Output: ida_id, ida, rep_protein, rep_length, n_proteins,
    domains_str — the locations list flattened in reference order
    (each location emits its Pfam element, then its InterPro element
    when integrated, export.py:436-460), rendered canonically as
    ``acc=name:start-end`` joined by commas.
    """
    per_ida = domorgs.groupBy("dom_id").agg(
        F.count("*").alias("n_proteins"),
        F.min_by(
            F.struct("protein_acc", "dom_key", "length", "locations"),
            F.struct("date", "protein_acc"),
        ).alias("rep"),
    )
    elems = per_ida.select(
        F.col("dom_id").alias("ida_id"),
        F.col("rep.dom_key").alias("ida"),
        F.col("rep.protein_acc").alias("rep_protein"),
        F.col("rep.length").alias("rep_length"),
        "n_proteins",
        F.posexplode(
            F.expr(
                """
                flatten(transform(rep.locations, l ->
                  if(l.interpro is null,
                     array(struct(l.pfam as acc, l.start as s, l.end as e)),
                     array(struct(l.pfam as acc, l.start as s, l.end as e),
                           struct(l.interpro as acc, l.start as s, l.end as e)))))
                """
            )
        ).alias("pos", "elem"),
    )
    named = elems.join(
        F.broadcast(entry_names.select(F.col("entry_acc").alias("acc_key"), "short_name")),
        elems["elem.acc"] == F.col("acc_key"),
        "left",
    )
    return (
        named.groupBy("ida_id")
        .agg(
            F.first("ida").alias("ida"),
            F.first("rep_protein").alias("rep_protein"),
            F.first("rep_length").alias("rep_length"),
            F.first("n_proteins").alias("n_proteins"),
            F.expr(
                """
                array_join(
                  transform(array_sort(collect_list(struct(pos,
                    concat(elem.acc, '=', coalesce(short_name, ''), ':', elem.s, '-', elem.e) as r))),
                    x -> x.r),
                  ',')
                """
            ).alias("domains_str"),
        )
    )
