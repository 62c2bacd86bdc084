"""Remaining webfront row tables: webfront_varsplic,
webfront_entrytaxa, webfront_entryannotation, webfront_database.

- ``varsplic_rows`` (reference interpro/mysql/proteins.py:203-268
  ``populate_isoforms``): one row per isoform with the ``features``
  JSON — a dict keyed by matched signature accession holding
  {accession, integrated, name, type (lower), source_database
  (lower), locations} (proteins.py:229-238); empty feature dicts
  serialize to NULL (jsonify default). Locations arrive pre-rendered
  by the caller (the isoform merge pipeline, domain/isoforms.py,
  owns that shape). Canonical order: feature keys sorted by
  accession (reference dict order is match-iteration order).

- ``entrytaxa_rows`` (reference interpro/mysql/entries.py:524-562
  ``populate_entry_taxa_distrib``): public, non-deleted entries with
  their taxon-distribution tree JSON; entries with no xrefs row get
  an explicit NULL tree (entries.py:554-556).

- ``entryannotation_rows`` (reference interpro/mysql/entries.py:17-80
  ``populate_annotations``): HMM/logo/alignment annotation rows with
  the mime-type rule (logo -> application/json, else
  application/gzip, entries.py:48-52) and the Pfam->InterPro
  duplication: ``alignment:*`` rows of an integrated Pfam signature
  are inserted a second time under the InterPro accession
  (entries.py:63-73) — a broadcast-join union, no Python loop.

- ``database_rows`` (reference interpro/mysql/databases.py:11-64
  ``populate_databases``): the database dim projected to the
  webfront_database column set (lower-cased primary name, alt/long
  names, current + previous release), with ``num_entries`` taken
  from an aggregation over the entries relation rather than the
  reference's precomputed pickle field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def varsplic_rows(master: DataFrame, matches: DataFrame) -> DataFrame:
    """``master``: accession, protein, length, sequence.
    ``matches``: accession (isoform), signature_acc, integrated
    (nullable), name, type, database, locations_json (pre-rendered).
    """
    feats = matches.groupBy("accession").agg(
        F.concat(
            F.lit("{"),
            F.expr(
                "array_join(transform(array_sort(collect_list(struct("
                "signature_acc, integrated, name, type, database,"
                " locations_json))),"
                " x -> concat('\"', x.signature_acc, '\":"
                "{\"accession\":\"', x.signature_acc,"
                " '\",\"integrated\":',"
                " ifnull(concat('\"', x.integrated, '\"'), 'null'),"
                " ',\"name\":\"', x.name,"
                " '\",\"type\":\"', lower(x.type),"
                " '\",\"source_database\":\"', lower(x.database),"
                " '\",\"locations\":', x.locations_json, '}')), ',')"
            ),
            F.lit("}"),
        ).alias("features")
    )
    return master.join(feats, "accession", "left").select(
        "accession",
        F.col("protein").alias("protein_acc"),
        "length",
        "sequence",
        "features",  # NULL when no matches (jsonify empty->NULL)
    )


def entrytaxa_rows(entries: DataFrame, trees: DataFrame) -> DataFrame:
    """``entries``: entry_acc, deletion_date (nullable), public (bool).
    ``trees``: entry_acc, tree_json."""
    return (
        entries.filter(F.col("deletion_date").isNull() & F.col("public"))
        .join(trees, "entry_acc", "left")
        .select(
            F.col("entry_acc").alias("accession"),
            F.col("tree_json").alias("tree"),
        )
    )


def entryannotation_rows(
    annotations: DataFrame, pfam2interpro: DataFrame
) -> DataFrame:
    """``annotations``: accession, anno_type, value (binary),
    num_sequences (nullable).
    ``pfam2interpro``: accession, interpro_acc (integrated Pfam
    signatures only)."""
    mime = F.when(
        F.col("anno_type") == "logo", F.lit("application/json")
    ).otherwise(F.lit("application/gzip"))
    base = annotations.select(
        "accession", F.col("anno_type").alias("type"), "value",
        mime.alias("mime_type"), "num_sequences",
    )
    dups = (
        annotations.filter(F.col("anno_type").startswith("alignment:"))
        .join(F.broadcast(pfam2interpro), "accession")
        .select(
            F.col("interpro_acc").alias("accession"),
            F.col("anno_type").alias("type"),
            "value",
            mime.alias("mime_type"),
            "num_sequences",
        )
    )
    return base.unionByName(dups)


def database_rows(databases: DataFrame, entries: DataFrame) -> DataFrame:
    """``databases``: db_key, db_name, description, db_type, version,
    release_date, prev_version, prev_release_date.
    ``entries``: entry_acc, db_key (one row per public entry)."""
    counts = entries.groupBy("db_key").agg(
        F.countDistinct("entry_acc").alias("num_entries")
    )
    return databases.join(counts, "db_key", "left").select(
        F.lower("db_key").alias("name"),
        F.col("db_key").alias("name_alt"),
        F.col("db_name").alias("name_long"),
        "description",
        F.col("db_type").alias("type"),
        F.coalesce("num_entries", F.lit(0)).alias("num_entries"),
        "version",
        "release_date",
        "prev_version",
        "prev_release_date",
    )
