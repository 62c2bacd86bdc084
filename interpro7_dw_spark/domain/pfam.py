"""Pfam family metadata and alignment export — the reference's
interpro/oracle/pfam.py tasks re-expressed as DataFrame jobs:

- ``pfam_families`` (reference pfam.py:13-67 minus the Wikipedia HTTP
  fetch, which is driver-side S8/out-of-scope): the nested
  curation/hmm details object per family, rendered as canonical JSON
  with nulls kept (the reference pickles the dict; byte-shape goldens
  in tests/test_pfam.py).
- ``pfam_alignments`` (reference pfam.py:140-166): each PFAM_A row
  fans out to two alignment records, ``alignment:seed`` and
  ``alignment:full`` — a 2-way unpivot over opaque gzip-compressed
  binary payloads. stack() keeps it one narrow projection (no join,
  no shuffle); payloads stay binary end-to-end (parquet re-compresses
  at rest).

Scale: both are embarrassingly parallel scans — no shuffle at any
width; alignment blobs are MB-sized LOBs in production, so partition
sizing is bytes-driven (spark.sql.files.maxPartitionBytes), not
row-driven.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pfam_families(pfam_a: DataFrame) -> DataFrame:
    """accession + details JSON (reference pfam.py:27-48 dict shape:
    curation{sequence_ontology, authors[]}, hmm{commands{build,search},
    cutoffs{gathering{sequence,domain}}, version}); nulls kept so the
    key set is fixed like the reference's dict literal."""
    details = F.struct(
        F.struct(
            F.col("seq_ontology_id").alias("sequence_ontology"),
            F.from_json(F.col("authors"), "array<string>").alias("authors"),
        ).alias("curation"),
        F.struct(
            F.struct(
                F.col("build_cmd").alias("build"),
                F.col("search_cmd").alias("search"),
            ).alias("commands"),
            F.struct(
                F.struct(
                    F.col("seq_ga").alias("sequence"),
                    F.col("dom_ga").alias("domain"),
                ).alias("gathering"),
            ).alias("cutoffs"),
            F.col("version").alias("version"),
        ).alias("hmm"),
    )
    return pfam_a.select(
        "accession",
        F.to_json(details, {"ignoreNullFields": "false"}).alias("details_json"),
    )


def pfam_alignments(pfam_a: DataFrame) -> DataFrame:
    """(accession, aln_type, alignment, n_sequences) — one row per
    seed/full alignment, payload an opaque binary column (reference
    writes the gzip stream untouched, pfam.py:152-164)."""
    return pfam_a.select(
        "accession",
        F.expr(
            "stack(2, 'alignment:seed', seed_aln, seed_num,"
            "         'alignment:full', full_aln, full_num)"
            " AS (aln_type, alignment, n_sequences)"
        ),
    )
