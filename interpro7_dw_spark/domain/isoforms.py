"""Isoform (splice-variant) export — the reference's export_isoforms
task (interpro/oracle/matches.py:585-640) as DataFrame compositions:

  VARSPLIC_MASTER ⋈ UNIPARC.PROTEIN on CRC64 (sequence recovery,
  coalesce(seq_short, seq_long)) -> isoform master rows keyed
  ``protein-variant``; VARSPLIC_MATCH rows attach by that key, and
  matches whose key has no master are silently dropped (the reference's
  ``except KeyError: continue``, matches.py:624-628); finally the
  attached matches run through the SAME merge pipeline as canonical
  proteins (merge_uniprot_matches, here domain/pipeline.py).

Spark shape: the uniparc sequence dim joins on crc64 (hash join,
broadcast when the variant master is dim-sized relative to uniparc —
in production UNIPARC.PROTEIN is the big side, so the variant master
is the broadcast candidate, not uniparc). The orphan-match drop is a
left-semi join against the master keys, which Catalyst pushes below
the merge pipeline's shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pipeline import merge_protein_matches


def isoform_master(variants: DataFrame, uniparc: DataFrame) -> DataFrame:
    """One row per splice variant that has a UniParc sequence.

    ``variants``: protein_acc, variant (int), length, crc64
    (INTERPRO.VARSPLIC_MASTER); ``uniparc``: crc64, seq_short,
    seq_long (UNIPARC.PROTEIN). Inner join on crc64 — variants whose
    checksum has no UniParc row are dropped, exactly like the
    reference's INNER JOIN (matches.py:593-600).
    """
    return variants.join(uniparc, "crc64").select(
        F.concat_ws("-", "protein_acc", F.col("variant").cast("string")).alias(
            "accession"
        ),
        F.col("protein_acc").alias("protein"),
        "length",
        "crc64",
        F.coalesce("seq_short", "seq_long").alias("sequence"),
    )


def attach_isoform_matches(master: DataFrame, matches: DataFrame) -> DataFrame:
    """VARSPLIC_MATCH rows (keyed ``accession`` = PROTEIN-VARIANT)
    restricted to variants present in the master — the reference's
    KeyError-continue drop (matches.py:624-628)."""
    keys = master.select("accession")
    return matches.join(keys, "accession", "left_semi")


def merge_isoform_matches(
    variants: DataFrame,
    uniparc: DataFrame,
    matches: DataFrame,
    signatures: DataFrame,
    entries: DataFrame,
) -> DataFrame:
    """Full export_isoforms composition: master + orphan-drop + the
    canonical match-merge pipeline (reference matches.py:636-640 calls
    merge_uniprot_matches per isoform; here one distributed job keyed
    by the variant accession)."""
    master = isoform_master(variants, uniparc)
    kept = attach_isoform_matches(master, matches).withColumnRenamed(
        "accession", "protein_acc"
    )
    # merged rows keep protein_acc = variant accession; the merge
    # output's own `accession` column is the signature/entry accession
    merged = merge_protein_matches(kept, signatures, entries).select(
        F.col("protein_acc").alias("accession"),
        F.col("accession").alias("match_acc"),
        "source_database",
        "type",
        "entry_acc",
        "locations",
    )
    return master.join(merged, "accession", "left")
