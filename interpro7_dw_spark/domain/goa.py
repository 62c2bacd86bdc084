"""GOA export TSVs (reference uniprot/goa.py:84-258): the three
mapping files shipped to the GOA team —

- ``pdb2interpro2go``: per PDB chain with a taxon, every InterPro
  match x GO term x mapped UniProt protein (empty protein field when
  the chain maps to none) (goa.py:84-144);
- ``interpro2go2uniprot``: every InterPro entry's GO terms crossed
  with its matched proteins (goa.py:147-158);
- ``pthr2go2uniprot``: PANTHER ancestral-node GO annotations joined to
  PANTHER matches carrying that node, with the family's InterPro
  integration or ``-`` (goa.py:161-212).

Each is a pure projection/join pipeline returning a DataFrame in the
reference's column order; feed to ``sources.sinks.write_tsv`` with the
reference's comment header and ``include_header=False``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PDB2GO_HEADER = "#PDBe ID\tchain\tTaxon ID\tInterPro accession\tGO ID\tUniProt accession"
IPR2GO_HEADER = "#InterPro accession\tGO ID\tUniProt accession"
PTHR2GO_HEADER = (
    "# PANTHER family accession\tPANTHER Tree Node ID\t"
    "InterPro accession\tGO ID\tUniProt accession"
)


def ipr2go2uniprot(entry_go: DataFrame, entry_proteins: DataFrame) -> DataFrame:
    """(entry_acc, go_id) x (entry_acc, uniprot_acc) -> one row per
    (entry, term, protein), InterPro entries only (the caller filters
    the dim — goa.py:153)."""
    return entry_go.join(entry_proteins, "entry_acc").select(
        "entry_acc", "go_id", "uniprot_acc"
    )


def pdb2interpro2go(
    chain_matches: DataFrame,   # pdb_id, chain, entry_acc
    chain_taxa: DataFrame,      # pdb_id, chain, taxon_id
    entry_go: DataFrame,        # entry_acc, go_id
    chain_proteins: DataFrame,  # pdb_id, chain, uniprot_acc
) -> DataFrame:
    """Chains without a taxon are dropped (inner join, goa.py:124-126);
    chains without proteins keep one row with an empty protein field
    (left join + coalesce '', goa.py:129-130)."""
    return (
        chain_matches.join(chain_taxa, ["pdb_id", "chain"])
        .join(entry_go, "entry_acc")
        .join(chain_proteins, ["pdb_id", "chain"], "left")
        .select(
            "pdb_id",
            "chain",
            "taxon_id",
            "entry_acc",
            "go_id",
            F.coalesce("uniprot_acc", F.lit("")).alias("uniprot_acc"),
        )
    )


def pthr2go2uniprot(
    panther_go: DataFrame,       # family_acc, an_id, ptn_id, go_id
    panther_matches: DataFrame,  # protein_acc, family_acc, an_id
    signatures: DataFrame,       # signature_acc, entry_acc (nullable)
) -> DataFrame:
    """PANTHER matches keep only (family, node) pairs that carry GO
    annotations (inner join, goa.py:203-205); the family's InterPro
    integration falls back to '-' (goa.py:206)."""
    integrated = signatures.select(
        F.col("signature_acc").alias("family_acc"),
        F.coalesce("entry_acc", F.lit("-")).alias("interpro_acc"),
    )
    return (
        panther_matches.join(panther_go, ["family_acc", "an_id"])
        .join(F.broadcast(integrated), "family_acc", "left")
        .select(
            "family_acc",
            "ptn_id",
            F.coalesce("interpro_acc", F.lit("-")).alias("interpro_acc"),
            "go_id",
            F.col("protein_acc").alias("uniprot_acc"),
        )
    )
