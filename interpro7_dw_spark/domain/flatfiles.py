"""FTP flat-file compositions (reference interpro/ftp/flatfiles.py:
29-123): the row-producing plans behind entry.list, names.dat,
short_names.dat, interpro2go and protein2ipr.dat.gz.

Each function returns the DataFrame of LINES-to-be in the reference's
column and sort order; sources/sinks.py::write_tsv turns it into the
single ordered (optionally gzipped) file. Plans are pure projections/
joins — the expensive one (protein2ipr at >1e8 proteins) is a
broadcast entry-name join plus a global range sort, which Spark
executes as sample-based range partitioning (no single-node sort until
the final file coalesce; at cluster scale write per-range parts and
cat them, the order is already global).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entry_list_rows(entries: DataFrame) -> DataFrame:
    """entry.list: ENTRY_AC / ENTRY_TYPE / ENTRY_NAME sorted by
    (type, accession) (flatfiles.py:41-45)."""
    return entries.select(
        F.col("entry_acc").alias("ENTRY_AC"),
        F.col("type").alias("ENTRY_TYPE"),
        F.col("name").alias("ENTRY_NAME"),
    ).orderBy("ENTRY_TYPE", "ENTRY_AC")


def names_rows(entries: DataFrame, short: bool = False) -> DataFrame:
    """names.dat / short_names.dat sorted by accession
    (flatfiles.py:47-55)."""
    name_col = "short_name" if short else "name"
    return entries.select(
        "entry_acc", F.col(name_col).alias(name_col)
    ).orderBy("entry_acc")


def interpro2go_rows(
    entry_go_terms: DataFrame, with_keys: bool = False
) -> DataFrame:
    """interpro2go body lines (flatfiles.py:57-69):
    ``InterPro:ACC NAME > GO:GO_NAME ; GO_ID`` sorted by accession.
    Input: (entry_acc, name, go_name, go_id). ``with_keys`` keeps the
    (entry_acc, go_id) sort key alongside ``line`` so the ranged sink
    can range-partition on the raw key while rendering only the line
    (sort-by-line is NOT the reference order: within an entry it would
    sort by go_name, not go_id)."""
    line = F.concat(
        F.lit("InterPro:"), F.col("entry_acc"), F.lit(" "), F.col("name"),
        F.lit(" > GO:"), F.col("go_name"), F.lit(" ; "), F.col("go_id"),
    )
    if with_keys:
        return entry_go_terms.select("entry_acc", "go_id", line.alias("line"))
    return (
        entry_go_terms.orderBy("entry_acc", "go_id")
        .select(line.alias("line"))
    )


def protein2ipr_rows(classified: DataFrame, entries: DataFrame) -> DataFrame:
    """protein2ipr.dat rows (flatfiles.py:90-118): one line per
    integrated member-database match location —

      protein_acc  entry_acc  entry_name  signature_acc  start  end

    where start/end are the first fragment's start and the max
    fragment end ("we do not consider fragmented locations"),
    globally sorted by the full tuple (the reference iterates
    proteins in key order and sorts each protein's tuples).

    ``classified`` is classify_matches output (domain/pipeline.py);
    ``entries`` the InterPro entry dim (entry_acc, name).
    """
    return (
        classified.filter(F.col("entry_acc").isNotNull())
        .join(
            F.broadcast(entries.select("entry_acc", F.col("name").alias("entry_name"))),
            "entry_acc",
        )
        .select(
            "protein_acc",
            "entry_acc",
            "entry_name",
            "signature_acc",
            F.col("frags")[0]["start"].alias("pos_start"),
            F.array_max(F.expr("transform(frags, f -> f.end)")).alias("pos_end"),
        )
        .orderBy(
            "protein_acc", "entry_acc", "entry_name",
            "signature_acc", "pos_start", "pos_end",
        )
    )
