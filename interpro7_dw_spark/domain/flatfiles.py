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


# reference flatfiles.py:11 cites the InterPro flagship paper; the string
# is part of the interpro2go byte stream
INTERPRO2GO_CITATION = "Blum et al. (2024) Nucl. Acids Res. 53:D444–D456"


def interpro2go_header(date_str: str) -> list[str]:
    """The interpro2go ``!`` comment block (flatfiles.py:58-63),
    reproduced byte-for-byte INCLUDING the reference's missing-newline
    quirk: ``fh.write("!contact:interhelp@ebi.ac.uk")`` has no ``\\n``
    and the next write is ``"!\\n"``, so the actual emitted line is
    ``!contact:interhelp@ebi.ac.uk!``. ``date_str`` replaces the
    reference's ``datetime.now()`` (a deterministic build stamps the
    release date instead of wall-clock)."""
    return [
        f"!date: {date_str}",
        "!Mapping of InterPro entries to GO",
        "!external resource: https://www.ebi.ac.uk/interpro",
        f"!citation: {INTERPRO2GO_CITATION}",
        "!contact:interhelp@ebi.ac.uk!",
    ]


def parent_child_tree_lines(entries: DataFrame) -> list[str]:
    """ParentChildTreeFile.txt (flatfiles.py:20-27,70-86), exactly as
    the reference renders it: iterate entries in accession order and
    start an indented DFS block at EVERY entry that has children (not
    only at hierarchy roots — a mid-level parent therefore appears
    both inside its parent's block and as its own block head, and so
    do its descendants); each line is ``'-'*2*level`` + ``acc::name::``
    with the trailing ``::``, children visited in sorted order.

    Driver-side over the collected entry dimension, like the
    reference's pickled-entries loop (the hierarchy is
    dimension-sized); ``entries`` needs (entry_acc, name, parent_acc).
    The roots-only, no-trailing-``::`` rendering used by the
    ``z_hierarchy_flat_dfs`` catalog query lives in
    operators/graph.py::hierarchy_flat_dfs.
    """
    rows = entries.select("entry_acc", "name", "parent_acc").collect()
    names = {r.entry_acc: r.name for r in rows}
    children: dict[str, list[str]] = {}
    for r in rows:
        if r.parent_acc is not None:
            children.setdefault(r.parent_acc, []).append(r.entry_acc)

    lines: list[str] = []

    def walk(acc: str, level: int) -> None:
        lines.append("-" * 2 * level + f"{acc}::{names[acc]}::")
        for kid in sorted(children.get(acc, [])):
            walk(kid, level + 1)

    for acc in sorted(names):
        if acc in children:
            walk(acc, 0)
    return lines
