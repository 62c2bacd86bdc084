"""IntAct PSI-MI TAB interaction extraction.

Re-expresses the reference's IntAct parser
(`/root/reference/interpro7dw/intact.py:24-133`) as pure JVM column
expressions over an already-loaded PSI-MI TAB relation (the headerless
42-column TSV source itself is `sources/readers.read_tsv`, exercised
by `z_source_psimi_tsv`). The reference walks the file row by row in
Python; here every extraction rule is a `regexp_extract` inside
whole-stage codegen, so the transform scales linearly with input
partitions and involves exactly one shuffle (the per-(entry,
interaction) dedup window).

Rules reproduced (reference line cites):

- InterPro accessions are the `IPR\\d{6}` matches found in the two
  interaction-feature columns (intact.py:35-40); a row with no match
  is skipped.
- Interaction id: first `intact:(EBI-\\d+)` in the interaction
  identifiers column (intact.py:128-131).
- Interactor accession: first `uniprotkb:([A-Z0-9]+)` in the ID
  column (intact.py:101-104).
- Interactor name: the PSI-MI `display_long` alias upper-cased, else
  the first `uniprotkb:` alias as-is (intact.py:106-113).
- Interactor type: only taken when the types column holds a single
  value (no pipe), via `psi-mi:"MI:\\d+"\\(([^)]+)\\)`
  (intact.py:115-120).
- PubMed id: first `pubmed:(\\d+)` (intact.py:123-125).
- A row contributes only when ALL of interaction id, both interactor
  triples and the PubMed id resolved (intact.py:56-66).
- Per (entry, interaction id) the reference keeps the LAST file row
  (dict overwrite, intact.py:82-86). File order is not a distributed
  notion, so the caller supplies an ``ord`` column (file/row position
  or any total order) and the transform keeps the max-``ord`` row —
  the same row the reference keeps when ``ord`` is file position.

All regexes carry ``(?i)`` exactly where the reference passes
``re.I``; the accession scan (intact.py:36) is case-sensitive there
and stays so here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _nonempty(c: Column) -> Column:
    """regexp_extract misses are '' in Spark; normalize to NULL so the
    all-fields-present filter is one null check per field."""
    return F.nullif(c, F.lit(""))


def _uniprot_acc(c: str) -> Column:
    return _nonempty(F.regexp_extract(F.col(c), r"(?i)uniprotkb:([A-Z0-9]+)", 1))


def _display_name(c: str) -> Column:
    long = _nonempty(
        F.regexp_extract(F.col(c), r"(?i)psi-mi:([^(]+)\(display_long\)", 1)
    )
    fallback = _nonempty(F.regexp_extract(F.col(c), r"(?i)uniprotkb:([^(|]+)", 1))
    return F.coalesce(F.upper(long), fallback)


def _molecule_type(c: str) -> Column:
    single = ~F.col(c).contains("|")
    return F.when(
        single,
        _nonempty(
            F.regexp_extract(F.col(c), r'(?i)psi-mi:"MI:\d+"\(([^)]+)\)', 1)
        ),
    )


def interpro_interactions(psimi: DataFrame) -> DataFrame:
    """Flat (entry_acc, interaction) relation from PSI-MI TAB rows.

    Expects columns named for the PSI-MI roles the reference indexes
    by position: ``ids_a``/``ids_b`` (cols 0-1), ``aliases_a``/
    ``aliases_b`` (4-5), ``publication_ids`` (8),
    ``interaction_ids`` (13), ``type_a``/``type_b`` (20-21),
    ``feature_a``/``feature_b`` (36-37), plus ``ord`` (total order
    standing in for file position; see module docstring).

    Returns one row per (entry_acc, intact_id): ``entry_acc,
    intact_id, pubmed_id, acc_1, name_1, type_1, acc_2, name_2,
    type_2``.
    """
    accs = F.array_distinct(
        F.expr(
            "regexp_extract_all("
            "concat_ws('|', feature_a, feature_b), 'IPR\\\\d{6}', 0)"
        )
    )
    extracted = (
        psimi.withColumn("entry_accs", accs)
        .where(F.size("entry_accs") > 0)
        .select(
            "entry_accs",
            "ord",
            _nonempty(
                F.regexp_extract("interaction_ids", r"(?i)intact:(EBI-\d+)", 1)
            ).alias("intact_id"),
            _nonempty(F.regexp_extract("publication_ids", r"(?i)pubmed:(\d+)", 1))
            .cast("int")
            .alias("pubmed_id"),
            _uniprot_acc("ids_a").alias("acc_1"),
            _display_name("aliases_a").alias("name_1"),
            _molecule_type("type_a").alias("type_1"),
            _uniprot_acc("ids_b").alias("acc_2"),
            _display_name("aliases_b").alias("name_2"),
            _molecule_type("type_b").alias("type_2"),
        )
        .where(
            F.col("intact_id").isNotNull()
            & F.col("pubmed_id").isNotNull()
            & F.col("acc_1").isNotNull()
            & F.col("name_1").isNotNull()
            & F.col("type_1").isNotNull()
            & F.col("acc_2").isNotNull()
            & F.col("name_2").isNotNull()
            & F.col("type_2").isNotNull()
        )
    )
    per_entry = extracted.select(
        F.explode("entry_accs").alias("entry_acc"),
        "intact_id",
        "pubmed_id",
        "acc_1",
        "name_1",
        "type_1",
        "acc_2",
        "name_2",
        "type_2",
        "ord",
    )
    w = Window.partitionBy("entry_acc", "intact_id").orderBy(F.col("ord").desc())
    return (
        per_entry.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "ord")
    )
