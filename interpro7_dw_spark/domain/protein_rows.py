"""Per-protein row tables: webfront_proteinfeature,
webfront_proteinresidue, webfront_interpro_n.

- ``feature_rows`` (reference interpro/oracle/matches.py:547-582
  ``_merge_feature_matches`` + interpro/mysql/proteins.py:12-85
  ``populate_features``): sequence-feature matches joined to the
  feature dim, with the reference's db-specific rules — MobiDB-lite
  null features default to ``Consensus Disorder Prediction``
  (matches.py:568-570), AntiFam and Pfam-N rows are excluded from the
  table (proteins.py:48-51), ELM shows the feature name and
  CATH-FunFam is renamed ``funfam`` and shows the description
  (proteins.py:54-58). The reference merges per-protein then
  re-explodes at insert; flat rows in = flat rows out, so the Spark
  shape is a pure narrow map over the scan — no shuffle at all.

- ``residue_rows`` (reference interpro/oracle/matches.py:415-475
  site-match export + interpro/mysql/proteins.py:603-663
  ``populate_residues``): one row per (protein, signature,
  description) with the ``fragments`` JSON — the (residue, start,
  end) triples sorted by (start, end) (matches.py:470-475), rendered
  as JSON arrays exactly like ``json.dumps`` of the reference's
  tuples; null-description sites dropped (matches.py:440-441);
  entry_name falls back to the accession (proteins.py:641).

- ``interpro_n_rows`` (reference interpro/mysql/proteins.py:101-177
  ``populate_toad_matches``): deep-learning (InterPro-N/TOAD) matches
  compared against traditional matches of the same signature —
  ``in_interpro`` marks signatures matched by both, ``is_preferred``
  uses the reference's 5% coverage margin rule
  (toad_cov > trad_cov * 1.05, proteins.py:145-151; coverage =
  plain fragment-length sum WITHOUT interval union,
  proteins.py:181-187), unmatched signatures are preferred
  unconditionally. InterPro entries themselves are excluded on both
  sides by the callers (proteins.py:133-139).

All JSON is compact (repo-wide canonical form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feature_rows(feature_matches: DataFrame, feature_dim: DataFrame) -> DataFrame:
    """webfront_proteinfeature rows.

    ``feature_matches``: protein_acc, dbcode, accession, pos_start,
    pos_end, seq_feature (nullable).
    ``feature_dim``: dbcode, accession, name, description, database,
    evidence (the per-signature metadata, matches.py:560).
    """
    j = feature_matches.join(
        F.broadcast(feature_dim), ["dbcode", "accession"]
    ).withColumn("db", F.lower("database"))
    j = j.filter(~F.col("db").isin("antifam", "pfam-n"))
    seq = F.when(
        F.col("seq_feature").isNull() & (F.col("db") == "mobidblt"),
        F.lit("Consensus Disorder Prediction"),
    ).otherwise(F.col("seq_feature"))
    seq = (
        F.when(F.col("db") == "elm", F.col("name"))
        .when(F.col("db") == "cathfunfam", F.col("description"))
        .otherwise(seq)
    )
    return j.select(
        "protein_acc",
        F.col("accession").alias("entry_acc"),
        F.when(F.col("db") == "cathfunfam", F.lit("funfam"))
        .otherwise(F.col("db"))
        .alias("source_database"),
        F.col("pos_start").alias("location_start"),
        F.col("pos_end").alias("location_end"),
        seq.alias("sequence_feature"),
    )


def residue_rows(residues: DataFrame, signature_dim: DataFrame) -> DataFrame:
    """webfront_proteinresidue rows.

    ``residues``: protein_acc, signature_acc, description (nullable —
    dropped when null), residue, pos_start, pos_end.
    ``signature_dim``: signature_acc, name (nullable), database.
    """
    return (
        residues.filter(F.col("description").isNotNull())
        .join(F.broadcast(signature_dim), "signature_acc")
        .groupBy("protein_acc", "signature_acc", "description")
        .agg(
            F.first("name").alias("name"),
            F.first("database").alias("database"),
            F.concat(
                F.lit("["),
                F.expr(
                    "array_join(transform(array_sort(collect_list(struct("
                    "pos_start, pos_end, residue))),"
                    " x -> concat('[\"', x.residue, '\",', x.pos_start,"
                    " ',', x.pos_end, ']')), ',')"
                ),
                F.lit("]"),
            ).alias("fragments"),
        )
        .select(
            "protein_acc",
            F.col("signature_acc").alias("entry_acc"),
            F.coalesce("name", "signature_acc").alias("entry_name"),
            F.lower("database").alias("source_database"),
            "description",
            "fragments",
        )
    )


def _coverage(locations_col: str) -> F.Column:
    # plain fragment-length sum, no union (mysql/proteins.py:181-187)
    return F.expr(
        f"aggregate(flatten(transform({locations_col}, l -> l.fragments)),"
        " 0, (a, f) -> a + f.pos_end - f.pos_start + 1)"
    )


def _locations_json(locations_col: str) -> F.Column:
    return F.concat(
        F.lit("["),
        F.expr(
            f"array_join(transform({locations_col}, l -> concat("
            "'{\"fragments\":[',"
            " array_join(transform(l.fragments, f -> concat("
            "'{\"start\":', f.pos_start, ',\"end\":', f.pos_end, '}')), ','),"
            " ']}')), ',')"
        ),
        F.lit("]"),
    )


def interpro_n_rows(toad: DataFrame, trad: DataFrame) -> DataFrame:
    """webfront_interpro_n rows.

    ``toad``: protein_acc, entry_acc, locations
    (array<struct<fragments: array<struct<pos_start, pos_end>>>>) —
    one output row per input row, like the reference loop.
    ``trad``: same shape, at most one row per (protein_acc, entry_acc)
    (the reference keys a dict by accession, proteins.py:133-136).
    """
    trad_cov = trad.select(
        "protein_acc",
        "entry_acc",
        _coverage("locations").alias("trad_cov"),
    )
    return (
        toad.withColumn("toad_cov", _coverage("locations"))
        .join(trad_cov, ["protein_acc", "entry_acc"], "left")
        .select(
            "protein_acc",
            "entry_acc",
            _locations_json("locations").alias("locations"),
            F.col("trad_cov").isNotNull().alias("in_interpro"),
            F.when(
                F.col("trad_cov").isNotNull(),
                F.col("toad_cov") > F.col("trad_cov") * 1.05,
            )
            .otherwise(F.lit(True))
            .alias("is_preferred"),
        )
    )
