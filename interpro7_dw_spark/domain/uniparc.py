"""UniParc match+site merge (reference interpro/oracle/uniparc.py:
156-390 — the export-uniparc task, budgeted 48h / 16 cpu / 50 GB).

Semantics re-derived:
- rows group into one match per (upi, analysis_id, model-or-signature)
  with per-library score quirks (uniparc.py:233-288):
  CATH-Gene3D keeps the best score/evalue across locations; CDD's
  match-level score/evalue are dropped; HAMAP / PRINTS / PROSITE
  profiles keep per-location scores (SEQ_SCORE) and drop the match
  score;
- locations sort by (start, end), carry hmm coordinates, mapped
  hmmBounds, and parsed fragments (domain/fragments.py);
- sites join onto locations by the composite key
  (upi, signature, loc_start, loc_end) — SURVEY.md §2.3 J10 — and
  nest as {description, numLocations, siteLocations}.

Spark shape: one groupBy for sites, one for locations-per-match, one
composite-key left join; library dispatch is a when-chain (the X4
17-way formatting pattern) — no Python kernels anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .fragments import parse_fragments

HMM_BOUNDS = {
    "[]": "COMPLETE",
    "[.": "N_TERMINAL_COMPLETE",
    ".]": "C_TERMINAL_COMPLETE",
    "..": "INCOMPLETE",
}

_LOC_SCORE_LIBS = ("HAMAP", "PRINTS", "PROSITE profiles")


def _hmm_bounds_col(col):
    expr = F.lit(None).cast("string")
    for k, v in HMM_BOUNDS.items():
        expr = F.when(col == k, F.lit(v)).otherwise(expr)
    return expr


def merge_uniparc_matches(
    matches: DataFrame,
    sites: DataFrame,
    analyses: DataFrame,  # analysis_id, library, version
) -> DataFrame:
    """matches: MV_IPRSCAN-shaped rows (analysis_id, upi,
    signature_acc, model_acc, seq_start, seq_end, hmm_start, hmm_end,
    hmm_length, hmm_bounds, env_start, env_end, seq_score, seq_evalue,
    dom_score, dom_evalue, seq_feature, fragments).
    sites: (upi, signature_acc, loc_start, loc_end, residue,
    res_start, res_end, description).

    Returns one row per (upi, analysis_id, match_key) with match-level
    score/evalue and a sorted locations array, each location carrying
    its nested sites.
    """
    m = (
        matches.join(F.broadcast(analyses), "analysis_id")
        .withColumn("match_key", F.coalesce("model_acc", "signature_acc"))
        .withColumn(
            "loc_score",
            F.when(F.col("library").isin(*_LOC_SCORE_LIBS), F.col("seq_score"))
            .otherwise(F.col("dom_score")),
        )
    )

    site_groups = (
        sites.groupBy("upi", "signature_acc", "loc_start", "loc_end", "description")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("res_start", "res_end", "residue"))
            ).alias("siteLocations")
        )
        .groupBy("upi", "signature_acc", "loc_start", "loc_end")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("description").alias("description"),
                        F.size("siteLocations").alias("numLocations"),
                        F.col("siteLocations").alias("siteLocations"),
                    )
                )
            ).alias("sites")
        )
    )

    # The reference POPs the sites dict (uniparc.py:364-378): only the
    # FIRST match with a given signature — and within it the first
    # location with a given (start, end) — receives the sites; later
    # duplicates get []. Replicate by ranking candidate rows per
    # (upi, signature, start, end) and attaching sites to rank 1 only.
    pop_w = Window.partitionBy("upi", "signature_acc", "seq_start", "seq_end").orderBy(
        "analysis_id", "match_key", "hmm_start", "hmm_end"
    )
    m = m.withColumn("__site_rank", F.row_number().over(pop_w))

    located = m.join(
        site_groups,
        (m["upi"] == site_groups["upi"])
        & (m["signature_acc"] == site_groups["signature_acc"])
        & (m["seq_start"] == site_groups["loc_start"])
        & (m["seq_end"] == site_groups["loc_end"])
        & (m["__site_rank"] == F.lit(1)),
        "left",
    ).select(
        m["*"],
        F.coalesce(
            site_groups["sites"],
            F.expr(
                "CAST(array() AS array<struct<description string, numLocations int,"
                " siteLocations array<struct<res_start bigint, res_end bigint, residue string>>>>)"
            ),
        ).alias("sites"),
    )

    loc = located.withColumn(
        "location",
        F.struct(
            F.col("seq_start").alias("start"),
            F.col("seq_end").alias("end"),
            F.col("hmm_start").alias("hmmStart"),
            F.col("hmm_end").alias("hmmEnd"),
            F.col("hmm_length").alias("hmmLength"),
            _hmm_bounds_col(F.col("hmm_bounds")).alias("hmmBounds"),
            F.col("env_start").alias("envelopeStart"),
            F.col("env_end").alias("envelopeEnd"),
            F.col("dom_evalue").alias("evalue"),
            F.col("loc_score").alias("score"),
            parse_fragments(
                F.col("seq_start"), F.col("seq_end"), F.col("fragments")
            ).alias("location_fragments"),
            F.col("seq_feature").alias("sequence_feature"),
            F.col("sites").alias("sites"),
        ),
    )

    first_w = Window.partitionBy("upi", "analysis_id", "match_key").orderBy(
        "seq_start", "seq_end"
    )
    return (
        loc.withColumn("__rn", F.row_number().over(first_w))
        .groupBy("upi", "analysis_id", "match_key")
        .agg(
            F.first("library").alias("library"),
            F.first("version").alias("version"),
            F.first("signature_acc").alias("signature_acc"),
            F.first("model_acc").alias("model_acc"),
            # match-level score/evalue per library quirks
            F.max("seq_score").alias("__max_score"),
            F.min("seq_evalue").alias("__min_evalue"),
            F.max(F.when(F.col("__rn") == 1, F.col("seq_score"))).alias("__first_score"),
            F.max(F.when(F.col("__rn") == 1, F.col("seq_evalue"))).alias("__first_evalue"),
            F.array_sort(F.collect_list(F.struct(F.col("location")))).alias("__locs"),
        )
        .select(
            "upi",
            "analysis_id",
            "match_key",
            "signature_acc",
            "model_acc",
            "library",
            "version",
            F.when(F.col("library") == "CATH-Gene3D", F.col("__max_score"))
            .when(F.col("library") == "CDD", F.lit(None))
            .when(F.col("library").isin(*_LOC_SCORE_LIBS), F.lit(None))
            .otherwise(F.col("__first_score"))
            .alias("score"),
            F.when(F.col("library") == "CATH-Gene3D", F.col("__min_evalue"))
            .when(F.col("library") == "CDD", F.lit(None))
            .otherwise(F.col("__first_evalue"))
            .alias("evalue"),
            F.expr("transform(__locs, x -> x.location)").alias("locations"),
        )
    )


def i5_analysis_name(lib: F.Column) -> F.Column:
    """InterProScan analysis name for a member-db display name
    (reference get_i5_appl, interpro/oracle/lookup.py:328-334):
    CATH renames, else upper-case with spaces to underscores."""
    return (
        F.when(lib == "CATH-FunFam", F.lit("FUNFAM"))
        .when(lib == "CATH-Gene3D", F.lit("GENE3D"))
        .otherwise(F.upper(F.regexp_replace(lib, " ", "_")))
    )


def lookup_site_rows(merged: DataFrame, sequences: DataFrame) -> DataFrame:
    """LOOKUP_SITE rows (reference insert_sites, interpro/oracle/
    lookup.py:280-326): the 4-level explode matches -> locations ->
    sites -> siteLocations over the typed merge output
    (:func:`merge_uniparc_matches`), keyed by the sequence md5 with
    its 3-char list-partition prefix (lookup.py:299-300) and the I5
    analysis-name mapping. Locations without sites contribute no rows
    (``explode`` drops empty arrays exactly like the nested loops).

    ``sequences``: upi, md5. Spark shape: broadcast-or-SMJ join on
    upi, then three generator expands — narrow after the join, no
    extra shuffle.
    """
    return (
        merged.join(sequences, "upi")
        .select(
            "md5",
            i5_analysis_name(F.col("library")).alias("analysis"),
            "version",
            "signature_acc",
            F.explode("locations").alias("loc"),
        )
        .select(
            "md5",
            "analysis",
            "version",
            "signature_acc",
            F.col("loc.start").alias("loc_start"),
            F.col("loc.end").alias("loc_end"),
            F.explode("loc.sites").alias("site"),
        )
        .select(
            "md5",
            F.substring("md5", 1, 3).alias("md5_prefix"),
            "analysis",
            "version",
            "signature_acc",
            "loc_start",
            "loc_end",
            F.col("site.numLocations").alias("num_sites"),
            F.col("site.description").alias("description"),
            F.explode("site.siteLocations").alias("sl"),
        )
        .select(
            "md5",
            "md5_prefix",
            "analysis",
            "version",
            "signature_acc",
            "loc_start",
            "loc_end",
            "num_sites",
            F.col("sl.residue").alias("residue"),
            F.col("sl.res_start").alias("res_start"),
            F.col("sl.res_end").alias("res_end"),
            "description",
        )
    )
