"""merge_protein_matches — the reference's match-merge task
(interpro/oracle/matches.py:287-393, the X1 UDF family of SURVEY.md
§2.11) as one DataFrame job:

  classify -> representative selection (domains, families)
           -> per-signature location lists (sorted)
           -> per-entry condensed locations

Spark-first layout: the only Python step is the capped independent-set
search (repr_domains.py); classification, grouping, sorting and
condensation are JVM-side column work. Signature/entry dims broadcast
(the reference ships them to workers as pickles,
interpro/oracle/matches.py:277-279).

Scale: one shuffle on protein_acc for the grouped-map step, one on
(protein, signature) and one on (protein, entry) for the groupings —
all AQE-coalesced; no driver-side collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..caching import owned_persist
from .fragments import condense_locations_col, parse_fragments
from .repr_domains import repr_id_sets

# database priority orders for representative selection
# (reference interpro/oracle/entries.py:14-19)
REPR_DOM_DATABASES = ["pfam", "cdd", "profile", "smart", "ncbifam", "cathgene3d", "ssf"]
REPR_DOM_TYPES = ["domain", "repeat", "conserved_site", "homologous_superfamily"]
REPR_FAM_DATABASES = ["pfam", "panther", "pirsf", "hamap", "ncbifam", "sfld"]
REPR_FAM_TYPES = ["family"]

PANTHER_SUBFAMILY = r"PTHR\d+:SF\d+"


def _rank_expr(dbs: list[str]):
    expr = F.lit(None).cast("int")
    for i, db in reversed(list(enumerate(dbs))):
        expr = F.when(F.col("db_lc") == db, F.lit(i)).otherwise(expr)
    return expr


def classify_matches(matches: DataFrame, signatures: DataFrame) -> DataFrame:
    """Join matches to their signature dim; derive class
    (domain/family/region) + database rank + parsed fragments."""
    m = (
        # LEFT join + row-level guard: the reference indexes the dim dict
        # and raises KeyError on unknown signatures (matches.py:292) —
        # dim/fact drift must surface, not silently drop matches. The
        # guard rides the `database` column (used downstream, so never
        # pruned) and raises JVM-side with zero extra passes.
        matches.join(F.broadcast(signatures), "signature_acc", "left")
        .withColumn(
            "database",
            F.when(
                F.col("database").isNull(),
                F.raise_error(
                    F.concat(F.lit("unknown signature: "), F.col("signature_acc"))
                ),
            ).otherwise(F.col("database")),
        )
        .withColumn("db_lc", F.lower("database"))
        .withColumn("type_lc", F.lower("type"))
        .withColumn(
            "frags",
            parse_fragments(F.col("pos_from"), F.col("pos_to"), F.col("fragments")),
        )
        .withColumn(
            "klass",
            F.when(
                F.col("db_lc").isin(REPR_DOM_DATABASES) & F.col("type_lc").isin(REPR_DOM_TYPES),
                F.lit("domain"),
            )
            .when(
                F.col("db_lc").isin(REPR_FAM_DATABASES) & F.col("type_lc").isin(REPR_FAM_TYPES),
                F.lit("family"),
            )
            .otherwise(F.lit("region")),
        )
        .withColumn(
            "rank",
            F.when(F.col("klass") == "domain", _rank_expr(REPR_DOM_DATABASES))
            .when(F.col("klass") == "family", _rank_expr(REPR_FAM_DATABASES))
            .otherwise(F.lit(None).cast("int")),
        )
        .withColumn(
            # score joins the key to make the order TOTAL: without it,
            # two matches sharing (sig, model, span) but differing in
            # score tie, and row_number's tie fallback is shuffle-read
            # order — the representative flag would then land on an
            # engine/run-dependent location (caught by the sf0.1
            # byte-exact differ; rows identical in score too are fully
            # interchangeable, so their tie is harmless)
            "domain_id",
            F.row_number().over(
                Window.partitionBy("protein_acc").orderBy(
                    "signature_acc",
                    "model_acc",
                    "pos_from",
                    "pos_to",
                    # explicit: Spark's asc default is NULLS FIRST but
                    # DuckDB's is NULLS LAST — pin it on both sides so
                    # nullable member-db scores order identically
                    F.asc_nulls_first("score"),
                )
            ).cast("long"),
        )
    )
    return m


def _flag_representatives(classified: DataFrame) -> DataFrame:
    """Representative selection for the domain and family classes in
    ONE grouped pass over (protein, class) — the reference runs its
    selection twice per protein (matches.py:326-331), but the classes
    are independent, so a composite group key folds both runs into a
    single shuffle + Arrow batch. Regions are never representative.

    The kernel's per-(protein, class) rep_id ARRAYS fold to ONE array
    per protein (domain_id is unique within a protein, so the flatten
    loses nothing) and attach back with a protein_acc-keyed join +
    array_contains, instead of exploding to per-match rows and joining
    on (protein, domain_id): the grouped aggregates and the join all
    reuse the domain_id window's protein_acc partitioning (guide §2.4
    — hash partitioning on protein_acc satisfies every
    (protein_acc, ...) clustering requirement, and a single-key join
    on protein_acc is co-partitioned without further exchanges), the
    join's build side is PROTEIN-sized instead of match-sized, and the
    region rows need no separate union branch — their domain_ids are
    never in rep_ids (proteins with only regions match no row at
    all), so array_contains/the coalesce lands their literal False."""
    rep_sets = (
        repr_id_sets(
            classified.filter(F.col("klass") != "region").select(
                "protein_acc",
                "klass",
                "domain_id",
                "rank",
                F.expr(
                    "transform(frags, f -> struct(f.start AS start, f.end AS end))"
                ).alias("fragments"),
            ),
            group_cols=("protein_acc", "klass"),
        )
        .groupBy("protein_acc")
        .agg(F.flatten(F.collect_list("rep_ids")).alias("rep_ids"))
    )
    return (
        classified.join(rep_sets, ["protein_acc"], "left")
        .withColumn(
            "representative",
            F.coalesce(
                F.array_contains("rep_ids", F.col("domain_id")), F.lit(False)
            ),
        )
        .drop("rep_ids")
    )


def merge_protein_matches(
    matches: DataFrame, signatures: DataFrame, entries: DataFrame
) -> DataFrame:
    """Produce the protein2matches mart: one row per
    (protein, signature) and one per (protein, integrated entry).

    Columns: protein_acc, accession, source_database, type, entry_acc,
    locations — signature rows carry
    array<struct<fragments, representative, model, score, subfamily>>;
    entry rows carry condensed single-fragment locations
    (representative always false, reference matches.py:377-391).
    """
    flagged = _flag_representatives(classify_matches(matches, signatures))

    subfam_names = signatures.select(
        F.col("signature_acc").alias("model_acc"),
        F.col("name").alias("subfamily_name"),
    )
    # persisted: BOTH output branches (per-signature rows and per-entry
    # condensed rows) consume this relation — without the persist each
    # branch re-ran the classify chain (scan + broadcast dim joins +
    # fragment parse + the per-protein domain_id window) from the
    # source (guide §2.4; the r15 before-plan shows the subtree
    # twice). The entry branch used to prune the Arrow representative
    # kernel away, but one cached pass that includes it is cheaper
    # than two uncached classify passes (measured, PERF/OPTIMIZATION
    # r15). O(|matches|) cache, released by the consumer's
    # engine_cache_scope (caching.py).
    with_subfam = owned_persist(
        flagged.join(F.broadcast(subfam_names), "model_acc", "left").withColumn(
            "subfamily",
            F.when(
                F.col("model_acc").rlike(f"^{PANTHER_SUBFAMILY}$"),
                F.struct(
                    F.col("model_acc").alias("accession"),
                    F.col("subfamily_name").alias("name"),
                ),
            ),
        )
    )

    sig_rows = (
        with_subfam.groupBy("protein_acc", "signature_acc")
        .agg(
            F.first("database").alias("source_database"),
            F.first("type").alias("type"),
            F.first("entry_acc").alias("entry_acc"),
            # sort locations by the leftmost fragment (start, end) —
            # reference matches.py:371-374; sort key leads the struct,
            # then is projected away
            F.expr(
                """
                transform(
                  array_sort(collect_list(struct(
                    frags[0].start AS k1, frags[0].end AS k2,
                    struct(frags AS fragments, representative AS representative,
                           coalesce(model_acc, signature_acc) AS model,
                           score AS score, subfamily AS subfamily) AS loc))),
                  x -> x.loc)
                """
            ).alias("locations"),
        )
        .select(
            "protein_acc",
            F.col("signature_acc").alias("accession"),
            "source_database",
            "type",
            "entry_acc",
            # Byte-fidelity JSON (reference matches.py:350-365): keys
            # fragments/representative/model/score always present (nulls
            # emitted), fragment status key is hyphenated `dc-status`,
            # and `subfamily` appears ONLY on PANTHER subfamily rows —
            # so the array is assembled from per-location to_json calls
            # (ignoreNullFields=false) rather than one array-level
            # to_json, which couldn't drop the key conditionally.
            F.concat(
                F.lit("["),
                F.concat_ws(
                    ",",
                    F.expr(
                        """
                        transform(locations, loc ->
                          CASE WHEN loc.subfamily IS NULL THEN
                            to_json(struct(
                              transform(loc.fragments, f -> struct(
                                f.start AS start, f.end AS end,
                                f.dc_status AS `dc-status`)) AS fragments,
                              loc.representative AS representative,
                              loc.model AS model,
                              loc.score AS score),
                              map('ignoreNullFields', 'false'))
                          ELSE
                            to_json(struct(
                              transform(loc.fragments, f -> struct(
                                f.start AS start, f.end AS end,
                                f.dc_status AS `dc-status`)) AS fragments,
                              loc.representative AS representative,
                              loc.model AS model,
                              loc.score AS score,
                              loc.subfamily AS subfamily),
                              map('ignoreNullFields', 'false'))
                          END)
                        """
                    ),
                ),
                F.lit("]"),
            ).alias("locations"),
        )
    )

    entry_rows = (
        with_subfam.filter(F.col("entry_acc").isNotNull())
        .groupBy("protein_acc", "entry_acc")
        .agg(condense_locations_col(F.collect_list("frags")).alias("condensed"))
        .join(F.broadcast(entries.select("entry_acc", F.col("type").alias("etype"))), "entry_acc", "left")
        .select(
            "protein_acc",
            F.col("entry_acc").alias("accession"),
            F.lit("INTERPRO").alias("source_database"),
            F.col("etype").alias("type"),
            "entry_acc",
            # null model/score keys are always present in the reference
            # output (matches.py:377-391) -> ignoreNullFields=false; the
            # status key is hyphenated `dc-status`.
            F.to_json(
                F.expr(
                    """
                    transform(condensed, c ->
                      struct(array(struct(c.start AS start, c.end AS end,
                                          'CONTINUOUS' AS `dc-status`)) AS fragments,
                             false AS representative,
                             CAST(NULL AS string) AS model,
                             CAST(NULL AS double) AS score))
                    """
                ),
                {"ignoreNullFields": "false"},
            ).alias("locations"),
        )
    )

    return sig_rows.unionByName(entry_rows)
