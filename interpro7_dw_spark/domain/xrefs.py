"""Cross-reference layer operators (SURVEY.md §2.4 A11, §2.9 G7).

``sim_entries`` — the entry-similarity graph
(interpro/xrefs/entries.py:15,28-136): per protein, for each pair of
InterPro entries, flag whether any location pair overlaps >= 50% of
either side's location; aggregate the per-protein flags, derive
Jaccard-style coefficients and containment indices, keep pairs over
the 0.75 threshold with the homologous-superfamily type rule.
Spark-first: the per-protein pair explosion is a self-join on
protein_acc; the existence checks are nested array HOFs (JVM-side);
the aggregation is one groupBy over pair keys — no driver dicts.

``filter_ec_numbers`` — the EC coverage filter
(interpro/xrefs/entries.py:520-551): keep (entry, EC) terms backed by
>= 3 proteins covering >= 60% of the entry's proteins; ECs that meet
the count but miss the coverage fall back to their 3-digit stem —
stems shared by > 1 failing EC pass if the union of their member
proteins meets both thresholds (prefix matching, faithfully including
the reference's string-prefix semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MIN_SIMILARITY = 0.75
_SUPFAM = "homologous_superfamily"
_SIM_TYPES = (_SUPFAM, "domain", "family", "repeat")


def _overlaps_half_of_a(a: Column, b: Column) -> Column:
    """exists l1 in a, l2 in b: overlap(l1,l2) >= 0.5 * len(l1)."""
    return F.exists(
        a,
        lambda l1: F.exists(
            b,
            lambda l2: (
                F.least(l1["end"], l2["end"]) - F.greatest(l1["start"], l2["start"]) + 1
            )
            >= (l1["end"] - l1["start"] + 1) * 0.5,
        ),
    )


def sim_entries(entry_locations: DataFrame, min_similarity: float = MIN_SIMILARITY) -> DataFrame:
    """Similar-entry pairs.

    Input: one row per (protein_acc, entry_acc) with ``entry_type``
    (lowercase) and ``locations`` array<struct<start,end>> (condensed,
    single-fragment — as produced by merge_protein_matches entry rows).
    Output: (entry_acc, other_acc) similar pairs, entry_acc > other_acc.
    """
    num_proteins = entry_locations.groupBy("entry_acc").agg(
        F.count("*").alias("n_proteins")
    )
    types = entry_locations.select("entry_acc", "entry_type").distinct()

    hi = entry_locations.select(
        "protein_acc",
        F.col("entry_acc").alias("hi"),
        F.col("locations").alias("hi_locs"),
    )
    lo = entry_locations.select(
        "protein_acc",
        F.col("entry_acc").alias("lo"),
        F.col("locations").alias("lo_locs"),
    )
    pair_flags = (
        hi.join(lo, "protein_acc")
        .filter(F.col("lo") < F.col("hi"))
        .select(
            "hi",
            "lo",
            _overlaps_half_of_a(F.col("hi_locs"), F.col("lo_locs")).cast("int").alias("f_hi"),
            _overlaps_half_of_a(F.col("lo_locs"), F.col("hi_locs")).cast("int").alias("f_lo"),
        )
        .groupBy("hi", "lo")
        .agg(F.sum("f_hi").alias("cnt_hi"), F.sum("f_lo").alias("cnt_lo"))
    )

    n_hi = num_proteins.select(F.col("entry_acc").alias("hi"), F.col("n_proteins").alias("n_hi"))
    n_lo = num_proteins.select(F.col("entry_acc").alias("lo"), F.col("n_proteins").alias("n_lo"))
    t_hi = types.select(F.col("entry_acc").alias("hi"), F.col("entry_type").alias("type_hi"))
    t_lo = types.select(F.col("entry_acc").alias("lo"), F.col("entry_type").alias("type_lo"))

    coef1 = F.col("cnt_hi") / (F.col("n_hi") + F.col("n_lo") - F.col("cnt_hi"))
    coef2 = F.col("cnt_lo") / (F.col("n_hi") + F.col("n_lo") - F.col("cnt_lo"))
    coef = (coef1 + coef2) * 0.5
    cont1 = F.col("cnt_hi") / F.col("n_hi")
    cont2 = F.col("cnt_lo") / F.col("n_lo")

    type_rule = (
        ((F.col("type_hi") == _SUPFAM) & F.col("type_lo").isin(*_SIM_TYPES))
        | ((F.col("type_lo") == _SUPFAM) & F.col("type_hi").isin(*_SIM_TYPES))
    )

    return (
        pair_flags.join(F.broadcast(n_hi), "hi")
        .join(F.broadcast(n_lo), "lo")
        .join(F.broadcast(t_hi), "hi")
        .join(F.broadcast(t_lo), "lo")
        .filter(
            ((coef >= min_similarity) | (cont1 >= min_similarity) | (cont2 >= min_similarity))
            & type_rule
        )
        .select(F.col("hi").alias("entry_acc"), F.col("lo").alias("other_acc"))
    )


def filter_ec_numbers(
    entry_ec_proteins: DataFrame,
    entry_totals: DataFrame,
    min_count: int = 3,
    min_coverage: float = 0.6,
) -> DataFrame:
    """Keep well-supported (entry_acc, term) pairs; term is either a
    full EC number or a 3-digit stem rescued by the fallback rule.

    ``entry_ec_proteins``: (entry_acc, ec, protein_acc) distinct rows.
    ``entry_totals``: (entry_acc, n_proteins).
    """
    counts = entry_ec_proteins.groupBy("entry_acc", "ec").agg(
        F.countDistinct("protein_acc").alias("cnt")
    )
    return filter_ec_numbers_from_counts(
        counts, entry_ec_proteins, entry_totals, min_count, min_coverage
    )


def filter_ec_numbers_from_counts(
    ec_counts: DataFrame,
    entry_ec_proteins: DataFrame,
    entry_totals: DataFrame,
    min_count: int = 3,
    min_coverage: float = 0.6,
) -> DataFrame:
    """:func:`filter_ec_numbers` with the per-(entry, ec) DISTINCT-
    protein counts PRECOMPUTED (``ec_counts``: entry_acc, ec, cnt) —
    the shape the maintained entry mart renders from: the coverage
    threshold and the failing-stem detection are pure functions of
    those aggregate-sized counts (a maintained level-2 support), so
    the common path never touches the assignment-scale
    ``entry_ec_proteins`` relation. Only the stem-fallback member
    union still needs protein identity (distinct proteins across the
    prefix-matched ECs are NOT derivable from per-ec counts); that
    scan is PRUNED to the failing (entry, stem) candidates behind a
    broadcast join — a set that needs >=2 distinct above-min_count
    below-coverage ECs sharing a stem in one entry, i.e. empty or
    tiny at any scale."""
    counts = ec_counts.join(F.broadcast(entry_totals), "entry_acc").withColumn(
        "coverage", F.col("cnt") / F.col("n_proteins")
    )
    passing = (
        counts.filter((F.col("cnt") >= min_count) & (F.col("coverage") >= min_coverage))
        .select("entry_acc", F.col("ec").alias("term"))
    )

    stem = F.concat_ws(".", F.slice(F.split(F.col("ec"), r"\."), 1, 3))
    failing_stems = (
        counts.filter((F.col("cnt") >= min_count) & (F.col("coverage") < min_coverage))
        .select("entry_acc", stem.alias("stem"))
        .groupBy("entry_acc", "stem")
        .agg(F.count("*").alias("n_ecs"))
        .filter(F.col("n_ecs") > 1)
        .select("entry_acc", "stem")
    )

    # union member proteins over EVERY ec of the entry that string-
    # prefix-matches the stem (reference uses startswith — faithfully
    # prefix, not component-wise); the broadcast of the failing
    # candidates makes this a map-side prune of the one facts-shaped
    # input on the render path
    stem_members = (
        entry_ec_proteins.join(F.broadcast(failing_stems), "entry_acc")
        .filter(F.col("ec").startswith(F.col("stem")))
        .groupBy("entry_acc", "stem")
        .agg(F.countDistinct("protein_acc").alias("cnt"))
        .join(F.broadcast(entry_totals), "entry_acc")
        .filter(
            (F.col("cnt") >= min_count)
            & (F.col("cnt") / F.col("n_proteins") >= min_coverage)
        )
        .select("entry_acc", F.col("stem").alias("term"))
    )
    return passing.unionByName(stem_members)
