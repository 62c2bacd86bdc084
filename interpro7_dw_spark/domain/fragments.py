"""Fragment parsing and location condensation as column expressions.

Reference semantics (cited for parity checking, logic re-derived):
- fragment strings ``"START-END-STATUS,..."`` with STATUS in
  {S, N, C, NC}; null/empty string means one continuous fragment
  covering [pos_from, pos_to]  (interpro/oracle/matches.py:33-53);
- condensation merges overlapping per-entry locations when the
  overlap covers >= 10% of the shorter location; a location fully
  inside the merged span is swallowed  (interpro/oracle/matches.py:60-103).

Both are higher-order column functions: they run inside whole-stage
codegen, per row, with no Python round-trip — the per-protein arrays
are small (10s of locations), so array folds beat join/window plans
that would shuffle exploded rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DC_STATUSES = {
    "S": "CONTINUOUS",
    "N": "N_TERMINAL_DISC",
    "C": "C_TERMINAL_DISC",
    "NC": "NC_TERMINAL_DISC",
}

_FRAGMENT_TYPE = "array<struct<start bigint, end bigint, dc_status string>>"


def _status_col(code: Column) -> Column:
    expr = F.lit(None).cast("string")
    for k, v in reversed(list(DC_STATUSES.items())):
        expr = F.when(code == k, F.lit(v)).otherwise(expr)
    return expr


def parse_fragments(pos_from: Column, pos_to: Column, fragments: Column) -> Column:
    """``"10-50-S,60-90-N"`` -> sorted array<struct<start,end,dc_status>>;
    null/empty input falls back to a single CONTINUOUS fragment."""
    parsed = F.transform(
        F.split(fragments, ","),
        lambda frag: F.struct(
            F.split(frag, "-")[0].cast("bigint").alias("start"),
            F.split(frag, "-")[1].cast("bigint").alias("end"),
            _status_col(F.split(frag, "-")[2]).alias("dc_status"),
        ),
    )
    fallback = F.array(
        F.struct(
            pos_from.cast("bigint").alias("start"),
            pos_to.cast("bigint").alias("end"),
            F.lit("CONTINUOUS").alias("dc_status"),
        )
    )
    # array_sort on structs orders by fields in declaration order
    # (start, end, ...) — the reference's sort key (start, end)
    return F.when(
        fragments.isNull() | (fragments == ""), fallback
    ).otherwise(F.array_sort(parsed)).cast(_FRAGMENT_TYPE)


def condense_locations_col(locations: Column, min_overlap: float = 0.1) -> Column:
    """Condense an array of locations into merged (start, end) spans.

    ``locations``: array of locations, each location being an array of
    (already-sorted) fragments ``struct<start,end,...>``. A location's
    span is [first fragment's start, max fragment end] — the first
    fragment has the leftmost start, but the last fragment's end is
    not guaranteed to be the rightmost (interpro/oracle/matches.py:73-80).

    Returns array<struct<start,end>> of condensed spans. Merge rule:
    overlap length >= ``min_overlap`` * shorter span length; contained
    spans are swallowed unconditionally.
    """
    spans = F.array_sort(
        F.transform(
            locations,
            lambda loc: F.struct(
                loc[0]["start"].alias("s"),
                F.array_max(F.transform(loc, lambda f: f["end"])).alias("e"),
            ),
        )
    )
    out_t = "array<struct<start bigint, end bigint>>"
    state = F.aggregate(
        spans,
        F.struct(
            F.expr(f"CAST(array() AS {out_t})").alias("done"),
            F.lit(None).cast("bigint").alias("cs"),
            F.lit(None).cast("bigint").alias("ce"),
        ),
        lambda acc, sp: F.when(
            acc["cs"].isNull(),
            F.struct(acc["done"].alias("done"), sp["s"].alias("cs"), sp["e"].alias("ce")),
        )
        .when(
            sp["e"] <= acc["ce"],  # contained: swallow
            acc,
        )
        .when(
            # overlapping by >= min_overlap of the shorter: extend
            (sp["s"] <= acc["ce"])
            & (
                (F.least(acc["ce"], sp["e"]) - F.greatest(acc["cs"], sp["s"]) + 1)
                >= (F.least(acc["ce"] - acc["cs"], sp["e"] - sp["s"]) + 1) * min_overlap
            ),
            F.struct(acc["done"].alias("done"), acc["cs"].alias("cs"), sp["e"].alias("ce")),
        )
        .otherwise(
            F.struct(
                F.concat(
                    acc["done"],
                    F.array(F.struct(acc["cs"].alias("start"), acc["ce"].alias("end"))),
                ).alias("done"),
                sp["s"].alias("cs"),
                sp["e"].alias("ce"),
            )
        ),
        lambda acc: F.when(
            acc["cs"].isNull(), acc["done"]
        ).otherwise(
            F.concat(
                acc["done"],
                F.array(F.struct(acc["cs"].alias("start"), acc["ce"].alias("end"))),
            )
        ),
    )
    return state


def reassemble_toad_fragments(toad: "DataFrame") -> "DataFrame":
    """TOAD discontinuous-fragment reassembly (reference
    _merge_toad_matches, interpro/oracle/matches.py:692-746): rows
    sharing (protein, signature, group_id) form one location whose
    sorted fragments get N/C/NC statuses — first fragment is
    C-terminal-discontinuous, last is N-terminal, middles both; a
    lone fragment is continuous. Pure groupBy + array transform.

    Input: protein_acc, signature_acc, group_id, pos_from, pos_to,
    score. Output: one row per location with ``fragments`` matching
    parse_fragments' shape (ready for the merge pipeline).
    """
    from pyspark.sql import functions as F

    sorted_frags = F.array_sort(
        F.collect_list(F.struct(
            F.col("pos_from").cast("bigint").alias("start"),
            F.col("pos_to").cast("bigint").alias("end"),
        ))
    )
    return (
        toad.groupBy("protein_acc", "signature_acc", "group_id")
        .agg(sorted_frags.alias("sorted_frags"), F.first("score").alias("score"))
        .select(
            "protein_acc",
            "signature_acc",
            "group_id",
            "score",
            F.expr(
                """
                transform(sorted_frags, (f, i) -> struct(
                  f.start AS start, f.end AS end,
                  CASE WHEN size(sorted_frags) = 1 THEN 'CONTINUOUS'
                       WHEN i = 0 THEN 'C_TERMINAL_DISC'
                       WHEN i = size(sorted_frags) - 1 THEN 'N_TERMINAL_DISC'
                       ELSE 'NC_TERMINAL_DISC' END AS dc_status))
                """
            ).alias("fragments"),
        )
    )
