"""Per-library lookup match formatting — the X4 17-way dispatch
(reference interpro/lookup.py:151-418).

The reference formats each match dict with a per-library formatter
(format_default / format_cdd / format_minimal / format_mobidblite /
format_panther / format_prints / format_prosite / format_superfamily),
renames two libraries (FunFam -> CATH-FunFam, "MobiDB Lite" ->
MobiDB-lite) and DROPS SignalP*/TMHMM matches entirely
(lookup.py:188-195).

Spark-first: every formatter is a static struct projection (key order
matches the reference dicts, hyphenated keys included) rendered with
``to_json(ignoreNullFields=false)`` — json.dumps keeps None values —
and the dispatch is ONE when-chain on the canonical library name, so
the whole thing stays inside whole-stage codegen: no Python, no
per-row branching outside the JVM.

Input contract = merge_uniparc_matches output (domain/uniparc.py):
(upi, signature_acc, model_acc, library, version, score, evalue,
locations array<struct<start, end, hmmStart, hmmEnd, hmmLength,
hmmBounds, envelopeStart, envelopeEnd, evalue, score,
location_fragments, sequence_feature, sites>>).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# library -> canonical name (reference lookup.py:156-167)
LIBRARY_RENAMES = {
    "FunFam": "CATH-FunFam",
    "MobiDB Lite": "MobiDB-lite",
}

# matches from these analyses are dropped (lookup.py:188-193)
DROPPED_LIBRARIES = (
    "SignalP_Euk",
    "SignalP_Gram_positive",
    "SignalP_Gram_negative",
    "TMHMM",
)

# canonical library -> (formatter, flags); mirrors the reference's
# match statement one-to-one (lookup.py:151-201)
LIBRARY_FORMATS: dict[str, tuple[str, dict]] = {
    "AntiFam": ("default", {"sites": False}),
    "CATH-FunFam": ("default", {"sites": False}),
    "CATH-Gene3D": ("default", {"sites": False}),
    "CDD": ("cdd", {}),
    "COILS": ("minimal", {}),
    "HAMAP": ("prosite", {"score": True}),
    "MobiDB-lite": ("mobidblite", {}),
    "NCBIFAM": ("default", {"sites": False}),
    "PANTHER": ("panther", {}),
    "Pfam": ("default", {"sites": False}),
    "Phobius": ("minimal", {}),
    "PIRSF": ("default", {"sites": False}),
    "PIRSR": ("default", {"hmm_bounds": False}),
    "PRINTS": ("prints", {}),
    "PROSITE patterns": ("prosite", {"score": False}),
    "PROSITE profiles": ("prosite", {"score": True}),
    "SFLD": ("default", {"hmm_bounds": False}),
    "SMART": ("default", {"envelope": False, "sites": False}),
    "SUPERFAMILY": ("superfamily", {}),
}


def _frags(loc) -> Column:
    # fragments keep the hyphenated dc-status key in lookup output
    return F.transform(
        loc["location_fragments"],
        lambda f: F.struct(
            f["start"].alias("start"),
            f["end"].alias("end"),
            f["dc_status"].alias("dc-status"),
        ),
    ).alias("location-fragments")


def _loc_default(loc, hmm_bounds=True, envelope=True, sites=True) -> Column:
    fields = [
        loc["start"].alias("start"),
        loc["end"].alias("end"),
        loc["hmmStart"].alias("hmmStart"),
        loc["hmmEnd"].alias("hmmEnd"),
        loc["hmmLength"].alias("hmmLength"),
        loc["evalue"].alias("evalue"),
        loc["score"].alias("score"),
        _frags(loc),
    ]
    if hmm_bounds:
        fields.append(loc["hmmBounds"].alias("hmmBounds"))
    if envelope:
        fields.append(loc["envelopeStart"].alias("envelopeStart"))
        fields.append(loc["envelopeEnd"].alias("envelopeEnd"))
    if sites:
        fields.append(loc["sites"].alias("sites"))
    return F.struct(*fields)


def _loc_cdd(loc) -> Column:
    return F.struct(
        loc["start"].alias("start"),
        loc["end"].alias("end"),
        loc["evalue"].alias("evalue"),
        loc["score"].alias("score"),
        _frags(loc),
        loc["sites"].alias("sites"),
    )


def _loc_minimal(loc) -> Column:
    return F.struct(loc["start"].alias("start"), loc["end"].alias("end"), _frags(loc))


def _loc_mobidblite(loc) -> Column:
    return F.struct(
        loc["start"].alias("start"),
        loc["end"].alias("end"),
        _frags(loc),
        loc["sequence_feature"].alias("sequence-feature"),
    )


def _loc_panther(loc) -> Column:
    return F.struct(
        loc["start"].alias("start"),
        loc["end"].alias("end"),
        loc["hmmStart"].alias("hmmStart"),
        loc["hmmEnd"].alias("hmmEnd"),
        loc["hmmLength"].alias("hmmLength"),
        loc["hmmBounds"].alias("hmmBounds"),
        loc["envelopeStart"].alias("envelopeStart"),
        loc["envelopeEnd"].alias("envelopeEnd"),
        _frags(loc),
    )


def _loc_prints(loc) -> Column:
    return F.struct(
        loc["start"].alias("start"),
        loc["end"].alias("end"),
        loc["evalue"].alias("pvalue"),
        loc["score"].alias("score"),
        loc["hmmLength"].alias("motifNumber"),
        _frags(loc),
    )


def _loc_prosite(loc, score=True) -> Column:
    fields = [
        loc["start"].alias("start"),
        loc["end"].alias("end"),
        loc["sequence_feature"].alias("cigarAlignment"),
        _frags(loc),
    ]
    if score:
        fields.append(loc["score"].alias("score"))
    return F.struct(*fields)


def _loc_superfamily(loc) -> Column:
    return F.struct(
        loc["start"].alias("start"),
        loc["end"].alias("end"),
        loc["evalue"].alias("evalue"),
        loc["hmmLength"].alias("hmmLength"),
        _frags(loc),
    )


def _match_json(kind: str, flags: dict) -> Column:
    """Build the per-library match JSON column (reference dict key
    order preserved; nulls kept like json.dumps)."""
    sig = F.col("signature_acc").alias("signature")
    model = F.col("model_acc").alias("model-ac")
    locs = F.col("locations")

    if kind == "default":
        body = F.struct(
            sig, model,
            F.col("score").alias("score"),
            F.col("evalue").alias("evalue"),
            F.transform(locs, lambda l: _loc_default(l, **flags)).alias("locations"),
        )
    elif kind == "cdd":
        body = F.struct(sig, model, F.transform(locs, _loc_cdd).alias("locations"))
    elif kind == "minimal":
        body = F.struct(sig, model, F.transform(locs, _loc_minimal).alias("locations"))
    elif kind == "mobidblite":
        body = F.struct(sig, model, F.transform(locs, _loc_mobidblite).alias("locations"))
    elif kind == "panther":
        body = F.struct(
            sig, model,
            locs[0]["sequence_feature"].alias("ancestralNode"),
            locs[0]["evalue"].alias("evalue"),
            locs[0]["score"].alias("score"),
            F.transform(locs, _loc_panther).alias("locations"),
        )
    elif kind == "prints":
        body = F.struct(
            sig, model,
            F.col("evalue").alias("evalue"),
            locs[0]["sequence_feature"].alias("graphscan"),
            F.transform(locs, _loc_prints).alias("locations"),
        )
    elif kind == "prosite":
        body = F.struct(
            sig, model,
            F.transform(locs, lambda l: _loc_prosite(l, **flags)).alias("locations"),
        )
    elif kind == "superfamily":
        body = F.struct(sig, model, F.transform(locs, _loc_superfamily).alias("locations"))
    else:  # pragma: no cover
        raise ValueError(kind)
    return F.to_json(body, {"ignoreNullFields": "false"})


def canonical_library(col: Column) -> Column:
    expr = col
    for raw, canon in LIBRARY_RENAMES.items():
        expr = F.when(col == raw, F.lit(canon)).otherwise(expr)
    return expr


def format_lookup_matches(merged: DataFrame) -> DataFrame:
    """One row per kept match: (upi, library, version, signature_acc,
    match_json). SignalP*/TMHMM rows are dropped; the library column
    carries the canonical name (it also lands inside the JSON consumer
    as ``source``, reference lookup.py:205)."""
    m = merged.filter(~F.col("library").isin(*DROPPED_LIBRARIES)).withColumn(
        "library", canonical_library(F.col("library"))
    )
    dispatch = None
    for lib, (kind, flags) in LIBRARY_FORMATS.items():
        branch = _match_json(kind, flags)
        dispatch = (
            F.when(F.col("library") == lib, branch)
            if dispatch is None
            else dispatch.when(F.col("library") == lib, branch)
        )
    # unknown library -> error, like the reference's `case _: raise`
    dispatch = dispatch.otherwise(
        F.raise_error(F.concat(F.lit("Unsupported database: "), F.col("library")))
    )
    return m.select(
        "upi", "library", "version", "signature_acc", dispatch.alias("match_json")
    )
