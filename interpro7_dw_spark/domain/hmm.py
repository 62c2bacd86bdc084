"""HMMER3 text-model parsing + logo math (SURVEY.md §2.11 X2;
reference interpro/oracle/hmms.py:93-438 parses the full p7 HMM
struct and emits information-content logos).

Faithful-lite re-derivation: parse the header tags (NAME/ACC/LENG/
ALPH), the per-node match-emission lines (negative natural-log
probabilities, '*' = impossible), and compute the per-position
letter-probability logo with information content relative to a
uniform background (the reference's "info_content_all" uses the null
model background; uniform is the documented simplification).

The file-format work is plain Python applied per model via
mapInPandas — models are a few KB each, so Arrow batches thousands
per call; parsing never touches the driver.
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ALPHABETS = {
    "amino": "ACDEFGHIKLMNPQRSTVWY",
    "dna": "ACGT",
    "rna": "ACGU",
}

HMM_SCHEMA = T.StructType([
    T.StructField("model_id", T.StringType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("acc", T.StringType(), True),
    T.StructField("length", T.IntegerType(), True),
    T.StructField("alphabet", T.StringType(), True),
    T.StructField("logo", T.StringType(), True),  # JSON per reference jsonified logos
])


def parse_hmmer3_text(text: str) -> dict:
    """One HMMER3/f text model -> {name, acc, length, alphabet,
    match_probs: [[p per letter] per node]}."""
    lines = iter(text.splitlines())
    first = next(lines)
    if not first.startswith("HMMER3/"):
        raise ValueError(f"not a HMMER3 text model: {first[:40]!r}")
    name = acc = alph = None
    length = None
    for line in lines:
        parts = line.strip().split(None, 1)
        if not parts:
            continue
        tag = parts[0]
        val = parts[1] if len(parts) > 1 else ""
        if tag == "NAME":
            name = val
        elif tag == "ACC":
            acc = val
        elif tag == "LENG":
            length = int(val)
        elif tag == "ALPH":
            alph = val.lower()
        elif tag == "HMM":
            break
    next(lines)  # transition header line
    k = len(ALPHABETS[alph])
    match_probs: list[list[float]] = []
    for line in lines:
        fields = line.split()
        if not fields or fields[0] == "//":
            break
        if fields[0] == "COMPO":
            continue
        if not fields[0].isdigit():
            continue  # insert-emission / transition rows
        # node line: <idx> <K neg-ln probs> [MAP CONS RF MM CS annots]
        scores = fields[1 : 1 + k]
        match_probs.append(
            [0.0 if s == "*" else math.exp(-float(s)) for s in scores]
        )
    if length is not None and len(match_probs) != length:
        raise ValueError(f"model {name}: LENG={length} but {len(match_probs)} nodes")
    return {
        "name": name,
        "acc": acc,
        "length": len(match_probs),
        "alphabet": alph,
        "match_probs": match_probs,
    }


def logo_from_probs(match_probs: list[list[float]], alphabet: str) -> dict:
    """Per-position letter heights = p * information content, with
    IC_i = log2(K) + sum(p log2 p) (uniform background)."""
    letters = ALPHABETS[alphabet]
    max_bits = math.log2(len(letters))
    heights = []
    for probs in match_probs:
        entropy = -sum(p * math.log2(p) for p in probs if p > 0)
        ic = max_bits - entropy
        heights.append({letters[j]: probs[j] * ic for j in range(len(letters))})
    return {"alphabet": alphabet, "max_height_obs": max_bits, "heights": heights}


def parse_hmm_models(models: DataFrame, id_col: str = "model_id", text_col: str = "hmm_text") -> DataFrame:
    """mapInPandas over (model_id, hmm_text) rows -> parsed metadata +
    logo JSON."""
    from ..util import ensure_pyfiles

    ensure_pyfiles(models.sparkSession)
    parse, logo = parse_hmmer3_text, logo_from_probs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                m = parse(text)
                rows.append({
                    "model_id": mid,
                    "name": m["name"],
                    "acc": m["acc"],
                    "length": m["length"],
                    "alphabet": m["alphabet"],
                    "logo": json.dumps(logo(m["match_probs"], m["alphabet"]),
                                       separators=(",", ":")),
                })
            yield pd.DataFrame(rows)

    return models.select(id_col, text_col).mapInPandas(run, HMM_SCHEMA)


def occupancy_col(trans_col: str) -> "Column":
    """Match-state occupancy of an HMM (reference hmmlogo indel math,
    interpro/oracle/hmms.py:342-354): the first-order recurrence
    ``occ[1] = t0.mi + t0.mm``,
    ``occ[k] = occ[k-1]*(t[k-1].mm + t[k-1].mi)
               + (1 - occ[k-1])*t[k-1].dm``
    expressed as a JVM-side ``aggregate`` fold over the transitions
    array — one row per model, whole-stage codegen, no Python and no
    per-position shuffle. ``trans_col`` is an
    ``array<struct<mm double, mi double, dm double>>`` ordered by
    model position (0-based); returns the occupancy array for
    positions 1..M (reference's ``occupancy[1:]``).

    This is the W4 "frame-free sequential recurrence" of SURVEY §2.5:
    windows can't express it, but a fold over the per-model array can
    — the model length (hundreds of positions) bounds the array, so
    the scale axis (number of models) stays fully parallel.
    """
    from pyspark.sql import functions as F

    t = trans_col
    return F.expr(
        f"""
        aggregate(
          slice({t}, 2, size({t}) - 1),
          array({t}[0].mi + {t}[0].mm),
          (acc, tr) -> array_append(
            acc,
            element_at(acc, -1) * (tr.mm + tr.mi)
              + (CAST(1.0 AS DOUBLE) - element_at(acc, -1)) * tr.dm)
        )
        """
    )
