"""Property-style differential tests: the array-fold operators vs
straightforward Python brute force on randomized (seeded) inputs —
SURVEY.md §5.4's property-testing layer."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from interpro7_dw_spark.domain.fragments import condense_locations_col
from interpro7_dw_spark.functions.intervals import condense_intervals, interval_union_length


def _python_condense(locations: list[list[tuple[int, int]]], min_overlap=0.1):
    """Reference semantics (interpro/oracle/matches.py:60-103),
    independent brute-force restatement."""
    spans = sorted((loc[0][0], max(e for _, e in loc)) for loc in locations)
    start = end = None
    out = []
    for s, e in spans:
        if start is None:
            start, end = s, e
        elif e <= end:
            continue
        elif s <= end and (min(end, e) - max(start, s) + 1) >= (min(end - start, e - s) + 1) * min_overlap:
            end = e
        else:
            out.append((start, end))
            start, end = s, e
    out.append((start, end))
    return out


def test_condense_matches_python_reference(spark):
    rng = random.Random(42)
    cases = []
    for _ in range(200):
        n_locs = rng.randint(1, 8)
        locs = []
        for _ in range(n_locs):
            n_frags = rng.randint(1, 3)
            frags = []
            for _ in range(n_frags):
                s = rng.randint(1, 300)
                frags.append((s, s + rng.randint(0, 120)))
            frags.sort()
            locs.append(frags)
        cases.append(locs)
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)],
        "case_id int, locs array<array<struct<start: bigint, end: bigint>>>",
    )
    got = {
        r["case_id"]: [(c["start"], c["end"]) for c in r["c"]]
        for r in df.select("case_id", condense_locations_col(F.col("locs")).alias("c")).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == _python_condense(c), f"case {i}: {c}"


def test_interval_union_and_condense_consistency(spark):
    rng = random.Random(7)
    cases = []
    for _ in range(200):
        ivs = []
        for _ in range(rng.randint(1, 10)):
            s = rng.randint(0, 200)
            ivs.append((s, s + rng.randint(0, 50)))
        cases.append(ivs)
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)],
        "case_id int, ivs array<struct<s: bigint, e: bigint>>",
    )
    rows = df.select(
        "case_id",
        interval_union_length(F.col("ivs")).alias("len"),
        condense_intervals(F.col("ivs")).alias("merged"),
    ).collect()
    for r in rows:
        ivs = cases[r["case_id"]]
        brute = set()
        for s, e in ivs:
            brute.update(range(s, e + 1))
        assert r["len"] == len(brute), f"case {r['case_id']}: {ivs}"
        # condensed intervals: disjoint, sorted, non-adjacent, same coverage
        merged = [(m["s"], m["e"]) for m in r["merged"]]
        assert merged == sorted(merged)
        assert all(a[1] + 1 < b[0] for a, b in zip(merged, merged[1:]))
        covered = set()
        for s, e in merged:
            covered.update(range(s, e + 1))
        assert covered == brute
