"""Golden tests for the InterPro domain semantics (the reference has
no tests; these encode hand-traced expectations against
interpro/oracle/matches.py:33-232,287-393)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from interpro7_dw_spark.domain.fragments import condense_locations_col, parse_fragments
from interpro7_dw_spark.domain.pipeline import classify_matches, merge_protein_matches
from interpro7_dw_spark.domain.repr_domains import select_repr_domains


def _frag_df(spark, rows):
    return spark.createDataFrame(rows, "pos_from long, pos_to long, fragments string")


def test_parse_fragments_string(spark):
    df = _frag_df(spark, [(1, 100, "60-90-N,10-50-S")]).select(
        parse_fragments(F.col("pos_from"), F.col("pos_to"), F.col("fragments")).alias("f")
    )
    got = df.collect()[0]["f"]
    assert [(f["start"], f["end"], f["dc_status"]) for f in got] == [
        (10, 50, "CONTINUOUS"),       # sorted by (start, end)
        (60, 90, "N_TERMINAL_DISC"),
    ]


def test_parse_fragments_fallback(spark):
    df = _frag_df(spark, [(5, 42, None), (7, 9, "")]).select(
        parse_fragments(F.col("pos_from"), F.col("pos_to"), F.col("fragments")).alias("f")
    )
    got = [r["f"] for r in df.collect()]
    assert [(f["start"], f["end"], f["dc_status"]) for f in got[0]] == [(5, 42, "CONTINUOUS")]
    assert [(f["start"], f["end"], f["dc_status"]) for f in got[1]] == [(7, 9, "CONTINUOUS")]


def _condense(spark, locations):
    """locations: list of list of (start, end) fragment pairs."""
    df = spark.createDataFrame(
        [(locations,)],
        "locs array<array<struct<start: bigint, end: bigint>>>",
    )
    out = df.select(condense_locations_col(F.col("locs")).alias("c")).collect()[0]["c"]
    return [(c["start"], c["end"]) for c in out]


def test_condense_merges_on_10pct_overlap(spark):
    # [1,100] and [90,200]: overlap 11 >= 0.1*shortest(100) -> merge
    assert _condense(spark, [[(1, 100)], [(90, 200)]]) == [(1, 200)]


def test_condense_below_10pct_stays_separate(spark):
    # [1,100] and [95,200]: overlap 6 < 0.1*shortest(100) -> separate
    assert _condense(spark, [[(1, 100)], [(95, 200)]]) == [(1, 100), (95, 200)]


def test_condense_keeps_tiny_overlap_separate(spark):
    # [1,100] and [100,300]: overlap 1 < 0.1*min(100,201) -> separate
    assert _condense(spark, [[(1, 100)], [(100, 300)]]) == [(1, 100), (100, 300)]


def test_condense_swallows_contained(spark):
    # [20,30] inside [1,100]: swallowed regardless of overlap ratio
    assert _condense(spark, [[(1, 100)], [(20, 30)]]) == [(1, 100)]


def test_condense_uses_max_fragment_end(spark):
    # location fragments [(5,100),(6,80)]: span end = max(end) = 100,
    # so [90,150] overlaps by 11 >= 0.1*shortest(61) and merges
    assert _condense(spark, [[(5, 100), (6, 80)], [(90, 150)]]) == [(5, 150)]


def _repr(spark, rows):
    """rows: (protein, domain_id, rank, [(s,e),...]) -> {domain_id: bool}"""
    df = spark.createDataFrame(
        [(p, i, r, f) for p, i, r, f in rows],
        "protein_acc string, domain_id long, rank int, "
        "fragments array<struct<start: bigint, end: bigint>>",
    )
    out = select_repr_domains(df).collect()
    return {r["domain_id"]: r["representative"] for r in out}


def test_repr_non_overlapping_all_selected(spark):
    got = _repr(spark, [("P1", 1, 0, [(1, 50)]), ("P1", 2, 1, [(100, 150)])])
    assert got == {1: True, 2: True}


def test_repr_longer_domain_wins(spark):
    # full-overlap conflict: the longer one maximizes coverage
    got = _repr(spark, [("P1", 1, 3, [(1, 120)]), ("P1", 2, 0, [(1, 60)])])
    assert got == {1: True, 2: False}


def test_repr_equal_length_lower_rank_wins(spark):
    # same span: coverage identical either way -> pfam count tiebreak
    got = _repr(spark, [("P1", 1, 3, [(1, 100)]), ("P1", 2, 0, [(1, 100)])])
    assert got == {1: False, 2: True}


def test_repr_chain_picks_disjoint_ends(spark):
    # a[1,100], b[50,160] (conflicts both), c[120,220]:
    # {a,c} coverage 202 > {b} 111 -> a,c representative
    got = _repr(spark, [
        ("P1", 1, 0, [(1, 100)]),
        ("P1", 2, 1, [(50, 160)]),
        ("P1", 3, 2, [(120, 220)]),
    ])
    assert got == {1: True, 2: False, 3: True}


def test_repr_small_overlap_not_conflicting(spark):
    # overlap 10 residues < 30% of shorter (len 51) -> both kept
    got = _repr(spark, [("P1", 1, 0, [(1, 60)]), ("P1", 2, 1, [(51, 101)])])
    assert got == {1: True, 2: True}


def _fixture(spark):
    matches = spark.createDataFrame(
        [
            # P1: two conflicting pfam/cdd domains + a PANTHER family w/ subfamily
            ("P1", "PF00001", None, 1, 120, None, 10.0),
            ("P1", "CD00001", None, 1, 60, None, 5.0),
            ("P1", "PTHR10000", "PTHR10000:SF5", 1, 110, None, None),
            # P1: same entry via two signatures -> condensation
            ("P1", "PF00002", None, 200, 300, None, 3.0),
            # P2: fragmented match + an unintegrated region
            ("P2", "PF00001", None, 10, 90, "10-40-S,60-90-C", 7.0),
            ("P2", "MF00001", None, 5, 25, None, None),
        ],
        "protein_acc string, signature_acc string, model_acc string, "
        "pos_from long, pos_to long, fragments string, score double",
    )
    signatures = spark.createDataFrame(
        [
            ("PF00001", "Kinase dom", "kin_dom", "Pfam", "domain", "hmm", "IPR000001"),
            ("PF00002", "Kinase C", "kin_c", "Pfam", "domain", "hmm", "IPR000001"),
            ("CD00001", "CDD kin", "cdd_kin", "CDD", "domain", "hmm", None),
            ("PTHR10000", "Fam X", "fam_x", "PANTHER", "family", "hmm", None),
            ("PTHR10000:SF5", "Sub Y", "sub_y", "PANTHER", "family", "hmm", None),
            ("MF00001", "Hamap reg", "ham_reg", "HAMAP", "region", "rule", None),
        ],
        "signature_acc string, name string, short_name string, database string, "
        "type string, evidence string, entry_acc string",
    )
    entries = spark.createDataFrame(
        [("IPR000001", "Kinase", "kinase", "Domain", None)],
        "entry_acc string, name string, short_name string, type string, parent_acc string",
    )
    return matches, signatures, entries


def test_classify_matches(spark):
    matches, signatures, _ = _fixture(spark)
    got = {
        (r["protein_acc"], r["signature_acc"]): (r["klass"], r["rank"])
        for r in classify_matches(matches, signatures).collect()
    }
    assert got[("P1", "PF00001")] == ("domain", 0)
    assert got[("P1", "CD00001")] == ("domain", 1)
    assert got[("P1", "PTHR10000")] == ("family", 1)
    assert got[("P2", "MF00001")] == ("region", None)  # HAMAP region -> unranked


def test_merge_protein_matches_end_to_end(spark):
    matches, signatures, entries = _fixture(spark)
    out = merge_protein_matches(matches, signatures, entries).collect()
    rows = {(r["protein_acc"], r["accession"]): r for r in out}

    # P1 signature row: PF00001 beats CD00001 (longer, conflict)
    pf1 = json.loads(rows[("P1", "PF00001")]["locations"])
    assert pf1[0]["representative"] is True
    cd1 = json.loads(rows[("P1", "CD00001")]["locations"])
    assert cd1[0]["representative"] is False

    # reference byte fidelity: subfamily key ABSENT off PANTHER rows,
    # null score key PRESENT (matches.py:350-365)
    assert "subfamily" not in pf1[0]
    assert set(pf1[0]) == {"fragments", "representative", "model", "score"}

    # PANTHER subfamily attached from the model accession
    pthr = json.loads(rows[("P1", "PTHR10000")]["locations"])
    assert pthr[0]["subfamily"] == {"accession": "PTHR10000:SF5", "name": "Sub Y"}
    assert pthr[0]["model"] == "PTHR10000:SF5"
    assert "score" in pthr[0] and pthr[0]["score"] is None

    # entry row for P1: [1,120] and [200,300] don't overlap -> 2 spans
    ipr = rows[("P1", "IPR000001")]
    assert ipr["source_database"] == "INTERPRO"
    ipr_locs = json.loads(ipr["locations"])
    spans = [
        (loc["fragments"][0]["start"], loc["fragments"][0]["end"])
        for loc in ipr_locs
    ]
    assert spans == [(1, 120), (200, 300)]
    # entry rows always emit the explicit null model/score keys and the
    # hyphenated dc-status (matches.py:377-391)
    assert ipr_locs[0]["model"] is None and ipr_locs[0]["score"] is None
    assert set(ipr_locs[0]) == {"fragments", "representative", "model", "score"}
    assert ipr_locs[0]["fragments"][0]["dc-status"] == "CONTINUOUS"

    # P2: fragment string parsed and sorted; region never representative
    p2 = json.loads(rows[("P2", "PF00001")]["locations"])
    assert [(f["start"], f["end"], f["dc-status"]) for f in p2[0]["fragments"]] == [
        (10, 40, "CONTINUOUS"),
        (60, 90, "C_TERMINAL_DISC"),
    ]
    mf = json.loads(rows[("P2", "MF00001")]["locations"])
    assert mf[0]["representative"] is False

    # entry condensation for P2: single signature location [10,90]
    p2e = json.loads(rows[("P2", "IPR000001")]["locations"])
    assert (p2e[0]["fragments"][0]["start"], p2e[0]["fragments"][0]["end"]) == (10, 90)


def test_classify_unknown_signature_raises(spark):
    # reference raises KeyError on dim/fact drift (matches.py:292);
    # a silent inner-join drop would hide it
    import pytest
    from py4j.protocol import Py4JJavaError

    matches, signatures, _ = _fixture(spark)
    extra = spark.createDataFrame(
        [("P9", "PFXXXXX", None, 1, 10, None, 1.0)], matches.schema
    )
    with pytest.raises(Exception) as exc:
        classify_matches(matches.unionByName(extra), signatures).collect()
    assert "unknown signature" in str(exc.value)


def test_repr_exact_tie_is_deterministic(spark):
    # two identical conflicting domains, same rank: include-first DFS
    # after the domain_id tiebreak must always pick the lower id
    for _ in range(3):
        got = _repr(spark, [("P1", 2, 0, [(1, 100)]), ("P1", 1, 0, [(1, 100)])])
        assert got == {1: True, 2: False}


def test_flag_representatives_matches_explode_path(spark):
    # r15: _flag_representatives attaches the kernel's per-(protein,
    # class) rep_id arrays by a protein-keyed join + array_contains
    # (one flattened array per protein) instead of exploding to
    # per-domain rows and joining on (protein, domain_id). The two
    # attachments must flag identically — including region rows
    # (always False) and proteins with both a domain and a family
    # group (the flatten must not mix up their domain_ids).
    from pyspark.sql import functions as F

    from interpro7_dw_spark.domain.pipeline import _flag_representatives
    from interpro7_dw_spark.domain.repr_domains import select_repr_domains

    matches, signatures, _ = _fixture(spark)
    classified = classify_matches(matches, signatures)
    got = {
        (r["protein_acc"], r["domain_id"]): r["representative"]
        for r in _flag_representatives(classified).collect()
    }
    ranked = classified.filter(F.col("klass") != "region")
    reference = {
        (r["protein_acc"], r["domain_id"]): r["representative"]
        for r in select_repr_domains(
            ranked.select(
                "protein_acc",
                "klass",
                "domain_id",
                "rank",
                F.expr(
                    "transform(frags, f -> struct(f.start AS start, f.end AS end))"
                ).alias("fragments"),
            ),
            group_cols=("protein_acc", "klass"),
        ).collect()
    }
    n_regions = 0
    for key, rep in got.items():
        if key in reference:
            assert rep == reference[key], key
        else:  # a region row — never representative
            n_regions += 1
            assert rep is False, key
    assert set(reference) <= set(got)
    assert n_regions >= 1  # the fixture carries a region row


def test_toad_reassembly(spark):
    from interpro7_dw_spark.domain.fragments import reassemble_toad_fragments

    toad = spark.createDataFrame(
        [
            ("P1", "S1", 1, 100, 150, 9.0),   # group 1: three fragments
            ("P1", "S1", 1, 10, 50, 9.0),
            ("P1", "S1", 1, 200, 250, 9.0),
            ("P1", "S1", 2, 300, 350, 5.0),   # group 2: single fragment
        ],
        "protein_acc string, signature_acc string, group_id int, "
        "pos_from long, pos_to long, score double",
    )
    out = {r["group_id"]: r for r in reassemble_toad_fragments(toad).collect()}
    g1 = [(f["start"], f["end"], f["dc_status"]) for f in out[1]["fragments"]]
    assert g1 == [
        (10, 50, "C_TERMINAL_DISC"),
        (100, 150, "NC_TERMINAL_DISC"),
        (200, 250, "N_TERMINAL_DISC"),
    ]
    g2 = [(f["start"], f["end"], f["dc_status"]) for f in out[2]["fragments"]]
    assert g2 == [(300, 350, "CONTINUOUS")]
    assert out[1]["score"] == 9.0
