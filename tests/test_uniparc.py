"""Goldens for the UniParc match+site merge (reference
interpro/oracle/uniparc.py:156-390)."""

from __future__ import annotations

from interpro7_dw_spark.domain.uniparc import merge_uniparc_matches

MATCH_SCHEMA = (
    "analysis_id int, upi string, signature_acc string, model_acc string, "
    "seq_start long, seq_end long, hmm_start long, hmm_end long, "
    "hmm_length long, hmm_bounds string, env_start long, env_end long, "
    "seq_score double, seq_evalue double, dom_score double, dom_evalue double, "
    "seq_feature string, fragments string"
)


def _run(spark, match_rows, site_rows=()):
    matches = spark.createDataFrame(match_rows, MATCH_SCHEMA)
    sites = spark.createDataFrame(
        list(site_rows) or [],
        "upi string, signature_acc string, loc_start long, loc_end long, "
        "residue string, res_start long, res_end long, description string",
    )
    analyses = spark.createDataFrame(
        [(1, "CATH-Gene3D", "4.3"), (2, "CDD", "3.20"), (3, "HAMAP", "2023"),
         (4, "Pfam", "36.0"), (5, "SFLD", "4")],
        "analysis_id int, library string, version string",
    )
    return {
        (r["upi"], r["analysis_id"], r["match_key"]): r
        for r in merge_uniparc_matches(matches, sites, analyses).collect()
    }


def _m(analysis_id, upi, sig, start, end, seq_score, seq_evalue,
       dom_score=1.0, dom_evalue=1e-3, bounds="[]", frags=None, model=None):
    return (analysis_id, upi, sig, model, start, end, 1, 50, 50, bounds,
            start, end, seq_score, seq_evalue, dom_score, dom_evalue, None, frags)


def test_cath_keeps_best_score_and_evalue(spark):
    got = _run(spark, [
        _m(1, "UPI1", "G3DSA:1", 1, 100, seq_score=50.0, seq_evalue=1e-5),
        _m(1, "UPI1", "G3DSA:1", 150, 250, seq_score=80.0, seq_evalue=1e-9),
    ])
    r = got[("UPI1", 1, "G3DSA:1")]
    assert r["score"] == 80.0 and r["evalue"] == 1e-9
    assert [(l["start"], l["end"]) for l in r["locations"]] == [(1, 100), (150, 250)]


def test_cdd_drops_match_scores(spark):
    got = _run(spark, [_m(2, "UPI1", "cd001", 5, 60, seq_score=12.0, seq_evalue=1e-4)])
    r = got[("UPI1", 2, "cd001")]
    assert r["score"] is None and r["evalue"] is None


def test_hamap_uses_location_scores(spark):
    got = _run(spark, [
        _m(3, "UPI1", "MF_1", 1, 40, seq_score=7.5, seq_evalue=0.1, dom_score=99.0),
    ])
    r = got[("UPI1", 3, "MF_1")]
    assert r["score"] is None
    assert r["locations"][0]["score"] == 7.5  # seq_score moved to the location


def test_default_library_keeps_first_location_score(spark):
    got = _run(spark, [
        _m(4, "UPI1", "PF1", 100, 200, seq_score=33.0, seq_evalue=1e-6),
        _m(4, "UPI1", "PF1", 10, 50, seq_score=44.0, seq_evalue=1e-7),
    ])
    r = got[("UPI1", 4, "PF1")]
    # "first" = leftmost location's row (deterministic ordering)
    assert r["score"] == 44.0 and r["evalue"] == 1e-7


def test_sites_attach_on_composite_key(spark):
    got = _run(
        spark,
        [_m(5, "UPI1", "SFLD1", 10, 90, seq_score=1.0, seq_evalue=1e-3),
         _m(5, "UPI1", "SFLD1", 200, 300, seq_score=1.0, seq_evalue=1e-3)],
        site_rows=[
            ("UPI1", "SFLD1", 10, 90, "C", 42, 42, "catalytic site"),
            ("UPI1", "SFLD1", 10, 90, "H", 57, 57, "catalytic site"),
            ("UPI1", "SFLD1", 999, 1000, "X", 1, 1, "orphan site"),  # no such location
        ],
    )
    r = got[("UPI1", 5, "SFLD1")]
    loc1, loc2 = r["locations"]
    assert loc1["sites"][0]["description"] == "catalytic site"
    assert loc1["sites"][0]["numLocations"] == 2
    assert [(s["res_start"], s["residue"]) for s in loc1["sites"][0]["siteLocations"]] == [
        (42, "C"), (57, "H"),
    ]
    assert loc2["sites"] == []


def test_sites_pop_only_first_duplicate_location(spark):
    # reference pops the sites dict (uniparc.py:364-378): two matches
    # sharing (upi, signature, start, end) -> only the first (by
    # analysis_id, match_key order) carries the sites, the other gets []
    got = _run(
        spark,
        [_m(4, "UPI1", "PF1", 10, 90, seq_score=1.0, seq_evalue=1e-3),
         _m(5, "UPI1", "PF1", 10, 90, seq_score=1.0, seq_evalue=1e-3)],
        site_rows=[("UPI1", "PF1", 10, 90, "C", 42, 42, "catalytic site")],
    )
    first = got[("UPI1", 4, "PF1")]["locations"][0]
    second = got[("UPI1", 5, "PF1")]["locations"][0]
    assert first["sites"][0]["numLocations"] == 1
    assert second["sites"] == []


def test_hmm_bounds_and_fragments(spark):
    got = _run(spark, [
        _m(4, "UPI1", "PF2", 5, 80, seq_score=1.0, seq_evalue=1e-3,
           bounds="[.", frags="5-30-S,50-80-C"),
    ])
    loc = got[("UPI1", 4, "PF2")]["locations"][0]
    assert loc["hmmBounds"] == "N_TERMINAL_COMPLETE"
    assert [(f["start"], f["end"], f["dc_status"]) for f in loc["location_fragments"]] == [
        (5, 30, "CONTINUOUS"), (50, 80, "C_TERMINAL_DISC"),
    ]
