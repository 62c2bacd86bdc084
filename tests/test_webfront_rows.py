"""Edge-rule goldens for the webfront row tables added in round 6
(domain/protein_rows.py, domain/entry_rows.py, domain/proteome_mart.py,
domain/set_structure_mart.py) — the differ covers bulk equivalence;
these pin the reference's branchy rules on hand-traced fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from interpro7_dw_spark.domain.entry_rows import (
    entryannotation_rows,
    varsplic_rows,
)
from interpro7_dw_spark.domain.protein_rows import (
    feature_rows,
    interpro_n_rows,
    residue_rows,
)
from interpro7_dw_spark.domain.proteome_mart import proteome_marts
from interpro7_dw_spark.domain.set_structure_mart import set_mart


def test_feature_rows_db_rules(spark):
    matches = spark.createDataFrame(
        [
            ("P1", "D1", "A1", 5, 9, None),     # mobidblt null -> default
            ("P1", "D1", "A1", 20, 30, "sf1"),  # mobidblt non-null kept
            ("P2", "D2", "A2", 1, 4, "ignored"),  # elm -> name
            ("P3", "D3", "A3", 2, 6, None),     # cathfunfam -> funfam + descr
            ("P4", "D4", "A4", 3, 7, "x"),      # antifam -> dropped
            ("P5", "D5", "A5", 3, 7, "y"),      # pfam-n -> dropped
        ],
        "protein_acc string, dbcode string, accession string,"
        " pos_start int, pos_end int, seq_feature string",
    )
    dim = spark.createDataFrame(
        [
            ("D1", "A1", "n1", "d1", "MobiDBLt", "ev"),
            ("D2", "A2", "elm-name", "d2", "ELM", "ev"),
            ("D3", "A3", "n3", "ff-descr", "CATHFunFam", "ev"),
            ("D4", "A4", "n4", "d4", "AntiFam", "ev"),
            ("D5", "A5", "n5", "d5", "Pfam-N", "ev"),
        ],
        "dbcode string, accession string, name string,"
        " description string, database string, evidence string",
    )
    rows = {
        (r.protein_acc, r.location_start): (r.source_database, r.sequence_feature)
        for r in feature_rows(matches, dim).collect()
    }
    assert rows[("P1", 5)] == ("mobidblt", "Consensus Disorder Prediction")
    assert rows[("P1", 20)] == ("mobidblt", "sf1")
    assert rows[("P2", 1)] == ("elm", "elm-name")
    assert rows[("P3", 2)] == ("funfam", "ff-descr")
    assert ("P4", 3) not in rows and ("P5", 3) not in rows


def test_residue_rows_sorting_and_name_fallback(spark):
    residues = spark.createDataFrame(
        [
            ("P1", "S1", "Active site", "C", 30, 31),
            ("P1", "S1", "Active site", "H", 4, 6),
            ("P1", "S1", None, "X", 1, 2),  # dropped
        ],
        "protein_acc string, signature_acc string, description string,"
        " residue string, pos_start int, pos_end int",
    )
    dim = spark.createDataFrame(
        [("S1", None, "SFLD")],
        "signature_acc string, name string, database string",
    )
    [r] = residue_rows(residues, dim).collect()
    assert r.entry_name == "S1"  # name NULL -> accession fallback
    assert r.source_database == "sfld"
    assert r.fragments == '[["H",4,6],["C",30,31]]'  # sorted by start


def test_interpro_n_margin_rule(spark):
    def nest(rows):
        return spark.createDataFrame(
            rows,
            "protein_acc string, entry_acc string, locations"
            " array<struct<fragments:array<struct<pos_start:int,pos_end:int>>>>",
        )

    # trad coverage 100 -> threshold is strictly > 105
    trad = nest([("P1", "S1", [([(1, 100)],)]),
                 ("P1", "S2", [([(1, 100)],)])])
    toad = nest([
        ("P1", "S1", [([(1, 105)],)]),   # 105 == 100*1.05 -> NOT preferred
        ("P1", "S2", [([(1, 106)],)]),   # 106 > 105 -> preferred
        ("P1", "S3", [([(1, 10)],)]),    # no trad -> preferred, not in_interpro
    ])
    out = {r.entry_acc: r for r in interpro_n_rows(toad, trad).collect()}
    assert out["S1"].in_interpro and not out["S1"].is_preferred
    assert out["S2"].in_interpro and out["S2"].is_preferred
    assert not out["S3"].in_interpro and out["S3"].is_preferred
    assert out["S3"].locations == '[{"fragments":[{"start":1,"end":10}]}]'


def test_varsplic_features_json(spark):
    master = spark.createDataFrame(
        [("P1-1", "P1", 100, "SEQ"), ("P1-2", "P1", 90, "SEQ2")],
        "accession string, protein string, length int, sequence string",
    )
    matches = spark.createDataFrame(
        [("P1-1", "SIG1", None, "Nm", "Domain", "PFAM", "[]")],
        "accession string, signature_acc string, integrated string,"
        " name string, type string, database string, locations_json string",
    )
    out = {r.accession: r for r in varsplic_rows(master, matches).collect()}
    assert out["P1-1"].features == (
        '{"SIG1":{"accession":"SIG1","integrated":null,"name":"Nm",'
        '"type":"domain","source_database":"pfam","locations":[]}}'
    )
    assert out["P1-2"].features is None  # jsonify empty -> NULL


def test_entryannotation_duplication(spark):
    ann = spark.createDataFrame(
        [
            ("PF1", "alignment:seed", bytearray(b"x"), 4),
            ("PF1", "logo", bytearray(b"{}"), None),
            ("PF2", "alignment:full", bytearray(b"y"), 9),
        ],
        "accession string, anno_type string, value binary, num_sequences int",
    )
    p2i = spark.createDataFrame(
        [("PF1", "IPR9")], "accession string, interpro_acc string"
    )
    rows = entryannotation_rows(ann, p2i).collect()
    by_acc = {}
    for r in rows:
        by_acc.setdefault(r.accession, []).append((r.type, r.mime_type))
    # alignment duplicated under IPR9, logo NOT duplicated
    assert sorted(by_acc["IPR9"]) == [("alignment:seed", "application/gzip")]
    assert ("logo", "application/json") in by_acc["PF1"]
    assert len(rows) == 4


def test_proteome_mart_structure_only_entry(spark):
    proteomes = spark.createDataFrame(
        [("UP1", "Nm", True, "st", "asm", "T1")],
        "proteome_id string, name string, is_reference boolean,"
        " strain string, assembly string, taxon_id string",
    )
    base = spark.createDataFrame(
        [("p1", "UP1"), ("p2", None)],
        "protein_acc string, proteome_id string",
    )
    matches = spark.createDataFrame(
        [], "protein_acc string, db string, entry_acc string"
    )
    pstruct = spark.createDataFrame([], "protein_acc string, pdb_id string")
    epdb = spark.createDataFrame(
        [("T1", "db0", "E1", "PDB1")],
        "taxon_id string, db string, entry_acc string, pdb_id string",
    )
    per_p, per_e, per_db = proteome_marts(
        proteomes, base, matches, pstruct, epdb
    )
    [e] = per_e.collect()
    # entry reached only through structures: zero proteins, 1 structure
    assert (e.accession, e.entry_acc, e.num_proteins) == ("UP1", "E1", 0)
    assert e.counts == '{"proteins":0,"structures":1}'
    [p] = per_p.collect()
    assert p.num_proteins == 1  # p2 outside any proteome not counted
    assert '"entries":{"total":1,"db0":1}' in p.counts
    assert '"structures":1' in p.counts


def test_set_mart_relationships_json(spark):
    clans = spark.createDataFrame(
        [("CL1", "Clan", "D", "PFAM", "[]", "[]", "[]")],
        "clan_acc string, name string, description string, database string,"
        " authors_json string, literature_json string, wikipedia_json string",
    )
    members = spark.createDataFrame(
        [("CL1", "S1", "sn1", "Sig 1", 10), ("CL1", "S2", "sn2", "Sig 2", 20)],
        "clan_acc string, member_acc string, short_name string,"
        " member_name string, score int",
    )
    # duplicate alignment rows -> min e-value wins
    alignments = spark.createDataFrame(
        [("S1", "S2", 5), ("S1", "S2", 3), ("S2", "S1", 7)],
        "query_acc string, target_acc string, evalue int",
    )
    matches = spark.createDataFrame(
        [("p1", "S1", "pfam")],
        "protein_acc string, signature_acc string, database string",
    )
    proteins = spark.createDataFrame(
        [("p1", "T1")], "protein_acc string, tax_id string"
    )
    pp = spark.createDataFrame([], "protein_acc string, proteome_id string")
    dm = spark.createDataFrame(
        [], "protein_acc string, signature_acc string, dom_id string"
    )
    es = spark.createDataFrame([], "signature_acc string, pdb_id string")
    [r] = set_mart(
        clans, members, alignments, matches, proteins, pp, dm, es
    ).collect()
    assert r.relationships == (
        '{"nodes":['
        '{"accession":"S1","short_name":"sn1","name":"Sig 1","type":"entry","score":10},'
        '{"accession":"S2","short_name":"sn2","name":"Sig 2","type":"entry","score":20}'
        '],"links":['
        '{"source":"S1","target":"S2","score":3},'
        '{"source":"S2","target":"S1","score":7}]}'
    )
    assert r.source_database == "pfam"
    # proteins counts MATCH ROWS; entries keyed by the clan db, total last
    assert r.counts == (
        '{"domain_architectures":0,"entries":{"pfam":1,"total":1},'
        '"proteins":1,"proteomes":0,"structures":0,"taxa":1}'
    )
