"""webfront_entry mart composition tests (domain/entry_mart.py vs
reference interpro/mysql/entries.py:96-154,163-562): the hierarchy
kernel's visibility rules, member_databases nesting with the
non-InterPro-target skip, history lower-casing, cross-reference key
folding, and the representative-structure floor."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from interpro7_dw_spark.domain.entry_mart import entry_hierarchy, webfront_entry_mart

_DIM_SCHEMA = (
    "entry_acc string, name string, short_name string, type string, "
    "database string, integrated_in string, parent_acc string, "
    "public boolean, creation_date string, deletion_date string, "
    "old_names array<string>, old_short_names array<string>, "
    "old_integrations array<struct<db string, entry_acc string>>, "
    "cross_references array<struct<ref_db string, ref_id string>>"
)


def _dim(spark, rows):
    return spark.createDataFrame(rows, _DIM_SCHEMA)


def _row(acc, **kw):
    base = dict(
        entry_acc=acc, name=f"Name {acc}", short_name=f"sn_{acc}",
        type="Family", database="InterPro", integrated_in=None,
        parent_acc=None, public=True, creation_date="2020-01-01",
        deletion_date=None, old_names=[], old_short_names=[],
        old_integrations=[], cross_references=[],
    )
    base.update(kw)
    return tuple(base.values())


@pytest.fixture(scope="module")
def entries(spark):
    return _dim(spark, [
        _row("IPR1"),                                     # root
        _row("IPR2", parent_acc="IPR1", type="Domain"),   # child
        _row("IPR3", parent_acc="IPR1", public=False),    # hidden child
        _row("IPR4", deletion_date="2021-01-01"),         # deleted root
        # PANTHER hierarchy: root + 2 subfamilies
        _row("PTHR1", database="PANTHER"),
        _row("PTHR1:SF1", database="PANTHER", parent_acc="PTHR1",
             integrated_in="PTHR1"),
        _row("PTHR1:SF2", database="PANTHER", parent_acc="PTHR1",
             integrated_in="PTHR1"),
        # member signatures of IPR1; PF2 has no name -> short_name
        _row("PF1", database="Pfam", integrated_in="IPR1"),
        _row("PF2", database="Pfam", integrated_in="IPR1", name=None),
        _row("CD1", database="CDD", integrated_in="IPR1"),
    ])


def test_entry_hierarchy_rules(spark, entries):
    got = {r.entry_acc: r for r in entry_hierarchy(entries).collect()}

    # InterPro child resolves to its ROOT's tree; the non-public
    # sibling IPR3 still appears inside it (make_hierarchy builds
    # parent2children from all entries, entries.py:96-106)
    tree = json.loads(got["IPR2"].hierarchy_json)
    assert tree["accession"] == "IPR1"
    assert [c["accession"] for c in tree["children"]] == ["IPR2", "IPR3"]
    assert tree["children"][0]["children"] == []
    assert got["IPR2"].n_subfamilies == 0
    assert got["IPR1"].hierarchy_json == got["IPR2"].hierarchy_json

    # but IPR3 itself (non-public) and IPR4 (deleted) get no hierarchy
    assert got["IPR3"].hierarchy_json is None
    assert got["IPR4"].hierarchy_json is None

    # PANTHER: no JSON, subfamily count = root's children, for root
    # and subfamily rows alike (get_hierarchy, entries.py:137-143)
    for acc in ("PTHR1", "PTHR1:SF1", "PTHR1:SF2"):
        assert got[acc].hierarchy_json is None
        assert got[acc].n_subfamilies == 2

    # plain member signature: nothing
    assert got["PF1"].hierarchy_json is None
    assert got["PF1"].n_subfamilies == 0


@pytest.fixture(scope="module")
def mart(spark, entries):
    matches = spark.createDataFrame(
        [
            ("IPR1", "P1", "9606", "UP1", "DOM1", True),
            ("IPR1", "P1", "9606", "UP1", "DOM1", True),   # 2nd match row
            ("IPR1", "P2", "10090", None, None, False),
        ],
        "entry_acc string, protein_acc string, tax_id string, "
        "proteome_id string, dom_id string, in_alphafold boolean",
    )
    structures = spark.createDataFrame(
        [
            ("IPR1", "1abc", 0.9),   # high-res, best coverage
            ("IPR1", "2def", 0.95),  # NOT high-res (resolution 3.0)
            ("IPR1", "3ghi", 0.4),   # below the floor
        ],
        "entry_acc string, pdb_id string, coverage double",
    )
    dim = spark.createDataFrame(
        [("1abc", "Struct A", 1.5), ("2def", "Struct B", 3.0), ("3ghi", "Struct C", 1.0)],
        "pdb_id string, s_name string, resolution double",
    )
    df = webfront_entry_mart(entries, matches, structures, dim)
    return {r.entry_acc: r for r in df.collect()}


def test_member_databases_and_skip(mart):
    # nested by lower-cased db; PF2 falls back to short_name; the
    # PANTHER-integrated subfamilies are skipped (entries.py:217-220)
    assert mart["IPR1"].member_databases == "cdd:[CD1=Name CD1];pfam:[PF1=Name PF1,PF2=sn_PF2]"
    assert mart["PTHR1"].member_databases is None


def test_counts_and_repr_structure(mart):
    r = mart["IPR1"]
    assert json.loads(r.counts_json) == {
        "subfamilies": 0, "domain_architectures": 1, "interactions": 0,
        "matches": 3, "pathways": 0, "proteins": 2, "proteomes": 1,
        "sets": 0, "structural_models": {"alphafold": 1},
        "structures": 3, "taxa": 2,
    }
    # 2def excluded by the high-res filter despite the best coverage
    assert (r.repr_pdb, r.repr_name) == ("1abc", "Struct A")
    # entry with no facts: zeros, NULL repr (the reference's second
    # loop, entries.py:399-470)
    r4 = mart["IPR4"]
    assert json.loads(r4.counts_json)["matches"] == 0
    assert r4.repr_pdb is None


def test_history_and_cross_refs(spark):
    entries = _dim(spark, [
        _row("IPR9",
             old_names=["Old one", "Old two"],
             old_short_names=["old_sn"],
             old_integrations=[("PFAM", "IPR1"), ("CDD", "IPR2")],
             cross_references=[("CAZy", "GH5"), ("CAZy", "GH1"), ("PANDIT", "PD1")]),
        _row("IPR10"),
    ])
    matches = spark.createDataFrame(
        [], "entry_acc string, protein_acc string, tax_id string, "
            "proteome_id string, dom_id string, in_alphafold boolean")
    structures = spark.createDataFrame([], "entry_acc string, pdb_id string, coverage double")
    dim = spark.createDataFrame([], "pdb_id string, s_name string, resolution double")
    enzymes = spark.createDataFrame([("IPR9", "3.2.1.4"), ("IPR9", "1.1.1.1")],
                                    "entry_acc string, ec string")
    got = {
        r.entry_acc: r
        for r in webfront_entry_mart(
            entries, matches, structures, dim, entry_enzymes=enzymes
        ).collect()
    }
    # history blocks in reference insertion order, signature keys
    # lower-cased and sorted (entries.py:304-320)
    assert got["IPR9"].history == (
        "names:[Old one;Old two]|short_names:[old_sn]"
        "|signatures:{cdd=IPR2,pfam=IPR1}"
    )
    assert got["IPR10"].history is None  # jsonify empty -> NULL
    # cross-reference keys lower-cased, ec merged sorted (:291-293,316-319)
    assert got["IPR9"].cross_refs == "cazy:GH1,GH5;ec:1.1.1.1,3.2.1.4;pandit:PD1"
    assert got["IPR10"].cross_refs is None
