"""EBISearch document composition tests (domain/ebisearch.py vs
reference ebisearch.py:30-384): field/xref content and ordering per
entry kind, the chunking weight, chunk-boundary behavior, and the file
envelope."""

from __future__ import annotations

import glob
import json

import pytest

from interpro7_dw_spark.domain.ebisearch import (
    chunk_documents,
    entry_documents,
    export_ebisearch,
)


@pytest.fixture(scope="module")
def dims(spark):
    entries = spark.createDataFrame(
        [
            # InterPro parent + child
            ("IPR1", "Kinase", "kin", "Family", "InterPro", None, None, "desc1", "2020-01-02"),
            ("IPR2", "Sub kinase", "sub_kin", "Domain", "InterPro", None, "IPR1", "desc2", "2021-03-04"),
            # member signatures, one integrated in IPR1
            ("PF001", "PfamSig", "pf1", "Family", "Pfam", "IPR1", None, "dp", "2019-05-06"),
            ("PTHR1", "PantherSig", None, "Family", "PANTHER", None, None, "dq", "2018-07-08"),
        ],
        "entry_acc string, name string, short_name string, type string, "
        "database string, integrated_in string, parent_acc string, "
        "description string, creation_date string",
    )
    proteins = spark.createDataFrame(
        [
            ("IPR1", "P10000", "KIN1_HUMAN", True),
            ("IPR1", "P20000", "KIN2_MOUSE", False),
        ],
        "entry_acc string, uniprot_acc string, uniprot_id string, in_alphafold boolean",
    )
    taxa = spark.createDataFrame(
        [("IPR1", "9606", "Homo sapiens"), ("IPR1", "10090", "Mus musculus")],
        "entry_acc string, tax_id string, taxon_name string",
    )
    clans = spark.createDataFrame(
        [("PF001", "CL0001")], "entry_acc string, clan_acc string"
    )
    return entries, proteins, taxa, clans


def _docs(spark, dims, **kw):
    entries, proteins, taxa, clans = dims
    return {
        r.entry_acc: r
        for r in entry_documents(
            entries,
            entry_proteins=proteins,
            entry_taxa=taxa,
            entry_clans=clans,
            **kw,
        ).collect()
    }


def test_interpro_entry_fields_and_xrefs(spark, dims):
    d = _docs(spark, dims)["IPR1"]
    fields = [(f.name, f.value) for f in d.doc.fields]
    assert fields == [
        ("id", "IPR1"),
        ("type", "family"),
        ("creation_date", "2020-01-02"),
        ("description", "desc1"),
        ("source_database", "InterPro"),
        ("name", "Kinase"),
        ("short_name", "kin"),
        ("contributing_database", "Pfam"),
        ("uniprot_id", "KIN1_HUMAN"),
        ("uniprot_id", "KIN2_MOUSE"),
        ("taxonomy_name", "Mus musculus"),   # sorted by tax_id: 10090 < 9606
        ("taxonomy_name", "Homo sapiens"),
    ]
    xrefs = [(x.dbname, x.dbkey) for x in d.doc.cross_references]
    assert xrefs == [
        ("PFAM", "PF001"),          # integrated member signature
        ("INTERPRO", "IPR2"),       # child relationship
        ("UNIPROT", "P10000"),
        ("ALPHAFOLD", "P10000"),    # in_alphafold
        ("UNIPROT", "P20000"),
        ("TAXONOMY", "10090"),
        ("TAXONOMY", "9606"),
    ]
    assert d.n_fields == len(fields) + len(xrefs)
    assert d.entry_type == "family"


def test_uniprot_gene_fields(spark, dims):
    genes = spark.createDataFrame(
        [("IPR1", "KIN1"), ("IPR1", "ABL2")], "entry_acc string, gene string"
    )
    d = _docs(spark, dims, entry_genes=genes)["IPR1"]
    fields = [(f.name, f.value) for f in d.doc.fields]
    # gene fields sit after the uniprot_id family and before
    # taxonomy_name (reference ebisearch.py:269-281)
    iid = max(i for i, f in enumerate(fields) if f[0] == "uniprot_id")
    itax = min(i for i, f in enumerate(fields) if f[0] == "taxonomy_name")
    assert fields[iid + 1 : itax] == [
        ("uniprot_gene", "ABL2"),
        ("uniprot_gene", "KIN1"),
    ]


def test_signature_and_relationship_docs(spark, dims):
    docs = _docs(spark, dims)
    # integrated signature: set field + INTERPRO xref
    pf = docs["PF001"]
    names = [f.name for f in pf.doc.fields]
    assert names == [
        "id", "type", "creation_date", "description", "source_database",
        "name", "short_name", "set",
    ]
    assert [(x.dbname, x.dbkey) for x in pf.doc.cross_references] == [
        ("INTERPRO", "IPR1")
    ]
    # un-integrated signature without short_name: no set/short_name/xrefs
    pthr = docs["PTHR1"]
    assert [f.name for f in pthr.doc.fields] == [
        "id", "type", "creation_date", "description", "source_database", "name",
    ]
    assert list(pthr.doc.cross_references) == []
    # child entry carries parent relationship xref
    assert ("INTERPRO", "IPR1") in [
        (x.dbname, x.dbkey) for x in docs["IPR2"].doc.cross_references
    ]


def test_chunk_boundaries_and_envelope(spark, dims, tmp_path):
    docs = entry_documents(dims[0], entry_proteins=dims[1], entry_taxa=dims[2])
    rows = {r.entry_acc: r.n_fields for r in docs.collect()}
    # family-type docs in entry_acc order: IPR1 (heavy), PF001, PTHR1
    cap = rows["IPR1"]  # running total reaches the cap at PF001
    chunked = {
        (r.entry_acc): (r.entry_type, r.chunk)
        for r in chunk_documents(docs, cap).collect()
    }
    assert chunked["IPR1"] == ("family", 0)
    # greedy flush rule (reference ebisearch.py:322-341): running + n
    # >= cap flushes before appending, so PF001 starts chunk 1 and the
    # counter resets — PTHR1 joins it (9 + 6 < cap)
    assert chunked["PF001"] == ("family", 1)
    assert chunked["PTHR1"] == ("family", 1)
    assert chunked["IPR2"] == ("domain", 0)    # per-type chunking

    out = str(tmp_path / "ebisearch")
    export_ebisearch(docs, out, "99.0", "2026-01-01", fields_per_file=cap)
    files = sorted(glob.glob(out + "/entry_type=*/chunk=*/part-*.txt"))
    payloads = [json.loads(open(f).read()) for f in files]
    assert {p["release"] for p in payloads} == {"99.0"}
    assert {p["release_date"] for p in payloads} == {"2026-01-01"}
    assert all(p["name"] == "InterPro" for p in payloads)
    assert all(p["entry_count"] == len(p["entries"]) for p in payloads)
    # every doc lands in exactly one file
    total = sum(p["entry_count"] for p in payloads)
    assert total == 4
    # greedy flush: every file is strictly under the cap unless it
    # holds a single document that alone reaches it
    for p in payloads:
        weights = [
            len(e["fields"]) + len(e["cross_references"]) for e in p["entries"]
        ]
        assert sum(weights) < cap or len(weights) == 1


def test_pubmed_go_extref_xrefs(spark, dims):
    entries = dims[0]
    pubmed = spark.createDataFrame(
        [("IPR1", 111), ("IPR1", 111), ("PF001", 222)], "entry_acc string, pmid long"
    )
    go = spark.createDataFrame(
        [("IPR1", "GO:0005524"), ("PF001", "GO:9999999")],  # sig GO ignored
        "entry_acc string, go_id string",
    )
    extrefs = spark.createDataFrame(
        [("IPR1", "cazy", "GH5"), ("PF001", "cazy", "GH6")],  # sig extref ignored
        "entry_acc string, ref_db string, ref_id string",
    )
    docs = {
        r.entry_acc: r
        for r in entry_documents(
            entries, entry_pubmed=pubmed, entry_go=go, entry_extrefs=extrefs
        ).collect()
    }
    ipr = [(x.dbname, x.dbkey) for x in docs["IPR1"].doc.cross_references]
    assert ipr == [
        ("PFAM", "PF001"),       # member signature
        ("CAZY", "GH5"),         # entry cross-reference, upper-cased
        ("PUBMED", "111"),       # deduped
        ("GO", "GO:0005524"),
        ("INTERPRO", "IPR2"),    # relationship
    ]
    # signature docs: only INTERPRO + PUBMED (reference :129-147)
    pf = [(x.dbname, x.dbkey) for x in docs["PF001"].doc.cross_references]
    assert pf == [("INTERPRO", "IPR1"), ("PUBMED", "222")]


def test_pathways_and_previous_short_names(spark, dims):
    from pyspark.sql import functions as F

    entries = dims[0].withColumn(
        "old_short_names",
        F.when(F.col("entry_acc") == "IPR1", F.expr("array('kin', 'old_kin')")),
    )
    pathways = spark.createDataFrame(
        [("IPR1", "metacyc", "PWY-1"), ("IPR1", "reactome", "R-HSA-2")],
        "entry_acc string, pathway_db string, pathway_id string",
    )
    docs = {
        r.entry_acc: r
        for r in entry_documents(entries, entry_pathways=pathways).collect()
    }
    fields = [(f.name, f.value) for f in docs["IPR1"].doc.fields]
    # 'kin' == short_name is dropped; 'old_kin' survives
    assert ("previous_short_name", "old_kin") in fields
    assert ("previous_short_name", "kin") not in fields
    xrefs = [(x.dbname, x.dbkey) for x in docs["IPR1"].doc.cross_references]
    assert xrefs[-2:] == [("METACYC", "PWY-1"), ("REACTOME", "R-HSA-2")]


def test_restore_citations(spark):
    from pyspark.sql import functions as F

    from interpro7_dw_spark.domain.ebisearch import restore_citations

    df = spark.createDataFrame(
        [
            # known with PMID, known without PMID, unknown
            ("Alpha [cite:PUB1] beta [cite:PUB2] gamma [cite:PUB9], delta",
             [("PUB1", "123"), ("PUB2", None)]),
            # no pubs at all: unknown markers stripped
            ("X [cite:PUB5], tail", None),
        ],
        "description string, pubs array<struct<pub_id string, pmid string>>",
    )
    got = [r.out for r in df.select(restore_citations("description", "pubs").alias("out")).collect()]
    assert got[0] == "Alpha [PMID:123] beta [cite:PUB2] gamma delta"
    assert got[1] == "X tail"
