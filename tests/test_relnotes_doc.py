"""Release-notes document rendering (domain/relnotes_doc.py vs
reference interpro/ftp/relnotes.py:29-185): byte golden of the public
release_notes.txt on a fixture, plus the stats-mart collector."""

from __future__ import annotations

import datetime

from interpro7_dw_spark.domain.relnotes_doc import (
    compose_release_notes,
    export_release_notes,
    ordinal_date,
    render_release_notes,
)

_INTERPRO = {
    "entries": 45,
    "new_entries": ["IPR100", "IPR101", "IPR102"],
    "types": {"domain": 20, "family": 18, "active_site": 7},
    "latest_entry": "IPR102",
    "go_terms": 1234,
}
_DATABASES = [
    # deliberately unsorted: renderer sorts by name
    {"name": "Pfam", "version": "37.0", "signatures": 120,
     "integrated_signatures": 100, "is_new": False, "is_updated": True,
     "recently_integrated": ["PF1", "PF2"]},
    {"name": "CDD", "version": "3.21", "signatures": 60,
     "integrated_signatures": 40, "is_new": True, "is_updated": False,
     "recently_integrated": []},
]
_PROTEINS = {
    "UniProtKB": {"count": 1000, "version": "2026_01", "signatures": 800,
                  "integrated_signatures": 600},
    "UniProtKB/TrEMBL": {"count": 900, "version": "2026_01", "signatures": 720,
                         "integrated_signatures": 540},
    "UniProtKB/Swiss-Prot": {"count": 100, "version": "2026_01",
                             "signatures": 80, "integrated_signatures": 60},
}

_GOLDEN = (
    "Release Notes\n"
    "\n"
    "======================================\n"
    "\n"
    "Release 99.0, 21st March 2026\n"
    "\n"
    "New features include:\n"
    "\n"
    "* The addition of 3 InterPro entries.\n"
    "\n"
    "* New member database CDD (3.21).\n"
    "\n"
    "* An update to Pfam (37.0).\n"
    "\n"
    "* Integration of 2 new methods from the Pfam (2) databases.\n"
    "\n"
    "Contents and coverage of InterPro 99.0\n"
    "InterPro protein matches are now calculated for all UniProtKB and UniParc\n"
    "proteins. The following statistics are for all UniProtKB proteins.\n"
    "InterPro release 99.0 contains 45 entries, representing:\n"
    "           Active site      7\n"
    "                Domain     20\n"
    "                Family     18\n"
    "\n"
    "\n"
    "\n"
    "Last Entry IPR102\n"
    "\n"
    "InterPro cites 555 publications in PubMed.\n"
    "\n"
    "Member database information\n"
    "\n"
    "Signature Database     Version              Signatures*          Integrated Signatures**\n"
    "               CDD        3.21                       60                               40\n"
    "              Pfam        37.0                      120                              100\n"
    "\n"
    "\n"
    "\n"
    "* Some signatures may not have matches to UniProtKB proteins.\n"
    "\n"
    "** Not all signatures of a member database may be integrated at the time\n"
    "of an InterPro release.\n"
    "\n"
    "We use MobiDB-lite, a derivative of the MobiDB database, to provide "
    "consensus annotation of long-range intrinsic disorder in protein sequences.\n"
    "Read more about MobiDB-lite in Bioinformatics, 33(9), 2017, 1402–1404, "
    "(doi: 10.1093/bioinformatics/btx015).\n"
    "\n"
    "\n"
    "   Sequence Database     Version                Count                "
    "        Count of proteins matching        \n"
    "                                                                     "
    "  any signature      integrated signatures\n"
    "           UniProtKB     2026_01                 1000                "
    "      800 (80.0%)            600 (60.0%)\n"
    "    UniProtKB/TrEMBL     2026_01                  900                "
    "      720 (80.0%)            540 (60.0%)\n"
    "UniProtKB/Swiss-Prot     2026_01                  100                "
    "       80 (80.0%)             60 (60.0%)\n"
    "\n"
    "\n"
    "Total number of proteins included in InterPro\n"
    "\n"
    "Canonical sequences: 1000\n"
    "Splice variants: 50\n"
    "Total proteins: 1050\n"
    "\n"
    "InterPro to GO\n"
    "\n"
    "*         Number of GO terms mapped to InterPro  - 1234\n"
    "\n"
    "\n"
    "Feedback\n"
    "We need your help and would welcome any feedback. If you find errors or\n"
    "omissions please let us know. You can contact us at:\n"
    "https://www.ebi.ac.uk/support/interpro-general-query\n"
    "Copyright\n"
    "InterPro - Integrated Resource Of Protein Domains And Functional Sites.\n"
    "Copyright (C) 2026 The InterPro Consortium. This manual and the\n"
    "accompanying database may be copied and redistributed freely, without\n"
    "advance permission, provided that this Copyright statement is reproduced\n"
    "with each copy.\n"
)


def test_ordinal_date_suffixes():
    d = datetime.date
    assert ordinal_date(d(2026, 3, 21)) == "21st March 2026"
    assert ordinal_date(d(2026, 1, 2)) == "2nd January 2026"
    assert ordinal_date(d(2026, 5, 23)) == "23rd May 2026"
    assert ordinal_date(d(2026, 7, 15)) == "15th July 2026"
    assert ordinal_date(d(2026, 12, 31)) == "31st December 2026"


def test_release_notes_byte_golden(tmp_path):
    text = render_release_notes(
        "99.0", datetime.date(2026, 3, 21), _INTERPRO, _DATABASES,
        _PROTEINS, citations=555, num_variants=50,
    )
    assert text == _GOLDEN
    path = export_release_notes(text, str(tmp_path / "ftp"))
    assert open(path, encoding="utf-8").read() == _GOLDEN


def test_compose_from_stats_marts(spark):
    release_stats = spark.createDataFrame(
        [("IPR102", "IPR100,IPR101,IPR102", 3, 1234)],
        "latest_entry string, new_entries string, n_new long, interpro2go long",
    )
    type_counts = spark.createDataFrame(
        [("domain", 20), ("family", 18), ("active_site", 7)],
        "entry_type string, n_entries long",
    )
    member_stats = spark.createDataFrame(
        [
            ("pfam", "Pfam", "37.0", 120, 100, "PF1,PF2", 5, False, True),
            ("cdd", "CDD", "3.21", 60, 40, "", 2, True, False),
        ],
        "db string, name string, version string, signatures long, "
        "integrated_signatures long, recently_integrated string, sets long, "
        "is_new boolean, is_updated boolean",
    )
    seq_stats = spark.createDataFrame(
        [("uniprot", 1000, 800, 600), ("unreviewed", 900, 720, 540),
         ("reviewed", 100, 80, 60)],
        "database string, count long, hit long, integrated long",
    )
    text = compose_release_notes(
        "99.0", datetime.date(2026, 3, 21),
        release_stats, type_counts, member_stats, seq_stats,
        seq_versions={n: "2026_01" for n in _PROTEINS},
        citations=555, num_variants=50,
    )
    assert text == _GOLDEN
