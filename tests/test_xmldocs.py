"""Byte-fidelity tests for the XML document compositions
(domain/xmldocs.py) against an expected serialization built with
xml.dom.minidom the same way the reference writers do
(interpro/ftp/xmlfiles.py:457-551,786-875 for match_complete;
xmlfiles.py:209-452 for interpro.xml)."""

from __future__ import annotations

import glob
import gzip
import json
from xml.dom.minidom import getDOMImplementation

import pytest
from pyspark.sql import functions as F

from interpro7_dw_spark.domain.pipeline import merge_protein_matches
from interpro7_dw_spark.domain.xmldocs import (
    _DC_CODES,
    interpro_entries_xml,
    match_complete_proteins,
    release_dbinfo_xml,
)


@pytest.fixture(scope="module")
def fixture(spark):
    matches = spark.createDataFrame(
        [
            # two locations, one with a discontinuous 2-fragment string,
            # plus a second signature and an integrated entry
            ("P1", "SIGA", None, 10, 50, None, 0.25),
            ("P1", "SIGA", None, 60, 90, "60-70-N,80-90-C", 0.5),
            # small scores: Python str() writes '0.0005' / '1e-05' where
            # Java would write '5.0E-4' / '1.0E-5' (functions/pyfloat.py)
            ("P1", "SIGB", None, 10, 45, None, 0.0005),
            ("P2", "SIGB", None, 5, 25, None, 1e-05),
        ],
        "protein_acc string, signature_acc string, model_acc string, "
        "pos_from long, pos_to long, fragments string, score double",
    )
    signatures = spark.createDataFrame(
        [
            ("SIGA", "Sig <A> & co", "sigA", "Pfam", "domain", "hmm", "IPR1"),
            ("SIGB", "Sig B", "sigB", "CDD", "domain", "hmm", None),
        ],
        "signature_acc string, name string, short_name string, "
        "database string, type string, evidence string, entry_acc string",
    )
    entries = spark.createDataFrame(
        [
            ("IPR1", 'Entry "one"', "entry_1", "Domain", None),
            ("IPR2", "Entry two", "entry_2", "Family", "IPR1"),
        ],
        "entry_acc string, name string, short_name string, type string, parent_acc string",
    )
    proteins = spark.createDataFrame(
        [
            ("P1", "PROT1_HUMAN", 400, "ABCDEF0123456789", "9606", True),
            ("P2", "PROT2_MOUSE", 200, "0123456789ABCDEF", "10090", False),
            ("P3", "PROT3_YEAST", 100, "FFFF0000FFFF0000", "4932", False),
        ],
        "protein_acc string, name string, length int, crc64 string, taxid string, reviewed boolean",
    )
    return matches, signatures, entries, proteins


def _expected_protein_elem(doc, protein, matches_by_sig, sig_dim, ent_dim):
    """Build the expected <protein> element with minidom, mirroring the
    reference builder (_export_matches + create_matches + create_lcn)."""
    acc, name, length, crc64, taxid, reviewed = protein
    elem = doc.createElement("protein")
    elem.setAttribute("id", acc)
    elem.setAttribute("name", name)
    elem.setAttribute("length", str(length))
    elem.setAttribute("crc64", crc64)
    elem.setAttribute("taxid", taxid)
    elem.setAttribute("status", "reviewed" if reviewed else "unreviewed")

    for sig_acc in sorted(matches_by_sig):
        locations = matches_by_sig[sig_acc]
        sig = sig_dim[sig_acc]
        models = {}
        for loc in locations:
            models.setdefault(loc["model"], []).append(loc)
        for model, locs in models.items():
            m = doc.createElement("match")
            m.setAttribute("id", sig_acc)
            m.setAttribute("name", sig["name"])
            m.setAttribute("dbname", sig["database"])
            m.setAttribute("status", "T")
            m.setAttribute("model", model)
            m.setAttribute("evd", sig["evidence"])
            m.setAttribute("type", sig["type"])
            if sig["entry_acc"]:
                ent = ent_dim[sig["entry_acc"]]
                ipr = doc.createElement("ipr")
                ipr.setAttribute("id", sig["entry_acc"])
                ipr.setAttribute("name", ent["name"])
                ipr.setAttribute("type", ent["type"])
                if ent["parent_acc"]:
                    ipr.setAttribute("parent_id", ent["parent_acc"])
                m.appendChild(ipr)
            for loc in locs:
                frags = loc["fragments"]
                lcn = doc.createElement("lcn")
                lcn.setAttribute("start", str(frags[0]["start"]))
                lcn.setAttribute("end", str(max(f["end"] for f in frags)))
                lcn.setAttribute(
                    "fragments",
                    ",".join(
                        f"{f['start']}-{f['end']}-{_DC_CODES[f['dc-status']]}"
                        for f in frags
                    ),
                )
                lcn.setAttribute("score", str(loc["score"]))
                lcn.setAttribute(
                    "representative", "true" if loc.get("representative") else "false"
                )
                m.appendChild(lcn)
            elem.appendChild(m)
    return elem


def test_match_complete_protein_elements_byte_fidelity(spark, fixture):
    matches, signatures, entries, proteins = fixture
    merged = merge_protein_matches(matches, signatures, entries)
    got = {
        r.protein_acc: r.xml
        for r in match_complete_proteins(merged, signatures, entries, proteins).collect()
    }

    # expected: parse the pipeline's own locations JSON (already
    # golden-tested in test_domain.py) and render through minidom
    sig_rows = merged.filter(F.col("source_database") != "INTERPRO").collect()
    by_protein: dict[str, dict[str, list]] = {}
    for r in sig_rows:
        by_protein.setdefault(r.protein_acc, {})[r.accession] = json.loads(r.locations)
    sig_dim = {r.signature_acc: r.asDict() for r in signatures.collect()}
    ent_dim = {r.entry_acc: r.asDict() for r in entries.collect()}

    doc = getDOMImplementation().createDocument(None, None, None)
    for prot in proteins.collect():
        elem = _expected_protein_elem(
            doc, tuple(prot), by_protein.get(prot.protein_acc, {}), sig_dim, ent_dim
        )
        expected = elem.toprettyxml(indent="  ", newl="\n").rstrip("\n")
        assert got[prot.protein_acc] == expected, prot.protein_acc

    # empty protein renders self-closed, like minidom
    assert got["P3"] == (
        '<protein id="P3" name="PROT3_YEAST" length="100" '
        'crc64="FFFF0000FFFF0000" taxid="4932" status="unreviewed"/>'
    )


def test_export_match_complete_file_framing(spark, fixture, tmp_path):
    from interpro7_dw_spark.domain.xmldocs import export_match_complete

    matches, signatures, entries, proteins = fixture
    merged = merge_protein_matches(matches, signatures, entries)
    out = str(tmp_path / "match_complete_xml")
    dbs = [
        {"dbname": "PFAM", "version": "37.0", "entry_count": 2, "file_date": "01-JAN-26"},
    ]
    export_match_complete(merged, signatures, entries, proteins, out, databases=dbs)

    parts = glob.glob(out + "/part-*.txt.gz")
    assert len(parts) == 1
    text = gzip.open(parts[0], "rt", encoding="utf-8").read()
    assert text.startswith(
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<!DOCTYPE interpromatch SYSTEM "match_complete.dtd">\n'
        "<interpromatch>\n"
        "<release>\n"
        '  <dbinfo dbname="PFAM" version="37.0" entry_count="2" file_date="01-JAN-26"/>\n'
        "</release>\n"
    )
    assert text.rstrip("\n").endswith("</interpromatch>")
    # well-formed end to end
    from xml.dom.minidom import parseString

    dom = parseString(text)
    assert len(dom.getElementsByTagName("protein")) == 3
    assert len(dom.getElementsByTagName("match")) == 3
    assert len(dom.getElementsByTagName("lcn")) == 4


def test_interpro_entries_xml(spark, fixture):
    _, signatures, entries, _ = fixture
    counts = spark.createDataFrame(
        [("IPR1", 10)], "entry_acc string, n_proteins int"
    )
    go = spark.createDataFrame(
        [("IPR1", "GO:0005524", "Molecular Function", "ATP binding")],
        "entry_acc string, go_id string, category string, go_name string",
    )
    got = {
        r.entry_acc: r.xml
        for r in interpro_entries_xml(entries, signatures, counts, go_terms=go).collect()
    }
    assert got["IPR1"] == (
        '<interpro id="IPR1" protein_count="10" short_name="entry_1" '
        'type="Domain" is-llm="false" is-llm-reviewed="false">\n'
        "  <name>Entry &quot;one&quot;</name>\n"
        "  <class_list>\n"
        '    <classification id="GO:0005524" class_type="GO">\n'
        "      <category>Molecular Function</category>\n"
        "      <description>ATP binding</description>\n"
        "    </classification>\n"
        "  </class_list>\n"
        "  <child_list>\n"
        '    <rel_ref ipr_ref="IPR2"/>\n'
        "  </child_list>\n"
        "  <member_list>\n"
        '    <db_xref protein_count="0" db="Pfam" dbkey="SIGA" name="sigA"/>\n'
        "  </member_list>\n"
        "</interpro>"
    )
    assert got["IPR2"] == (
        '<interpro id="IPR2" protein_count="0" short_name="entry_2" '
        'type="Family" is-llm="false" is-llm-reviewed="false">\n'
        "  <name>Entry two</name>\n"
        "  <parent_list>\n"
        '    <rel_ref ipr_ref="IPR1"/>\n'
        "  </parent_list>\n"
        "  <member_list/>\n"
        "</interpro>"
    )


def test_release_dbinfo_block():
    dbs = [
        {"version": "99.0", "dbname": "InterPro", "entry_count": 5, "file_date": "01-JAN-26"},
    ]
    assert release_dbinfo_xml(dbs, ("version", "dbname", "entry_count", "file_date")) == (
        "<release>\n"
        '  <dbinfo version="99.0" dbname="InterPro" entry_count="5" file_date="01-JAN-26"/>\n'
        "</release>"
    )


def test_uniparc_protein_elements(spark):
    from interpro7_dw_spark.domain.xmldocs import uniparc_protein_xml

    matches = spark.createDataFrame(
        [
            # HAMAP: feature renders as alignment; fragments optional
            ("UPI1", "MF_1", "HamapSig", "HAMAP", "hmm", None,
             "IPR1", "Entry one", "Family", None,
             [(5, 40, 12.5, None, "MA-CL")]),
            # Pfam: feature renders as sequence-feature
            ("UPI1", "PF1", "PfamSig", "Pfam", "hmm", "PF1.2",
             None, None, None, None,
             [(10, 60, 1.0, "10-30-S,40-60-N", "sf1"), (70, 90, 5e-4, None, None)]),
            # PIRSR: dropped entirely (uniparc.py:73-76)
            ("UPI1", "PIRSR1", "PirSig", "PIRSR", "hmm", None,
             None, None, None, None, [(1, 5, 0.1, None, None)]),
        ],
        "upi string, signature_acc string, sig_name string, library string, "
        "evidence string, model_acc string, entry_acc string, entry_name string, "
        "entry_type string, entry_parent string, "
        "locations array<struct<start:long, end:long, score:double, "
        "fragments:string, seq_feature:string>>",
    )
    proteins = spark.createDataFrame(
        [("UPI1", 100, "AABB"), ("UPI2", 50, "CCDD")],
        "upi string, length int, crc64 string",
    )
    got = {r.upi: r.xml for r in uniparc_protein_xml(matches, proteins).collect()}
    assert got["UPI1"] == (
        '<protein id="UPI1" length="100" crc64="AABB">\n'
        '  <match id="MF_1" name="HamapSig" dbname="HAMAP" status="T" evd="hmm" model="MF_1">\n'
        '    <ipr id="IPR1" name="Entry one" type="Family"/>\n'
        '    <lcn start="5" end="40" score="12.5" alignment="MA-CL"/>\n'
        "  </match>\n"
        '  <match id="PF1" name="PfamSig" dbname="Pfam" status="T" evd="hmm" model="PF1.2">\n'
        '    <lcn start="10" end="60" score="1.0" fragments="10-30-S,40-60-N" sequence-feature="sf1"/>\n'
        '    <lcn start="70" end="90" score="0.0005"/>\n'
        "  </match>\n"
        "</protein>"
    )
    assert got["UPI2"] == '<protein id="UPI2" length="50" crc64="CCDD"/>'


def test_sites_protein_xml(spark):
    from interpro7_dw_spark.domain.xmldocs import sites_protein_xml

    site_rows = spark.createDataFrame(
        [
            ("P1", "SIGX", None, "PIRSR", "Active site",
             [("H", 10, 10), ("D", 25, 26)]),
            ("P1", "SIGX", None, "PIRSR", "Binding site",
             [("K", 40, 40)]),
        ],
        "protein_acc string, entry_acc string, entry_name string, "
        "database string, description string, "
        "locations array<struct<residue:string, start:long, end:long>>",
    )
    proteins = spark.createDataFrame(
        [("P1", "PROT1", 100, "AA11", "9606", True),
         ("P2", "PROT2", 50, "BB22", "4932", False)],  # no sites -> omitted
        "protein_acc string, name string, length int, crc64 string, "
        "taxid string, reviewed boolean",
    )
    rows = sites_protein_xml(site_rows, proteins).collect()
    assert [r.protein_acc for r in rows] == ["P1"]
    assert rows[0].xml == (
        '<protein id="P1" name="PROT1" length="100" crc64="AA11" taxid="9606" status="reviewed">\n'
        '  <match id="SIGX" name="SIGX" dbname="PIRSR">\n'
        "    <sites>\n"
        '      <site description="Active site">\n'
        "        <site-locations>\n"
        '          <site-location start="10" end="10" residue="H"/>\n'
        '          <site-location start="25" end="26" residue="D"/>\n'
        "        </site-locations>\n"
        "      </site>\n"
        '      <site description="Binding site">\n'
        "        <site-locations>\n"
        '          <site-location start="40" end="40" residue="K"/>\n'
        "        </site-locations>\n"
        "      </site>\n"
        "    </sites>\n"
        "  </match>\n"
        "</protein>"
    )


def test_interpro_pub_list(spark, fixture):
    _, signatures, entries, _ = fixture
    counts = spark.createDataFrame([("IPR1", 10)], "entry_acc string, n_proteins int")
    lit = spark.createDataFrame(
        [
            ("IPR1", "PUB1", "Smith J, Doe A", "A title", None, 123,
             "J Mol Biol", None, "12", None, "100-110", 1999),
            # no PMID -> MEDLINE placeholder; no title/journal; ISBN book
            ("IPR1", "PUB2", None, None, "http://x", None,
             None, "978-3", None, "4", None, None),
        ],
        "entry_acc string, pub_id string, authors string, title string, "
        "url string, pmid long, journal string, isbn string, volume string, "
        "issue string, pages string, year int",
    )
    got = {
        r.entry_acc: r.xml
        for r in interpro_entries_xml(entries, signatures, counts, literature=lit).collect()
    }
    x = got["IPR1"]
    i1, i2 = x.index('<publication id="PUB1">'), x.index('<publication id="PUB2">')
    assert i1 < i2  # sorted by pub id
    assert (
        '    <publication id="PUB1">\n'
        "      <author_list>Smith J, Doe A</author_list>\n"
        "      <title>A title</title>\n"
        '      <db_xref db="PUBMED" dbkey="123"/>\n'
        "      <journal>J Mol Biol</journal>\n"
        '      <location volume="12" pages="100-110"/>\n'
        "      <year>1999</year>\n"
        "    </publication>"
    ) in x
    assert (
        '    <publication id="PUB2">\n'
        "      <author_list>Unknown</author_list>\n"
        "      <url>http://x</url>\n"
        '      <db_xref db="MEDLINE" dbkey="MEDLINE"/>\n'
        "      <book_title>ISBN:978-3</book_title>\n"
        '      <location issue="4"/>\n'
        "    </publication>"
    ) in x
    assert "  <pub_list>\n" in x and "\n  </pub_list>" in x


def test_interpro_xref_structure_keyspecies_blocks(spark, fixture):
    _, signatures, entries, _ = fixture
    counts = spark.createDataFrame([("IPR1", 10)], "entry_acc string, n_proteins int")
    xrefs = spark.createDataFrame(
        [("IPR1", "CAZY", "GH5"), ("IPR1", "CAZY", "GH1")],
        "entry_acc string, ref_db string, ref_id string",
    )
    pdbs = spark.createDataFrame(
        [("IPR1", "2abc"), ("IPR1", "1xyz")], "entry_acc string, pdb_id string"
    )
    tax = spark.createDataFrame(
        [("IPR1", "Bacteria", 7)], "entry_acc string, taxon_name string, n_proteins int"
    )
    keysp = spark.createDataFrame(
        [("IPR1", "Homo sapiens", 3)], "entry_acc string, taxon_name string, n_proteins int"
    )
    got = {
        r.entry_acc: r.xml
        for r in interpro_entries_xml(
            entries, signatures, counts,
            taxonomy_distribution=tax,
            cross_references=xrefs,
            structures=pdbs,
            key_species=keysp,
        ).collect()
    }
    x = got["IPR1"]
    assert (
        "  <external_doc_list>\n"
        '    <db_xref db="CAZY" dbkey="GH1"/>\n'
        '    <db_xref db="CAZY" dbkey="GH5"/>\n'
        "  </external_doc_list>\n"
        "  <structure_db_links>\n"
        '    <db_xref db="PDB" dbkey="1xyz"/>\n'
        '    <db_xref db="PDB" dbkey="2abc"/>\n'
        "  </structure_db_links>\n"
        "  <taxonomy_distribution>\n"
        '    <taxon_data name="Bacteria" proteins_count="7"/>\n'
        "  </taxonomy_distribution>\n"
        "  <key_species>\n"
        '    <taxon_data name="Homo sapiens" proteins_count="3"/>\n'
        "  </key_species>\n"
        "</interpro>"
    ) in x
    # entries without these inputs render an empty taxonomy_distribution
    # and no optional blocks
    assert "<external_doc_list>" not in got["IPR2"]
    assert "<taxonomy_distribution/>" in got["IPR2"]


def test_isoform_interleaving_via_union(spark, fixture):
    # variant rows unioned into the inputs land directly after their
    # master in the accession sort (reference xmlfiles.py:544-551)
    matches, signatures, entries, proteins = fixture
    iso_matches = spark.createDataFrame(
        [("P1-1", "SIGB", None, 7, 30, None, 0.5)], matches.schema
    )
    merged = merge_protein_matches(
        matches.unionByName(iso_matches), signatures, entries
    )
    iso_proteins = spark.createDataFrame(
        [("P1-1", "P1-1", 390, "ABCDEF0123456789", "9606", True)],
        proteins.schema,
    )
    out = match_complete_proteins(
        merged, signatures, entries, proteins.unionByName(iso_proteins)
    ).collect()
    order = [r.protein_acc for r in out]
    assert order == ["P1", "P1-1", "P2", "P3"]
    iso_xml = out[1].xml
    # variant open tags write status BEFORE taxid (xmlfiles.py:519-525);
    # masters write taxid first (xmlfiles.py:478-485)
    assert iso_xml.startswith(
        '<protein id="P1-1" name="P1-1" length="390" '
        'crc64="ABCDEF0123456789" status="reviewed" taxid="9606">'
    )
    assert out[0].xml.startswith(
        '<protein id="P1" name="PROT1_HUMAN" length="400" '
        'crc64="ABCDEF0123456789" taxid="9606" status="reviewed">'
    )
    assert '<match id="SIGB"' in iso_xml


def test_uniparc_match_archive_member_framing(spark, tmp_path):
    # member packaging (reference interpro/ftp/uniparc.py:19-57): one
    # NNNNNN.xml per sorted-UPI range, numbered from 000001, each
    # opening with the XML declaration and holding bare <protein>
    # elements, all tar.gz'd as uniparc_match.tar.gz
    import tarfile

    from interpro7_dw_spark.domain.xmldocs import (
        export_uniparc_match_archive,
        uniparc_protein_xml,
    )

    matches = spark.createDataFrame(
        [("UPI3", "PF1", "PfamSig", "Pfam", "hmm", None,
          None, None, None, None, [(1, 9, 0.5, None, None)])],
        "upi string, signature_acc string, sig_name string, library string, "
        "evidence string, model_acc string, entry_acc string, entry_name string, "
        "entry_type string, entry_parent string, "
        "locations array<struct<start:long, end:long, score:double, "
        "fragments:string, seq_feature:string>>",
    )
    proteins = spark.createDataFrame(
        [("UPI1", 10, "AA"), ("UPI2", 20, "BB"), ("UPI3", 30, "CC")],
        "upi string, length int, crc64 string",
    )
    df = uniparc_protein_xml(matches, proteins)
    path = export_uniparc_match_archive(df, str(tmp_path), proteins_per_member=2)
    with tarfile.open(path, "r:gz") as tf:
        names = tf.getnames()
        assert names == ["000001.xml", "000002.xml"]
        m1 = tf.extractfile("000001.xml").read().decode()
        m2 = tf.extractfile("000002.xml").read().decode()
    assert m1 == (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<protein id="UPI1" length="10" crc64="AA"/>\n'
        '<protein id="UPI2" length="20" crc64="BB"/>\n'
    )
    assert m2 == (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<protein id="UPI3" length="30" crc64="CC">\n'
        '  <match id="PF1" name="PfamSig" dbname="Pfam" status="T" evd="hmm" model="PF1">\n'
        '    <lcn start="1" end="9" score="0.5"/>\n'
        "  </match>\n"
        "</protein>\n"
    )


def test_toad_matches_framing_and_no_ipr_children(spark, fixture, tmp_path):
    # ftp-toad-matches (reference xmlfiles.py:662-729): identical match
    # composition but include_interpro_entry=False and the CC-BY
    # licensed interpromatch framing
    import glob as _glob
    import gzip as _gzip

    from interpro7_dw_spark.domain.xmldocs import (
        toad_license_header,
        toad_matches_proteins,
    )
    from interpro7_dw_spark.sources.sinks import write_xml

    matches, signatures, entries, proteins = fixture
    merged = merge_protein_matches(matches, signatures, entries)
    rows = toad_matches_proteins(merged, signatures, proteins)
    xml = {r.protein_acc: r.xml for r in rows.collect()}
    # integrated signatures exist in the fixture, yet no <ipr> children
    assert any("<match" in x for x in xml.values())
    assert all("<ipr" not in x for x in xml.values())

    out = str(tmp_path / "toad_xml")
    write_xml(
        rows.select("xml"),
        out,
        lambda r: r.xml + "\n",
        "interpromatch",
        header=toad_license_header(2026),
        compression="gzip",
    )
    [part] = _glob.glob(out + "/part-*.txt.gz")
    text = _gzip.open(part, "rt", encoding="utf-8").read()
    assert text.startswith(
        '<?xml version="1.0" encoding="UTF-8"?>\n<!--\nCopyright 2026 Google LLC'
    )
    assert "This is not an official Google product.\n-->" in text
    assert "<interpromatch>" in text and text.rstrip("\n").endswith("</interpromatch>")


def test_match_complete_extra_feature_matches(spark, fixture):
    """Sequence-feature extra <match> elements (create_extra_match,
    xmlfiles.py:821-843): appended after every signature match, no
    type attr, bare start/end lcns with the optional sequence-feature
    attr; a feature-only protein still gets a non-self-closed element."""
    matches, signatures, entries, proteins = fixture
    merged = merge_protein_matches(matches, signatures, entries)
    features = spark.createDataFrame(
        [
            ("P1", "MOBIDB_LITE", "disorder_prediction", "MOBIDB_LITE",
             "Consensus disorder prediction",
             # out-of-order locations: the render sorts them and the
             # feature's leftmost location (1, 30) places it FIRST
             # among the extras despite its late accession
             [(40, 60, None), (1, 30, "Polar")]),
            ("P1", "COILS", "Coil", "COILS", "Coiled-coils",
             [(5, 25, "")]),  # empty seq_feature: attr omitted (truthiness)
            # feature-only protein
            ("P3", "SIGNALP_E", "SignalP", "SIGNALP_EUK", "SignalP",
             [(1, 19, None)]),
        ],
        "protein_acc string, accession string, name string, "
        "database string, evidence string, "
        "locations array<struct<pos_start int, pos_end int, seq_feature string>>",
    )
    got = {
        r.protein_acc: r.xml
        for r in match_complete_proteins(
            merged, signatures, entries, proteins, features=features
        ).collect()
    }

    doc = getDOMImplementation().createDocument(None, None, None)

    def extra_elem(acc, name, db, evd, locs):
        m = doc.createElement("match")
        m.setAttribute("id", acc)
        m.setAttribute("name", name)
        m.setAttribute("dbname", db)
        m.setAttribute("status", "T")
        m.setAttribute("model", acc)
        m.setAttribute("evd", evd)
        for start, end, seq_feature in locs:
            lcn = doc.createElement("lcn")
            lcn.setAttribute("start", str(start))
            lcn.setAttribute("end", str(end))
            if seq_feature:
                lcn.setAttribute("sequence-feature", seq_feature)
            m.appendChild(lcn)
        return m.toprettyxml(indent="  ", newl="\n").rstrip("\n")

    def indent(block):
        return "\n".join("  " + line for line in block.split("\n"))

    # P1: signature matches unchanged, then extras by leftmost location
    # (MOBIDB_LITE starts at 1, before COILS at 5 — store order,
    # oracle/matches.py:576-580), locations position-sorted
    base = {
        r.protein_acc: r.xml
        for r in match_complete_proteins(
            merged, signatures, entries, proteins
        ).collect()
    }
    expected_extra = "\n".join(
        indent(x)
        for x in [
            extra_elem("MOBIDB_LITE", "disorder_prediction", "MOBIDB_LITE",
                       "Consensus disorder prediction",
                       [(1, 30, "Polar"), (40, 60, None)]),
            extra_elem("COILS", "Coil", "COILS", "Coiled-coils",
                       [(5, 25, "")]),
        ]
    )
    assert got["P1"] == base["P1"].replace(
        "\n</protein>", "\n" + expected_extra + "\n</protein>"
    )
    # P2 has no features: byte-identical to the featureless render
    assert got["P2"] == base["P2"]
    # P3 was self-closed; with a feature it opens
    assert got["P3"] == (
        '<protein id="P3" name="PROT3_YEAST" length="100" '
        'crc64="FFFF0000FFFF0000" taxid="4932" status="unreviewed">\n'
        + indent(extra_elem("SIGNALP_E", "SignalP", "SIGNALP_EUK",
                            "SignalP", [(1, 19, None)]))
        + "\n</protein>"
    )
