"""Deterministic InterPro-shaped warehouse fixtures (FIXTURES.md).

``write_warehouse_fixtures`` materializes the canonical input tables
of the pipeline — the shapes distilled in FIXTURES.md from the
reference's Oracle extraction queries — as parquet under one
directory, so :mod:`interpro7_dw_spark.warehouse` can run the whole
mart/flat/XML/JSON build end-to-end against them.

Everything is a literal or an index-derived comprehension: no RNG, no
timestamps taken at run time — rerunning produces byte-identical
tables, which the warehouse resume/snapshot tests rely on.

Cardinalities are deliberately small (tens of proteins) but the
SHAPES carry every edge the transforms branch on: fragmented and
overlapping matches, PANTHER subfamilies, unintegrated signatures,
AntiFam rows, proteins without matches/proteomes/structures, a
3-level entry hierarchy, non-public and deleted entries, clans with
cross-member alignments, multi-chain structures with segment bounds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _taxonomy(spark: SparkSession) -> DataFrame:
    rows = [
        ("1", None, "no rank", "root", "root (full)"),
        ("2157", "1", "superkingdom", "Archaea", "Archaea (full)"),
        ("2759", "1", "superkingdom", "Eukaryota", "Eukaryota (full)"),
        ("9606", "2759", "species", "Homo sapiens", "Homo sapiens (human)"),
        ("10090", "2759", "species", "Mus musculus", "Mus musculus (mouse)"),
        ("4932", "2759", "species", "Saccharomyces cerevisiae", "S. cerevisiae"),
        ("2190", "2157", "species", "Methanocaldococcus jannaschii", "M. jannaschii"),
    ]
    return spark.createDataFrame(
        rows,
        "tax_id string, parent_id string, rank string, sci_name string,"
        " full_name string",
    )


_SPECIES = ["9606", "10090", "4932", "2190"]


def _proteins(spark: SparkSession, n: int = 48) -> DataFrame:
    rows = []
    for i in range(1, n + 1):
        acc = f"P{i:05d}"
        rows.append(
            (
                acc,
                f"PR{i:03d}_FIX",
                i % 3 == 0,
                f"{i:016X}",
                80 + (i * 37) % 400,
                f"20{10 + i % 12:02d}-{1 + i % 12:02d}-{1 + i % 28:02d}",
                i % 11 == 0,
                _SPECIES[i % len(_SPECIES)],
            )
        )
    return spark.createDataFrame(
        rows,
        "protein_acc string, identifier string, reviewed boolean,"
        " crc64 string, length int, date string, is_fragment boolean,"
        " tax_id string",
    )


def _signatures(spark: SparkSession) -> DataFrame:
    rows = [
        # acc, name, short_name, database, type, evidence, entry_acc
        ("PF00001", "Kinase domain", "kin_dom", "Pfam", "domain", "hmm", "IPR000001"),
        ("PF00002", "Kinase C-term", "kin_c", "Pfam", "domain", "hmm", "IPR000001"),
        ("PF00003", "Helicase core", "hel_core", "Pfam", "domain", "hmm", "IPR000002"),
        ("PF00004", "Orphan repeat", "orp_rep", "Pfam", "repeat", "hmm", None),
        ("CD00001", "CDD kinase", "cdd_kin", "CDD", "domain", "hmm", "IPR000001"),
        ("SM00001", "SMART hel", "sm_hel", "SMART", "domain", "hmm", "IPR000002"),
        ("PS00001", "Profile site", "pro_site", "PROSITE profiles", "conserved_site",
         "scan", "IPR000003"),
        ("PTHR10000", "Family X", "fam_x", "PANTHER", "family", "hmm", "IPR000004"),
        ("PTHR10000:SF5", "Subfamily Y", "sub_y", "PANTHER", "family", "hmm", None),
        ("MF00001", "Hamap region", "ham_reg", "HAMAP", "region", "rule", None),
        ("ANF00001", "Spurious fam", "spur", "AntiFam", "family", "hmm", None),
        ("G3DSA:1.10.8.10", "Gene3D helix", "g3d_helix", "CATH-Gene3D",
         "homologous_superfamily", "hmm", "IPR000005"),
    ]
    return spark.createDataFrame(
        rows,
        "signature_acc string, name string, short_name string,"
        " database string, type string, evidence string, entry_acc string",
    )


def _entry_dim(spark: SparkSession) -> DataFrame:
    """Webfront entry dimension: InterPro entries AND member
    signatures as rows (the shape webfront_entry_mart consumes; the
    pipeline/stat shapes are projections of this table)."""
    def row(acc, name, short, typ, db, integrated=None, parent=None,
            public=True, created="2019-03-01", deleted=None,
            old_names=(), old_shorts=(), old_integrations=(), xrefs=()):
        return (acc, name, short, typ, db, integrated, parent, public,
                created, deleted, list(old_names), list(old_shorts),
                list(old_integrations), list(xrefs))

    rows = [
        row("IPR000001", "Kinase", "kinase", "Domain", "InterPro",
            created="2019-01-05",
            xrefs=[("CAZY", "GH1"), ("PANDIT", "PF00001")]),
        row("IPR000002", "Helicase", "helicase", "Domain", "InterPro",
            parent="IPR000001", created="2019-02-10",
            old_names=("Helicase-like",), old_shorts=("hel_like",)),
        row("IPR000003", "Kinase site", "kin_site", "Conserved_site",
            "InterPro", parent="IPR000002", created="2020-06-15"),
        row("IPR000004", "Family X root", "famx", "Family", "InterPro",
            created="2021-09-01"),
        row("IPR000005", "Helix bundle", "helix_b", "Homologous_superfamily",
            "InterPro", created="2024-01-20"),
        row("IPR000099", "Hidden entry", "hidden", "Family", "InterPro",
            public=False, created="2018-05-05"),
        row("IPR000100", "Retired entry", "retired", "Family", "InterPro",
            deleted="2020-01-01", created="2015-01-01"),
        # member signatures (integrated_in wires member_databases)
        row("PF00001", "Kinase domain", "kin_dom", "Domain", "Pfam",
            integrated="IPR000001"),
        row("PF00002", "Kinase C-term", "kin_c", "Domain", "Pfam",
            integrated="IPR000001"),
        row("PF00003", "Helicase core", "hel_core", "Domain", "Pfam",
            integrated="IPR000002"),
        row("PF00004", "Orphan repeat", "orp_rep", "Repeat", "Pfam"),
        row("CD00001", "CDD kinase", "cdd_kin", "Domain", "CDD",
            integrated="IPR000001"),
        row("SM00001", "SMART hel", "sm_hel", "Domain", "SMART",
            integrated="IPR000002"),
        row("PS00001", "Profile site", "pro_site", "Conserved_site",
            "PROSITE profiles", integrated="IPR000003"),
        row("PTHR10000", "Family X", "fam_x", "Family", "PANTHER",
            integrated="IPR000004"),
        row("PTHR10000:SF5", "Subfamily Y", "sub_y", "Family", "PANTHER",
            integrated="PTHR10000", parent="PTHR10000"),
        row("MF00001", "Hamap region", "ham_reg", "Region", "HAMAP"),
        row("ANF00001", "Spurious fam", "spur", "Family", "AntiFam"),
        row("G3DSA:1.10.8.10", "Gene3D helix", "g3d_helix",
            "Homologous_superfamily", "CATH-Gene3D", integrated="IPR000005"),
    ]
    return spark.createDataFrame(
        rows,
        "entry_acc string, name string, short_name string, type string,"
        " database string, integrated_in string, parent_acc string,"
        " public boolean, creation_date string, deletion_date string,"
        " old_names array<string>, old_short_names array<string>,"
        " old_integrations array<struct<db string, entry_acc string>>,"
        " cross_references array<struct<ref_db string, ref_id string>>",
    )


def _matches(spark: SparkSession, n_proteins: int = 48) -> DataFrame:
    """Match rows with the edge cases the pipeline branches on."""
    sig_cycle = [
        ("PF00001", None, None, 12.5),
        ("CD00001", None, None, 5.0),      # overlaps PF00001 -> repr conflict
        ("PF00003", None, None, 9.0),
        ("SM00001", None, None, 4.5),
        ("PTHR10000", "PTHR10000:SF5", None, None),
        ("PF00002", None, None, 3.25),
        ("MF00001", None, None, None),
        ("PS00001", None, None, 7.0),
        ("G3DSA:1.10.8.10", None, None, 2.0),
        ("ANF00001", None, None, 1.0),
        ("PF00004", None, None, 6.0),
    ]
    rows = []
    for i in range(1, n_proteins + 1):
        if i % 7 == 0:
            continue  # matchless proteins exercise left joins
        acc = f"P{i:05d}"
        n_m = 1 + (i % 4)
        for j in range(n_m):
            sig, model, _, score = sig_cycle[(i + j * 3) % len(sig_cycle)]
            start = 1 + 10 * j + (i % 5)
            end = start + 40 + (i % 30)
            frags = None
            if (i + j) % 9 == 0:
                mid = (start + end) // 2
                frags = f"{start}-{mid}-S,{mid + 5}-{end}-C"
            rows.append((acc, sig, model, start, end, frags, score))
        if i % 5 == 0:  # same-entry second signature -> condensation
            rows.append((acc, "PF00002", None, 200 + i % 20, 290 + i % 20,
                         None, 3.0))
    return spark.createDataFrame(
        rows,
        "protein_acc string, signature_acc string, model_acc string,"
        " pos_from long, pos_to long, fragments string, score double",
    )


def _proteomes(spark: SparkSession) -> DataFrame:
    rows = [
        ("UP000001", "Human proteome", True, "ref strain", "GRCh38", "9606"),
        ("UP000002", "Mouse proteome", True, None, "GRCm39", "10090"),
        ("UP000003", "Yeast pan", False, "S288C", "R64", "4932"),
    ]
    return spark.createDataFrame(
        rows,
        "proteome_id string, name string, is_reference boolean,"
        " strain string, assembly string, taxon_id string",
    )


def _protein_proteome(spark: SparkSession, n: int = 48) -> DataFrame:
    ups = {"9606": "UP000001", "10090": "UP000002", "4932": "UP000003"}
    rows = []
    for i in range(1, n + 1):
        tax = _SPECIES[i % len(_SPECIES)]
        if tax in ups and i % 6 != 0:  # some proteins have no proteome
            rows.append((f"P{i:05d}", ups[tax]))
    return spark.createDataFrame(rows, "protein_acc string, proteome_id string")


def _structures(spark: SparkSession) -> DataFrame:
    rows = [
        ("1abc", "Kinase complex", "X-ray diffraction", "2001-06-22", 1.5,
         "[]", None),
        ("2def", "Helicase open state", "X-ray diffraction", "2010-11-02", 3.0,
         "[]", "[]"),
        ("3ghi", "NMR ensemble", "Solution NMR", "2015-04-18", None, "[]", None),
        ("9xyz", "Cryo-EM fold", "Electron Microscopy", "2022-08-30", 2.2,
         "[]", None),
    ]
    return spark.createDataFrame(
        rows,
        "pdb_id string, name string, experiment_type string,"
        " release_date string, resolution double, literature_json string,"
        " secondary_structures_json string",
    )


def _protein_segments(spark: SparkSession, n: int = 48) -> DataFrame:
    """PDBe-style protein<->structure segments (chains + bounds)."""
    pdbs = ["1abc", "2def", "3ghi", "9xyz"]
    rows = []
    for i in range(1, n + 1):
        if i % 4 != 1:  # a quarter of proteins have structures
            continue
        acc = f"P{i:05d}"
        pdb = pdbs[i % len(pdbs)]
        chain = "AB"[i % 2]
        s = 1 + i % 10
        rows.append((pdb, acc, chain, s, s + 60, s + 2, s + 62,
                     s + 2 if i % 3 else None, s + 62 if i % 3 else None))
        if i % 8 == 1:  # second chain on the same structure
            rows.append((pdb, acc, "C", s + 70, s + 120, s + 72, s + 122,
                         None, None))
    return spark.createDataFrame(
        rows,
        "pdb_id string, protein_acc string, chain string,"
        " protein_start int, protein_end int, structure_start int,"
        " structure_end int, author_structure_start int,"
        " author_structure_end int",
    )


def _clans(spark: SparkSession) -> tuple[DataFrame, DataFrame, DataFrame]:
    dim = spark.createDataFrame(
        [
            ("CL0001", "Kinase clan", "Kinase-like folds", "Pfam",
             '["A. Author"]', "[]", "[]"),
            ("CL0002", "Helicase clan", None, "Pfam", "[]", "[]", "[]"),
            ("PTHRCL1", "Panther set", None, "PANTHER", "[]", "[]", "[]"),
        ],
        "clan_acc string, name string, description string, database string,"
        " authors_json string, literature_json string, wikipedia_json string",
    )
    members = spark.createDataFrame(
        [
            ("CL0001", "PF00001", "kin_dom", "Kinase domain", 0.92),
            ("CL0001", "PF00002", "kin_c", "Kinase C-term", 0.81),
            ("CL0001", "CD00001", "cdd_kin", "CDD kinase", 0.5),
            ("CL0002", "PF00003", "hel_core", "Helicase core", 0.99),
            ("CL0002", "SM00001", "sm_hel", "SMART hel", 0.77),
            ("PTHRCL1", "PTHR10000", "fam_x", "Family X", 1.0),
        ],
        "clan_acc string, member_acc string, short_name string,"
        " member_name string, score double",
    )
    alignments = spark.createDataFrame(
        [
            ("PF00001", "PF00002", 1e-12),
            ("PF00002", "PF00001", 1e-10),   # reverse pair: min wins
            ("PF00001", "CD00001", 1e-4),
            ("PF00003", "SM00001", 1e-7),
            ("PF00001", "PF00003", 1e-3),    # cross-clan: filtered out
        ],
        "query_acc string, target_acc string, evalue double",
    )
    return dim, members, alignments


def _databases(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    staging = spark.createDataFrame(
        [
            ("pfam", "Pfam", "37.0"),
            ("cdd", "CDD", "3.21"),
            ("smart", "SMART", "9.0"),
            ("panther", "PANTHER", "19.0"),
            ("hamap", "HAMAP", "2024_06"),
            ("prosite profiles", "PROSITE profiles", "2024_05"),
            ("cath-gene3d", "CATH-Gene3D", "4.4"),
            ("antifam", "AntiFam", "8.0"),
        ],
        "db string, name_long string, version string",
    )
    public = spark.createDataFrame(
        [
            ("pfam", "36.0"),       # updated
            ("cdd", "3.21"),        # unchanged
            ("smart", "9.0"),
            ("panther", "19.0"),
            ("hamap", "2024_06"),
            ("prosite profiles", "2024_05"),
            ("cath-gene3d", "4.4"),
            # antifam absent -> is_new
        ],
        "db string, version string",
    )
    return staging, public


def _previous_release(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    previous_public = spark.createDataFrame(
        [("IPR000001",), ("IPR000002",), ("IPR000003",)], "entry_acc string"
    )
    previous_integrated = spark.createDataFrame(
        [("PF00001",), ("PF00002",), ("CD00001",), ("SM00001",)],
        "entry_acc string",
    )
    return previous_public, previous_integrated


def _entry_go(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [
            ("IPR000001", "GO:0004672", "Molecular Function",
             "protein kinase activity"),
            ("IPR000001", "GO:0006468", "Biological Process",
             "protein phosphorylation"),
            ("IPR000002", "GO:0004386", "Molecular Function",
             "helicase activity"),
        ],
        "entry_acc string, go_id string, category string, go_name string",
    )


def _entry_pubmed(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [
            ("IPR000001", 11111111),
            ("IPR000001", 22222222),
            ("IPR000002", 22222222),
            ("IPR000004", 33333333),
        ],
        "entry_acc string, pmid long",
    )


def _features(spark: SparkSession) -> DataFrame:
    """Sequence-feature store rows (extra <match> elements)."""
    return spark.createDataFrame(
        [
            ("P00001", "MOBIDB_LITE", "disorder_prediction", "MOBIDB_LITE",
             "Consensus disorder prediction",
             [(1, 30, "Polar"), (40, 60, None)]),
            ("P00001", "COILS", "Coil", "COILS", "Coiled-coils",
             [(5, 25, None)]),
            ("P00003", "SIGNALP_E", "SignalP", "SIGNALP_EUK", "SignalP",
             [(1, 19, None)]),
        ],
        "protein_acc string, accession string, name string,"
        " database string, evidence string,"
        " locations array<struct<pos_start int, pos_end int,"
        " seq_feature string>>",
    )


def _alphafold(spark: SparkSession, n: int = 48) -> DataFrame:
    """AlphaFold accession list (reference alphafold.py CSV source):
    every protein except the long/fragment ones."""
    rows = [(f"P{i:05d}",) for i in range(1, n + 1) if i % 5 != 0]
    return spark.createDataFrame(rows, "protein_acc string")


def write_warehouse_fixtures(
    spark: SparkSession, out_dir: str, n_proteins: int = 48
) -> dict[str, str]:
    """Write every fixture table as parquet under ``out_dir``;
    returns {table_name: path}. ``n_proteins`` scales the fact-side
    tables (proteins, matches, proteome/segment/alphafold memberships)
    while the dimensions stay fixed — the knob the scaled ranged-sink
    equivalence test turns."""
    clans_dim, clan_members, clan_alignments = _clans(spark)
    staging_dbs, public_dbs = _databases(spark)
    previous_public, previous_integrated = _previous_release(spark)
    tables: dict[str, DataFrame] = {
        "taxonomy": _taxonomy(spark),
        "protein": _proteins(spark, n_proteins),
        "signature": _signatures(spark),
        "entry_dim": _entry_dim(spark),
        "match": _matches(spark, n_proteins),
        "proteome": _proteomes(spark),
        "protein_proteome": _protein_proteome(spark, n_proteins),
        "structure": _structures(spark),
        "protein_segments": _protein_segments(spark, n_proteins),
        "clan": clans_dim,
        "clan_member": clan_members,
        "clan_alignment": clan_alignments,
        "databases_staging": staging_dbs,
        "databases_public": public_dbs,
        "previous_public_entries": previous_public,
        "previous_integrated": previous_integrated,
        "entry_go": _entry_go(spark),
        "entry_pubmed": _entry_pubmed(spark),
        "features": _features(spark),
        "alphafold": _alphafold(spark, n_proteins),
    }
    out: dict[str, str] = {}
    for name, df in tables.items():
        path = os.path.join(out_dir, name)
        # one file per table: fixture-sized, keeps the tree snapshot stable
        df.coalesce(1).write.mode("overwrite").parquet(path)
        out[name] = path
    return out
