"""Release-notes FTP document (reference interpro/ftp/relnotes.py:
29-185, the public ``release_notes.txt``): renders the release
statistics — already computed and oracle-checked by
``domain/stats.py`` / the ``mart_relnotes`` query — into the
reference's fixed-width text layout, byte for byte.

The literal prose and column widths below ARE the output format spec
(the deliverable is a byte-stable text file); the composition is a
driver-side template fill over dimension-sized stats, like the XML
``<release>`` prolog in ``domain/xmldocs.py``.
"""

from __future__ import annotations

import datetime
import os
from pyspark.sql import DataFrame

_HDR = "Release Notes\n\n======================================\n"

_COVERAGE_TPL = (
    "Contents and coverage of InterPro {version}\n"
    "InterPro protein matches are now calculated for all UniProtKB and UniParc\n"
    "proteins. The following statistics are for all UniProtKB proteins.\n"
    "InterPro release {version} contains {n_entries} entries, representing:\n"
)

_MOBIDB_TPL = (
    "\n\n\n* Some signatures may not have matches to UniProtKB proteins.\n\n"
    "** Not all signatures of a member database may be integrated at the time\n"
    "of an InterPro release.\n\n"
    "We use MobiDB-lite, a derivative of the MobiDB database, to provide "
    "consensus annotation of long-range intrinsic disorder in protein "
    "sequences.\nRead more about MobiDB-lite in Bioinformatics, 33(9), 2017, "
    "1402–1404, (doi: 10.1093/bioinformatics/btx015).\n"
)

_TAIL_TPL = (
    "\n\nTotal number of proteins included in InterPro\n\n"
    "Canonical sequences: {n_canonical}\n"
    "Splice variants: {n_variants}\n"
    "Total proteins: {n_total}\n\n"
    "InterPro to GO\n\n"
    "*         Number of GO terms mapped to InterPro  - {n_go}\n\n\n"
    "Feedback\n"
    "We need your help and would welcome any feedback. If you find errors or\n"
    "omissions please let us know. You can contact us at:\n"
    "https://www.ebi.ac.uk/support/interpro-general-query\n"
    "Copyright\n"
    "InterPro - Integrated Resource Of Protein Domains And Functional Sites.\n"
    "Copyright (C) {year} The InterPro Consortium. This manual and the\n"
    "accompanying database may be copied and redistributed freely, without\n"
    "advance permission, provided that this Copyright statement is reproduced\n"
    "with each copy.\n"
)


def ordinal_date(d: datetime.date) -> str:
    """``4th August 2026`` — the day-ordinal replacement rule
    (relnotes.py:39-48: st for 1/21/31, nd for 2/22, rd for 3/23)."""
    if d.day in (1, 21, 31):
        suffix = "st"
    elif d.day in (2, 22):
        suffix = "nd"
    elif d.day in (3, 23):
        suffix = "rd"
    else:
        suffix = "th"
    return d.strftime("# %B %Y").replace("#", f"{d.day}{suffix}")


def render_release_notes(
    version: str,
    date: datetime.date,
    interpro: dict,
    databases: list[dict],
    proteins: dict,
    citations: int,
    num_variants: int,
    copyright_year: int | None = None,
) -> str:
    """Render the public release-notes text (relnotes.py:50-185).

    ``interpro``: {entries:int, new_entries:list[str], types:{t:int},
    latest_entry:str, go_terms:int}. ``databases``: one dict per member
    db with name/version/signatures/integrated_signatures/is_new/
    is_updated/recently_integrated(list). ``proteins``: per sequence-db
    dict (UniProtKB, UniProtKB/TrEMBL, UniProtKB/Swiss-Prot) with
    count/version/signatures/integrated_signatures.

    ``copyright_year`` defaults to the release date's year — the
    reference stamps ``date.today()`` (relnotes.py:180), which is not
    reproducible; a fixed year keeps the byte golden stable.
    """
    dbs = sorted(databases, key=lambda x: x["name"])
    out: list[str] = [_HDR, "\n", f"Release {version}, {ordinal_date(date)}\n\n"]

    new_entries = len(interpro["new_entries"])
    new_dbs = [f"{d['name']} ({d['version']})" for d in dbs if d["is_new"]]
    upd_dbs = [
        f"{d['name']} ({d['version']})"
        for d in dbs
        if not d["is_new"] and d["is_updated"]
    ]
    integrated = [
        (d["name"], len(d["recently_integrated"]))
        for d in dbs
        if d["recently_integrated"]
    ]
    if new_entries or new_dbs or upd_dbs or integrated:
        out.append("New features include:\n\n")
        if new_entries:
            out.append(f"* The addition of {new_entries} InterPro entries.\n\n")
        if new_dbs:
            out.append(f"* New member database {', '.join(new_dbs)}.\n\n")
        if upd_dbs:
            out.append(f"* An update to {', '.join(upd_dbs)}.\n\n")
        if integrated:
            parts = [f"{name} ({cnt})" for name, cnt in integrated]
            total = sum(cnt for _, cnt in integrated)
            out.append(
                f"* Integration of {total} new methods from the "
                f"{', '.join(parts)} databases.\n\n"
            )

    out.append(_COVERAGE_TPL.format(version=version, n_entries=interpro["entries"]))
    for entry_type in sorted(interpro["types"]):
        cnt = interpro["types"][entry_type]
        label = entry_type.replace("_", " ").capitalize()
        out.append(f"{label:>22} {cnt:>6}\n")

    out.append(
        f"\n\n\nLast Entry {interpro['latest_entry']}\n\n"
        f"InterPro cites {citations} publications in PubMed.\n\n"
        "Member database information\n\n"
    )
    out.append(
        f"{'Signature Database':>18}{'Version':>12}"
        f"{'Signatures*':>25}{'Integrated Signatures**':>33}\n"
    )
    for d in dbs:
        out.append(
            f"{d['name']:>18}{d['version']:>12}"
            f"{d['signatures']:>25}{d['integrated_signatures']:>33}\n"
        )

    out.append(_MOBIDB_TPL)
    out.append(
        f"\n\n{'Sequence Database':>20}{'Version':>12}{'Count':>21}{'':16}"
        f"{'Count of proteins matching':^42}\n"
        f"{'':69}{'any signature':^17}{'':4}{'integrated signatures':^21}\n"
    )
    for dbname in ("UniProtKB", "UniProtKB/TrEMBL", "UniProtKB/Swiss-Prot"):
        db = proteins[dbname]
        n_p, n_s, n_is = db["count"], db["signatures"], db["integrated_signatures"]
        out.append(
            f"{dbname:>20}{db['version']:>12}{n_p:>21}{'':16}"
            f"{n_s:>9} ({n_s / n_p * 100:.1f}%){'':6}"
            f"{n_is:>9} ({n_is / n_p * 100:.1f}%)\n"
        )

    n_canonical = proteins["UniProtKB"]["count"]
    out.append(
        _TAIL_TPL.format(
            n_canonical=n_canonical,
            n_variants=num_variants,
            n_total=n_canonical + num_variants,
            n_go=interpro["go_terms"],
            year=copyright_year if copyright_year is not None else date.year,
        )
    )
    return "".join(out)


def compose_release_notes(
    version: str,
    date: datetime.date,
    release_stats: DataFrame,
    type_counts: DataFrame,
    member_stats: DataFrame,
    seq_stats: DataFrame,
    seq_versions: dict[str, str],
    citations: int,
    num_variants: int,
    copyright_year: int | None = None,
) -> str:
    """Collect the (dimension-sized) stats marts from ``domain/stats``
    and render the document:

    - ``release_stats``: interpro_release_stats output (one row);
    - ``type_counts``: entry_type_counts output;
    - ``member_stats``: member_database_stats output;
    - ``seq_stats``: sequence_database_stats output — rows 'reviewed' /
      'unreviewed' / 'uniprot' map to Swiss-Prot / TrEMBL / UniProtKB;
    - ``seq_versions``: version string per sequence database name.
    """
    rel = release_stats.collect()[0]
    interpro = {
        "entries": sum(r.n_entries for r in type_counts.collect()),
        "new_entries": [a for a in rel.new_entries.split(",") if a],
        "types": {r.entry_type: r.n_entries for r in type_counts.collect()},
        "latest_entry": rel.latest_entry,
        "go_terms": rel.interpro2go if "interpro2go" in release_stats.columns else 0,
    }
    databases = [
        {
            "name": r.name,
            "version": r.version,
            "signatures": r.signatures,
            "integrated_signatures": r.integrated_signatures,
            "is_new": r.is_new,
            "is_updated": r.is_updated,
            "recently_integrated": [a for a in r.recently_integrated.split(",") if a],
        }
        for r in member_stats.collect()
    ]
    name_map = {
        "uniprot": "UniProtKB",
        "unreviewed": "UniProtKB/TrEMBL",
        "reviewed": "UniProtKB/Swiss-Prot",
    }
    proteins = {}
    for r in seq_stats.collect():
        name = name_map[r.database]
        proteins[name] = {
            # r["count"]: attribute access collides with Row.count()
            "count": r["count"],
            "version": seq_versions.get(name, ""),
            "signatures": r.hit,
            "integrated_signatures": r.integrated,
        }
    return render_release_notes(
        version, date, interpro, databases, proteins, citations, num_variants,
        copyright_year=copyright_year,
    )


def export_release_notes(text: str, outdir: str, filename: str = "release_notes.txt") -> str:
    """Write the rendered document (single text file, like the
    reference's open(...).write)."""
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, filename)
    with open(path, "wt", encoding="utf-8") as fh:
        fh.write(text)
    return path
