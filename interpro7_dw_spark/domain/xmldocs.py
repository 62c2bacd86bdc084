"""Concrete XML document composition — the row→element projections
behind the reference's FTP XML deliverables:

- ``match_complete.xml.gz`` per-protein match elements
  (reference interpro/ftp/xmlfiles.py:457-551,556-659,786-875);
- ``interpro.xml.gz`` per-entry elements
  (reference interpro/ftp/xmlfiles.py:209-452);
- ``uniparc_match`` protein elements (reference
  interpro/ftp/uniparc.py:60-125) share the match/lcn shapes.

The reference serializes with ``xml.dom.minidom``'s
``writexml(addindent="  ", newl="\n")``; these builders reproduce that
byte format (two-space child indent, one element per line, insertion-
order attributes, minidom escaping rules, single-text-child elements
rendered inline) as pure JVM column expressions — one XML string per
protein/entry row, assembled with ``concat``/``transform``/
``array_join`` inside whole-stage codegen. No Python in the row path;
the framing (header, root tags, ``<release>`` block) rides
``sources/sinks.write_xml``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.pyfloat import py_double_sql

# inverse of fragments.DC_STATUSES (reference xmlfiles.py:23)
_DC_CODES = {
    "CONTINUOUS": "S",
    "N_TERMINAL_DISC": "N",
    "C_TERMINAL_DISC": "C",
    "NC_TERMINAL_DISC": "NC",
}

# parsed shape of the merge pipeline's locations JSON (domain/pipeline.py)
LOCATIONS_SCHEMA = (
    "array<struct<fragments: array<struct<start: bigint, `end`: bigint, "
    "`dc-status`: string>>, representative: boolean, model: string, score: double>>"
)


def esc_attr(c: Column) -> Column:
    """minidom attribute escaping: & < > \" (in that order)."""
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    c = F.regexp_replace(c, ">", "&gt;")
    return F.regexp_replace(c, '"', "&quot;")


def esc_text(c: Column) -> Column:
    """minidom _write_data escaping (& < \" > — applies to text nodes
    and attribute values alike in minidom)."""
    return esc_attr(c)


def _esc_sql(expr: str) -> str:
    """The same minidom escaping as a SQL snippet, for values rendered
    inside F.expr-composed element strings."""
    return (
        "replace(replace(replace(replace(" + expr + ", '&', '&amp;'), "
        "'<', '&lt;'), '>', '&gt;'), '\"', '&quot;')"
    )


def _attr(name: str, value: Column) -> Column:
    return F.concat(F.lit(f' {name}="'), esc_attr(value), F.lit('"'))


def _dc_code_expr(status_field: str) -> str:
    branches = " ".join(
        f"WHEN {status_field} = '{k}' THEN '{v}'" for k, v in _DC_CODES.items()
    )
    return f"CASE {branches} END"


def _lcn_expr() -> str:
    """SQL expression rendering one parsed location struct ``l`` as a
    ``<lcn .../>`` element at the given indent (reference
    create_lcn, xmlfiles.py:845-875): start = first fragment start,
    end = max fragment end, fragments string rebuilt START-END-CODE,
    score rendered as Python ``str(score)`` (py_double_sql — the
    reference writes ``str(location["score"])``, xmlfiles.py:869)."""
    frag_str = (
        "array_join(transform(l.fragments, f -> concat(f.start, '-', f.end, '-', "
        + _dc_code_expr("f.`dc-status`")
        + ")), ',')"
    )
    return f"""
      concat('<lcn start="', l.fragments[0].start,
             '" end="', array_max(transform(l.fragments, f -> f.end)),
             '" fragments="', {frag_str},
             '" score="', {py_double_sql('l.score')},
             '" representative="', if(l.representative, 'true', 'false'), '"/>')
    """


def match_elements(parsed: DataFrame) -> DataFrame:
    """One row per (protein_acc, accession, model) ``<match>`` element.

    ``parsed``: signature-level merge output with ``locs`` (parsed
    locations array), ``sig_name``, ``source_database``, ``evidence``,
    ``type``, plus nullable entry fields ``entry_acc``, ``entry_name``,
    ``entry_type``, ``entry_parent``. Locations are grouped by model in
    first-occurrence order (reference create_matches,
    xmlfiles.py:786-823) — ``array_distinct`` preserves it.
    """
    lcn = _lcn_expr()
    return (
        parsed.select(
            "*",
            F.posexplode(
                F.expr("array_distinct(transform(locs, l -> l.model))")
            ).alias("mpos", "model"),
        )
        .withColumn("mlocs", F.expr("filter(locs, l -> l.model <=> model)"))
        .select(
            "protein_acc",
            "accession",
            # first-occurrence model order within a signature (reference
            # groups locations into a dict, xmlfiles.py:787-794)
            "mpos",
            "model",
            F.concat(
                F.lit("<match"),
                _attr("id", F.col("accession")),
                _attr("name", F.col("sig_name")),
                _attr("dbname", F.col("source_database")),
                F.lit(' status="T"'),
                _attr("model", F.col("model")),
                _attr("evd", F.col("evidence")),
                _attr("type", F.col("type")),
                F.lit(">\n"),
                F.when(
                    F.col("entry_acc").isNotNull(),
                    F.concat(
                        F.lit("    <ipr"),
                        _attr("id", F.col("entry_acc")),
                        _attr("name", F.col("entry_name")),
                        _attr("type", F.col("entry_type")),
                        F.when(
                            F.col("entry_parent").isNotNull(),
                            _attr("parent_id", F.col("entry_parent")),
                        ).otherwise(F.lit("")),
                        F.lit("/>\n"),
                    ),
                ).otherwise(F.lit("")),
                F.expr(f"array_join(transform(mlocs, l -> concat('    ', {lcn})), '\\n')"),
                F.lit("\n  </match>"),
            ).alias("xml"),
        )
    )


def match_complete_proteins(
    merged: DataFrame,
    signatures: DataFrame,
    entries: DataFrame,
    proteins: DataFrame,
    features: DataFrame | None = None,
) -> DataFrame:
    """Compose ``<protein>`` elements for match_complete.xml from the
    merge pipeline output (reference _export_matches,
    xmlfiles.py:457-551): signature matches sorted by accession, each
    expanded per model, INTERPRO rows folded into ``<ipr>`` children.

    ``proteins`` columns: protein_acc, name, length, crc64, taxid,
    reviewed (boolean). Returns (protein_acc, xml) sorted composition-
    ready; feed to ``sources.sinks.write_xml`` with root
    ``interpromatch``.

    ``features`` (optional): the sequence-features store (reference
    fs, xmlfiles.py:467-513) — one row per (protein_acc, accession)
    with ``name``, ``database``, ``evidence`` and ``locations``
    (array<struct<pos_start int, pos_end int, seq_feature string>>,
    kept in array order). Each becomes an extra ``<match>`` element
    (create_extra_match, xmlfiles.py:821-843: id/name/dbname/
    status="T"/model/evd attrs, NO type attr, bare start/end lcns
    with the optional sequence-feature attr) appended AFTER every
    signature match. Locations are sorted by (pos_start, pos_end) and
    extra matches by the leftmost location (pos_start, pos_end of
    locations[0], accession tiebreak) — the store order the reference
    builds in _merge_feature_matches (oracle/matches.py:576-580) and
    emits verbatim. The sequence-feature attr follows the reference's
    truthiness check (xmlfiles.py:837): omitted for NULL *and* for
    empty-string seq_feature.

    Isoforms (reference xmlfiles.py:517-551: variant elements follow
    their master, ``XXXX-1`` before ``XXXX-2``): union variant-keyed
    match rows into ``merged`` and variant rows (name = variant acc,
    taxid/status inherited from the master) into ``proteins`` — ASCII
    accession sort interleaves ``P1 < P1-1 < P1-2 < P10`` exactly like
    the reference's per-master loop. Variant open tags write ``status``
    BEFORE ``taxid`` (xmlfiles.py:519-525 setAttribute order), the
    reverse of master rows — detected by ``-`` in the accession.
    """
    sig_dim = F.broadcast(
        signatures.select(
            F.col("signature_acc").alias("accession"),
            F.col("name").alias("sig_name"),
            F.col("evidence"),
        )
    )
    ent_dim = F.broadcast(
        entries.select(
            F.col("entry_acc"),
            F.col("name").alias("entry_name"),
            F.col("type").alias("entry_type"),
            F.col("parent_acc").alias("entry_parent"),
        )
    )
    parsed = (
        merged.filter(F.col("source_database") != "INTERPRO")
        .withColumn("locs", F.from_json("locations", LOCATIONS_SCHEMA))
        .join(sig_dim, "accession", "left")
        .join(ent_dim, "entry_acc", "left")
    )
    elems = match_elements(parsed)

    per_protein = elems.groupBy("protein_acc").agg(
        F.expr(
            """
            array_join(
              transform(
                array_sort(collect_list(struct(accession, mpos, xml))),
                x -> concat('  ', x.xml)),
              '\\n')
            """
        ).alias("matches_xml")
    )

    per_protein_extra = None
    if features is not None:
        extra_lcn = (
            "concat('    <lcn start=\"', l.pos_start, '\" end=\"', "
            "l.pos_end, '\"', if(l.seq_feature is not null "
            "and l.seq_feature != '', "
            f"concat(' sequence-feature=\"', {_esc_sql('l.seq_feature')}, "
            "'\"'), ''), '/>')"
        )
        loc_sorted = (
            "array_sort(locations, (a, b) -> CASE "
            "WHEN a.pos_start < b.pos_start THEN -1 "
            "WHEN a.pos_start > b.pos_start THEN 1 "
            "WHEN a.pos_end < b.pos_end THEN -1 "
            "WHEN a.pos_end > b.pos_end THEN 1 ELSE 0 END)"
        )
        extra = features.withColumn("locations", F.expr(loc_sorted)).select(
            "protein_acc",
            "accession",
            F.expr("locations[0].pos_start").alias("l0_start"),
            F.expr("locations[0].pos_end").alias("l0_end"),
            F.concat(
                F.lit("<match"),
                _attr("id", F.col("accession")),
                _attr("name", F.col("name")),
                _attr("dbname", F.col("database")),
                F.lit(' status="T"'),
                _attr("model", F.col("accession")),
                _attr("evd", F.col("evidence")),
                F.lit(">\n"),
                F.expr(
                    f"array_join(transform(locations, l -> {extra_lcn}), '\\n')"
                ),
                F.lit("\n  </match>"),
            ).alias("xml"),
        )
        per_protein_extra = extra.groupBy("protein_acc").agg(
            F.expr(
                """
                array_join(
                  transform(
                    array_sort(collect_list(
                      struct(l0_start, l0_end, accession, xml))),
                    x -> concat('  ', x.xml)),
                  '\\n')
                """
            ).alias("extra_xml")
        )

    prot = proteins.select(
        "protein_acc",
        F.col("name").alias("p_name"),
        F.col("length").cast("string").alias("p_len"),
        "crc64",
        F.col("taxid").cast("string").alias("p_taxid"),
        F.when(F.col("reviewed"), "reviewed").otherwise("unreviewed").alias("p_status"),
    )
    open_tag = F.concat(
        F.lit("<protein"),
        _attr("id", F.col("protein_acc")),
        _attr("name", F.col("p_name")),
        _attr("length", F.col("p_len")),
        _attr("crc64", F.col("crc64")),
        # master rows: (taxid, status); isoform variant rows: (status,
        # taxid) — the reference's two element builders differ
        # (xmlfiles.py:478-485 vs 519-525)
        F.when(
            F.col("protein_acc").contains("-"),
            F.concat(_attr("status", F.col("p_status")), _attr("taxid", F.col("p_taxid"))),
        ).otherwise(
            F.concat(_attr("taxid", F.col("p_taxid")), _attr("status", F.col("p_status")))
        ),
    )
    joined = prot.join(per_protein, "protein_acc", "left")
    if per_protein_extra is not None:
        joined = joined.join(per_protein_extra, "protein_acc", "left")
        # extra matches follow every signature match (reference
        # appends them after the create_matches loop, xmlfiles.py:505-513);
        # concat_ws skips whichever side is absent
        body = F.concat_ws("\n", F.col("matches_xml"), F.col("extra_xml"))
        empty = F.col("matches_xml").isNull() & F.col("extra_xml").isNull()
    else:
        body = F.col("matches_xml")
        empty = F.col("matches_xml").isNull()
    return (
        joined.select(
            "protein_acc",
            F.when(empty, F.concat(open_tag, F.lit("/>")))
            .otherwise(
                F.concat(open_tag, F.lit(">\n"), body, F.lit("\n</protein>"))
            )
            .alias("xml"),
        )
        .sort("protein_acc")
    )


def toad_license_header(year: int) -> str:
    """The interpro-N.xml.gz prolog (reference export_toad_matches,
    xmlfiles.py:690-712): XML declaration + the CC-BY license comment,
    with the copyright year injected (the reference stamps
    ``date.today()``; callers pass the release year explicitly so the
    output is reproducible)."""
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f"<!--\nCopyright {year} Google LLC\n\n"
        "The materials are licensed under the Creative Commons "
        "Attribution 4.0 International License (CC-BY). You may obtain "
        "a copy of the CC-BY license at: "
        "https://creativecommons.org/licenses/by/4.0/legalcode\n\n"
        'Unless required by applicable law or agreed to in writing, '
        "all materials distributed here under the CC-BY licenses are "
        'distributed on an "AS IS" BASIS, WITHOUT WARRANTIES OR '
        "CONDITIONS OF ANY KIND, either express or implied. See the "
        "licenses for the specific language governing permissions and "
        "limitations under those licenses.\n\n"
        "This is not an official Google product.\n-->"
    )


def toad_matches_proteins(
    merged: DataFrame, signatures: DataFrame, proteins: DataFrame
) -> DataFrame:
    """ftp-toad-matches / interpro-N.xml.gz protein elements (reference
    export_toad_matches, xmlfiles.py:662-729): the SAME per-protein
    match composition as match_complete, run with
    ``include_interpro_entry=False`` (``_export_matches`` is called
    with an empty entry map, so no ``<ipr>`` children appear even for
    integrated signatures), no features store, and no isoform
    interleaving. Frame with ``write_xml(root_tag='interpromatch',
    header=toad_license_header(year))``."""
    empty_entries = merged.sparkSession.createDataFrame(
        [], "entry_acc string, name string, type string, parent_acc string"
    )
    return match_complete_proteins(
        merged.withColumn("entry_acc", F.lit(None).cast("string")),
        signatures,
        empty_entries,
        proteins,
    )


def _publication_xml() -> F.Column:
    """One ``<publication>`` element from a literature struct row
    (reference xmlfiles.py:304-369): author_list ('Unknown' fallback),
    optional title/url, db_xref PUBMED-or-MEDLINE, optional journal,
    ISBN book_title, volume/issue/pages location, year."""
    return F.concat(
        F.lit('    <publication id="'),
        esc_attr(F.col("pub_id")),
        F.lit('">\n      <author_list>'),
        esc_text(F.coalesce(F.col("authors"), F.lit("Unknown"))),
        F.lit("</author_list>\n"),
        F.when(
            F.col("title").isNotNull(),
            F.concat(F.lit("      <title>"), esc_text(F.col("title")), F.lit("</title>\n")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("url").isNotNull(),
            F.concat(F.lit("      <url>"), esc_text(F.col("url")), F.lit("</url>\n")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("pmid").isNotNull(),
            F.concat(F.lit('      <db_xref db="PUBMED" dbkey="'), F.col("pmid").cast("string"), F.lit('"/>\n')),
        ).otherwise(F.lit('      <db_xref db="MEDLINE" dbkey="MEDLINE"/>\n')),
        F.when(
            F.col("journal").isNotNull(),
            F.concat(F.lit("      <journal>"), esc_text(F.col("journal")), F.lit("</journal>\n")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("isbn").isNotNull(),
            F.concat(F.lit("      <book_title>ISBN:"), esc_text(F.col("isbn")), F.lit("</book_title>\n")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("volume").isNotNull() | F.col("issue").isNotNull() | F.col("pages").isNotNull(),
            F.concat(
                F.lit("      <location"),
                F.when(F.col("volume").isNotNull(), _attr("volume", F.col("volume"))).otherwise(F.lit("")),
                F.when(F.col("issue").isNotNull(), _attr("issue", F.col("issue"))).otherwise(F.lit("")),
                F.when(F.col("pages").isNotNull(), _attr("pages", F.col("pages"))).otherwise(F.lit("")),
                F.lit("/>\n"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("year").isNotNull(),
            F.concat(F.lit("      <year>"), F.col("year").cast("string"), F.lit("</year>\n")),
        ).otherwise(F.lit("")),
        F.lit("    </publication>"),
    )


def interpro_entries_xml(
    entries: DataFrame,
    signatures: DataFrame,
    entry2protein_count: DataFrame,
    go_terms: DataFrame | None = None,
    taxonomy_distribution: DataFrame | None = None,
    literature: DataFrame | None = None,
    cross_references: DataFrame | None = None,
    structures: DataFrame | None = None,
    key_species: DataFrame | None = None,
) -> DataFrame:
    """Compose ``<interpro>`` elements for interpro.xml (reference
    xmlfiles.py:209-452): entry attributes, name, abstract, class_list
    (GO), parent_list / child_list, member_list with per-signature
    protein counts, taxonomy_distribution.

    ``entries`` columns: entry_acc, name, short_name, type, parent_acc,
    optional ``abstract`` (plain text), optional booleans ``llm`` /
    ``llm_reviewed``. ``entry2protein_count``: (entry_acc, n_proteins).
    ``go_terms``: (entry_acc, go_id, category, go_name). ``signatures``
    must carry (signature_acc, short_name, database, entry_acc) and
    joins ``entry2protein_count`` per signature via
    (signature_acc, n_proteins) in ``member_counts`` — here the per-
    signature count defaults to the entry count's signature rows if a
    ``n_proteins`` column is present on ``signatures``.
    """
    has_abstract = "abstract" in entries.columns
    has_llm = "llm" in entries.columns

    members = (
        signatures.filter(F.col("entry_acc").isNotNull())
        .select(
            "entry_acc",
            F.col("signature_acc"),
            F.col("short_name").alias("sig_short"),
            F.col("database").alias("sig_db"),
            (
                F.col("n_proteins")
                if "n_proteins" in signatures.columns
                else F.lit(0)
            ).cast("string").alias("sig_np"),
        )
        .groupBy("entry_acc")
        .agg(
            F.expr(
                f"""
                array_join(
                  transform(
                    array_sort(collect_list(struct(signature_acc, sig_np, sig_db, sig_short))),
                    x -> concat('    <db_xref protein_count="', x.sig_np,
                                '" db="', {_esc_sql('x.sig_db')},
                                '" dbkey="', {_esc_sql('x.signature_acc')},
                                '" name="', {_esc_sql('x.sig_short')}, '"/>')),
                  '\\n')
                """
            ).alias("members_xml")
        )
    )

    children = (
        entries.filter(F.col("parent_acc").isNotNull())
        .groupBy(F.col("parent_acc").alias("entry_acc"))
        .agg(
            F.expr(
                """
                array_join(
                  transform(array_sort(collect_list(entry_acc)),
                            c -> concat('    <rel_ref ipr_ref="', c, '"/>')),
                  '\\n')
                """
            ).alias("children_xml")
        )
    )

    go_xml = None
    if go_terms is not None:
        # the reference writes GO terms in entry.go_terms insertion order
        # (xmlfiles.py:285-302); callers preserving that order pass a
        # ``pos`` column, otherwise terms are canonicalized by go_id
        go_key = "pos, go_id" if "pos" in go_terms.columns else "go_id"
        go_xml = go_terms.groupBy("entry_acc").agg(
            F.expr(
                f"""
                array_join(
                  transform(
                    array_sort(collect_list(struct({go_key}, category, go_name))),
                    g -> concat('    <classification id="', {_esc_sql('g.go_id')},
                                '" class_type="GO">\\n',
                                '      <category>', {_esc_sql('g.category')}, '</category>\\n',
                                '      <description>', {_esc_sql('g.go_name')}, '</description>\\n',
                                '    </classification>')),
                  '\\n')
                """
            ).alias("go_xml")
        )

    tax_xml = None
    if taxonomy_distribution is not None:
        tax_xml = taxonomy_distribution.groupBy("entry_acc").agg(
            F.expr(
                f"""
                array_join(
                  transform(
                    array_sort(collect_list(struct(taxon_name, n_proteins))),
                    x -> concat('    <taxon_data name="', {_esc_sql('x.taxon_name')},
                                '" proteins_count="', x.n_proteins, '"/>')),
                  '\\n')
                """
            ).alias("tax_xml")
        )

    xref_xml = None
    if cross_references is not None:
        # external_doc_list: sorted by (db, id) (reference :402-410)
        xref_xml = cross_references.groupBy("entry_acc").agg(
            F.expr(
                f"""
                array_join(
                  transform(array_sort(collect_list(struct(ref_db, ref_id))),
                            x -> concat('    <db_xref db="', {_esc_sql('x.ref_db')},
                                        '" dbkey="', {_esc_sql('x.ref_id')}, '"/>')),
                  '\\n')
                """
            ).alias("xref_xml")
        )

    struct_xml = None
    if structures is not None:
        # structure_db_links: PDB ids in input order canonicalized sorted
        # (reference :412-418 iterates the per-entry list)
        struct_xml = structures.groupBy("entry_acc").agg(
            F.expr(
                f"""
                array_join(
                  transform(array_sort(collect_list(pdb_id)),
                            p -> concat('    <db_xref db="PDB" dbkey="',
                                        {_esc_sql('p')}, '"/>')),
                  '\\n')
                """
            ).alias("struct_xml")
        )

    keysp_xml = None
    if key_species is not None:
        # key_species: sorted (name, count) taxon_data rows (:430-439)
        keysp_xml = key_species.groupBy("entry_acc").agg(
            F.expr(
                f"""
                array_join(
                  transform(array_sort(collect_list(struct(taxon_name, n_proteins))),
                            x -> concat('    <taxon_data name="', {_esc_sql('x.taxon_name')},
                                        '" proteins_count="', x.n_proteins, '"/>')),
                  '\\n')
                """
            ).alias("keysp_xml")
        )

    pub_xml = None
    if literature is not None:
        # publications sorted by id (reference xmlfiles.py:305-307)
        pub_xml = (
            literature.withColumn("pxml", _publication_xml())
            .groupBy("entry_acc")
            .agg(
                F.expr(
                    "array_join(transform(array_sort(collect_list(struct(pub_id, pxml))),"
                    " x -> x.pxml), '\\n')"
                ).alias("pub_xml")
            )
        )

    df = (
        entries.join(F.broadcast(entry2protein_count), "entry_acc", "left")
        .join(members, "entry_acc", "left")
        .join(F.broadcast(children), "entry_acc", "left")
    )
    if go_xml is not None:
        df = df.join(F.broadcast(go_xml), "entry_acc", "left")
    if tax_xml is not None:
        df = df.join(F.broadcast(tax_xml), "entry_acc", "left")
    if pub_xml is not None:
        df = df.join(F.broadcast(pub_xml), "entry_acc", "left")
    if xref_xml is not None:
        df = df.join(F.broadcast(xref_xml), "entry_acc", "left")
    if struct_xml is not None:
        df = df.join(F.broadcast(struct_xml), "entry_acc", "left")
    if keysp_xml is not None:
        df = df.join(F.broadcast(keysp_xml), "entry_acc", "left")

    llm_attr = (
        F.concat(
            F.lit(' is-llm="'),
            F.when(F.col("llm"), "true").otherwise("false"),
            F.lit('" is-llm-reviewed="'),
            F.when(F.col("llm_reviewed"), "true").otherwise("false"),
            F.lit('"'),
        )
        if has_llm
        else F.lit(' is-llm="false" is-llm-reviewed="false"')
    )

    blocks = [
        F.concat(
            F.lit("<interpro"),
            _attr("id", F.col("entry_acc")),
            _attr("protein_count", F.coalesce(F.col("n_proteins"), F.lit(0)).cast("string")),
            _attr("short_name", F.col("short_name")),
            _attr("type", F.col("type")),
            llm_attr,
            F.lit(">"),
        ),
        F.concat(F.lit("  <name>"), esc_text(F.col("name")), F.lit("</name>")),
    ]
    if has_abstract:
        blocks.append(
            F.when(
                F.col("abstract").isNotNull(),
                F.concat(
                    F.lit('  <abstract is-llm="false" is-llm-reviewed="false">'),
                    esc_text(F.col("abstract")),
                    F.lit("</abstract>"),
                ),
            )
        )
    if go_xml is not None:
        blocks.append(
            F.when(
                F.col("go_xml").isNotNull(),
                F.concat(F.lit("  <class_list>\n"), F.col("go_xml"), F.lit("\n  </class_list>")),
            )
        )
    if pub_xml is not None:
        blocks.append(
            F.when(
                F.col("pub_xml").isNotNull(),
                F.concat(F.lit("  <pub_list>\n"), F.col("pub_xml"), F.lit("\n  </pub_list>")),
            )
        )
    blocks.append(
        F.when(
            F.col("parent_acc").isNotNull(),
            F.concat(
                F.lit('  <parent_list>\n    <rel_ref ipr_ref="'),
                F.col("parent_acc"),
                F.lit('"/>\n  </parent_list>'),
            ),
        )
    )
    blocks.append(
        F.when(
            F.col("children_xml").isNotNull(),
            F.concat(F.lit("  <child_list>\n"), F.col("children_xml"), F.lit("\n  </child_list>")),
        )
    )
    # member_list is always present, possibly empty (xmlfiles.py:388-400)
    blocks.append(
        F.when(
            F.col("members_xml").isNotNull(),
            F.concat(F.lit("  <member_list>\n"), F.col("members_xml"), F.lit("\n  </member_list>")),
        ).otherwise(F.lit("  <member_list/>")),
    )
    if xref_xml is not None:
        blocks.append(
            F.when(
                F.col("xref_xml").isNotNull(),
                F.concat(
                    F.lit("  <external_doc_list>\n"),
                    F.col("xref_xml"),
                    F.lit("\n  </external_doc_list>"),
                ),
            )
        )
    if struct_xml is not None:
        blocks.append(
            F.when(
                F.col("struct_xml").isNotNull(),
                F.concat(
                    F.lit("  <structure_db_links>\n"),
                    F.col("struct_xml"),
                    F.lit("\n  </structure_db_links>"),
                ),
            )
        )
    if tax_xml is not None:
        blocks.append(
            F.when(
                F.col("tax_xml").isNotNull(),
                F.concat(
                    F.lit("  <taxonomy_distribution>\n"),
                    F.col("tax_xml"),
                    F.lit("\n  </taxonomy_distribution>"),
                ),
            ).otherwise(F.lit("  <taxonomy_distribution/>")),
        )
    if keysp_xml is not None:
        blocks.append(
            F.when(
                F.col("keysp_xml").isNotNull(),
                F.concat(
                    F.lit("  <key_species>\n"),
                    F.col("keysp_xml"),
                    F.lit("\n  </key_species>"),
                ),
            )
        )

    # concat_ws natively skips NULL arguments, so absent optional blocks
    # (NULL from un-otherwise'd F.when) leave exactly one newline between
    # present blocks — no blank-line cleanup pass that could corrupt
    # abstracts containing legitimate consecutive newlines
    body = F.concat_ws("\n", *blocks)
    return entries.select("entry_acc").join(
        df.select(
            "entry_acc",
            F.concat(body, F.lit("\n</interpro>")).alias("xml"),
        ),
        "entry_acc",
    ).sort("entry_acc")


def release_dbinfo_xml(databases: list[dict], attr_order: tuple[str, ...]) -> str:
    """The ``<release>`` block (xmlfiles.py:216-233,630-645): one
    ``dbinfo`` per database dict with keys matching ``attr_order``
    (interpro.xml uses (version, dbname, entry_count, file_date);
    match_complete.xml uses (dbname, version, entry_count, file_date)).
    Dimension-sized — composed driver-side."""
    lines = ["<release>"]
    for db in databases:
        attrs = "".join(f' {k}="{db[k]}"' for k in attr_order)
        lines.append(f"  <dbinfo{attrs}/>")
    lines.append("</release>")
    return "\n".join(lines)


def export_match_complete(
    merged: DataFrame,
    signatures: DataFrame,
    entries: DataFrame,
    proteins: DataFrame,
    path: str,
    databases: list[dict] | None = None,
    compression: str | None = "gzip",
    features: DataFrame | None = None,
    num_files: int | None = None,
) -> None:
    """match_complete.xml.gz end-to-end (xmlfiles.py:556-659): XML
    declaration + DOCTYPE header, ``<release>`` prolog, sorted
    per-protein elements, ``</interpromatch>`` close. ``num_files``
    switches to the range-split sink (cluster scale: part files whose
    name-order concatenation is the same document, no single-task
    stage)."""
    from ..sources.sinks import write_xml, write_xml_ranged

    df = match_complete_proteins(
        merged, signatures, entries, proteins, features=features
    )
    prolog = release_dbinfo_xml(
        databases or [], ("dbname", "version", "entry_count", "file_date")
    ) if databases else None
    header = ('<?xml version="1.0" encoding="UTF-8"?>\n'
              '<!DOCTYPE interpromatch SYSTEM "match_complete.dtd">')
    if num_files is not None:
        write_xml_ranged(
            df.select("protein_acc", "xml"),
            path,
            row_to_xml=lambda r: r.xml,
            root_tag="interpromatch",
            sort_cols=["protein_acc"],
            num_files=num_files,
            header=header,
            prolog=prolog,
            compression=compression,
        )
        return
    write_xml(
        df.select("xml"),
        path,
        row_to_xml=lambda r: r.xml,
        root_tag="interpromatch",
        header=header,
        prolog=prolog,
        compression=compression,
    )


# libraries whose per-location feature is an alignment, not a
# sequence-feature (reference interpro/ftp/uniparc.py:12-16)
WITH_ALIGNMENT = {"HAMAP", "PROSITE patterns", "PROSITE profiles"}


def uniparc_protein_xml(matches: DataFrame, proteins: DataFrame) -> DataFrame:
    """Compose ``uniparc_match.tar.gz`` member ``<protein>`` elements
    (reference interpro/ftp/uniparc.py:60-125): attrs (id, length,
    crc64) only; per-match elements with attribute order (id, name,
    dbname, status, evd, model) — note evd BEFORE model, unlike
    match_complete — no ``type`` attr; PIRSR matches dropped; lcn
    carries start/end/score, optional fragments, and the feature
    rendered as ``alignment`` for HAMAP/PROSITE libraries,
    ``sequence-feature`` otherwise.

    ``matches`` columns: upi, signature_acc, sig_name, library,
    evidence, model_acc, entry_acc/entry_name/entry_type/entry_parent
    (nullable), locations array<struct<start bigint, end bigint,
    score double, fragments string, seq_feature string>>.
    ``proteins``: upi, length, crc64. Returns (upi, xml) sorted.
    """
    alns = "', '".join(sorted(WITH_ALIGNMENT))
    lcn = f"""
      concat('    <lcn start="', l.start, '" end="', l.end,
             '" score="', {py_double_sql('l.score')}, '"',
             if(l.fragments is not null and l.fragments != '',
                concat(' fragments="', {_esc_sql('l.fragments')}, '"'), ''),
             if(l.seq_feature is not null and l.seq_feature != '',
                concat(' ', if(library in ('{alns}'),
                               'alignment', 'sequence-feature'),
                       '="', {_esc_sql('l.seq_feature')}, '"'),
                ''),
             '/>')
    """
    match_xml = F.concat(
        F.lit("  <match"),
        _attr("id", F.col("signature_acc")),
        _attr("name", F.col("sig_name")),
        _attr("dbname", F.col("library")),
        F.lit(' status="T"'),
        _attr("evd", F.col("evidence")),
        _attr("model", F.coalesce("model_acc", F.col("signature_acc"))),
        F.lit(">\n"),
        F.when(
            F.col("entry_acc").isNotNull(),
            F.concat(
                F.lit("    <ipr"),
                _attr("id", F.col("entry_acc")),
                _attr("name", F.col("entry_name")),
                _attr("type", F.col("entry_type")),
                F.when(
                    F.col("entry_parent").isNotNull(),
                    _attr("parent_id", F.col("entry_parent")),
                ).otherwise(F.lit("")),
                F.lit("/>\n"),
            ),
        ).otherwise(F.lit("")),
        F.expr(f"array_join(transform(locations, l -> {lcn}), '\\n')"),
        F.lit("\n  </match>"),
    )
    per_protein = (
        matches.filter(F.col("library") != "PIRSR")
        .select("upi", F.col("signature_acc").alias("sort_key"), match_xml.alias("mxml"))
        .groupBy("upi")
        .agg(
            F.expr(
                """
                array_join(
                  transform(array_sort(collect_list(struct(sort_key, mxml))),
                            x -> x.mxml), '\\n')
                """
            ).alias("matches_xml")
        )
    )
    open_tag = F.concat(
        F.lit("<protein"),
        _attr("id", F.col("upi")),
        _attr("length", F.col("length").cast("string")),
        _attr("crc64", F.col("crc64")),
    )
    return (
        proteins.join(per_protein, "upi", "left")
        .select(
            "upi",
            F.when(F.col("matches_xml").isNull(), F.concat(open_tag, F.lit("/>")))
            .otherwise(
                F.concat(open_tag, F.lit(">\n"), F.col("matches_xml"), F.lit("\n</protein>"))
            )
            .alias("xml"),
        )
        .sort("upi")
    )


def sites_protein_xml(site_rows: DataFrame, proteins: DataFrame) -> DataFrame:
    """Compose ``sites.xml.gz`` per-protein elements (reference
    export_site_annotations, interpro/ftp/xmlfiles.py:730-781):
    protein -> match (id/name/dbname) -> sites -> site(description) ->
    site-locations -> site-location(start/end/residue). Entry and
    description order canonicalized by key (the reference iterates
    dicts); locations keep input order.

    ``site_rows``: protein_acc, entry_acc, entry_name (nullable — falls
    back to the accession like the reference), database, description,
    locations array<struct<residue string, start bigint, end bigint>>.
    ``proteins``: protein_acc, name, length, crc64, taxid, reviewed.
    """
    site_xml = F.concat(
        F.lit('      <site description="'),
        esc_attr(F.col("description")),
        F.lit('">\n        <site-locations>\n'),
        F.expr(
            "array_join(transform(locations, l -> concat("
            "'          <site-location start=\"', l.start, '\" end=\"', l.end, "
            "'\" residue=\"', " + _esc_sql("l.residue") + ", '\"/>')), '\\n')"
        ),
        F.lit("\n        </site-locations>\n      </site>"),
    )
    per_entry = (
        site_rows.select(
            "protein_acc",
            "entry_acc",
            F.coalesce("entry_name", F.col("entry_acc")).alias("entry_name"),
            "database",
            "description",
            site_xml.alias("sxml"),
        )
        .groupBy("protein_acc", "entry_acc")
        .agg(
            F.first("entry_name").alias("entry_name"),
            F.first("database").alias("database"),
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(description, sxml))),"
                " x -> x.sxml), '\\n')"
            ).alias("sites_xml"),
        )
        .select(
            "protein_acc",
            "entry_acc",
            F.concat(
                F.lit("  <match"),
                _attr("id", F.col("entry_acc")),
                _attr("name", F.col("entry_name")),
                _attr("dbname", F.col("database")),
                F.lit(">\n    <sites>\n"),
                F.col("sites_xml"),
                F.lit("\n    </sites>\n  </match>"),
            ).alias("mxml"),
        )
    )
    per_protein = per_entry.groupBy("protein_acc").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(entry_acc, mxml))),"
            " x -> x.mxml), '\\n')"
        ).alias("matches_xml")
    )
    prot = proteins.select(
        "protein_acc",
        F.col("name").alias("p_name"),
        F.col("length").cast("string").alias("p_len"),
        "crc64",
        F.col("taxid").cast("string").alias("p_taxid"),
        F.when(F.col("reviewed"), "reviewed").otherwise("unreviewed").alias("p_status"),
    )
    open_tag = F.concat(
        F.lit("<protein"),
        _attr("id", F.col("protein_acc")),
        _attr("name", F.col("p_name")),
        _attr("length", F.col("p_len")),
        _attr("crc64", F.col("crc64")),
        _attr("taxid", F.col("p_taxid")),
        _attr("status", F.col("p_status")),
    )
    # inner join: the reference iterates the sites store, emitting only
    # proteins that have site annotations (xmlfiles.py:742-776)
    return (
        prot.join(per_protein, "protein_acc")
        .select(
            "protein_acc",
            F.concat(open_tag, F.lit(">\n"), F.col("matches_xml"), F.lit("\n</protein>")).alias("xml"),
        )
        .sort("protein_acc")
    )


def export_uniparc_match_archive(
    protein_xml: DataFrame,
    outdir: str,
    proteins_per_member: int = 10_000,
) -> str:
    """Package ``uniparc_protein_xml`` rows as ``uniparc_match.tar.gz``
    (reference interpro/ftp/uniparc.py:19-57,60-131): proteins split
    into contiguous sorted-UPI ranges — the reference's per-range
    ``.dat`` stores (SURVEY S3) — one ``NNNNNN.xml`` member per range,
    numbered from 000001 in range order; every member starts with the
    XML declaration line and holds bare ``<protein>`` elements (no
    root), each followed by a newline.

    Member bodies are rendered and grouped distributed (one global
    range sort, one shuffle); the tar itself is a sequential format,
    so members stream to the driver one at a time through
    ``toLocalIterator`` — the same single-writer seam as the
    reference's one ``tarfile`` handle, without materializing more
    than one member in memory. Returns the archive path.
    """
    import io
    import os
    import tarfile

    from pyspark.sql import Window

    w = Window.orderBy("upi")
    members = (
        protein_xml.withColumn("rn", F.row_number().over(w) - 1)
        .withColumn("member", (F.col("rn") / proteins_per_member).cast("long"))
        .groupBy("member")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(upi, xml))),"
                " x -> x.xml), '\\n')"
            ).alias("body")
        )
        .sort("member")
    )
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "uniparc_match.tar.gz")
    with tarfile.open(path, "w:gz") as tf:
        for row in members.toLocalIterator():
            data = (
                '<?xml version="1.0" encoding="UTF-8"?>\n' + row.body + "\n"
            ).encode("utf-8")
            info = tarfile.TarInfo(f"{row.member + 1:06d}.xml")
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    return path
