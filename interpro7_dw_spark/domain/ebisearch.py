"""EBISearch JSON document composition (reference ebisearch.py:30-384):
one document per public entry — InterPro entries and member-database
signatures — holding a ``fields`` array (searchable name/value pairs)
and a ``cross_references`` array (dbname/dbkey pairs), chunked into
files of at most ``fields_per_file`` total fields per entry-type
directory, each file wrapped in the
``{name, release, release_date, entry_count, entries}`` envelope.

Spark-first layout: every per-entry array is a pre-aggregated
``collect_list`` joined onto the entry dim and concatenated JVM-side —
no Python in the row path. Chunk assignment replays the reference's
greedy flush rule exactly (flush *before* appending once the running
per-type total would reach the cap, so every file stays strictly under
``fields_per_file``); the sequential fold runs only over the
dimension-sized per-entry field counts — see ``chunk_documents``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FIELD = "array<struct<name: string, value: string>>"
_XREF = "array<struct<dbname: string, dbkey: string>>"


def entry_documents(
    entries: DataFrame,
    entry_proteins: DataFrame | None = None,
    entry_genes: DataFrame | None = None,
    entry_taxa: DataFrame | None = None,
    entry_proteomes: DataFrame | None = None,
    entry_structures: DataFrame | None = None,
    entry_enzymes: DataFrame | None = None,
    entry_clans: DataFrame | None = None,
    entry_pubmed: DataFrame | None = None,
    entry_go: DataFrame | None = None,
    entry_extrefs: DataFrame | None = None,
    entry_pathways: DataFrame | None = None,
) -> DataFrame:
    """Compose EBISearch documents.

    ``entries`` columns: entry_acc, name, short_name, type, database,
    integrated_in (nullable), parent_acc (nullable), description,
    creation_date (pre-formatted string).
    Optional inputs (all keyed by entry_acc):
    - ``entry_proteins``: uniprot_acc, uniprot_id, in_alphafold bool
      (reference ebisearch.py:252-268);
    - ``entry_genes``: gene — one ``uniprot_gene`` field per gene name,
      after the uniprot_id fields (:269-273);
    - ``entry_taxa``: tax_id, taxon_name (:281-291);
    - ``entry_proteomes``: proteome_id (:293-297);
    - ``entry_structures``: pdb_id (:299-303);
    - ``entry_enzymes``: ec (:305-310);
    - ``entry_clans``: clan_acc (-> ``set`` field, :81-86);
    - ``entry_pubmed``: pmid (PUBMED xrefs, reference :109-119 for
      InterPro entries and :137-147 for signatures);
    - ``entry_go``: go_id (GO xrefs on InterPro entries, :121-125);
    - ``entry_extrefs``: ref_db, ref_id (the entry dim's own
      cross-references, upper-cased dbname, :102-108);
    - ``entry_pathways``: pathway_db ('metacyc'/'reactome'),
      pathway_id (:312-319, appended last, upper-cased dbname).

    ``entries`` may carry an optional ``old_short_names`` array column
    — each value different from ``short_name`` becomes a
    ``previous_short_name`` field (:72-77).

    Returns (entry_acc, entry_type, doc, n_fields) where ``doc`` is the
    ``{fields, cross_references}`` struct and n_fields the chunking
    weight len(fields) + len(cross_references).
    """
    e = entries

    # relationships: parent <-> children, both directions (:212-223)
    rel_down = e.filter(F.col("parent_acc").isNotNull()).select(
        F.col("parent_acc").alias("entry_acc"), F.col("entry_acc").alias("rel_acc")
    )
    rel_up = e.filter(F.col("parent_acc").isNotNull()).select(
        "entry_acc", F.col("parent_acc").alias("rel_acc")
    )
    rels = (
        rel_down.unionByName(rel_up)
        .groupBy("entry_acc")
        .agg(F.array_sort(F.collect_list("rel_acc")).alias("rel_accs"))
    )

    # integrates: per InterPro entry, member signatures by database (:224-233)
    sigs = e.filter(
        F.col("integrated_in").isNotNull() & F.col("parent_acc").isNull()
    ).select(
        F.col("integrated_in").alias("entry_acc"),
        F.col("database").alias("member_db"),
        F.col("entry_acc").alias("sig_acc"),
    )
    integrates = sigs.groupBy("entry_acc").agg(
        F.array_sort(F.collect_set("member_db")).alias("member_dbs"),
        F.array_sort(F.collect_list(F.struct("member_db", "sig_acc"))).alias("member_sigs"),
    )

    df = e.join(F.broadcast(rels), "entry_acc", "left").join(
        integrates, "entry_acc", "left"
    )
    if entry_clans is not None:
        df = df.join(
            F.broadcast(entry_clans.select("entry_acc", "clan_acc")), "entry_acc", "left"
        )
    else:
        df = df.withColumn("clan_acc", F.lit(None).cast("string"))

    def agg_pairs(src, alias, value_expr):
        return src.groupBy("entry_acc").agg(F.expr(value_expr).alias(alias))

    joins = []
    if entry_proteins is not None:
        joins.append(
            agg_pairs(
                entry_proteins,
                "prot",
                """
                array_sort(collect_list(struct(
                  uniprot_acc, uniprot_id, in_alphafold)))
                """,
            )
        )
    if entry_genes is not None:
        joins.append(agg_pairs(entry_genes, "genes", "array_sort(collect_list(gene))"))
    if entry_taxa is not None:
        joins.append(
            agg_pairs(entry_taxa, "taxa",
                      "array_sort(collect_list(struct(tax_id, taxon_name)))")
        )
    if entry_proteomes is not None:
        joins.append(agg_pairs(entry_proteomes, "upids",
                               "array_sort(collect_list(proteome_id))"))
    if entry_structures is not None:
        joins.append(agg_pairs(entry_structures, "pdbs",
                               "array_sort(collect_list(pdb_id))"))
    if entry_enzymes is not None:
        joins.append(agg_pairs(entry_enzymes, "ecs", "array_sort(collect_list(ec))"))
    if entry_pubmed is not None:
        joins.append(
            agg_pairs(entry_pubmed, "pmids",
                      "array_sort(collect_set(cast(pmid as string)))")
        )
    if entry_go is not None:
        joins.append(agg_pairs(entry_go, "gos", "array_sort(collect_list(go_id))"))
    if entry_extrefs is not None:
        joins.append(
            agg_pairs(entry_extrefs, "extrefs",
                      "array_sort(collect_list(struct(upper(ref_db) as ref_db, ref_id)))")
        )
    if entry_pathways is not None:
        joins.append(
            agg_pairs(
                entry_pathways, "pathways",
                "array_sort(collect_list(struct(upper(pathway_db) as pdb, pathway_id)))",
            )
        )
    for j in joins:
        df = df.join(j, "entry_acc", "left")
    for c, t in [
        ("prot", "array<struct<uniprot_acc:string,uniprot_id:string,in_alphafold:boolean>>"),
        ("genes", "array<string>"),
        ("taxa", "array<struct<tax_id:string,taxon_name:string>>"),
        ("upids", "array<string>"),
        ("pdbs", "array<string>"),
        ("ecs", "array<string>"),
        ("pmids", "array<string>"),
        ("gos", "array<string>"),
        ("extrefs", "array<struct<ref_db:string,ref_id:string>>"),
        ("pathways", "array<struct<pdb:string,pathway_id:string>>"),
    ]:
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast(t))
    if "old_short_names" not in df.columns:
        df = df.withColumn("old_short_names", F.lit(None).cast("array<string>"))

    is_interpro = F.lower(F.col("database")) == "interpro"

    fields = F.expr(
        """
        concat(
          array(
            struct('id' as name, entry_acc as value),
            struct('type' as name, lower(type) as value),
            struct('creation_date' as name, creation_date as value),
            struct('description' as name, description as value),
            struct('source_database' as name, database as value)),
          if(name is not null, array(struct('name' as name, name as value)),
             cast(array() as """ + _FIELD + """)),
          if(short_name is not null,
             array(struct('short_name' as name, short_name as value)),
             cast(array() as """ + _FIELD + """)),
          if(old_short_names is not null,
             transform(filter(old_short_names, n -> n != short_name),
                       n -> struct('previous_short_name' as name, n as value)),
             cast(array() as """ + _FIELD + """)),
          if(clan_acc is not null, array(struct('set' as name, clan_acc as value)),
             cast(array() as """ + _FIELD + """)),
          if(lower(database) = 'interpro' and member_dbs is not null,
             transform(member_dbs,
                       d -> struct('contributing_database' as name, d as value)),
             cast(array() as """ + _FIELD + """)),
          if(prot is not null,
             transform(prot, p -> struct('uniprot_id' as name, p.uniprot_id as value)),
             cast(array() as """ + _FIELD + """)),
          if(genes is not null,
             transform(genes, g -> struct('uniprot_gene' as name, g as value)),
             cast(array() as """ + _FIELD + """)),
          if(taxa is not null,
             transform(taxa, t -> struct('taxonomy_name' as name, t.taxon_name as value)),
             cast(array() as """ + _FIELD + """))
        )
        """
    )

    xrefs = F.expr(
        """
        concat(
          if(lower(database) = 'interpro' and member_sigs is not null,
             transform(member_sigs,
                       s -> struct(upper(s.member_db) as dbname, s.sig_acc as dbkey)),
             cast(array() as """ + _XREF + """)),
          if(lower(database) = 'interpro' and extrefs is not null,
             transform(extrefs, x -> struct(x.ref_db as dbname, x.ref_id as dbkey)),
             cast(array() as """ + _XREF + """)),
          if(lower(database) = 'interpro' and pmids is not null,
             transform(pmids, p -> struct('PUBMED' as dbname, p as dbkey)),
             cast(array() as """ + _XREF + """)),
          if(lower(database) = 'interpro' and gos is not null,
             transform(gos, g -> struct('GO' as dbname, g as dbkey)),
             cast(array() as """ + _XREF + """)),
          if(lower(database) = 'interpro' and rel_accs is not null,
             transform(rel_accs, r -> struct('INTERPRO' as dbname, r as dbkey)),
             cast(array() as """ + _XREF + """)),
          if(lower(database) != 'interpro' and integrated_in is not null,
             array(struct('INTERPRO' as dbname, integrated_in as dbkey)),
             cast(array() as """ + _XREF + """)),
          if(lower(database) != 'interpro' and pmids is not null,
             transform(pmids, p -> struct('PUBMED' as dbname, p as dbkey)),
             cast(array() as """ + _XREF + """)),
          if(prot is not null,
             flatten(transform(prot, p ->
               if(p.in_alphafold,
                  array(struct('UNIPROT' as dbname, p.uniprot_acc as dbkey),
                        struct('ALPHAFOLD' as dbname, p.uniprot_acc as dbkey)),
                  array(struct('UNIPROT' as dbname, p.uniprot_acc as dbkey))))),
             cast(array() as """ + _XREF + """)),
          if(taxa is not null,
             transform(taxa, t -> struct('TAXONOMY' as dbname, t.tax_id as dbkey)),
             cast(array() as """ + _XREF + """)),
          if(upids is not null,
             transform(upids, u -> struct('PROTEOMES' as dbname, u as dbkey)),
             cast(array() as """ + _XREF + """)),
          if(pdbs is not null,
             transform(pdbs, p -> struct('PDB' as dbname, p as dbkey)),
             cast(array() as """ + _XREF + """)),
          if(ecs is not null,
             transform(ecs, x -> struct('EC' as dbname, x as dbkey)),
             cast(array() as """ + _XREF + """)),
          if(pathways is not null,
             transform(pathways, p -> struct(p.pdb as dbname, p.pathway_id as dbkey)),
             cast(array() as """ + _XREF + """))
        )
        """
    )

    return df.select(
        "entry_acc",
        F.lower(F.col("type")).alias("entry_type"),
        F.struct(
            fields.alias("fields"), xrefs.alias("cross_references")
        ).alias("doc"),
        (F.size(fields) + F.size(xrefs)).cast("long").alias("n_fields"),
    )


def chunk_documents(docs: DataFrame, fields_per_file: int) -> DataFrame:
    """Assign each document a (entry_type, chunk) file slot replaying
    the reference's greedy flush rule exactly (ebisearch.py:322-341):
    a per-type running total; when ``running + n_fields >= cap`` the
    current file is flushed *before* appending, so every file's total
    stays strictly under the cap. The reset at each flush makes this a
    sequential fold, not a prefix sum — but it only runs over the
    dimension-sized ``(entry_acc, entry_type, n_fields)`` projection
    (#entries rows, not #proteins), per-type via ``applyInPandas``, and
    the chunk ids are joined back onto the full documents. Canonical
    order: entry_acc (the reference iterates its BasicStore order)."""
    import pandas as pd

    def assign(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("entry_acc").reset_index(drop=True)
        chunks = []
        running = 0
        chunk = 0
        for n in pdf["n_fields"]:
            if running + int(n) >= fields_per_file and running > 0:
                chunk += 1
                running = 0
            chunks.append(chunk)
            running += int(n)
        pdf["chunk"] = pd.Series(chunks, dtype="int64")
        return pdf

    slots = (
        docs.select("entry_acc", "entry_type", "n_fields")
        .groupBy("entry_type")
        .applyInPandas(
            assign, "entry_acc string, entry_type string, n_fields long, chunk long"
        )
        .select("entry_acc", "chunk")
    )
    return docs.join(F.broadcast(slots), "entry_acc")


def export_ebisearch(
    docs: DataFrame,
    outdir: str,
    release_version: str,
    release_date: str,
    fields_per_file: int = 1_000_000,
) -> None:
    """Write one JSON file per (entry_type, chunk) under
    ``outdir/entry_type=<type>/chunk=<n>/`` with the reference's file
    envelope (ebisearch.py:325-338). Compact JSON (the reference
    pretty-prints with indent=4; payload is semantically identical)."""
    chunked = chunk_documents(docs, fields_per_file)
    payloads = (
        chunked.groupBy("entry_type", "chunk")
        .agg(
            F.count("*").alias("entry_count"),
            F.expr(
                "transform(array_sort(collect_list(struct(entry_acc, doc))), x -> x.doc)"
            ).alias("entries"),
        )
        .select(
            "entry_type",
            "chunk",
            F.to_json(
                F.struct(
                    F.lit("InterPro").alias("name"),
                    F.lit(release_version).alias("release"),
                    F.lit(release_date).alias("release_date"),
                    F.col("entry_count"),
                    F.col("entries"),
                )
            ).alias("value"),
        )
    )
    payloads.select("value", "entry_type", "chunk").write.mode("overwrite").partitionBy(
        "entry_type", "chunk"
    ).text(outdir)


def restore_citations(description, pubs) -> F.Column:
    """Citation-marker cleanup in description text (reference
    ebisearch.py:24-35): ``[cite:PUBnnn]`` becomes ``[PMID:<pmid>]``
    when the entry's literature maps the id to a PMID; markers for ids
    NOT in the entry's literature are removed together with an optional
    trailing comma/whitespace; known ids without a PMID stay as-is.

    ``description``: string column (or name); ``pubs``: column (or
    name) of array<struct<pub_id string, pmid string>>. Pure JVM:
    one fold replaces known-id markers with PMID links or a protected
    placeholder, a regexp sweep strips the remaining (unknown-id)
    markers, and a second fold restores the protected ones.
    """
    desc = F.col(description) if isinstance(description, str) else description
    pubs_col = F.col(pubs) if isinstance(pubs, str) else pubs
    empty = "cast(array() as array<struct<pub_id string, pmid string>>)"
    safe_pubs = F.coalesce(pubs_col, F.expr(empty))
    # pass 1: known ids -> [PMID:..] or <<KEEP:id>> (no-PMID markers
    # must survive the unknown-id sweep below)
    replaced = F.aggregate(
        safe_pubs,
        desc,
        lambda acc, p: F.when(
            p["pmid"].isNotNull(),
            F.replace(
                acc,
                F.concat(F.lit("[cite:"), p["pub_id"], F.lit("]")),
                F.concat(F.lit("[PMID:"), p["pmid"], F.lit("]")),
            ),
        ).otherwise(
            F.replace(
                acc,
                F.concat(F.lit("[cite:"), p["pub_id"], F.lit("]")),
                F.concat(F.lit("<<KEEP:"), p["pub_id"], F.lit(">>")),
            )
        ),
    )
    # pass 2: strip unknown-id markers (+ optional comma/space), then
    # restore the protected known-id markers
    swept = F.regexp_replace(replaced, r"\[cite:PUB\d+\],?\s*", "")
    return F.aggregate(
        safe_pubs,
        swept,
        lambda acc, p: F.replace(
            acc,
            F.concat(F.lit("<<KEEP:"), p["pub_id"], F.lit(">>")),
            F.concat(F.lit("[cite:"), p["pub_id"], F.lit("]")),
        ),
    )
