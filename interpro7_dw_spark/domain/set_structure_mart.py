"""webfront_set and webfront_structure full-row marts.

- ``set_mart`` (reference interpro/mysql/clans.py:11-83, ``populate``):
  one row per clan present in the clan2xrefs store — name/description,
  lower-cased source database, the ``relationships`` JSON ({nodes:
  member entries with their membership score, links: best e-value per
  aligned same-clan pair}, reference oracle/clans.py:139-162), the
  Pfam-only authors/literature/wikipedia JSON columns (jsonify
  nullable=False → ``[]`` when absent, mysql/clans.py:59-62), and the
  counts JSON {domain_architectures, entries: {<clan db lower>: n,
  total: n}, proteins, proteomes, structures, taxa}
  (mysql/clans.py:63-70). Two reference quirks carried over exactly:
  ``entries`` holds the clan's OWN database key (xrefs/clans.py:44,
  73-76 key member entries by the clan's database) with ``total``
  renamed from ``all`` and landing LAST in key order
  (mysql/clans.py:47 pops then re-inserts), and ``proteins`` counts
  MATCH ROWS, not distinct proteins (xrefs/clans.py:68 appends per
  match).

- ``structure_mart`` (reference interpro/mysql/structures.py:91-160,
  ``populate_structures``): one row per PDB id in structure2xrefs —
  dim columns (source_database literal ``pdb``), sorted chains JSON,
  the nested ``proteins`` JSON {protein: {chain: [segments sorted by
  (protein_start, protein_end)]}} (structures.py:128-133) with the
  six segment keys of pdbe.py:77-84, pass-through literature /
  secondary_structures JSON, and the counts JSON
  {domain_architectures, entries: {total first, then per-db},
  proteomes, proteins, sets, taxa} in the reference's literal key
  order (structures.py:146-153; note proteomes BEFORE proteins,
  unlike the clan counts).

Canonical orders (documented divergences from load-dependent dict /
Oracle orders): nodes sorted by accession, links by (source, target),
per-db entry keys sorted, nested protein/chain keys sorted. JSON is
compact (``to_json`` style) like every other mart in this repo;
null segment bounds render as JSON ``null`` (``ignoreNullFields``
off) matching Python ``json.dumps``.

Spark-first shape: every block is a groupBy over the subject key with
map-side partial aggregation; the member->clan dim is broadcast; JSON
nesting is built bottom-up with ``array_sort(collect_list(struct))``
folds — no Python serializer in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .marts import clan_xrefs_mart, structure_xrefs_mart


def set_mart(
    clans_dim: DataFrame,
    members: DataFrame,
    alignments: DataFrame,
    matches: DataFrame,
    proteins: DataFrame,
    protein_proteomes: DataFrame,
    domorg_members: DataFrame,
    entry_structures: DataFrame,
) -> DataFrame:
    """Compose webfront_set.

    Inputs:
    - ``clans_dim``: clan_acc, name, description, database,
      authors_json, literature_json, wikipedia_json (the last three
      pre-rendered, ``[]`` when absent — only Pfam fills them);
    - ``members``: clan_acc, member_acc, short_name, member_name,
      score (the membership score shown on nodes);
    - ``alignments``: query_acc, target_acc, evalue — raw alignment
      rows; same-clan filtering and per-pair min-reduction happen
      here (reference oracle/clans.py:100-127);
    - the rest mirror :func:`clan_xrefs_mart`.
    """
    sig_clans = members.select(
        F.col("member_acc").alias("signature_acc"), "clan_acc"
    )
    xr = clan_xrefs_mart(
        matches, sig_clans, proteins, protein_proteomes,
        domorg_members, entry_structures,
    )

    nodes = members.groupBy("clan_acc").agg(
        F.concat(
            F.lit("["),
            F.expr(
                "array_join(transform(array_sort(collect_list(struct("
                "member_acc, short_name, member_name, score))),"
                " x -> concat('{\"accession\":\"', x.member_acc,"
                " '\",\"short_name\":\"', x.short_name,"
                " '\",\"name\":\"', x.member_name,"
                " '\",\"type\":\"entry\",\"score\":', x.score, '}')), ',')"
            ),
            F.lit("]"),
        ).alias("nodes_json")
    )

    q = sig_clans.select(
        F.col("signature_acc").alias("query_acc"),
        F.col("clan_acc").alias("q_clan"),
    )
    tgt = sig_clans.select(
        F.col("signature_acc").alias("target_acc"),
        F.col("clan_acc").alias("t_clan"),
    )
    links = (
        alignments.join(F.broadcast(q), "query_acc")
        .join(F.broadcast(tgt), "target_acc")
        .filter(F.col("q_clan") == F.col("t_clan"))
        .groupBy(
            F.col("q_clan").alias("clan_acc"), "query_acc", "target_acc"
        )
        .agg(F.min("evalue").alias("score"))
        .groupBy("clan_acc")
        .agg(
            F.concat(
                F.lit("["),
                F.expr(
                    "array_join(transform(array_sort(collect_list(struct("
                    "query_acc, target_acc, score))),"
                    " x -> concat('{\"source\":\"', x.query_acc,"
                    " '\",\"target\":\"', x.target_acc,"
                    " '\",\"score\":', x.score, '}')), ',')"
                ),
                F.lit("]"),
            ).alias("links_json")
        )
    )

    return (
        clans_dim.join(xr, "clan_acc")
        .join(nodes, "clan_acc", "left")
        .join(links, "clan_acc", "left")
        .select(
            F.col("clan_acc").alias("accession"),
            "name",
            "description",
            F.lower("database").alias("source_database"),
            F.concat(
                F.lit('{"nodes":'),
                F.coalesce("nodes_json", F.lit("[]")),
                F.lit(',"links":'),
                F.coalesce("links_json", F.lit("[]")),
                F.lit("}"),
            ).alias("relationships"),
            F.col("authors_json").alias("authors"),
            F.col("literature_json").alias("literature"),
            F.col("wikipedia_json").alias("wikipedia"),
            F.concat(
                F.lit('{"domain_architectures":'), F.col("n_dom_orgs"),
                F.lit(',"entries":{"'), F.lower("database"),
                F.lit('":'), F.col("n_entries"),
                F.lit(',"total":'), F.col("n_entries"),
                F.lit('},"proteins":'), F.col("n_protein_matches"),
                F.lit(',"proteomes":'), F.col("n_proteomes"),
                F.lit(',"structures":'), F.col("n_structures"),
                F.lit(',"taxa":'), F.col("n_taxa"),
                F.lit("}"),
            ).alias("counts"),
        )
    )


def structure_mart(
    structures_dim: DataFrame,
    pdb_chains: DataFrame,
    protein_segments: DataFrame,
    pdb_matches: DataFrame,
    signature_clans: DataFrame,
    protein_structures: DataFrame,
    proteins: DataFrame,
    protein_proteomes: DataFrame,
    protein_domorgs: DataFrame,
) -> DataFrame:
    """Compose webfront_structure.

    Inputs:
    - ``structures_dim``: pdb_id, name, experiment_type, release_date
      (pre-formatted string), resolution (nullable double),
      literature_json / secondary_structures_json (nullable);
    - ``pdb_chains``: pdb_id, chain (distinct — from the chain
      sequence store, mysql/structures.py:64-76);
    - ``protein_segments``: pdb_id, protein_acc, chain,
      protein_start, protein_end, structure_start, structure_end,
      author_structure_start, author_structure_end (nullable auth
      bounds, pdbe.py:62-84);
    - the rest mirror :func:`structure_xrefs_mart`.
    """
    xr = structure_xrefs_mart(
        pdb_matches, signature_clans, protein_structures,
        proteins, protein_proteomes, protein_domorgs,
    )

    entries_db = (
        pdb_matches.groupBy("pdb_id", "database")
        .agg(F.countDistinct("signature_acc").alias("n_accs"))
        .groupBy("pdb_id")
        .agg(
            F.sum("n_accs").cast("long").alias("total_entries"),
            F.expr(
                "array_join(transform(array_sort(collect_list(struct("
                "database, n_accs))),"
                " x -> concat('\"', x.database, '\":', x.n_accs)), ',')"
            ).alias("per_db_json"),
        )
    )

    chains = pdb_chains.groupBy("pdb_id").agg(
        F.concat(
            F.lit("["),
            F.expr(
                "array_join(transform(array_sort(collect_list(chain)),"
                " c -> concat('\"', c, '\"')), ',')"
            ),
            F.lit("]"),
        ).alias("chains_json")
    )

    # proteins JSON, nested bottom-up: segments -> chain -> protein
    seg_level = protein_segments.groupBy(
        "pdb_id", "protein_acc", "chain"
    ).agg(
        F.to_json(
            F.expr(
                "array_sort(collect_list(struct("
                "protein_start, protein_end, structure_start,"
                " structure_end, author_structure_start,"
                " author_structure_end)))"
            ),
            {"ignoreNullFields": "false"},
        ).alias("segs_json")
    )
    chain_level = seg_level.groupBy("pdb_id", "protein_acc").agg(
        F.concat(
            F.lit("{"),
            F.expr(
                "array_join(transform(array_sort(collect_list(struct("
                "chain, segs_json))),"
                " x -> concat('\"', x.chain, '\":', x.segs_json)), ',')"
            ),
            F.lit("}"),
        ).alias("chains_map_json")
    )
    protein_level = chain_level.groupBy("pdb_id").agg(
        F.concat(
            F.lit("{"),
            F.expr(
                "array_join(transform(array_sort(collect_list(struct("
                "protein_acc, chains_map_json))),"
                " x -> concat('\"', x.protein_acc, '\":',"
                " x.chains_map_json)), ',')"
            ),
            F.lit("}"),
        ).alias("proteins_json")
    )

    return (
        structures_dim.join(xr, "pdb_id")
        .join(entries_db, "pdb_id", "left")
        .join(chains, "pdb_id", "left")
        .join(protein_level, "pdb_id", "left")
        .select(
            F.col("pdb_id").alias("accession"),
            "name",
            F.lit("pdb").alias("source_database"),
            "experiment_type",
            "release_date",
            "resolution",
            F.col("literature_json").alias("literature"),
            F.coalesce("chains_json", F.lit("[]")).alias("chains"),
            F.coalesce("proteins_json", F.lit("{}")).alias("proteins"),
            F.col("secondary_structures_json").alias("secondary_structures"),
            F.concat(
                F.lit('{"domain_architectures":'), F.col("n_dom_orgs"),
                F.lit(',"entries":{"total":'),
                F.coalesce("total_entries", F.lit(0)),
                F.when(
                    F.col("per_db_json").isNotNull()
                    & (F.col("per_db_json") != ""),
                    F.concat(F.lit(","), F.col("per_db_json")),
                ).otherwise(F.lit("")),
                F.lit('},"proteomes":'), F.col("n_proteomes"),
                F.lit(',"proteins":'), F.col("n_proteins"),
                F.lit(',"sets":'), F.col("n_sets"),
                F.lit(',"taxa":'), F.col("n_taxa"),
                F.lit("}"),
            ).alias("counts"),
        )
    )
