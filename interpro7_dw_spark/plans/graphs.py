"""Graph / recursive query catalog (SURVEY.md §2.9).

``closure_depths`` re-expresses the reference's taxonomy lineage
closure (interpro/oracle/taxa.py:38-53) as an iterative distributed
self-join (operators/graph.py) — the oracle is a recursive CTE.

``part_pair_cooccurrence`` is the reference's similarity-graph shape
(clan alignment graph interpro/oracle/clans.py:89-162; sim-entries
pair counting interpro/xrefs/entries.py:28-136): canonicalized pair
explosion + groupBy, with the a<b trick so each edge appears once.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..caching import owned_persist

from ..domain.clans import clan_alignment_graph
from ..domain.xrefs import sim_entries
from ..operators import graph as G
from ..operators.graph import lineage_rollup, transitive_closure
from .spec import QuerySpec, register, t


def _parent_edges(spark: SparkSession, sf: str):
    # synthetic forest over customers: parent(k) = floor(k/2), root=0
    return (
        t(spark, sf, "customer")
        .filter(F.col("c_custkey") > 0)
        .select(
            F.col("c_custkey").alias("child"),
            F.floor(F.col("c_custkey") / 2).cast("long").alias("parent"),
        )
    )


def _closure_depths(spark: SparkSession, sf: str):
    return (
        transitive_closure(_parent_edges(spark, sf), "child", "parent")
        .select(F.col("node").cast("long"), F.col("anc").cast("long"), F.col("depth").cast("int"))
    )


register(QuerySpec(
    name="closure_depths",
    tags=("G1",),
    description="Transitive closure of a hierarchy to fixpoint — every "
    "(node, ancestor, depth) pair incl. self at depth 0.",
    build=_closure_depths,
    oracle="""
        WITH RECURSIVE nodes AS (
          -- explicit DISTINCT: inside a RECURSIVE with-clause DuckDB
          -- gives UNION recursive semantics, not a plain dedup
          SELECT DISTINCT node FROM (
            SELECT c_custkey AS node FROM customer WHERE c_custkey > 0
            UNION ALL
            SELECT CAST(floor(c_custkey / 2) AS BIGINT) FROM customer WHERE c_custkey > 0
          )
        ), anc AS (
          SELECT node, node AS anc, 0 AS depth FROM nodes
          UNION ALL
          SELECT a.node, CAST(floor(a.anc / 2) AS BIGINT), a.depth + 1
          FROM anc a
          WHERE a.anc > 0
        )
        SELECT CAST(node AS BIGINT) AS node, CAST(anc AS BIGINT) AS anc,
               CAST(depth AS INT) AS depth
        FROM anc
    """,
))


def _part_pairs(spark: SparkSession, sf: str):
    # persist: the distinct() feeds both sides of the self-join
    li = owned_persist(
        t(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    return (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


def _lca_per_nation(spark: SparkSession, sf: str):
    # G4 semantics (reference LCA per (entry, domain) via lineage
    # common prefix, interpro/ftp/xmlfiles.py:149-197), set-based:
    # the LCA of a node group is its deepest common ancestor — join
    # the closure, keep ancestors covering every member, take argmax
    # height. Height of an ancestor = its own distance to root (depth
    # of node minus depth to that ancestor is per-member, so use the
    # ancestor's own root-distance: anc with max root distance).
    closure = transitive_closure(_parent_edges(spark, sf), "child", "parent")
    anc_height = (
        closure.groupBy(F.col("node").alias("anc"))
        .agg(F.max("depth").alias("height"))
    )
    members = (
        t(spark, sf, "customer")
        .filter(F.col("c_custkey") > 0)
        .join(F.broadcast(t(spark, sf, "nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.col("c_custkey").alias("node"))
    )
    group_sizes = members.groupBy("n_name").agg(F.countDistinct("node").alias("sz"))
    common = (
        members.join(closure, "node")
        .groupBy("n_name", "anc")
        .agg(F.countDistinct("node").alias("covered"))
        .join(group_sizes, "n_name")
        .filter(F.col("covered") == F.col("sz"))
    )
    # deepest common ancestor: max (root distance, anc) — anc id as
    # deterministic tiebreak (a forest can't tie here, but be safe)
    return (
        common.join(anc_height, common["anc"] == anc_height["anc"])
        .groupBy("n_name")
        .agg(F.max_by(common["anc"], F.struct(F.col("height"), common["anc"])).alias("lca"))
    )


register(QuerySpec(
    # z_-parked in the r13 rotation that promoted skew_join_hot_key:
    # G1/G4 closure machinery stays in-window via closure_depths +
    # tree_hierarchy_json; the differ still value-checks this spec
    name="z_lca_per_nation",
    tags=("G4", "G1"),
    description="Lowest common ancestor per node group via closure join "
    "(reference per-domain LCA common-prefix fold, interpro/ftp/xmlfiles.py:149-197).",
    build=_lca_per_nation,
    oracle="""
        WITH RECURSIVE nodes AS (
          SELECT DISTINCT node FROM (
            SELECT c_custkey AS node FROM customer WHERE c_custkey > 0
            UNION ALL
            SELECT CAST(floor(c_custkey / 2) AS BIGINT) FROM customer WHERE c_custkey > 0
          )
        ), anc AS (
          SELECT node, node AS anc, 0 AS depth FROM nodes
          UNION ALL
          SELECT a.node, CAST(floor(a.anc / 2) AS BIGINT), a.depth + 1
          FROM anc a WHERE a.anc > 0
        ), heights AS (
          -- a node's root distance = its deepest ancestor depth
          SELECT node AS anc, max(depth) AS height FROM anc GROUP BY node
        ), members AS (
          SELECT n_name, c_custkey AS node
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          WHERE c_custkey > 0
        ), sizes AS (
          SELECT n_name, count(DISTINCT node) AS sz FROM members GROUP BY 1
        ), common AS (
          SELECT m.n_name, a.anc, count(DISTINCT m.node) AS covered
          FROM members m JOIN anc a ON m.node = a.node
          GROUP BY 1, 2
        ), full_cover AS (
          SELECT c.n_name, c.anc, h.height
          FROM common c
          JOIN sizes s ON c.n_name = s.n_name AND c.covered = s.sz
          JOIN heights h ON c.anc = h.anc
        )
        SELECT n_name, anc AS lca FROM full_cover
        QUALIFY row_number() OVER (PARTITION BY n_name
                                   ORDER BY height DESC, anc DESC) = 1
    """,
))


register(QuerySpec(
    name="z_part_pair_cooccurrence",
    tags=("G6", "G7", "J8"),
    description="Canonicalized co-occurrence edge list with min-support filter.",
    build=_part_pairs,
    oracle="""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_orders
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 2
    """,
))


def _triangles(spark: SparkSession, sf: str):
    from ..operators.graph import triangle_counts

    edges = _part_pairs(spark, sf)
    return triangle_counts(edges, "pa", "pb")


register(QuerySpec(
    name="triangle_counts",
    tags=("G8", "J6", "A2"),
    description="Per-node triangle counts on the co-occurrence graph "
    "(operators/graph.py::triangle_counts): degree-ordered edge "
    "orientation bounds every out-degree by O(sqrt(2m)) so the wedge "
    "self-join has no celebrity-key blowup (Suri & Vassilvitskii "
    "2011); wedges closed by one semi-join against the oriented edge "
    "set. Oracle enumerates a<b<c triangles directly on canonical "
    "edges — orientation is invisible in the result.",
    build=_triangles,
    oracle="""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (
          SELECT a.l_partkey AS a, b.l_partkey AS b
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
          HAVING count(*) >= 2
        ),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1
          JOIN e e2 ON e1.b = e2.a
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        corners AS (
          SELECT x AS node FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri
        )
        SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        FROM corners GROUP BY 1
    """,
))


def _rollup_orders_to_ancestors(spark: SparkSession, sf: str):
    closure = transitive_closure(_parent_edges(spark, sf), "child", "parent")
    facts = (
        t(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("node"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("node") > 0)
    )
    return lineage_rollup(
        facts, closure, "node", [F.sum("n").cast("long").alias("n_orders_subtree")]
    ).withColumnRenamed("node", "anc")


register(QuerySpec(
    # z_-parked (still differ-checked): A9 covered by rollup_region_nation
    # + domain_match_summary, G1 by closure_depths - slot freed for
    # tree_taxon_nodes (plans/treeq.py)
    name="z_lineage_rollup_orders",
    tags=("A9", "G1"),
    description="Hierarchical rollup via lineage explode: order counts "
    "accumulated to every ancestor (reference taxonomy xref propagation, "
    "interpro/xrefs/taxa.py:207-229).",
    build=_rollup_orders_to_ancestors,
    oracle="""
        WITH RECURSIVE anc AS (
          SELECT c_custkey AS node, c_custkey AS anc, 0 AS depth
          FROM customer WHERE c_custkey > 0
          UNION ALL
          SELECT a.node, CAST(floor(a.anc / 2) AS BIGINT), a.depth + 1
          FROM anc a WHERE a.anc > 0
        ), facts AS (
          SELECT o_custkey AS node, count(*) AS n
          FROM orders WHERE o_custkey > 0 GROUP BY 1
        )
        SELECT a.anc, CAST(sum(f.n) AS BIGINT) AS n_orders_subtree
        FROM facts f JOIN anc a ON f.node = a.node
        GROUP BY a.anc
    """,
))


def _flat_dfs_df(spark: SparkSession, sf: str):
    """ParentChildTreeFile rows (G3): the driver-side DFS (the
    hierarchy is a dimension, like the reference's collected entries
    dict, ftp/flatfiles.py:70-86) re-materialized as an indexed
    DataFrame so the rendering is value-checked against a recursive
    CTE."""
    from ..operators.graph import hierarchy_flat_dfs

    edges = t(spark, sf, "nation").select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("child"),
        F.concat(F.lit("R"), F.col("n_regionkey")).alias("parent"),
    ).unionByName(
        t(spark, sf, "region").select(
            F.concat(F.lit("R"), F.col("r_regionkey")).alias("child"),
            F.lit("ROOT").alias("parent"),
        )
    )
    labels = t(spark, sf, "nation").select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("node"),
        F.col("n_name").alias("name"),
    ).unionByName(
        t(spark, sf, "region").select(
            F.concat(F.lit("R"), F.col("r_regionkey")).alias("node"),
            F.col("r_name").alias("name"),
        )
    )
    lines = hierarchy_flat_dfs(edges, labels)
    return spark.createDataFrame(
        list(enumerate(lines)), "pos int, line string"
    )


register(QuerySpec(
    name="z_hierarchy_flat_dfs",
    tags=("G3", "O1"),
    description="ParentChildTreeFile indented DFS rendering (reference "
    "interpro/ftp/flatfiles.py:20-27,70-86): depth-first walk over the "
    "ROOT->region->nation hierarchy with '--'-per-depth indentation and "
    "node::name labels, position-indexed; the oracle replays the DFS "
    "as a path-ordered recursive CTE.",
    build=_flat_dfs_df,
    oracle="""
WITH RECURSIVE edges AS (
  SELECT 'N' || n_nationkey AS child, 'R' || n_regionkey AS parent FROM nation
  UNION ALL
  SELECT 'R' || r_regionkey, 'ROOT' FROM region
),
labels AS (
  SELECT 'N' || n_nationkey AS node, n_name AS name FROM nation
  UNION ALL
  SELECT 'R' || r_regionkey, r_name FROM region
),
walk AS (
  SELECT 'ROOT' AS node, 'ROOT' AS path, 0 AS depth
  UNION ALL
  SELECT e.child, w.path || '/' || e.child, w.depth + 1
  FROM walk w JOIN edges e ON e.parent = w.node
)
SELECT CAST(row_number() OVER (ORDER BY w.path) - 1 AS INT) AS pos,
       repeat('--', w.depth)
         || CASE WHEN l.name IS NOT NULL
                 THEN w.node || '::' || l.name ELSE w.node END AS line
FROM walk w LEFT JOIN labels l ON w.node = l.node
    """,
))


def _clan_members(spark: SparkSession, sf: str):
    s = F.col("s_suppkey")
    return t(spark, sf, "supplier").select(
        F.concat(F.lit("SIG"), s.cast("string")).alias("signature_acc"),
        F.concat(F.lit("CL"), (s % 40).cast("string")).alias("clan_acc"),
    )


def _clan_alignments(spark: SparkSession, sf: str):
    k = F.col("o_orderkey")
    return t(spark, sf, "orders").select(
        F.concat(F.lit("SIG"), (F.lit(1) + k % 200).cast("string")).alias(
            "query_acc"
        ),
        F.concat(
            F.lit("SIG"), (F.lit(1) + F.col("o_custkey") % 200).cast("string")
        ).alias("target_acc"),
        ((k % 1000).cast("double") / F.lit(5000.0)).alias("evalue"),
    )


register(QuerySpec(
    name="z_clan_graph",
    tags=("G6", "J2", "A1"),
    description="Clan alignment graph (reference interpro/oracle/"
    "clans.py:89-162, domain/clans.py): e-value threshold, query must "
    "belong to a clan (inner broadcast join), target may not (left "
    "join + same-clan filter), unordered pair canonicalized with "
    "least/greatest, best (min) e-value per edge. Alignments reference "
    "twice as many signatures as exist, so the membership drops are "
    "exercised; min over doubles is order-independent, so the score is "
    "engine-exact.",
    build=lambda spark, sf: clan_alignment_graph(
        _clan_members(spark, sf), _clan_alignments(spark, sf), threshold=0.05
    ),
    oracle="""
        WITH members AS (
          SELECT 'SIG' || CAST(s_suppkey AS VARCHAR) AS sig,
                 'CL' || CAST(s_suppkey % 40 AS VARCHAR) AS clan
          FROM supplier
        ),
        al AS (
          SELECT 'SIG' || CAST(1 + o_orderkey % 200 AS VARCHAR) AS query_acc,
                 'SIG' || CAST(1 + o_custkey % 200 AS VARCHAR) AS target_acc,
                 CAST(o_orderkey % 1000 AS DOUBLE) / 5000.0 AS evalue
          FROM orders
        )
        SELECT q.clan AS clan_acc,
               least(query_acc, target_acc) AS source,
               greatest(query_acc, target_acc) AS target,
               min(evalue) AS score
        FROM al
        JOIN members q ON al.query_acc = q.sig
        LEFT JOIN members tm ON al.target_acc = tm.sig
        WHERE evalue <= 0.05 AND q.clan = tm.clan
        GROUP BY 1, 2, 3
    """,
))


def _simentry_fixture(spark: SparkSession, sf: str):
    """(protein, entry) location sets: protein keyed off custkey,
    entry off orderkey, so each protein carries many entries; k =
    min(orderkey) seeds 1-2 deterministic fragments; entry type cycles
    through superfamily/domain/family/site (site being outside the
    similarity type rule)."""
    seed = (
        t(spark, sf, "orders")
        .select(
            F.concat(
                F.lit("P"), (F.col("o_custkey") % 300).cast("string")
            ).alias("protein_acc"),
            F.concat(
                F.lit("E"), (F.col("o_orderkey") % 40).cast("string")
            ).alias("entry_acc"),
            (F.col("o_orderkey") % 40).cast("int").alias("eid"),
            F.col("o_orderkey").alias("k"),
        )
        .groupBy("protein_acc", "entry_acc", "eid")
        .agg(F.min("k").alias("k"))
    )
    return seed.selectExpr(
        "protein_acc",
        "entry_acc",
        "CASE WHEN eid % 4 = 0 THEN 'homologous_superfamily' "
        "WHEN eid % 4 = 1 THEN 'domain' "
        "WHEN eid % 4 = 2 THEN 'family' ELSE 'site' END AS entry_type",
        """CASE WHEN k % 3 = 0 THEN array(
             named_struct('start', CAST(k % 60 + 1 AS INT),
                          'end', CAST(k % 60 + 5 + k % 40 AS INT)),
             named_struct('start', CAST(k % 60 + 31 AS INT),
                          'end', CAST(k % 60 + 35 + k % 25 AS INT)))
           ELSE array(
             named_struct('start', CAST(k % 60 + 1 AS INT),
                          'end', CAST(k % 60 + 5 + k % 40 AS INT)))
           END AS locations""",
    )


register(QuerySpec(
    name="z_sim_entries",
    tags=("G7", "J8", "A1", "F9"),
    description="Similar-entries graph (reference interpro/xrefs/"
    "entries.py:15,28-136, domain/xrefs.py::sim_entries): per-protein "
    "entry-pair self-join, the exists-any-location-overlapping-half "
    "flags as nested array HOFs, per-pair flag sums, Jaccard-style "
    "coefficient + containment indices over the 0.75 threshold, and "
    "the homologous-superfamily type rule. The oracle replays the "
    "nested existence checks with DuckDB list_filter lambdas and the "
    "identical double arithmetic.",
    build=lambda spark, sf: sim_entries(_simentry_fixture(spark, sf)),
    oracle="""
        WITH seed AS (
          SELECT 'P' || CAST(o_custkey % 300 AS VARCHAR) AS protein_acc,
                 'E' || CAST(o_orderkey % 40 AS VARCHAR) AS entry_acc,
                 CAST(o_orderkey % 40 AS INT) AS eid,
                 min(o_orderkey) AS k
          FROM orders GROUP BY 1, 2, 3
        ),
        el AS (
          SELECT protein_acc, entry_acc,
                 CASE WHEN eid % 4 = 0 THEN 'homologous_superfamily'
                      WHEN eid % 4 = 1 THEN 'domain'
                      WHEN eid % 4 = 2 THEN 'family'
                      ELSE 'site' END AS entry_type,
                 CASE WHEN k % 3 = 0 THEN
                   [{'start': CAST(k % 60 + 1 AS INT),
                     'end': CAST(k % 60 + 5 + k % 40 AS INT)},
                    {'start': CAST(k % 60 + 31 AS INT),
                     'end': CAST(k % 60 + 35 + k % 25 AS INT)}]
                 ELSE
                   [{'start': CAST(k % 60 + 1 AS INT),
                     'end': CAST(k % 60 + 5 + k % 40 AS INT)}]
                 END AS locations
          FROM seed
        ),
        np AS (SELECT entry_acc, count(*) AS n FROM el GROUP BY 1),
        pairs AS (
          SELECT hi.entry_acc AS hi, lo.entry_acc AS lo,
                 CAST(len(list_filter(hi.locations, l1 ->
                   len(list_filter(lo.locations, l2 ->
                     least(l1['end'], l2['end'])
                       - greatest(l1['start'], l2['start']) + 1
                       >= (l1['end'] - l1['start'] + 1) * 0.5)) > 0)) > 0
                   AS INT) AS f_hi,
                 CAST(len(list_filter(lo.locations, l1 ->
                   len(list_filter(hi.locations, l2 ->
                     least(l1['end'], l2['end'])
                       - greatest(l1['start'], l2['start']) + 1
                       >= (l1['end'] - l1['start'] + 1) * 0.5)) > 0)) > 0
                   AS INT) AS f_lo
          FROM el hi
          JOIN el lo ON hi.protein_acc = lo.protein_acc
                    AND lo.entry_acc < hi.entry_acc
        ),
        agg AS (
          SELECT hi, lo, CAST(sum(f_hi) AS BIGINT) AS cnt_hi,
                 CAST(sum(f_lo) AS BIGINT) AS cnt_lo
          FROM pairs GROUP BY 1, 2
        ),
        typ AS (SELECT DISTINCT entry_acc, entry_type FROM el)
        SELECT a.hi AS entry_acc, a.lo AS other_acc
        FROM agg a
        JOIN np nh ON a.hi = nh.entry_acc
        JOIN np nl ON a.lo = nl.entry_acc
        JOIN typ th ON a.hi = th.entry_acc
        JOIN typ tl ON a.lo = tl.entry_acc
        WHERE (
          ((cnt_hi / (nh.n + nl.n - cnt_hi))
            + (cnt_lo / (nh.n + nl.n - cnt_lo))) * 0.5 >= 0.75
          OR cnt_hi / nh.n >= 0.75
          OR cnt_lo / nl.n >= 0.75
        )
        AND ((th.entry_type = 'homologous_superfamily'
              AND tl.entry_type IN ('homologous_superfamily',
                                    'domain', 'family', 'repeat'))
          OR (tl.entry_type = 'homologous_superfamily'
              AND th.entry_type IN ('homologous_superfamily',
                                    'domain', 'family', 'repeat')))
    """,
))


register(QuerySpec(
    name="pagerank",
    tags=("G1", "F9", "W4"),
    description="Fixed-iteration PageRank (operators/graph.py::"
    "pagerank) on a 50-node graph derived from lineitem part->supplier "
    "residues: 3 damped iterations whose per-node contribution sums "
    "are the TWO-LEVEL pinned fold of functions/folds.py (bucket by "
    "src % 64, fold per bucket in src order, fold bucket sums in "
    "bucket order — hub-safe: no task ever materializes a hub's full "
    "in-degree), so the oracle unrolls the recursion in SQL replaying "
    "the identical bucket structure and both engines produce "
    "bit-identical doubles at every step (all constants forced to "
    "DOUBLE — DuckDB would otherwise do 1 - 0.85 in exact DECIMAL and "
    "diverge from IEEE).",
    build=lambda spark, sf: G.pagerank(
        t(spark, sf, "lineitem").select(
            (F.col("l_partkey") % 50).alias("src"),
            (F.col("l_suppkey") % 50).alias("dst"),
        ),
        iters=3,
    ),
    oracle="""
WITH e AS (
  SELECT DISTINCT l_partkey % 50 AS src, l_suppkey % 50 AS dst FROM lineitem
),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
r0 AS (SELECT node, 1.0::DOUBLE / (SELECT n FROM nn) AS r FROM nodes),
s1 AS (
  SELECT dst AS node,
         list_reduce(list_prepend(0.0::DOUBLE, list(__fs ORDER BY __fb)),
                     (a, b) -> a + b) AS s
  FROM (
    SELECT e.dst, e.src % 64 AS __fb,
           list_reduce(list_prepend(0.0::DOUBLE,
                                    list(r0.r / deg.d ORDER BY e.src)),
                       (a, b) -> a + b) AS __fs
    FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
    GROUP BY e.dst, e.src % 64
  )
  GROUP BY dst
),
r1 AS (
  SELECT nodes.node,
         (1.0::DOUBLE - 0.85::DOUBLE) / (SELECT n FROM nn)
           + 0.85::DOUBLE * coalesce(s1.s, 0.0::DOUBLE) AS r
  FROM nodes LEFT JOIN s1 USING (node)
),
s2 AS (
  SELECT dst AS node,
         list_reduce(list_prepend(0.0::DOUBLE, list(__fs ORDER BY __fb)),
                     (a, b) -> a + b) AS s
  FROM (
    SELECT e.dst, e.src % 64 AS __fb,
           list_reduce(list_prepend(0.0::DOUBLE,
                                    list(r1.r / deg.d ORDER BY e.src)),
                       (a, b) -> a + b) AS __fs
    FROM e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
    GROUP BY e.dst, e.src % 64
  )
  GROUP BY dst
),
r2 AS (
  SELECT nodes.node,
         (1.0::DOUBLE - 0.85::DOUBLE) / (SELECT n FROM nn)
           + 0.85::DOUBLE * coalesce(s2.s, 0.0::DOUBLE) AS r
  FROM nodes LEFT JOIN s2 USING (node)
),
s3 AS (
  SELECT dst AS node,
         list_reduce(list_prepend(0.0::DOUBLE, list(__fs ORDER BY __fb)),
                     (a, b) -> a + b) AS s
  FROM (
    SELECT e.dst, e.src % 64 AS __fb,
           list_reduce(list_prepend(0.0::DOUBLE,
                                    list(r2.r / deg.d ORDER BY e.src)),
                       (a, b) -> a + b) AS __fs
    FROM e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src
    GROUP BY e.dst, e.src % 64
  )
  GROUP BY dst
),
r3 AS (
  SELECT nodes.node,
         (1.0::DOUBLE - 0.85::DOUBLE) / (SELECT n FROM nn)
           + 0.85::DOUBLE * coalesce(s3.s, 0.0::DOUBLE) AS r
  FROM nodes LEFT JOIN s3 USING (node)
)
SELECT node, round(r, 10) AS pagerank FROM r3
    """,
))


def _kcore(spark: SparkSession, sf: str):
    from ..operators.graph import kcore

    return kcore(_part_pairs(spark, sf), k=3, src_col="pa", dst_col="pb")


register(QuerySpec(
    name="z_kcore",
    # promoted into the driver window in the r10 rotation (was z_kcore)
    tags=("G9", "A2", "J4"),
    description="3-core decomposition of the co-occurrence graph "
    "(operators/graph.py::kcore, Seidman 1983 iterative peel): each "
    "round drops every vertex of current degree < k via one degree "
    "aggregate + two semi-joins, to fixpoint. Oracle replays the "
    "synchronized peel as a recursive CTE carrying the surviving "
    "vertex set per round (same 60-round cap both engines); the "
    "result is the surviving set at the cap with its in-core "
    "degrees.",
    build=_kcore,
    oracle="""
        WITH RECURSIVE li AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        ce AS (
          SELECT a.l_partkey AS a, b.l_partkey AS b
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
          HAVING count(*) >= 2
        ),
        und AS (SELECT a, b FROM ce UNION ALL SELECT b AS a, a AS b FROM ce),
        verts(v, it) AS (
          SELECT DISTINCT a AS v, 0 FROM und
          UNION ALL
          SELECT v, it + 1 FROM (
            SELECT u.a AS v, max(cur.it) AS it, count(*) AS deg
            FROM und u
            JOIN verts cur  ON cur.v  = u.a
            JOIN verts cur2 ON cur2.v = u.b AND cur2.it = cur.it
            GROUP BY u.a
          ) WHERE deg >= 3 AND it < 60
        ),
        core AS (SELECT v FROM verts WHERE it = 60)
        SELECT u.a AS node, CAST(count(*) AS BIGINT) AS core_degree
        FROM und u
        JOIN core c1 ON c1.v = u.a
        JOIN core c2 ON c2.v = u.b
        GROUP BY 1
    """,
))
