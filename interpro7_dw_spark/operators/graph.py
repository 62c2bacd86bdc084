"""Iterative graph + hierarchy operators (no Spark builtin).

``transitive_closure`` is the Spark-first form of the reference's
taxonomy lineage walk (reference interpro/oracle/taxa.py:38-53: a
driver-side child->parent dict walk building each node's lineage).
The reference can afford a driver dict because taxonomy is ~2-3M rows;
at 100 TB-scale hierarchies we instead iterate a distributed self-join
to fixpoint. Depth of real hierarchies is small (taxonomy < 40), so
the loop runs O(depth) shuffles; each iteration's frontier shrinks to
nodes that haven't reached a root yet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import owned_persist


class _Materializer:
    """Lineage-truncation seam for iterative fixpoint loops.

    Default: ``localCheckpoint`` — executor-storage blocks, zero extra
    I/O config, right for a single app run. At cluster scale executor
    loss invalidates localCheckpoint blocks and forces recompute of an
    unbounded lineage; pass ``checkpoint_dir`` to materialize each
    round to parquet instead (durable across executor loss, readable
    by a resumed job, reclaimable by deleting the directory). One
    directory per call site; rounds get numbered subdirs.
    """

    def __init__(self, checkpoint_dir: str | None, tag: str) -> None:
        self._dir = checkpoint_dir
        self._tag = tag
        self._n = 0

    def __call__(self, df: DataFrame) -> DataFrame:
        if self._dir is None:
            return df.localCheckpoint(eager=True)
        path = f"{self._dir}/{self._tag}_{self._n:04d}"
        self._n += 1
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)


def transitive_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_rounds: int = 40,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """All (node, ancestor, depth) pairs reachable via child->parent
    edges, including (node, node, 0). Equivalent to a recursive CTE.

    ``edges`` must be acyclic with at most one parent per child
    (a forest), like the reference's taxonomy.

    Pointer doubling: after round j the closure holds every pair of
    depth <= 2^j, so a depth-D hierarchy needs ceil(log2 D) joins, not
    D — the distributed substitute for the reference's driver-side
    dict walk. Paths of length L in (2^j, 2^(j+1)] split uniquely into
    (first 2^j edges) + (remainder), so no dedup shuffle is needed.

    ``checkpoint_dir``: round materialization target — ``None`` uses
    ``localCheckpoint`` (executor storage); a path switches to parquet
    checkpoints, the durable choice on a real cluster
    (see :class:`_Materializer`).
    """
    mat = _Materializer(checkpoint_dir, "closure")
    nodes = (
        edges.select(F.col(child_col).alias("node"))
        .union(edges.select(F.col(parent_col).alias("node")))
        .distinct()
    )
    closure = nodes.select(
        "node", F.col("node").alias("anc"), F.lit(0).cast("long").alias("depth")
    ).unionByName(
        edges.select(
            F.col(child_col).alias("node"),
            F.col(parent_col).alias("anc"),
            F.lit(1).cast("long").alias("depth"),
        )
    )
    closure = mat(closure)

    for j in range(max_rounds):
        pow2 = 2 ** j
        heads = closure.filter(F.col("depth") == pow2).select(
            "node", F.col("anc").alias("mid"), F.col("depth").alias("dh")
        )
        tails = closure.filter(F.col("depth") >= 1).select(
            F.col("node").alias("mid2"), "anc", F.col("depth").alias("dt")
        )
        new = heads.join(tails, heads["mid"] == tails["mid2"]).select(
            "node", "anc", (F.col("dh") + F.col("dt")).alias("depth")
        )
        new = mat(new)  # materialize once: reused by isEmpty + union
        if new.isEmpty():
            return closure
        closure = mat(closure.unionByName(new))
    raise RuntimeError(f"transitive_closure: no fixpoint after {max_rounds} doubling rounds (cycle?)")


def hierarchy_tree_json(edges: DataFrame, labels: DataFrame | None = None) -> DataFrame:
    """Nested hierarchy trees as canonical JSON, one row per root
    (reference entry-hierarchy tree format, interpro/mysql/entries.py:96-154:
    climb child->parent to the root, emit the nested children tree).

    Hierarchies here are dimension-sized (the reference broadcasts
    them as pickles), so the tree assembly runs driver-side on the
    collected edge list — the distributed seam stays at the join that
    attaches these trees to fact rows (broadcast join on root/entry).
    Children are ordered by id for determinism (the reference's child
    order is dict-insertion order — documented canonicalization).
    """
    import json

    spark = edges.sparkSession
    pairs = [(r[0], r[1]) for r in edges.collect()]
    label_map = {}
    if labels is not None:
        label_map = {r[0]: r[1] for r in labels.collect()}

    children: dict = {}
    has_parent = set()
    nodes = set()
    for child, parent in pairs:
        children.setdefault(parent, []).append(child)
        has_parent.add(child)
        nodes.update((child, parent))

    def build(node):
        out = {"id": node}
        if node in label_map:
            out["name"] = label_map[node]
        kids = sorted(children.get(node, []))
        if kids:
            out["children"] = [build(k) for k in kids]
        return out

    roots = sorted(n for n in nodes if n not in has_parent)
    rows = [(r, json.dumps(build(r), separators=(",", ":"))) for r in roots]
    return spark.createDataFrame(rows, "root string, tree string")


def hierarchy_flat_dfs(edges: DataFrame, labels: DataFrame | None = None) -> list[str]:
    """Indented depth-first flat rendering of a hierarchy (reference
    ParentChildTreeFile.txt, interpro/ftp/flatfiles.py:20-27,70-86).
    Driver-side on the collected dimension, like the reference."""
    pairs = [(r[0], r[1]) for r in edges.collect()]
    label_map = {r[0]: r[1] for r in labels.collect()} if labels is not None else {}
    children: dict = {}
    has_parent = set()
    nodes = set()
    for child, parent in pairs:
        children.setdefault(parent, []).append(child)
        has_parent.add(child)
        nodes.update((child, parent))

    lines: list[str] = []

    def walk(node, depth):
        label = f"{node}::{label_map[node]}" if node in label_map else str(node)
        lines.append("--" * depth + label)
        for kid in sorted(children.get(node, [])):
            walk(kid, depth + 1)

    for root in sorted(n for n in nodes if n not in has_parent):
        walk(root, 0)
    return lines


def lineage_rollup(
    facts: DataFrame,
    closure: DataFrame,
    node_col: str,
    agg_exprs: list,
) -> DataFrame:
    """Hierarchical rollup: aggregate facts to every ancestor of their
    node, self included (reference taxonomy xref propagation along the
    lineage, interpro/xrefs/taxa.py:207-229 and the per-entry ancestor
    counts, interpro/xrefs/entries.py:387-407).

    ``closure`` is transitive_closure() output; the join explodes each
    fact onto its ancestor set — the lineage-explode ROLLUP. One
    shuffle on node, one on ancestor; no custom dict merging."""
    from pyspark.sql import functions as F  # noqa: F401  (callers build agg_exprs)

    joined = facts.join(
        closure.select(F.col("node").alias(node_col), "anc"), node_col
    )
    return joined.groupBy(F.col("anc").alias(node_col)).agg(*agg_exprs)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components over an undirected edge list: (node,
    component) where component = the lexicographically smallest node id
    in the component — the canonical-representative rule every dedup
    cluster assignment needs (keep min id, drop the rest).

    Min-label propagation: each round every node takes the minimum of
    its own label and its neighbors' labels; converged when no label
    changes. Rounds needed = component diameter — near-dup clusters
    are dense (LSH pairs approximate cliques), so 2-3 rounds in
    practice. For adversarial long-chain graphs swap in large-star/
    small-star (Kiveris et al.) — same join shape per round.
    Per-round materialization truncates lineage like
    transitive_closure above; ``checkpoint_dir=None`` uses
    ``localCheckpoint``, a path switches to durable parquet
    checkpoints for cluster runs (see :class:`_Materializer`).
    """
    mat = _Materializer(checkpoint_dir, "cc")
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = mat(sym.distinct())
    labels = mat(
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_rounds):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias("label"),
            )
        )
        new_labels = mat(new_labels)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
        )
        labels = new_labels
        if changed.isEmpty():
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components: no fixpoint after {max_rounds} rounds")


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Fixed-iteration PageRank with ENGINE-EXACT arithmetic: the
    per-node contribution sum — the only order-sensitive float
    reduction — is the two-level pinned fold of
    ``functions/folds.py::ordered_fold_sum``: contributors are
    bucketed by ``src % n_buckets``, folded per bucket in src order,
    and the bucket sums folded in bucket order. Deterministic AND
    hub-safe: a power-law hub (in-degree 10^7+) never materializes
    its full in-degree as one array in one task — the largest array is
    ~in-degree / n_buckets at level 1 and n_buckets at level 2, and
    both levels are AQE-splittable groupBy aggregates. Any IEEE-754
    engine replays every iteration bit-for-bit by replaying the same
    bucket structure (the oracle does, via ordered_fold_oracle_cte).
    Node ids must be non-negative integers (they key the fold order
    and the bucket residue). Simplified model: dangling-node mass is
    not redistributed (ranks sum to < 1 when sinks exist) — the usual
    within-engine formulation; normalize at the end if mass
    conservation matters.

    Scale: per iteration, one join of edges to ranks on src (broadcast
    when ranks fit — node table, not edge table), then the two
    bounded-fan-in aggregates; ``iters`` is fixed, so the plan is a
    finite unrolled chain. Lineage is truncated per iteration via the
    same localCheckpoint / ``checkpoint_dir`` parquet seam as
    :func:`transitive_closure`.

    Returns (node, pagerank) for every node, rank rounded to 10
    places.
    """
    from ..functions.folds import ordered_fold_sum

    mat = _Materializer(checkpoint_dir, "pagerank")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # one scalar; the node dim is collect-safe
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select("dst", "src", (F.col("rank") / F.col("deg")).alias("c"))
        )
        summed = ordered_fold_sum(
            contribs, ["dst"], "src", "c", out_col="s", n_buckets=n_buckets
        )
        ranks = mat(
            nodes.join(
                summed.withColumnRenamed("dst", "node"), "node", "left"
            ).select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("s", F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", 10).alias("pagerank"))


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts via degree-ordered orientation — the
    classic distributed triangle algorithm (Suri & Vassilvitskii 2011,
    "Counting Triangles and the Curse of the Last Reducer").

    The input is treated as an undirected simple graph: edges are
    canonicalized (least, greatest), self-loops dropped, duplicates
    collapsed. Every edge is then ORIENTED from its lower to its
    higher endpoint under the total order (degree, node id). In the
    oriented graph each triangle appears as exactly one wedge
    ``u -> v, u -> w`` (with v before w in orientation order) closed
    by the oriented edge ``v -> w`` — so the count is one self-join
    on the wedge apex plus one semi-join against the edge set, and
    no triangle is found twice.

    Why orientation matters at 100 TB: a naive wedge join keyed on an
    unoriented adjacency puts a celebrity node's full degree d on one
    join key — d^2 candidate wedges in one place (the "last reducer").
    Orientation bounds every out-degree by O(sqrt(2m)) regardless of
    skew, so the wedge fan-out is O(m^1.5) TOTAL and no single key
    explodes. All steps are hash joins/aggregates — AQE-splittable,
    no windows, no collects.

    Returns (node, n_triangles) for nodes in >= 1 triangle.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n")).unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    keyed = (
        e.join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
    )
    fwd = F.struct(F.col("da").alias("d"), F.col("a").alias("n")) < F.struct(
        F.col("db").alias("d"), F.col("b").alias("n")
    )
    # persisted: three differently-keyed consumers (the wedge
    # self-join on u and the closing join on (v1, v2)) — without the
    # persist the canonicalize-distinct + two degree joins re-run per
    # consumer (the r15 before-plan had 155 Exchanges, the scan
    # subtree duplicated ~20x, zero reuse). O(m) cache, the standard
    # trade for one-pass orientation. Released by the consumer's
    # engine_cache_scope (caching.py).
    oriented = owned_persist(keyed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.struct(F.col("db").alias("d"), F.col("b").alias("n")))
        .otherwise(F.struct(F.col("da").alias("d"), F.col("a").alias("n")))
        .alias("kv"),
    ))
    o1 = oriented.select(F.col("u"), F.col("v").alias("v1"), F.col("kv").alias("k1"))
    o2 = oriented.select(F.col("u"), F.col("v").alias("v2"), F.col("kv").alias("k2"))
    wedges = o1.join(o2, "u").filter(F.col("k1") < F.col("k2"))
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tri = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    corners = tri.select(
        F.explode(F.array("u", "v1", "v2")).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 60,
) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983; the
    Matula-Beck linear peel, run as synchronized rounds): repeatedly
    delete every vertex whose CURRENT degree is < k until the
    remaining subgraph — the k-core — is stable. The standard
    density/anchor primitive next to :func:`pagerank` /
    :func:`triangle_counts` (spam cores, community seeds, graph
    summarization).

    Input: undirected edges as canonical (src < dst) pairs, one row
    per edge. Each peel round is one degree hash-aggregate plus two
    semi-joins against the surviving vertex set — everything
    partitions on the vertex key, AQE-splittable, nothing driver-side
    but the per-round 1-scalar convergence probe; the degree
    aggregate is persisted for the round so the probe and the
    keep-filter share one computation (one scan of the surviving
    edge set per round); lineage is truncated per round
    (``localCheckpoint`` — swap durable on a cluster). Round count is
    bounded by the peel depth (the degeneracy ordering's layer
    count), typically tens on real graphs; at the ``max_iters`` cap
    the CURRENT surviving set is returned — the DuckDB oracle replays
    the identical cap, so both engines agree even on a
    deeper-than-cap pathological chain.

    Returns (node, core_degree) for every surviving vertex —
    ``core_degree`` the degree WITHIN the surviving subgraph. When the
    peel CONVERGES within ``max_iters`` the survivors are exactly the
    k-core and ``core_degree >= k`` holds by definition; at the cap
    the partially-peeled set is returned (a SUPERSET of the k-core,
    possibly with degrees < k) — the oracle replays the identical cap.
    """
    both = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).unionByName(
        edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    )
    und = both.localCheckpoint()
    for _ in range(max_iters):
        deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg")).persist()
        try:
            n_low = deg.filter(F.col("deg") < k).count()
            if n_low == 0:
                break
            keep = deg.filter(F.col("deg") >= k).select("a")
            und = (
                und.join(keep, "a", "left_semi")
                .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
                .localCheckpoint()  # also materializes keep before unpersist
            )
        finally:
            deg.unpersist()
    # falling out at the cap returns the CURRENT survivors (matching
    # the oracle's capped recursive CTE) rather than raising
    return und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("core_degree")
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contractions (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond") — the adversarial-graph path promised in
    :func:`connected_components`'s docstring. Min-label propagation
    needs DIAMETER rounds (a 10^6-node chain = 10^6 joins); the
    star alternation converges in O(log^2 n) rounds on ANY topology
    because each round contracts toward the component minimum
    non-locally. Same output contract: (node, component) with
    component = the lexicographically smallest node id.

    Per round: one symmetrize + per-node min aggregate + join-back
    (large-star hangs every bigger neighbor under the local min;
    small-star re-parents the smaller ones) — all hash
    aggregates/joins on node ids, AQE-splittable, nothing
    diameter-bound. Convergence = small-star output reaches a
    fixpoint (checked with an exact exceptAll emptiness probe, not a
    checksum). Per-round materialization truncates lineage exactly
    like connected_components.
    """
    mat = _Materializer(checkpoint_dir, "ccstar")

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        o = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = o.groupBy("u").agg(F.min("v").alias("m"))
        hang = o.join(m, "u").select(F.col("v").alias("n"), "m")
        selfrow = m.select(F.col("u").alias("n"), "m")
        return (
            hang.unionByName(selfrow)
            .filter(F.col("n") != F.col("m"))
            .select(F.col("n").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    e = mat(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nodes = mat(
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    for _ in range(max_rounds):
        nxt = mat(small_star(large_star(e)))
        if nxt.exceptAll(e).isEmpty() and e.exceptAll(nxt).isEmpty():
            e = nxt
            break
        e = nxt
    else:
        raise RuntimeError(
            f"connected_components_star: no fixpoint after {max_rounds} rounds"
        )
    # final e is a star: (node, component-min) for every non-root node
    return nodes.join(
        e.select(F.col("u").alias("node"), F.col("v").alias("component")),
        "node",
        "left",
    ).select("node", F.coalesce("component", "node").alias("component"))
