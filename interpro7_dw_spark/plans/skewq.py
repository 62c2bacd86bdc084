"""Skew catalog — the engine's celebrity-key defenses exercised on
ACTUALLY skewed inputs, with full DuckDB value oracles.

Every 100x-scale claim elsewhere (two-phase bucket-split rank,
degree-ordered triangle orientation, hot-shingle DF caps, bucket-split
top-k) was previously demonstrated only on the driver's uniform
TPC-H-ish tables. The specs here derive DETERMINISTIC hot-key
distributions from those same tables IN SQL (so both engines replay
them bit-for-bit — no side fixture to drift): a 90%-hot segment over
orders, a 95%-hot stratum, a hub vertex on 50% of edge rows, and a
universal boilerplate shingle over documents. `tools/skew_audit.py`
runs the same derivations at sf0.1 and records max/median task-time
ratios for the two-phase plans vs their naive single-window twins in
PERF.md.

Reference anchor: interpro7dw/utils/store.py:296-317 — the reference
deals proteins into fixed buckets BEFORE any per-key processing for
exactly this reason.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import sampling as SM
from ..operators import skew as SK
from ..operators.graph import triangle_counts
from .spec import QuerySpec, register, t

# ---------------------------------------------------------------- topk

def _hot_segment_orders(spark: SparkSession, sf: str):
    """orders with a 90%-hot derived segment: 9 of 10 orderkey
    residues map to 'hot', the rest to 'seg9'."""
    return t(spark, sf, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderkey") % 10 < 9, F.lit("hot"))
        .otherwise(
            F.concat(F.lit("seg"), (F.col("o_orderkey") % 10).cast("string"))
        )
        .alias("seg"),
    )


def _skew_topk(spark: SparkSession, sf: str):
    return SK.topk_per_group(
        _hot_segment_orders(spark, sf),
        ["seg"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=5,
        bucket_cols=["o_orderkey"],
    ).select("seg", "rk", "o_orderkey", F.col("o_totalprice").alias("price"))


register(QuerySpec(
    name="z_skew_topk_hot_segment",
    tags=("O5", "W1", "SKEW"),
    description="Exact top-5 per segment where ONE segment holds 90% "
    "of the rows (operators/skew.py::topk_per_group): phase 1 ranks "
    "within (hash-bucket, segment) — the hot segment is spread over "
    "all buckets, no task ever holds it whole — phase 2 ranks the "
    "<= buckets*k survivors. Identical result to the naive "
    "row_number window the oracle runs; the plan never windows the "
    "bare hot key over the full data (plan-guarded in tests).",
    build=_skew_topk,
    oracle="""
        WITH s AS (
          SELECT o_orderkey, o_totalprice,
                 CASE WHEN o_orderkey % 10 < 9 THEN 'hot'
                      ELSE 'seg' || CAST(o_orderkey % 10 AS VARCHAR)
                 END AS seg
          FROM orders
        )
        SELECT seg, rk, o_orderkey, price FROM (
          SELECT seg, o_orderkey, o_totalprice AS price,
                 CAST(row_number() OVER (
                   PARTITION BY seg
                   ORDER BY o_totalprice DESC, o_orderkey
                 ) AS INT) AS rk
          FROM s
        ) WHERE rk <= 5
    """,
))


# ------------------------------------------------------ stratified rank

def _skew_stratified(spark: SparkSession, sf: str):
    """95%-hot stratum: 19 of 20 orderkey residues are 'hot'."""
    docs = t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.when(F.col("o_orderkey") % 20 < 19, F.lit("hot"))
        .otherwise(
            F.concat(F.lit("cold"), (F.col("o_orderkey") % 7).cast("string"))
        )
        .alias("stratum"),
    )
    return SM.stratified_sample(
        docs, caps={"hot": 40}, stratum_col="stratum", id_col="okey",
        default_cap=15,
    )


register(QuerySpec(
    name="z_skew_stratified_rank",
    tags=("TX5", "W1", "SKEW"),
    description="Stratified downsampling where one stratum holds 95% "
    "of the rows (operators/sampling.py::stratified_sample): the "
    "md5-rank comes from the two-phase bucket-split plan — the hot "
    "stratum is split across every hash bucket, local ranks are "
    "renumbered with broadcast per-bucket offsets, and no window over "
    "the bare stratum key ever sees the full data. The oracle ranks "
    "the hot stratum in one partition (DuckDB can; one Spark task "
    "could not at 100 TB).",
    build=_skew_stratified,
    oracle="""
        WITH s AS (
          SELECT o_orderkey AS okey,
                 CASE WHEN o_orderkey % 20 < 19 THEN 'hot'
                      ELSE 'cold' || CAST(o_orderkey % 7 AS VARCHAR)
                 END AS stratum
          FROM orders
        ),
        ranked AS (
          SELECT okey, stratum,
                 CAST(row_number() OVER (
                   PARTITION BY stratum
                   ORDER BY md5(CAST(okey AS VARCHAR)), okey
                 ) AS BIGINT) AS sample_rank
          FROM s
        )
        SELECT okey, stratum, sample_rank
        FROM ranked
        WHERE sample_rank <= CASE stratum WHEN 'hot' THEN 40 ELSE 15 END
    """,
))


# -------------------------------------------------------- hub triangles

def _hub_edges(spark: SparkSession, sf: str):
    """Edge stream where vertex 0 (the hub) appears on HALF the raw
    rows — the 'curse of the last reducer' input. triangle_counts
    canonicalizes/dedups and degree-orients internally."""
    li = t(spark, sf, "lineitem")
    v1 = (F.col("l_suppkey") % 97 + 1).cast("long")
    v2 = F.when(F.col("l_orderkey") % 2 == 0, F.lit(0).cast("long")).otherwise(
        (F.col("l_partkey") % 97 + 1).cast("long")
    )
    return li.select(
        F.least(v1, v2).alias("a"), F.greatest(v1, v2).alias("b")
    ).filter(F.col("a") != F.col("b"))


def _skew_triangles(spark: SparkSession, sf: str):
    return triangle_counts(_hub_edges(spark, sf), "a", "b")


register(QuerySpec(
    name="z_skew_triangles_hub",
    tags=("G8", "J6", "SKEW"),
    description="Per-node triangle counts on a hub graph — vertex 0 "
    "sits on 50% of raw edge rows and has the maximum distinct "
    "degree (operators/graph.py::triangle_counts): the degree-ordered "
    "orientation points every hub edge INTO the hub, so the hub's "
    "out-degree is ~0 and the wedge self-join never enumerates the "
    "celebrity key's neighbor pairs (Suri & Vassilvitskii 2011). "
    "Oracle enumerates a<b<c triangles on the canonical distinct "
    "edges — orientation is invisible in the result.",
    build=_skew_triangles,
    oracle="""
        WITH raw AS (
          SELECT least(v1, v2) AS a, greatest(v1, v2) AS b FROM (
            SELECT CAST(l_suppkey % 97 + 1 AS BIGINT) AS v1,
                   CASE WHEN l_orderkey % 2 = 0 THEN CAST(0 AS BIGINT)
                        ELSE CAST(l_partkey % 97 + 1 AS BIGINT) END AS v2
            FROM lineitem
          ) WHERE v1 <> v2
        ),
        e AS (SELECT DISTINCT a, b FROM raw),
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


# ------------------------------------------------- stop-shingle jaccard

def _boilerplate_docs(spark: SparkSession, sf: str):
    """Every document gains a shared 3-word preamble — a universal
    shingle whose document frequency is the whole corpus."""
    return t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit("shared boilerplate preamble "), F.col("text")
        ).alias("text"),
    )


def _skew_jaccard(spark: SparkSession, sf: str):
    return D.jaccard_pairs(
        D.shingles(_boilerplate_docs(spark, sf)), 0.1, max_doc_freq=25
    )


register(QuerySpec(
    name="z_skew_jaccard_stop_shingle",
    tags=("DD2", "J8", "SKEW"),
    description="n-gram Jaccard near-dup pairs on a corpus where "
    "every document shares a boilerplate shingle "
    "(operators/dedup.py::drop_hot_shingles): without the DF cap the "
    "inverted-index self-join is quadratic in corpus size on the "
    "universal shingle; with it, each shingle contributes at most "
    "cap^2 candidates and the result is exact Jaccard over the "
    "non-stop shingle sets. The oracle replays the cap (df <= 25) "
    "and the integer half-up division bit-for-bit.",
    build=_skew_jaccard,
    oracle="""
        WITH tok AS (
          SELECT doc_id,
                 string_split('shared boilerplate preamble ' || text, ' ')
                   AS ts
          FROM documents
        ),
        sh0 AS (
          SELECT DISTINCT doc_id, array_to_string(ts[i + 1 : i + 3], ' ')
                   AS shingle
          FROM tok, LATERAL unnest(
            generate_series(0, greatest(len(ts) - 3, 0))) AS g(i)
        ),
        dfreq AS (SELECT shingle, count(*) AS df FROM sh0 GROUP BY 1),
        sh AS (
          SELECT sh0.doc_id, sh0.shingle
          FROM sh0 JOIN dfreq USING (shingle) WHERE dfreq.df <= 25
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        common AS (
          SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT da, db,
               ((2 * 10000 * (common) + (sa.sz + sb.sz - common))
                // (2 * (sa.sz + sb.sz - common))) / 10000.0 AS jaccard
        FROM common
        JOIN sizes sa ON common.da = sa.doc_id
        JOIN sizes sb ON common.db = sb.doc_id
        WHERE ((2 * 10000 * (common) + (sa.sz + sb.sz - common))
               // (2 * (sa.sz + sb.sz - common))) / 10000.0 >= 0.1
    """,
))


# --------------------------------------------------- salted aggregate

def _skew_salted_agg(spark: SparkSession, sf: str):
    """Hot-stratum exact totals through the explicit two-stage salted
    aggregate (deterministic salt from the row key so both engines---
    and reruns---see identical intermediate groups; the FINAL result
    is salt-invariant anyway, which is the point). DECIMAL(18,4)
    partials keep the sum exact and order-independent."""
    docs = t(spark, sf, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderkey") % 10 < 9, F.lit("hot"))
        .otherwise(
            F.concat(F.lit("seg"), (F.col("o_orderkey") % 10).cast("string"))
        )
        .alias("seg"),
    )
    out = SK.salted_aggregate(
        docs,
        ["seg"],
        [
            F.sum(
                F.coalesce(F.col("o_totalprice"), F.lit(0)).cast("decimal(18,4)")
            ).alias("s"),
            F.count(F.lit(1)).alias("c"),
        ],
        [
            F.sum("s").cast("decimal(18,4)").alias("total"),
            F.sum("c").cast("long").alias("n_orders"),
        ],
        salt_source="o_orderkey",
    )
    return out.select(
        "seg", F.col("total").cast("double").alias("total"), "n_orders"
    )


register(QuerySpec(
    name="skew_salted_agg",
    tags=("A1", "SKEW"),
    description="Exact per-segment totals on a 90%-hot segment via "
    "the explicit two-stage salted aggregate "
    "(operators/skew.py::salted_aggregate): partials per (segment, "
    "salt-of-rowkey) bound every reducer's group at ~|group|/16, the "
    "final combine sees 16 rows per segment. The result is "
    "salt-invariant, so the oracle is the plain GROUP BY; "
    "DECIMAL(18,4) partials make the double-valued total "
    "order-independent bit-for-bit.",
    build=_skew_salted_agg,
    oracle="""
        SELECT CASE WHEN o_orderkey % 10 < 9 THEN 'hot'
                    ELSE 'seg' || CAST(o_orderkey % 10 AS VARCHAR)
               END AS seg,
               CAST(sum(CAST(coalesce(o_totalprice, 0) AS DECIMAL(18,4)))
                    AS DOUBLE) AS total,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    """,
))


# --------------------------------------------------- hot-key join

def _node_labels(spark: SparkSession, sf: str):
    return spark.range(98).select(
        F.col("id").alias("node"),
        F.concat_ws("", F.lit("L"), (F.col("id") % 7)).alias("label"),
    )


def _skew_join(spark: SparkSession, sf: str):
    """Hub-edge fact rows (node 0 on ~50% of them) joined to the
    per-node label dim through the salted broadcast join, then
    aggregated per label. Deterministic salt from the row's other
    endpoint; the join result is salt-invariant, so the oracle is the
    plain join + GROUP BY."""
    fact = _hub_edges(spark, sf).select(F.col("a").alias("node"), "b")
    joined = SK.salted_broadcast_join(
        fact, _node_labels(spark, sf), "node", salt_source="b"
    )
    return joined.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum("b").cast("long").alias("sum_b"),
    )


register(QuerySpec(
    # promoted into the driver window in the r13 rotation (was
    # z_skew_join_hot_key) — the r12 measured hot-key join
    name="skew_join_hot_key",
    tags=("J2", "A1", "SKEW"),
    description="Per-label edge totals where ONE join key (the hub "
    "vertex, least-endpoint of 50% of raw edge rows) dominates the "
    "fact side (operators/skew.py::salted_broadcast_join): the dim "
    "side is replicated once per salt and broadcast, so the hub key's "
    "rows spread over num_salts tasks instead of one reducer — the "
    "shape AQE's skew-join split cannot help when the join is already "
    "broadcast but a single task's OUTPUT is the bottleneck. "
    "Deterministic salt (hash of the row's other endpoint) for "
    "plan-replay parity; the result is salt-invariant, and the oracle "
    "runs the plain join + GROUP BY. tools/skew_audit.py measures the "
    "same derivation's max/median task time as shuffle-join "
    "(AQE skew split on/off) vs this plan at sf0.1.",
    build=_skew_join,
    oracle="""
        WITH raw AS (
          SELECT least(v1, v2) AS a, greatest(v1, v2) AS b FROM (
            SELECT CAST(l_suppkey % 97 + 1 AS BIGINT) AS v1,
                   CASE WHEN l_orderkey % 2 = 0 THEN CAST(0 AS BIGINT)
                        ELSE CAST(l_partkey % 97 + 1 AS BIGINT) END AS v2
            FROM lineitem
          ) WHERE v1 <> v2
        ),
        labels AS (
          SELECT i AS node, 'L' || (i % 7) AS label
          FROM unnest(generate_series(0, 97)) AS g(i)
        )
        SELECT label, CAST(count(*) AS BIGINT) AS n_edges,
               CAST(sum(b) AS BIGINT) AS sum_b
        FROM raw JOIN labels ON raw.a = labels.node
        GROUP BY 1
    """,
))
