"""Second relational batch: grouping sets, pivot/unpivot, nested-map
re-rendering, exact percentiles, array/scalar utilities — the rest of
SURVEY.md §2.4/2.8's aggregate & function surface.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import register_views
from .spec import QuerySpec, dec, register, t


def _grouping_sets(spark: SparkSession, sf: str):
    # GROUPING SETS is SQL-only in Spark's DataFrame API — register
    # views and express the exact set list (the reference computes the
    # same (tax,db,entry)/(tax,db)/(tax) pyramid by hand,
    # interpro/mysql/taxa.py:125-178)
    register_views(spark, sf, ["customer", "nation", "orders"])
    return spark.sql("""
        SELECT coalesce(n_name, 'ALL') AS nation,
               coalesce(c_mktsegment, 'ALL') AS segment,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())
    """)


register(QuerySpec(
    name="grouping_sets_pyramid",
    tags=("A8", "A13"),
    description="GROUPING SETS pyramid — the reference's hand-built "
    "per-entity/per-db/total counts (interpro/mysql/taxa.py:125-178).",
    build=_grouping_sets,
    oracle="""
        SELECT coalesce(n_name, 'ALL') AS nation,
               coalesce(c_mktsegment, 'ALL') AS segment,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())
    """,
))

_STATUSES = ["F", "O", "P"]

register(QuerySpec(
    name="z_pivot_status_by_year",
    tags=("A8", "A2"),
    description="Pivot long->wide (explicit value list keeps the plan "
    "single-pass; output columns n_F/n_O/n_P).",
    build=lambda spark, sf: (
        t(spark, sf, "orders")
        .groupBy(F.year("o_orderdate").alias("yr"))
        .pivot("o_orderstatus", _STATUSES)
        .agg(F.count(F.lit(1)))
        .select(
            "yr",
            *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in _STATUSES],
        )
    ),
    oracle="""
        SELECT year(o_orderdate) AS yr,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_F,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS n_O,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS n_P
        FROM orders GROUP BY 1
    """,
))

register(QuerySpec(
    # z_-parked (still differ-checked): U1 covered by search_documents +
    # mart_pfam_alignments, A8 by pivot_status_by_year, F11 by array_ops -
    # slot freed for mart_relnotes (plans/relnotesq.py)
    name="z_union_unpivot",
    tags=("U1", "A8", "F11"),
    description="Unpivot wide->long via stack(), then UNION ALL with a second "
    "source under a provenance tag (reference matches UNION ALL "
    "feature-matches, interpro/oracle/matches.py:249-257).",
    build=lambda spark, sf: (
        t(spark, sf, "orders")
        .groupBy(F.year("o_orderdate").alias("yr"))
        .pivot("o_orderstatus", _STATUSES)
        .agg(F.count(F.lit(1)))
        .select(
            "yr",
            *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in _STATUSES],
        )
        .selectExpr(
            "yr",
            "stack(3, 'F', n_F, 'O', n_O, 'P', n_P) AS (key, n)",
        )
        .filter(F.col("n") > 0)
        .select(F.lit("order_status").alias("src"), "yr", "key", "n")
        .unionByName(
            t(spark, sf, "lineitem")
            .groupBy(
                F.year("l_shipdate").alias("yr"),
                F.col("l_returnflag").alias("key"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit("return_flag").alias("src"), "yr", "key", "n")
        )
    ),
    oracle="""
        SELECT 'order_status' AS src, year(o_orderdate) AS yr,
               o_orderstatus AS key, count(*) AS n
        FROM orders GROUP BY 2, 3
        UNION ALL
        SELECT 'return_flag' AS src, year(l_shipdate) AS yr,
               l_returnflag AS key, count(*) AS n
        FROM lineitem GROUP BY 2, 3
    """,
))

register(QuerySpec(
    name="z_nested_map_render",
    tags=("A8", "F11", "F13"),
    description="Nested map-of-counts accumulator rendered canonically "
    "(reference {db: {count, entries:{...}}} dicts, interpro/xrefs/taxa.py:12-22; "
    "long-format groupBy + deterministic re-nesting instead of custom dict merges).",
    build=lambda spark, sf: (
        t(spark, sf, "orders")
        .join(t(spark, sf, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t(spark, sf, "nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .groupBy("n_name")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("o_orderpriority", "cnt"))),
                    lambda s: F.concat_ws(":", s["o_orderpriority"], s["cnt"]),
                ),
                ",",
            ).alias("priority_counts")
        )
    ),
    oracle="""
        WITH c AS (
          SELECT n_name, o_orderpriority, count(*) AS cnt
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2
        )
        SELECT n_name,
               string_agg(o_orderpriority || ':' || cnt, ',' ORDER BY o_orderpriority) AS priority_counts
        FROM c GROUP BY n_name
    """,
))

register(QuerySpec(
    name="z_percentile_prices",
    tags=("A13", "F9"),
    description="Exact interpolated percentiles per group.",
    build=lambda spark, sf: (
        t(spark, sf, "orders")
        .join(t(spark, sf, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
            F.count("*").alias("n"),
        )
    ),
    oracle="""
        SELECT c_mktsegment,
               round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
               count(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
))

register(QuerySpec(
    name="z_array_ops",
    tags=("F11", "O3"),
    description="Array utilities over tokenized text: indexing, slice, "
    "distinct size, contains.",
    build=lambda spark, sf: (
        t(spark, sf, "documents")
        .select(
            "doc_id",
            F.split(F.col("text"), " ").alias("toks"),
        )
        .select(
            "doc_id",
            F.element_at("toks", 1).alias("first_tok"),
            F.element_at("toks", -1).alias("last_tok"),
            F.concat_ws(" ", F.slice("toks", 1, 3)).alias("head3"),
            F.array_contains("toks", "spark").cast("int").alias("has_spark"),
            F.size(F.array_distinct("toks")).alias("n_uniq"),
        )
    ),
    oracle="""
        WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        SELECT doc_id,
               toks[1] AS first_tok,
               toks[-1] AS last_tok,
               array_to_string(toks[1:3], ' ') AS head3,
               CAST(list_contains(toks, 'spark') AS INT) AS has_spark,
               len(list_distinct(toks)) AS n_uniq
        FROM tk
    """,
))


def _domorg_fingerprint(spark: SparkSession, sf: str):
    # domain-organisation semantics (interpro/xrefs/domorgs.py:60-90):
    # canonical key = ordered element list joined by '-', hashed; one
    # representative per organisation = oldest member (min date, then
    # min key); here: orders as "proteins", their part sequence as the
    # "domain organisation"
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey")
    orgs = (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("l_linenumber", "l_partkey"))),
                    lambda s: s["l_partkey"].cast("string"),
                ),
                "-",
            ).alias("org_key")
        )
        .withColumn("org_hash", F.md5(F.col("org_key").cast("binary")))
    )
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    return (
        orgs.join(o, orgs["l_orderkey"] == o["o_orderkey"])
        .groupBy("org_hash")
        .agg(
            F.count("*").alias("n_members"),
            F.min_by("l_orderkey", F.struct("o_orderdate", "o_orderkey")).alias("representative"),
        )
        .filter(F.col("n_members") >= 2)
    )


register(QuerySpec(
    name="domorg_fingerprint",
    tags=("F3", "A6", "DD1"),
    description="Domain-organisation fingerprint + oldest-member "
    "representative (interpro/xrefs/domorgs.py:60-90 semantics).",
    build=_domorg_fingerprint,
    oracle="""
        WITH org AS (
          SELECT l_orderkey,
                 md5(string_agg(CAST(l_partkey AS VARCHAR), '-' ORDER BY l_linenumber)) AS org_hash
          FROM lineitem GROUP BY l_orderkey
        ), ranked AS (
          SELECT org_hash, o_orderkey,
                 row_number() OVER (PARTITION BY org_hash
                                    ORDER BY o_orderdate, o_orderkey) AS rn,
                 count(*) OVER (PARTITION BY org_hash) AS n_members
          FROM org JOIN orders ON l_orderkey = o_orderkey
        )
        SELECT org_hash, n_members, o_orderkey AS representative
        FROM ranked WHERE rn = 1 AND n_members >= 2
    """,
))


register(QuerySpec(
    name="z_approx_distinct_bounds",
    tags=("A5", "A13"),
    description="Sketch aggregation with a VERIFIABLE contract: "
    "per-group HyperLogLog++ distinct counts (approx_count_distinct, "
    "rsd=0.02 — mergeable, fixed-size state, the 100 TB path where "
    "exact count-distinct needs a full shuffle of the key universe) "
    "side-by-side with the exact count, returning the exact value and "
    "a within-10pct verdict — the band is deliberately ~4x the "
    "sketch's 2.5-sigma bound so a different Spark HLL++ build can't "
    "fail the byte-exact differ without a real regression; the tight "
    "5pct contract is asserted in tests/test_plans.py instead.",
    build=lambda spark, sf: (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
        )
        .select(
            "l_returnflag",
            "exact_orders",
            (
                F.abs(F.col("approx") - F.col("exact_orders"))
                <= F.col("exact_orders") * 0.10
            ).alias("within_10pct"),
        )
    ),
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_orderkey) AS exact_orders,
               TRUE AS within_10pct
        FROM lineitem GROUP BY l_returnflag
    """,
))


register(QuerySpec(
    name="z_approx_quantile_bounds",
    tags=("A13", "A5"),
    description="Quantile sketch with a verifiable contract "
    "(companion to z_approx_distinct_bounds): per-group "
    "percentile_approx(o_totalprice, 0.5, accuracy=10000) — the "
    "fixed-size mergeable sketch that replaces a full sort at 100 TB "
    "— checked against the exact median: the verdict asserts the "
    "approximation lands within the 1st..3rd exact quartile range. "
    "The sketch value is engine-internal, so the oracle checks exact "
    "quartiles + an all-true verdict.",
    build=lambda spark, sf: (
        t(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
            F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
            F.expr(
                "percentile_approx(o_totalprice, 0.5, 10000)"
            ).alias("approx_med"),
        )
        .select(
            "o_orderpriority",
            F.round("q1", 4).alias("q1"),
            F.round("q3", 4).alias("q3"),
            (
                (F.col("approx_med") >= F.col("q1"))
                & (F.col("approx_med") <= F.col("q3"))
            ).alias("median_within_iqr"),
        )
    ),
    oracle="""
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.25), 4) AS q1,
               round(quantile_cont(o_totalprice, 0.75), 4) AS q3,
               TRUE AS median_within_iqr
        FROM orders GROUP BY o_orderpriority
    """,
))


from ..functions.folds import ordered_fold_oracle_cte  # noqa: E402


def _ordered_fold(spark: SparkSession, sf: str):
    from ..functions.folds import ordered_fold_sum

    rows = t(spark, sf, "lineitem").select(
        (F.col("l_suppkey") % 50).alias("grp"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("ok"),
        F.col("l_extendedprice").cast("double").alias("x"),
    )
    return ordered_fold_sum(rows, ["grp"], "ok", "x").select(
        "grp", F.round("fold_sum", 4).alias("fold_sum")
    )


register(QuerySpec(
    name="z_ordered_fold",
    tags=("F9", "A1"),
    description="The shared two-level pinned float fold "
    "(functions/folds.py::ordered_fold_sum — the hub-safe, "
    "engine-replayable double summation under pagerank and the IVF "
    "cell means): per-group sum of doubles bucketed by key % 64, "
    "folded per bucket in key order, bucket sums folded in bucket "
    "order. The oracle replays the identical bucket structure "
    "(ordered_fold_oracle_cte), so both engines agree bit-for-bit "
    "where a plain SUM(double) is partitioning-dependent in Spark.",
    build=_ordered_fold,
    oracle="""
        SELECT grp, round(fold_sum, 4) AS fold_sum FROM (
        """ + ordered_fold_oracle_cte(
            source="""(SELECT l_suppkey % 50 AS grp,
                              l_orderkey * 10 + l_linenumber AS ok,
                              l_extendedprice::DOUBLE AS x FROM lineitem)""",
            group_cols="grp",
            order_col="ok",
            value_expr="x",
        ) + """
        )
    """,
))
