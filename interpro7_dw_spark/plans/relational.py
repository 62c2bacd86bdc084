"""Relational query catalog — scans, joins, aggregations, windows,
sorts, set ops, scalar functions (SURVEY.md §2.1-2.8).

Each query names the reference operators it re-expresses (tags) and is
paired with DuckDB oracle SQL. Plans are written DataFrame-first so
Catalyst gets full pushdown/pruning; small dimensions are broadcast
explicitly (the reference's per-worker pickle broadcast,
interpro/xrefs/clans.py:102-137).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.portable import round_div, round_div_sql

from ..functions.intervals import interval_union_length
from ..operators.joins import as_of_join, interval_overlap_join
from .spec import QuerySpec, dbl, dec, register, t

# --------------------------------------------------------------------------
# Scans / filters / projections
# --------------------------------------------------------------------------

register(QuerySpec(
    name="scan_filter_project",
    tags=("S1", "P1", "P2", "P3", "F7"),
    description="Pushed-down plain predicate + regex predicate + column-pruned "
    "scan with computed, regex-extracted and regex-replaced columns (reference "
    "Oracle select lists, interpro/oracle/proteins.py:14-22; EC-number and "
    "PANTHER-subfamily regexes, uniprot/proteins.py:253, "
    "interpro/oracle/matches.py:321). The equality predicate reaches the "
    "parquet scan as a pushed filter; the regex evaluates post-scan.",
    build=lambda spark, sf: (
        t(spark, sf, "part")
        .filter((F.col("p_size") >= 10) & F.col("p_name").rlike("widget$"))
        .select(
            "p_partkey",
            "p_size",
            F.regexp_extract(F.col("p_name"), r"^(\w+)", 1).alias("adjective"),
            F.regexp_replace(F.col("p_name"), r"\s+", "_").alias("slug"),
            (F.col("p_retailprice") * 1.1).alias("marked_up"),
        )
    ),
    oracle=r"""
        SELECT p_partkey, p_size,
               regexp_extract(p_name, '^(\w+)', 1) AS adjective,
               regexp_replace(p_name, '\s+', '_', 'g') AS slug,
               p_retailprice * 1.1 AS marked_up
        FROM part
        WHERE p_size >= 10 AND regexp_matches(p_name, 'widget$')
    """,
))

# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------

register(QuerySpec(
    name="pricing_summary",
    tags=("A1", "A2", "P2"),
    description="TPC-H Q1-shaped partial/final aggregation — the reference's "
    "KVStoreBuilder shuffle+reduce (utils/store.py:280-359) as one groupBy.",
    build=lambda spark, sf: (
        t(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dbl(F.sum(dec("l_quantity"))).alias("sum_qty"),
            dbl(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            dbl(F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))).alias("sum_disc_price"),
            (dbl(F.sum(dec("l_quantity"))) / F.count(F.lit(1))).alias("avg_qty"),
            (dbl(F.sum(dec("l_discount"))) / F.count(F.lit(1))).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    ),
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
               CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
))

register(QuerySpec(
    # z_-parked (still differ-checked): its operators are also covered
    # by window_suite/array_ops, freeing a driver-window slot for
    # domain_match_summary (the flagship X1 oracle, plans/domainq.py)
    name="z_collect_set_priorities",
    tags=("A3", "O3", "F13"),
    description="Grouped distinct-set collection rendered as a sorted joined "
    "string (reference per-entry proteome/structure sets, interpro/xrefs/entries.py:139-154).",
    build=lambda spark, sf: (
        t(spark, sf, "orders")
        .join(t(spark, sf, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias("priorities"),
            F.count("*").alias("n_orders"),
        )
    ),
    oracle="""
        SELECT c_mktsegment,
               string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
))

register(QuerySpec(
    name="count_distinct_parts",
    tags=("A5", "J6"),
    description="Exact distinct counts per group (reference distinct structure "
    "counts, interpro/mysql/proteins.py:314-323).",
    build=lambda spark, sf: (
        t(spark, sf, "lineitem")
        .join(t(spark, sf, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t(spark, sf, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t(spark, sf, "nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    ),
    oracle="""
        SELECT n_name,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT o_orderkey) AS n_orders
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
))

register(QuerySpec(
    name="z_argmax_order",
    tags=("A6", "A7"),
    description="max_by/min_by with deterministic tiebreak (reference "
    "representative-structure pick, interpro/mysql/entries.py:321-335). "
    "z_: A6/A7 redundantly covered in-window by domorg_fingerprint, "
    "topk_per_segment and join_composite_key.",
    build=lambda spark, sf: (
        t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", F.struct("o_totalprice", "o_orderkey")).alias("best_order"),
            F.min_by("o_orderkey", F.struct("o_orderdate", "o_orderkey")).alias("first_order"),
            F.max("o_totalprice").alias("best_price"),
        )
    ),
    oracle="""
        WITH ranked AS (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey DESC) AS rbest,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate ASC, o_orderkey ASC) AS rfirst
          FROM orders
        )
        SELECT o_custkey,
               max(CASE WHEN rbest = 1 THEN o_orderkey END) AS best_order,
               max(CASE WHEN rfirst = 1 THEN o_orderkey END) AS first_order,
               max(o_totalprice) AS best_price
        FROM ranked GROUP BY o_custkey
    """,
))

register(QuerySpec(
    name="z_rollup_region_nation",
    tags=("A9", "A8"),
    description="Hierarchical rollup — the reference's hand-built per-entity/"
    "per-db/total count pyramid (interpro/mysql/taxa.py:125-178) as ROLLUP.",
    build=lambda spark, sf: (
        t(spark, sf, "customer")
        .join(F.broadcast(t(spark, sf, "nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t(spark, sf, "region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_customers",
        )
    ),
    oracle="""
        SELECT coalesce(r_name, 'ALL') AS region,
               coalesce(n_name, 'ALL') AS nation,
               count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
))

register(QuerySpec(
    name="z_having_popular_parts",
    tags=("A11", "A5"),
    description="Two-stage aggregate with HAVING-style coverage filter "
    "(reference EC-number >=3-protein/60%-coverage rule, interpro/xrefs/entries.py:520-551). "
    "z_: A5 covered in-window by count_distinct_parts; the HAVING/coverage "
    "shape by mart_entry2xrefs' EC stem fallback.",
    build=lambda spark, sf: (
        t(spark, sf, "lineitem")
        .join(t(spark, sf, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_partkey")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
        .filter(F.col("n_customers") >= 5)
    ),
    oracle="""
        SELECT l_partkey, count(DISTINCT o_custkey) AS n_customers
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_partkey
        HAVING count(DISTINCT o_custkey) >= 5
    """,
))

register(QuerySpec(
    name="z_global_stats",
    tags=("A13",),
    description="Release-note-style global statistics in one pass "
    "(reference interpro/mysql/databases.py:126-312).",
    build=lambda spark, sf: (
        t(spark, sf, "lineitem").agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey", "l_suppkey").alias("n_part_supp"),
            dbl(F.sum(dec("l_quantity"))).alias("total_qty"),
            F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("first_ship"),
            F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("last_ship"),
        )
    ),
    oracle="""
        SELECT count(*) AS n_rows,
               count(DISTINCT l_orderkey) AS n_orders,
               count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
               strftime(min(l_shipdate), '%Y-%m-%d') AS first_ship,
               strftime(max(l_shipdate), '%Y-%m-%d') AS last_ship
        FROM lineitem
    """,
))

register(QuerySpec(
    name="coverage_length",
    tags=("A14", "F10"),
    description="Interval-union coverage (reference per-(signature,pdb) residue "
    "bitmap, interpro/xrefs/utils.py:22-54) as a sorted interval fold — "
    "O(#intervals) instead of exploding O(span) position rows; the oracle "
    "proves equivalence to count(DISTINCT pos).",
    build=lambda spark, sf: (
        t(spark, sf, "lineitem")
        .select(
            "l_orderkey",
            F.struct(
                F.floor("l_quantity").cast("long").alias("s"),
                (F.floor("l_quantity") + F.col("l_linenumber") * 5).cast("long").alias("e"),
            ).alias("iv"),
        )
        .groupBy("l_orderkey")
        .agg(F.collect_list("iv").alias("ivs"))
        .select("l_orderkey", interval_union_length(F.col("ivs")).alias("coverage"))
    ),
    oracle="""
        SELECT l_orderkey, count(DISTINCT pos) AS coverage
        FROM lineitem,
             LATERAL unnest(generate_series(CAST(floor(l_quantity) AS INT),
                                            CAST(floor(l_quantity) AS INT) + l_linenumber * 5)) AS t(pos)
        GROUP BY l_orderkey
    """,
))

# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

register(QuerySpec(
    name="z_join_inner_agg",
    tags=("J1", "A2"),
    description="The workhorse keyed equi-join + aggregate (reference zipped "
    "sort-merge join over co-partitioned stores, interpro/xrefs/entries.py:175-191).",
    build=lambda spark, sf: (
        t(spark, sf, "lineitem")
        .join(t(spark, sf, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            dbl(F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    ),
    oracle="""
        SELECT o_orderstatus,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               count(DISTINCT o_orderkey) AS n_orders
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
    """,
))

register(QuerySpec(
    name="z_join_broadcast_dim",
    tags=("J2", "A1"),
    description="Broadcast hash join against a small dimension (reference "
    "per-worker pickle dims, interpro/xrefs/clans.py:102-114).",
    build=lambda spark, sf: (
        t(spark, sf, "lineitem")
        .join(F.broadcast(t(spark, sf, "part")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type")
        .agg(
            dbl(F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    ),
    oracle="""
        SELECT p_type,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_type
    """,
))

register(QuerySpec(
    name="revenue_by_nation",
    tags=("J6", "J2", "A1", "P2"),
    description="Multi-way join chain over the star schema (reference 4-way "
    "Oracle joins, interpro/oracle/entries.py:721-754).",
    build=lambda spark, sf: (
        t(spark, sf, "lineitem")
        .join(
            t(spark, sf, "orders").filter(
                (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t(spark, sf, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t(spark, sf, "nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t(spark, sf, "region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dbl(F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))).alias("revenue"))
    ),
    oracle="""
        SELECT r_name, n_name,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
         AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
))

register(QuerySpec(
    name="z_join_left_default",
    tags=("J3",),
    description="Left outer join with defaulted misses (reference "
    "proteomes_store.get(acc) -> None, interpro/xrefs/entries.py:179-190).",
    build=lambda spark, sf: (
        t(spark, sf, "customer")
        .join(t(spark, sf, "orders"), F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dbl(F.sum(dec("o_totalprice"))), F.lit(0.0)).alias("spend"),
        )
    ),
    oracle="""
        SELECT c_custkey,
               count(o_orderkey) AS n_orders,
               coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
))

register(QuerySpec(
    name="join_semi_anti",
    tags=("J4", "J5", "P5"),
    description="Left-semi existence filter and left-anti negative lookup, "
    "tagged and unioned (reference 'if acc not in entries: continue', "
    "interpro/oracle/entries.py:197-199; retired-entries NOT IN, "
    "interpro/oracle/entries.py:516-520).",
    build=lambda spark, sf: (
        t(spark, sf, "customer")
        .join(
            t(spark, sf, "orders").filter(F.col("o_totalprice") > 100000),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .select(F.lit("has_big_order").alias("tag"), "c_custkey", "c_name")
        .unionByName(
            t(spark, sf, "customer")
            .join(
                t(spark, sf, "orders"),
                F.col("c_custkey") == F.col("o_custkey"),
                "left_anti",
            )
            .select(F.lit("no_orders").alias("tag"), "c_custkey", "c_name")
        )
    ),
    oracle="""
        SELECT 'has_big_order' AS tag, c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        UNION ALL
        SELECT 'no_orders' AS tag, c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
))

def _join_composite_key(spark: SparkSession, sf: str):
    li = t(spark, sf, "lineitem")
    last = (
        li.groupBy(F.col("l_orderkey").alias("m_orderkey"))
        .agg(F.max("l_linenumber").alias("last_line"))
    )
    return (
        last.join(
            li,
            (F.col("m_orderkey") == F.col("l_orderkey"))
            & (F.col("last_line") == F.col("l_linenumber")),
        )
        .select("l_orderkey", "l_linenumber", "l_partkey", F.col("l_extendedprice").alias("price"))
    )


register(QuerySpec(
    name="z_join_composite_key",
    tags=("J10", "A7"),
    description="Equi-join on a composite key (reference UniParc matchesxsites "
    "merge on (upi, sig, start, end), interpro/oracle/uniparc.py:364-378).",
    build=_join_composite_key,
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
               l.l_extendedprice AS price
        FROM (SELECT l_orderkey, max(l_linenumber) AS last_line
              FROM lineitem GROUP BY l_orderkey) m
        JOIN lineitem l ON m.l_orderkey = l.l_orderkey AND m.last_line = l.l_linenumber
    """,
))

register(QuerySpec(
    name="asof_event_attrib",
    tags=("J7", "W1"),
    description="Backward as-of join: each purchase attributed to the user's "
    "latest prior click (reference release-freeze as-of, "
    "interpro/oracle/entries.py:275-290) — union+window plan, no range explosion.",
    build=lambda spark, sf: (
        as_of_join(
            t(spark, sf, "events").filter(F.col("event_type") == "purchase"),
            t(spark, sf, "events").filter(F.col("event_type") == "click"),
            on=["user_id"],
            left_ts="ts",
            right_ts="ts",
            value_cols=["event_id"],
            tiebreak="event_id",
        ).select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("event_id_asof").alias("click_id"),
        )
    ),
    oracle="""
        SELECT event_id AS purchase_id, user_id, click_id
        FROM (
          SELECT event_id, user_id, event_type,
                 last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                   OVER (PARTITION BY user_id
                         ORDER BY ts, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id
          FROM events
          WHERE event_type IN ('purchase', 'click')
        )
        WHERE event_type = 'purchase'
    """,
))

register(QuerySpec(
    name="overlap_pairs",
    tags=("J8",),
    description="Interval overlap self-join, bucketed to an equi-join "
    "(reference entry-location overlap theta join, interpro/xrefs/entries.py:55-101).",
    build=lambda spark, sf: (
        (lambda o: interval_overlap_join(
            o.select(
                F.col("o_custkey").alias("custkey"),
                F.col("o_orderkey").alias("a_order"),
                F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))).cast("long").alias("a_start"),
                (F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))).cast("long") + 30).alias("a_end"),
            ),
            o.select(
                F.col("o_custkey").alias("custkey"),
                F.col("o_orderkey").alias("b_order"),
                F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))).cast("long").alias("b_start"),
                (F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))).cast("long") + 30).alias("b_end"),
            ),
            on=["custkey"],
            left_start="a_start", left_end="a_end",
            right_start="b_start", right_end="b_end",
            bucket_width=64,
            extra_pred=F.col("a_order") < F.col("b_order"),
        ))(t(spark, sf, "orders"))
        .groupBy("custkey")
        .agg(F.count("*").alias("n_overlapping"))
    ),
    oracle="""
        WITH iv AS (
          SELECT o_custkey AS custkey, o_orderkey AS ok,
                 CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS s,
                 CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) + 30 AS e
          FROM orders
        )
        SELECT a.custkey, count(*) AS n_overlapping
        FROM iv a JOIN iv b
          ON a.custkey = b.custkey AND a.ok < b.ok
         AND a.s <= b.e AND b.s <= a.e
        GROUP BY a.custkey
    """,
))

def _cross_denorm(spark: SparkSession, sf: str):
    cells = t(spark, sf, "region").crossJoin(
        t(spark, sf, "orders").select(F.col("o_orderpriority").alias("prio")).distinct()
    )
    counts = (
        t(spark, sf, "orders")
        .join(t(spark, sf, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t(spark, sf, "nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        cells.join(
            counts,
            (F.col("r_regionkey") == F.col("n_regionkey"))
            & (F.col("prio") == F.col("o_orderpriority")),
            "left",
        )
        .select(
            "r_name",
            F.col("prio").alias("o_orderpriority"),
            F.coalesce("cnt", F.lit(0)).alias("n_orders"),
        )
    )


register(QuerySpec(
    # z_-parked (still differ-checked): J9 also covered by
    # search_documents, J3 by z_join_left_default — slot freed for
    # mart_protein (plans/proteinq.py)
    name="z_cross_denorm",
    tags=("J9", "J3"),
    description="Cross-product denormalization with zero-filled fallback cells "
    "(reference ES (protein x entry x chain) doc fan-out + fallback docs, "
    "interpro/elastic/export.py:576-701).",
    build=_cross_denorm,
    oracle="""
        WITH cells AS (
          SELECT r_regionkey, r_name, o_orderpriority
          FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
        ), counts AS (
          SELECT n_regionkey, o_orderpriority, count(*) AS cnt
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_regionkey, o_orderpriority
        )
        SELECT r_name, cells.o_orderpriority, coalesce(cnt, 0) AS n_orders
        FROM cells LEFT JOIN counts
          ON cells.r_regionkey = counts.n_regionkey
         AND cells.o_orderpriority = counts.o_orderpriority
    """,
))

# --------------------------------------------------------------------------
# Windows
# --------------------------------------------------------------------------

_first_order_w = lambda: W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")

register(QuerySpec(
    name="window_suite",
    tags=("W1", "W2", "W4", "A12"),
    description="The full §2.5 window family in ONE ordered pass over orders: "
    "row_number first-version pick (reference first audit row per entry, "
    "interpro/oracle/entries.py:96-110), first_value, lag delta, running "
    "decimal-exact sum (W4 recurrence), and last-row-before-cutoff per key "
    "(reference latest name <= freeze date, interpro/oracle/entries.py:326-347) "
    "as a conditional partition max over a chronologically-sortable key. One "
    "shuffle on o_custkey serves every column — the point of the suite.",
    build=lambda spark, sf: (
        t(spark, sf, "orders").select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(_first_order_w()).alias("rn"),
            F.first("o_orderkey").over(_first_order_w()).alias("first_orderkey"),
            F.sum(dec("o_totalprice"))
            .over(_first_order_w().rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("double")
            .alias("running_spend"),
            F.round(
                F.col("o_totalprice") - F.lag("o_totalprice").over(_first_order_w()), 4
            ).alias("price_delta"),
            F.max(
                F.when(
                    F.col("o_orderdate") < "1998-01-01",
                    F.concat_ws(
                        ":",
                        F.date_format("o_orderdate", "yyyy-MM-dd"),
                        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
                    ),
                )
            )
            .over(W.partitionBy("o_custkey"))
            .alias("last_before_key"),
        )
    ),
    oracle="""
        SELECT o_custkey, o_orderkey,
               row_number() OVER w AS rn,
               first_value(o_orderkey) OVER w AS first_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
               round(o_totalprice - lag(o_totalprice) OVER w, 4) AS price_delta,
               max(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                        THEN strftime(o_orderdate, '%Y-%m-%d') || ':' ||
                             lpad(CAST(o_orderkey AS VARCHAR), 12, '0') END)
                 OVER (PARTITION BY o_custkey) AS last_before_key
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
))

register(QuerySpec(
    name="topk_per_segment",
    tags=("O5", "W1"),
    description="Top-K per group via ranked window (reference top-20 domain cap, "
    "interpro/oracle/matches.py:29,137-141).",
    build=lambda spark, sf: (
        t(spark, sf, "orders")
        .join(t(spark, sf, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            ),
        )
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "rk", "o_orderkey", F.col("o_totalprice").alias("price"))
    ),
    oracle="""
        SELECT c_mktsegment, rk, o_orderkey, o_totalprice AS price
        FROM (
          SELECT c_mktsegment, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
          FROM orders JOIN customer ON o_custkey = c_custkey
        )
        WHERE rk <= 3
    """,
))

register(QuerySpec(
    name="z_sessionize_events",
    tags=("W3",),
    description="Gaps-and-islands sessionization — the reference's interval "
    "condensation pattern (interpro/oracle/matches.py:60-103) on event time: "
    "new session when gap > 30 min.",
    # events.ts is epoch-nanos LONG (sources/catalog.py); truncate to
    # micros for exact integer gap arithmetic — DuckDB's TIMESTAMP is
    # micro-precision, so micros are the common exact unit.
    build=lambda spark, sf: (
        t(spark, sf, "events")
        .withColumn("ts_us", F.expr("ts div 1000"))
        .withColumn(
            "new_sess",
            F.when(
                F.col("ts_us")
                - F.lag("ts_us").over(W.partitionBy("user_id").orderBy("ts_us", "event_id"))
                <= 1_800_000_000,
                F.lit(0),
            ).otherwise(F.lit(1)),
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(
                W.partitionBy("user_id").orderBy("ts_us", "event_id")
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("user_id", "sess_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts_us").alias("sess_start_us"),
            F.max("ts_us").alias("sess_end_us"),
        )
    ),
    oracle="""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                        OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                        <= 1800000000
                      THEN 0 ELSE 1 END AS new_sess
          FROM events
        ), s AS (
          SELECT user_id, event_id, ts_us,
                 CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
          FROM e
        )
        SELECT user_id, sess_id, count(*) AS n_events,
               min(ts_us) AS sess_start_us, max(ts_us) AS sess_end_us
        FROM s GROUP BY user_id, sess_id
    """,
))

# --------------------------------------------------------------------------
# Sorts / limits
# --------------------------------------------------------------------------

register(QuerySpec(
    name="z_order_limit_top10",
    tags=("O4", "O1"),
    description="Global top-N with deterministic tiebreak (reference LIMIT 1 "
    "latest release note, interpro/ftp/relnotes.py:18-26).",
    build=lambda spark, sf: (
        t(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", F.col("o_totalprice").alias("price"))
    ),
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice AS price
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
))

register(QuerySpec(
    name="z_sorted_parts_per_order",
    tags=("O3", "A4"),
    description="In-group sorted list (reference locations sorted by leftmost "
    "fragment, interpro/oracle/matches.py:371-374).",
    build=lambda spark, sf: (
        t(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.col("l_partkey").cast("string"))), ","
            ).alias("parts")
        )
    ),
    # note: string sort on purpose (array_sort on strings) — mirrored in SQL
    oracle="""
        SELECT l_orderkey,
               string_agg(CAST(l_partkey AS VARCHAR), ','
                          ORDER BY CAST(l_partkey AS VARCHAR)) AS parts
        FROM lineitem GROUP BY l_orderkey
    """,
))

# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

def _custkeys_of_year(spark, sf, year: int):
    return (
        t(spark, sf, "orders")
        .filter(F.year("o_orderdate") == year)
        .select(F.col("o_custkey").alias("custkey"))
    )


register(QuerySpec(
    name="z_except_intersect_customers",
    tags=("U2", "U3", "J5"),
    description="Distinct set difference AND intersection, provenance-tagged in "
    "one result (reference ES leftover anti-sets, interpro/elastic/export.py:"
    "225-284; overlap = a & b set math, interpro/oracle/matches.py:165-167).",
    build=lambda spark, sf: (
        _custkeys_of_year(spark, sf, 1995)
        .subtract(_custkeys_of_year(spark, sf, 1996))
        .withColumn("tag", F.lit("only_1995"))
        .unionByName(
            _custkeys_of_year(spark, sf, 1995)
            .intersect(_custkeys_of_year(spark, sf, 1996))
            .withColumn("tag", F.lit("both_years"))
        )
    ),
    oracle="""
        SELECT custkey, 'only_1995' AS tag FROM (
          SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
          EXCEPT
          SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
        )
        UNION ALL
        SELECT custkey, 'both_years' AS tag FROM (
          SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
          INTERSECT
          SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
        )
    """,
))

# --------------------------------------------------------------------------
# Scalar functions
# --------------------------------------------------------------------------

register(QuerySpec(
    name="z_scalar_funcs",
    tags=("F5", "F6", "F9", "F13", "A2"),
    description="String, datetime and CASE scalar functions in one per-order "
    "projection over a broadcast customer join: lower/trim/substring/concat_ws "
    "(reference LOWER(DBSHORT)/TRIM(NAME), interpro/oracle/entries.py:65-67,"
    "307-313), date formatting/extraction (reference TO_CHAR(ts,'YYYY-MM-DD'), "
    "interpro/oracle/proteins.py:18), and CASE bucketing (reference per-library "
    "dispatch shape, interpro/lookup.py:151-202).",
    build=lambda spark, sf: (
        t(spark, sf, "orders")
        .join(
            F.broadcast(t(spark, sf, "customer").select("c_custkey", "c_name", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "o_orderkey",
            F.lower("c_name").alias("name_lc"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.concat_ws("|", F.trim(F.col("c_name")), F.col("c_mktsegment")).alias("tagline"),
            F.length("c_name").alias("name_len"),
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            F.when(F.col("o_totalprice") < 50000, "small")
            .when(F.col("o_totalprice") < 150000, "medium")
            .otherwise("large")
            .alias("bucket"),
        )
    ),
    oracle="""
        SELECT o_orderkey,
               lower(c_name) AS name_lc,
               substring(c_name, 1, 8) AS name_prefix,
               concat_ws('|', trim(c_name), c_mktsegment) AS tagline,
               length(c_name) AS name_len,
               year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
               strftime(o_orderdate, '%Y-%m') AS ym,
               CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'medium'
                    ELSE 'large' END AS bucket
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
))

register(QuerySpec(
    # z_-parked (still differ-checked): F8 covered by mart_entry2xrefs +
    # lookup_match_json - slot freed for tree_hierarchy_json (plans/treeq.py)
    name="z_json_extract",
    tags=("F8",),
    description="JSON field extraction + typed aggregation (reference "
    "json.loads of clan domains, interpro/oracle/clans.py:66-74).",
    build=lambda spark, sf: (
        t(spark, sf, "events")
        .select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("__sk"),
            F.max("k").alias("max_k"),
            F.count("k").alias("n"),
        )
        # integer-exact mean: round() of a float avg is not portable
        # at decimal-half boundaries (functions/portable.py)
        .select(
            "event_type",
            round_div(F.col("__sk"), F.col("n"), 4).alias("avg_k"),
            "max_k",
            "n",
        )
    ),
    # round_div_sql handles a possibly-NEGATIVE summed k in lockstep
    # with the Spark side (floor-based half-up on both engines)
    oracle=f"""
        SELECT event_type,
               {round_div_sql(
                   "sum(CAST(json_extract_string(props, '$.k') AS INT))",
                   "count(CAST(json_extract_string(props, '$.k') AS INT))",
                   4,
               )} AS avg_k,
               max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
               count(CAST(json_extract_string(props, '$.k') AS INT)) AS n
        FROM events GROUP BY event_type
    """,
))

register(QuerySpec(
    name="z_hash_partition_key",
    tags=("F3",),
    description="Deterministic hash + prefix partition key (reference md5 "
    "3-hex-char lookup partitioning, interpro/oracle/lookup.py:194,347-358).",
    build=lambda spark, sf: (
        t(spark, sf, "customer")
        .select(F.substring(F.md5(F.col("c_name").cast("binary")), 1, 2).alias("shard"))
        .groupBy("shard")
        .agg(F.count("*").alias("n"))
    ),
    oracle="""
        SELECT substring(md5(c_name), 1, 2) AS shard, count(*) AS n
        FROM customer GROUP BY 1
    """,
))

