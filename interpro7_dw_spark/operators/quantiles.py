"""Exact grouped order statistics at scale: per-key quantiles without
a per-key sort.

``approx_percentile`` (A5 family, z_approx_quantile_bounds) is the
sketch path; this is the exact path — the value a
``row_number() OVER (PARTITION BY key ORDER BY value)`` pick would
return, computed WITHOUT that window, whose group for a hot key is a
single-task sort of the key's whole history (the recurring scale bug,
see sampling.py module docstring).

Plan shape (the value-cut two-phase rank, generalized from
text.py::perplexity_buckets):

1. collapse the input to (key, value, weight) — one hash aggregate,
   the only full-data shuffle; ties in value become one weighted row,
   so duplicate-heavy metrics shrink drastically;
2. assign each row an order-preserving VALUE-range bucket from the
   global [min, max] (two driver scalars) — monotone in value order,
   so a local weighted prefix within (bucket, key) plus per-bucket
   offsets IS the exact global weighted rank interval of each value;
3. the offsets/totals tables are windowed per key over <= n_ranges
   bucket rows (bounded groups) and joined back on (bucket, key) —
   plain equi-joins, AQE picks broadcast when they fit;
4. a quantile q with target rank ``r = q_ppm*(n-1) DIV 1e6 + 1``
   (lower/"disc" interpolation — reports an actual data value, no
   float blending, so any engine agrees bit-for-bit) selects the row
   whose rank interval covers r.

Value cuts can be unbalanced when values cluster (hash cuts cannot);
that costs bucket balance, never correctness, and the collapse in
step 1 already absorbed the worst clustering (a million identical
readings is ONE weighted row). A pathological key whose distinct
values all land in one cut still bounds its window group by that
key's distinct-value count inside the cut — strictly no worse than
the naive per-key window, and usually orders of magnitude smaller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def grouped_quantiles_exact(
    df: DataFrame,
    key_col: str,
    value_col: str,
    q_ppms: list[int] = (250_000, 500_000, 750_000),
    n_ranges: int | None = None,
) -> DataFrame:
    """Per-``key_col`` exact quantiles of ``value_col`` at the given
    PPM fractions (250_000 = p25). NULL values are ignored. Returns
    (key, q_ppm, n, quantile_value) — one row per key per fraction,
    ``n`` the key's non-null count, ``quantile_value`` the element at
    1-based rank ``q_ppm*(n-1) DIV 1e6 + 1`` of the key's ascending
    value sequence (an actual data value).
    """
    spark = df.sparkSession
    rows = (
        df.select(F.col(key_col).alias("key"), F.col(value_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("key", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    n = min(
        n_ranges
        or int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        65536,
    )
    bounds = rows.agg(F.min("v").alias("mn"), F.max("v").alias("mx")).first()
    if bounds.mn is None:
        # empty fast path: derive the schema from the INPUT columns so
        # a long key or decimal value keeps its type (a hardcoded DDL
        # here would break downstream unions on empty inputs)
        return rows.limit(0).select(
            "key",
            F.lit(0).cast("long").alias("q_ppm"),
            F.lit(0).cast("long").alias("n"),
            F.col("v").alias("quantile_value"),
        )
    mn, mx = float(bounds.mn), float(bounds.mx)
    span = (mx - mn) or 1.0
    pid = F.least(
        F.lit(n - 1),
        F.floor((F.col("v") - F.lit(mn)) / F.lit(span) * n).cast("int"),
    )
    ranged = rows.withColumn("__pid", pid)
    w_local = (
        Window.partitionBy("__pid", "key")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("__cum", F.sum("w").over(w_local))
    counts = ranged.groupBy("__pid", "key").agg(
        F.sum("w").cast("long").alias("__cnt")
    )
    w_off = (
        Window.partitionBy("key").orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).cast("long")
    ).select("__pid", "key", "__off")
    totals = counts.groupBy("key").agg(F.sum("__cnt").cast("long").alias("n"))
    qs = spark.createDataFrame([(int(q),) for q in q_ppms], "q_ppm long")
    # rank interval of each collapsed value: (lo, hi] in the key's
    # global weighted order
    positioned = (
        local.join(offsets, ["__pid", "key"])
        .join(totals, "key")
        .select(
            "key", "v", "n",
            (F.col("__off") + F.col("__cum") - F.col("w")).alias("__lo"),
            (F.col("__off") + F.col("__cum")).alias("__hi"),
        )
    )
    target = F.expr("q_ppm * (n - 1) DIV 1000000") + F.lit(1)
    return (
        positioned.join(F.broadcast(qs))
        .filter((F.col("__lo") < target) & (target <= F.col("__hi")))
        .select("key", "q_ppm", "n", F.col("v").alias("quantile_value"))
    )


def mad_outliers(
    df: DataFrame,
    id_col: str,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Robust per-key anomaly flags via the modified z-score
    (Iglewicz & Hoaglin 1993): ``M = 0.6745 * (v - median) / MAD``,
    flagged when ``|M| > 3.5``. Median and MAD (median absolute
    deviation) both come from :func:`grouped_quantiles_exact` — the
    skew-safe exact path — so the two statistics are actual data
    values and every float step (one subtraction, one constant
    multiply, one division, one abs, one compare, in that pinned
    order) replays identically in any IEEE engine. A key whose MAD is
    zero (over half its readings identical) degenerates to flagging
    any deviation at all, sidestepping the division.

    NULL values are ignored. Returns (id, key, v, median, mad,
    is_outlier) for every non-null input row.
    """
    vals = df.select(
        F.col(id_col).alias("id"),
        F.col(key_col).alias("key"),
        F.col(value_col).alias("v"),
    ).filter(F.col("v").isNotNull())
    med = grouped_quantiles_exact(vals, "key", "v", q_ppms=[500_000]).select(
        "key", F.col("quantile_value").alias("median")
    )
    dev = vals.join(med, "key").withColumn(
        "d", F.abs(F.col("v") - F.col("median"))
    )
    mad = grouped_quantiles_exact(dev, "key", "d", q_ppms=[500_000]).select(
        "key", F.col("quantile_value").alias("mad")
    )
    out = dev.join(mad, "key")
    flag = F.when(
        F.col("mad") == 0.0, F.abs(F.col("v") - F.col("median")) > 0.0
    ).otherwise(
        F.abs(F.lit(0.6745) * (F.col("v") - F.col("median")) / F.col("mad"))
        > F.lit(3.5)
    )
    return out.select(
        "id", "key", "v", "median", "mad", flag.alias("is_outlier")
    )


def histogram_sketch(
    df: DataFrame,
    key_col: str,
    value_col: str,
    bins: int = 256,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Fixed-grid histogram sketch: per key, at most ``bins`` rows of
    (bucket, count) over a GLOBAL value grid — the mergeable sibling
    of the exact two-phase quantiles above. Counts sum cell-wise, so
    per-partition sketches combine in the partial/final aggregate AND
    the same plan is a valid streaming aggregate (bins rows of state
    per key at any feed length), exactly like the CMS/HLL sketches.
    Quantile answers from it are off by at most one bin width — a
    KNOWN, value-scale error bound, where rank-based sketches bound
    rank error instead. Bucketing is floor() of IEEE-double
    arithmetic on selection-exact bounds, so every cell replays in
    the oracle. Null values are excluded.

    CLAMPING CAVEAT: values outside a SUPPLIED ``[lo, hi]`` are
    clamped into the edge buckets 0 / bins-1 (by the least/greatest
    guards below). When the bounds were trained on an earlier
    snapshot (the streaming use — streams.py's
    ``streaming_histogram_sketch``), drifted out-of-range values pile
    silently into the edge cells and the one-bin-width quantile bound
    NO LONGER HOLDS for quantiles that land there. Callers who feed
    fixed bounds should monitor :func:`histogram_clamped_counts` on
    the same (df, bounds) and re-train the grid when it reports
    clamped rows. (Defaulted bounds are the data's own min/max, so
    nothing clamps.)

    Returns (key, bucket, cnt); bounds default to the global min/max
    (two driver scalars, one aggregate pass).
    """
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull()).select(
        F.col(key_col).alias("key"), v.alias("__v")
    )
    if lo is None or hi is None:
        row = base.agg(
            F.min("__v").alias("lo"), F.max("__v").alias("hi")
        ).collect()[0]
        lo = float(row.lo) if lo is None else lo
        hi = float(row.hi) if hi is None else hi
    if hi > lo:
        bucket = F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0).cast("long"),
                F.floor(
                    ((F.col("__v") - F.lit(lo)) * F.lit(bins)) / F.lit(hi - lo)
                ),
            ),
        )
    else:
        bucket = F.lit(0).cast("long")
    return (
        base.select("key", bucket.alias("bucket"))
        .groupBy("key", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_clamped_counts(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lo: float,
    hi: float,
) -> DataFrame:
    """Overflow indicator for :func:`histogram_sketch` under FIXED
    bounds: per key, how many non-null values fell outside ``[lo,
    hi]`` and were therefore clamped into the edge buckets. Zero
    means the sketch's one-bin-width quantile bound holds; a non-zero
    count means the grid is stale for that key (re-train the bounds).
    Same one-aggregate shape as the sketch itself — mergeable, and
    valid as a streaming aggregate.

    Returns (key, n_below, n_above).
    """
    v = F.col(value_col).cast("double")
    return (
        df.filter(v.isNotNull())
        .select(F.col(key_col).alias("key"), v.alias("__v"))
        .groupBy("key")
        .agg(
            F.sum(F.when(F.col("__v") < F.lit(lo), 1).otherwise(0))
            .cast("long")
            .alias("n_below"),
            F.sum(F.when(F.col("__v") > F.lit(hi), 1).otherwise(0))
            .cast("long")
            .alias("n_above"),
        )
    )


def histogram_quantile(
    sketch: DataFrame,
    q_ppms: list[int],
    bins: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """Quantiles from a histogram sketch: for each q (in parts per
    million — integer, so the target rank ``(q_ppm * n + 999999) DIV
    1e6`` is exact in any engine), the smallest bucket whose
    cumulative count reaches the rank, reported as that bucket's
    UPPER edge — within one bin width of the true quantile. The
    cumulative window runs over <= ``bins`` rows per key (bounded
    groups, never a key's history).

    Returns (key, q_ppm, est) with est rounded to 6 places.
    """
    cum = sketch.select(
        "key",
        "bucket",
        "cnt",
        F.sum("cnt")
        .over(
            Window.partitionBy("key")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("cum"),
        F.sum("cnt").over(Window.partitionBy("key")).alias("n"),
    )
    qdf = cum.sparkSession.createDataFrame(
        [(int(q),) for q in q_ppms], "q_ppm long"
    )
    target = F.expr("CAST((q_ppm * n + 999999) DIV 1000000 AS BIGINT)")
    picked = (
        cum.crossJoin(F.broadcast(qdf))
        .groupBy("key", "q_ppm")
        .agg(
            F.min(F.when(F.col("cum") >= target, F.col("bucket"))).alias("__b")
        )
    )
    est = F.round(
        F.lit(lo) + ((F.col("__b") + 1) * F.lit(hi - lo)) / F.lit(bins), 6
    )
    return picked.select("key", "q_ppm", est.alias("est"))


def histogram_drift(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    value_col: str,
    bins: int = 64,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Distribution drift between two snapshots, per key: total
    variation distance ``TVD = sum |p_b - q_b| / 2`` over the shared
    fixed grid of :func:`histogram_sketch`. TVD instead of KL: pure
    ratio arithmetic (no libm log whose last-ulp behavior is not
    engine-portable — the same reason bm25 scores rationally), robust
    to empty bins (KL needs smoothing), and bounded [0, 1] so a drift
    threshold means the same thing for every key. This is the
    data-pipeline monitor shape: two sketch aggregates (mergeable,
    streamable) + one bins-bounded merge per key — never a row-level
    join between snapshots.

    Bounds default to the min/max over BOTH snapshots (the grid must
    be shared or the distance is meaningless). A key present in only
    one snapshot surfaces with a NULL count on the missing side (and
    a NULL tvd, since p/0 is undefined) — callers treat that as
    maximal drift; it is kept distinct from a computed 1.0.

    Returns (key, n_old, n_new, tvd) — tvd rounded to 6 places.
    """
    if lo is None or hi is None:
        both = old.select(F.col(value_col).cast("double").alias("__v")).unionByName(
            new.select(F.col(value_col).cast("double").alias("__v"))
        ).filter(F.col("__v").isNotNull())
        row = both.agg(F.min("__v").alias("lo"), F.max("__v").alias("hi")).collect()[0]
        lo = float(row.lo) if lo is None else lo
        hi = float(row.hi) if hi is None else hi
    a = histogram_sketch(old, key_col, value_col, bins=bins, lo=lo, hi=hi)
    b = histogram_sketch(new, key_col, value_col, bins=bins, lo=lo, hi=hi)
    na = a.groupBy("key").agg(F.sum("cnt").alias("n_old"))
    nb = b.groupBy("key").agg(F.sum("cnt").alias("n_new"))
    cells = (
        a.select("key", "bucket", F.col("cnt").alias("cnt_old"))
        .join(
            b.select("key", "bucket", F.col("cnt").alias("cnt_new")),
            ["key", "bucket"],
            "full_outer",
        )
        .join(na, "key", "left")
        .join(nb, "key", "left")
        .select(
            "key",
            "n_old",
            "n_new",
            (
                F.coalesce("cnt_old", F.lit(0)).cast("double") / F.col("n_old")
                - F.coalesce("cnt_new", F.lit(0)).cast("double") / F.col("n_new")
            ).alias("__d"),
        )
    )
    folded = cells.groupBy("key", "n_old", "n_new").agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.abs(F.col("__d")))),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.lit(2.0),
            6,
        ).alias("__tvd")
    )
    # a one-sided key has every |p-q| cell NULL (division by the NULL
    # side's n); collect_list silently DROPS nulls and the fold's 0.0
    # init would then read as "zero drift" — gate the fold on both
    # counts being present so the documented NULL-tvd contract holds
    return folded.select(
        "key",
        "n_old",
        "n_new",
        F.when(
            F.col("n_old").isNotNull() & F.col("n_new").isNotNull(),
            F.col("__tvd"),
        ).alias("tvd"),
    )
