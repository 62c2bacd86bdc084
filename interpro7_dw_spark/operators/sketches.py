"""Frequency-sketch operators (count-min) for corpus statistics.

Complements the membership sketch (dedup.py::bloom_bitmap) and the
cardinality/quantile sketch contracts (plans/relational2.py approx
bounds): a count-min sketch answers "how often does THIS key occur"
from fixed memory, with a one-sided error guarantee — the estimate
NEVER undercounts, and overcounts by at most ~N/w with probability
1 - (1/2)^d. That one-sidedness is what makes it compositional at
100 TB: a candidate heavy hitter can be pruned exactly (est < T =>
truly < T) before any exact pass runs.

Hash family is the engine-portable md5 arithmetic used by the Bloom
filter: row r's bucket for key x = first-8-hex-digits of
md5('<r>:' || x) mod width — any engine (and the DuckDB oracle)
replays every bucket, so estimates (collisions included) are
bit-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import owned_persist


def _bucket(key_sql: str, r: int, width: int):
    return F.expr(
        f"CAST(conv(substring(md5(CAST(concat('{r}:', {key_sql}) AS BINARY)), "
        f"1, 8), 16, 10) AS BIGINT) % {width}"
    )


def cms_build(
    keys: DataFrame,
    key_col: str = "key",
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch over a key-occurrence stream (one input row =
    one occurrence): returns the (r, bucket, cnt) counter table,
    at most ``depth * width`` rows.

    Scale: each occurrence fans out to ``depth`` map-side rows, then
    ONE aggregate with map-side partial combine — the shuffle carries
    at most depth*width rows per map partition regardless of corpus
    size, and the result is a driver-constant-sized table that
    broadcasts to any probe. This is the standard distributed-sketch
    merge property: per-partition sketches sum cell-wise, which is
    exactly what the partial/final HashAggregate pair does.
    """
    rows = [
        F.struct(F.lit(r).alias("r"), _bucket(key_col, r, width).alias("bucket"))
        for r in range(depth)
    ]
    return (
        keys.select(F.explode(F.array(*rows)).alias("rb"))
        .select(F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    query_keys: DataFrame,
    sketch: DataFrame,
    key_col: str = "key",
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for ``query_keys`` (one row per
    distinct key) against a :func:`cms_build` sketch built with the
    SAME depth/width: adds ``cms_est`` = min over the d rows of the
    counter at (r, bucket_r(key)). Guaranteed >= the true count.

    Scale: the probe computes its buckets map-side and joins the
    BROADCAST counter table on (r, bucket) — no shuffle of the probe
    stream beyond the final per-key min, which is a ``depth``-row
    group (bounded, never hot).
    """
    probes = query_keys.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("r"), _bucket(key_col, r, width).alias("bucket")
                )
                for r in range(depth)
            ])
        ).alias("rb"),
    ).select(
        *query_keys.columns,
        F.col("rb.r").alias("r"),
        F.col("rb.bucket").alias("bucket"),
    )
    hit = probes.join(F.broadcast(sketch), ["r", "bucket"], "left")
    return (
        hit.groupBy(*query_keys.columns)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cms_est"))
    )


def heavy_hitters(
    occurrences: DataFrame,
    key_col: str = "key",
    threshold: int = 100,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Heavy-hitter report: for every key whose EXACT occurrence count
    clears ``threshold``, the exact count, the count-min estimate from
    a (depth x width) sketch, and the overestimate the sketch would
    have paid at that width — the calibration query you run at small
    scale to size a sketch before pointing it at the full corpus.

    Returns (key, exact_n, cms_est, overestimate); ``cms_est >=
    exact_n`` always (the one-sided CMS guarantee).

    Cache note: persists an intermediate (via owned_persist) that
    the lazy result reuses; consumers bound its lifetime with
    ``with engine_cache_scope(): ...`` (interpro7_dw_spark/caching.py),
    as tools/differ.py and bench.py do per query.
    """
    occurrences = owned_persist(occurrences)  # feeds sketch build + exact counts
    sketch = cms_build(occurrences, key_col, depth, width)
    exact = (
        occurrences.groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .filter(F.col("exact_n") >= threshold)
    )
    est = cms_estimate(exact, sketch, key_col, depth, width)
    return est.select(
        key_col,
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).cast("long").alias("overestimate"),
    )


def _hll_cols(key_sql: str, m: int):
    """(bucket, rho) column pair for one key, engine-portable: bucket
    from the first 8 md5 hex digits, rho (leading-zero rank) decoded
    from hex digits 9..16 with STRING/INTEGER ops only — no log2/pow
    whose last-ulp behavior could differ between engines. An all-zero
    word decodes to rho = 33."""
    h = f"md5(CAST(CAST({key_sql} AS STRING) AS BINARY))"
    bucket = F.expr(
        f"CAST(conv(substring({h}, 1, 8), 16, 10) AS BIGINT) % {m}"
    )
    rho = F.expr(
        f"""
        4 * (8 - length(trim(LEADING '0' FROM substring({h}, 9, 8))))
        + CASE substring(trim(LEADING '0' FROM substring({h}, 9, 8)), 1, 1)
            WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
            WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
            ELSE 0 END
        + 1
        """
    )
    return bucket, rho


def hll_registers(
    keys: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    m: int = 128,
) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007): per group,
    at most ``m`` rows of (bucket, rho = max leading-zero rank of the
    keys hashing there). max() is the merge — per-partition register
    tables combine cell-wise, which is exactly the partial/final
    HashAggregate pair in batch AND a valid streaming aggregate
    (streaming/hll_stream.py). State is m rows per group FOREVER,
    where exact count-distinct state grows with cardinality.

    Every decode step is md5-hex string/integer arithmetic, so any
    engine (and the DuckDB oracle) replays each register exactly —
    unlike approx_count_distinct, whose internal HLL++ state is
    opaque (the z_approx_distinct_bounds contract can only check
    error envelopes; this one is value-exact).
    """
    group_cols = group_cols or []
    bucket, rho = _hll_cols(key_col, m)
    return (
        keys.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    m: int = 128,
) -> DataFrame:
    """Raw HLL cardinality estimate from a register table:
    ``alpha_m * m^2 / (sum 2^-rho + n_zero)``. Every 2^-rho term has
    a one-bit mantissa and the partial sums span < 53 bits, so the
    harmonic sum is EXACT in double — order-independent, no pinned
    fold needed — and the estimate is pure deterministic arithmetic.
    Raw estimate only (no log-based small-range correction: ln()
    last-ulp behavior is not engine-portable; n_zero is returned so
    callers can see when the raw estimate is biased).

    Returns (group..., n_zero, hll_est) — n_zero = registers never
    hit, hll_est rounded to 6 places.
    """
    group_cols = group_cols or []
    # Python-double alpha (a decimal literal inside F.expr would parse
    # as DecimalType in Spark SQL — same trap as DuckDB's DECIMAL
    # literals — and shift the estimate by an ulp vs the oracle)
    alpha = F.lit(0.7213 / (1 + 1.079 / m))
    s = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n_present"),
        F.sum(
            F.expr(
                "CAST(1 AS DOUBLE) "
                "/ CAST(shiftleft(CAST(1 AS BIGINT), rho) AS DOUBLE)"
            )
        ).alias("__s_present"),
    )
    return s.select(
        *group_cols,
        (F.lit(m) - F.col("__n_present")).cast("long").alias("n_zero"),
        F.round(
            alpha * m * m
            / (F.col("__s_present") + (F.lit(m) - F.col("__n_present")) * F.lit(1.0)),
            6,
        ).alias("hll_est"),
    )
