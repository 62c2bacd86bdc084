"""Time-series operators over event streams: hypertable-style
time-bucket rollups with gap filling, and ordered-sequence funnel
analysis.

The reference's pipelines are batch rebuilds, but its event-shaped
inputs (match calculations logged per protein, release-over-release
counters) motivate the two classic operations every metrics store
needs and Spark lacks as built-ins: ``time_bucket_gapfill + locf``
(TimescaleDB's names for "regularize an irregular series and carry
the last observation forward") and step-funnel attribution ("of the
users who did A, how many later did B, then C").

Both are expressed as compositions of built-in DataFrame ops — no
UDFs — so Catalyst keeps them in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import owned_persist


def gapfill_locf(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket_seconds: int = 3600,
    chunk: int = 16384,
) -> DataFrame:
    """Regularize an irregular per-key series onto a fixed time grid
    and fill the gaps by carrying the last observation forward
    (TimescaleDB ``time_bucket_gapfill`` + ``locf``).

    ``ts_col`` must be epoch-NANOS LONG (the catalog's normalized
    event-time unit, sources/catalog.py::normalize_event_ts);
    bucketing is exact integer division, never float (nanos overflow
    a double's 2^53 mantissa).

    Per (key, bucket) the *last* observation wins — ``max_by`` on the
    (ts, id) tuple, so same-bucket ties are broken by the unique event
    id and both engines agree. The grid spans each key's own observed
    [min_bucket, max_bucket] range (no global range assumption);
    missing buckets are synthesized with ``sequence`` + ``explode``
    and filled with a TWO-PHASE last-observation carry. The first grid
    row per key is an observation by construction, so ``value_filled``
    is never null.

    Scale: the grid is synthesized in fixed-size chunks (no row holds
    more than ``chunk`` sequence elements, no range assumption beyond
    ``chunk**2`` buckets per key), and the LOCF carry is two-phase so
    NO window partition ever holds a key's whole grid: phase 1 fills
    within each (key, chunk) — at most ``chunk`` rows per window group
    — and phase 2 carries across chunk boundaries via a per-(key,
    chunk) summary window (one row per chunk) joined back. Every
    stage hashes on (key) or (key, chunk); a 10^6-bucket key fans out
    over ~range/chunk tasks instead of one.

    Returns (key, bucket_start_s, observed, n_obs, value_filled).
    """
    bucket = F.expr(f"`{ts_col}` DIV {bucket_seconds * 1_000_000_000}")
    obs = (
        events.select(
            F.col(key_col).alias("key"),
            bucket.alias("bucket"),
            F.col(value_col).alias("v"),
            F.col(ts_col).alias("__ts"),
            F.col(id_col).alias("__id"),
        )
        .groupBy("key", "bucket")
        .agg(
            F.max_by("v", F.struct("__ts", "__id")).alias("v"),
            F.count(F.lit(1)).cast("long").alias("n_obs"),
        )
    )
    # two-level chunked grid synthesis: exploding sequence(mn, mx)
    # directly would materialize a key's WHOLE bucket range as one
    # array row (a mis-parameterized call — 1s buckets over years —
    # is a 10^8-element row). Explode coarse chunks first, then the
    # fine sequence within each chunk: no row holds more than
    # max(range/C, C) elements, bounded for any range <= C^2 buckets.
    # Chunk ids use FLOOR division (`DIV` truncates toward zero, which
    # for a negative min bucket — pre-1970 event times — would start
    # the enumeration one chunk too high and silently drop every
    # bucket in [mn, -1] outside the truncated first chunk; pmod is
    # non-negative, so mn - pmod(mn, chunk) is the floor multiple).
    spans = obs.groupBy("key").agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    grid = (
        spans.select(
            "key", "mn", "mx",
            F.explode(
                F.sequence(
                    F.expr(f"(mn - pmod(mn, {chunk})) DIV {chunk}"),
                    F.expr(f"(mx - pmod(mx, {chunk})) DIV {chunk}"),
                )
            ).alias("__c"),
        )
        .select(
            "key",
            "__c",
            F.explode(
                F.sequence(
                    F.greatest(F.col("mn"), F.col("__c") * chunk),
                    F.least(F.col("mx"), (F.col("__c") + 1) * chunk - 1),
                )
            ).alias("bucket"),
        )
    )
    joined = grid.join(obs, ["key", "bucket"], "left")
    # two-phase LOCF: (1) carry within each (key, chunk) — window
    # groups are <= chunk rows by construction; (2) per-chunk summary
    # (the intra-chunk fill at the chunk's last bucket IS the chunk's
    # last observation, null when it saw none), carried across chunks
    # by a window over ONE ROW PER CHUNK, joined back to fill
    # chunk-leading nulls. No partition ever holds a key's full grid.
    w1 = (
        Window.partitionBy("key", "__c")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.withColumn(
        "__f1", F.last("v", ignorenulls=True).over(w1)
    )
    summary = filled.groupBy("key", "__c").agg(
        # max_by skips null ORDERING keys, so unobserved rows never win
        F.max_by(
            "__f1", F.when(F.col("__f1").isNotNull(), F.col("bucket"))
        ).alias("__cl")
    )
    wc = (
        Window.partitionBy("key")
        .orderBy("__c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summary.select(
        "key",
        "__c",
        F.last("__cl", ignorenulls=True).over(wc).alias("__carry"),
    )
    return filled.join(carry, ["key", "__c"]).select(
        "key",
        (F.col("bucket") * bucket_seconds).cast("long").alias("bucket_start_s"),
        F.col("v").isNotNull().alias("observed"),
        F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
        F.coalesce("__f1", "__carry").alias("value_filled"),
    )


def funnel_steps(
    events: DataFrame,
    steps: tuple[str, ...] = ("signup", "view", "click", "purchase"),
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-step funnel: for each key, how far did it get through
    ``steps``, requiring each step to occur STRICTLY AFTER the
    earliest qualifying occurrence of the previous step (the standard
    product-analytics funnel; an event at the exact same timestamp as
    the previous step's completion does not advance the funnel).

    Per step k the completion time is the minimum ``ts`` among events
    of that type later than step k-1's completion time — a chain of
    filtered per-key min aggregates joined on the key, never a
    per-key ordered scan. ``ts_col`` is epoch-NANOS LONG (the
    catalog's normalized unit); ``ms_to_convert`` divides the nanos
    delta by 1e6 with exact integer division.

    Scale: each stage is ``filter(type) -> groupBy(key).min`` —
    map-side partial aggregation shrinks every stage to one row per
    key before its shuffle, and the k-1 inner joins all hash on the
    same key (AQE handles skewed keys). k is the funnel length
    (constant, single digits); nothing in the plan groups an
    unbounded event set into one task.

    Returns (key, steps_completed, converted, ms_to_convert) with
    ``ms_to_convert = -1`` for keys that never completed the funnel.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    base = events.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    )
    reached = (
        base.filter(F.col("etype") == steps[0])
        .groupBy("key")
        .agg(F.min("ts").alias("t0"))
    )
    cur = reached
    for i, step in enumerate(steps[1:], start=1):
        prev_t = f"t{i - 1}"
        cur = (
            base.filter(F.col("etype") == step)
            .join(cur.select("key", F.col(prev_t).alias("__prev")), "key")
            .filter(F.col("ts") > F.col("__prev"))
            .groupBy("key")
            .agg(F.min("ts").alias(f"t{i}"))
        )
        reached = reached.join(cur, "key", "left")
    all_keys = base.select("key").distinct()
    # steps_completed = highest k with t_{k-1} non-null (t columns fill
    # front-to-back by construction, so the presence-flag sum is the
    # funnel depth)
    presence = [
        F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
        for i in range(len(steps))
    ]
    last_t = f"t{len(steps) - 1}"
    return (
        all_keys.join(reached, "key", "left")
        .select(
            "key",
            sum(presence[1:], presence[0]).cast("long").alias("steps_completed"),
            F.col(last_t).isNotNull().alias("converted"),
            F.when(
                F.col(last_t).isNotNull(),
                F.expr(f"(`{last_t}` - t0) DIV 1000000"),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("ms_to_convert"),
        )
    )


def ohlc_bars(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Candlestick rollup: per (key, time bucket) the open / high /
    low / close of ``value_col`` plus the event count — the other
    classic hypertable aggregate next to :func:`gapfill_locf`.

    Open and close are ``min_by`` / ``max_by`` on the (ts, id) tuple —
    the unique event id breaks same-instant ties so every engine picks
    the same row. ``ts_col`` is epoch-NANOS LONG (catalog unit); all
    outputs except the value columns are exact integers, and the value
    columns are selections (never sums), so no float-accumulation
    order can differ.

    Scale: one map-side-partial hash aggregate on (key, bucket) — the
    natural rollup grain — and nothing else. AQE-splittable, no
    windows, no per-key serialization.

    Returns (key, bucket_start_s, open, high, low, close, n_events).
    """
    bucket = F.expr(f"`{ts_col}` DIV {bucket_seconds * 1_000_000_000}")
    pos = F.struct(F.col(ts_col), F.col(id_col))
    return (
        events.groupBy(
            F.col(key_col).alias("key"), bucket.alias("__bucket")
        )
        .agg(
            F.min_by(value_col, pos).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, pos).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select(
            "key",
            (F.col("__bucket") * bucket_seconds).cast("long").alias("bucket_start_s"),
            "open", "high", "low", "close", "n_events",
        )
    )


def time_weighted_avg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average per key under LOCF interpolation
    (TimescaleDB ``time_weight('LOCF', ...)`` semantics): each
    observation holds its value until the next one, so the average is
    ``Σ value_i * (ts_{i+1} - ts_i) / (ts_last - ts_first)``. Keys
    with fewer than two observations have no spanned time and are
    omitted.

    Determinism: the float segment products sum through
    ``functions/folds.py::ordered_fold_sum`` — the two-level pinned
    fold — so the accumulation order is engine-replayable AND no task
    ever materializes a hot key's full history as one array. The
    per-key ordering (lead + row_number share ONE window on
    (ts, id)) is the same per-key sequence shape as sessionization
    (W3): a window group is one key's event history.

    Returns (key, n_segments, span_ns, twa).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    segs = (
        events.select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("__ts"),
            F.col(value_col).alias("__v"),
            F.col(id_col).alias("__id"),
        )
        .select(
            "key", "__ts", "__v",
            F.row_number().over(
                Window.partitionBy("key").orderBy("__ts", "__id")
            ).alias("__seq"),
            F.lead("__ts").over(
                Window.partitionBy("key").orderBy("__ts", "__id")
            ).alias("__nxt"),
        )
        .filter(F.col("__nxt").isNotNull())
        .select(
            "key", "__seq",
            (F.col("__v") * (F.col("__nxt") - F.col("__ts"))).alias("__contrib"),
        )
    )
    from ..functions.folds import ordered_fold_sum

    folded = ordered_fold_sum(
        segs, ["key"], "__seq", "__contrib",
        out_col="__integral", count_col="n_segments",
    )
    span = events.groupBy(F.col(key_col).alias("key")).agg(
        (F.max(ts_col) - F.min(ts_col)).cast("long").alias("span_ns")
    )
    return folded.join(span, "key").select(
        "key",
        "n_segments",
        "span_ns",
        (F.col("__integral") / F.col("span_ns").cast("double")).alias("twa"),
    )


def cohort_retention(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_seconds: int = 7 * 86400,
) -> DataFrame:
    """Cohort retention matrix: assign each key to the cohort of its
    first-activity bucket (week by default), then for every
    (cohort, offset) cell count how many of that cohort's keys were
    active ``offset`` buckets after joining — the standard
    product-analytics triangle.

    ``retention_ppm = n_active * 1e6 DIV cohort_size`` — exact integer
    division, engine-agnostic. ``ts_col`` is epoch-NANOS LONG.

    Scale: activity first collapses to distinct (key, bucket) — one
    hash aggregate bounded by keys x buckets — then cohorts are a
    key-grain min aggregate; the cell count joins activity to cohorts
    on the key (AQE-splittable) and aggregates on (cohort, offset),
    whose cardinality is buckets^2/2. Cohort sizes broadcast back.
    No windows anywhere.

    Returns (cohort_bucket_s, week_offset, n_active, cohort_size,
    retention_ppm).
    """
    bucket = F.expr(f"`{ts_col}` DIV {bucket_seconds * 1_000_000_000}")
    active = (
        events.select(F.col(key_col).alias("key"), bucket.alias("wk"))
        .distinct()
    )
    cohort = active.groupBy("key").agg(F.min("wk").alias("cwk"))
    sizes = cohort.groupBy("cwk").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    cells = (
        active.join(cohort, "key")
        .groupBy("cwk", (F.col("wk") - F.col("cwk")).alias("week_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return cells.join(F.broadcast(sizes), "cwk").select(
        (F.col("cwk") * bucket_seconds).cast("long").alias("cohort_bucket_s"),
        F.col("week_offset").cast("long"),
        "n_active",
        "cohort_size",
        F.expr("n_active * 1000000 DIV cohort_size").alias("retention_ppm"),
    )


def ewma(
    events: DataFrame,
    alpha_ppm: int = 200_000,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    chunk_seconds: int = 21_600,
) -> DataFrame:
    """Per-event exponentially weighted moving average — the
    time-decayed score every monitoring/trending pipeline keeps
    (zero-initialized convention, the biased first-moment estimate of
    Kingma & Ba 2015: ``s_0 = 0; s_t = a*x_t + (1-a)*s_{t-1}`` over
    each key's events ordered by (ts, id); ``a = alpha_ppm / 1e6``).
    Null values are excluded (they would poison the fold).

    Scale shape — NO whole-key window or whole-key array anywhere:
    the recurrence is affine, so a time chunk composes as
    ``s_out = A*s_in + B`` with ``A = (1-a)^n`` and ``B`` the chunk's
    own zero-started fold. Phase 1 folds each (key, time-chunk) group
    (arrays bounded by event rate x chunk_seconds); phase 2 carries
    chunk summaries per key (one ROW per chunk — bounded by
    retention/chunk, same shape as gapfill_locf's carry); phase 3
    replays the in-chunk elementwise fold from the carried ``s_in``
    and emits one row per event. Both engines run the IDENTICAL
    operation order (carries via A*s_in + B, rows via elementwise
    folds), so the doubles match bit-for-bit before the 6-place
    output round — the ordered_fold_sum replay discipline.

    Returns (key, ts_ns, event_id, ewma).
    """
    a = alpha_ppm / 1e6
    one_m = 1.0 - a
    chunk_ns = chunk_seconds * 1_000_000_000
    e = events.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.expr(f"`{ts_col}` DIV {chunk_ns}").alias("__c"),
        F.struct(
            F.col(ts_col).alias("tsn"),
            F.col(id_col).alias("id"),
            F.col(value_col).cast("double").alias("x"),
        ).alias("ev"),
    )
    # g feeds BOTH the chunk-summary branch and the row-replay join;
    # persist so the collect_list aggregation and sort run once (the
    # scan+shuffle would be shared by ReuseExchange, the fold would
    # not). Lifetime outlives this call — owned_persist registers it
    # for release by the consumer's engine_cache_scope.
    g = owned_persist(
        e.groupBy("key", "__c").agg(
            F.array_sort(F.collect_list("ev")).alias("arr")
        )
    )
    al, om = F.lit(a), F.lit(one_m)
    summ = g.select(
        "key",
        "__c",
        F.aggregate("arr", F.lit(1.0), lambda acc, _ev: acc * om).alias("A"),
        F.aggregate(
            "arr", F.lit(0.0), lambda acc, ev: al * ev["x"] + om * acc
        ).alias("B"),
    )
    chain = summ.groupBy("key").agg(
        F.array_sort(F.collect_list(F.struct("__c", "A", "B"))).alias("chs")
    ).withColumn(
        "pref",
        F.aggregate(
            "chs",
            F.expr("array(CAST(0.0 AS DOUBLE))"),
            lambda acc, ch: F.concat(
                acc, F.array(ch["A"] * F.element_at(acc, -1) + ch["B"])
            ),
        ),
    )
    carries = chain.select(
        "key",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("chs")),
                lambda i: F.struct(
                    F.element_at(F.col("chs"), i).getField("__c").alias("__c"),
                    F.element_at(F.col("pref"), i).alias("s_in"),
                ),
            )
        ).alias("cs"),
    ).select("key", F.col("cs.__c").alias("__c"), F.col("cs.s_in").alias("s_in"))
    rows = g.join(carries, ["key", "__c"]).withColumn(
        "__pref",
        F.aggregate(
            "arr",
            F.array(F.col("s_in")),
            lambda acc, ev: F.concat(
                acc, F.array(al * ev["x"] + om * F.element_at(acc, -1))
            ),
        ),
    )
    return rows.select(
        "key",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("arr")),
                lambda i: F.struct(
                    F.element_at(F.col("arr"), i).getField("tsn").alias("ts_ns"),
                    F.element_at(F.col("arr"), i).getField("id").alias("event_id"),
                    F.round(F.element_at(F.col("__pref"), i + 1), 6).alias("ewma"),
                ),
            )
        ).alias("r"),
    ).select(
        "key",
        F.col("r.ts_ns").cast("long").alias("ts_ns"),
        F.col("r.event_id").cast("long").alias("event_id"),
        F.col("r.ewma").alias("ewma"),
    )
