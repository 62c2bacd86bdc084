"""Catalog entries for the time-series operator family
(operators/timeseries.py) and sparse lexical retrieval
(operators/retrieval.py): OHLC bars, time-weighted average, cohort
retention, BM25 top-k. Every entry carries a full DuckDB value
oracle; the float paths are either pure selections (OHLC), pinned
folds (TWA), or integer-exact PPM arithmetic (BM25), so the byte
differ applies everywhere.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions.folds import ordered_fold_oracle_cte  # noqa: F401 (pattern ref)
from ..operators.retrieval import bm25_topk
from ..operators.timeseries import cohort_retention, ohlc_bars, time_weighted_avg
from .spec import QuerySpec, register, t

# (qid, term) probes drawn from the fixture vocabulary — broadcast
# side of the inverted-index join, matching a decontamination-audit
# shape (eval queries vs a training corpus)
BM25_QUERIES: list[tuple[int, str]] = [
    (0, "hash"), (0, "merge"),
    (1, "table"), (1, "scan"),
    (2, "window"), (2, "sort"), (2, "batch"),
]


def _bm25(spark: SparkSession, sf: str):
    q = spark.createDataFrame(BM25_QUERIES, "qid long, term string")
    return bm25_topk(t(spark, sf, "documents"), q, k=10)


register(QuerySpec(
    name="bm25_topk",
    tags=("TX7", "J2", "A1", "O5"),
    description="BM25 top-10 per query over an inverted-index join "
    "(operators/retrieval.py::bm25_topk): integer-exact PPM scoring "
    "(rational idf, milli-cleared tf normalization — no libm ln), "
    "vocabulary-sized df aggregate, broadcast query terms, two-stage "
    "bucketed top-k so no task holds a corpus-sized query group. "
    "Oracle replays the exact int64 products and single double "
    "divisions.",
    build=_bm25,
    oracle="""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ),
        stats AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(len(ts)) * 1000 // count(*) AS avgdl_m
          FROM toks
        ),
        tf AS (
          SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl, g.term,
                 CAST(count(*) AS BIGINT) AS tf
          FROM toks, LATERAL unnest(ts) AS g(term)
          GROUP BY 1, 2, 3
        ),
        dfb AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        q(qid, term) AS (
          VALUES (0, 'hash'), (0, 'merge'), (1, 'table'), (1, 'scan'),
                 (2, 'window'), (2, 'sort'), (2, 'batch')
        ),
        m AS (
          SELECT q.qid, tf.doc_id,
                 CAST(floor(1000000.0
                   * CAST(2 * n - 2 * df + 1 AS DOUBLE)
                   / CAST(2 * df + 1 AS DOUBLE)) AS BIGINT) AS idf_ppm,
                 CAST(floor(1000000.0
                   * CAST(tf * 2200000 * avgdl_m AS DOUBLE)
                   / CAST(tf * 1000000 * avgdl_m + 300000 * avgdl_m
                          + 900000 * dl * 1000 AS DOUBLE)) AS BIGINT) AS tfn_ppm
          FROM q JOIN dfb USING (term) JOIN tf USING (term), stats
        ),
        sc AS (
          SELECT qid, doc_id, CAST(count(*) AS BIGINT) AS n_terms_matched,
                 CAST(sum(tfn_ppm * idf_ppm) AS BIGINT) AS score_ppm
          FROM m GROUP BY 1, 2
        )
        SELECT CAST(qid AS BIGINT) AS qid,
               CAST(row_number() OVER (
                 PARTITION BY qid ORDER BY score_ppm DESC, doc_id
               ) AS INT) AS rank,
               doc_id, n_terms_matched, score_ppm
        FROM sc
        QUALIFY rank <= 10
    """,
))


register(QuerySpec(
    name="z_ohlc_bars",
    tags=("TS3", "A6", "A7"),
    description="Daily OHLC candlesticks per user "
    "(operators/timeseries.py::ohlc_bars): open/close via min_by/"
    "max_by on the (ts, event_id) tuple (unique-id tiebreak), "
    "high/low/count in the same single map-side-partial hash "
    "aggregate. All outputs are selections or exact integers — no "
    "float accumulation.",
    build=lambda spark, sf: ohlc_bars(t(spark, sf, "events")),
    oracle="""
        SELECT user_id AS key,
               epoch_ns(ts) // 86400000000000 * 86400 AS bucket_start_s,
               first(value ORDER BY ts, event_id) AS open,
               max(value) AS high,
               min(value) AS low,
               last(value ORDER BY ts, event_id) AS close,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY 1, 2
    """,
))


register(QuerySpec(
    name="z_time_weighted_avg",
    tags=("TS4", "W4", "F9"),
    description="LOCF time-weighted average per user "
    "(operators/timeseries.py::time_weighted_avg, TimescaleDB "
    "time_weight semantics): segment integrals value*(t_next - t) "
    "summed through the two-level pinned fold "
    "(functions/folds.py::ordered_fold_sum) so the double "
    "accumulation is engine-replayable and hub-safe; divided by the "
    "key's observed span. Keys with one event are omitted. Oracle "
    "replays the identical bucket fold.",
    build=lambda spark, sf: time_weighted_avg(t(spark, sf, "events")),
    oracle="""
        WITH segs AS (
          SELECT user_id AS key,
                 row_number() OVER w AS seq,
                 value * (lead(epoch_ns(ts)) OVER w - epoch_ns(ts)) AS contrib
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s2 AS (SELECT key, seq, contrib FROM segs WHERE contrib IS NOT NULL),
        folded AS (
          SELECT key,
                 list_reduce(list_prepend(0.0::DOUBLE, list(fs ORDER BY fb)),
                             (a, b) -> a + b) AS integral,
                 CAST(sum(n) AS BIGINT) AS n_segments
          FROM (
            SELECT key, seq % 64 AS fb,
                   list_reduce(list_prepend(0.0::DOUBLE,
                                            list(contrib ORDER BY seq)),
                               (a, b) -> a + b) AS fs,
                   count(*) AS n
            FROM s2 GROUP BY key, seq % 64
          ) GROUP BY key
        ),
        span AS (
          SELECT user_id AS key,
                 epoch_ns(max(ts)) - epoch_ns(min(ts)) AS span_ns
          FROM events GROUP BY 1
        )
        SELECT f.key, n_segments, CAST(span_ns AS BIGINT) AS span_ns,
               integral / CAST(span_ns AS DOUBLE) AS twa
        FROM folded f JOIN span USING (key)
    """,
))


register(QuerySpec(
    name="z_cohort_retention",
    tags=("TS5", "A2", "J2"),
    description="Weekly cohort retention triangle "
    "(operators/timeseries.py::cohort_retention): cohort = first-"
    "activity week per user, cells = distinct-active counts at each "
    "week offset, retention as exact integer PPM division. Distinct "
    "activity and cohort assignment are hash aggregates; sizes "
    "broadcast back; no windows.",
    build=lambda spark, sf: cohort_retention(t(spark, sf, "events")),
    oracle="""
        WITH active AS (
          SELECT DISTINCT user_id AS key,
                 epoch_ns(ts) // 604800000000000 AS wk
          FROM events
        ),
        cohort AS (SELECT key, min(wk) AS cwk FROM active GROUP BY 1),
        sizes AS (
          SELECT cwk, CAST(count(*) AS BIGINT) AS cohort_size
          FROM cohort GROUP BY 1
        ),
        cells AS (
          SELECT c.cwk, a.wk - c.cwk AS week_offset,
                 CAST(count(*) AS BIGINT) AS n_active
          FROM active a JOIN cohort c USING (key)
          GROUP BY 1, 2
        )
        SELECT cwk * 604800 AS cohort_bucket_s,
               CAST(week_offset AS BIGINT) AS week_offset,
               n_active, cohort_size,
               n_active * 1000000 // cohort_size AS retention_ppm
        FROM cells JOIN sizes USING (cwk)
    """,
))


def _trailing_rate(spark: SparkSession, sf: str):
    from pyspark.sql.window import Window

    ev = t(spark, sf, "events")
    HOUR_NS = 3_600_000_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(-HOUR_NS, Window.currentRow)
    )
    return ev.select(
        "event_id",
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").alias("ts_ns"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_trailing_1h"),
        F.max("value").over(w).alias("max_value_1h"),
        F.min("value").over(w).alias("min_value_1h"),
    )


register(QuerySpec(
    name="z_trailing_rate_window",
    tags=("W5", "W2"),
    description="Trailing-hour sliding aggregates per event via a "
    "RANGE frame on the epoch-nanos order key (the value-based frame "
    "the rest of the window family doesn't cover): count plus "
    "max/min selections — no float accumulation, so the frame "
    "contents alone determine every output. The frame is defined by "
    "VALUES, so same-ts ties resolve identically in any engine. "
    "Window group = one user's history (sessionize precedent).",
    build=_trailing_rate,
    oracle="""
        SELECT event_id,
               user_id,
               epoch_ns(ts) AS ts_ns,
               CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
               max(value) OVER w AS max_value_1h,
               min(value) OVER w AS min_value_1h
        FROM events
        WINDOW w AS (
          PARTITION BY user_id ORDER BY epoch_ns(ts)
          RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW
        )
    """,
))


def _pit_enrichment(spark: SparkSession, sf: str):
    from ..operators.cdc import scd2_history
    from ..operators.joins import as_of_join

    ev = t(spark, sf, "events")
    hist = scd2_history(
        ev, keys=["user_id"], order_col="ts", tiebreak_col="event_id",
        tracked=["event_type"],
    )
    probes = ev.select(
        "event_id", "user_id", F.expr("ts DIV 1000000").alias("probe_ms")
    )
    out = as_of_join(
        probes, hist, ["user_id"], "probe_ms", "valid_from_ms",
        ["version", "event_type"], tiebreak="version",
    )
    return out.select(
        "event_id", "user_id", "probe_ms",
        F.col("version_asof").alias("version"),
        F.col("event_type_asof").alias("type_at"),
    )


register(QuerySpec(
    name="z_pit_enrichment",
    tags=("CDC2", "J7"),
    description="Point-in-time dimension lookup: every event probe "
    "joined to the SCD2 version valid at its timestamp — "
    "scd2_history composed with as_of_join (backward on "
    "valid_from_ms, version tiebreak so same-millisecond versions "
    "resolve to the latest). The warehouse 'what did this row look "
    "like then' query, answered without interval theta-joins. Oracle "
    "replays the history CTE and joins on the validity interval "
    "directly.",
    build=_pit_enrichment,
    oracle="""
        WITH marked AS (
          SELECT user_id, event_id, event_type, ts,
                 lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS prev
          FROM events
        ),
        changes AS (
          SELECT user_id, event_id, event_type, ts,
                 epoch_ns(ts) // 1000000 AS from_ms
          FROM marked WHERE prev IS NULL OR prev <> event_type
        ),
        hist AS (
          SELECT user_id,
                 CAST(row_number() OVER w AS BIGINT) AS version,
                 event_type,
                 from_ms AS valid_from_ms,
                 coalesce(lead(from_ms) OVER w, -1) AS valid_to_ms
          FROM changes
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        probes AS (
          SELECT event_id, user_id, epoch_ns(ts) // 1000000 AS probe_ms
          FROM events
        )
        SELECT p.event_id, p.user_id, p.probe_ms,
               h.version, h.event_type AS type_at
        FROM probes p JOIN hist h
          ON p.user_id = h.user_id
         AND h.valid_from_ms <= p.probe_ms
         AND (h.valid_to_ms = -1 OR p.probe_ms < h.valid_to_ms)
    """,
))


def _grouped_quantiles(spark: SparkSession, sf: str):
    from ..operators.quantiles import grouped_quantiles_exact

    return grouped_quantiles_exact(
        t(spark, sf, "events"), "user_id", "value"
    ).select(
        F.col("key").cast("long").alias("key"), "q_ppm", "n", "quantile_value"
    )


register(QuerySpec(
    name="z_grouped_quantiles",
    tags=("A5", "W1", "F9"),
    description="EXACT per-key quantiles (p25/p50/p75) without a "
    "per-key sort (operators/quantiles.py::grouped_quantiles_exact): "
    "collapse to weighted distinct values (the only full shuffle), "
    "order-preserving value-range cuts from two driver scalars, "
    "local weighted prefix + per-bucket offsets = exact global rank "
    "interval, disc-interpolation pick at q_ppm*(n-1) DIV 1e6 + 1. "
    "The exact complement to the approx_percentile sketch bound "
    "(z_approx_quantile_bounds). Oracle replays rank arithmetic over "
    "a plain per-key window.",
    build=_grouped_quantiles,
    oracle="""
        WITH ranked AS (
          SELECT user_id AS key, value AS v,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY value
                 ) AS r,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM events WHERE value IS NOT NULL
        ),
        qs(q_ppm) AS (VALUES (250000), (500000), (750000))
        SELECT key, CAST(q_ppm AS BIGINT) AS q_ppm,
               CAST(n AS BIGINT) AS n, v AS quantile_value
        FROM ranked, qs
        WHERE r = q_ppm * (n - 1) // 1000000 + 1
    """,
))


def _mad_outliers(spark: SparkSession, sf: str):
    from ..operators.quantiles import mad_outliers

    return mad_outliers(t(spark, sf, "events"), "event_id", "user_id", "value")


register(QuerySpec(
    name="z_mad_outliers",
    tags=("A5", "F9"),
    description="Robust per-key anomaly flags — modified z-score "
    "0.6745*(v-median)/MAD > 3.5 (operators/quantiles.py::"
    "mad_outliers): median and MAD are exact data values from the "
    "skew-safe grouped_quantiles_exact path, so the float chain is "
    "pinned and engine-agnostic; MAD=0 keys degenerate to any-"
    "deviation flagging. Oracle replays the two rank picks and the "
    "identical expression.",
    build=_mad_outliers,
    oracle="""
        WITH vals AS (
          SELECT user_id AS key, event_id AS id, value AS v
          FROM events WHERE value IS NOT NULL
        ),
        med AS (
          SELECT key, v AS median FROM (
            SELECT key, v,
                   row_number() OVER (PARTITION BY key ORDER BY v) AS r,
                   count(*) OVER (PARTITION BY key) AS n
            FROM vals
          ) WHERE r = 500000 * (n - 1) // 1000000 + 1
        ),
        dev AS (
          SELECT vals.key, id, v, median, abs(v - median) AS d
          FROM vals JOIN med USING (key)
        ),
        mad AS (
          SELECT key, d AS mad FROM (
            SELECT key, d,
                   row_number() OVER (PARTITION BY key ORDER BY d) AS r,
                   count(*) OVER (PARTITION BY key) AS n
            FROM dev
          ) WHERE r = 500000 * (n - 1) // 1000000 + 1
        )
        SELECT id, dev.key, v, median, mad,
               CASE WHEN mad = 0.0 THEN abs(v - median) > 0.0
                    ELSE abs(0.6745 * (v - median) / mad) > 3.5
               END AS is_outlier
        FROM dev JOIN mad USING (key)
    """,
))
