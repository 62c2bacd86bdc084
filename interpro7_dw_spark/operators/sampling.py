"""Deterministic corpus sampling and shard packing.

Training-data curation needs two operations the dedup/quality stack
doesn't cover: cutting a corpus DOWN to a target mix (stratified
sampling) and cutting it UP into fixed-budget shards (token packing).
Both are expressed here without RNG state — selection order is the
md5 of the document id — so reruns, retries and engines agree
bit-for-bit (same property the MinHash/LSH operators rely on), unlike
``DataFrame.sample``, whose output depends on partitioning.

Scale design — NO single-task-per-stratum window anywhere. A naive
``Window.partitionBy(stratum).orderBy(md5(id))`` serializes each
stratum into one task: at 100 TB with a "web" stratum holding 90% of
the corpus that is a terabyte sort on one core. All operators instead
run a two-phase bucket-split plan (the same renumbering shape as the
flat-file sinks' per-range framing, and the reference's
range-partitioned fan-out in interpro/xrefs/utils.py:6-19):

1. every row gets an ORDER-PRESERVING bucket id computed from the
   first 4 hex digits of its md5 sort key — equal-width cuts of the
   uniform hash space, so buckets are balanced by construction (no
   sampling pass, unlike ``repartitionByRange``) and every stratum
   spreads ~evenly over all buckets, hot strata included; bucket i's
   keys all precede bucket i+1's in ``__h`` order, rows sharing the
   4-digit prefix share a bucket;
2. a window keyed by ``(bucket, stratum)`` computes LOCAL ranks /
   running token sums — each window group is bounded by the bucket
   size, never by the stratum size; the window's own exchange is the
   ONLY full-data shuffle in the plan (the bucket id is a plain
   deterministic column, so no physical-partition bookkeeping and no
   preliminary range exchange);
3. a tiny per-``(bucket, stratum)`` aggregate (#buckets × #strata
   rows, map-side partial aggregation) is prefix-summed and broadcast
   back: global value = bucket offset + local value.

``pack_token_shards``'s final ``shard_pos`` window partitions by
``(stratum, shard_id)`` — safe at any scale because a shard holds at
most ``budget`` documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_order(id_col: str, seed: str | None = None) -> Column:
    """Deterministic pseudo-random sort key: md5 of the id (prefixed
    with ``seed + ':'`` when a seed is given, so different epochs
    draw different orders from the same ids). NOT a total order on
    its own — md5 collisions are possible in principle — so every
    caller appends the id column itself as the tiebreak when ordering
    by this."""
    key = F.col(id_col).cast("string")
    if seed is not None:
        key = F.concat_ws(":", F.lit(seed), key)
    return F.md5(key.cast("binary"))


def _num_ranges(df: DataFrame, num_ranges: int | None) -> int:
    if num_ranges is not None:
        return num_ranges
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))


def _range_annotated(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    num_ranges: int | None,
    token_col: str | None = None,
    seed: str | None = None,
) -> DataFrame:
    """Two-phase global rank (and, with ``token_col``, global running
    token sum) per ``keys`` group in md5(id) order, with every group
    split across up to ``num_ranges`` buckets.

    Adds ``__h`` (the md5 sort key), ``__pid`` (ordered hash-prefix
    bucket id — kept so tests can assert a stratum spans >1 bucket),
    ``__rank`` (1-based global rank within the group) and, when
    ``token_col`` is given, ``__run`` (inclusive global running sum of
    ``token_col``).

    Correctness of the renumbering rests on the bucket id being
    MONOTONE in ``__h``: ``__pid = (prefix16(__h) * n) div 65536``
    where prefix16 is the integer value of the first 4 hex digits, so
    within one group every row of bucket i precedes every row of
    bucket i+1 in ``(__h, id)`` order (rows sharing the 4-digit
    prefix share a bucket); local rank + (sum of earlier buckets'
    group counts) is therefore the exact global rank. Because md5 is
    uniform, buckets are balanced with no sampling pass, and the
    bucket id is a deterministic COLUMN — the local window's own
    ``(bucket, keys)`` exchange is the plan's only full-data shuffle,
    and no result depends on physical partition placement.
    """
    n = min(_num_ranges(df, num_ranges), 65536)
    keyed = df.withColumn("__h", _hash_order(id_col, seed=seed))
    # deliberate physical shape (verified in PLANS.md): the window
    # below triggers the plan's ONLY full-row exchange, on
    # (__pid, keys); the counts branch re-scans the source column-
    # pruned to the hash inputs and reduces map-side (partial
    # HashAggregate) to #buckets × #strata rows before its exchange —
    # a second cheap columnar scan instead of a second full-row
    # shuffle. Do NOT pre-repartition here: an explicit repartition
    # would force the counts branch to shuffle every row's bucket id
    # instead of its per-bucket partial counts.
    ranged = keyed.withColumn(
        "__pid",
        F.expr(
            "CAST((CAST(conv(substring(__h, 1, 4), 16, 10) AS BIGINT)"
            f" * {n}) DIV 65536 AS INT)"
        ),
    )
    w_local = Window.partitionBy("__pid", *keys).orderBy("__h", F.col(id_col))
    local = ranged.withColumn("__lrank", F.row_number().over(w_local))
    aggs = [F.count(F.lit(1)).alias("__cnt")]
    if token_col is not None:
        local = local.withColumn(
            "__lrun",
            F.sum(F.col(token_col)).over(
                w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        aggs.append(F.sum(F.col(token_col)).alias("__tok"))
    counts = ranged.groupBy("__pid", *keys).agg(*aggs)
    # with keys=[] this window is global — but over the COUNTS table
    # (<= #buckets x #strata <= 65536 rows by construction), not the
    # data, so WindowExec's single-partition warning is a non-issue
    # here (session.py lowers that logger to ERROR; a lit(0) partition
    # key would NOT silence it — Catalyst folds literal partition
    # specs away)
    w_off = (
        Window.partitionBy(*keys)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__cnt_off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).cast("long")
    )
    off_cols = ["__pid", *keys, "__cnt_off"]
    if token_col is not None:
        offsets = offsets.withColumn(
            "__tok_off", F.coalesce(F.sum("__tok").over(w_off), F.lit(0)).cast("long")
        )
        off_cols.append("__tok_off")
    out = local.join(F.broadcast(offsets.select(*off_cols)), ["__pid", *keys])
    out = out.withColumn(
        "__rank", (F.col("__cnt_off") + F.col("__lrank")).cast("long")
    ).drop("__lrank", "__cnt_off")
    if token_col is not None:
        out = out.withColumn(
            "__run", (F.col("__tok_off") + F.col("__lrun")).cast("long")
        ).drop("__lrun", "__tok_off")
    return out


def stratified_sample(
    docs: DataFrame,
    caps: dict[str, int],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_cap: int | None = None,
    num_ranges: int | None = None,
) -> DataFrame:
    """Keep at most ``caps[stratum]`` documents per stratum, selected
    by md5(id) rank — a reproducible uniform sample without RNG.

    ``default_cap`` applies to strata absent from ``caps``; ``None``
    keeps them whole. Adds ``sample_rank`` (1-based position in the
    stratum's hash order) so downstream stages can tighten the mix
    without re-sampling. Caps are a small driver-side dict (one entry
    per stratum — sources/languages number in the hundreds, not
    billions).

    Scale: the rank is computed by the two-phase bucket-split plan
    (module docstring) — one full shuffle, every stratum spread over
    ``num_ranges`` buckets (default ``spark.sql.shuffle.partitions``).
    """
    ranked = _range_annotated(docs, [stratum_col], id_col, num_ranges)
    cap_expr = F.lit(None).cast("long")
    for value, cap in sorted(caps.items()):
        cap_expr = F.when(F.col(stratum_col) == value, cap).otherwise(cap_expr)
    if default_cap is not None:
        cap_expr = F.coalesce(cap_expr, F.lit(default_cap))
    out = ranked.withColumn("sample_rank", F.col("__rank")).drop(
        "__h", "__pid", "__rank"
    )
    return out.where(cap_expr.isNull() | (F.col("sample_rank") <= cap_expr))


def pack_token_shards(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    stratum_col: str | None = "source",
    id_col: str = "doc_id",
    num_ranges: int | None = None,
) -> DataFrame:
    """Assign each document to a token-budget shard: documents are
    laid out in md5(id) order (per stratum when ``stratum_col`` is
    set) and the stream is cut at every ``budget``-token mark.

    ``shard_id`` = floor((cumulative tokens - own tokens) / budget) —
    a document belongs to the shard whose token span its FIRST token
    falls in. Each shard therefore covers exactly ``budget`` tokens of
    stream mass; its own document total can deviate from ``budget``
    only by the straddling documents at its two boundaries. A document
    longer than ``budget`` consumes several marks, so the next
    document lands a correspondingly later shard id (ids are ordered,
    not necessarily dense). This fixed-mark chunking needs only a
    running sum; a reset-on-overflow greedy packer is instead a
    sequential recurrence — express it with the W4 aggregate-fold
    pattern (domain/hmm.py) if exact per-shard capacity is required.
    Output adds ``shard_id`` and ``shard_pos`` (0-based position
    within the shard).

    Scale: the running sum is two-phase bucket-split (module
    docstring) — local running sums per range plus broadcast
    prefix-sum token offsets, so a stratum (or the whole corpus when
    ``stratum_col=None``) is never one task. The ``shard_pos`` window
    partitions by shard — bounded by ``budget`` documents per group.
    """
    keys = [stratum_col] if stratum_col else []
    annotated = _range_annotated(
        docs, keys, id_col, num_ranges, token_col=token_col
    )
    out = annotated.withColumn(
        "shard_id",
        F.floor((F.col("__run") - F.col(token_col)) / F.lit(budget)).cast("long"),
    )
    w_shard = Window.partitionBy(*keys, "shard_id").orderBy("__h", F.col(id_col))
    return (
        out.withColumn(
            "shard_pos", (F.row_number().over(w_shard) - 1).cast("long")
        )
        .drop("__h", "__pid", "__rank", "__run")
    )


def pack_training_examples(
    docs: DataFrame,
    budget: int = 4096,
    seq_len: int = 128,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "<eos>",
    num_ranges: int | None = None,
) -> DataFrame:
    """The final tensor-prep step of a training-data pipeline:
    documents are dealt into token-budget shards
    (:func:`pack_token_shards`), each shard's documents concatenate in
    shard order with ``sep`` tokens marking document boundaries, and
    the concatenated stream re-chunks into consecutive ``seq_len``
    token examples (the last example of a shard may run short — its
    ``n_tokens`` says so; drop or pad downstream as the trainer
    prefers).

    Scale: the per-shard concat is an ``array_sort(collect_list)``
    whose group is BOUNDED BY THE BUDGET (that bound is the point of
    sharding first — the concat is safe at any corpus size because no
    group exceeds ~``budget`` tokens plus one straddling document);
    chunking is map-side. Everything upstream is the single-shuffle
    bucket-split plan.

    Returns (stratum, shard_id, example_id, n_tokens, example_text).
    """
    with_counts = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        F.col(text_col).alias("__t"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    sharded = pack_token_shards(
        with_counts, budget, "n_tokens", "stratum", "doc_id", num_ranges
    )
    concat = (
        sharded.groupBy("stratum", "shard_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("shard_pos", F.col("__t").alias("t")))
                    ),
                    lambda s: s["t"],
                ),
                f" {sep} ",
            ).alias("__joined")
        )
    )
    toks = F.split(F.col("__joined"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(seq_len)).cast("int")
    return (
        concat.select(
            "stratum",
            "shard_id",
            toks.alias("__tok"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("example_id"),
        )
        .select(
            "stratum",
            "shard_id",
            F.col("example_id").cast("long").alias("example_id"),
            F.size(F.slice("__tok", F.col("example_id") * seq_len + 1, seq_len))
            .cast("long")
            .alias("n_tokens"),
            F.concat_ws(
                " ", F.slice("__tok", F.col("example_id") * seq_len + 1, seq_len)
            ).alias("example_text"),
        )
    )


def corpus_mix(
    docs: DataFrame,
    parts: dict[str, int],
    total: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    num_ranges: int | None = None,
) -> DataFrame:
    """Weighted corpus mixing: draw a ``total``-document epoch whose
    per-source composition follows integer weights ``parts`` (a source
    s gets ``total * parts[s] / sum(parts)`` documents) — the domain-
    mixture step of LLM pretraining-data assembly (fixed-weight
    variant of the mixtures tuned in the Pile / DoReMi line of work).

    Quotas use the largest-remainder method in PURE INTEGER arithmetic
    (base = total*parts // partsum; the ``total - sum(base)`` leftover
    units go to the sources with the largest ``total*parts % partsum``
    remainders, ties broken by source name) so every engine computes
    the identical mix — no float weight drift. A quota is clipped to
    the source's available count (the shortfall is NOT redistributed;
    re-run with renormalized parts if under-supplied sources must be
    made up elsewhere). Sources absent from ``parts`` are excluded
    (weight 0).

    Within each source, selection is the deterministic md5(id) rank of
    :func:`stratified_sample` — computed by the same two-phase
    bucket-split plan, so no stratum is ever a single task. The quota
    table is #sources rows: computed with tiny-DF windows and
    broadcast back onto the ranked corpus.

    Returns (id, stratum, sample_rank, quota) for the selected epoch.
    """
    spark = docs.sparkSession
    partsum = sum(parts.values())
    parts_df = spark.createDataFrame(
        sorted(parts.items()), [stratum_col, "parts"]
    )
    counts = docs.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    q0 = counts.join(parts_df, stratum_col).select(
        stratum_col,
        "__n",
        (F.lit(total) * F.col("parts")).alias("__scaled"),
    ).select(
        stratum_col,
        "__n",
        F.floor(F.col("__scaled") / partsum).cast("long").alias("__base"),
        (F.col("__scaled") % partsum).cast("long").alias("__rem"),
    )
    # global windows over the #strata-row quota table only (sources /
    # languages number in the hundreds) — bounded by construction; see
    # the _range_annotated note on the WindowExec warning
    w_all = Window.partitionBy()
    w_rem = Window.partitionBy().orderBy(F.desc("__rem"), F.col(stratum_col))
    quota = q0.withColumn(
        "__left", F.lit(total) - F.sum("__base").over(w_all)
    ).withColumn("__rr", F.row_number().over(w_rem)).select(
        stratum_col,
        F.least(
            F.col("__base")
            + F.when(F.col("__rr") <= F.col("__left"), 1).otherwise(0),
            F.col("__n"),
        ).cast("long").alias("quota"),
    )
    ranked = _range_annotated(
        docs.join(F.broadcast(parts_df.select(stratum_col)), stratum_col),
        [stratum_col], id_col, num_ranges,
    )
    return (
        ranked.withColumn("sample_rank", F.col("__rank"))
        .join(F.broadcast(quota), stratum_col)
        .where(F.col("sample_rank") <= F.col("quota"))
        .select(id_col, stratum_col, "sample_rank", "quota")
    )


def global_shuffle(
    docs: DataFrame,
    num_shards: int,
    seed: str = "0",
    id_col: str = "doc_id",
    num_ranges: int | None = None,
) -> DataFrame:
    """Deterministic global training-order shuffle: documents are laid
    out in seeded-hash order (md5(seed ':' id), id tiebreak) and dealt
    round-robin into ``num_shards`` shards — shard sizes balanced
    within one document, every shard a uniform subsample, and a new
    ``seed`` (epoch number) draws a fresh order with zero RNG state to
    carry between runs or engines.

    ``shard_id`` = (global position) mod num_shards, ``shard_pos`` =
    (global position) div num_shards: reading shards 0..n-1 round-robin
    at each position replays the exact shuffled stream, while reading
    one shard sequentially is the standard per-worker training shard.

    Scale: the global position comes from the two-phase bucket-split
    rank over the WHOLE corpus (module docstring; keys=[] — the ranges
    alone bound task size), one full shuffle total; the modulo deal is
    map-side arithmetic on the rank.
    """
    ranked = _range_annotated(docs, [], id_col, num_ranges, seed=seed)
    pos = F.col("__rank") - 1
    return (
        ranked.withColumn("shard_id", (pos % num_shards).cast("long"))
        .withColumn("shard_pos", F.floor(pos / num_shards).cast("long"))
        .drop("__h", "__pid", "__rank")
    )

def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169) — score every raw document by how target-like
    its hashed n-gram feature distribution is, so a top-k /
    resampling pass can cut a 100 TB crawl down to the target domain.

    Features are word bigrams hashed into ``n_buckets`` (the paper's
    hashed n-gram space). The target distribution comes from the rows
    matching ``target_pred`` (add-one smoothed); the raw distribution
    from the whole input. This implementation scores in RATIO space
    with integer-exact arithmetic: the per-bucket weight is

        r_ppm(b) = floor(1e6 * (tc_b+1)(Nq+B) / ((qc_b+1)(Nt+B)))

    (one IEEE double division of two exactly-representable integer
    products — deterministic on every engine, unlike ``ln`` whose
    libm rounding varies), and a document's score is the exact BIGINT
    sum of ``count_doc(b) * r_ppm(b)`` over its bigram occurrences.
    Production at 100 TB would sum log-space doubles instead (the
    products overflow 2^53 there); the plumbing — feature hashing,
    smoothed distribution estimation, broadcast join-back scoring —
    is identical, only the per-bucket weight column changes.

    Shape: the corpus is exploded and shuffled ONCE — the per-doc
    (doc, bucket) count aggregate — and every distribution table
    derives from that relation (raw = per-bucket sum, target = the
    same over flagged docs, totals = sums of the B-row tables), so
    the three extra aggregates ride Spark's ReuseExchange over the
    single doc-count shuffle instead of re-scanning the corpus. The
    B-row weight table is broadcast back — never a window over the
    bucket key (hot-bucket rule, see text.py ``_token_df``) — and the
    per-doc sum is one hash aggregate on the doc id. Selection is
    ``orderBy(score desc, id).limit(k)`` downstream, which Spark runs
    as TakeOrderedAndProject (per-partition partial top-k, no global
    sort).

    Returns (doc_id, n_bigrams, score_ppm).
    """
    toks = F.split(F.col(text_col), " ")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("__bg").cast("binary")), 1, 6), 16, 10)
        .cast("long") % n_buckets
    )
    feats = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            target_pred.alias("__is_target"),
            F.explode(pairs).alias("__bg"),
        )
        .withColumn("__b", bucket)
        .drop("__bg")
    )
    # per-doc bucket counts: the only full-data shuffle in the plan
    doc_counts = feats.groupBy("doc_id", "__b").agg(
        F.count(F.lit(1)).cast("long").alias("__c"),
        F.max("__is_target").alias("__is_target"),
    )
    raw = doc_counts.groupBy("__b").agg(F.sum("__c").cast("long").alias("__qc"))
    tgt = (
        doc_counts.filter("__is_target")
        .groupBy("__b")
        .agg(F.sum("__c").cast("long").alias("__tc"))
    )
    base = raw.join(tgt, "__b", "left")
    totals = base.agg(
        F.sum("__qc").cast("long").alias("__nq"),
        F.sum(F.coalesce("__tc", F.lit(0))).cast("long").alias("__nt"),
    )
    weights = (
        base.crossJoin(F.broadcast(totals))
        .select(
            "__b",
            F.floor(
                F.lit(1_000_000.0)
                * (
                    (F.coalesce("__tc", F.lit(0)) + 1) * (F.col("__nq") + n_buckets)
                ).cast("double")
                / (
                    (F.col("__qc") + 1) * (F.col("__nt") + n_buckets)
                ).cast("double")
            ).cast("long").alias("__r_ppm"),
        )
    )
    return (
        doc_counts.join(F.broadcast(weights), "__b")
        .groupBy("doc_id")
        .agg(
            F.sum("__c").cast("long").alias("n_bigrams"),
            F.sum(F.col("__c") * F.col("__r_ppm")).cast("long").alias("score_ppm"),
        )
    )


def pps_systematic_sample(
    docs: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str | None = None,
    num_ranges: int | None = None,
) -> DataFrame:
    """Probability-proportional-to-size sampling by the systematic
    (Madow 1949) method, fully integer-exact: rows are laid on a line
    in deterministic md5(id) order (the standard randomized-order
    prerequisite, no RNG state), each occupying an interval equal to
    its weight; the ``n`` selection points ``p_j = (2j+1)*W / (2n)``
    (midpoints of equal strides over the total weight ``W``) pick the
    rows whose intervals contain them. Every comparison is cross-
    multiplied to integers — ``(2j+1)*W <= 2n*x`` — so there is not
    one float anywhere and any engine replays the selection exactly.

    Inclusion probability of a row is ``min(1, n*w/W)`` — the PPS
    property; a row heavier than one stride can contain several
    points (``n_hits`` > 1 — the standard with-multiplicity
    convention; downstream either repeats or caps it).

    Scale: the running weight sum comes from the same two-phase
    bucket-split rank plan as the packing family (ONE full-row
    shuffle, no global single-partition window —
    :func:`_range_annotated`); the total ``W`` is one scalar
    aggregate. Weights must be positive integers (nulls and
    non-positives are filtered out, documented contract).

    Returns (id, weight, run_end, n_hits) for sampled rows —
    ``run_end`` the row's inclusive running-weight position (ties the
    selection to the replayable order).
    """
    base = docs.select(
        F.col(id_col), F.col(weight_col).cast("long").alias("__w")
    ).filter(F.col("__w") > 0)
    total = base.agg(F.sum("__w")).first()[0]
    if not total:
        return base.select(
            F.col(id_col),
            F.col("__w").alias("weight"),
            F.lit(0).cast("long").alias("run_end"),
            F.lit(0).cast("long").alias("n_hits"),
        ).limit(0)
    W = int(total)
    annotated = _range_annotated(
        base, [], id_col, num_ranges, token_col="__w", seed=seed
    )
    # points <= x: count of j in [0, n) with (2j+1)*W <= 2n*x —
    # pure integer DIV throughout (Spark's DIV truncates toward zero,
    # so the q <= 0 branch must short-circuit before (q-1) DIV 2)
    def cle(x: str) -> F.Column:
        return F.expr(
            f"CASE WHEN (2 * {n} * ({x})) DIV {W} <= 0 THEN CAST(0 AS BIGINT) "
            f"ELSE least(((2 * {n} * ({x})) DIV {W} - 1) DIV 2 + 1, "
            f"CAST({n} AS BIGINT)) END"
        )

    hits = (cle("__run") - cle("__run - __w")).cast("long")
    return (
        annotated.withColumn("n_hits", hits)
        .filter(F.col("n_hits") >= 1)
        .select(
            F.col(id_col),
            F.col("__w").alias("weight"),
            F.col("__run").alias("run_end"),
            "n_hits",
        )
    )
