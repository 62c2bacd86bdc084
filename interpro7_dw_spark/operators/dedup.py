"""Deduplication operators for large text corpora.

All variants are pure DataFrame compositions (JVM-side, codegen'd) —
no Python UDFs — so they scale: the expensive parts are shuffles on
(shingle) / (band signature) keys, which AQE can coalesce/skew-split.

Design notes at 100 TB:
- exact dedup is a hash groupBy: one shuffle on the content hash;
- minhash-LSH only ever joins docs sharing a band bucket (candidate
  generation is linear in corpus size + bucket collisions), never the
  O(n^2) cross product;
- n-gram Jaccard joins on the shingle inverted index, so the pair
  candidates are bounded by shingle co-occurrence, with a min-length
  guard against degenerate hot shingles (salt or drop top-frequency
  shingles at real scale);
- hashes are md5-based so any engine (and the DuckDB oracle) computes
  identical values — no engine-private hash functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import owned_persist

from ..functions.portable import round_div


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group identical texts by content hash; keep the lowest id."""
    return (
        docs.select(id_col, F.md5(F.col(text_col).cast("binary")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("keep_id"))
    )


def shingles(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct word n-gram shingles per document (whitespace tokens).

    Documents shorter than ``n`` tokens contribute one whole-text shingle.
    """
    tokens = F.split(F.col(text_col), " ")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(tokens) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(tokens, i + F.lit(1), n)),
            )
        ).alias("shingle"),
    ).distinct()


def drop_hot_shingles(sh: DataFrame, max_doc_freq: int) -> DataFrame:
    """Stop-shingle guard: drop shingles appearing in more than
    ``max_doc_freq`` documents.

    The inverted-index join's candidate count is sum over shingles of
    df^2 — one universal shingle makes it quadratic in corpus size. A
    document-frequency cap bounds each shingle's contribution to
    ``max_doc_freq^2``, keeping candidates near-linear. Dropped
    shingles leave BOTH the index and the size denominators, so the
    result is exact Jaccard over the non-stop shingle sets (the
    standard stop-shingle semantics; at 100 TB a cap like 10_000 is
    mandatory, and the df relation is a cheap broadcast-sized filter).
    """
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_doc_freq)
        .select("shingle")
    )
    return sh.join(F.broadcast(hot), "shingle", "left_anti")


def jaccard_pairs(
    sh: DataFrame, threshold: float, max_doc_freq: int | None = None
) -> DataFrame:
    """Near-duplicate pairs by shingle Jaccard similarity, via the
    inverted-index self-join (only docs sharing >=1 shingle pair up).

    ``max_doc_freq`` enables the stop-shingle guard (see
    :func:`drop_hot_shingles`); None keeps exact full-set Jaccard —
    fine at test scale, required off-state for the DuckDB oracle.
    """
    if max_doc_freq is not None:
        sh = drop_hot_shingles(sh, max_doc_freq)
    # the shingle relation feeds three plan branches (sizes + both join
    # sides); persist so the tokenize/explode/distinct subtree runs once
    # (at cluster scale: checkpoint to parquet instead)
    sh = owned_persist(sh)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("da"), "shingle")
    b = sh.select(F.col("doc_id").alias("db"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.select(F.col("doc_id").alias("da"), F.col("sz").alias("sa")), "da")
        .join(sizes.select(F.col("doc_id").alias("db"), F.col("sz").alias("sb")), "db")
        .withColumn("jaccard", round_div(F.col("common"), F.col("sa") + F.col("sb") - F.col("common"), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("da", "db", "jaccard")
    )


def containment_pairs(
    sh: DataFrame, threshold: float, max_doc_freq: int | None = None
) -> DataFrame:
    """ASYMMETRIC near-duplicate pairs by shingle containment:
    ``containment(a in b) = |A ∩ B| / |A|`` — the quote-inclusion
    detector Jaccard structurally misses (a tweet pasted into a long
    article has tiny Jaccard but containment ~1.0; Broder's original
    resemblance/containment pair). Emits ONE canonical row per
    (smaller-id, larger-id) doc pair carrying BOTH directions, kept
    when either direction clears ``threshold``.

    Same inverted-index shape (and the same :func:`drop_hot_shingles`
    guard and complexity bound) as :func:`jaccard_pairs` — candidates
    only for docs sharing a shingle, one groupBy on the pair key, the
    per-doc size table joined back twice.

    Returns (da, db, containment_a_in_b, containment_b_in_a).

    Cache note: persists an intermediate (via owned_persist) that
    the lazy result reuses; consumers bound its lifetime with
    ``with engine_cache_scope(): ...`` (interpro7_dw_spark/caching.py),
    as tools/differ.py and bench.py do per query.
    """
    if max_doc_freq is not None:
        sh = drop_hot_shingles(sh, max_doc_freq)
    sh = owned_persist(sh)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("da"), "shingle")
    b = sh.select(F.col("doc_id").alias("db"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count("*").alias("common"))
    )
    c_ab = round_div(F.col("common"), F.col("sa"), 4)
    c_ba = round_div(F.col("common"), F.col("sb"), 4)
    return (
        common.join(sizes.select(F.col("doc_id").alias("da"), F.col("sz").alias("sa")), "da")
        .join(sizes.select(F.col("doc_id").alias("db"), F.col("sz").alias("sb")), "db")
        .select(
            "da", "db",
            c_ab.alias("containment_a_in_b"),
            c_ba.alias("containment_b_in_a"),
        )
        .filter(
            (F.col("containment_a_in_b") >= threshold)
            | (F.col("containment_b_in_a") >= threshold)
        )
    )


def minhash_bands(
    sh: DataFrame,
    num_hashes: int = 16,
    band_size: int = 4,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """MinHash signature split into LSH bands.

    Hash family: ``md5(seed || ':' || shingle)`` — the per-seed minimum
    of a keyed md5 is a valid minwise hash and is reproducible in any
    engine. Returns (doc_id, band, band_sig).

    Plan shape: all ``num_hashes`` minimums are computed as parallel
    aggregates in ONE groupBy over the shingle relation (no seed
    explode, no second shuffle); bands then derive column-wise and
    unpivot with stack() — a single shuffle end to end.
    """
    assert num_hashes % band_size == 0
    if max_doc_freq is not None:
        sh = drop_hot_shingles(sh, max_doc_freq)
    min_cols = [
        F.min(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("shingle")).cast("binary"))
        ).alias(f"m{seed}")
        for seed in range(num_hashes)
    ]
    sigs = sh.groupBy("doc_id").agg(*min_cols)
    n_bands = num_hashes // band_size
    band_cols = [
        F.md5(
            F.concat_ws(",", *[F.col(f"m{b * band_size + i}") for i in range(band_size)])
            .cast("binary")
        ).alias(f"b{b}")
        for b in range(n_bands)
    ]
    stack_args = ", ".join(f"{b}, b{b}" for b in range(n_bands))
    return (
        sigs.select("doc_id", *band_cols)
        .selectExpr("doc_id", f"stack({n_bands}, {stack_args}) AS (band, band_sig)")
    )


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Docs sharing at least one LSH band bucket."""
    bands = owned_persist(bands)  # self-join: compute the signature pipeline once
    a = bands.select(F.col("doc_id").alias("da"), "band", "band_sig")
    b = bands.select(F.col("doc_id").alias("db"), "band", "band_sig")
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count("*").alias("n_bands"))
    )


def simhash(docs: DataFrame, bits: int = 16, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document SimHash over distinct whitespace tokens.

    Token hash = first ``bits // 4`` hex chars of md5, engine-portable.
    Bit b of the fingerprint is the sign of sum(+-1) of token bit b.

    ``bits=64`` is the production shape (each pigeonhole segment in
    :func:`simhash_pairs` then carries 16 bits — 65k buckets,
    AQE-splittable). The 64-bit token hash is composed from two 32-bit
    conv() halves because conv's unsigned decimal string for values >=
    2^63 does not survive a long cast; shiftleft wraps into the signed
    top bit, which is fine — fingerprint longs are bit patterns, not
    magnitudes (the DuckDB oracle maps the same unsigned value into
    signed BIGINT range explicitly, z_dedup_simhash64).
    """
    if bits % 4 != 0 or not 4 <= bits <= 64:
        raise ValueError("bits must be a multiple of 4 in [4, 64]")
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("token"),
    )
    md5_col = F.md5(F.col("token").cast("binary"))
    if bits == 64:
        hi = F.conv(F.substring(md5_col, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(md5_col, 9, 8), 16, 10).cast("long")
        h = F.shiftleft(hi, 32).bitwiseOR(lo)
    else:
        # up to 60 bits a single conv fits a signed long exactly
        h = F.conv(F.substring(md5_col, 1, bits // 4), 16, 10).cast("long")
    hashed = tok.select("doc_id", h.alias("h"))
    bit = hashed.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
        "h",
    ).select(
        "doc_id",
        "b",
        (F.expr("shiftright(h, b) & 1") * 2 - 1).alias("c"),
    )
    return (
        bit.groupBy("doc_id", "b")
        .agg(F.sum("c").alias("s"))
        .select(
            "doc_id",
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)"))
            .otherwise(F.lit(0).cast("long"))
            .alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").cast("long").alias("simhash"))
    )


def simhash_pairs(sh: DataFrame, max_hamming: int = 3, bits: int = 16) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance, via the
    pigeonhole segment join (never an all-pairs cross product).

    Split the ``bits``-wide fingerprint into ``max_hamming + 1``
    segments: two fingerprints within Hamming distance ``max_hamming``
    differ in at most ``max_hamming`` bits, so at least one segment is
    bit-identical (pigeonhole). Candidate generation is therefore an
    equi-join on (segment index, segment value); ``bit_count`` verifies
    the exact distance afterwards. A (da, db) pair agreeing on several
    segments appears once per agreeing segment — deduped by distinct.

    Bucket cardinality scales with 2^segment_width: at the default
    16-bit/4-segment shape that is 16 values per segment — fine for
    test corpora, but at 100 TB use a 64-bit fingerprint so each of
    the 4 segments carries 16 bits (65k buckets, AQE-splittable).
    """
    n_seg = max_hamming + 1
    seg_w = bits // n_seg
    assert seg_w > 0, "fingerprint too narrow for max_hamming"
    sh = owned_persist(sh)  # self-join: compute fingerprints once
    # last segment absorbs the remainder bits; mask derives per row
    # from the seg index so one explode covers uneven splits too
    segs = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_seg - 1))).alias("seg"),
    ).select(
        "doc_id",
        "simhash",
        "seg",
        F.expr(
            f"shiftright(simhash, seg * {seg_w}) & "
            f"CASE WHEN seg < {n_seg - 1} THEN {(1 << seg_w) - 1} "
            f"ELSE {(1 << (bits - seg_w * (n_seg - 1))) - 1} END"
        ).alias("seg_val"),
    )
    a = segs.select(F.col("doc_id").alias("da"), F.col("simhash").alias("ha"), "seg", "seg_val")
    b = segs.select(F.col("doc_id").alias("db"), F.col("simhash").alias("hb"), "seg", "seg_val")
    return (
        a.join(b, ["seg", "seg_val"])
        .filter(F.col("da") < F.col("db"))
        .withColumn("hamming", F.expr("bit_count(ha ^ hb)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("da", "db", "hamming")
        .distinct()
    )


def repeated_passage_stats(
    docs: DataFrame,
    window: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document repeated-passage statistics — the substring-dedup
    / contamination signal: what fraction of a document's distinct
    ``window``-token passages also occurs in at least one OTHER
    document.

    Shape: :func:`shingles` at passage width builds the inverted
    index; the shared-passage set is a ``groupBy(shingle)`` aggregate
    filtered to document frequency >= 2, marked back onto each
    document's passages with a left join whose strategy AQE picks at
    runtime (broadcast when the shared set fits — it is usually far
    smaller than the index — skew-split shuffle join when not); a
    final per-document aggregate emits ``n_passages`` (distinct),
    ``n_shared`` and ``shared_frac``. NEVER a window partitioned by
    the passage key: a boilerplate passage (header, license block) can
    occur in ~every document, and a window group cannot be AQE-split,
    so its whole occurrence list would pin one task at corpus scale —
    the same hot-key rule as text.py ``_token_df``. Candidates never
    materialize as pairs — at 100 TB this stays linear where pairwise
    substring dedup would explode; apply :func:`drop_hot_shingles`
    first if boilerplate passages dominate the index.

    Cache note: persists an intermediate (via owned_persist) that
    the lazy result reuses; consumers bound its lifetime with
    ``with engine_cache_scope(): ...`` (interpro7_dw_spark/caching.py),
    as tools/differ.py and bench.py do per query.
    """
    sh = shingles(docs, n=window, id_col=id_col, text_col=text_col)
    # branch point: the shingle relation feeds both the df aggregate
    # and the mark join — persist so tokenize/explode/distinct runs once
    sh = owned_persist(sh)
    shared = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= 2)
        .select("shingle", F.lit(1).alias("__hit"))
    )
    marked = sh.join(shared, "shingle", "left")
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_shared"),
    ).select(
        "doc_id",
        "n_passages",
        "n_shared",
        round_div(F.col("n_shared"), F.col("n_passages"), 4).alias("shared_frac"),
    )


def exact_substring_dedup(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring span deduplication (the ExactSubstr recipe of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better", at whitespace-token granularity): any ``k``-token span
    whose content occurs MORE THAN ONCE in the corpus — in another
    document or repeated within the same one — is a duplicated span;
    overlapping duplicated spans merge, and the cleaned text is the
    document with every merged span's tokens cut out. The published
    recipe builds a corpus suffix array; the same "every position whose
    k-window repeats" set falls out of relational ops, which is the
    shape that actually distributes:

    1. one explode emits every (doc, pos, md5(k-gram)) window —
       O(total corpus tokens) rows, map-side;
    2. ``groupBy(hash)`` counts global occurrences (map-side partial
       combine; AQE splits hot hashes) — NEVER a window over the hash
       key, per the hot-key rule (a boilerplate k-gram can occur ~every
       doc);
    3. a LEFT-SEMI join keeps the duplicated positions — output is
       bounded by its input (no pair materialization, unlike pairwise
       substring comparison);
    4. per-doc ``collect_list`` + :func:`~interpro7_dw_spark.functions.
       intervals.condense_intervals` merges [pos, pos+k-1] spans —
       per-task state is O(doc tokens), the same bound tokenization
       itself needs (chunk first if single docs exceed memory);
    5. the cleaned text reassembles map-side via higher-order filter
       over token positions.

    Returns (doc_id, n_tokens, n_spans, n_dup_tokens, dup_token_frac,
    cleaned_text); docs shorter than ``k`` tokens pass through
    untouched (no window, no span).

    Cache note: persists an intermediate (via owned_persist) that
    the lazy result reuses; consumers bound its lifetime with
    ``with engine_cache_scope(): ...`` (interpro7_dw_spark/caching.py),
    as tools/differ.py and bench.py do per query.
    """
    from ..functions.intervals import condense_intervals, interval_union_length

    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("__t"))
    # per-position k-gram hashes; sequence() would count DOWN for
    # n < k (Spark generates descending sequences), hence the guard
    win = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("__t") >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size("__t") - (k - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.md5(
                            F.concat_ws(" ", F.slice("__t", i, k)).cast("binary")
                        ).alias("h"),
                    ),
                ),
            ).otherwise(F.expr("CAST(array() AS array<struct<pos INT, h STRING>>)"))
        ).alias("w"),
    ).select("doc_id", F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))
    win = owned_persist(win)  # feeds both the occurrence count and the probe side
    dup = (
        win.groupBy("h")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") >= 2)
        .select("h")
    )
    spans = (
        win.join(dup, "h", "left_semi")
        .groupBy("doc_id")
        .agg(
            condense_intervals(
                F.collect_list(
                    F.struct(
                        F.col("pos").cast("bigint").alias("s"),
                        (F.col("pos") + (k - 1)).cast("bigint").alias("e"),
                    )
                )
            ).alias("__spans")
        )
    )
    joined = base.join(spans, "doc_id", "left").select(
        "doc_id",
        "__t",
        F.coalesce(
            "__spans", F.expr("CAST(array() AS array<struct<s BIGINT, e BIGINT>>)")
        ).alias("__spans"),
    )
    kept = F.filter(
        F.sequence(F.lit(1), F.size("__t")),
        lambda p: ~F.exists(
            F.col("__spans"), lambda sp: (p >= sp["s"]) & (p <= sp["e"])
        ),
    )
    return joined.select(
        "doc_id",
        F.size("__t").cast("long").alias("n_tokens"),
        F.size("__spans").cast("long").alias("n_spans"),
        F.coalesce(interval_union_length(F.col("__spans")), F.lit(0).cast("long"))
        .alias("n_dup_tokens"),
        round_div(
            F.coalesce(interval_union_length(F.col("__spans")), F.lit(0).cast("long")),
            F.size("__t"),
            4,
        ).alias("dup_token_frac"),
        F.concat_ws(
            " ", F.transform(kept, lambda p: F.element_at("__t", p))
        ).alias("cleaned_text"),
    )


def contamination_stats(
    corpus: DataFrame,
    benchmark: DataFrame,
    window: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination tagging: for each corpus document, how
    many of its distinct ``window``-token passages appear anywhere in
    the benchmark set — the n-gram membership decontamination test LLM
    pipelines run against their eval sets (13-gram in the well-known
    production recipes; any width works here).

    Scale shape: the benchmark side is an eval set — thousands of
    examples against billions of corpus documents — so its distinct
    passage set broadcasts and the corpus stream is tested MAP-SIDE
    (broadcast left-semi join); the only corpus shuffle is the final
    per-document aggregate. The corpus never joins itself, so cost is
    linear in corpus passages at any scale. If a benchmark is too big
    to broadcast, the same plan degrades gracefully to a shuffled
    semi-join on the passage key — still linear, never pairwise.

    Returns (doc_id, n_passages, n_contaminated, contaminated_frac).
    """
    corpus_sh = shingles(corpus, n=window, id_col=id_col, text_col=text_col)
    bench_sh = (
        shingles(benchmark, n=window, id_col=bench_id_col,
                 text_col=bench_text_col)
        .select("shingle")
        .distinct()
    )
    # one pass: mark each passage against the broadcast set (left join
    # keeps every passage), then a single per-document aggregate counts
    # totals and hits together — one corpus scan, one shuffle
    marked = corpus_sh.join(
        F.broadcast(bench_sh.withColumn("__hit", F.lit(1))), "shingle", "left"
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum(F.coalesce("__hit", F.lit(0))).alias("n_contaminated"),
    ).select(
        "doc_id",
        "n_passages",
        "n_contaminated",
        round_div(F.col("n_contaminated"), F.col("n_passages"), 4)
        .alias("contaminated_frac"),
    )


def _bloom_positions_sql(key_sql: str, k: int, m_bits: int) -> str:
    """SQL array expression of ``k`` Bloom bit positions for a string
    key: position_i = md5('<i>:' || key) first-8-hex-digits % m_bits.
    Pure md5 arithmetic — Spark's conv() and DuckDB's
    ('0x'||hex)::UBIGINT parse the same digits, so an oracle replays
    every position (and therefore every hit, false positives included)
    exactly. 8 hex digits = 32 bits, so the BIGINT never overflows."""
    return (
        "array("
        + ", ".join(
            f"CAST(conv(substring(md5(CAST(concat('{i}:', {key_sql}) AS BINARY"
            f")), 1, 8), 16, 10) AS BIGINT) % {m_bits}"
            for i in range(k)
        )
        + ")"
    )


def bloom_bitmap(
    keys: DataFrame,
    key_col: str = "key",
    m_bits: int = 1 << 14,
    k: int = 3,
) -> DataFrame:
    """Build a Bloom filter over ``keys`` as a ONE-ROW DataFrame
    (``__bloom``: map<long, long> of 64-bit words, absent words = 0) —
    the broadcastable membership sketch for join pruning: probe a
    100 TB corpus against a benchmark/blocklist key set and only
    bloom-hits proceed to the exact check (the pattern Spark's own
    runtime row-group filters use, built here from deterministic md5
    bits so ANY engine replays it — no engine-private hash).

    Scale: positions explode to k rows per key, pack via
    ``groupBy(word).bit_or`` (map-side partial; at most m_bits/64
    result rows), then one tiny map aggregate. m_bits is a driver-side
    constant: size it ~10 bits/key for ~1% FP at k=3."""
    pos_arr = _bloom_positions_sql(key_col, k, m_bits)
    packed = (
        keys.select(F.explode(F.expr(pos_arr)).alias("p"))
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            (F.col("p") % 64).cast("int").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").alias("bits"))
    )
    return packed.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("w", "bits")))
        ).alias("__bloom")
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str = "key",
    out_col: str = "bloom_hit",
    m_bits: int = 1 << 14,
    k: int = 3,
) -> DataFrame:
    """Probe every row of ``df`` against a :func:`bloom_bitmap` (built
    with the SAME m_bits and k): adds ``out_col`` boolean. Guaranteed
    no false negatives (a true member always hits); false-positive
    rate ~(1 - e^(-k*n/m))^k. The bloom rides as one broadcast row;
    the probe is pure map-side bit arithmetic — zero shuffle on df."""
    pos_arr = _bloom_positions_sql(key_col, k, m_bits)
    hit = F.expr(
        f"forall({pos_arr}, p -> ((shiftright(coalesce(element_at(__bloom, "
        "CAST(p DIV 64 AS BIGINT)), CAST(0 AS BIGINT)), "
        "CAST(p % 64 AS INT)) & 1) = 1))"
    )
    return (
        df.crossJoin(F.broadcast(bloom))
        .withColumn(out_col, hit)
        .drop("__bloom")
    )


def rowwise_simhash64(text_col: str = "text") -> "F.Column":
    """64-bit SimHash as ONE map-side column expression (no shuffle,
    no aggregate) — bit-identical to ``simhash(docs, bits=64)`` but
    computable per row, which is what makes it legal inside a
    Structured Streaming projection (streaming/dedup_stream.py's
    near-dup stage: a stateless fingerprint + a watermarked dedup,
    where the batch operator's two hash aggregates would be a
    disallowed chained stateful plan).

    The per-token 64-bit hash is the same two-conv md5 composition as
    the batch operator; the 64 bit-counters ride an array accumulator
    folded over the distinct tokens, and the finish lambda re-packs
    the sign vector into the (wrapping, signed) fingerprint long.
    Equivalence is unit-tested against the batch operator.
    """
    h64 = (
        "shiftleft(cast(conv(substring(md5(binary(t)), 1, 8), 16, 10) as bigint), 32)"
        " | cast(conv(substring(md5(binary(t)), 9, 8), 16, 10) as bigint)"
    )
    return F.expr(
        f"""
        aggregate(
          transform(array_distinct(split({text_col}, ' ')), t -> {h64}),
          array_repeat(cast(0 as bigint), 64),
          (acc, h) -> zip_with(acc, sequence(0, 63),
                               (a, b) -> a + (shiftright(h, b) & 1) * 2 - 1),
          acc -> aggregate(
            zip_with(acc, sequence(0, 63),
                     (s, b) -> if(s > 0, shiftleft(cast(1 as bigint), b),
                                  cast(0 as bigint))),
            cast(0 as bigint), (x, y) -> x + y)
        )
        """
    )
