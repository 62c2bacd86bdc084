"""Similarity search over embedding columns (array<float>).

``cosine_topk`` is the exact brute-force baseline: a broadcast of the
query set against the corpus, dot products computed with higher-order
functions (JVM-side, no Python). Deterministic: accumulation is
left-to-right in list order in double precision, so any IEEE-754
engine (incl. the DuckDB oracle) produces bit-identical sums.

``lsh_topk`` is the scale path: random-hyperplane signs bucket the
corpus so each query only scans its own bucket (plus optionally
neighboring buckets). Hyperplanes are derived from md5 of the
(plane, dimension) index — reproducible, no RNG state.

At 100 TB: corpus side stays partitioned, query side broadcasts;
for huge query sets swap to a bucket-bucket join on the LSH key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..caching import owned_persist


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return emb.withColumn("__v", v).withColumn("__norm", F.sqrt(_dot(F.col("__v"), F.col("__v"))))


def cosine_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every row matching query_pred."""
    n = with_norm(emb, vec_col)
    q = n.filter(query_pred).select(
        F.col(id_col).alias("qid"), F.col("__v").alias("qv"), F.col("__norm").alias("qn")
    )
    c = n.select(
        F.col(id_col).alias("vid"), F.col("__v").alias("cv"), F.col("__norm").alias("cn")
    )
    sims = (
        F.broadcast(q)
        .join(c, F.col("qid") != F.col("vid"))
        .select(
            "qid",
            "vid",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vid", "sim")
    )


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int | None = None,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: every (a, b) with a < b
    and cosine(a, b) >= threshold, the similarity rounded to 6 places
    (same determinism contract as :func:`cosine_topk`). Feed the pairs
    into ``operators/graph.py::connected_components`` for survivor
    selection, exactly like the MinHash clustering path.

    ``planes=None`` is the exact O(n^2/2) baseline (a self-join with
    the a<b canonicalization — fine for verification scales and as the
    per-bucket kernel). Passing ``planes`` switches to the scale path:
    candidates are generated only WITHIN a random-hyperplane LSH
    bucket (:func:`lsh_bucket`) before the exact cosine verify —
    near-linear at 100 TB, with the usual LSH recall trade-off
    (pairs straddling a hyperplane are missed; raise recall by
    unioning several independent plane sets like MinHash bands).
    """
    n = with_norm(emb, vec_col)
    if planes is not None:
        n = lsh_bucket(n, planes=planes, dim=dim, vec_col="__v")
        join_cond = (F.col("a_id") < F.col("b_id")) & (
            F.col("a_bucket") == F.col("b_bucket")
        )
        cols = [id_col, "__v", "__norm", "bucket"]
    else:
        join_cond = F.col("a_id") < F.col("b_id")
        cols = [id_col, "__v", "__norm"]
    a = n.select(*[F.col(c).alias(f"a_{c}") for c in cols]).withColumnRenamed(
        f"a_{id_col}", "a_id"
    )
    b = n.select(*[F.col(c).alias(f"b_{c}") for c in cols]).withColumnRenamed(
        f"b_{id_col}", "b_id"
    )
    sim = F.round(
        _dot(F.col("a___v"), F.col("b___v"))
        / (F.col("a___norm") * F.col("b___norm")),
        6,
    )
    return (
        a.join(b, join_cond)
        .select("a_id", "b_id", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def _hyperplane(planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — no RNG state."""
    import hashlib

    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append((h / 0xFFFFFFFF) * 2.0 - 1.0)
        out.append(row)
    return out


def lsh_bucket(
    emb: DataFrame, planes: int = 8, dim: int = 64, vec_col: str = "embedding"
) -> DataFrame:
    """Random-hyperplane LSH bucket id per row (sign pattern as int)."""
    hp = _hyperplane(planes, dim)
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for p, row in enumerate(hp):
        plane = F.array(*[F.lit(x) for x in row])
        sign = (_dot(v, plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(sign, p)
    return emb.withColumn("bucket", bucket)


def _attach_centroids(df: DataFrame, cdf: DataFrame) -> DataFrame:
    """Attach the centroid table (a ``(cid int, cvec array<double>)``
    DataFrame) to every row as ONE array column (``__cents``:
    array<struct<cid, cvec>>) via a broadcast of a single-row
    aggregate — a cross join that multiplies nothing (one build row).
    The centroid DATA travels as broadcast rows, not as Catalyst
    literals, so the expression tree is O(1) in nlist: nlist=10^4..10^5
    (what real SemDeDup needs at 100 TB) costs only the broadcast bytes
    (nlist x dim x 8), where the old literal-array encoding hit the
    expression-size ceiling around nlist~1k."""
    one = cdf.agg(
        F.array_sort(F.collect_list(F.struct("cid", "cvec"))).alias("__cents")
    )
    return df.crossJoin(F.broadcast(one))


def _centroids_as_df(spark, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    return spark.createDataFrame(
        [(int(cid), [float(x) for x in vec]) for cid, vec in centroids],
        "cid int, cvec array<double>",
    )


def _with_centroid_arr(df: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """List-input convenience over :func:`_attach_centroids` (used by
    the persisted-index path, whose centroid table round-trips through
    parquet as rows anyway)."""
    return _attach_centroids(df, _centroids_as_df(df.sparkSession, centroids))


def _cand_structs(v: Column) -> Column:
    """Per-row (negated dot, cid) struct array over the broadcast
    ``__cents`` column: array_min gives min-by-distance with
    ascending-cid tiebreak (same argmin the oracle replays), array_sort
    + slice gives the nprobe closest cells."""
    return F.transform(
        F.col("__cents"),
        lambda c: F.struct((-_dot(v, c["cvec"])).alias("d"), c["cid"].alias("cid")),
    )


def _nearest_cid(v: Column) -> Column:
    return F.array_min(_cand_structs(v)).getField("cid")


def ivf_centroids_df(
    emb: DataFrame,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF coarse quantizer, fully DataFrame-side:
    Lloyd iterations seeded from the ``nlist`` corpus vectors with the
    smallest md5(id) (a reproducible pseudo-random sample — no RNG
    state, same centroids every run/engine). Returns the centroid
    table ``(cid int, cvec array<double>)``; NOTHING reaches the
    driver — each iteration ends in a ``localCheckpoint`` that
    materializes the nlist-row table and truncates lineage (swap for a
    durable checkpoint on a cluster), so at nlist=10^5 the loop never
    serializes centroids through the driver the way a per-round
    collect would.

    Each iteration is one distributed pass: nearest-centroid assignment
    attaches the centroid table as a broadcast single-row array
    (:func:`_attach_centroids` — centroid DATA, not Catalyst
    literals, so nlist scales to 10^4..10^5 cells) and reduces it
    row-locally with array_min; the new means come from one posexplode
    + the two-level pinned fold (nlist*dim groups). Empty cells keep
    their previous centroid (a left join + coalesce — deterministic).
    This mirrors k-means|| minus the sampling rounds, acceptable
    because IVF needs a usable coarse partition, not an optimal
    clustering.

    Cell means are NOT ``avg`` (whose float summation order is
    engine/partitioning-dependent): each (cell, dimension) mean is the
    two-level pinned fold of ``functions/folds.py::ordered_fold_sum``
    — members bucketed by ``id % 64``, folded per bucket in id order,
    bucket sums folded in bucket order, divided by the exact count.
    Deterministic AND bounded: no task ever materializes a whole cell
    as one array (the old single-level fold did — at nlist=16 over
    100 TB a cell is ~6% of the corpus), and any IEEE-754 engine
    replays the centroids bit-for-bit — DuckDB does exactly that in
    the ``z_embedding_ivf_topk`` value oracle by replaying the same
    bucket structure. Ids must be non-negative integers (they key the
    fold order and the bucket residue).
    """
    from ..functions.folds import ordered_fold_sum

    n = with_norm(emb, vec_col)
    order = [
        F.md5(F.col(id_col).cast("string").cast("binary")),
        F.col(id_col),
    ]
    # orderBy + limit = TakeOrderedAndProject (global top-nlist); the
    # row_number window then runs over those nlist rows only
    seeds = n.select(F.col(id_col), "__v").orderBy(*order).limit(nlist)
    cdf = seeds.select(
        (F.row_number().over(Window.orderBy(*order)) - 1).alias("cid"),
        F.col("__v").alias("cvec"),
    ).localCheckpoint()
    for _ in range(iters):
        assigned = _attach_centroids(n, cdf).select(
            F.col(id_col).alias("__vid"),
            _nearest_cid(F.col("__v")).alias("cid"),
            "__v",
        )
        means = (
            ordered_fold_sum(
                assigned.select("cid", "__vid", F.posexplode("__v").alias("pos", "x")),
                ["cid", "pos"],
                "__vid",
                "x",
                out_col="s",
                count_col="cnt",
            )
            .select("cid", "pos", (F.col("s") / F.col("cnt")).alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cid", F.col("pm.m").alias("mvec"))
        )
        # empty cells keep their previous centroid (deterministic)
        cdf = cdf.join(means, "cid", "left").select(
            "cid", F.coalesce("mvec", "cvec").alias("cvec")
        ).localCheckpoint()
    return cdf


def ivf_centroids(
    emb: DataFrame,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Driver-side list view of :func:`ivf_centroids_df` (one collect
    at the END — nlist rows, used by the persisted-index writer and
    tests; the query operators stay DataFrame-side throughout)."""
    rows = (
        ivf_centroids_df(emb, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col)
        .orderBy("cid")
        .collect()
    )
    return [(int(r["cid"]), [float(x) for x in r["cvec"]]) for r in rows]


def ivf_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF index: corpus rows live in their
    nearest-centroid cell; each query scans only its ``nprobe`` closest
    cells instead of the whole corpus.

    Scale path vs ``lsh_topk``: cells are balanced by construction
    (Lloyd means follow density, unlike fixed hyperplane cuts), and
    ``nprobe`` trades recall for scan cost explicitly. The probe
    explode keeps candidate generation an equi-join on cell id —
    corpus stays partitioned by cid, query side broadcasts; no cross
    product anywhere. At 100 TB, write the corpus bucketed by cid so
    repeated query batches skip the assignment shuffle.
    """
    cdf = ivf_centroids_df(emb, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col)
    # assignment + query probe reuse the normed corpus
    n = owned_persist(with_norm(emb, vec_col))
    nc = _attach_centroids(n, cdf)
    corpus = nc.select(
        F.col(id_col).alias("vid"),
        F.col("__v").alias("cv"),
        F.col("__norm").alias("cn"),
        _nearest_cid(F.col("__v")).alias("cid"),
    )
    # per-query ordered centroid list -> first nprobe cell ids
    q = (
        nc.filter(query_pred)
        .select(
            F.col(id_col).alias("qid"),
            F.col("__v").alias("qv"),
            F.col("__norm").alias("qn"),
            F.explode(
                F.slice(F.array_sort(_cand_structs(F.col("__v"))), 1, nprobe)
                .getField("cid")
            ).alias("cid"),
        )
    )
    sims = (
        F.broadcast(q)
        .join(corpus, "cid")
        .filter(F.col("qid") != F.col("vid"))
        .select(
            "qid",
            "vid",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vid", "sim")
    )


def lsh_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    b = with_norm(lsh_bucket(emb, planes, dim, vec_col), vec_col)
    q = b.filter(query_pred).select(
        F.col(id_col).alias("qid"), F.col("__v").alias("qv"),
        F.col("__norm").alias("qn"), F.col("bucket").alias("qb"),
    )
    c = b.select(
        F.col(id_col).alias("vid"), F.col("__v").alias("cv"),
        F.col("__norm").alias("cn"), F.col("bucket").alias("cb"),
    )
    sims = (
        F.broadcast(q)
        .join(c, (F.col("qb") == F.col("cb")) & (F.col("qid") != F.col("vid")))
        .select(
            "qid", "vid",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vid", "sim")
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.9,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: embeddings are bucketed
    into IVF cells (the deterministic md5-seeded Lloyd quantizer of
    :func:`ivf_centroids`), pairwise cosine runs only WITHIN a cell,
    and a row is a duplicate when some lower-id cell-mate sits at
    cosine >= threshold (min-id survivor — deterministic and
    engine-replayable, where the published centroid-distance tiebreak
    is float-order-sensitive). Published recipe: Abbas et al. 2023
    (SemDeDup) — k-means cells, within-cell pruning.

    Scale: cells bound the candidate count to sum(|cell|^2)/2 — the
    same complexity cap the LSH bands / simhash segments give the
    token-level dedupers — and Lloyd cells follow density, so they
    stay balanced where fixed hyperplane cuts skew. The per-cell join
    is a plain equi-join on cid (no cross product); at 100 TB write
    the corpus bucketed by cid once and reruns skip the assignment
    shuffle entirely.

    Returns (id, cid, is_duplicate) for every input row.
    """
    cdf = ivf_centroids_df(
        emb, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col
    )
    n = with_norm(emb, vec_col)
    corpus = _attach_centroids(n, cdf).select(
        F.col(id_col).alias("vid"),
        F.col("__v").alias("cv"),
        F.col("__norm").alias("cn"),
        _nearest_cid(F.col("__v")).alias("cid"),
    )
    a = corpus.select(F.col("vid").alias("a_id"), F.col("cv").alias("av"),
                      F.col("cn").alias("an"), "cid")
    b = corpus.select(F.col("vid").alias("b_id"), F.col("cv").alias("bv"),
                      F.col("cn").alias("bn"), "cid")
    sim = F.round(_dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 6)
    dups = (
        a.join(b, "cid")
        .where(F.col("a_id") < F.col("b_id"))
        .where(sim >= threshold)
        .select(F.col("b_id").alias("vid"))
        .distinct()
    )
    return (
        corpus.select("vid", "cid")
        .join(dups.withColumn("__dup", F.lit(True)), "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            "cid",
            F.coalesce("__dup", F.lit(False)).alias("is_duplicate"),
        )
    )


def jl_project(
    emb: DataFrame,
    out_dim: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection to ``out_dim``
    dimensions — the standard pre-step that makes downstream ANN /
    clustering / SemDeDup cheaper by shrinking vectors while
    approximately preserving pairwise distances (distortion
    ~1 ± sqrt(log n / out_dim)). The projection matrix is the sign
    JL construction (Achlioptas 2003): entry (o, i) is
    ``±1/sqrt(out_dim)`` with the sign from md5(o:i) parity — no RNG
    state, every engine rebuilds the identical matrix.

    Rows are emitted LONG (id, pos, value rounded to 6) so the result
    is oracle-comparable; re-nest with collect_list(struct(pos, x))
    when an array column is wanted. Each output value is a
    left-to-right fold over the input in index order — deterministic
    double accumulation, replayed by the DuckDB oracle.

    Scale: pure map-side arithmetic, zero shuffles. The matrix rides
    as out_dim x dim literal constants — fine at embedding scale
    (16 x 64 here); for very large matrices ship it as a broadcast
    (o, i, w) table joined on position instead (the
    :func:`_attach_centroids` pattern).
    """
    import hashlib

    scale = 1.0 / (out_dim ** 0.5)
    v = F.col(vec_col).cast("array<double>")
    outs = []
    for o in range(out_dim):
        row = []
        for i in range(dim):
            parity = int(hashlib.md5(f"{o}:{i}".encode()).hexdigest()[:2], 16) % 2
            row.append(scale if parity == 0 else -scale)
        outs.append(
            F.struct(
                F.lit(o).alias("pos"),
                F.round(_dot(v, F.array(*[F.lit(x) for x in row])), 6).alias("x"),
            )
        )
    return emb.select(
        F.col(id_col).alias(id_col), F.explode(F.array(*outs)).alias("p")
    ).select(id_col, F.col("p.pos").alias("pos"), F.col("p.x").alias("x"))


def _pq_subrows(
    emb: DataFrame, m: int, dim: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, sub, sv): each vector split into ``m`` contiguous
    ``dim/m``-wide subvectors — one map-side explode, no shuffle."""
    w = dim // m
    v = F.col(vec_col).cast("array<double>")
    return emb.select(
        F.col(id_col).alias("__vid"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("sub"), F.slice(v, j * w + 1, w).alias("sv")
                )
                for j in range(m)
            ])
        ).alias("__s"),
    ).select("__vid", F.col("__s.sub").alias("sub"), F.col("__s.sv").alias("sv"))


def _attach_pq_cents(df: DataFrame, cdf: DataFrame) -> DataFrame:
    """Broadcast the full (sub, cid, cvec) codebook table onto every
    row as one sorted struct array (same single-row-aggregate shape as
    :func:`_attach_centroids` — codebook DATA, not Catalyst literals,
    so m x ksub scales far past the literal-expression ceiling)."""
    one = cdf.agg(
        F.array_sort(F.collect_list(F.struct("sub", "cid", "cvec"))).alias("__pqc")
    )
    return df.crossJoin(F.broadcast(one))


def _pq_nearest_cid(sub_col: Column, sv: Column) -> Column:
    """argmin_cid of ||sv - c||^2 within the row's own subspace,
    ascending-cid tiebreak; the ||sv||^2 term is constant per row, so
    the comparator uses dot(c,c) - 2*dot(sv,c)."""
    cands = F.filter(F.col("__pqc"), lambda c: c["sub"] == sub_col)
    return F.array_min(
        F.transform(
            cands,
            lambda c: F.struct(
                (_dot(c["cvec"], c["cvec"]) - F.lit(2.0) * _dot(sv, c["cvec"]))
                .alias("d"),
                c["cid"].alias("cid"),
            ),
        )
    ).getField("cid")


def pq_codebooks_df(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic product-quantization codebooks (Jégou et al.
    2011): the vector space splits into ``m`` contiguous subspaces and
    each trains its own ``ksub``-centroid quantizer — here all ``m``
    Lloyd recursions run as ONE DataFrame loop with the subspace index
    as an extra grouping key, so the plan count is independent of
    ``m``. Seeding, iteration and determinism mirror
    :func:`ivf_centroids_df`: seeds are the ``ksub`` corpus vectors
    with the smallest md5(id) (their subvectors seed every subspace),
    assignment is a broadcast-codebook argmin by L2 with ascending-cid
    tiebreak, and every (sub, cell, dimension) mean is the two-level
    pinned fold of ``functions/folds.py`` — bit-replayable by any
    IEEE-754 engine, no task ever materializing a whole cell, and each
    iteration ends in a lineage-truncating localCheckpoint.

    Returns the codebook table (sub int, cid int, cvec array<double>).
    """
    if dim % m != 0:
        raise ValueError("dim must divide into m equal subspaces")
    from ..functions.folds import ordered_fold_sum

    sub = _pq_subrows(emb, m, dim, id_col, vec_col)
    order = [
        F.md5(F.col(id_col).cast("string").cast("binary")),
        F.col(id_col),
    ]
    seed_ids = (
        emb.select(F.col(id_col)).orderBy(*order).limit(ksub)
        .select(
            F.col(id_col).alias("__vid"),
            (F.row_number().over(Window.orderBy(*order)) - 1).alias("cid"),
        )
    )
    cdf = (
        sub.join(F.broadcast(seed_ids), "__vid")
        .select("sub", "cid", F.col("sv").alias("cvec"))
        .localCheckpoint()
    )
    # ordered_fold_sum needs a non-negative integral fold order: the id
    # itself when integral (keeps the r8 oracle's fold order bit-exact),
    # a 60-bit md5 of the id otherwise (string ids crash an ANSI cast)
    integral = dict(emb.dtypes)[id_col] in ("tinyint", "smallint", "int", "bigint")
    ord_expr = (
        F.col("__vid").cast("long")
        if integral
        else F.expr(
            "cast(conv(substring(md5(binary(cast(__vid as string))), 1, 15),"
            " 16, 10) as bigint)"
        )
    )
    for _ in range(iters):
        assigned = _attach_pq_cents(sub, cdf).select(
            "__vid",
            "sub",
            "sv",
            _pq_nearest_cid(F.col("sub"), F.col("sv")).alias("cid"),
        )
        means = (
            ordered_fold_sum(
                assigned.select(
                    "sub", "cid", ord_expr.alias("__ord"),
                    F.posexplode("sv").alias("pos", "x"),
                ),
                ["sub", "cid", "pos"],
                "__ord",
                "x",
                out_col="s",
                count_col="cnt",
            )
            .select("sub", "cid", "pos", (F.col("s") / F.col("cnt")).alias("mval"))
            .groupBy("sub", "cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mval"))).alias("pm"))
            .select("sub", "cid", F.col("pm.mval").alias("mvec"))
        )
        cdf = (
            cdf.join(means, ["sub", "cid"], "left")
            .select("sub", "cid", F.coalesce("mvec", "cvec").alias("cvec"))
            .localCheckpoint()
        )
    return cdf


def pq_encode(
    emb: DataFrame,
    cdf: DataFrame,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codes: (id, sub, code) — each subvector's nearest codebook
    centroid. ``m`` small ints replace ``dim`` floats (the compressed
    corpus representation ADC scans). Map-side against the broadcast
    codebook; no shuffle."""
    sub = _pq_subrows(emb, m, dim, id_col, vec_col)
    return _attach_pq_cents(sub, cdf).select(
        F.col("__vid").alias(id_col),
        "sub",
        _pq_nearest_cid(F.col("sub"), F.col("sv")).alias("code"),
    )


def pq_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k nearest neighbors by PQ asymmetric distance
    computation (ADC): the corpus is stored as ``m``-byte codes, each
    query builds an (m x ksub) subspace distance table against the
    codebook, and a candidate's approximate squared L2 distance is the
    sum of its codes' table entries — a lookup-join, never a
    full-dimension dot product per pair.

    Scale: ADC is a LINEAR scan made cheap (m lookups per corpus row
    instead of dim multiplies; the 8x-64x compression is what lets the
    scan stay in memory) — :func:`write_ivfpq_index` /
    :func:`ivfpq_topk` IS that composition with IVF cell pruning for
    sublinear candidate generation, exactly as FAISS pairs IVF with
    PQ; use this flat scan when the whole corpus fits a pass. The
    distance table and codebook ride as broadcasts; the per-(query,
    candidate) sum folds in pinned subspace order (m rows per group —
    bounded), so results replay bit-identically in the DuckDB oracle.

    Returns (qid, rank, vid, adist) — ascending approximate distance,
    ties by vid.
    """
    cdf = pq_codebooks_df(
        emb, m=m, ksub=ksub, iters=iters, dim=dim, id_col=id_col, vec_col=vec_col
    )
    codes = pq_encode(emb, cdf, m=m, dim=dim, id_col=id_col, vec_col=vec_col)
    qsub = _pq_subrows(emb.filter(query_pred), m, dim, id_col, vec_col)
    dtab = (
        qsub.join(F.broadcast(cdf), "sub")
        .select(
            F.col("__vid").alias("qid"),
            "sub",
            "cid",
            (
                _dot(F.col("sv"), F.col("sv"))
                - F.lit(2.0) * _dot(F.col("sv"), F.col("cvec"))
                + _dot(F.col("cvec"), F.col("cvec"))
            ).alias("d"),
        )
    )
    cand = (
        F.broadcast(dtab)
        .join(
            codes.select(F.col(id_col).alias("vid"), "sub", F.col("code").alias("cid")),
            ["sub", "cid"],
        )
        .filter(F.col("qid") != F.col("vid"))
    )
    adist = (
        cand.groupBy("qid", "vid")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("sub", "d"))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["d"],
                ),
                6,
            ).alias("adist")
        )
    )
    # ADC scans the WHOLE corpus per query, so a top-k window keyed by
    # qid alone would pin a corpus-sized group in one task. Exact
    # two-stage selection instead: local top-k within each of 64
    # deterministic vid-buckets (bounded, AQE-splittable groups), then
    # top-k of the surviving <= 64k rows per query — top-k of bucket
    # top-ks is exactly the global top-k.
    # bucket on a hash of the id, not the id itself — a string vid
    # would cast to null under pmod and collapse every candidate into
    # one null bucket, reinstating the corpus-sized group
    bucketed = adist.withColumn(
        "__b", F.pmod(F.abs(F.hash("vid")), F.lit(64))
    )
    w_local = Window.partitionBy("qid", "__b").orderBy(
        F.asc("adist"), F.asc("vid")
    )
    pruned = (
        bucketed.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adist"), F.asc("vid"))
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vid", "adist")
    )


def write_ivf_index(
    emb: DataFrame,
    path: str,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF index: the normed corpus written as parquet
    PARTITIONED BY cell id, plus the centroid table as its own parquet.
    This is the build-once half of the 100 TB query path: the Lloyd
    passes and the assignment run exactly once; every later query
    batch (:func:`ivf_topk_on_index`) reads only its ``nprobe`` cells'
    FILES — partition pruning on ``cid=``-style directories — instead
    of re-scanning and re-assigning the corpus. The corpus layout also
    co-locates each cell, so the probe join needs no corpus-side
    shuffle."""
    cdf = ivf_centroids_df(
        emb, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col
    )
    n = with_norm(emb, vec_col)
    corpus = _attach_centroids(n, cdf).select(
        F.col(id_col).alias("vid"),
        F.col("__v").alias("cv"),
        F.col("__norm").alias("cn"),
        _nearest_cid(F.col("__v")).alias("cid"),
    )
    corpus.write.mode("overwrite").partitionBy("cid").parquet(path + "/corpus")
    cdf.write.mode("overwrite").parquet(path + "/centroids")


def ivf_topk_on_index(
    queries: DataFrame,
    path: str,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The query half of :func:`write_ivf_index`: approximate top-k
    for every row of ``queries`` against the persisted index. Probe
    cell ids come from the stored centroid table (broadcast DATA, same
    argmin as the builder); the candidate scan is an equi-join of the
    broadcast query side onto the cid-partitioned corpus, so dynamic
    partition pruning / partition filters restrict the read to the
    probed cells' files — the corpus is never rescanned whole, and a
    fresh query batch costs O(batch x corpus/nlist x nprobe).

    Same result contract as :func:`ivf_topk` run with the same
    (nlist, iters, nprobe, k) on the same corpus."""
    spark = queries.sparkSession
    cents = spark.read.parquet(path + "/centroids")
    centroids = [
        (int(r["cid"]), [float(x) for x in r["cvec"]])
        for r in cents.collect()
    ]
    centroids.sort()
    corpus = spark.read.parquet(path + "/corpus")
    q = _with_centroid_arr(with_norm(queries, vec_col), centroids).select(
        F.col(id_col).alias("qid"),
        F.col("__v").alias("qv"),
        F.col("__norm").alias("qn"),
        F.explode(
            F.slice(F.array_sort(_cand_structs(F.col("__v"))), 1, nprobe)
            .getField("cid")
        ).alias("cid"),
    )
    sims = (
        F.broadcast(q)
        .join(corpus, "cid")
        .filter(F.col("qid") != F.col("vid"))
        .select(
            "qid",
            "vid",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vid", "sim")
    )


def _with_residual(
    df: DataFrame, cdf_ivf: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, cid, rvec): each vector's coarse cell plus its RESIDUAL
    against that cell's centroid (``rvec = v - centroid[cid]``,
    elementwise double) — the encoding input of FAISS's
    ``by_residual=true`` IVFPQ. Centroids travel twice as broadcast
    DATA: once as the argmin array, once as a (cid, cvec) join side."""
    assigned = _attach_centroids(with_norm(df, vec_col), cdf_ivf).select(
        F.col(id_col), F.col("__v"), _nearest_cid(F.col("__v")).alias("cid")
    )
    return assigned.join(F.broadcast(cdf_ivf), "cid").select(
        F.col(id_col),
        "cid",
        F.zip_with("__v", "cvec", lambda x, c: x - c).alias("rvec"),
    )


def write_ivfpq_index(
    emb: DataFrame,
    path: str,
    nlist: int = 8,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    by_residual: bool = False,
) -> None:
    """Build-once half of IVFADC (Jégou et al. 2011 §IV — the FAISS
    IndexIVFPQ recipe): train the IVF coarse quantizer AND the PQ
    codebooks, then persist the corpus as m-byte PQ codes PARTITIONED
    BY coarse cell. Queries (:func:`ivfpq_topk`) probe ``nprobe``
    cells and ADC-rank only those cells' codes — sublinear candidate
    generation over a compressed corpus, the configuration a 100 TB
    corpus actually runs (neither the flat ADC scan of
    :func:`pq_topk` nor the full-vector cells of
    :func:`write_ivf_index`).

    ``by_residual`` selects what the codebooks are trained on — BOTH
    published FAISS configurations are implemented and oracle-checked:

    - ``False``: RAW vectors. Codes are cell-independent (a vector
      can be re-assigned without re-encoding) and the ADC arithmetic
      is identical to the flat :func:`pq_topk` family's.
    - ``True`` (the FAISS default): CELL RESIDUALS ``v -
      centroid[cell]`` — residual magnitudes are smaller than raw
      ones, so the same code budget quantizes finer (better recall at
      equal bytes); the cost is one distance table PER (query,
      probed cell) instead of per query, and codes that must be
      re-encoded if a vector changes cell.

    Query with the SAME ``by_residual`` value — the layouts are not
    interchangeable (codes mean different things).

    Layout: ``codes/`` (vid, sub, code; partitioned by cid),
    ``pq_codebooks/`` (sub, cid, cvec), ``centroids/`` (cid, cvec).
    """
    from ..parallel import run_parallel

    if by_residual:
        # the residual path is sequential by data dependence: the PQ
        # trainer consumes residuals, which need the coarse centroids
        cdf_ivf = ivf_centroids_df(
            emb, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col
        )
        # res is consumed by BOTH the codebook trainer and the
        # encoder: persist (released in the finally — this function
        # fully materializes before returning, so no cache outlives
        # the builder)
        res = _with_residual(emb, cdf_ivf, id_col, vec_col).persist()
        try:
            train = res.select(id_col, "rvec")
            cdf_pq = pq_codebooks_df(
                train, m=m, ksub=ksub, iters=iters, dim=dim, id_col=id_col,
                vec_col="rvec",
            )
            codes = pq_encode(
                train, cdf_pq, m=m, dim=dim, id_col=id_col, vec_col="rvec"
            ).select(F.col(id_col).alias("vid"), "sub", "code")
            cells = res.select(F.col(id_col).alias("vid"), "cid")
            _write_ivfpq_layout(path, codes, cells, cdf_pq, cdf_ivf)
        finally:
            res.unpersist()
        return

    # raw-vector mode: the coarse quantizer and the PQ codebooks train
    # on the SAME corpus but not on each other — two independent Lloyd
    # loops (each a chain of localCheckpoint actions) that the driver
    # previously serialized. Run them concurrently (guide §2.6); the
    # training result frames are localCheckpointed, so the encode /
    # write phase below reads materialized state from either thread.
    cdf_ivf, cdf_pq = run_parallel([
        lambda: ivf_centroids_df(
            emb, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col
        ),
        lambda: pq_codebooks_df(
            emb, m=m, ksub=ksub, iters=iters, dim=dim, id_col=id_col,
            vec_col=vec_col,
        ),
    ])
    codes = pq_encode(
        emb, cdf_pq, m=m, dim=dim, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col).alias("vid"), "sub", "code")
    cells = _attach_centroids(with_norm(emb, vec_col), cdf_ivf).select(
        F.col(id_col).alias("vid"),
        _nearest_cid(F.col("__v")).alias("cid"),
    )
    _write_ivfpq_layout(path, codes, cells, cdf_pq, cdf_ivf)


def _write_ivfpq_layout(path, codes, cells, cdf_pq, cdf_ivf) -> None:
    """The three index writes — disjoint paths, independent plans —
    as concurrent driver jobs (guide §2.6)."""
    from ..parallel import run_parallel

    run_parallel([
        lambda: (
            codes.join(cells, "vid")
            .write.mode("overwrite")
            .partitionBy("cid")
            .parquet(path + "/codes")
        ),
        lambda: cdf_pq.write.mode("overwrite").parquet(path + "/pq_codebooks"),
        lambda: cdf_ivf.write.mode("overwrite").parquet(path + "/centroids"),
    ])


def ivfpq_topk(
    queries: DataFrame,
    path: str,
    k: int = 5,
    nprobe: int = 3,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    by_residual: bool = False,
) -> DataFrame:
    """Query half of :func:`write_ivfpq_index` — IVFADC proper: each
    query probes its ``nprobe`` nearest coarse cells (broadcast
    centroid DATA, same argmin as the builder), the (qid, cid) probe
    pairs broadcast-join onto the cid-partitioned code table so
    dynamic partition pruning restricts the read to the probed cells'
    FILES, and the surviving candidates are ranked by PQ asymmetric
    distance (per-query subspace lookup tables against the stored
    codebooks, summed in pinned subspace order — m bounded rows per
    (query, candidate) group, bit-replayable by the oracle).

    ``by_residual`` must match the index build. In residual mode the
    lookup table is built per (query, PROBED CELL) — the query's
    residual against that cell's centroid scored against the
    residual-trained codebooks, exactly FAISS's per-cell table in
    IndexIVFPQ — an nprobe-times-larger (still tiny, broadcast)
    table for finer quantization at the same code bytes.

    Cost per query batch: O(batch x nlist) probe argmin +
    O(batch x corpus/nlist x nprobe) m-lookup ADC sums — sublinear in
    the corpus and 8-64x smaller I/O than full vectors. Final top-k
    is the exact two-stage selection (hashed-vid local buckets, then
    per-query rank) — never a corpus-sized single-task window group.

    Returns (qid, rank, vid, adist) — ascending ADC distance, ties by
    vid.
    """
    spark = queries.sparkSession
    cents = spark.read.parquet(path + "/centroids")
    codes = spark.read.parquet(path + "/codes")
    cdf_pq = spark.read.parquet(path + "/pq_codebooks").select(
        "sub", F.col("cid").alias("pcid"), "cvec"
    )
    w = dim // m
    probes = _attach_centroids(with_norm(queries, vec_col), cents).select(
        F.col(id_col).alias("qid"),
        F.col("__v").alias("qv"),
        F.explode(
            F.slice(F.array_sort(_cand_structs(F.col("__v"))), 1, nprobe)
            .getField("cid")
        ).alias("cid"),
    )
    adc = (
        _dot(F.col("sv"), F.col("sv"))
        - F.lit(2.0) * _dot(F.col("sv"), F.col("cvec"))
        + _dot(F.col("cvec"), F.col("cvec"))
    )
    if by_residual:
        # one table per (query, probed cell): the query RESIDUAL
        # against that cell's centroid, sliced into subvectors
        qres = probes.join(
            F.broadcast(cents.select("cid", F.col("cvec").alias("__cc"))),
            "cid",
        ).select(
            "qid",
            "cid",
            F.zip_with("qv", "__cc", lambda x, c: x - c).alias("rv"),
        )
        qsub = qres.select(
            "qid",
            "cid",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(j).alias("sub"),
                        F.slice("rv", j * w + 1, w).alias("sv"),
                    )
                    for j in range(m)
                ])
            ).alias("__s"),
        ).select("qid", "cid", F.col("__s.sub").alias("sub"), F.col("__s.sv").alias("sv"))
        dtab = qsub.join(F.broadcast(cdf_pq), "sub").select(
            "qid", "cid", "sub", "pcid", adc.alias("d")
        )
    else:
        qsub = _pq_subrows(queries, m, dim, id_col, vec_col)
        dtab = (
            qsub.join(F.broadcast(cdf_pq), "sub")
            .select(
                F.col("__vid").alias("qid"),
                "sub",
                "pcid",
                adc.alias("d"),
            )
        )
    cand = (
        F.broadcast(probes.select("qid", "cid"))
        .join(codes, "cid")  # DPP: only probed cells' files are read
        .filter(F.col("qid") != F.col("vid"))
    )
    join_cond = (
        (cand["qid"] == dtab["qid"])
        & (cand["sub"] == dtab["sub"])
        & (cand["code"] == dtab["pcid"])
    )
    if by_residual:
        join_cond = join_cond & (cand["cid"] == dtab["cid"])
    adist = (
        cand.join(F.broadcast(dtab), join_cond)
        .select(cand["qid"], "vid", cand["sub"], "d")
        .groupBy("qid", "vid")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("sub", "d"))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["d"],
                ),
                6,
            ).alias("adist")
        )
    )
    bucketed = adist.withColumn(
        "__b", F.pmod(F.abs(F.hash("vid")), F.lit(64))
    )
    w_local = Window.partitionBy("qid", "__b").orderBy(
        F.asc("adist"), F.asc("vid")
    )
    pruned = (
        bucketed.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
    )
    w_final = Window.partitionBy("qid").orderBy(F.asc("adist"), F.asc("vid"))
    return (
        pruned.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vid", "adist")
    )


def ann_recall_at_k(
    approx: DataFrame, exact: DataFrame, k: int = 5
) -> DataFrame:
    """Recall@k of an approximate top-k result against the exact one —
    the evaluation metric every ANN deployment tracks (the FAISS
    recall/nprobe tradeoff curve, PERF.md round 10): per query,
    ``|approx ∩ exact| / k``. Both inputs are (qid, rank, vid, ...)
    shaped — any extra columns are ignored; queries present in
    ``exact`` but absent from ``approx`` score 0. The ratio is the
    integer-exact engine-portable half-up division
    (functions/portable.py::round_div), never a float round.

    Scale: one (qid, vid)-keyed semi-join plus one per-qid count —
    both hash on the query key; evaluation cost is O(queries × k),
    independent of corpus size.
    """
    from ..functions.portable import round_div

    a = approx.select("qid", "vid")
    e = exact.select("qid", "vid")
    hits = (
        e.join(a, ["qid", "vid"], "left_semi")
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        e.select("qid")
        .distinct()
        .join(hits, ["qid"], "left")
        .select(
            "qid",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            round_div(
                F.coalesce("n_hits", F.lit(0)), F.lit(k), 4
            ).alias("recall"),
        )
    )


def sq8_train(
    emb: DataFrame, dim: int = 64, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, range) over the corpus — the SQ8 scalar
    quantizer's entire training state (FAISS ScalarQuantizer
    QT_8bit). min/max are selections, not arithmetic, so the trained
    bounds are bit-identical in any engine. One aggregate pass; the
    collected state is 2 x dim floats (dimension-sized, driver-safe).
    """
    v = F.col(vec_col).cast("array<double>")
    rows = (
        emb.select(F.posexplode(v).alias("d", "x"))
        .groupBy("d")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    # a dim/data mismatch must be loud: a longer vector would
    # IndexError below, a shorter one would leave (0, 0) entries that
    # sq8_encode silently codes as 0 — both are caller bugs
    seen = {r.d for r in rows}
    if seen and (max(seen) >= dim or seen != set(range(dim))):
        raise ValueError(
            f"sq8_train: dim={dim} but data has dimensions "
            f"[{min(seen)}..{max(seen)}] covering {len(seen)} indexes"
        )
    mn = [0.0] * dim
    rng = [0.0] * dim
    for r in rows:
        mn[r.d] = float(r.mn)
        rng[r.d] = float(r.mx) - float(r.mn)
    return mn, rng


def sq8_encode(
    emb: DataFrame,
    mn: list[float],
    rng: list[float],
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-side SQ8 encode: each dimension linearly quantized to one
    byte, ``code_d = floor((x_d - min_d) * 255 / range_d + 0.5)`` —
    8x compression vs float64 (4x vs float32) with NO training beyond
    per-dim bounds, the cheap sibling of PQ. floor of IEEE-double
    arithmetic, so codes replay exactly in the oracle (round() would
    not — half-even vs half-up differs across engines). A degenerate
    dimension (range 0) encodes as 0. Pure column ops: no shuffle,
    no UDF.

    Returns (id_col, codes array<int>).
    """
    # the bounds ride as ONE broadcast row of two array columns, and
    # the encode is a zip_with — a constant-size expression tree. (The
    # first cut embedded 2 x dim literal-array expressions inside a
    # transform(); Catalyst analysis/codegen of that ~8k-node tree
    # cost seconds per query regardless of data volume.)
    spark = emb.sparkSession
    stats = spark.createDataFrame(
        [(list(mn), list(rng))], "mn array<double>, rng array<double>"
    )
    x = F.col(vec_col).cast("array<double>")
    zipped = F.arrays_zip(F.col("mn"), F.col("rng"))
    codes = F.zip_with(
        x,
        zipped,
        lambda xi, s: F.when(
            s["rng"] > 0,
            F.floor(((xi - s["mn"]) * F.lit(255.0)) / s["rng"] + F.lit(0.5)).cast(
                "int"
            ),
        ).otherwise(F.lit(0)),
    )
    return emb.crossJoin(F.broadcast(stats)).select(
        F.col(id_col), codes.alias("codes")
    )


def sq8_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k nearest neighbors over an SQ8-compressed
    corpus, asymmetric: the query stays full precision, each
    candidate is dequantized from its byte codes
    (``min_d + code_d * range_d / 255``) and scored by squared L2
    via the dot decomposition ``q.q - 2 q.x + x.x`` (each dot a
    pinned in-order fold, so the oracle replays it to the same 6
    rounded places with list_dot_product).

    Scale: encode is map-side; the scan is linear like pq_topk's ADC
    but with zero codebook state — the whole quantizer is 2 x dim
    floats riding as one broadcast row. Queries broadcast; the
    per-query top-k uses the same two-stage bucket selection as
    pq_topk so no task ever holds a corpus-sized group.

    Returns (qid, rank, vid, adist) — ascending approx distance,
    ties by vid.
    """
    mn, rng = sq8_train(emb, dim=dim, vec_col=vec_col)
    codes = sq8_encode(emb, mn, rng, dim=dim, id_col=id_col, vec_col=vec_col)
    stats = emb.sparkSession.createDataFrame(
        [(list(mn), list(rng))], "mn array<double>, rng array<double>"
    )
    codes = codes.crossJoin(F.broadcast(stats))
    deq = F.zip_with(
        F.col("codes"),
        F.arrays_zip(F.col("mn"), F.col("rng")),
        lambda c, s: s["mn"] + (c.cast("double") * s["rng"]) / F.lit(255.0),
    )
    # hoist the self-dots out of the pair join: ||c||^2 once per
    # candidate, ||q||^2 once per query — the pair cost is ONE
    # 64-dim fold instead of three (identical arithmetic and
    # rounding, so the oracle is unchanged; 3x fewer lambda evals
    # on the corpus x queries hot path)
    cand = codes.select(F.col(id_col).alias("vid"), deq.alias("cv")).withColumn(
        "cc", _dot(F.col("cv"), F.col("cv"))
    )
    q = emb.filter(query_pred).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qq", _dot(F.col("qv"), F.col("qv")))
    dist = (
        F.broadcast(q)
        .join(cand, F.col("qid") != F.col("vid"))
        .select(
            "qid",
            "vid",
            F.round(
                F.col("qq")
                - F.lit(2.0) * _dot(F.col("qv"), F.col("cv"))
                + F.col("cc"),
                6,
            ).alias("adist"),
        )
    )
    bucketed = dist.withColumn("__b", F.pmod(F.abs(F.hash("vid")), F.lit(64)))
    w_local = Window.partitionBy("qid", "__b").orderBy(F.asc("adist"), F.asc("vid"))
    pruned = (
        bucketed.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adist"), F.asc("vid"))
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vid", "adist")
    )


def ivf_sq8_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF + SQ8 — FAISS ``IndexIVFScalarQuantizer`` (QT_8bit, raw
    encoding, not by-residual): corpus rows live in their nearest
    coarse-quantizer cell AND are stored as per-dimension byte codes;
    a query scans only its ``nprobe`` closest cells, scoring
    asymmetric COSINE against the dequantized candidates (the query
    stays full precision). Same metric as :func:`ivf_topk` /
    :func:`cosine_topk`, so recall differences in tools/ann_curve.py
    isolate QUANTIZATION loss at fixed probe budget: flat > SQ8
    (64 bytes/vec) > PQ m=16 (16 bytes) > PQ m=8 (8 bytes), the FAISS
    compression-vs-recall ladder.

    Scale: the quantizer state is 2 x dim floats in one broadcast row
    (sq8_encode); cells keep candidate generation an equi-join on cid
    (corpus partitioned by cid, queries broadcast) — 1/nlist of the
    corpus scanned per probed cell, zero codebook tables.
    """
    mn, rng = sq8_train(emb, dim=dim, vec_col=vec_col)
    cdf = ivf_centroids_df(emb, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col)
    n = with_norm(emb, vec_col)
    nc = _attach_centroids(n, cdf)
    cells = nc.select(
        F.col(id_col).alias("vid"), _nearest_cid(F.col("__v")).alias("cid")
    )
    codes = sq8_encode(emb, mn, rng, dim=dim, id_col=id_col, vec_col=vec_col)
    stats = emb.sparkSession.createDataFrame(
        [(list(mn), list(rng))], "mn array<double>, rng array<double>"
    )
    deq = F.zip_with(
        F.col("codes"),
        F.arrays_zip(F.col("mn"), F.col("rng")),
        lambda c, s: s["mn"] + (c.cast("double") * s["rng"]) / F.lit(255.0),
    )
    corpus = (
        codes.withColumnRenamed(id_col, "vid")
        .join(cells, "vid")
        .crossJoin(F.broadcast(stats))
        .select("vid", "cid", deq.alias("cv"))
        .withColumn("cn", F.sqrt(_dot(F.col("cv"), F.col("cv"))))
    )
    q = nc.filter(query_pred).select(
        F.col(id_col).alias("qid"),
        F.col("__v").alias("qv"),
        F.col("__norm").alias("qn"),
        F.explode(
            F.slice(F.array_sort(_cand_structs(F.col("__v"))), 1, nprobe)
            .getField("cid")
        ).alias("cid"),
    )
    sims = (
        F.broadcast(q)
        .join(corpus, "cid")
        .filter(F.col("qid") != F.col("vid"))
        .select(
            "qid",
            "vid",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vid", "sim")
    )


def _cross_moment(
    df: DataFrame, xcol: str, ycol: str, dim: int
) -> tuple:
    """(Σ x·yᵀ as dim x dim, Σ x, Σ y, n) over a DataFrame of two
    array<double> columns, computed as PER-PARTITION NUMPY PARTIALS
    (``X.T @ Y`` per Arrow batch via ``mapInPandas``) followed by a
    d²-keyed sum — the scale-safe moment kernel. The r12 posexplode
    pair join shuffled n·d² exploded rows (a 10³–10⁶× row blowup at
    production embedding dims); here the shuffle carries only
    |partitions| × (d² + 2d + 1) rows and the driver receives d²
    doubles, independent of n. NULL vectors are skipped (posexplode
    parity); a ragged vector raises loudly with its length."""
    import numpy as np
    import pandas as pd

    src = df.select(
        F.col(xcol).cast("array<double>").alias("__x"),
        F.col(ycol).cast("array<double>").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())

    def partials(batches):
        xy = np.zeros((dim, dim))
        sx = np.zeros(dim)
        sy = np.zeros(dim)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            for c in ("__x", "__y"):
                bad = pdf[c].map(len) != dim
                if bad.any():
                    raise ValueError(
                        f"_cross_moment: ragged vector in {c!r} — expected "
                        f"dim {dim}, saw length "
                        f"{int(pdf[c][bad].map(len).iloc[0])}"
                    )
            X = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["__x"]])
            Y = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["__y"]])
            xy += X.T @ Y
            sx += X.sum(axis=0)
            sy += Y.sum(axis=0)
            n += X.shape[0]
        if n == 0:
            return
        ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
        yield pd.DataFrame(
            {
                "i": np.concatenate(
                    [ii.ravel(), np.arange(dim), np.full(dim, -1), [-1]]
                ).astype("int32"),
                "j": np.concatenate(
                    [jj.ravel(), np.full(dim, -1), np.arange(dim), [-1]]
                ).astype("int32"),
                "s": np.concatenate([xy.ravel(), sx, sy, [float(n)]]),
            }
        )

    agg = (
        src.mapInPandas(partials, "i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    xy = np.zeros((dim, dim))
    sx = np.zeros(dim)
    sy = np.zeros(dim)
    n = 0
    for r in agg:
        if r.i == -1 and r.j == -1:
            n = int(r.s)
        elif r.j == -1:
            sx[r.i] = r.s
        elif r.i == -1:
            sy[r.j] = r.s
        else:
            xy[r.i][r.j] = r.s
    return xy, sx, sy, n


def pca_rotation(
    emb: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
    m: int | None = None,
) -> list[list[float]]:
    """OPQ's non-parametric initializer (Ge et al. 2013 §4.1): the
    PCA eigenbasis of the corpus covariance, optionally followed by
    EIGENVALUE ALLOCATION for an m-subspace product quantizer.
    Rotating into the eigenbasis decorrelates the coordinates PQ's
    subspace split assumes independent — but decorrelating ALONE is
    the published trap this module measured (PERF.md r12): on a
    low-rank corpus plain PCA concentrates all variance in the first
    few coordinates, so one subspace must quantize nearly the whole
    signal with ksub codes while the rest encode noise (clustered
    m=16 recall COLLAPSED 0.66 -> 0.2). ``m`` therefore enables Ge's
    balancing step: eigen-directions are dealt greedily into m
    equal-size buckets minimizing each bucket's variance product, so
    every subspace carries comparable signal.

    Spark-side: ONE job computes the dim x dim second-moment matrix
    AND the mean vector via :func:`_cross_moment` — per-partition
    numpy ``X.T @ X`` partials through a d²-keyed sum (never the
    r12 posexplode pair join's n·d² row blowup); the driver receives
    d² doubles, data-volume-free at any corpus size or embedding
    width. numpy eigendecomposes it (deterministic up to sign; signs
    are canonicalized so the rotation reproduces across runs).
    Returns the rotation as a list of rows; apply with
    :func:`rotate_embeddings`.
    """
    import math

    import numpy as np

    xx, sx, _sy, n = _cross_moment(emb, vec_col, vec_col, dim)
    if n == 0:
        raise ValueError("pca_rotation: empty corpus")
    mu = sx / n
    cov = xx / n - np.outer(mu, mu)
    w, vecs = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    w = w[order]
    rot = vecs[:, order].T  # rows = descending-variance eigenvectors
    if m is not None:
        # eigenvalue allocation (Ge et al. 2013 Algorithm: balanced
        # variance products): deal descending eigenvalues into m
        # equal-capacity buckets, each new one to the non-full bucket
        # with the smallest log-variance sum
        cap = dim // m
        assert cap * m == dim, (dim, m)
        buckets: list[list[int]] = [[] for _ in range(m)]
        sums = [0.0] * m
        for idx in range(dim):
            cand = min(
                (b for b in range(m) if len(buckets[b]) < cap),
                key=lambda b: sums[b],
            )
            buckets[cand].append(idx)
            sums[cand] += math.log(max(float(w[idx]), 1e-12))
        perm = [i for b in buckets for i in b]
        rot = rot[perm]
    # canonicalize signs: first nonzero entry of each row positive
    for i in range(dim):
        row = rot[i]
        nz = np.nonzero(np.abs(row) > 1e-12)[0]
        if len(nz) and row[nz[0]] < 0:
            rot[i] = -row
    return [[float(x) for x in row] for row in rot]


def rotate_embeddings(
    emb: DataFrame,
    rotation: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Apply a dim x dim rotation to every embedding, Spark-side: the
    matrix rides as ONE broadcast row (array of row-structs — the
    _attach_centroids discipline, never dim^2 Catalyst literals) and
    the matvec is a transform of per-row dots. Rotation is an
    isometry, so exact cosine/L2 rankings are unchanged — only PQ's
    subspace split sees a difference."""
    spark = emb.sparkSession
    rows = spark.createDataFrame(
        [(list(map(list, [rotation[i] for i in range(len(rotation))])),)],
        "rot array<array<double>>",
    )
    v = F.col(vec_col).cast("array<double>")
    rotated = F.transform(F.col("rot"), lambda row: _dot(v, row))
    return emb.crossJoin(F.broadcast(rows)).select(
        F.col(id_col), rotated.alias(vec_col)
    )


def l2_normalize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Project every embedding onto the UNIT SPHERE (x / ||x||₂, the
    in-order fold norm — bit-identical to a DuckDB
    ``list_dot_product`` replay). On unit vectors squared L2 distance
    is 2 − 2·cos, so an L2-objective quantizer (PQ/OPQ) trained and
    served on the normalized corpus optimizes the COSINE serve metric
    directly in its OBJECTIVE. Measured caveat (PERF.md r14 ladder):
    on corpora whose clusters separate radially (the mixture fixture),
    normalization destroys the norm signal raw-space L2-ADC exploits
    and recall@5 drops 0.69 -> 0.31-0.37 — normalize-first is a
    correctness-pinned option (z_ann_recall_opq_cos), not the serve
    default. Rows with zero norm pass through unchanged (we avoid the
    NaN)."""
    v = F.col(vec_col).cast("array<double>")
    nrm = F.sqrt(_dot(v, v))
    safe = F.when(nrm > 0.0, nrm).otherwise(F.lit(1.0))
    return emb.select(
        F.col(id_col), F.transform(v, lambda x: x / safe).alias(vec_col)
    )


def pq_reconstruct(
    codes: DataFrame, cdf: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """(id, recon): decode PQ codes back to the concatenated subspace
    centroids — q(x), the ADC-side approximation made explicit. One
    broadcast join against the m x ksub codebook, re-assembled in
    subspace order; map-side, no fact shuffle beyond the per-id
    regroup."""
    j = codes.join(
        F.broadcast(cdf.withColumnRenamed("cid", "code")), ["sub", "code"]
    )
    return j.groupBy(id_col).agg(
        F.flatten(
            F.array_sort(F.collect_list(F.struct("sub", "cvec"))).getField(
                "cvec"
            )
        ).alias("recon")
    )


def opq_rotation(
    emb: DataFrame,
    dim: int = 64,
    m: int = 16,
    ksub: int = 16,
    iters: int = 2,
    pq_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = False,
) -> list[list[float]]:
    """FULL non-parametric OPQ (Ge et al. 2013 §4.2): alternate
    (a) fix R — train the m-subspace PQ codebooks on the rotated
    corpus (:func:`pq_codebooks_df`, the engine's pinned-fold Lloyd);
    (b) fix the codebooks — re-solve the rotation as the ORTHOGONAL
    PROCRUSTES problem min_R Σ‖R·xᵢ − q(R_old·xᵢ)‖², whose closed
    form is R = V·Uᵀ from the SVD of the cross-moment M = Σ xᵢ·yᵢᵀ
    (yᵢ = the PQ reconstruction). Initialized from
    :func:`pca_rotation` with EIGENVALUE ALLOCATION (§4.1; plain PCA
    without the balancing is the measured trap — PERF.md r12). Each
    half-step is the exact minimizer of its subproblem given the
    other, so the quantization objective is non-increasing (pinned by
    tests/test_operators.py).

    Scale: per iteration, one PQ training (the subspace-keyed Lloyd —
    all broadcast joins and pinned folds, no all-pairs), one map-side
    encode + reconstruct, and one :func:`_cross_moment` pass (d²-keyed
    partial sum, driver holds d² doubles and a d x d SVD). Nothing is
    ever n·d²; the corpus is scanned O(iters) times.

    ``normalize=True`` trains on the L2-NORMALIZED corpus
    (:func:`l2_normalize_embeddings`) — unit-sphere OPQ, where the L2
    objective the alternation descends equals 2 − 2·cos; serve the
    normalized corpus through the same rotation. Measured on the
    mixture fixture this LOSES cosine recall (norm carries cluster
    identity there — PERF.md r14 ladder); it is the right rung only
    when the corpus is already angular (see
    :func:`l2_normalize_embeddings`).
    """
    import numpy as np

    base = emb.select(id_col, vec_col)
    if normalize:
        base = l2_normalize_embeddings(base, id_col=id_col, vec_col=vec_col)
    R = pca_rotation(base, dim=dim, vec_col=vec_col, m=m)
    for _ in range(iters):
        rotated = rotate_embeddings(base, R, id_col=id_col, vec_col=vec_col)
        cdf = pq_codebooks_df(
            rotated, m=m, ksub=ksub, iters=pq_iters, dim=dim,
            id_col=id_col, vec_col=vec_col,
        )
        recon = pq_reconstruct(
            pq_encode(rotated, cdf, m=m, dim=dim, id_col=id_col, vec_col=vec_col),
            cdf,
            id_col=id_col,
        )
        pair = base.select(
            F.col(id_col).alias("__pid"), F.col(vec_col).alias("__xv")
        ).join(
            recon.select(F.col(id_col).alias("__pid"), F.col("recon").alias("__yv")),
            "__pid",
        )
        M, _sx, _sy, n = _cross_moment(pair, "__xv", "__yv", dim)
        if n == 0:
            raise ValueError("opq_rotation: empty corpus")
        # max tr(R·M) over orthogonal R: M = U·S·Vᵀ → R = V·Uᵀ
        U, _S, Vt = np.linalg.svd(M)
        R = [[float(x) for x in row] for row in (Vt.T @ U.T)]
    return R
