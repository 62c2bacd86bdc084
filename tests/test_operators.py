"""Unit tests for the composite operators, on hand-built micro data
(the reference has no tests — SURVEY.md §5 — so these encode the
domain semantics as goldens)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from interpro7_dw_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_bands,
    shingles,
    simhash,
    simhash_pairs,
)
from interpro7_dw_spark.operators.graph import transitive_closure
from interpro7_dw_spark.operators.joins import as_of_join, interval_overlap_join
from interpro7_dw_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image,
    encode_raster,
    encode_video,
    frame_sample,
    make_raster_payload,
    resize_image,
)
from interpro7_dw_spark.operators.similarity import cosine_topk, lsh_topk


def test_as_of_join_basic(spark):
    left = spark.createDataFrame(
        [("u1", 10), ("u1", 25), ("u1", 5), ("u2", 10)], "k string, ts long"
    )
    right = spark.createDataFrame(
        [("u1", 8, 100), ("u1", 20, 200), ("u1", 25, 250), ("u2", 99, 900)],
        "k string, ts long, val int",
    )
    out = as_of_join(left, right, ["k"], "ts", "ts", ["val"], tiebreak="val")
    got = {(r["k"], r["ts"]): r["val_asof"] for r in out.collect()}
    assert got == {
        ("u1", 10): 100,   # latest right ts<=10 is 8
        ("u1", 25): 250,   # exact match allowed
        ("u1", 5): None,   # nothing before
        ("u2", 10): None,  # right row is later
    }


def test_interval_overlap_join_bucketed_equals_naive(spark):
    rows = [("k", i, i * 7 % 50, i * 7 % 50 + (i % 13)) for i in range(80)]
    a = spark.createDataFrame(rows, "g string, ida int, sa int, ea int")
    b = spark.createDataFrame(
        [("k", i, i * 11 % 60, i * 11 % 60 + (i % 9)) for i in range(80)],
        "g string, idb int, sb int, eb int",
    )
    naive = interval_overlap_join(a, b, ["g"], "sa", "ea", "sb", "eb")
    bucketed = interval_overlap_join(a, b, ["g"], "sa", "ea", "sb", "eb", bucket_width=16)
    key = lambda df: sorted((r["ida"], r["idb"]) for r in df.collect())
    assert key(naive) == key(bucketed)
    assert len(key(naive)) > 0


def test_transitive_closure_chain(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"), ("x", "a")], "child string, parent string"
    )
    out = {(r["node"], r["anc"]): r["depth"] for r in transitive_closure(edges).collect()}
    assert out[("d", "a")] == 3
    assert out[("d", "c")] == 1
    assert out[("c", "a")] == 2
    assert out[("x", "a")] == 1
    assert out[("a", "a")] == 0
    # every pair appears exactly once: 5 self + 3+2+1+1 ancestors
    assert len(out) == 12


def test_iterative_ops_parquet_checkpoint_seam(spark, tmp_path):
    """checkpoint_dir switches per-round materialization from
    localCheckpoint to durable parquet (the cluster-scale choice);
    results must be identical and the directory must actually hold
    the round files."""
    import os

    from interpro7_dw_spark.operators.graph import (
        connected_components,
        transitive_closure,
    )

    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"), ("x", "a")], "child string, parent string"
    )
    ckpt = str(tmp_path / "ckpt_closure")
    got = {
        (r["node"], r["anc"]): r["depth"]
        for r in transitive_closure(edges, checkpoint_dir=ckpt).collect()
    }
    base = {
        (r["node"], r["anc"]): r["depth"] for r in transitive_closure(edges).collect()
    }
    assert got == base
    rounds = [d for d in os.listdir(ckpt) if d.startswith("closure_")]
    assert len(rounds) >= 2, rounds  # initial frontier + >=1 doubling round

    und = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i+1:02d}") for i in range(6)] + [("p", "q")],
        "src string, dst string",
    )
    ckpt2 = str(tmp_path / "ckpt_cc")
    got_cc = {
        r.node: r.component
        for r in connected_components(und, checkpoint_dir=ckpt2).collect()
    }
    base_cc = {r.node: r.component for r in connected_components(und).collect()}
    assert got_cc == base_cc
    assert any(d.startswith("cc_") for d in os.listdir(ckpt2))


def test_exact_dedup_and_fingerprints(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "other text")], "doc_id long, text string"
    )
    got = {r["keep_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert got == {1: 2, 3: 1}


def test_minhash_lsh_finds_identical_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, "completely different words entirely unrelated content here")],
        "doc_id long, text string",
    )
    pairs = lsh_candidate_pairs(minhash_bands(shingles(docs))).collect()
    assert {(r["da"], r["db"]) for r in pairs} == {(1, 2)}
    assert pairs[0]["n_bands"] == 4  # identical docs share all bands


def test_jaccard_identical_is_one(spark):
    base = "a b c d e f g h"
    docs = spark.createDataFrame([(1, base), (2, base)], "doc_id long, text string")
    rows = jaccard_pairs(shingles(docs), 0.5).collect()
    assert len(rows) == 1 and float(rows[0]["jaccard"]) == 1.0


def test_simhash_identical_docs_distance_zero(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "zz yy xx ww vv uu")],
        "doc_id long, text string",
    )
    pairs = simhash_pairs(simhash(docs), max_hamming=0).collect()
    assert {(r["da"], r["db"], r["hamming"]) for r in pairs} >= {(1, 2, 0)}


def test_simhash_pigeonhole_no_cartesian(spark):
    # pigeonhole segment equi-join: the plan must never fall back to a
    # cross product, and max_hamming > 0 must still find near pairs
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta tok{i % 2}") for i in range(6)],
        "doc_id long, text string",
    )
    pairs_df = simhash_pairs(simhash(docs), max_hamming=3)
    plan = pairs_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {(r["da"], r["db"]) for r in pairs_df.collect()}
    assert (0, 2) in got  # identical docs always within any distance


def test_simhash_pigeonhole_matches_bruteforce(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(8))) for i in range(20)],
        "doc_id long, text string",
    )
    fp = simhash(docs).persist()
    got = {
        (r["da"], r["db"], r["hamming"])
        for r in simhash_pairs(fp, max_hamming=4).collect()
    }
    a = fp.select(F.col("doc_id").alias("da"), F.col("simhash").alias("ha"))
    b = fp.select(F.col("doc_id").alias("db"), F.col("simhash").alias("hb"))
    brute = {
        (r["da"], r["db"], r["hamming"])
        for r in a.join(b, F.col("da") < F.col("db"))
        .select("da", "db", F.expr("bit_count(ha ^ hb)").alias("hamming"))
        .filter(F.col("hamming") <= 4)
        .collect()
    }
    assert got == brute


def test_simhash_64bit_production_shape(spark):
    """bits=64 end-to-end: fingerprints occupy the full signed-long
    range (bit 63 exercised -> negative longs appear), the pigeonhole
    join at 16-bit segments matches brute-force hamming, and identical
    docs still collide at distance 0."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{(i * 11 + j) % 29}" for j in range(12)))
         for i in range(30)] + [(97, "dup dup dup"), (98, "dup dup dup")],
        "doc_id long, text string",
    )
    fp = simhash(docs, bits=64).persist()
    vals = [r.simhash for r in fp.collect()]
    # 64-bit width actually used: some fingerprint has the sign bit set
    assert any(v < 0 for v in vals), "bit 63 never set — not 64-bit"
    got = {
        (r["da"], r["db"], r["hamming"])
        for r in simhash_pairs(fp, max_hamming=3, bits=64).collect()
    }
    a = fp.select(F.col("doc_id").alias("da"), F.col("simhash").alias("ha"))
    b = fp.select(F.col("doc_id").alias("db"), F.col("simhash").alias("hb"))
    brute = {
        (r["da"], r["db"], r["hamming"])
        for r in a.join(b, F.col("da") < F.col("db"))
        .select("da", "db", F.expr("bit_count(ha ^ hb)").alias("hamming"))
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert got == brute
    assert (97, 98, 0) in got


def test_lsh_band_join_survives_hot_bucket_with_aqe_skew_split(spark):
    """A deliberately hot band bucket (30% of the corpus shares one
    band_sig) still completes and stays correct with AQE skew-join
    active, and the executed plan actually applied the skew split
    (skew=true on the sort-merge join) — the documented AQE path for
    degenerate buckets; the salt fallback in the dedup.py docstring is
    only needed where AQE is unavailable."""
    import io
    from contextlib import redirect_stdout

    from interpro7_dw_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_bands,
        shingles,
    )

    n, hot = 300, 90  # 30% of docs identical -> one hot bucket per band
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(hot)]
    rows += [(i, f"unique u{i}a u{i}b u{i}c u{i}d u{i}e") for i in range(hot, n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    conf = spark.conf
    saved = {k: conf.get(k, None) for k in (
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )}
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # thresholds tiny so the hot bucket qualifies as skewed at
        # fixture scale; broadcast off so the join stays sort-merge
        # (the strategy a 100 TB corpus side would get)
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        pairs = lsh_candidate_pairs(minhash_bands(shingles(docs)))
        got = {(r.da, r.db) for r in pairs.collect()}
        # all hot-bucket pairs found, none of the unique docs paired
        expected = {(a, b) for a in range(hot) for b in range(a + 1, hot)}
        assert got == expected
        buf = io.StringIO()
        with redirect_stdout(buf):
            pairs.explain("formatted")
        plan = buf.getvalue()
        assert "skew=true" in plan, "AQE skew split did not engage"
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_hot_shingle_guard_bounds_candidates(spark):
    from interpro7_dw_spark.operators.dedup import drop_hot_shingles

    # every doc shares the universal shingle "the the the"; without the
    # guard the inverted index pairs all O(n^2) docs, with it only the
    # genuine near-dup pair survives
    n = 40
    texts = [(i, f"the the the u{i}a u{i}b u{i}c") for i in range(n)]
    texts[1] = (1, texts[0][1])  # one true duplicate pair
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    sh = shingles(docs)
    capped = drop_hot_shingles(sh, max_doc_freq=5)
    # the universal shingle is gone; per-doc unique shingles remain
    assert capped.filter("shingle = 'the the the'").count() == 0
    pairs = jaccard_pairs(sh, 0.9, max_doc_freq=5).collect()
    assert {(r["da"], r["db"]) for r in pairs} == {(0, 1)}
    # candidate generation stayed near-linear: every surviving shingle
    # has df <= cap, so worst-case candidates <= cap * n_shingles
    from pyspark.sql import functions as F
    assert capped.groupBy("shingle").count().agg(F.max("count")).first()[0] <= 5


def test_cosine_topk_prefers_aligned_vector(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),   # nearly aligned with 0
            (2, [0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0]),  # opposite
        ],
        "vec_id long, embedding array<float>",
    )
    out = cosine_topk(emb, F.col("vec_id") == 0, k=3)
    ranked = [r["vid"] for r in out.orderBy("rank").collect()]
    assert ranked[0] == 1 and ranked[-1] == 3


def test_lsh_topk_subset_of_bucket(spark):
    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 5 - 2) for j in range(8)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    out = lsh_topk(emb, F.col("vec_id") < 3, k=5, planes=4, dim=8).collect()
    assert all(r["qid"] != r["vid"] for r in out)
    assert all(r["rank"] <= 5 for r in out)


def test_multimodal_decode_exact(spark):
    import numpy as np

    # handcrafted 3x2 raster (w=3, h=2): exact header parse + pixel mean
    px = np.array([[0, 100, 200], [50, 150, 255]], dtype=np.uint8)
    docs = spark.createDataFrame(
        [(1, bytearray(encode_raster(px)), "image/fri0", len(encode_raster(px)))],
        "doc_id long, payload binary, media_type string, n_bytes int",
    )
    r = decode_image(docs).collect()[0]
    assert (r["width"], r["height"]) == (3, 2)
    assert r["mean_luma"] == pytest.approx(px.mean())

    # synthesized payloads: deterministic across runs, decodable
    docs2 = spark.createDataFrame([(1, "abc"), (2, "defghi")], "doc_id long, text string")
    media = make_raster_payload(docs2)
    out = {x["doc_id"]: x for x in decode_image(media).collect()}
    assert len(out) == 2 and all(8 <= out[i]["width"] <= 32 for i in (1, 2))
    again = {x["doc_id"]: x for x in decode_image(make_raster_payload(docs2)).collect()}
    assert again == out
    # binary column plumbing on the JVM path still round-trips byte counts
    jvm = {x["doc_id"]: x for x in attach_binary_payload(docs2).collect()}
    assert jvm[1]["n_bytes"] == 3 and jvm[2]["n_bytes"] == 6


def test_multimodal_resize_bilinear(spark):
    import numpy as np

    # 2x2 checker resized to 4x4: identity at corners, blended centers
    px = np.array([[0, 200], [100, 255]], dtype=np.uint8)
    docs = spark.createDataFrame(
        [(7, bytearray(encode_raster(px)), "image/fri0", 12)],
        "doc_id long, payload binary, media_type string, n_bytes int",
    )
    r = resize_image(docs, 4, 4).collect()[0]
    assert (r["width"], r["height"]) == (4, 4)
    from interpro7_dw_spark.operators.multimodal import _bilinear_resize, _parse_raster

    expect = _bilinear_resize(px, 4, 4)
    assert (_parse_raster(bytes(r["payload"])) == expect).all()
    # center-sample convention: outer ring clamps to the source pixels
    assert expect[0, 0] == 0 and expect[0, 3] == 200
    assert expect[3, 0] == 100 and expect[3, 3] == 255
    # same-size resize is the identity (pixel centers align exactly)
    same = _bilinear_resize(px, 2, 2)
    assert (same == px).all()
    assert r["mean_luma"] == pytest.approx(expect.mean())


def test_multimodal_frame_sample(spark):
    import numpy as np

    frames = np.stack([np.full((2, 2), v, dtype=np.uint8) for v in (10, 20, 30, 40, 50)])
    docs = spark.createDataFrame(
        [(3, bytearray(encode_video(frames)), "video/fvi0", len(encode_video(frames)))],
        "doc_id long, payload binary, media_type string, n_bytes int",
    )
    out = sorted(frame_sample(docs, every_k=2).collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    assert [r["mean_luma"] for r in out] == [10.0, 30.0, 50.0]
    assert all(r["n_frames"] == 5 for r in out)


def test_salted_aggregate_matches_plain(spark):
    from interpro7_dw_spark.operators.skew import salted_aggregate

    df = spark.range(10000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") * 1.0).alias("v")
    )
    plain = {r["k"]: (r["total"], r["n"]) for r in df.groupBy("k").agg(
        F.sum("v").alias("total"), F.count("*").alias("n")).collect()}
    salted = {r["k"]: (r["total"], r["n"]) for r in salted_aggregate(
        df, ["k"],
        [F.sum("v").alias("s"), F.count("*").alias("c")],
        [F.sum("s").alias("total"), F.sum("c").cast("long").alias("n")],
        salt_source="id" if "id" in df.columns else None,
    ).collect()}
    assert plain == salted


def test_salted_broadcast_join_matches_plain(spark):
    from interpro7_dw_spark.operators.skew import salted_broadcast_join

    left = spark.range(5000).select((F.col("id") % 4).alias("k"), F.col("id").alias("v"))
    right = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, tag string")
    plain = sorted((r["v"], r["tag"]) for r in left.join(right, "k").collect())
    salted = sorted((r["v"], r["tag"]) for r in salted_broadcast_join(left, right, "k").collect())
    assert plain == salted


def test_lsh_topk_recall_vs_exact(spark):
    # machine-checked ANN invariant (the z_embedding_lsh_topk catalog
    # entry is rows-only): with few planes the buckets are coarse, so
    # recall@5 against the exact brute force must stay high; with a
    # fixed deterministic hyperplane family the number is stable
    from pyspark.sql import functions as F

    from interpro7_dw_spark.operators.similarity import cosine_topk, lsh_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pred = F.col("vec_id") < 5
    exact = {
        (r["qid"], r["vid"]) for r in cosine_topk(emb, pred, k=5).collect()
    }
    approx = {
        (r["qid"], r["vid"])
        for r in lsh_topk(emb, pred, k=5, planes=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 3 planes -> 8 buckets over ~1/8 of the corpus each; empirically
    # this family gives ~0.5+ on the synthetic embeddings — assert a
    # floor that fails if bucketing or scoring regresses
    assert recall >= 0.4, f"recall@5 collapsed: {recall}"
    # and every approximate neighbor must be a genuine same-bucket
    # candidate with correctly ranked similarity (subset sanity)
    assert all(q < 5 for q, _ in approx)


def test_ivf_topk_recall_and_determinism(spark):
    from pyspark.sql import functions as F

    from interpro7_dw_spark.operators.similarity import (
        cosine_topk,
        ivf_centroids,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pred = F.col("vec_id") < 5
    exact = {(r["qid"], r["vid"]) for r in cosine_topk(emb, pred, k=5).collect()}
    approx_rows = ivf_topk(emb, pred, k=5, nlist=8, nprobe=3).collect()
    approx = {(r["qid"], r["vid"]) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    # probing 3/8 density-following cells keeps most true neighbors
    assert recall >= 0.5, f"IVF recall@5 collapsed: {recall}"
    # every query returns exactly k ranked rows (cells are never empty
    # at this corpus size) and similarities are correctly ordered
    by_q: dict[int, list] = {}
    for r in approx_rows:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["sim"]))
    for qid, rows in by_q.items():
        rows.sort()
        sims = [s for _, s in rows]
        assert sims == sorted(sims, reverse=True)
    # md5-seeded Lloyd is deterministic: same centroids across calls
    c1 = ivf_centroids(emb, nlist=4, iters=1)
    c2 = ivf_centroids(emb, nlist=4, iters=1)
    assert c1 == c2


def test_connected_components_chain_and_cliques(spark):
    # a 10-node path (diameter 9 — forces multiple propagation rounds),
    # a 3-clique, and an isolated pair
    from interpro7_dw_spark.operators.graph import connected_components

    path = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(9)]
    clique = [("c1", "c2"), ("c2", "c3"), ("c1", "c3")]
    pair = [("z8", "z9")]
    edges = spark.createDataFrame(path + clique + pair, "src string, dst string")
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert {got[f"n{i:02d}"] for i in range(10)} == {"n00"}
    assert got["c1"] == got["c2"] == got["c3"] == "c1"
    assert got["z8"] == got["z9"] == "z8"
    assert len(got) == 15


def test_cosine_near_dup_lsh_subset_of_exact(spark):
    # the LSH scale path of cosine_near_dup_pairs must return a
    # SUBSET of the exact pairs (same-bucket filter can only drop
    # candidates, never invent them), each with the identical rounded
    # similarity, and must retain a usable fraction
    from pyspark.sql import functions as F  # noqa: F811

    from interpro7_dw_spark.operators.similarity import cosine_near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r["a_id"], r["b_id"]): r["sim"]
        for r in cosine_near_dup_pairs(emb, 0.30).collect()
    }
    approx = {
        (r["a_id"], r["b_id"]): r["sim"]
        for r in cosine_near_dup_pairs(emb, 0.30, planes=2).collect()
    }
    assert exact, "fixture produced no near-dup pairs"
    assert set(approx) <= set(exact)
    assert all(exact[p] == s for p, s in approx.items())
    assert len(approx) / len(exact) >= 0.2, (len(approx), len(exact))


def test_stratified_sample_caps_and_determinism(spark):
    from interpro7_dw_spark.operators.sampling import stratified_sample

    docs = spark.createDataFrame(
        [(i, "a" if i < 20 else "b") for i in range(30)],
        "doc_id long, source string",
    )
    out = stratified_sample(docs, caps={"a": 5}, stratum_col="source")
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    # capped stratum cut to 5; uncapped stratum kept whole (no default)
    assert len(by_src["a"]) == 5
    assert len(by_src["b"]) == 10
    assert all(r.sample_rank <= 5 for r in by_src["a"])
    # deterministic: a rerun picks the identical ids
    again = {r.doc_id for r in stratified_sample(
        docs, caps={"a": 5}, stratum_col="source").collect()}
    assert {r.doc_id for r in rows} == again
    # default_cap applies to strata missing from caps
    out2 = stratified_sample(
        docs, caps={"a": 5}, stratum_col="source", default_cap=3
    )
    assert out2.where("source = 'b'").count() == 3


def test_pack_token_shards_budget_and_oversize(spark):
    from interpro7_dw_spark.operators.sampling import pack_token_shards

    docs = spark.createDataFrame(
        [(1, 400), (2, 400), (3, 400), (4, 2500), (5, 100), (6, 100)],
        "doc_id long, n_tokens long",
    )
    out = pack_token_shards(docs, budget=1000, stratum_col=None).collect()
    by_shard = {}
    for r in sorted(out, key=lambda r: (r.shard_id, r.shard_pos)):
        by_shard.setdefault(r.shard_id, []).append(r)
    # every shard's documents are contiguous in the hash order:
    # positions are 0..n-1 within each shard
    for rows in by_shard.values():
        assert [r.shard_pos for r in rows] == list(range(len(rows)))
    # fixed-mark semantics: shard_id == floor(preceding-tokens/budget),
    # i.e. a document belongs to the shard where its first token falls
    ordered = sorted(out, key=lambda r: (r.shard_id, r.shard_pos))
    cum = 0
    for r in ordered:
        assert r.shard_id == cum // 1000
        cum += r.n_tokens
    # the oversized doc (2500) consumes several marks: the next doc
    # starts at least 2 shard ids later
    big_idx = [i for i, r in enumerate(ordered) if r.doc_id == 4][0]
    if big_idx + 1 < len(ordered):
        assert ordered[big_idx + 1].shard_id >= ordered[big_idx].shard_id + 2


def test_sampling_two_phase_splits_stratum_across_tasks(spark):
    """Scale-safety property: the two-phase range-split rank spreads a
    SINGLE stratum over many range tasks (no single-task-per-stratum
    window) while producing the exact ranks of the naive global
    window."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from interpro7_dw_spark.operators.sampling import (
        _hash_order,
        _range_annotated,
        pack_token_shards,
        stratified_sample,
    )

    docs = spark.createDataFrame(
        [(i, "web", (i * 37) % 90 + 10) for i in range(500)],
        "doc_id long, source string, n_tokens long",
    )
    annotated = _range_annotated(docs, ["source"], "doc_id", 8, token_col="n_tokens")
    # the lone stratum spans several range tasks...
    assert annotated.select("__pid").distinct().count() > 1
    # ...yet rank and running sum equal the naive single-window values
    w = Window.partitionBy("source").orderBy(_hash_order("doc_id"), F.col("doc_id"))
    naive = docs.select(
        "doc_id",
        F.row_number().over(w).cast("long").alias("rank"),
        F.sum("n_tokens")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("run"),
    )
    joined = annotated.select("doc_id", "__rank", "__run").join(naive, "doc_id")
    assert joined.where("__rank != rank OR __run != run").count() == 0

    # the public operators agree with themselves across range widths
    s1 = {r.doc_id for r in stratified_sample(
        docs, caps={"web": 50}, num_ranges=1).collect()}
    s8 = {r.doc_id for r in stratified_sample(
        docs, caps={"web": 50}, num_ranges=8).collect()}
    assert s1 == s8 and len(s8) == 50
    p1 = {(r.doc_id, r.shard_id, r.shard_pos) for r in pack_token_shards(
        docs, budget=1000, num_ranges=1).collect()}
    p8 = {(r.doc_id, r.shard_id, r.shard_pos) for r in pack_token_shards(
        docs, budget=1000, num_ranges=8).collect()}
    assert p1 == p8


def test_repeated_passage_stats(spark):
    from interpro7_dw_spark.operators.dedup import repeated_passage_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),        # passages: 'a b c d e', 'b c d e f'
            (2, "x a b c d e y"),      # shares 'a b c d e' with doc 1
            (3, "p q r s t u"),        # nothing shared
            (4, "tiny doc"),           # < window -> one whole-text passage
            (5, "tiny doc"),           # identical short doc -> shared
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repeated_passage_stats(docs, window=5).collect()}
    assert (got[1].n_passages, got[1].n_shared) == (2, 1)
    assert got[1].shared_frac == 0.5
    assert got[2].n_shared == 1 and got[2].n_passages == 3
    assert got[3].n_shared == 0 and got[3].shared_frac == 0.0
    assert (got[4].n_passages, got[4].n_shared, got[4].shared_frac) == (1, 1, 1.0)
    assert got[5].n_shared == 1


def test_pack_training_examples(spark):
    from interpro7_dw_spark.operators.sampling import pack_training_examples

    docs = spark.createDataFrame(
        [(i, "s", " ".join(f"w{i}_{j}" for j in range(10))) for i in range(12)],
        "doc_id long, source string, text string",
    )
    out = pack_training_examples(docs, budget=35, seq_len=16).collect()
    # token conservation: every input token and every boundary marker
    # lands in exactly one example
    shards = {}
    for r in out:
        shards.setdefault(r.shard_id, []).append(r)
    total_example_tokens = sum(r.n_tokens for r in out)
    n_docs, tok_per_doc = 12, 10
    n_shards = len(shards)
    # each shard of d docs contributes d*10 + (d-1) sep tokens
    assert total_example_tokens == n_docs * tok_per_doc + (n_docs - n_shards)
    for rs in shards.values():
        rs.sort(key=lambda r: r.example_id)
        # consecutive ids from 0; all but the last are full-length
        assert [r.example_id for r in rs] == list(range(len(rs)))
        assert all(r.n_tokens == 16 for r in rs[:-1])
        assert 1 <= rs[-1].n_tokens <= 16
        # boundary markers appear inside the packed stream
    assert any("<eos>" in r.example_text for r in out)
    # determinism
    again = pack_training_examples(docs, budget=35, seq_len=16).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_bigram_lm(spark):
    from interpro7_dw_spark.operators.text import bigram_lm

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b"), (3, "solo")],
        "doc_id long, text string",
    )
    # vocab = {a, b, c, solo} = 4; pairs: (a,b)x3, (b,a)x1, (b,c)x1
    got = {(r.w1, r.w2): r for r in bigram_lm(docs).collect()}
    assert got[("a", "b")].n_bigram == 3 and got[("a", "b")].n_context == 3
    assert got[("a", "b")].cond_p == round((3 + 1) / (3 + 4), 6)
    assert got[("b", "a")].n_bigram == 1 and got[("b", "a")].n_context == 2
    assert ("solo", "solo") not in got  # 1-token doc contributes nothing
    # min_count prunes the tail but keeps context counts exact
    pruned = {(r.w1, r.w2): r for r in bigram_lm(docs, min_count=2).collect()}
    assert set(pruned) == {("a", "b")}
    assert pruned[("a", "b")].n_context == 3


def test_jl_projection_preserves_distances(spark):
    from interpro7_dw_spark.operators.similarity import jl_project

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(40)
    proj = jl_project(emb).collect()
    ids = {r.vec_id for r in proj}
    assert all(
        sum(1 for r in proj if r.vec_id == i) == 16 for i in list(ids)[:5]
    )
    # deterministic: same matrix, same values
    again = jl_project(emb).collect()
    assert sorted(map(tuple, proj)) == sorted(map(tuple, again))
    # distance preservation on a deterministic sample of pairs: the
    # JL guarantee is probabilistic; for THIS fixed corpus and matrix
    # the measured distortion must stay within a generous envelope
    import collections

    vecs = collections.defaultdict(dict)
    for r in proj:
        vecs[r.vec_id][r.pos] = r.x
    orig = {r.vec_id: list(map(float, r.embedding)) for r in emb.collect()}
    ids = sorted(orig)
    ratios = []
    for a, b in zip(ids[:10], ids[10:20]):
        d_o = sum((x - y) ** 2 for x, y in zip(orig[a], orig[b]))
        d_p = sum(
            (vecs[a][p] - vecs[b][p]) ** 2 for p in range(16)
        )
        ratios.append(d_p / d_o)
    avg = sum(ratios) / len(ratios)
    assert 0.6 <= avg <= 1.4, ratios
    assert all(0.25 <= r <= 2.5 for r in ratios), ratios


def test_snapshot_diff(spark):
    from interpro7_dw_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),          # unchanged -> dropped
         (2, "B", 21.0),          # both columns change
         (3, "c", 30.0),          # null -> value (null-aware update)
         (5, "e", 50.0)],         # insert
        "k long, s string, v double",
    )
    got = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(got) == {2, 3, 4, 5}  # 1 is unchanged, not emitted
    assert got[2].change_type == "update" and got[2].changed_cols == "s,v"
    assert got[3].change_type == "update" and got[3].changed_cols == "v"
    assert got[4].change_type == "delete" and got[4].changed_cols == ""
    assert got[5].change_type == "insert" and got[5].changed_cols == ""
    # composite key + explicit compare subset
    old2 = old.withColumnRenamed("s", "s2")
    new2 = new.withColumnRenamed("s", "s2")
    sub = snapshot_diff(old2, new2, ["k", "s2"], compare_cols=["v"]).collect()
    # (2,'b') exists only in old, (2,'B') only in new under the 2-col key
    kinds = {(r.k, r.s2): r.change_type for r in sub}
    assert kinds[(2, "b")] == "delete" and kinds[(2, "B")] == "insert"


def test_pq_codebooks_and_adc(spark):
    from interpro7_dw_spark.operators.similarity import (
        pq_codebooks_df,
        pq_encode,
        pq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cdf = pq_codebooks_df(emb, m=8, ksub=4, iters=1).persist()
    # full codebook: one centroid per (subspace, cell), correct width
    rows = cdf.collect()
    assert len(rows) == 8 * 4
    assert all(len(r.cvec) == 8 for r in rows)
    # codes: every vector gets exactly one code per subspace, in range
    codes = pq_encode(emb, cdf, m=8).collect()
    n_vec = emb.count()
    assert len(codes) == n_vec * 8
    assert all(0 <= r.code < 4 for r in codes)
    # a planted exact duplicate shares all codes with its source and
    # must surface at rank 1 for the duplicate's query (ADC distance
    # equal to the source's own quantization error — minimal)
    dup = emb.filter("vec_id = 0").select(
        F.lit(9000).alias("vec_id"), "embedding", "label"
    )
    top = pq_topk(
        emb.unionByName(dup), F.col("vec_id") == 9000, k=3, m=8, ksub=4, iters=1
    ).collect()
    best = min(top, key=lambda r: r.rank)
    assert best.vid == 0 and best.rank == 1
    # determinism: same inputs, same codebooks
    again = pq_codebooks_df(emb, m=8, ksub=4, iters=1).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_normalize_text(spark):
    from interpro7_dw_spark.operators.text import normalize_text

    docs = spark.createDataFrame(
        [
            (1, "“Hello” — it’s here"),
            (2, "tab\tand\nnewline  runs"),
            (3, "ctrl\x07bytes\x1fgone"),
            (4, "  already clean  "),
            (5, "untouched text"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in normalize_text(docs).collect()}
    assert got[1].normalized == '"Hello" - it\'s here'
    assert got[2].normalized == "tab and newline runs"
    assert got[3].normalized == "ctrl bytes gone"
    assert got[4].normalized == "already clean" and bool(got[4].changed)
    assert got[5].normalized == "untouched text" and not got[5].changed
    low = {r.doc_id: r for r in normalize_text(docs, lowercase=True).collect()}
    assert low[1].normalized == '"hello" - it\'s here'


def test_linear_quality_score(spark):
    from interpro7_dw_spark.operators.text import (
        hashed_pseudo_weights,
        linear_quality_score,
    )

    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "cc"), (3, "aa bb aa")],
        "doc_id long, text string",
    )
    # hand-built weight table: every token of doc 1/3 maps somewhere in
    # [0, 4); give those buckets +500 and everything else -500
    weights = spark.range(0, 4).select(
        F.col("id").alias("bucket"), F.lit(500).alias("w_milli")
    )
    occ_buckets = {
        r.bucket
        for r in spark.sql(
            "SELECT CAST(conv(substring(md5(CAST('aa' AS BINARY)), 1, 8), 16, 10)"
            " AS BIGINT) % 4 AS bucket"
        ).collect()
    }
    assert occ_buckets <= set(range(4))
    got = {
        r.doc_id: r
        for r in linear_quality_score(docs, weights, n_buckets=4).collect()
    }
    # all buckets weigh +500 -> mean is exactly 0.5, label True
    assert got[1].score == 0.5 and bool(got[1].label) is True
    assert got[1].n_tokens == 3 and got[1].score_milli_sum == 1500
    # identical texts score identically
    assert got[3].score == got[1].score
    # pseudo-weights are deterministic and bounded
    w = hashed_pseudo_weights(spark, 64).collect()
    assert len(w) == 64 and all(-1000 <= r.w_milli <= 1000 for r in w)


def test_perplexity_buckets(spark):
    from interpro7_dw_spark.operators.text import perplexity_buckets

    # lang A: 6 docs with strictly increasing commonness (tokens reused
    # more => higher score); lang B: 2 docs
    rows = [
        (1, "aa bb cc", "A"), (2, "aa bb dd", "A"), (3, "aa cc dd", "A"),
        (4, "aa bb cc dd", "A"), (5, "aa bb", "A"), (6, "zz yy xx", "A"),
        (10, "aa bb", "B"), (11, "qq rr", "B"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = perplexity_buckets(docs).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r)
    # ranks are contiguous 1..n per language
    for lang, rs in by_lang.items():
        assert sorted(r.lang_rank for r in rs) == list(range(1, len(rs) + 1))
    # ascending-commonness rank: rank 1 = rarest vocab = tail
    a = sorted(by_lang["A"], key=lambda r: r.lang_rank)
    assert [r.ppl_bucket for r in a] == ["tail", "tail", "middle", "middle", "head", "head"]
    assert a[0].mean_commonness == min(r.mean_commonness for r in a)
    # 2-doc language still splits deterministically
    b = sorted(by_lang["B"], key=lambda r: r.lang_rank)
    assert [r.ppl_bucket for r in b] == ["tail", "middle"]
    # plan guard: the full-data local-rank window must lead with the
    # score-bucket key (a bare-language partition would pin a hot
    # language in one task). The only lang-led window allowed is the
    # prefix-sum over the tiny counts table (#buckets x #languages
    # rows) — identified by its running-sum frame.
    df = perplexity_buckets(docs)
    df.collect()
    final = (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "windowspecdefinition(__pid" in final
    for ln in final.splitlines():
        if "windowspecdefinition(lang" in ln:
            assert "row_number" not in ln, ln


def test_cms_heavy_hitters(spark):
    from interpro7_dw_spark.operators.sketches import cms_build, heavy_hitters

    # 'a' x 50, 'b' x 30, 'c' x 7 occurrences
    occ = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 7, "token string"
    )
    # width 1 => every key shares the single bucket per row: est = N
    got = {
        r.token: r
        for r in heavy_hitters(occ, "token", threshold=10, width=1).collect()
    }
    assert set(got) == {"a", "b"}  # threshold prunes 'c'
    assert got["a"].cms_est == 87 and got["a"].overestimate == 37
    assert got["b"].cms_est == 87 and got["b"].overestimate == 57
    # realistic width: one-sided guarantee holds, sketch is bounded
    wide = heavy_hitters(occ, "token", threshold=1, width=64).collect()
    assert all(r.cms_est >= r.exact_n for r in wide)
    assert cms_build(occ, "token", depth=3, width=64).count() <= 3 * 64


def test_exact_substring_dedup(spark):
    from interpro7_dw_spark.operators.dedup import exact_substring_dedup

    shared = "q w e r t y u i"  # an 8-token span shared by docs 1 and 2
    docs = spark.createDataFrame(
        [
            (1, f"a b c {shared} d e f"),
            (2, f"{shared} z z2 z3 z4 z5 z6 z7 z8"),
            (3, "n o p a1 a2 a3 a4 a5 a6 a7"),   # unique -> untouched
            (4, "too short to window"),           # < k -> untouched
            (5, f"{shared} {shared}"),            # within-doc repeat, overlap-merged
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in exact_substring_dedup(docs, k=8).collect()}
    # doc 1: spans at pos 4..11 only (windows crossing into 'd e f'
    # are unique) -> cut the shared 8 tokens, keep the 6 around them
    assert got[1].n_tokens == 14 and got[1].n_dup_tokens == 8
    assert got[1].cleaned_text == "a b c d e f"
    assert got[1].n_spans == 1
    # doc 2: the shared prefix goes; unique tail survives
    assert got[2].cleaned_text == "z z2 z3 z4 z5 z6 z7 z8"
    # doc 3 untouched, doc 4 below k untouched
    assert got[3].n_dup_tokens == 0 and got[3].cleaned_text == docs.collect()[2].text
    assert got[4].n_spans == 0 and got[4].cleaned_text == "too short to window"
    # doc 5: every window duplicated (the doc is shared+shared and every
    # 8-window of it appears twice corpus-wide or overlaps the shared
    # gram) -> one merged span covering the whole doc, empty cleaned text
    assert got[5].dup_token_frac == 1.0 and got[5].cleaned_text == ""
    assert got[5].n_spans == 1


def test_corpus_mix_quotas_and_clipping(spark):
    from interpro7_dw_spark.operators.sampling import corpus_mix

    # a: 30 docs, b: 10, c: 10 (plus an unweighted source d)
    rows = [(i, "a") for i in range(30)] + \
           [(100 + i, "b") for i in range(10)] + \
           [(200 + i, "c") for i in range(10)] + \
           [(300 + i, "d") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    # total=25, parts 3:1:3 (partsum 7): base a=10 rem 5, b=3 rem 4,
    # c=10 rem 5 -> clipped to 10; leftover = 25-23 = 2 -> +1 to the two
    # biggest remainders in (rem desc, source) order: a and c (c stays
    # clipped at 10), so quotas a=11, b=3, c=10
    out = corpus_mix(docs, parts={"a": 3, "b": 1, "c": 3}, total=25)
    got = {(r.source, r.quota) for r in out.select("source", "quota").distinct().collect()}
    assert got == {("a", 11), ("b", 3), ("c", 10)}
    by_src = {s: 0 for s, _ in got}
    for r in out.collect():
        by_src[r.source] += 1
        assert r.sample_rank <= r.quota
    assert by_src == {"a": 11, "b": 3, "c": 10}
    # unweighted source excluded entirely
    assert out.where("source = 'd'").count() == 0
    # deterministic rerun
    again = {r.doc_id for r in corpus_mix(
        docs, parts={"a": 3, "b": 1, "c": 3}, total=25).collect()}
    assert {r.doc_id for r in out.collect()} == again


def test_global_shuffle_balance_and_seeding(spark):
    from interpro7_dw_spark.operators.sampling import global_shuffle

    docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    out = global_shuffle(docs, num_shards=7, seed="e1").collect()
    assert len(out) == 100
    sizes = {}
    for r in out:
        sizes[r.shard_id] = sizes.get(r.shard_id, 0) + 1
    # round-robin deal: sizes balanced within one document
    assert set(sizes) == set(range(7))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # (shard_id, shard_pos) is a bijection onto 0..99
    assert len({(r.shard_id, r.shard_pos) for r in out}) == 100
    # a different seed draws a different order (same membership)
    other = global_shuffle(docs, num_shards=7, seed="e2").collect()
    assert {r.doc_id for r in other} == {r.doc_id for r in out}
    pos1 = {r.doc_id: (r.shard_id, r.shard_pos) for r in out}
    pos2 = {r.doc_id: (r.shard_id, r.shard_pos) for r in other}
    assert pos1 != pos2
    # and the same seed replays bit-for-bit
    replay = global_shuffle(docs, num_shards=7, seed="e1").collect()
    assert {(r.doc_id, r.shard_id, r.shard_pos) for r in replay} == \
        {(r.doc_id, r.shard_id, r.shard_pos) for r in out}


def test_contamination_stats_counts_and_broadcast(spark):
    from interpro7_dw_spark.operators.dedup import contamination_stats

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),       # "alpha beta" contaminated
            (2, "gamma delta epsilon zeta"),     # no benchmark bigram
            (3, "alpha beta alpha beta"),        # distinct passages, 2 hit
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(900, "alpha beta"), (901, "beta alpha")], "doc_id long, text string"
    )
    out = contamination_stats(corpus, bench, window=2)
    got = {r.doc_id: (r.n_passages, r.n_contaminated, r.contaminated_frac)
           for r in out.collect()}
    assert got[1] == (3, 1, 0.3333)
    assert got[2] == (3, 0, 0.0)
    # doc 3's distinct bigrams: {alpha beta, beta alpha} — both hit
    assert got[3] == (2, 2, 1.0)
    # the benchmark side is broadcast: corpus never shuffles for the probe
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan


def test_scrub_pii_masks_and_counts(spark):
    from interpro7_dw_spark.operators.text import scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org then call +44-020-7946"),
            (2, "server at 192.168.0.1 and 10.0.0.7 online"),
            (3, "nothing sensitive here"),
            # the email host contains a dotted quad: email masks first,
            # but per-category counts run on the ORIGINAL text, so the
            # embedded quad still counts as an ipv4 sighting
            (4, "x@10.0.0.1.example.com and separately 10.0.0.1"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in scrub_pii(docs).collect()}
    assert got[1].scrubbed == "mail [EMAIL] then call [PHONE]"
    assert (got[1].n_email, got[1].n_ipv4, got[1].n_phone) == (1, 0, 1)
    assert got[2].scrubbed == "server at [IPV4] and [IPV4] online"
    assert got[2].n_ipv4 == 2
    assert got[3].scrubbed == "nothing sensitive here"
    assert (got[3].n_email, got[3].n_ipv4, got[3].n_phone) == (0, 0, 0)
    assert got[4].scrubbed == "[EMAIL] and separately [IPV4]"
    assert (got[4].n_email, got[4].n_ipv4) == (1, 2)


def test_semantic_dedup_min_id_survivor_and_cell_join(spark):
    from interpro7_dw_spark.operators.similarity import semantic_dedup

    # 1 and 2 are near-identical; 3 is its negation; 4 orthogonal
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, threshold=0.95, nlist=2, iters=1)
    got = {r.vec_id: r.is_duplicate for r in out.collect()}
    assert got[2] is True          # higher id of the near-pair
    assert got[1] is False         # min-id survivor kept
    assert got[3] is False and got[4] is False
    assert len(got) == 4           # every row present exactly once
    # candidates are generated by a cid equi-join, never a cross product
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_chunk_documents_coverage_and_short_docs(spark):
    from interpro7_dw_spark.operators.text import chunk_documents

    import pytest as _pytest

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, window=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # chunk starts at 0,3,6: every token covered, last chunk clamped
    chunks = sorted((r.chunk_id, r.chunk_text) for r in by_doc[1])
    assert [c for c, _ in chunks] == [0, 1, 2]
    covered = set()
    for _, text in chunks:
        covered.update(text.split(" "))
    assert covered == {f"t{i}" for i in range(10)}
    # short doc -> exactly one whole-text chunk
    assert [(r.chunk_id, r.chunk_text) for r in by_doc[2]] == [(0, "a b")]
    # a gap-producing stride is refused
    with _pytest.raises(ValueError):
        chunk_documents(docs, window=4, stride=5)


def test_token_rarity_integer_exact_buckets(spark):
    from interpro7_dw_spark.operators.text import token_rarity_stats

    # 'common' appears in 4 docs (bits=2), 'mid' in 2 (bits=1),
    # 'rare' in 1 (bits=0)
    docs = spark.createDataFrame(
        [
            (1, "common mid rare"),
            (2, "common mid"),
            (3, "common"),
            (4, "common common"),  # duplicate token counted once
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in token_rarity_stats(docs).collect()}
    assert (got[1].n_token_types, got[1].df_bits_sum) == (3, 3)  # 2+1+0
    assert got[1].mean_commonness == 1.0
    assert (got[2].n_token_types, got[2].df_bits_sum) == (2, 3)
    assert got[2].mean_commonness == 1.5
    assert (got[3].n_token_types, got[3].df_bits_sum) == (1, 2)
    assert (got[4].n_token_types, got[4].df_bits_sum) == (1, 2)


def test_pagerank_structure_and_determinism(spark, tmp_path):
    from interpro7_dw_spark.operators.graph import pagerank

    # star: everyone points at 0; plus a 2-cycle between 1 and 2
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (1, 2), (2, 1)], "src long, dst long"
    )
    out = {r.node: r.pagerank for r in pagerank(edges, iters=5).collect()}
    # the hub out-ranks every spoke; node 3 (no in-links) gets the floor
    assert out[0] == max(out.values())
    assert out[3] == min(out.values())
    # ranks are probabilities-ish: all positive, total <= 1 (dangling
    # node 0 leaks mass by design)
    assert all(v > 0 for v in out.values())
    assert sum(out.values()) <= 1.0 + 1e-9
    # bit-identical across reruns and with the parquet checkpoint seam
    again = {r.node: r.pagerank for r in pagerank(
        edges, iters=5, checkpoint_dir=str(tmp_path / "pr")).collect()}
    assert again == out


def test_top_tfidf_terms_scoring_and_ties(spark):
    from interpro7_dw_spark.operators.text import top_tfidf_terms

    # N=4 docs (bitlen 3); 'ubiq' in all 4 (bitlen 3 -> idf 0),
    # 'pair' in 2 (bitlen 2 -> idf 1), 'solo'/'alone' in 1 (idf 2)
    docs = spark.createDataFrame(
        [
            (1, "ubiq pair solo solo"),
            (2, "ubiq pair"),
            (3, "ubiq alone"),
            (4, "ubiq"),
        ],
        "doc_id long, text string",
    )
    out = top_tfidf_terms(docs, k=2)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append((r.term_rank, r.token, r.tf, r.score))
    # doc 1: solo tf=2 idf=2 -> 4 beats pair (1*1) and ubiq (1*0)
    assert sorted(got[1]) == [(1, "solo", 2, 4), (2, "pair", 1, 1)]
    # doc 3: alone (2) then ubiq (0)
    assert sorted(got[3]) == [(1, "alone", 1, 2), (2, "ubiq", 1, 0)]
    # doc 4 has a single term; k caps, never pads
    assert sorted(got[4]) == [(1, "ubiq", 1, 0)]


def _py_two_level_fold(pairs, n_buckets):
    """Exact Python replay of functions/folds.py::ordered_fold_sum for
    one group: bucket by order % n_buckets, left-fold per bucket in
    order, left-fold bucket sums in bucket order."""
    from collections import defaultdict

    buckets = defaultdict(list)
    for o, v in pairs:
        buckets[o % n_buckets].append((o, v))
    total = 0.0
    for fb in sorted(buckets):
        acc = 0.0
        for _, v in sorted(buckets[fb]):
            acc += v
        total += acc
    return total


def test_ordered_fold_sum_exact_replay(spark):
    from interpro7_dw_spark.functions.folds import ordered_fold_sum

    pairs = [(i, ((i * 37) % 101) / 7.0) for i in range(1000)]
    df = spark.createDataFrame(
        [(0, o, v) for o, v in pairs], "grp int, ok long, x double"
    )
    for nb in (1, 8, 64):
        got = ordered_fold_sum(
            df, ["grp"], "ok", "x", n_buckets=nb, count_col="cnt"
        ).collect()
        assert len(got) == 1
        assert got[0].cnt == 1000
        assert got[0].fold_sum == _py_two_level_fold(pairs, nb)


def test_pagerank_hub_safe_exact(spark):
    """Property test for the hub-safe fold: one dst receives >= 50% of
    ALL edges (in-degree 200 of 300); the two-level fold must still
    replay the exact Python recursion bit-for-bit, with the hub's
    contributors split across multiple level-1 groups (never one
    task-resident array)."""
    from interpro7_dw_spark.operators.graph import pagerank

    edges = [(s, 0) for s in range(200)] + [(s, 1) for s in range(100)]
    df = spark.createDataFrame(edges, "src long, dst long")
    n_buckets = 8
    got = {r.node: r.pagerank
           for r in pagerank(df, iters=3, n_buckets=n_buckets).collect()}

    deg = {s: (2 if s < 100 else 1) for s in range(200)}
    nodes = sorted(set(range(200)))
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    base = (1.0 - 0.85) / n
    for _ in range(3):
        s = {}
        for dst in (0, 1):
            srcs = range(200) if dst == 0 else range(100)
            s[dst] = _py_two_level_fold(
                [(src, rank[src] / deg[src]) for src in srcs], n_buckets
            )
        rank = {v: base + 0.85 * s.get(v, 0.0) for v in nodes}
    for v in nodes:
        assert got[v] == round(rank[v], 10), v
    # the hub's 200 contributors span every residue class: 8 level-1
    # groups of 25, so no single task ever folds the full in-degree
    assert len({src % n_buckets for src in range(200)}) == n_buckets


def test_ivf_nlist_scales_past_literal_ceiling(spark):
    """nlist=256 end-to-end: the centroid table rides as broadcast
    DATA (single-row array), so the Catalyst expression tree stays
    O(1) in nlist — the old nlist x dim literal encoding would put
    ~16k literal nodes (and a megabyte of plan text) here."""
    import pyspark.sql.functions as F

    from interpro7_dw_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = ivf_topk(emb, F.col("vec_id") < 3, k=3, nlist=256, nprobe=8, iters=1)
    rows = out.collect()
    assert {r.qid for r in rows} == {0, 1, 2}
    assert all(r.rank <= 3 for r in rows)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 200_000, len(plan)


def test_repetition_stats_gopher_filters(spark):
    from interpro7_dw_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # grams: ab ba ab ba ab -> all dup, top 3/5
            (2, "x y z w"),       # all distinct
            (3, "q"),             # shorter than n -> zero row
            (4, "s s s s"),       # one gram repeated 3x
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(df, n=2).collect()}
    assert (got[1].n_ngrams, got[1].n_distinct) == (5, 2)
    assert (got[1].dup_ngram_frac, got[1].top_ngram_frac) == (1.0, 0.6)
    assert (got[2].dup_ngram_frac, got[2].top_ngram_frac) == (0.0, 0.3333)
    assert (got[3].n_ngrams, got[3].dup_ngram_frac, got[3].top_ngram_frac) \
        == (0, 0.0, 0.0)
    assert (got[4].dup_ngram_frac, got[4].top_ngram_frac) == (1.0, 1.0)
    # trigram variant on doc 1: q r q r q r -> [aba bab aba] analogue
    tri = {r.doc_id: r for r in repetition_stats(df, n=3).collect()}
    assert (tri[1].n_ngrams, tri[1].n_distinct) == (4, 2)
    # no shuffle: the whole thing is one ProjectExec chain
    plan = (
        repetition_stats(df, n=2)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_ivf_persisted_index_matches_inline(spark, tmp_path):
    """write_ivf_index + ivf_topk_on_index == ivf_topk run inline with
    the same (nlist, iters, nprobe, k): the build-once index path must
    be a pure re-layout, and the probe scan must be restricted to the
    probed cells' partitions (dynamic partition pruning on cid)."""
    import pyspark.sql.functions as F

    from interpro7_dw_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_on_index,
        write_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path, nlist=8, iters=2)
    queries = emb.filter(F.col("vec_id") < 5)
    out = ivf_topk_on_index(queries, path, k=5, nprobe=3)
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, ivf_topk(
        emb, F.col("vec_id") < 5, k=5, nlist=8, nprobe=3, iters=2
    ).collect()))
    assert got == want and len(got) > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus scan must carry a partition filter on cid (DPP from
    # the broadcast query side), not a full-index scan
    assert "PartitionFilters" in plan
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_domain_blocklist_suffix_semantics(spark):
    from interpro7_dw_spark.operators.text import tag_blocked_domains

    docs = spark.createDataFrame(
        [
            (1, "https://ads.spam.net/x"),       # subdomain -> blocked
            (2, "https://spam.net/y"),           # exact -> blocked
            (3, "https://notspam.net/z"),        # dot boundary -> kept
            (4, "http://good.org:8080/a?b=c"),   # port stripped
            (5, "https://SPAM.net/upper"),       # case-folded
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("spam.net",)], "domain string")
    got = {r.doc_id: (r.host, r.is_blocked)
           for r in tag_blocked_domains(docs, bl).collect()}
    assert got[1] == ("ads.spam.net", True)
    assert got[2] == ("spam.net", True)
    assert got[3] == ("notspam.net", False)
    assert got[4] == ("good.org", False)
    assert got[5] == ("spam.net", True)
    plan = tag_blocked_domains(docs, bl)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_bloom_no_false_negatives_and_fp_bound(spark):
    """Bloom contract at an adversarial fill: no false negatives ever;
    FP rate near the analytic (1-e^{-kn/m})^k. m=1024, k=3, n=128 ->
    ~2.7% expected; assert < 10%."""
    import pyspark.sql.functions as F

    from interpro7_dw_spark.operators.dedup import bloom_bitmap, bloom_probe

    corpus = spark.range(2000).select(
        F.col("id"), F.concat(F.lit("key-"), F.col("id")).alias("key")
    )
    members = corpus.filter(F.col("id") % 16 == 0).select("key")  # 125 keys
    bloom = bloom_bitmap(members, "key", m_bits=1024, k=3)
    out = bloom_probe(corpus, bloom, "key", m_bits=1024, k=3).collect()
    member_ids = {r.id for r in out if r.id % 16 == 0}
    hits = {r.id for r in out if r.bloom_hit}
    assert member_ids <= hits  # NEVER a false negative
    fp = len(hits - member_ids) / (len(out) - len(member_ids))
    assert fp < 0.10, fp
    # probe plan: one broadcast of the one-row bloom, no shuffle of df
    plan = bloom_probe(corpus, bloom, "key", m_bits=1024, k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning(id" not in plan


def test_containment_asymmetry_catches_inclusion(spark):
    """A short doc fully contained in a long one: containment(a in b)
    = 1.0 while Jaccard stays far below any useful threshold — the
    case the asymmetric detector exists for."""
    from interpro7_dw_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
        shingles,
    )

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    sh = shingles(docs)
    cont = {(r.da, r.db): (r.containment_a_in_b, r.containment_b_in_a)
            for r in containment_pairs(sh, 0.9).collect()}
    assert cont[(1, 2)][0] == 1.0      # short fully inside long
    assert cont[(1, 2)][1] < 0.1       # but not the reverse
    assert (1, 3) not in cont and (2, 3) not in cont
    jac = jaccard_pairs(sh, 0.5).collect()
    assert not any({r.da, r.db} == {1, 2} for r in jac)  # Jaccard blind


def test_snapshot_diff_null_key_matches_itself(spark):
    """A row whose key contains a NULL must match itself across
    snapshots (eqNullSafe join) — not show up as a delete+insert
    pair, and presence must be read from the literal markers, not
    key nullness."""
    from interpro7_dw_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(None, "a", 1.0), (1, "b", 2.0)], "k string, s string, v double"
    )
    new = spark.createDataFrame(
        [(None, "a", 9.0), (1, "b", 2.0)], "k string, s string, v double"
    )
    got = snapshot_diff(old, new, ["k"]).collect()
    assert len(got) == 1
    (r,) = got
    assert r.k is None and r.change_type == "update" and r.changed_cols == "v"


def test_pq_topk_string_ids(spark):
    """The two-stage top-k buckets by a HASH of the id — a string
    vec_id must not collapse into one null pmod bucket (the ADVICE
    r8 finding)."""
    from interpro7_dw_spark.operators.similarity import pq_topk

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(200)
        .select(
            F.concat(F.lit("v"), F.col("vec_id").cast("string")).alias("vec_id"),
            "embedding",
        )
    )
    top = pq_topk(
        emb, F.col("vec_id") == "v0", k=3, m=8, ksub=4, iters=1
    ).collect()
    assert len(top) == 3
    assert {r.rank for r in top} == {1, 2, 3}
    assert all(r.vid.startswith("v") for r in top)


def test_grouped_quantiles_empty_keeps_input_types(spark):
    """Empty/all-null inputs must return the INPUT-derived schema
    (long key, decimal value, ...) — not a hardcoded string/double
    DDL that breaks downstream unions."""
    from interpro7_dw_spark.operators.quantiles import grouped_quantiles_exact

    df = spark.createDataFrame([], "user_id long, value float")
    out = grouped_quantiles_exact(df, "user_id", "value")
    assert out.count() == 0
    dt = dict(out.dtypes)
    assert dt == {
        "key": "bigint", "q_ppm": "bigint", "n": "bigint",
        "quantile_value": "float",
    }
    # and a non-empty input of the same shape unions cleanly
    df2 = spark.createDataFrame([(7, 1.5)], "user_id long, value float")
    both = grouped_quantiles_exact(df2, "user_id", "value").unionByName(out)
    assert both.count() == 3  # one row per default q_ppm, none from empty


def test_ivfpq_topk_equivalence_and_dpp(spark, tmp_path):
    """IVFADC: (a) the probe read must be restricted to the probed
    cells' partitions (DPP on cid, like the full-vector IVF index);
    (b) probing ALL cells must reproduce the flat ADC scan
    (pq_topk) EXACTLY — the composition changes candidate
    generation, never scoring; (c) with nprobe < nlist every
    candidate must come from a probed cell (genuine sublinearity)
    and a planted exact duplicate must surface at rank 1 (its cell
    is the query's own nearest cell by construction). Recall-floor
    checks are meaningless here: the synthetic embeddings are
    near-random in 64-d, so even the flat PQ scan has ~0 recall vs
    exact L2 — equivalence and planted-duplicate checks are the
    machine-checkable contracts."""
    from interpro7_dw_spark.operators.similarity import (
        ivfpq_topk,
        pq_topk,
        write_ivfpq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dup = emb.filter("vec_id = 0").select(
        F.lit(9000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(dup)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(corpus, path, nlist=8, m=8, ksub=16, iters=2)
    queries = corpus.filter(F.col("vec_id") < 5)

    # (a) DPP plan shape on the nprobe=3 path
    out = ivfpq_topk(queries, path, k=5, nprobe=3, m=8)
    rows = out.collect()
    assert len(rows) == 5 * 5
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    # (b) probing every cell == the flat ADC scan, value-exact
    allcells = sorted(map(tuple, ivfpq_topk(
        queries, path, k=5, nprobe=8, m=8
    ).collect()))
    flat = sorted(map(tuple, pq_topk(
        corpus, F.col("vec_id") < 5, k=5, m=8, ksub=16, iters=2
    ).collect()))
    assert allcells == flat and len(allcells) == 25

    # (c) sublinearity: every nprobe=3 candidate's cell was probed,
    # and the planted duplicate of vec 0 ranks first for query 0
    from interpro7_dw_spark.operators.similarity import (
        _attach_centroids, _cand_structs, with_norm,
    )
    cells = {r.vid: r.cid for r in spark.read.parquet(path + "/codes")
             .select("vid", "cid").distinct().collect()}
    cents = spark.read.parquet(path + "/centroids")
    pr = _attach_centroids(with_norm(queries), cents).select(
        F.col("vec_id").alias("qid"),
        F.explode(F.slice(F.array_sort(_cand_structs(F.col("__v"))), 1, 3)
                  .getField("cid")).alias("cid"),
    ).collect()
    probed = {}
    for r in pr:
        probed.setdefault(r.qid, set()).add(r.cid)
    assert all(cells[r["vid"]] in probed[r["qid"]] for r in rows)
    q0 = {r.rank: r.vid for r in rows if r.qid == 0}
    assert q0[1] == 9000


def test_bpe_token_conservation_and_ids(spark):
    """Concatenating a word's BPE tokens in tpos order must reproduce
    the word exactly (no symbol lost or invented by the merge folds),
    and token ids must round-trip: 256+rank for merged symbols, code
    point for single characters."""
    from interpro7_dw_spark.operators.bpe import (
        DEFAULT_MERGES,
        bpe_tokenize,
        merges_table,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = bpe_tokenize(docs, merges_table(spark))
    rebuilt = (
        toks.groupBy("doc_id", "wpos")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tpos", "token"))),
                    lambda s: s["token"],
                ),
                "",
            ).alias("w")
        )
    )
    orig = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("wpos", "word")
    ).filter(F.col("word") != "")
    diff = rebuilt.join(orig, ["doc_id", "wpos"]).filter(
        F.col("w") != F.col("word")
    )
    assert diff.count() == 0
    assert rebuilt.count() == orig.count()
    # id round-trip
    by_result = {l + r: 256 + i for i, (l, r) in enumerate(DEFAULT_MERGES)}
    for r in toks.select("token", "token_id").distinct().collect():
        if len(r.token) > 1:
            assert r.token_id == by_result[r.token], r
        else:
            assert r.token_id == ord(r.token), r


def test_bpe_feeds_training_packing(spark):
    """The packing family consumes REAL BPE token ids: each document
    re-rendered as its space-joined id stream, packed into seq_len
    examples — token conservation must hold through the whole
    composition (total non-separator tokens across examples equals
    the corpus' BPE token count)."""
    from interpro7_dw_spark.operators.bpe import bpe_tokenize, merges_table
    from interpro7_dw_spark.operators.sampling import pack_training_examples

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = bpe_tokenize(docs, merges_table(spark))
    id_stream = (
        toks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("wpos", "tpos", "token_id"))
                    ),
                    lambda s: s["token_id"].cast("string"),
                ),
                " ",
            ).alias("ids_text"),
            F.count(F.lit(1)).alias("n_bpe"),
        )
        .join(docs.select("doc_id", "source"), "doc_id")
    )
    packed = pack_training_examples(
        id_stream, budget=512, seq_len=64, text_col="ids_text"
    )
    total_bpe = toks.count()
    non_sep = packed.select(
        F.sum(
            F.size(
                F.filter(
                    F.split("example_text", " "), lambda t: t != F.lit("<eos>")
                )
            )
        ).alias("n")
    ).first().n
    assert non_sep == total_bpe
    # every packed token is a valid id or the separator
    bad = packed.select(
        F.explode(F.split("example_text", " ")).alias("t")
    ).filter(~F.col("t").rlike(r"^(\d+|<eos>)$"))
    assert bad.count() == 0


def test_bpe_learned_merges_roundtrip(spark):
    """Train merges on a tiny corpus with a hand-checkable frequency
    structure, then tokenize with them: the most frequent pair must
    win rank 0 and the learned table must drive bpe_tokenize with
    token conservation intact."""
    from interpro7_dw_spark.operators.bpe import bpe_learn_merges, bpe_tokenize

    docs = spark.createDataFrame(
        [(1, "ababab cd"), (2, "abab cd cd"), (3, "ab")],
        "doc_id long, text string",
    )
    merges = bpe_learn_merges(docs, n_merges=3)
    got = [(r.rank, r.l, r.r) for r in merges.orderBy("rank").collect()]
    # (a,b) appears 6x weighted (3+2+1), clear rank 0
    assert got[0] == (0, "a", "b")
    toks = bpe_tokenize(docs, merges)
    rebuilt = (
        toks.groupBy("doc_id", "wpos")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tpos", "token"))),
                    lambda s: s["token"],
                ),
                "",
            ).alias("w")
        )
    )
    orig = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("wpos", "word")
    ).filter(F.col("word") != "")
    assert rebuilt.join(orig, ["doc_id", "wpos"]).filter(
        F.col("w") != F.col("word")
    ).count() == 0


def test_bpe_learned_merges_results_unique(spark):
    """Learned merge tables must satisfy merges_table's result-string
    uniqueness (bpe_tokenize's merged-token -> rank map needs unique
    keys): the trainer skips any argmax candidate whose concatenation
    collides with an earlier merge result, so its output always
    validates. Run on a repetition-heavy corpus where multi-level
    merges (aa, aaaa, ...) stack up."""
    from interpro7_dw_spark.operators.bpe import bpe_learn_merges, merges_table

    docs = spark.createDataFrame(
        [(1, "aaaa aaa aa aaaaa"), (2, "aa aaaa aaaaaaa a"),
         (3, "ab abab ba bab abc"), (4, "bc abc ab abc bc")],
        "doc_id long, text string",
    )
    merges = bpe_learn_merges(docs, n_merges=10)
    rows = [(r.rank, r.l, r.r) for r in merges.orderBy("rank").collect()]
    results = [l + r for _, l, r in rows]
    assert len(set(results)) == len(results)
    # and the validating constructor accepts it verbatim
    merges_table(spark, [(l, r) for _, l, r in rows])


def test_kcore_peels_pendants(spark):
    """Pendant chains must peel away transitively: removing a leaf can
    drop its neighbor below k in a LATER round — the fixpoint loop,
    not a single degree filter."""
    from interpro7_dw_spark.operators.graph import kcore

    edges = spark.createDataFrame(
        # triangle 1-2-3 plus a chain 3-4-5-6 hanging off it
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)],
        "src long, dst long",
    )
    got = {r.node: r.core_degree for r in kcore(edges, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    # k above the graph's degeneracy: empty core, no error
    assert kcore(edges, k=3).count() == 0


def test_kcore_returns_current_survivors_at_cap(spark):
    """A peel deeper than max_iters must return the CURRENT surviving
    set at the cap — the same semantics as the kcore oracle's capped
    recursive CTE — never raise. A 10-vertex path at k=2 sheds one
    endpoint pair per round: after 2 capped rounds vertices 3..8
    survive (with their in-core degrees, which may be < k at a cap)."""
    from interpro7_dw_spark.operators.graph import kcore

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 10)], "src long, dst long"
    )
    got = {r.node: r.core_degree for r in kcore(path, k=2, max_iters=2).collect()}
    assert got == {3: 1, 4: 2, 5: 2, 6: 2, 7: 2, 8: 1}
    # uncapped, the same graph peels to the empty 2-core
    assert kcore(path, k=2).count() == 0


def test_cdc_apply_roundtrip_with_null_keys(spark):
    """cdc_apply(old, snapshot_delta_rows(old, new)) must equal new
    EXACTLY — including a null-keyed row updated across snapshots and
    a deleted key (absent from the result)."""
    from interpro7_dw_spark.operators.cdc import cdc_apply, snapshot_delta_rows

    old = spark.createDataFrame(
        [(None, "a", 1.0), ("1", "b", 2.0), ("2", "c", 3.0)],
        "k string, s string, v double",
    )
    new = spark.createDataFrame(
        [(None, "a", 9.0), ("1", "b", 2.0), ("3", "d", 4.0)],
        "k string, s string, v double",
    )
    delta = snapshot_delta_rows(old, new, ["k"])
    kinds = {r.k: r.change_type for r in delta.collect()}
    assert kinds == {None: "update", "2": "delete", "3": "insert"}
    # delete rows carry null images; upsert rows carry the new image
    imgs = {r.k: (r.s, r.v) for r in delta.collect()}
    assert imgs["2"] == (None, None)
    assert imgs[None] == ("a", 9.0) and imgs["3"] == ("d", 4.0)
    applied = cdc_apply(old, delta, ["k"])
    key = lambda t: (t[0] is None, t[0] or "", t[1] or "")
    got = sorted(((r.k, r.s, r.v) for r in applied.collect()), key=key)
    want = sorted(((r.k, r.s, r.v) for r in new.collect()), key=key)
    assert got == want


def test_ivfpq_residual_planted_duplicate(spark, tmp_path):
    """Residual-mode IVFADC: a planted exact duplicate must rank 1
    for its source query (its residual equals the source's, so ADC
    distance is the source's own quantization error — minimal), and
    the layouts must not be silently interchangeable (residual codes
    queried in raw mode give a DIFFERENT ranking)."""
    from interpro7_dw_spark.operators.similarity import (
        ivfpq_topk,
        write_ivfpq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dup = emb.filter("vec_id = 0").select(
        F.lit(9000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(dup)
    path = str(tmp_path / "ivfpq_res")
    write_ivfpq_index(
        corpus, path, nlist=8, m=8, ksub=16, iters=2, by_residual=True
    )
    queries = corpus.filter(F.col("vec_id") < 5)
    out = ivfpq_topk(
        queries, path, k=5, nprobe=3, m=8, by_residual=True
    ).collect()
    assert len(out) == 25
    q0 = {r.rank: r.vid for r in out if r.qid == 0}
    assert q0[1] == 9000
    plan_df = ivfpq_topk(queries, path, k=5, nprobe=3, m=8, by_residual=True)
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_pps_sample_properties(spark):
    """Systematic PPS invariants: exactly n points land (sum of
    n_hits == n when no weight exceeds a stride it can't absorb —
    always true since hits count points, which total n); a row
    heavier than W/n must ALWAYS be selected; zero/null weights are
    excluded; determinism across runs."""
    from interpro7_dw_spark.operators.sampling import pps_systematic_sample

    rows = [(i, 10) for i in range(50)] + [(99, 1000), (100, 0), (101, None)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars int")
    out = pps_systematic_sample(docs, n=20, weight_col="n_chars")
    got = out.collect()
    assert sum(r.n_hits for r in got) == 20
    heavy = [r for r in got if r.doc_id == 99]
    # W = 1500, stride = 75; weight 1000 covers >= 13 points
    assert heavy and heavy[0].n_hits >= 13
    assert all(r.doc_id not in (100, 101) for r in got)
    again = sorted(map(tuple, pps_systematic_sample(
        docs, n=20, weight_col="n_chars").collect()))
    assert again == sorted(map(tuple, got))


def test_round_div_portable_at_decimal_half_boundaries(spark):
    """The exact cases where F.round(a/b, d) and DuckDB round()
    disagree (shortest-decimal-repr HALF_UP vs binary value) must
    come out identical — and half-up — from round_div/round_div_sql
    on BOTH engines: 10473/80 at 3 digits (the z_quality_classifier
    sf0.1 find) and 1/160 at 4 digits."""
    import duckdb

    from interpro7_dw_spark.functions.portable import round_div, round_div_sql

    df = spark.createDataFrame(
        [(10473, 80, 3), (1, 160, 4), (33, 80, 4), (0, 7, 4), (7, 7, 4),
         # NEGATIVE numerators (half toward +inf on both engines):
         # -10473/80 at 3 -> -130.912; -1/160 at 4 -> -0.0062
         (-10473, 80, 3), (-1, 160, 4), (-7, 7, 4)],
        "a long, b long, d int",
    )
    got = {
        (r.a, r.b): (r.r3, r.r4)
        for r in df.select(
            "a", "b",
            round_div(F.col("a"), F.col("b"), 3).alias("r3"),
            round_div(F.col("a"), F.col("b"), 4).alias("r4"),
        ).collect()
    }
    # exact rational half-up: 130.9125 -> .913 / .9125; 0.00625 -> .0063
    assert got[(10473, 80)] == (130.913, 130.9125)
    assert got[(1, 160)] == (0.006, 0.0063)
    assert got[(33, 80)] == (0.413, 0.4125)
    assert got[(0, 7)] == (0.0, 0.0)
    assert got[(7, 7)] == (1.0, 1.0)
    # negatives: -130.9125 half-toward-+inf at 3 digits is -130.912;
    # -0.00625 at 4 digits is -0.0062; -1.0 exact stays -1.0
    assert got[(-10473, 80)] == (-130.912, -130.9125)
    assert got[(-1, 160)] == (-0.006, -0.0062)
    assert got[(-7, 7)] == (-1.0, -1.0)
    con = duckdb.connect()
    for (a, b), (r3, r4) in got.items():
        d3 = con.execute(f"SELECT {round_div_sql(str(a), str(b), 3)}").fetchone()[0]
        d4 = con.execute(f"SELECT {round_div_sql(str(a), str(b), 4)}").fetchone()[0]
        assert (d3, d4) == (r3, r4), (a, b, d3, d4, r3, r4)
    # and the motivating counter-example: plain round() DISAGREES here
    duck_round = con.execute("SELECT round(10473 / 80 / 1000.0, 6)").fetchone()[0]
    spark_round = spark.sql("SELECT round(10473 / 80 / 1000.0, 6)").first()[0]
    assert duck_round != spark_round  # the bug round_div exists to avoid


def test_topk_per_group_skew_safe_and_exact(spark):
    """operators/skew.py::topk_per_group — (1) result is EXACTLY the
    naive per-group row_number top-k, hot segment included; (2) the
    plan never windows the bare group key over the full data: the
    first (full-data) window partitions on (__b, group), and only the
    bounded survivor set reaches the per-group window."""
    from pyspark.sql.window import Window

    from interpro7_dw_spark.operators.skew import topk_per_group

    df = (
        spark.range(0, 20000)
        .withColumn(
            "seg",
            F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")),
        )
        .withColumn("score", (F.col("id") * 2654435761 % 1000003).cast("long"))
    )
    order = [F.desc("score"), F.asc("id")]
    got = topk_per_group(df, ["seg"], order, k=7, bucket_cols=["id"])
    naive = (
        df.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("seg").orderBy(*order)),
        ).filter(F.col("rk") <= 7)
    )
    key = lambda d: sorted((r.seg, r.rk, r.id, r.score) for r in d.collect())
    assert key(got) == key(naive)
    assert sum(1 for r in got.collect() if r.seg == "hot") == 7

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    # the phase-1 (full-data) window is bucket-split: its spec carries
    # __b alongside the group key
    assert any("__b" in s for s in specs), plan


def test_sq8_quantization_error_bound_and_planted_neighbor(spark):
    """SQ8 contract: every code lies in [0, 255]; dequantization error
    is at most range/255/2 + eps per dimension (half-up rounding to
    the nearest of 256 levels); a planted near-duplicate is the top-1
    neighbor of its source under the quantized distance."""
    import random

    from pyspark.sql import functions as F

    from interpro7_dw_spark.operators.similarity import (
        sq8_encode,
        sq8_topk,
        sq8_train,
    )

    rnd = random.Random(7)
    dim = 16
    rows = [(i, [rnd.uniform(-2, 2) for _ in range(dim)]) for i in range(40)]
    # plant: vec 40 = vec 0 + tiny noise (well under one quantization step)
    rows.append((40, [x + 1e-4 for x in rows[0][1]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    mn, rng = sq8_train(emb, dim=dim)
    codes = {r.vec_id: r.codes for r in sq8_encode(emb, mn, rng, dim=dim).collect()}
    by_id = dict(rows)
    for vid, cs in codes.items():
        assert all(0 <= c <= 255 for c in cs), (vid, cs)
        for d, c in enumerate(cs):
            deq = mn[d] + (c * rng[d]) / 255.0
            assert abs(deq - by_id[vid][d]) <= rng[d] / 255.0 / 2 + 1e-12

    top = sq8_topk(emb, F.col("vec_id") == 0, k=3, dim=dim).collect()
    assert top[0].qid == 0 and top[0].rank == 1 and top[0].vid == 40


def test_hll_registers_merge_and_estimate_accuracy(spark):
    """HLL contract: registers are a max-merge (union of two halves ==
    registers of the whole), rho stays in [1, 33], and on a
    cardinality well past m the raw estimate lands within the
    standard-error envelope (1.04/sqrt(128) ~ 9.2%; assert 3x)."""
    from pyspark.sql import functions as F

    from interpro7_dw_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    n = 5000
    keys = spark.range(n).select(F.concat(F.lit("k"), "id").alias("key"))
    regs = hll_registers(keys, "key")
    rows = regs.collect()
    assert all(1 <= r.rho <= 33 for r in rows)
    assert len(rows) <= 128

    # mergeability: max-combine of the two halves == whole
    lo = hll_registers(keys.filter(F.col("key") < "k25"), "key")
    hi = hll_registers(keys.filter(F.col("key") >= "k25"), "key")
    merged = {
        r.bucket: r.rho
        for r in lo.unionByName(hi)
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
        .collect()
    }
    assert merged == {r.bucket: r.rho for r in rows}

    est = hll_estimate(regs).collect()[0]
    assert est.n_zero == 128 - len(rows)
    assert abs(est.hll_est - n) / n < 0.28, est.hll_est


def test_histogram_sketch_merge_and_error_bound(spark):
    """Histogram-sketch contract: cell-wise sum of two halves equals
    the whole-table sketch, and every quantile answer is within one
    bin width of the exact order statistic."""
    import random

    from pyspark.sql import functions as F

    from interpro7_dw_spark.operators.quantiles import (
        histogram_quantile,
        histogram_sketch,
    )

    rnd = random.Random(11)
    rows = [("a", rnd.uniform(0, 100)) for _ in range(3000)] + [
        ("b", rnd.gauss(50, 10)) for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    lo = min(r[1] for r in rows)
    hi = max(r[1] for r in rows)
    bins = 128
    sk = histogram_sketch(df, "k", "v", bins=bins, lo=lo, hi=hi)

    lo_half = histogram_sketch(
        df.filter(F.col("v") < 50), "k", "v", bins=bins, lo=lo, hi=hi
    )
    hi_half = histogram_sketch(
        df.filter(F.col("v") >= 50), "k", "v", bins=bins, lo=lo, hi=hi
    )
    merged = {
        (r.key, r.bucket): r.cnt
        for r in lo_half.unionByName(hi_half)
        .groupBy("key", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert merged == {(r.key, r.bucket): r.cnt for r in sk.collect()}

    got = {
        (r.key, r.q_ppm): r.est
        for r in histogram_quantile(sk, [500000, 990000], bins, lo, hi).collect()
    }
    width = (hi - lo) / bins
    for key in ("a", "b"):
        vals = sorted(v for k, v in rows if k == key)
        for q_ppm in (500000, 990000):
            rank = (q_ppm * len(vals) + 999999) // 1000000
            exact = vals[rank - 1]
            assert abs(got[(key, q_ppm)] - exact) <= width + 1e-9


def test_histogram_drift_one_sided_key_and_clamped_counts(spark):
    """A key present in only ONE snapshot must surface tvd=NULL (the
    documented maximal-drift sentinel), never a computed 0.0; and the
    clamped-row indicator reports exactly the out-of-range rows under
    fixed bounds."""
    from interpro7_dw_spark.operators.quantiles import (
        histogram_clamped_counts,
        histogram_drift,
    )

    old = spark.createDataFrame(
        [("both", float(i)) for i in range(20)], "k string, v double"
    )
    new = spark.createDataFrame(
        [("both", float(i) + 5.0) for i in range(20)]
        + [("fresh", float(i)) for i in range(10)],
        "k string, v double",
    )
    got = {r.key: r for r in histogram_drift(old, new, "k", "v", bins=16).collect()}
    assert got["fresh"].n_old is None and got["fresh"].tvd is None
    assert got["both"].tvd is not None and got["both"].tvd > 0.0
    # vanished key: swap the snapshots
    rev = {r.key: r for r in histogram_drift(new, old, "k", "v", bins=16).collect()}
    assert rev["fresh"].n_new is None and rev["fresh"].tvd is None

    clamped = {
        r.key: (r.n_below, r.n_above)
        for r in histogram_clamped_counts(new, "k", "v", lo=3.0, hi=20.0).collect()
    }
    # both: values 5..24 -> 4 above 20; fresh: values 0..9 -> 3 below 3
    assert clamped["both"] == (0, 4)
    assert clamped["fresh"] == (3, 0)


def test_sq8_train_dim_mismatch_is_loud(spark):
    """sq8_train must reject a dim that disagrees with the data
    instead of crashing on the driver (longer vectors) or silently
    zero-coding missing dimensions (shorter vectors)."""
    import pytest as _pytest

    from interpro7_dw_spark.operators.similarity import sq8_train

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, [0.0, 1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="dim=2"):
        sq8_train(emb, dim=2)
    with _pytest.raises(ValueError, match="dim=8"):
        sq8_train(emb, dim=8)
    mn, rng = sq8_train(emb, dim=4)
    assert len(mn) == 4 and rng[0] == 1.0


def test_components_star_equivalence_and_chain_depth(spark):
    """Large-star/small-star must produce EXACTLY min-label
    propagation's components on a random graph, and solve a 300-node
    chain — a topology whose diameter exceeds the label path's
    default round cap — within its O(log^2 n) rounds."""
    import random

    from interpro7_dw_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rnd = random.Random(3)
    edges = [(rnd.randrange(120), rnd.randrange(120)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    label = {r.node: r.component for r in connected_components(df).collect()}
    star = {r.node: r.component for r in connected_components_star(df).collect()}
    assert star == label

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(299)], "src long, dst long"
    )
    got = {r.node: r.component for r in connected_components_star(chain).collect()}
    assert len(got) == 300 and set(got.values()) == {0}


def test_pca_rotation_is_isometry_and_decorrelates(spark):
    """pca_rotation: rotating embeddings leaves exact cosine top-k
    EXACTLY unchanged (isometry), the rotation matrix is orthonormal,
    and the rotated coordinates are decorrelated (off-diagonal
    covariance ~0) with descending variance — the property PQ's
    subspace independence assumption wants."""
    import random

    import numpy as np

    from pyspark.sql import functions as F

    from interpro7_dw_spark.operators.similarity import (
        cosine_topk,
        pca_rotation,
        rotate_embeddings,
    )

    rnd = random.Random(3)
    dim = 8
    # correlated data: low-rank latent + noise
    basis = [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(2)]
    rows = []
    for i in range(120):
        z = [rnd.gauss(0, 2), rnd.gauss(0, 1)]
        v = [
            z[0] * basis[0][d] + z[1] * basis[1][d] + rnd.gauss(0, 0.1)
            for d in range(dim)
        ]
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    rot = pca_rotation(emb, dim=dim)
    R = np.array(rot)
    assert np.allclose(R @ R.T, np.eye(dim), atol=1e-8)

    remb = rotate_embeddings(emb, rot)
    before = sorted(
        (r.qid, r.rank, r.vid)
        for r in cosine_topk(emb, F.col("vec_id") < 10, k=3).collect()
    )
    after = sorted(
        (r.qid, r.rank, r.vid)
        for r in cosine_topk(remb, F.col("vec_id") < 10, k=3).collect()
    )
    assert before == after

    X = np.array([v for _i, v in rows])
    Xr = X @ R.T
    cov = np.cov(Xr, rowvar=False)
    off = cov - np.diag(np.diag(cov))
    assert np.max(np.abs(off)) < 1e-6
    d = np.diag(cov)
    assert all(d[i] >= d[i + 1] - 1e-9 for i in range(dim - 1))


def test_opq_rotation_descends_and_stays_orthonormal(spark):
    """Full non-parametric OPQ (Ge et al. 2013 §4.2): each alternating
    iteration is the exact minimizer of its half-problem, so the PQ
    quantization error under the refined rotation must be <= the
    eigenvalue-allocation initializer's, and every returned rotation
    stays orthonormal (both half-steps preserve orthogonality by
    construction). Clustered low-rank corpus — the case where the
    refinement has signal to exploit."""
    import numpy as np

    from pyspark.sql import functions as F

    from interpro7_dw_spark.operators.similarity import (
        opq_rotation,
        pca_rotation,
        pq_codebooks_df,
        pq_encode,
        pq_reconstruct,
        rotate_embeddings,
    )
    from interpro7_dw_spark.sources.genfixtures import clustered_embeddings_path

    emb = (
        spark.read.parquet(clustered_embeddings_path())
        .filter(F.col("vec_id") < 600)
        .select("vec_id", "embedding")
    )
    dim, m, ksub, pq_iters = 64, 8, 8, 1

    def qerr(R) -> float:
        rotated = rotate_embeddings(emb, R)
        cdf = pq_codebooks_df(
            rotated, m=m, ksub=ksub, iters=pq_iters, dim=dim
        )
        recon = pq_reconstruct(pq_encode(rotated, cdf, m=m, dim=dim), cdf)
        return (
            rotated.join(recon, "vec_id")
            .select(
                F.aggregate(
                    F.zip_with(
                        F.col("embedding"),
                        F.col("recon"),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("e")
            )
            .agg(F.sum("e").alias("t"))
            .collect()[0]["t"]
        )

    R0 = pca_rotation(emb, dim=dim, m=m)
    R2 = opq_rotation(
        emb, dim=dim, m=m, ksub=ksub, iters=2, pq_iters=pq_iters
    )
    A = np.array(R2)
    assert np.allclose(A @ A.T, np.eye(dim), atol=1e-8)
    e0, e2 = qerr(R0), qerr(R2)
    # exact minimizers per half-step: non-increasing (1e-6 float slack)
    assert e2 <= e0 * (1.0 + 1e-6), (e0, e2)


def test_engine_cache_scope_releases_owned_persists(spark):
    """caching.py: ownership of operator persists is structural — a
    scope releases exactly the owned_persist blocks taken inside it
    (nested scopes release only their own), never a cache persisted
    outside the registry (a user's own cache)."""
    from interpro7_dw_spark.caching import engine_cache_scope, owned_persist

    user_df = spark.range(3).persist()
    user_df.count()
    with engine_cache_scope():
        outer = owned_persist(spark.range(10))
        outer.count()
        assert outer.storageLevel.useMemory
        with engine_cache_scope():
            inner = owned_persist(spark.range(5))
            inner.count()
            assert inner.storageLevel.useMemory
        assert not inner.storageLevel.useMemory   # inner scope released it
        assert outer.storageLevel.useMemory       # ... and only it
    assert not outer.storageLevel.useMemory
    assert user_df.storageLevel.useMemory         # user caches untouched
    user_df.unpersist()
