"""ANN recall/nprobe curve — IVF-flat and IVFADC recall@5 against the
exact cosine top-5, on (a) the driver's i.i.d.-random embeddings table
and (b) the deterministic mixture-of-Gaussians fixture
(sources/genfixtures.py). The random table is the documented PQ worst
case (recall ~ noise); the clustered fixture is what real embedding
corpora look like and is where the recall numbers mean something.
Results go into PERF.md.

Usage: python tools/ann_curve.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from interpro7_dw_spark.operators import similarity as S
from interpro7_dw_spark.plans.spec import fixture_dir
from interpro7_dw_spark.session import get_spark
from interpro7_dw_spark.sources.genfixtures import clustered_embeddings_path

N_QUERIES = 50
K = 5
NLIST = 8


def curve(spark, emb, tag: str) -> None:
    emb = emb.persist()
    exact = S.cosine_topk(emb, F.col("vec_id") < N_QUERIES, k=K).persist()
    exact.count()
    for nprobe in (1, 2, 4, 8):
        t0 = time.time()
        approx = S.ivf_topk(
            emb, F.col("vec_id") < N_QUERIES, k=K, nlist=NLIST, nprobe=nprobe
        )
        r = (
            S.ann_recall_at_k(approx, exact, k=K)
            .agg(F.avg("recall").alias("r"))
            .collect()[0]["r"]
        )
        print(json.dumps({
            "corpus": tag, "path": "ivf_flat", "nprobe": nprobe,
            "recall_at_5": round(float(r), 3),
            "wall_s": round(time.time() - t0, 2),
        }))
        spark.catalog.clearCache()
        emb.persist(); exact.persist()
    for nprobe in (1, 2, 4, 8):
        t0 = time.time()
        approx = S.ivf_sq8_topk(
            emb, F.col("vec_id") < N_QUERIES, k=K, nlist=NLIST, nprobe=nprobe
        )
        r = (
            S.ann_recall_at_k(approx, exact, k=K)
            .agg(F.avg("recall").alias("r"))
            .collect()[0]["r"]
        )
        print(json.dumps({
            "corpus": tag, "path": "ivf_sq8", "nprobe": nprobe,
            "recall_at_5": round(float(r), 3),
            "wall_s": round(time.time() - t0, 2),
        }))
        spark.catalog.clearCache()
        emb.persist(); exact.persist()
    for m, ksub in ((8, 16), (16, 16), (8, 4)):
        idx = fixture_dir(f"ann_curve_{tag}_m{m}k{ksub}")
        shutil.rmtree(idx, ignore_errors=True)
        S.write_ivfpq_index(emb, idx, nlist=NLIST, m=m, ksub=ksub, iters=2)
        for nprobe in (1, 2, 4, 8):
            t0 = time.time()
            approx = S.ivfpq_topk(
                emb.filter(F.col("vec_id") < N_QUERIES), idx,
                k=K, nprobe=nprobe, m=m,
            )
            r = (
                S.ann_recall_at_k(approx, exact, k=K)
                .agg(F.avg("recall").alias("r"))
                .collect()[0]["r"]
            )
            print(json.dumps({
                "corpus": tag, "path": f"ivfpq_m{m}_ksub{ksub}",
                "nprobe": nprobe, "recall_at_5": round(float(r), 3),
                "wall_s": round(time.time() - t0, 2),
            }))
            spark.catalog.clearCache()
            emb.persist(); exact.persist()
        shutil.rmtree(idx, ignore_errors=True)
    # OPQ-style lever (clustered corpus only — the case where raw-space
    # PQ saturates): PCA + eigenvalue allocation (Ge et al. 2013
    # non-parametric OPQ), rebuild the m=16 index in the rotated space,
    # query with rotated queries; exact top-k is rotation-invariant so
    # recall compares directly. (Plain PCA WITHOUT the balancing step
    # collapses recall to ~0.2 on this fixture — measured, PERF.md r12.)
    if tag == "clustered":
        rot = S.pca_rotation(emb, m=16)
        remb = S.rotate_embeddings(emb, rot).persist()
        idx = fixture_dir(f"ann_curve_{tag}_opq_m16")
        shutil.rmtree(idx, ignore_errors=True)
        S.write_ivfpq_index(remb, idx, nlist=NLIST, m=16, ksub=16, iters=2)
        for nprobe in (1, 2, 4, 8):
            t0 = time.time()
            approx = S.ivfpq_topk(
                remb.filter(F.col("vec_id") < N_QUERIES), idx,
                k=K, nprobe=nprobe, m=16,
            )
            r = (
                S.ann_recall_at_k(approx, exact, k=K)
                .agg(F.avg("recall").alias("r"))
                .collect()[0]["r"]
            )
            print(json.dumps({
                "corpus": tag, "path": "ivfpq_m16_opq_balanced",
                "nprobe": nprobe, "recall_at_5": round(float(r), 3),
                "wall_s": round(time.time() - t0, 2),
            }))
            spark.catalog.clearCache()
            emb.persist(); exact.persist(); remb.persist()
        shutil.rmtree(idx, ignore_errors=True)
        remb.unpersist()
        # FULL alternating OPQ (Ge et al. 2013 §4.2): eigenvalue-
        # allocation init + 2 rounds of [subspace Lloyd -> orthogonal
        # Procrustes re-solve] — the next rung above the initializer
        # named by PERF.md r12.
        rot2 = S.opq_rotation(emb, m=16, ksub=16, iters=2, pq_iters=2)
        remb2 = S.rotate_embeddings(emb, rot2).persist()
        idx = fixture_dir(f"ann_curve_{tag}_opq_full_m16")
        shutil.rmtree(idx, ignore_errors=True)
        S.write_ivfpq_index(remb2, idx, nlist=NLIST, m=16, ksub=16, iters=2)
        for nprobe in (1, 2, 4, 8):
            t0 = time.time()
            approx = S.ivfpq_topk(
                remb2.filter(F.col("vec_id") < N_QUERIES), idx,
                k=K, nprobe=nprobe, m=16,
            )
            r = (
                S.ann_recall_at_k(approx, exact, k=K)
                .agg(F.avg("recall").alias("r"))
                .collect()[0]["r"]
            )
            print(json.dumps({
                "corpus": tag, "path": "ivfpq_m16_opq_full_alt2",
                "nprobe": nprobe, "recall_at_5": round(float(r), 3),
                "wall_s": round(time.time() - t0, 2),
            }))
            spark.catalog.clearCache()
            emb.persist(); exact.persist(); remb2.persist()
        shutil.rmtree(idx, ignore_errors=True)
        remb2.unpersist()
        # UNIT-SPHERE OPQ (r14): normalize the corpus first, train the
        # full alternation on the normalized vectors, serve PQ/ADC on
        # them — on the sphere the L2 objective is 2-2cos, so the
        # alternation finally optimizes the metric recall is scored on
        # (the r13 ladder's documented misalignment).
        nemb = S.l2_normalize_embeddings(emb).persist()
        rot3 = S.opq_rotation(
            nemb, m=16, ksub=16, iters=2, pq_iters=2
        )
        remb3 = S.rotate_embeddings(nemb, rot3).persist()
        idx = fixture_dir(f"ann_curve_{tag}_opq_cos_m16")
        shutil.rmtree(idx, ignore_errors=True)
        S.write_ivfpq_index(remb3, idx, nlist=NLIST, m=16, ksub=16, iters=2)
        for nprobe in (1, 2, 4, 8):
            t0 = time.time()
            approx = S.ivfpq_topk(
                remb3.filter(F.col("vec_id") < N_QUERIES), idx,
                k=K, nprobe=nprobe, m=16,
            )
            r = (
                S.ann_recall_at_k(approx, exact, k=K)
                .agg(F.avg("recall").alias("r"))
                .collect()[0]["r"]
            )
            print(json.dumps({
                "corpus": tag, "path": "ivfpq_m16_opq_unit_sphere",
                "nprobe": nprobe, "recall_at_5": round(float(r), 3),
                "wall_s": round(time.time() - t0, 2),
            }))
            spark.catalog.clearCache()
            emb.persist(); exact.persist(); nemb.persist(); remb3.persist()
        shutil.rmtree(idx, ignore_errors=True)
        remb3.unpersist()
        nemb.unpersist()
    exact.unpersist()
    emb.unpersist()


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann_curve")
    curve(spark, spark.read.parquet(f"{sf}/embeddings.parquet"), "random")
    curve(
        spark,
        spark.read.parquet(clustered_embeddings_path()),
        "clustered",
    )


if __name__ == "__main__":
    main()
