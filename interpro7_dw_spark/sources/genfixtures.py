"""Deterministic generated fixtures — data with STRUCTURE the driver's
synthetic tables lack, written once as parquet (engine-independent:
numpy + pyarrow, no Spark/DuckDB involved in generation, so both
engines read the identical bytes).

The first resident is a mixture-of-Gaussians embedding table: the
driver's `embeddings` table is i.i.d. random, which is the documented
worst case for product quantization (PERF.md round 10 — ADC recall
~0.1 is noise because random high-dim vectors have no subspace
structure for the codebooks to exploit). ANN recall numbers are only
meaningful on clustered data, which is also what real embedding
corpora look like.
"""

from __future__ import annotations

import os

from ..plans.spec import fixture_dir


def clustered_embeddings_path(
    n: int = 2000,
    dim: int = 64,
    k: int = 8,
    seed: int = 42,
    spread: float = 1.5,
    zdim: int = 2,
    zscale: float = 1.0,
    eps: float = 0.05,
) -> str:
    """Write-once clustered low-rank embeddings as a single parquet
    file; returns its path. ``k`` Gaussian cluster centers
    (~ N(0, spread^2)^dim, the IVF structure) plus a SHARED rank-
    ``zdim`` latent component (x = center + B z, z ~ N(0, zscale^2),
    plus N(0, eps^2) noise — the manifold structure real embedding
    corpora have and i.i.d. random vectors lack). The low-rank spread
    is what lets product quantization rank within a neighborhood:
    purely isotropic clusters collapse to one code per cell and ADC
    recall stays at noise (measured — see PERF.md round 11), exactly
    as the PQ literature predicts. Deterministic: numpy PCG64 with a
    fixed seed, float32 values; schema (vec_id long, embedding
    list<float>, label int) — the driver table's schema, so every
    similarity operator runs unchanged."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = (
        fixture_dir(
            f"emb_clustered_n{n}_d{dim}_k{k}_z{zdim}_s{seed}"
        )
        + ".parquet"
    )
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, spread, (k, dim))
    basis = rng.normal(0.0, 1.0, (zdim, dim))
    labels = rng.integers(0, k, n)
    z = rng.normal(0.0, zscale, (n, zdim))
    pts = (
        centers[labels] + z @ basis + rng.normal(0.0, eps, (n, dim))
    ).astype("float32")
    table = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row for row in pts.tolist()], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.tolist(), pa.int32()),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)  # atomic: readers never see a half-write
    return path


def opq_rotation_path(
    m: int = 16, ksub: int = 8, iters: int = 2, lloyd_iters: int = 2,
    normalize: bool = False,
) -> str:
    """Write-once OPQ rotation matrix for the clustered fixture,
    derived by the FULL alternating optimization (Ge et al. 2013
    §4.2) run in NUMPY at fixture-generation time — engine-
    independent and deterministic, like the fixture itself: eigenvalue
    -allocation PCA init (§4.1), then ``iters`` rounds of [per-
    subspace k-means on the rotated corpus → orthogonal-Procrustes
    re-solve R = V·Uᵀ from the SVD of Σ x·q(Rx)ᵀ]. The catalog spec
    ``z_ann_recall_opq`` reads the SAME parquet bytes in both engines
    and replays rotation application + PQ/ADC + recall — the
    trainer's Spark twin (``operators/similarity.py::opq_rotation``)
    is pinned separately by tests (isometry, objective descent).
    Schema: (i int, row list<double>), rows ordered by i. The file
    name fingerprints the embedding fixture, so regenerating the
    corpus invalidates the rotation."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..plans.spec import fixture_dir

    emb_path = clustered_embeddings_path()
    variant = "_cos" if normalize else ""
    path = (
        fixture_dir(
            f"opq_rot_m{m}_k{ksub}_i{iters}{variant}", input_path=emb_path
        )
        + ".parquet"
    )
    if os.path.exists(path):
        return path
    tbl = pq.read_table(emb_path)
    X = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    if normalize:
        # unit-sphere OPQ: train on the L2-normalized corpus so the
        # alternation's L2 objective equals 2 - 2*cos (the cosine-
        # aligned rung; the serve path normalizes identically)
        nrm = np.linalg.norm(X, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0
        X = X / nrm
    ids = np.asarray(tbl["vec_id"].to_pylist())
    n, dim = X.shape
    w = dim // m
    assert w * m == dim, (dim, m)

    # §4.1 init: PCA + eigenvalue allocation + sign canonicalization
    # (the same derivation as operators/similarity.py::pca_rotation)
    mu = X.mean(axis=0)
    cov = X.T @ X / n - np.outer(mu, mu)
    ev, vecs = np.linalg.eigh(cov)
    order = np.argsort(ev)[::-1]
    ev = ev[order]
    rot = vecs[:, order].T
    cap = dim // m
    buckets: list[list[int]] = [[] for _ in range(m)]
    sums = [0.0] * m
    for idx in range(dim):
        cand = min(
            (b for b in range(m) if len(buckets[b]) < cap),
            key=lambda b: sums[b],
        )
        buckets[cand].append(idx)
        sums[cand] += float(np.log(max(float(ev[idx]), 1e-12)))
    rot = rot[[i for b in buckets for i in b]]
    for i in range(dim):
        nz = np.nonzero(np.abs(rot[i]) > 1e-12)[0]
        if len(nz) and rot[i][nz[0]] < 0:
            rot[i] = -rot[i]
    R = rot

    # seeds: the ksub corpus ids with the smallest (md5(str(id)), id)
    seed_order = sorted(
        range(n),
        key=lambda k: (hashlib.md5(str(ids[k]).encode()).hexdigest(), ids[k]),
    )[:ksub]

    for _ in range(iters):
        Y = X @ R.T
        recon = np.empty_like(Y)
        for sub in range(m):
            S = Y[:, sub * w : (sub + 1) * w]
            C = S[seed_order].copy()
            for _ll in range(lloyd_iters):
                # argmin ||s-c||^2 with ascending-cid tiebreak
                d = (
                    (C * C).sum(axis=1)[None, :]
                    - 2.0 * S @ C.T
                )
                codes = np.argmin(d, axis=1)  # argmin takes first (lowest cid) on ties
                for cid in range(ksub):
                    members = S[codes == cid]
                    if len(members):
                        C[cid] = members.mean(axis=0)
            d = (C * C).sum(axis=1)[None, :] - 2.0 * S @ C.T
            codes = np.argmin(d, axis=1)
            recon[:, sub * w : (sub + 1) * w] = C[codes]
        # orthogonal Procrustes: max tr(R M), M = X^T recon
        U, _s, Vt = np.linalg.svd(X.T @ recon)
        R = Vt.T @ U.T

    table = pa.table(
        {
            "i": pa.array(range(dim), pa.int32()),
            "row": pa.array([list(map(float, r)) for r in R], pa.list_(pa.float64())),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path
