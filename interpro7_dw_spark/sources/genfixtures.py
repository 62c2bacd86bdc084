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
