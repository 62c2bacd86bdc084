"""Partition-count invariance: results must be BIT-IDENTICAL when the
shuffle partition count changes. This is the strongest cheap test of
the engine-determinism contract — collect_list order, float summation
order and row_number tie resolution all shift with partitioning, so
any unpinned order-sensitive reduction shows up as a diff here (the
same class of bug the sf0.1 differ caught in the domain_id tiebreak).
"""

from __future__ import annotations

import pytest

from interpro7_dw_spark.plans.spec import all_specs

from conftest import SF_SMALL

# queries whose pipelines contain order-sensitive reductions the
# engine claims to have pinned
SENSITIVE = [
    "pagerank",              # pinned-fold float sums per iteration
    "z_embedding_ivf_topk",    # pinned-fold Lloyd centroid means
    "z_domain_merge_matches",  # total-order domain_id + sorted JSON folds
    "z_sample_stratified",     # two-phase bucket-split ranks
    "z_token_shards",          # two-phase running sums
    "dedup_minhash_lsh",       # min-hash over grouped shingles
]


def _rows(spark, name: str) -> set[tuple]:
    df = all_specs()[name].build(spark, SF_SMALL)
    cols = sorted(df.columns)
    return {tuple(r[c] for c in cols) for r in df.collect()}


@pytest.mark.parametrize("name", SENSITIVE)
def test_partition_count_invariance(spark, name):
    conf = spark.conf
    orig = conf.get("spark.sql.shuffle.partitions")
    try:
        conf.set("spark.sql.shuffle.partitions", "7")
        seven = _rows(spark, name)
        conf.set("spark.sql.shuffle.partitions", "31")
        thirty1 = _rows(spark, name)
    finally:
        conf.set("spark.sql.shuffle.partitions", orig)
    assert seven == thirty1, f"{name} varies with partition count"
