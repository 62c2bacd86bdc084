"""Differential tests: every declared query must match its DuckDB
oracle at sf0.001 (the driver gate runs the same comparison at sf0.01;
tools/differ.py covers that scale out-of-band)."""

from __future__ import annotations

import pytest

from interpro7_dw_spark.plans.spec import all_specs

from conftest import SF_SMALL

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck_small):
    from interpro7_dw_spark.testing import compare_spec

    spec = SPECS[name]
    problems = compare_spec(spec, spark, duck_small, SF_SMALL)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    # every oracle-less query is a deliberate exception, listed here
    rows_only = set(qs) - set(os_)
    assert rows_only == {"embedding_lsh_topk", "domain_merge_matches", "multimodal_decode"}
