"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``interpro7_dw_spark.plans`` — the query catalog
where every operator family from SURVEY.md §2 is declared as a
(Spark builder, DuckDB oracle SQL) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the engine package lives next to this file; make the import robust
# to drivers that load this module from another working directory
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from interpro7_dw_spark.plans.spec import all_specs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: multi-way star join + exact-decimal aggregation
    (SURVEY §2.3 J6/J2 + §2.4 A1) on sf0.001."""
    specs = all_specs()
    return specs["revenue_by_nation"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in sorted(all_specs().items())}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in sorted(all_specs().items())
        if spec.oracle is not None
    }
