"""Table catalog over the driver's synthetic star schema.

Mirrors the reference's dataset catalog idea (``DataFiles``,
reference cli.py:17-57): one place that knows where every dataset
lives and how to read it. Here every dataset is a Parquet table under
an ``sf`` directory (see /root/repo/TESTDATA.md).

Scale notes: parquet scans get predicate pushdown + column pruning
from Catalyst for free; callers should ``select``/``filter`` early so
the scan node carries ``PushedFilters``/narrow ``ReadSchema``. Small
dimension tables (region, nation, supplier) are flagged so join
builders can ``broadcast()`` them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# name -> is_small_dimension (broadcast candidate at any scale)
TABLES: dict[str, bool] = {
    "region": True,
    "nation": True,
    "customer": False,
    "supplier": True,
    "part": False,
    "orders": False,
    "lineitem": False,
    "events": False,
    "documents": False,
    "embeddings": False,
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLES)}")
    if name == "events":
        # Some generations of events.parquet carry TIMESTAMP(NANOS),
        # which Spark's reader rejects unless read as epoch-nanos LONG.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(spark, df)
    return df


def normalize_event_ts(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to epoch-NANOS LONG whatever the parquet
    physical type (TIMESTAMP(NANOS)→long via the legacy flag, or
    TIMESTAMP(MICROS)→timestamp_ntz). Every downstream plan does exact
    integer time arithmetic on nanos, which sidesteps tz / float-epoch
    pitfalls and matches DuckDB's ``epoch_ns(ts)`` bit-for-bit (the
    naive timestamp is interpreted as UTC)."""
    dtype = dict(df.dtypes).get("ts")
    if dtype in (None, "bigint"):
        return df
    # timestamp_ntz: the naive value is interpreted as UTC (DuckDB
    # semantics). timestampdiff on two NTZ values is pure wall-clock
    # arithmetic, so the result is identical under ANY session timezone
    # — no session-conf mutation, safe under the driver's own session.
    return df.withColumn(
        "ts",
        (
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
            * F.lit(1000)
        ).cast("long"),
    )


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register tables as temp views so plans can be written in SQL."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
