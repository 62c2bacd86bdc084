"""Non-parquet sources (SURVEY.md §2.1 S4-S8).

Every reader takes an explicit schema — no inference in production
paths (inference is a full extra pass over the data and makes plans
non-deterministic across runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """CSV/TSV source (reference AlphaFold accession CSV,
    alphafold.py:37-57). Handles .gz transparently (Hadoop codecs)."""
    return (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("header", str(header).lower())
        .csv(path)
    )


def read_tsv(spark: SparkSession, path: str, schema, header: bool = False) -> DataFrame:
    """TSV source (reference PSI-MI TAB 42-column interactions,
    intact.py:24-97)."""
    return read_csv(spark, path, schema, sep="\t", header=header)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON-lines source (reference BFVD json.gz members,
    bfvd.py:14-34 — pre-extracted to JSONL; tar members would go
    through binaryFile + a mapPartitions unpacker)."""
    return spark.read.schema(schema).json(path)


def read_stanza_file(
    spark: SparkSession,
    path: str,
    record_sep: str = "//",
) -> DataFrame:
    """Attribute-stanza source (reference MetaCyc .dat parser,
    metacyc.py:12-81): records separated by ``record_sep`` lines, each
    record a set of ``KEY - VALUE`` lines. Returns (record_id, attrs
    map). Whole-file parse via text read + aggregation on a running
    record id — single small file in the reference, so one task."""
    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("line_no"), "value"
    )
    # running record id = count of separators before this line
    from pyspark.sql import Window

    w = Window.orderBy("line_no").rowsBetween(Window.unboundedPreceding, 0)
    recs = (
        lines.withColumn("is_sep", (F.col("value") == record_sep).cast("int"))
        .withColumn("rec_id", F.sum("is_sep").over(w))
        .filter((F.col("is_sep") == 0) & F.col("value").contains(" - "))
        .select(
            "rec_id",
            F.split(F.col("value"), " - ", 2)[0].alias("key"),
            F.split(F.col("value"), " - ", 2)[1].alias("val"),
        )
        .groupBy("rec_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("key", "val"))).alias("attrs"))
    )
    return recs
