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


def read_tar_members(
    spark: SparkSession,
    path: str,
    member_glob: str | None = None,
    decompress_gz_members: bool = True,
) -> DataFrame:
    """tar / tar.gz member source (SURVEY §2.1 S5; reference
    bfvd.py:9-36 iterates a tar of gzipped JSON members, and
    interpro/ftp/iprscan.py walks member files the same way).

    Plan shape: ``binaryFile`` scan over the archive path(s) →
    ``mapInPandas`` unpack, one output row per member:
    ``(archive, member, content binary)``.

    Scale notes: a single tar is unsplittable, so ONE archive = ONE
    task — parallelism comes from many archives (the reference's
    layouts are directories of per-release tarballs; pass a glob).
    Members stream through ``tarfile`` sequentially, so peak memory is
    one member + one Arrow batch, not the whole archive. For a lone
    100 GB tarball the right move is a one-time re-shard into N
    smaller tars (or parquet) — documented here rather than hidden
    behind a fake splittable reader.
    """
    import fnmatch

    out_schema = T.StructType(
        [
            T.StructField("archive", T.StringType()),
            T.StructField("member", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def unpack(batches):
        import gzip
        import io
        import tarfile

        import pandas as pd

        for pdf in batches:
            for apath, blob in zip(pdf["path"], pdf["content"]):
                rows = {"archive": [], "member": [], "content": []}
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                    for info in tar:
                        if not info.isfile():
                            continue
                        if member_glob and not fnmatch.fnmatch(info.name, member_glob):
                            continue
                        data = tar.extractfile(info).read()
                        if decompress_gz_members and data[:2] == b"\x1f\x8b":
                            data = gzip.decompress(data)
                        rows["archive"].append(apath)
                        rows["member"].append(info.name)
                        rows["content"].append(data)
                        if len(rows["member"]) >= 256:
                            yield pd.DataFrame(rows)
                            rows = {"archive": [], "member": [], "content": []}
                if rows["member"]:
                    yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    # one archive per task: tar decode is the bottleneck, not the scan
    return files.repartition(F.col("path")).mapInPandas(unpack, out_schema)


def read_tar_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    member_glob: str | None = "*.json*",
) -> DataFrame:
    """JSON-members-in-tar source (reference bfvd.py:14-34: tar.gz of
    gzipped JSON documents). Members decode JVM-side via ``from_json``
    after the tar unpack — the Python stage only moves bytes."""
    members = read_tar_members(spark, path, member_glob=member_glob)
    return members.select(
        "archive",
        "member",
        F.from_json(F.col("content").cast("string"), schema).alias("doc"),
    ).select("archive", "member", "doc.*")


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
