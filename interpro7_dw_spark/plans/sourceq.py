"""Source-reader round-trip catalog entries: promote the non-parquet
sources (SURVEY §2.1 S4/S5/S7) from tests-only to differ-checked. Each
build writes a deterministic fixture derived from the star schema into
``spark-warehouse/fixtures/`` (gitignored scratch), reads it back
through the REAL reader (sources/readers.py), and projects rows the
DuckDB oracle recomputes from the parquet views — so the gz codec
path, schema application, tar member unpacking and stanza parsing all
feed a value hash.
"""

from __future__ import annotations

import gzip
import io
import os
import tarfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_csv, read_stanza_file, read_tar_json
from .spec import QuerySpec, fixture_dir, register, t

_FIXDIR = fixture_dir("")


def _csv_fixture(spark: SparkSession, sf: str) -> str:
    """documents projected to CSV.gz via the DataFrameWriter (quoting
    exercised by the lang/source strings; text reduced to md5 so the
    fixture stays newline-free and byte-stable)."""
    out = os.path.join(_FIXDIR, "csv_docs_" + sf.replace("/", "_"))
    (
        t(spark, sf, "documents")
        .select("doc_id", "lang", "source", F.md5("text").alias("text_md5"), "n_chars")
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", "true")
        .option("compression", "gzip")
        .csv(out)
    )
    return out


register(QuerySpec(
    name="z_source_csv_roundtrip",
    tags=("S4", "F3"),
    description="CSV.gz source round-trip (reference AlphaFold "
    "accession CSV, alphafold.py:37-57): documents projected to a "
    "gzipped CSV fixture, read back through sources/readers.read_csv "
    "with an explicit schema, value-hashed against the parquet view.",
    build=lambda spark, sf: read_csv(
        spark,
        _csv_fixture(spark, sf),
        "doc_id string, lang string, source string, text_md5 string, n_chars bigint",
    ),
    oracle="""
        SELECT doc_id, lang, source, md5(text) AS text_md5, n_chars
        FROM documents
    """,
))


def _tar_fixture(spark: SparkSession, sf: str) -> str:
    """tar.gz of gzipped JSON members: 64 documents (2 per member file,
    sorted by doc_id) — the reference BFVD layout (bfvd.py:9-36)."""
    out_dir = os.path.join(_FIXDIR, "tar_docs_" + sf.replace("/", "_"))
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "members.tar.gz")
    rows = (
        t(spark, sf, "documents")
        .select("doc_id", "lang", F.md5("text").alias("text_md5"))
        .orderBy("doc_id")
        .limit(64)
        .collect()
    )
    with tarfile.open(out, "w:gz") as tar:
        for i in range(0, len(rows), 2):
            payload = "\n".join(
                '{"doc_id":"%s","lang":"%s","text_md5":"%s"}'
                % (r.doc_id, r.lang, r.text_md5)
                for r in rows[i : i + 2]
            ).encode()
            gz = gzip.compress(payload, mtime=0)
            info = tarfile.TarInfo(name=f"member_{i:04d}.jsonl.gz")
            info.size = len(gz)
            info.mtime = 0
            tar.addfile(info, io.BytesIO(gz))
    return out


def _tar_roundtrip(spark: SparkSession, sf: str):
    path = _tar_fixture(spark, sf)
    # members hold JSONL (2 docs per member): split lines JVM-side then
    # from_json each — same shape as read_tar_json for single-doc
    # members, exercised here with the line split on top
    from ..sources.readers import read_tar_members

    members = read_tar_members(spark, path, member_glob="*.jsonl.gz")
    return (
        members.select(
            "member",
            F.explode(F.split(F.col("content").cast("string"), "\n")).alias("line"),
        )
        .select(
            "member",
            F.from_json(
                "line", "doc_id string, lang string, text_md5 string"
            ).alias("doc"),
        )
        .select("member", "doc.*")
    )


register(QuerySpec(
    name="z_source_targz_members",
    tags=("S5", "F8"),
    description="tar.gz member source round-trip (reference BFVD tar of "
    "gzipped JSON members, bfvd.py:9-36): 64 documents packed 2-per-member "
    "at build time, unpacked via sources/readers.read_tar_members "
    "(binaryFile + mapInPandas + transparent gz member decompress), JSON "
    "decoded JVM-side, value-hashed against the parquet view.",
    build=_tar_roundtrip,
    oracle="""
        WITH top AS (
          SELECT doc_id, lang, md5(text) AS text_md5,
                 row_number() OVER (ORDER BY doc_id) - 1 AS rn
          FROM documents ORDER BY doc_id LIMIT 64
        )
        SELECT printf('member_%04d.jsonl.gz', CAST(floor(rn / 2) * 2 AS INT)) AS member,
               doc_id, lang, text_md5
        FROM top
    """,
))


def _stanza_fixture(spark: SparkSession, sf: str) -> str:
    """MetaCyc-style attribute stanzas from the nation dim."""
    out_dir = os.path.join(_FIXDIR, "stanza_" + sf.replace("/", "_"))
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "nations.dat")
    rows = t(spark, sf, "nation").orderBy("n_nationkey").collect()
    with open(out, "w") as fh:
        for r in rows:
            fh.write(f"UNIQUE-ID - NAT{r.n_nationkey}\n")
            fh.write(f"COMMON-NAME - {r.n_name}\n")
            fh.write(f"REGION - R{r.n_regionkey}\n")
            fh.write("//\n")
    return out


register(QuerySpec(
    name="z_source_stanza",
    tags=("S7",),
    description="MetaCyc attribute-stanza source round-trip (reference "
    "metacyc.py:12-81): nation dim rendered as KEY - VALUE stanzas with "
    "// separators, parsed back via sources/readers.read_stanza_file, "
    "attrs projected and value-hashed against the parquet view.",
    build=lambda spark, sf: read_stanza_file(
        spark, _stanza_fixture(spark, sf)
    ).select(
        F.col("attrs")["UNIQUE-ID"].alias("uid"),
        F.col("attrs")["COMMON-NAME"].alias("name"),
        F.col("attrs")["REGION"].alias("region"),
    ),
    oracle="""
        SELECT 'NAT' || n_nationkey AS uid, n_name AS name,
               'R' || n_regionkey AS region
        FROM nation
    """,
))


def _tsv_fixture(spark: SparkSession, sf: str) -> str:
    """Headerless TSV in the PSI-MI TAB spirit (reference intact.py:
    24-97 reads 42 headerless tab-separated columns with an explicit
    schema): supplier rows projected to a fixed column list."""
    out = os.path.join(_FIXDIR, "tsv_supp_" + sf.replace("/", "_"))
    (
        t(spark, sf, "supplier")
        .select(
            F.col("s_suppkey").cast("string"),
            "s_name",
            F.col("s_nationkey").cast("string"),
            F.md5(F.col("s_acctbal").cast("string")).alias("bal_md5"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", "false")
        .csv(out)
    )
    return out


def _tsv_roundtrip(spark: SparkSession, sf: str):
    from ..sources.readers import read_tsv

    return read_tsv(
        spark,
        _tsv_fixture(spark, sf),
        "suppkey string, name string, nationkey string, bal_md5 string",
    ).select(
        F.col("suppkey").cast("bigint").alias("s_suppkey"),
        F.col("name").alias("s_name"),
        F.col("nationkey").cast("bigint").alias("s_nationkey"),
        "bal_md5",
    )


register(QuerySpec(
    name="z_source_psimi_tsv",
    tags=("S6",),
    description="Headerless-TSV source round-trip (reference PSI-MI TAB "
    "interactions, intact.py:24-97: explicit schema, no header): supplier "
    "rows written tab-separated, read back via sources/readers.read_tsv, "
    "value-hashed against the parquet view.",
    build=_tsv_roundtrip,
    oracle="""
        SELECT s_suppkey, s_name, s_nationkey, md5(CAST(s_acctbal AS VARCHAR)) AS bal_md5
        FROM supplier
    """,
))


def _hmm_text_fixture(spark: SparkSession, sf: str):
    """HMMER3/f text models synthesized per nation row: 3 + key%5
    nodes, four match-emission scores per node with deterministic
    digits and a '*' (impossible) sprinkled in, plus the insert/
    transition continuation lines the parser must skip."""
    n = "n_nationkey"
    score = (
        f"if(({n} + i + j) % 7 = 0, '*', "
        f"concat('0.', lpad(cast(({n}*7 + i*3 + j) % 90 + 10 as string), 2, '0')))"
    )
    node_block = f"""
      array_join(transform(sequence(1, 3 + {n} % 5), i -> concat(
        '      ', i, '   ',
        array_join(transform(sequence(0, 3), j -> {score}), '  '),
        '  ', i, ' - - - -',
        '\\n          0.11111  0.22222  0.33333  0.44444',
        '\\n          0.00000  *        *        0.00000  *        0.00000  *'
      )), '\\n')
    """
    return t(spark, sf, "nation").selectExpr(
        f"concat('M', {n}) AS model_id",
        f"""concat(
          'HMMER3/f [synth]\\nNAME  NAT', {n},
          '\\nACC   IPRH', {n},
          '\\nLENG  ', 3 + {n} % 5,
          '\\nALPH  DNA',
          '\\nHMM          A        C        G        T',
          '\\n            m->m     m->i     m->d     i->m     i->i     d->m     d->d\\n',
          {node_block},
          '\\n//') AS hmm_text""",
    )


def _hmm_parse_roundtrip(spark: SparkSession, sf: str):
    from ..domain.hmm import parse_hmm_models

    return parse_hmm_models(_hmm_text_fixture(spark, sf)).select(
        "model_id", "name", "acc", "length", "alphabet"
    )


register(QuerySpec(
    name="z_hmm_parse",
    tags=("X2", "S5"),
    description="HMMER3 text-model parse round-trip (reference "
    "interpro/oracle/hmms.py:93-438, domain/hmm.py): models "
    "synthesized from the nation dim — header tags, per-node emission "
    "lines with '*' impossibles, skippable insert/transition "
    "continuation rows — parsed by the REAL Arrow-batched parser; the "
    "oracle recomputes the expected header fields and node count from "
    "the dim directly, so tag parsing, node-line detection and the "
    "LENG consistency check are value-verified. The float logo stays "
    "under pytest goldens (exp/log2 are not engine-exact).",
    build=_hmm_parse_roundtrip,
    oracle="""
        SELECT 'M' || CAST(n_nationkey AS VARCHAR) AS model_id,
               'NAT' || CAST(n_nationkey AS VARCHAR) AS name,
               'IPRH' || CAST(n_nationkey AS VARCHAR) AS acc,
               CAST(3 + n_nationkey % 5 AS INT) AS length,
               'dna' AS alphabet
        FROM nation
    """,
))


def _orc_fixture(spark: SparkSession, sf: str) -> str:
    """documents projected to ORC via the DataFrameWriter — the
    second columnar format the engine reads natively (SURVEY §2.1:
    the reference's sources are row formats + parquet; ORC closes
    the columnar-interchange gap for warehouses that hand off
    ORC, with the same pushdown/pruning contract as parquet)."""
    out = os.path.join(_FIXDIR, "orc_docs_" + sf.replace("/", "_"))
    (
        t(spark, sf, "documents")
        .select("doc_id", "lang", "source", F.md5("text").alias("text_md5"), "n_chars")
        .write.mode("overwrite")
        .orc(out)
    )
    return out


def _orc_roundtrip(spark: SparkSession, sf: str):
    path = _orc_fixture(spark, sf)
    return (
        spark.read.orc(path)
        .filter(F.col("n_chars") > 200)
        .select("doc_id", "lang", "source", "text_md5", "n_chars")
    )


register(QuerySpec(
    name="z_source_orc_roundtrip",
    tags=("S4", "P2"),
    description="ORC source round-trip: documents written as ORC via "
    "the DataFrameWriter, read back through spark.read.orc with a "
    "pushed n_chars predicate (ORC shares parquet's "
    "pushdown/pruning contract — the filter reaches the stripe "
    "reader), value-hashed against the parquet view.",
    build=_orc_roundtrip,
    oracle="""
        SELECT doc_id, lang, source, md5(text) AS text_md5, n_chars
        FROM documents WHERE n_chars > 200
    """,
))


def _schema_evolution_fixture(spark: SparkSession, sf: str) -> str:
    """Two parquet generations under one table path: generation 1
    lacks the later-added column, generation 2 carries it — the
    schema-drift shape every long-lived 100 TB table accumulates."""
    out = os.path.join(_FIXDIR, "evo_docs_" + sf.replace("/", "_"))
    docs = t(spark, sf, "documents")
    g1 = docs.filter(F.col("n_chars") % 2 == 0).select(
        "doc_id", "lang", "n_chars"
    )
    g2 = docs.filter(F.col("n_chars") % 2 == 1).select(
        "doc_id", "lang", "n_chars", F.md5("text").alias("text_md5")
    )
    g1.write.mode("overwrite").parquet(f"{out}/g=1")
    g2.write.mode("overwrite").parquet(f"{out}/g=2")
    return out


def _schema_evolution_roundtrip(spark: SparkSession, sf: str):
    path = _schema_evolution_fixture(spark, sf)
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(path)
        .select("doc_id", "lang", "n_chars", "text_md5")
    )


register(QuerySpec(
    name="z_source_schema_evolution",
    tags=("S2", "P1"),
    description="Schema-evolution read: two parquet generations under "
    "one table root (the second adds a column), read with "
    "mergeSchema=true — Spark reconciles the footers and the missing "
    "column surfaces as NULL for generation-1 rows, the exact "
    "column-add drift a long-lived table accumulates. The oracle "
    "recomputes both generations from the documents view.",
    build=_schema_evolution_roundtrip,
    oracle="""
        SELECT doc_id, lang, n_chars, NULL AS text_md5
        FROM documents WHERE n_chars % 2 = 0
        UNION ALL
        SELECT doc_id, lang, n_chars, md5(text)
        FROM documents WHERE n_chars % 2 = 1
    """,
))
