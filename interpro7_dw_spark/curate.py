"""Corpus-curation CLI — the LLM-data operator family composed into a
resumable build DAG, the training-data sibling of the warehouse build
(warehouse.py; same marker-file resume contract).

    python -m interpro7_dw_spark.curate SF_DIR OUT_DIR [--steps a,b]
        [--overwrite] [--eval-mod N]

Stages (DAG order, each a parquet dataset under OUT_DIR):

1.  normalized       canonical text cleanup (normalize_text)
2.  scrubbed         PII masking on the normalized text (scrub_pii)
3.  quality          per-doc signals: length/diversity features,
                     Gopher repetition stats, hashed linear model score
4.  decontaminated   n-gram contamination fraction vs the held-out
                     eval split (doc_id % eval_mod == 0)
5.  dedup            exact-dup survivors + ExactSubstr-cleaned text
6.  semantic         SemDeDup verdicts over the embeddings table
7.  corpus           the final join: drop eval rows, contaminated
                     rows, exact-dup losers and semantic duplicates;
                     gate on quality; carry the span-cleaned text;
                     token-budget shard ids (pack_token_shards)
8.  stats            one-row summary: survivors + drop counts per
                     reason (the release-notes of a curation run)

Every stage is the already-oracle-checked operator from
operators/{text,dedup,similarity,sampling}.py — this module only
composes and persists them, so the correctness surface stays the
catalog's.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dedup import exact_dedup, exact_substring_dedup, contamination_stats
from .operators.sampling import pack_token_shards
from .operators.similarity import semantic_dedup
from .operators.text import (
    hashed_pseudo_weights,
    linear_quality_score,
    normalize_text,
    quality_features,
    repetition_stats,
    scrub_pii,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _steps(spark: SparkSession, sf_dir: str, out_dir: str, eval_mod: int):
    p = lambda name: os.path.join(out_dir, f"{name}.parquet")  # noqa: E731
    read = lambda name: spark.read.parquet(p(name))  # noqa: E731

    def normalized() -> None:
        d = _docs(spark, sf_dir)
        out = (
            normalize_text(d)
            .join(d.drop("text"), "doc_id")
            .withColumnRenamed("normalized", "text")
        )
        out.write.mode("overwrite").parquet(p("normalized"))

    def scrubbed() -> None:
        d = read("normalized")
        out = (
            scrub_pii(d)
            .join(d.drop("text"), "doc_id")
            .withColumnRenamed("scrubbed", "text")
        )
        out.write.mode("overwrite").parquet(p("scrubbed"))

    def quality() -> None:
        d = read("scrubbed")
        q = quality_features(d)
        rep = repetition_stats(d)
        score = linear_quality_score(d, hashed_pseudo_weights(spark)).select(
            "doc_id", "score", "label"
        )
        q.join(rep, "doc_id").join(score, "doc_id").write.mode(
            "overwrite"
        ).parquet(p("quality"))

    def decontaminated() -> None:
        d = read("scrubbed")
        eval_split = d.filter(F.col("doc_id") % eval_mod == 0)
        corpus = d.filter(F.col("doc_id") % eval_mod != 0)
        contamination_stats(corpus, eval_split).write.mode("overwrite").parquet(
            p("decontaminated")
        )

    def dedup() -> None:
        d = read("scrubbed")
        exact_dedup(d).write.mode("overwrite").parquet(p("dedup_exact"))
        exact_substring_dedup(d).write.mode("overwrite").parquet(p("dedup_spans"))

    def semantic() -> None:
        semantic_dedup(_emb(spark, sf_dir)).write.mode("overwrite").parquet(
            p("semantic")
        )

    def corpus() -> None:
        d = read("scrubbed")
        keep_exact = read("dedup_exact").select(
            F.col("keep_id").alias("doc_id"), F.lit(True).alias("__keep")
        )
        spans = read("dedup_spans").select(
            "doc_id", "cleaned_text", "dup_token_frac"
        )
        contam = read("decontaminated").select("doc_id", "contaminated_frac")
        sem = read("semantic").select(
            F.col("vec_id").alias("doc_id"), "is_duplicate"
        )
        q = read("quality").select("doc_id", "dup_ngram_frac", "n_tokens")
        out = (
            d.join(keep_exact, "doc_id", "left_semi")
            .join(spans, "doc_id")
            .join(contam, "doc_id")  # inner: eval rows drop here
            .join(sem, "doc_id", "left")
            .join(q, "doc_id")
            .filter(
                (F.col("contaminated_frac") == 0.0)
                & ~F.coalesce("is_duplicate", F.lit(False))
                & (F.col("dup_ngram_frac") < 0.5)
            )
            .select(
                "doc_id",
                F.col("cleaned_text").alias("text"),
                "lang",
                "source",
                "n_tokens",
            )
        )
        pack_token_shards(out, budget=4096, stratum_col="source").write.mode(
            "overwrite"
        ).parquet(p("corpus"))

    def stats() -> None:
        d = read("scrubbed")
        final = read("corpus")
        row = (
            d.agg(F.count(F.lit(1)).alias("n_input"))
            .crossJoin(final.agg(
                F.count(F.lit(1)).alias("n_survivors"),
                F.countDistinct("shard_id").alias("n_shards"),
            ))
            .crossJoin(
                read("decontaminated")
                .filter(F.col("contaminated_frac") > 0)
                .agg(F.count(F.lit(1)).alias("n_contaminated"))
            )
            .crossJoin(
                read("semantic").filter("is_duplicate")
                .agg(F.count(F.lit(1)).alias("n_semantic_dups"))
            )
        )
        row.write.mode("overwrite").parquet(p("stats"))

    return [
        ("normalized", normalized),
        ("scrubbed", scrubbed),
        ("quality", quality),
        ("decontaminated", decontaminated),
        ("dedup", dedup),
        ("semantic", semantic),
        ("corpus", corpus),
        ("stats", stats),
    ]


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    steps: list[str] | None = None,
    overwrite: bool = False,
    eval_mod: int = 97,
) -> dict[str, str]:
    """Run the curation DAG; returns {step: 'built'|'skipped'} — the
    same resume contract as warehouse.build_warehouse."""
    marker_dir = os.path.join(out_dir, "_done")
    os.makedirs(marker_dir, exist_ok=True)
    status: dict[str, str] = {}
    for name, run in _steps(spark, sf_dir, out_dir, eval_mod):
        if steps is not None and name not in steps:
            continue
        marker = os.path.join(marker_dir, name)
        if os.path.exists(marker) and not overwrite:
            status[name] = "skipped"
            continue
        run()
        with open(marker, "w") as fh:
            fh.write("done\n")
        status[name] = "built"
    return status


def _main() -> None:
    import argparse

    from .session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--steps", default=None)
    ap.add_argument("--overwrite", action="store_true")
    ap.add_argument("--eval-mod", type=int, default=97)
    args = ap.parse_args()
    status = curate_corpus(
        get_spark("curate"),
        args.sf_dir,
        args.out_dir,
        steps=args.steps.split(",") if args.steps else None,
        overwrite=args.overwrite,
        eval_mod=args.eval_mod,
    )
    for name, state in status.items():
        print(f"{state:8s} {name}")


if __name__ == "__main__":
    _main()
