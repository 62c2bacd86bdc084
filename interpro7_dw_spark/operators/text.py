"""Text analysis operators for corpus pipelines.

All pure ``pyspark.sql.functions`` compositions — no Python UDFs in
the hot path, so whole-stage codegen applies and throughput scales
with cores, not with Python serde.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# minimal marker-token sets per language for the n-gram/stopword
# heuristic; extend freely — classification picks argmax with a fixed
# priority-order tiebreak so results are deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los", "es"],
    "fr": ["le", "la", "de", "et", "les", "des", "est"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu"],
}


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def quality_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple = (),
) -> DataFrame:
    """Length/diversity quality signals; all integer-derived so the
    values are engine-exact. ``extra_cols`` append extra column
    expressions to the same single scan."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    return docs.select(
        id_col,
        n_tokens.alias("n_tokens"),
        n_uniq.alias("n_uniq_tokens"),
        F.round(n_uniq / n_tokens, 4).alias("ttr"),
        F.length(text_col).alias("n_chars_actual"),
        F.round((F.length(text_col) - (n_tokens - 1)) / n_tokens, 4).alias("avg_token_len"),
        F.when(n_tokens >= 20, "long").when(n_tokens >= 10, "medium").otherwise("short").alias("len_bucket"),
        *extra_cols,
    )


def language_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-token language id: argmax of per-language marker hits,
    ties broken by the declaration order of LANG_MARKERS."""
    toks = F.array_distinct(_tokens(text_col))
    out = docs.select(F.col(id_col), F.col(text_col))
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        out = out.withColumn(f"s_{lang}", F.size(F.array_intersect(toks, marker_arr)))
    langs = list(LANG_MARKERS)
    pred = None
    for i, lang in enumerate(langs[:-1]):
        # lang wins if it beats-or-ties every later language
        cond = F.lit(True)
        for other in langs[i + 1:]:
            cond = cond & (F.col(f"s_{lang}") >= F.col(f"s_{other}"))
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    pred = pred.otherwise(F.lit(langs[-1]))
    return out.withColumn("pred_lang", pred).drop(text_col)


def token_count(docs: DataFrame, text_col: str = "text") -> Column:
    """Whitespace token count column (BPE-ish regex variant below)."""
    return F.size(_tokens(text_col))


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """Sub-word-ish token count: words + digits + punctuation runs,
    the usual cheap proxy for tokenizer cost."""
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Canonical-form document fingerprint: lowercase, collapse
    whitespace, md5. (The reference fingerprints domain strings the
    same way: sha1 of a '-'-joined canonical key,
    interpro/xrefs/domorgs.py:60-62.)"""
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return docs.select(
        id_col,
        F.md5(normalized.cast("binary")).alias("fp"),
    )
