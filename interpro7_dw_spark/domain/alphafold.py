"""AlphaFold / BFVD per-protein structure-model attachment.

Re-expresses the reference's AlphaFold export
(`/root/reference/interpro7dw/alphafold.py:23-73`) as one groupBy:

- predictions join the protein key set with KeyError-continue
  semantics (alphafold.py:50-57) — a left-semi join;
- per protein the models are sorted ascending by score
  (`_sort_models`, alphafold.py:71-73); score ties are broken by
  model id (the reference leaves tie order to Python's stable sort
  over file order — not a distributed notion — so the id tiebreak is
  the documented canonicalization);
- with ``keep_fragments=False`` (the default) a protein whose
  prediction is split into several per-segment models is dropped
  entirely (`len(x) == 1`, alphafold.py:62-65).

The same shape serves the BFVD index (`bfvd.py:9-36`), whose
single-structure filter (`len(structures) == 1`) is this exact
``n_models == 1`` rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def alphafold_models(
    predictions: DataFrame,
    proteins: DataFrame,
    keep_fragments: bool = False,
) -> DataFrame:
    """One row per surviving protein.

    ``predictions``: (protein_acc, model_id, score);
    ``proteins``: (protein_acc) — the KVStore key set.

    Returns ``protein_acc, n_models, models_json`` where
    ``models_json`` is the score-sorted ``[["id",score],...]`` list
    (scores rendered with up to one decimal by the caller's
    convention). With ``keep_fragments=False`` only ``n_models == 1``
    proteins survive (alphafold.py:62-65); with ``True`` every
    protein keeps its full sorted list (alphafold.py:60-61).
    """
    grouped = (
        predictions.join(proteins, "protein_acc", "left_semi")
        .groupBy("protein_acc")
        .agg(
            F.count("*").alias("n_models"),
            F.array_sort(
                F.collect_list(F.struct("score", "model_id"))
            ).alias("sorted_models"),
        )
    )
    if not keep_fragments:
        grouped = grouped.where(F.col("n_models") == 1)
    return grouped.select(
        "protein_acc",
        "n_models",
        F.concat(
            F.lit("["),
            F.array_join(
                F.transform(
                    "sorted_models",
                    lambda m: F.concat(
                        F.lit('["'),
                        m["model_id"],
                        F.lit('",'),
                        m["score"].cast("string"),
                        F.lit("]"),
                    ),
                ),
                ",",
            ),
            F.lit("]"),
        ).alias("models_json"),
    )
