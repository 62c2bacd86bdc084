"""Skew mitigation helpers.

AQE's skew-join splitting handles most cases at runtime
(session.py enables it); these helpers cover the two shapes AQE
cannot fix:

- ``salted_aggregate``: a groupBy whose hot keys overload single
  reducers — pre-aggregate on (key, salt), then final-aggregate on
  key. Works for any algebraic aggregate expressed as
  (partial_exprs, final_exprs).
- ``salted_broadcast_join``: a broadcast join where a few left keys
  dominate — no shuffle to split, but per-task output skew remains;
  salting the LEFT side spreads the hot keys across tasks.

The reference hits the same problem as "one subject owns most rows"
(e.g. the biggest InterPro entries in entry2xrefs, budgeted 100 GB of
RAM, cli.py:355) and solves it with per-worker partial dicts — the
salted pre-aggregate is the same trick, declaratively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_exprs: list[Column],
    final_exprs: list[Column],
    num_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-stage aggregation via an explicit salt.

    ``partial_exprs`` aggregate within (keys, salt); ``final_exprs``
    combine the partials per key (e.g. partial ``sum(x) AS s`` +
    final ``sum(s) AS total``). ``salt_source`` (any column name)
    makes the salt deterministic; otherwise a uniform random salt is
    used (fine for aggregation — the result is salt-invariant).
    """
    salt = (
        F.pmod(F.hash(F.col(salt_source)), F.lit(num_salts))
        if salt_source
        else (F.rand() * num_salts).cast("int")
    )
    return (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*final_exprs)
    )


def salted_broadcast_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    num_salts: int = 16,
) -> DataFrame:
    """Equi-join with the small side replicated per salt so hot left
    keys spread over ``num_salts`` tasks. Right side must be broadcast-
    sized (it is replicated num_salts times)."""
    salted_left = left.withColumn("__salt", (F.rand() * num_salts).cast("int"))
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return salted_left.join(
        F.broadcast(salted_right), [key, "__salt"]
    ).drop("__salt")
