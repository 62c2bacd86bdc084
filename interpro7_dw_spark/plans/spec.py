"""Query catalog infrastructure.

Every capability of the engine is declared as a ``QuerySpec``: a Spark
DataFrame builder plus (where SQL-expressible) the equivalent ANSI SQL
string a DuckDB oracle can run on the same parquet tables. The pair is
the differential-correctness contract (SURVEY.md §5): row-count +
schema + order-insensitive value-hash must match.

Determinism conventions (so value hashes are stable across engines):
- money-style double sums go through ``DECIMAL(18,4)`` casts (exact,
  order-independent) — double summation order differs between engines;
- every aggregate / computed column is explicitly aliased, identically
  in the Spark plan and the oracle SQL;
- window orderings always carry a unique tiebreak column;
- timestamps leave results as epoch integers or formatted strings.

Pandas-stability conventions (the driver's correctness gate hashes
*stringified pandas cells*: Spark ``toPandas()`` vs DuckDB ``.df()``,
and DuckDB coerces every DECIMAL and HUGEINT to float64 while Spark
keeps ``Decimal``/int64 — ``'1234.5000'`` vs ``'1234.5'``, ``'42'`` vs
``'42.0'``). Final projections may therefore contain ONLY string, int,
double, and boolean columns:
- decimal intermediates (exact sums) are cast to DOUBLE in the final
  select on BOTH sides — use ``dbl(...)`` / ``CAST(... AS DOUBLE)``.
  "Same exact value -> same nearest double" holds while the UNSCALED
  sum fits in 2^53 (~9e11 money units at scale 4, i.e. ~900 M in
  currency); beyond that the numerator/10^scale double-rounding may
  differ between BigDecimal.doubleValue and DuckDB. Test scales sum
  ~1e9: three orders of magnitude of headroom. If a query could
  exceed the bound, round to a fixed decimal count after the double
  cast on both sides;
- row-level money values stay raw doubles (identical IEEE expression
  on both engines), no decimal cast needed;
- averages divide the exact decimal sum cast to double by the count
  (identical double division on both sides), never ``avg()`` over
  doubles (summation order is partition-dependent);
- DuckDB ``sum(<integer>)`` returns HUGEINT: wrap the oracle side in
  ``CAST(... AS BIGINT)``;
- no raw DATE/TIMESTAMP output columns (pandas renders them
  differently: '2020-01-02' vs '2020-01-02 00:00:00').
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

# Serializes lazy oracle resolution: several oracles have side effects
# (write-once fixture parquet the SQL embeds by path), and concurrent
# spec evaluation (parallel differ / pytest workers in one process)
# must not double-invoke a callable racing the same fixture path. One
# global lock is enough — resolution happens once per spec per process
# and the callables are fast.
_ORACLE_LOCK = threading.Lock()


class QuerySpec:
    """One catalog entry. ``oracle`` may be the ANSI SQL string
    itself, ``None`` (rows-only check), or a ZERO-ARG CALLABLE
    returning the SQL — resolved (and cached) on first ``.oracle``
    access, so oracles whose construction has side effects (e.g.
    generating a fixture parquet the SQL embeds by path) don't run at
    import time for tools that only list specs."""

    __slots__ = ("name", "build", "_oracle", "tags", "description")

    def __init__(
        self,
        name: str,
        build: Callable[[SparkSession, str], DataFrame],
        oracle: str | None | Callable[[], str],
        tags: tuple[str, ...] = (),
        description: str = "",
    ) -> None:
        self.name = name
        self.build = build
        self._oracle = oracle
        self.tags = tags
        self.description = description

    @property
    def oracle(self) -> str | None:
        if callable(self._oracle):
            with _ORACLE_LOCK:
                if callable(self._oracle):
                    self._oracle = self._oracle()
        return self._oracle


REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in REGISTRY:
        raise ValueError(f"duplicate query name {spec.name!r}")
    REGISTRY[spec.name] = spec
    return spec


def all_specs() -> dict[str, QuerySpec]:
    # import side-effect registration of every plan module
    from . import (  # noqa: F401
        domainq,
        ebiq,
        entrymartq,
        entryrowsq,
        graphs,
        intactq,
        llmops,
        marts,
        pdbeq,
        proteinq,
        proteinrowsq,
        proteomemartq,
        relnotesq,
        sourceq,
        relational,
        relational2,
        setstructq,
        skewq,
        streams,
        taxmartq,
        timeseriesq,
        treeq,
        xmlq,
    )

    return dict(REGISTRY)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def fixture_dir(name: str, sf_dir: str = "", input_path: str | None = None) -> str:
    """Repo-local scratch/fixture directory
    (``<repo>/spark-warehouse/fixtures/<name>[_<sf>][_<fp>]``). The
    repo root is derived from the package location — no literal path.
    When ``input_path`` is given (a data file or directory), the
    directory name carries a fingerprint of the input's files (names,
    sizes, mtimes): regenerating the dataset changes the fingerprint,
    so a build-once fixture (e.g. the IVFADC probe index) is
    invalidated instead of silently serving stale results."""
    import hashlib
    import os

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
        "fixtures",
    )
    key = name
    if sf_dir:
        key += "_" + sf_dir.strip("/").replace("/", "_")
    if input_path is not None:
        h = hashlib.sha1()
        files = (
            sorted(
                os.path.join(input_path, p) for p in os.listdir(input_path)
            )
            if os.path.isdir(input_path)
            else [input_path]
        )
        for p in files:
            st = os.stat(p)
            h.update(
                f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}".encode()
            )
        key += "_" + h.hexdigest()[:12]
    return os.path.join(root, key)


def write_split_fixture(
    df: DataFrame, split: Column, parts, out_dir: str
) -> None:
    """Write ``df`` as one single-file parquet micro-batch fixture per
    value of ``split`` under ``out_dir``, in ONE write job instead of
    one filtered pass over the (persisted) relation per part (guide
    §2.4: one pass computes what n passes recomputed; §6: same file
    count, one commit). ``parts`` is either an int (split values are
    ``range(parts)``) or an explicit list of split values in the
    desired drain order. The rows route through a single
    ``partitionBy`` write into a staging dir; the per-part files are
    then renamed into ``out_dir`` with names AND mtimes increasing in
    part order, so a ``maxFilesPerTrigger=1`` stream drains them in
    the same order as the sequential per-part writes this replaces.
    Rows with a NULL split value are dropped, exactly like the
    ``filter(split == part)`` writes were dropping them; an empty part
    produces no file, also as before. Fixture dirs are repo-local
    (``fixture_dir``), so plain ``os`` renames apply."""
    import os
    import shutil
    import time

    values = list(range(parts)) if isinstance(parts, int) else list(parts)
    stage = out_dir.rstrip("/") + "__stage"
    shutil.rmtree(stage, ignore_errors=True)
    (
        df.withColumn("__part", split.cast("long"))
        .repartition(1)  # one writer task, as coalesce(1)-per-part was
        .write.partitionBy("__part")
        .parquet(stage)
    )
    os.makedirs(out_dir, exist_ok=True)
    now = time.time()
    for i, v in enumerate(values):
        pdir = os.path.join(stage, f"__part={v}")
        if not os.path.isdir(pdir):
            continue
        files = sorted(
            f for f in os.listdir(pdir) if f.endswith(".parquet")
        )
        for j, name in enumerate(files):
            dst = os.path.join(out_dir, f"{i:05d}-{j:03d}.parquet")
            os.replace(os.path.join(pdir, name), dst)
            os.utime(dst, (now + i, now + i))
    shutil.rmtree(stage, ignore_errors=True)


def dec(c: Column | str) -> Column:
    """Exact-sum money representation (see module docstring)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,4)")


def dbl(c: Column | str) -> Column:
    """Pandas-stable final projection of a decimal intermediate."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("double")
