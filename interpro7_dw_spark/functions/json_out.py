"""Sink-boundary JSON rendering.

``jsonify`` reproduces the reference's jsonify semantics
(interpro/mysql/utils.py:30-34): empty collections serialize to NULL,
not ``[]``/``{}`` — the webfront marts rely on this for hash-faithful
output. JSON appears only at the sink boundary; inside plans data
stays typed (SURVEY.md §1.3 verdict).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def jsonify(col: Column, nullable: bool = True) -> Column:
    """to_json with the reference's empty->NULL rule for arrays/maps."""
    rendered = F.to_json(col)
    if not nullable:
        return rendered
    return F.when(col.isNull() | (F.size(col) <= 0), F.lit(None).cast("string")).otherwise(
        rendered
    )
