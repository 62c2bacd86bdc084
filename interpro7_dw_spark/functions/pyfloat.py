"""Python ``str(float)`` rendering as a pure JVM SQL expression.

The reference writes XML score attributes with Python's ``str()``
(e.g. ``str(location["score"])`` in interpro/ftp/xmlfiles.py:869 and
interpro/ftp/uniparc.py's lcn scores). Spark's ``cast(double AS
string)`` yields Java ``Double.toString`` notation instead, and the
two differ in *format* (never in digits, both are shortest-round-trip):

=============  ================  ================
value          Java              Python
=============  ================  ================
1e-05          ``1.0E-5``        ``1e-05``
0.0005         ``5.0E-4``        ``0.0005``
10000000.0     ``1.0E7``         ``10000000.0``
1e+16          ``1.0E16``        ``1e+16``
12.5           ``12.5``          ``12.5``
=============  ================  ================

Java switches to scientific for ``|x| < 1e-3`` or ``>= 1e7``; Python
for decimal exponent ``< -4`` or ``>= 16``. This module rewrites the
Java string into the Python form with string ops only — no UDF, stays
inside whole-stage codegen:

- no ``E`` → identical in both (plain decimal, incl. the ``.0`` tail);
- sci with exponent ``e <= -5`` or ``e >= 16`` → Python scientific:
  mantissa minus any trailing ``.0``, ``e`` sign always written,
  exponent zero-padded to two digits;
- sci with ``e`` in ``[-4, -1]`` → ``0.`` + zeros + digits;
- sci with ``e`` in ``[7, 15]`` → decimal point shifted right,
  ``.0`` appended when nothing fractional remains.

Known divergence: for a handful of extreme doubles (denormals like
5e-324) JDK 17's pre-Ryū ``Double.toString`` emits different *digits*
than Python's shortest repr (``4.9E-324`` vs ``5e-324``); biologically
meaningful scores never reach that range, and JDK 19+ closes the gap.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def py_double_sql(v: str) -> str:
    """SQL snippet rendering double expression ``v`` as Python
    ``str(v)`` would. ``v`` is evaluated several times — pass a column
    reference or cheap expression, not a subquery."""
    s = f"cast(abs({v}) as string)"
    sgn = f"if({v} < 0, '-', '')"
    mant = f"substring_index({s}, 'E', 1)"
    e = f"cast(substring_index({s}, 'E', -1) as int)"
    # mantissa with the mandatory '.0' tail stripped ('1.0' -> '1');
    # shortest-repr never has other trailing zeros
    ms = f"if({mant} like '%.0', substring({mant}, 1, length({mant}) - 2), {mant})"
    digs = f"replace({ms}, '.', '')"
    fraclen = f"(length({digs}) - 1)"  # int part of a sci mantissa is 1 digit
    # exponent zero-padded to >= 2 digits (lpad would *truncate* 3-digit
    # exponents like e-324)
    sci = (
        f"concat({ms}, 'e', if({e} < 0, '-', '+'), "
        f"if(abs({e}) < 10, concat('0', abs({e})), cast(abs({e}) as string)))"
    )
    small = f"concat('0.', repeat('0', -{e} - 1), {digs})"
    big = (
        f"if({e} >= {fraclen}, "
        f"concat({digs}, repeat('0', {e} - {fraclen}), '.0'), "
        f"concat(substring({digs}, 1, {e} + 1), '.', substring({digs}, {e} + 2)))"
    )
    return (
        f"if(instr({s}, 'E') = 0, cast({v} as string), "
        f"concat({sgn}, case "
        f"when {e} between -4 and -1 then {small} "
        f"when {e} between 7 and 15 then {big} "
        f"else {sci} end))"
    )


def py_double_str(col: Column | str) -> Column:
    """Column wrapper over :func:`py_double_sql`."""
    name = col if isinstance(col, str) else None
    if name is None:
        raise TypeError(
            "py_double_str needs a column *name* (the expression is "
            "compiled via F.expr); use py_double_sql for arbitrary SQL"
        )
    return F.expr(py_double_sql(name))
