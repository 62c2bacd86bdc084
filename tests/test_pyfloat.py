"""functions/pyfloat.py: Python ``str(float)`` rendering as pure SQL —
the score-attribute formatter for the XML sinks (reference writes
``str(location["score"])``, interpro/ftp/xmlfiles.py:869)."""

from __future__ import annotations

from interpro7_dw_spark.functions.pyfloat import py_double_sql


def test_py_double_str_matches_python_repr(spark):
    vals = [
        # format-divergent regions (Java sci, Python decimal / vice versa)
        1e-05, 0.0005, 0.0001, 1.5e-4, 10000000.0, 1e7, 1.5e8,
        1.23456789e7, 1e15, 9999999.0, 9.999999999999999e15,
        # both-scientific
        1e16, 2.5e-7, 3.4e-12, 6.1e22, 1e100, -3.7e-101, 4.25e-22,
        1.7976931348623157e308,
        # both-decimal
        12.5, 0.001, 100.0, 0.0, -0.0, 1.0, 0.25, 7.2e-3, 123456.789,
        # signs
        -1e-05, -0.0005, -12.5, -1e16,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = df.selectExpr("v", py_double_sql("v") + " as py").collect()
    bad = [(r.v, r.py, str(r.v)) for r in rows if r.py != str(r.v)]
    assert bad == []


def test_py_double_str_nulls(spark):
    df = spark.createDataFrame([(None,)], "v double")
    assert df.selectExpr(py_double_sql("v") + " as py").collect()[0].py is None
