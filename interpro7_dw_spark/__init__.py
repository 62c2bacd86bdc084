"""interpro7_dw_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capabilities of the reference
ETL engine (ProteinsWebTeam/interpro7-dw, surveyed in /root/repo/SURVEY.md)
as idiomatic Spark DataFrame / SQL plans, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) that a 100 TB corpus build needs.

Layout
------
- ``session``    SparkSession factory tuned for the local[32] harness
                 (and documented knobs for a real cluster).
- ``sources``    table catalog + typed readers for the test star schema.
- ``functions``  scalar/array/interval helper column expressions
                 (pure ``pyspark.sql.functions`` compositions — JVM side).
- ``operators``  composite operators Spark lacks natively: as-of join,
                 interval algebra, transitive closure, dedup families,
                 ANN similarity, text analysis, multimodal plumbing.
- ``plans``      the query catalog: every supported query as a
                 (builder, oracle-SQL) pair for differential testing.
- ``streaming``  Structured Streaming equivalents of the reference's
                 file-handoff producer/consumer stage.
"""

__version__ = "0.1.0"
