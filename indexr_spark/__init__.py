"""indexr_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of shunfei/indexr, re-expressed Spark-first.

The reference (see SURVEY.md) is a columnar storage format + index +
realtime-ingestion system whose query surface is single-table
SELECT/WHERE/GROUP BY/HAVING/ORDER BY/LIMIT, delegating distributed
execution to host engines (Drill/Hive/Spark). This rebuild therefore:

- uses Spark SQL / DataFrame for the whole relational algebra (a strict
  superset of the reference's operator inventory, SURVEY.md §2.1);
- maps the segment/pack columnar layout onto Parquet (SURVEY.md §1.4);
- reimplements the reference's genuinely custom pieces: the sorted,
  rollup-on-write segment writer (storage/SortedSegmentGenerator.java),
  the three-level rough-check data skipping (segment/rc/*.java) as a
  file-level stats-sidecar pruner, and the realtime ingest pipeline
  (indexr-server rt/*) as Structured Streaming + hybrid union view;
- adds first-class large-scale training-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing).

Layout:
    session.py    SparkSession construction/tuning for OLAP workloads
    tables.py     test-table loaders (TESTDATA.md contract)
    sources/      catalog (JSON table specs), segment writer, CSV io
    plans/        rough-check predicate algebra + file pruning (M3)
    operators/    query/operator library, each with a DuckDB oracle
    functions/    reusable column expression builders
    streaming/    realtime ingest, hybrid table, compaction (M4)
"""

from indexr_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
