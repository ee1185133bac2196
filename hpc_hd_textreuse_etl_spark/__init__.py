"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference text-reuse ETL (ananth1996/HPC-HD-TextReuse-ETL).

Brand-new, Spark-first design: DataFrame/SQL plans optimized by Catalyst,
a thin materialization registry instead of an orchestrator, Pandas UDFs only
where built-in operators cannot express the semantics (ordered per-group
defragmentation scan, multimodal decode).

Layout:
- ``session``    — SparkSession factory with scale-ready defaults
- ``catalog``    — named-table loading / registration over parquet
- ``functions``  — reusable column/DataFrame building blocks
  (dense ids, gaps-and-islands intervals, text metrics, vector math)
- ``operators``  — composite relational/graph operators
  (defragmentation, Chinese-Whispers clustering, coverage, reception,
  dedup family, similarity search, multimodal plumbing)
- ``sources``    — scans and sinks (zip-of-JSONL, CSV, parquet, JDBC)
- ``plans``      — materialization recipe registry (asset DAG equivalent)
- ``streaming``  — Structured Streaming surface (additive vs. reference)
"""

__version__ = "0.1.0"
