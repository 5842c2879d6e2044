"""PySpark-native analytics engine with the capabilities of the MoJ
``iceberg-evaluation`` reference (studied at /root/reference).

Layout:
  session    - SparkSession builder (AQE, UTC, Arrow; mirrors the intent of
               reference src/data_curation/glue_jobs/pyspark_functions.py:318-334
               minus AWS/Glue specifics)
  sources    - readers for the driver testdata star schema, csv/json helpers,
               and the bucketed (pre-shuffled) table sink
  tables     - snapshot-versioned parquet table layer (create/CTAS/append/
               MERGE copy-on-write/time travel/history/compaction) - the
               PySpark-native re-expression of the reference's Iceberg usage
  operators  - curation (bulk insert, SCD2 simple/complex, dedup, delete-aware
               merge), training-data ops (dedup families, ANN/IVF, text
               analysis, multimodal binary stages), as-of join, salted join
  functions  - scalar helpers (composite keys, text metrics)
  plans      - query library (TPC-DS-shaped corpus over the TPC-H-ish testdata)
               with DuckDB oracle SQL, the benchmark runner, and the sql/*.sql
               threaded corpus harness
  streaming  - incremental wrappers (foreachBatch SCD2, windowed event aggs)
               and stateful sessionization (applyInPandasWithState)
"""

__version__ = "0.1.0"
