"""PySpark-native analytics engine with the query and data-processing
capabilities of aws-solutions/machine-downtime-monitor-on-aws.

Built from scratch on the public PySpark DataFrame/SQL/Structured
Streaming API. The reference solution (studied at /root/reference,
cited by file:line in docstrings throughout) is a factory-floor
telemetry pipeline: Kinesis ingest -> configurable message parsing ->
status classification -> real-time store + change feed -> nightly
Parquet lake -> RLE downtime durations for BI. This package
re-expresses each of those dataflows as composable, Catalyst-friendly
Spark operators, and extends the surface with large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal column plumbing).

Layout:
  session    - tuned SparkSession builder (AQE, shuffle partitions, UTC)
  tables     - test-table loader / temp-view registration
  config     - MessageFormat / MachineConfig models + validation
  functions/ - scalar & vector column-expression helpers
  operators/ - the operator library (normalize, classify, rle, windows,
               dedup, similarity, text, ...)
  plans/     - query catalog: every query exposed to the driver with a
               DuckDB oracle twin
  sources/   - batch/stream source & sink helpers (envelopes, lake)
  streaming/ - structured-streaming ingest pipeline + change feed
"""

__version__ = "0.1.0"
