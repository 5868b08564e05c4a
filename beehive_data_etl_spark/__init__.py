"""beehive_data_etl_spark — a from-scratch PySpark-native CDC / incremental-
ingest engine with the query and data-processing capabilities of the
reference pipeline ``TechforgoodCAST/beehive-data-etl``.

The reference (a bespoke fetcher→transform→MongoDB-upsert ETL; see
SURVEY.md §1) is re-expressed Spark-first:

- change events (I/U/D keyed by ``doc_id``) consumed in checkpointed
  Structured Streaming micro-batches (``streaming.replay``),
- last-writer-wins dedup over an ``op_sequence`` watermark
  (``operators.lww``),
- key-partitioned MERGE upserts into a bucketed snapshot table
  (``sinks.snapshot``; Iceberg ``MERGE INTO`` adapter for clusters in
  ``sinks.iceberg``),
- vectorized pandas/Arrow transforms, no per-row Python
  (``functions``),
- in-flight schema evolution, exactly-once commit manifests keyed by
  ``(batch_id, partition_id)``, hot-key salting, per-partition
  lineage/metrics.

Everything here derives from public knowledge only (Apache Spark API
and docs, the public reference repo's behavior as summarized in
SURVEY.md).
"""

__version__ = "0.1.0"
