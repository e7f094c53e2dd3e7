"""pg_walstream_spark — a PySpark-native CDC / incremental-ingest engine.

Re-expresses the capabilities of the reference Rust logical-replication
client (isdaniel/pg-walstream) Spark-first: binary WAL-frame DataFrames,
vectorized Arrow decode, transaction-boundary gating, salted last-image
compaction, and exactly-once LSN-fenced MERGE into a lake table — plus the
training-data-pipeline analytics (dedup, similarity, text analysis) a
100 TB corpus ingest needs.
"""

__version__ = "0.1.0"
