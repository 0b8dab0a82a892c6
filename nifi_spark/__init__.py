"""nifi_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the data-processing capabilities of Apache NiFi (reference at
/root/reference, surveyed in SURVEY.md) as an idiomatic Spark library:

- the CDC north star (binlog/WAL-style change feed -> watermarked LWW fold ->
  lake-table MERGE with idempotent commit IDs, schema evolution, lineage) in
  :mod:`nifi_spark.streaming.job`, :mod:`nifi_spark.sinks.laketable`;
- NiFi's record-oriented operator inventory (routing, record transforms,
  lookup/enrichment joins, dedup, sampling, stats, ordering — SURVEY.md §2)
  as DataFrame combinators in :mod:`nifi_spark.operators`;
- large-scale training-data pipeline operators (fuzzy dedup, similarity
  search, text analysis, multimodal plumbing) in
  :mod:`nifi_spark.operators.dedup_fuzzy` and friends.

Everything is DataFrame/Catalyst-first: no RDDs, no per-row Python UDFs in
hot paths; Python drops to Arrow-vectorized pandas UDFs only where built-in
expressions cannot express the semantics.
"""

__version__ = "0.1.0"
