"""Distributed map cache — Put/FetchDistributedMapCache, Spark-first.

Reference (SURVEY.md §2.5): PutDistributedMapCache.java writes a
(key, value) entry computed from FlowFile attributes/content into the
DistributedMapCacheServer; FetchDistributedMapCache.java reads it back
into attributes; entries age off. NiFi needs a side-channel server because
FlowFiles can't see each other; a set-oriented engine replaces the server
with a *keyed state table* and the fetch with a broadcast join — no extra
service, exactly-once via the lake-table commit protocol, resumable.

:class:`MapCache` is that table: LakeTable-backed (bucketed by key,
last-writer-wins on a sequence column, tombstone deletes), so `put` is a
MERGE and crash-recovery/idempotent-replay semantics are inherited from
the sink (tests/test_laketable.py). `fetch` is a broadcast hash join for
dimension-sized caches (NiFi's use case: enrichment lookups, dedup keys)
and falls back to a shuffled join above the broadcast threshold.

Age-off (CacheEntry TTL in DistributedMapCacheServer) is replayed
deterministically from the entry's own put-sequence/timestamp, not
wall-clock: `age_off(min_seq)` tombstones entries below the horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nifi_spark.sinks.laketable import LakeTable


class MapCache:
    """A keyed (key, value, seq) cache table with put / fetch / age-off."""

    KEY = "cache_key"
    VALUE = "cache_value"
    SEQ = "put_seq"

    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 16):
        self.spark = spark
        self.table = LakeTable(spark, path, n_buckets=n_buckets)

    def put(self, entries: DataFrame, batch_id: int | None = None) -> int | None:
        """Upsert (cache_key, cache_value, put_seq) entries — later put_seq
        wins (PutDistributedMapCache's cache-update strategy 'replace').
        Idempotent per batch_id like any lake merge."""
        batch = entries.select(
            F.col(self.KEY).cast("string").alias(self.KEY),
            F.col(self.VALUE).cast("string").alias(self.VALUE),
            F.col(self.SEQ).cast("long").alias("seq"),
        ).withColumn("op", F.lit("U"))
        return self.table.merge_events(batch, [self.KEY], batch_id=batch_id)

    def delete(self, keys: DataFrame, seq: int, batch_id: int | None = None) -> int | None:
        """RemoveCacheEntry: tombstone the given cache_key rows."""
        batch = keys.select(F.col(self.KEY).cast("string").alias(self.KEY)).withColumns(
            {self.VALUE: F.lit(None).cast("string"),
             "seq": F.lit(seq).cast("long"),
             "op": F.lit("D")}
        )
        return self.table.merge_events(batch, [self.KEY], batch_id=batch_id)

    def age_off(self, min_seq: int, batch_id: int | None = None) -> int | None:
        """Tombstone entries whose put_seq < min_seq (deterministic TTL:
        the horizon is a sequence/timestamp value carried by the data)."""
        if not self.table.exists():
            return None
        stale = (
            self.entries()
            .filter(F.col("seq") < F.lit(min_seq))
            .select(self.KEY)
        )
        return self.delete(stale, seq=min_seq, batch_id=batch_id)

    def entries(self) -> DataFrame:
        """Live cache entries (cache_key, cache_value, seq). The put
        sequence is the lake table's internal LWW column (_seq)."""
        raw = self.table.read_raw()
        return raw.filter(~F.coalesce(F.col("_deleted"), F.lit(False))).select(
            self.KEY, self.VALUE, F.col("_seq").alias("seq")
        )

    def fetch(
        self,
        df: DataFrame,
        key_col: str,
        out_col: str = "cached_value",
        broadcast: bool = True,
    ) -> DataFrame:
        """FetchDistributedMapCache: left join the cache onto ``df``;
        missing keys yield NULL (NiFi's ``not-found`` relationship — route
        with ``filter(col(out_col).isNull())``)."""
        cache = self.entries().select(
            F.col(self.KEY).alias("_ck"), F.col(self.VALUE).alias(out_col)
        )
        if broadcast:
            cache = F.broadcast(cache)
        return df.join(
            cache, on=df[key_col].cast("string") == cache["_ck"], how="left"
        ).drop("_ck")
