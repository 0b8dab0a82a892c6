"""The CDC north-star pipeline: change feed → LWW fold → lake MERGE.

Spark restatement of the reference flow
``CaptureChangeMySQL → EnforceOrder → PutDatabaseRecord/PutIceberg``
(SURVEY.md §3.2):

- **source** — ``readStream`` over the feed directory (parquet/json files ≙
  binlog segments). Spark's file source checkpoints which files were seen
  (≙ CaptureChangeMySQL's binlog file/pos cluster state,
  reference CaptureChangeMySQL.java:1189-1213 updateState); restart resumes
  with no re-read.
- **watermark** — the engine tracks ``max(ts) - delay`` across batches in a
  small state file next to the checkpoint; events older than the watermark
  route to the late count (≙ EnforceOrder wait-timeout → ``skipped``,
  reference EnforceOrder.java:205) and are excluded from the merge.
- **fold** — salted two-phase last-writer-wins per ``(conv_id, turn_idx)``
  (operators.ordering), keeping delete-winners as tombstone candidates.
- **apply** — ``foreachBatch``: LakeTable.merge with the streaming
  ``batch_id`` as the idempotent commit id. Spark may re-run a batch after
  a sink success but before the checkpoint commit; the merge skips
  already-applied ids, which upgrades at-least-once replay to exactly-once
  table state (≙ PutIceberg snapshot-summary uuid check,
  reference PutIceberg.java:89-93,392-399).
- **lineage** — per-(batch, source_file) offset-range records appended
  under the table (lineage.py).

Every stage is DataFrame-native; the only Python in the data path is the
optional Arrow normalization for raw-JSON feeds.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fsio import FsIO
from ..fsio import join as fsio_join
from ..normalize import _EVENT_JSON_SCHEMA, normalize_json
from ..operators.ordering import lww_fold_salted
from ..schema import CHANGE_EVENTS, KEY_COLS
from ..sinks.laketable import LakeTable
from ..lineage import write_lineage_rows


class QualityGateError(RuntimeError):
    """A micro-batch failed its declared data-quality checks under
    ``quality_action="halt"`` — raised BEFORE the sink commit, so the
    batch applies nothing and a replay re-evaluates the gate."""


def build_parse_exprs(keep: list[str]) -> tuple[list, list]:
    """(parse_cols, norm_cols) for the JSON-payload envelope: from_json →
    typed event columns, carrying ``keep`` metadata columns (source
    coordinates, txn id, a table-routing column, …) through unchanged.
    Built once per pipeline and reused every micro-batch — Columns are
    immutable expression trees, so this removes ~25 Py4J round-trips per
    batch of pure driver-side plan construction."""
    parse_cols = [
        F.from_json(F.col("payload_json"), _EVENT_JSON_SCHEMA).alias("e"),
        *[F.col(c) for c in keep],
    ]
    norm_cols = [
        F.col("e.seq").alias("seq"),
        F.col("e.type").alias("op"),
        F.col("e.timestamp").alias("ts"),
        F.col("e.conv_id").alias("conv_id"),
        F.col("e.turn_idx").alias("turn_idx"),
        F.col("e.role").alias("role"),
        F.col("e.text").alias("text"),
        F.col("e.tool").alias("tool"),
        F.col("e.tool_meta").alias("tool_meta"),
        *[F.col(c) for c in keep],
    ]
    return parse_cols, norm_cols


class CdcPipeline:
    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        checkpoint_dir: str,
        n_buckets: int = 16,
        salt_buckets: int = 0,
        watermark_delay_s: int | None = None,
        from_json_payload: bool = False,
        fold_mode: str = "bucket",
        sink_mode: str = "merge",
        compact_every: int = 16,
        txn_consistent: bool = False,
        txn_abandoned_ttl_ms: int | None = None,
        txn_via_state: bool = False,
        txn_marker_keep: int = 8,
        txn_abandon_after_batches: int | None = None,
        expire_every: int = 0,
        expire_keep_n: int = 64,
        mv_path: str | None = None,
        mv_refresh_every: int = 1,
        mv_key_cols: list[str] | None = None,
        mv_agg_fn=None,
        stats_cols: list[str] | None = None,
        quality_checks: list[dict] | None = None,
        quality_action: str = "record",
        near_dup_index: str | None = None,
        index_compact_every: int = 0,
        near_dup_threshold: float = 0.5,
    ):
        """``txn_consistent``: the feed is transaction-delimited
        (schema.CHANGE_EVENTS_TXN — every event carries ``txn_id``, the
        log contains op='C' commit markers). Only committed transactions'
        events reach the merge — CaptureChangeMySQL's BEGIN→COMMIT
        atomicity (reference CaptureChangeMySQL.java:947-1024). Two
        implementations:

        - default (``txn_via_state=False``): JVM pending-store gate in
          ``apply_batch`` — the batch unions the (tiny) carryover of
          still-open transactions from the checkpoint-adjacent pending
          store, one broadcast join against the commit set splits
          committed from pending, and the new pending set (O(open
          transactions), normally ≈ the last partial transaction of the
          batch) is rewritten. Steady-state cost: one small extra write
          per batch; NO per-event Python and NO full-stream stateful
          shuffle. Replay-safe: pending generations are keyed by the
          producing batch id and re-derived identically on replay.
        - ``txn_via_state=True``: keyed stateful buffer in the streaming
          plan (stateful.stateful_txn_buffer) — the applyInPandasWithState
          formulation; supports ``txn_abandoned_ttl_ms`` (drop a
          transaction with no commit after that much processing time).
          Pays a full keyed shuffle + Arrow round-trip per batch; use
          when per-key TTL semantics matter more than throughput.

        ``sink_mode``:

        - ``"merge"`` (default): copy-on-write — every batch folds into the
          touched base buckets (LakeTable.merge_events). Per-batch cost is
          O(touched table data); reads are fold-free.
        - ``"append"``: merge-on-read — every batch appends folded delta
          files (LakeTable.append_events), per-batch cost O(batch) — the
          shape a thousand-batch production stream needs; reads LWW-fold
          the delta generations, bounded by inline partial compaction every
          ``compact_every`` batches (bucket rewrite amortized 1/N per
          batch, read amplification ≤ N generations).
        """
        if sink_mode not in ("merge", "append"):
            raise ValueError(f"sink_mode must be 'merge' or 'append', got {sink_mode!r}")
        # quality_checks: operators/profile.check_constraints specs
        # evaluated per micro-batch over the ADMITTED good rows, BEFORE the
        # sink commit (≙ ValidateRecord as a batch gate instead of
        # per-record routing). Verdicts persist checkpoint-adjacent under
        # quality/ (FsIO — durable wherever the checkpoint lives);
        # quality_action="halt" fails the micro-batch on any failed check
        # so nothing commits (replay re-evaluates after the fix),
        # "record" logs verdicts + metrics and proceeds. Opt-in cost: ONE
        # extra aggregate job per batch (a second batch scan on the fused
        # append path, which otherwise stays at one job).
        if quality_action not in ("record", "halt"):
            raise ValueError(
                f"quality_action must be 'record' or 'halt', got {quality_action!r}"
            )
        self.quality_checks = quality_checks
        self.quality_action = quality_action
        self.spark = spark
        # stats_cols: per-file [min,max] bounds recorded at every commit
        # (LakeTable file_stats) so downstream time/seq-range readers skip
        # files — e.g. stats_cols=["ts"] lets a "last 24h of transcripts"
        # scan touch only recent files. Off by default: bounds collection
        # is one footer read (local) or one column-pruned scan (remote)
        # per micro-batch commit.
        self.table = LakeTable(
            spark, table_path, n_buckets=n_buckets, stats_cols=stats_cols
        )
        self.checkpoint_dir = checkpoint_dir
        self.salt_buckets = salt_buckets
        self.fold_mode = fold_mode
        self.sink_mode = sink_mode
        self.compact_every = compact_every
        self._since_compact = 0
        # Inline snapshot-expiry cadence: a thousand-batch stream commits a
        # manifest per batch; without expiry the commit log grows without
        # bound and head discovery/time-travel degrade. Same single-writer
        # assumption as the inline compaction below. 0 = off (run
        # `laketable expire` from a maintenance process instead).
        self.expire_every = expire_every
        self.expire_keep_n = expire_keep_n
        self._since_expire = 0
        # Live downstream aggregate view (operators/mv.py): every
        # ``mv_refresh_every`` committed batches, the changelog since the
        # view's last synced version is folded into the MV by partial
        # recompute. The cursor IS the MV's last committed batch_id
        # (refresh commits with batch_id=to_version), so it is durable,
        # transactional with the view commit, and restart-safe without a
        # side file. None = off. With inline expiry on, keep
        # mv_refresh_every well under expire_keep_n: the refresh reads
        # changes(from=cursor) and raises (loudly, not silently) if the
        # cursor version has been expired out of the commit log.
        self.mv_path = mv_path
        self.mv_refresh_every = max(int(mv_refresh_every), 1)
        self.mv_key_cols = mv_key_cols or ["conv_id"]
        self._mv_agg_fn = mv_agg_fn
        self._mv = None
        self._since_mv = 0
        if mv_path is not None:
            self._mv = LakeTable(spark, mv_path, n_buckets=n_buckets)
            if self._mv_agg_fn is None:
                from nifi_spark.operators.mv import transcript_stats_agg

                self._mv_agg_fn = transcript_stats_agg(self.mv_key_cols[0])
        # At-ingest NEAR-duplicate detection (operators/dedup_incremental.
        # LshIndex, ≙ DetectDuplicate's check-against-history lifted to
        # near-dups): each micro-batch's admitted INSERT turns are
        # assembled into per-conversation transcripts that probe + extend
        # the persisted index INSIDE apply_batch — batch id = the stream's
        # batch id, so the index write shares the sink's replay-idempotence
        # contract. Flagged pairs land under ``{table}/_near_dups/batch=N``
        # (overwrite-by-batch, replay-idempotent). Contract: a conversation
        # must arrive within one micro-batch (the index's new-id
        # discipline); ``index_compact_every`` folds the per-batch index
        # partitions on the same single-writer cadence as compact_every.
        self._ndx = None
        self.index_compact_every = index_compact_every
        self._since_index_compact = 0
        if near_dup_index is not None:
            from ..operators.dedup_incremental import LshIndex

            self._ndx = LshIndex(
                spark, near_dup_index, id_col="conv_id",
                text_col="transcript", threshold=near_dup_threshold,
            )
        self.watermark_delay_s = watermark_delay_s
        self.from_json_payload = from_json_payload
        self.txn_consistent = txn_consistent
        self.txn_abandoned_ttl_ms = txn_abandoned_ttl_ms
        self.txn_via_state = txn_via_state
        self.txn_marker_keep = txn_marker_keep
        # JVM-gate analog of the stateful buffer's txn_abandoned_ttl_ms:
        # a transaction still open after N carried batches routes to the
        # DLQ with reason 'txn-abandoned' instead of being held forever
        # (by default open txns hold until commit or end-of-log — correct,
        # but an end-of-log replay leaves them invisible; see
        # pending_report for the observability half).
        self.txn_abandon_after_batches = txn_abandon_after_batches
        self.table_path = table_path
        # Checkpoint-adjacent state (engine watermark + txn pending store)
        # must live wherever the checkpoint lives — in production that is
        # hdfs:// / s3a:// for driver-failover durability — so all of its
        # IO routes through FsIO (local fast path, Hadoop FS otherwise),
        # exactly like the LakeTable commit log.
        self._ckpt_io = FsIO(spark, checkpoint_dir)
        self._wm_path = fsio_join(checkpoint_dir, "engine_watermark.json")
        self._pending_dir = fsio_join(checkpoint_dir, "txn_pending")
        # Pre-built Column expression trees, reused every micro-batch.
        # Columns are immutable unresolved expressions, so building the
        # ~40 of them once removes that many Py4J round-trips per batch —
        # measured ~0.2 s/batch of pure driver-side plan construction at a
        # thousand-batch stream's fixed cost (profiled: normalize+observe
        # plan build was ~2/3 the size of the write job itself).
        keep = ["source_file", "source_pos", "payload_json"]
        if txn_consistent:
            keep.append("txn_id")
        self._parse_cols, self._norm_cols = build_parse_exprs(keep)
        # op='ddl' rows are schema-change events (statement in `text`),
        # key-less by nature — excused from the bad-row flag and excluded
        # from the merge payload; apply_batch routes them to
        # LakeTable.evolve (≙ CaptureChangeMySQL INCLUDE_DDL_EVENTS,
        # CaptureChangeMySQL.java:353-362).
        self._is_ddl = F.col("op").eqNullSafe("ddl")
        # BEGIN/COMMIT transaction markers are key-less control rows too —
        # they must reach the txn gate/buffer, not the DLQ (the gate
        # consumes them; they never reach the merge).
        self._is_marker = F.col("op").isin("C", "B")
        self._bad_cond = (
            F.col("seq").isNull()
            | F.col("op").isNull()
            | (
                (F.col("conv_id").isNull() | F.col("turn_idx").isNull())
                & ~self._is_ddl
                & ~self._is_marker
            )
        )
        # markers excluded from the data path everywhere: the txn gate /
        # buffer consumes them in txn mode, and a non-txn pipeline fed a
        # transaction-delimited log suppresses them (≙ CaptureChangeMySQL
        # INCLUDE_BEGIN_COMMIT=false, CaptureChangeMySQL.java:342-351)
        self._good = (
            ~F.col("_bad") & ~F.col("_late") & ~self._is_ddl & ~self._is_marker
        )
        _gw = lambda c: F.when(self._good, c)  # noqa: E731
        self._obs_aggs = [
            F.count(F.lit(1)).alias("total"),
            F.sum(F.col("_bad").cast("long")).alias("n_bad"),
            F.sum(F.col("_late").cast("long")).alias("n_late"),
            F.sum((self._is_ddl & ~F.col("_bad")).cast("long")).alias("n_ddl"),
            F.sum((self._is_marker & ~F.col("_bad")).cast("long")).alias("n_marker"),
            F.max(_gw(F.unix_timestamp("ts"))).alias("mx"),
            F.min(_gw(F.col("source_pos"))).alias("min_pos"),
            F.max(_gw(F.col("source_pos"))).alias("max_pos"),
            F.min(_gw(F.col("seq"))).alias("min_seq"),
            F.max(_gw(F.col("seq"))).alias("max_seq"),
            F.collect_set(_gw(F.col("source_file"))).alias("files"),
            F.collect_set(_gw(self.table._bucket_col(KEY_COLS[0]))).alias("buckets"),
        ]
        # payload column ORDER is fixed by the normalize schema above
        self._payload_cols = [
            "seq", "op", "ts", *KEY_COLS,
            *[
                f.name
                for f in _EVENT_JSON_SCHEMA.fields
                if f.name not in ("seq", "type", "timestamp", "conv_id", "turn_idx")
            ],
        ]

    # ---------- engine watermark state (auditable, checkpoint-adjacent) ----------

    def _load_watermark(self) -> int | None:
        if self._ckpt_io.exists(self._wm_path):
            return json.loads(self._ckpt_io.read_text(self._wm_path)).get(
                "max_ts_epoch"
            )
        return None

    def _store_watermark(self, max_ts_epoch: int) -> None:
        self._ckpt_io.mkdirs(self.checkpoint_dir)
        prev = self._load_watermark() or 0
        self._ckpt_io.write_text(
            self._wm_path, json.dumps({"max_ts_epoch": max(prev, max_ts_epoch)})
        )

    # ---------- JVM txn gate (pending store) ----------

    def _pending_before(self, batch_id: int) -> tuple[str | None, list[int]]:
        """Path of the newest pending generation produced by a batch BELOW
        ``batch_id`` (a replayed batch may already have written its own
        generation — that one must not feed itself), plus all generation
        ids present."""
        gens = sorted(
            int(name.split("_", 1)[1])
            for name in self._ckpt_io.list_names(self._pending_dir)
            if name.startswith("b_")
        )
        prior = [g for g in gens if g < batch_id]
        path = (
            fsio_join(self._pending_dir, f"b_{prior[-1]}") if prior else None
        )
        return path, gens

    def _mark_pending_rows(self, gen_dir: str, n: int) -> None:
        """Stamp the generation with its row count (observed on the write
        job itself — no extra job, no local-only footer reads) so the NEXT
        batch can skip the read+union when the carryover is empty, the
        steady state of a feed whose transactions commit within a batch."""
        try:
            self._ckpt_io.write_text(fsio_join(gen_dir, "_NROWS"), str(int(n)))
        except Exception:
            pass  # marker is an optimization; absence just means "read it"

    def _pending_is_empty(self, gen_dir: str) -> bool:
        try:
            marker = fsio_join(gen_dir, "_NROWS")
            if not self._ckpt_io.exists(marker):
                return False
            return int(self._ckpt_io.read_text(marker).strip()) == 0
        except Exception:
            return False

    def pending_report(self) -> DataFrame:
        """Open (uncommitted) transactions currently held by the JVM gate —
        one row per txn_id with its event count, how many batches it has
        been carried, and its seq range. The observability half of the
        abandoned-transaction story: after an end-of-log replay, anything
        listed here never applied (its commit never arrived). Empty frame
        when the gate holds nothing (or txn mode is off).

        Columns: (txn_id, n_events, age_batches, min_seq, max_seq).
        """
        schema = (
            "txn_id long, n_events long, age_batches int, "
            "min_seq long, max_seq long"
        )
        gens = [
            int(n.split("_", 1)[1])
            for n in self._ckpt_io.list_names(self._pending_dir)
            if n.startswith("b_")
        ]
        if not gens:
            return self.spark.createDataFrame([], schema)
        path = fsio_join(self._pending_dir, f"b_{max(gens)}")
        if self._pending_is_empty(path):
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.parquet(path)
        return (
            df.filter(F.col("op") != "C")  # kept commit markers ≠ open txns
            .groupBy("txn_id")
            .agg(
                F.count("*").alias("n_events"),
                F.max("_gate_age").cast("int").alias("age_batches"),
                F.min("seq").alias("min_seq"),
                F.max("seq").alias("max_seq"),
            )
            .select("txn_id", "n_events", "age_batches", "min_seq", "max_seq")
        )

    def _txn_gate(
        self, flagged: DataFrame, batch_id: int
    ) -> "tuple[DataFrame, Callable[[], None]]":
        """Transaction-consistent admission without per-event state: union
        the carryover store (pending store, O(open transactions +
        recent commit markers) — normally just the batch-boundary partial
        txn), split committed-vs-pending with ONE broadcast join against
        the commit set (operators/txn.txn_complete_filter), persist the
        new carryover generation keyed by this batch id, admit the
        committed side. Bad rows bypass the gate (they belong to the DLQ,
        not to a transaction).

        The carryover holds TWO kinds of rows:

        - pending data events of still-open transactions (no TTL — an
          open transaction holds until its commit or end-of-log);
        - recently seen COMMIT markers, kept ``txn_marker_keep`` more
          generations so a member event arriving a batch or two AFTER its
          commit marker (bounded arrival disorder at a segment boundary)
          still matches — the pending-store analog of the stateful
          buffer's committed-flag straggler pass-through. Markers retire
          after the TTL, bounding the store; a straggler later than that
          is treated as abandoned, the same contract the buffer's
          processing-time TTL gives.

        Exactly-once under replay: the gate always consumes the newest
        generation BELOW this batch id and rewriting generation
        ``b_{batch_id}`` is deterministic from (carryover, batch), so a
        replayed batch re-derives identical admitted/pending sets.
        Generations older than the consumed one are retired inline.

        Returns ``(admitted, persist_thunk)``: the caller runs
        ``persist_thunk()`` (the pending-store write job) CONCURRENTLY
        with the admitted side's sink job — the two actions are
        independent once the shared cached batch materializes, so on a
        multi-core executor pool the smaller job hides inside the larger
        one instead of serializing after it. Replay order-independence
        makes the overlap safe: whichever job survives a crash, the
        replayed batch re-derives both sides deterministically and the
        sink dedups by batch id.
        """
        from pyspark.sql import Observation

        from ..operators.txn import txn_complete_filter

        prev_path, gens = self._pending_before(batch_id)
        batch = flagged.withColumn("_gate_age", F.lit(0))
        src = batch
        if prev_path is not None and not self._pending_is_empty(prev_path):
            # explicit schema: no per-batch footer-inference job, and an
            # older generation written BEFORE an additive DDL evolution
            # reads with nulls for the new columns (schema-on-read)
            # instead of failing the union
            src = batch.unionByName(
                self.spark.read.schema(batch.schema).parquet(prev_path)
            )
        bad = src.filter(F.col("_bad"))
        ok = src.filter(~F.col("_bad"))
        committed, pending = txn_complete_filter(ok, txn_col="txn_id", op_col="op")
        abandoned = None
        if self.txn_abandon_after_batches is not None:
            # expire only rows STILL pending (a commit arriving this batch
            # admits its stragglers normally, whatever their age)
            expired = F.col("_gate_age") >= self.txn_abandon_after_batches
            abandoned = pending.filter(expired)
            pending = pending.filter(~expired)
        markers = ok.filter(
            (F.col("op") == "C") & (F.col("_gate_age") < self.txn_marker_keep)
        )
        carry = pending.unionByName(markers).withColumn(
            "_gate_age", F.col("_gate_age") + 1
        )
        out_dir = fsio_join(self._pending_dir, f"b_{batch_id}")
        obs = Observation(f"txn_carry_{batch_id}")

        def persist() -> None:
            # repartition (not coalesce): coalesce(1) would collapse the
            # whole upstream join onto one task; an explicit exchange
            # keeps the join parallel and only the tiny carryover lands
            # on a single writer. The Observation rides the write job —
            # the row count for the _NROWS marker costs no extra job and
            # no local-filesystem assumption.
            carry.observe(obs, F.count(F.lit(1)).alias("n")).repartition(
                1
            ).write.mode("overwrite").parquet(out_dir)
            self._mark_pending_rows(out_dir, obs.get["n"])
            if abandoned is not None:
                # expired open txns land in the DLQ instead of vanishing
                # (one small append per batch when the option is on; runs
                # inside the overlapped persist job, same replay caveat as
                # the _bad DLQ append — the apply_batch pre-check guards
                # the committed-replay path)
                (
                    abandoned.select(
                        F.lit(batch_id).cast("long").alias("batch_id"),
                        "payload_json",
                        "source_file",
                        "source_pos",
                        F.lit("txn-abandoned").alias("reason"),
                    )
                    .coalesce(1)
                    .write.mode("append")
                    .parquet(fsio_join(self.table_path, "_dlq"))
                )
            if prev_path is not None:
                consumed = int(prev_path.rsplit("b_", 1)[1])
                for g in gens:
                    if g < consumed:
                        self._ckpt_io.delete(
                            fsio_join(self._pending_dir, f"b_{g}")
                        )

        return committed.unionByName(bad).drop("_gate_age"), persist

    # ---------- snapshot bootstrap (initial load → incremental handoff) ----------

    def bootstrap(
        self,
        snapshot_df: DataFrame,
        snapshot_seq: int,
        watermark_ts_epoch: int | None = None,
    ) -> int:
        """Initial full-table load from a consistent snapshot image, then
        hand off to the incremental stream — the reference's
        "Retrieve All Records" / Initial Binlog Filename+Position startup
        contract (CaptureChangeMySQL.java:328-334: with no processor
        state, either replay the whole history or start from a declared
        snapshot position).

        ``snapshot_df`` is the table image as of log position
        ``snapshot_seq`` (every row stamped ``_seq = snapshot_seq``).
        Starting the stream afterwards is exact under either handoff:

        - replaying the FULL log: events at/below ``snapshot_seq`` lose
          the merge's LWW guard (``src.seq > tgt._seq``) against the
          snapshot rows — idempotent overlap;
        - replaying only the tail (> ``snapshot_seq``): changes apply on
          top of the image, including deletes of snapshotted keys.

        The bootstrap is recorded as lineage batch_id -1 with the
        snapshot position range, so the provenance chain covers the
        initial load; ``watermark_ts_epoch`` (the snapshot's event-time)
        pre-seeds the engine watermark when late-event skipping is on.
        """
        if self.table.exists():
            raise ValueError(
                "bootstrap() requires an empty table — the snapshot is an "
                "initial load, not a merge (use the stream for increments)"
            )
        img = snapshot_df.withColumn(
            "_seq", F.lit(int(snapshot_seq)).cast("long")
        )
        version = self.table.create(
            img, KEY_COLS, summary={"bootstrap_seq": int(snapshot_seq)}
        )
        n_rows = self.table.read_raw().count()
        write_lineage_rows(
            self.spark,
            [{
                "batch_id": -1,
                "snapshot_id": int(version),
                "source_file": "_snapshot",
                "min_pos": 0,
                "max_pos": int(snapshot_seq),
                "min_seq": 0,
                "max_seq": int(snapshot_seq),
                "n_events": int(n_rows),
                "n_late": 0,
                "committed_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                ),
            }],
            self.table_path,
        )
        if watermark_ts_epoch is not None:
            self._store_watermark(int(watermark_ts_epoch))
        return version

    # ---------- batch apply (the foreachBatch body) ----------

    def _quality_gate(self, flagged: DataFrame, batch_id: int, metrics: dict) -> None:
        """Evaluate the declared checks over this batch's admitted good
        rows (operators/profile.check_constraints — one aggregate job),
        persist the verdicts checkpoint-adjacent under ``quality/``, and
        under ``quality_action="halt"`` raise before anything commits.

        The verdict collect is bounded at len(quality_checks) rows (the
        same bounded-driver-collect class as DDL statements and touched
        buckets). Verdict files are keyed by batch id, so a replayed
        batch overwrites its own record instead of duplicating it.
        """
        from ..operators.profile import check_constraints

        verdicts = check_constraints(
            flagged.filter(self._good), self.quality_checks
        ).collect()
        failed = [r for r in verdicts if not r.passed]
        metrics["n_quality_failed"] = len(failed)
        qdir = fsio_join(self.checkpoint_dir, "quality")
        self._ckpt_io.mkdirs(qdir)
        self._ckpt_io.write_text(
            fsio_join(qdir, f"batch_{batch_id}.json"),
            json.dumps(
                {
                    "batch_id": batch_id,
                    "action": self.quality_action,
                    "checks": [r.asDict() for r in verdicts],
                }
            ),
        )
        if failed and self.quality_action == "halt":
            # Per-kind phrasing: "metric < threshold" is wrong for `unique`
            # (pass condition is distinct == non-null count, so one dup in
            # 10^7 rows rounds the ratio to 1.0 and would render the
            # misleading "metric=1.0 < 1.0") and for `non_empty` (a count).
            def _describe(r):
                if r.check == "unique":
                    return (
                        f"unique({r.column}) duplicate non-null values "
                        f"present (distinct/total ratio={r.metric})"
                    )
                if r.check == "non_empty":
                    return f"non_empty() dataset is empty (n_rows={int(r.metric)})"
                return (
                    f"{r.check}({r.column}) metric={r.metric} "
                    f"< threshold={r.threshold}"
                )

            raise QualityGateError(
                f"batch {batch_id} failed quality checks: "
                + "; ".join(_describe(r) for r in failed)
            )

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> dict:
        """Normalize → flag (DLQ/late) → one metrics pass → merge → lineage.

        Returns metrics. Malformed events (unparseable payload / missing
        key or sequence) route to a dead-letter table under
        ``{table}/_dlq`` instead of poisoning the merge — the engine's
        RetryFlowFile/penalization analog (reference
        .../standard/RetryFlowFile.java `retries_exceeded` routing;
        SURVEY.md §1.1 penalization row).

        Driver-action budget per micro-batch (the fixed cost that
        serializes a thousands-of-batches stream): TWO Spark jobs — one
        cached per-source-file aggregation that yields the batch metrics,
        the lineage offset-range records, AND the touched-bucket set in a
        single pass, then the merge/append itself (handed the touched set,
        so it runs no probe of its own). Lineage rows are already on the
        driver and append without a job; the optional DLQ write reads the
        cache (pays only when bad rows exist).
        """
        metrics = {"batch_id": batch_id, "n_events": 0, "n_late": 0, "n_dlq": 0, "n_ddl": 0, "version": None}
        # Replay pre-check, driver-only (manifest head read): the fused
        # append path must know before launching its single job — its
        # observation is populated by that job, so short-circuiting later
        # (as merge_events does internally) would leave nothing to await.
        if batch_id is not None and self.table.exists():
            last = self.table._batch_id_of(self.table._manifest())
            if last is not None and batch_id <= last:
                # defensive heal for state written by runs that committed
                # the sink BEFORE the index (the current order is index
                # first, so new runs never leave this gap): reconstruct
                # the PARSED/flagged frame — never the raw batch, whose
                # text column is NULL under from_json_payload — and index
                # it. The txn-admitted set of the original run cannot be
                # rebuilt (the pending store has moved on), so txn mode
                # records the skip instead of freezing a wrong doc set.
                if (
                    self._ndx is not None
                    and batch_id not in self._ndx.committed_batches()
                ):
                    wm = self._ndx._compacted_upto()
                    if wm is None or batch_id > wm:
                        if self.txn_consistent:
                            metrics["near_dup_heal_skipped"] = True
                        else:
                            self._near_dup_step(
                                self._flag_batch(batch_df), batch_id, metrics
                            )
                return metrics
        flagged = self._flag_batch(batch_df)
        gate_cache = None
        gate_thread = None
        gate_err: list[BaseException] = []
        if self.txn_consistent and not self.txn_via_state:
            import threading

            # cache the flagged batch across the gate's TWO consumers (the
            # pending-store write and the admitted side feeding the sink):
            # without it every gate job re-runs the batch scan + parse
            gate_cache = flagged.cache()
            flagged, persist_pending = self._txn_gate(gate_cache, batch_id)

            def _run_persist() -> None:
                try:
                    persist_pending()
                except BaseException as e:  # surfaced after join below
                    gate_err.append(e)

            # overlap the pending-store write with the sink job: the two
            # actions are independent given the shared cache, so the
            # scheduler runs them side by side and the smaller job's wall
            # disappears instead of adding a full serial job per batch
            gate_thread = threading.Thread(target=_run_persist, daemon=True)
            gate_thread.start()
        try:
            # quality gate FIRST (inside the try so a halt still joins the
            # overlapped pending write and releases the batch cache):
            # verdicts must precede the sink commit for halt to mean
            # "nothing applied"
            if self.quality_checks:
                self._quality_gate(flagged, batch_id, metrics)
            if self._ndx is not None:
                # BEFORE the sink commit, so the crash window between the
                # two commits heals through the NORMAL replay path: a
                # crash after the index add replays the whole batch, the
                # index add is idempotent by batch id, and the sink then
                # commits — no divergent heal branch. The transient state
                # (index committed, sink pending) lasts exactly one
                # replay; the quality gate runs first, so a halted batch
                # never reaches the index.
                self._near_dup_step(flagged, batch_id, metrics)
            if self.sink_mode == "append":
                metrics = self._apply_batch_fused(flagged, batch_id, metrics)
            else:
                metrics = self._apply_batch_merge(flagged, batch_id, metrics)
            return metrics
        finally:
            if gate_thread is not None:
                gate_thread.join()
                if gate_err and sys.exc_info()[0] is None:
                    # a lost pending generation is a correctness gap on
                    # the NEXT batch — fail the micro-batch; replay
                    # re-derives both sides (sink dedups by batch id).
                    # (if the sink job itself raised, keep THAT error)
                    raise gate_err[0]
            if gate_cache is not None:
                gate_cache.unpersist()

    def _apply_batch_merge(self, flagged, batch_id: int, metrics: dict) -> dict:
        flagged = flagged.cache()
        try:
            good = self._good

            def gw(col):  # aggregate over good rows only (nulls are skipped)
                return F.when(good, col)

            per_file = flagged.groupBy("source_file").agg(
                F.count("*").alias("total"),
                F.sum(F.col("_bad").cast("long")).alias("n_bad"),
                F.sum(F.col("_late").cast("long")).alias("n_late"),
                F.sum((self._is_ddl & ~F.col("_bad")).cast("long")).alias("n_ddl"),
                F.sum((self._is_marker & ~F.col("_bad")).cast("long")).alias("n_marker"),
                F.max(gw(F.unix_timestamp("ts"))).alias("mx"),
                F.min(gw(F.col("source_pos"))).alias("min_pos"),
                F.max(gw(F.col("source_pos"))).alias("max_pos"),
                F.min(gw(F.col("seq"))).alias("min_seq"),
                F.max(gw(F.col("seq"))).alias("max_seq"),
                F.collect_set(gw(self.table._bucket_col(KEY_COLS[0]))).alias("buckets"),
            ).collect()
            n_dlq = sum(int(r["n_bad"] or 0) for r in per_file)
            n_late = sum(int(r["n_late"] or 0) for r in per_file)
            n_ddl = sum(int(r["n_ddl"] or 0) for r in per_file)
            n_marker = sum(int(r["n_marker"] or 0) for r in per_file)
            n_events = (
                sum(int(r["total"] or 0) for r in per_file)
                - n_dlq - n_late - n_ddl - n_marker
            )
            metrics.update(n_events=n_events, n_late=n_late, n_dlq=n_dlq, n_ddl=n_ddl)
            ddl_cols = self._collect_ddl(flagged) if n_ddl else {}
            if ddl_cols and self.table.exists():
                # schema change lands BEFORE the batch's data (binlog order)
                self.table.evolve(ddl_cols)
                ddl_cols = {}
            if n_dlq:
                (
                    flagged.filter(F.col("_bad"))
                    .select(
                        F.lit(batch_id).cast("long").alias("batch_id"),
                        "payload_json",
                        "source_file",
                        "source_pos",
                        F.lit("unparseable-or-missing-key").alias("reason"),
                    )
                    .coalesce(1)
                    .write.mode("append")
                    .parquet(fsio_join(self.table_path, "_dlq"))
                )
            if n_events == 0:
                if ddl_cols and self.table.exists():  # pure-DDL batch
                    self.table.evolve(ddl_cols)
                return metrics
            touched = sorted({b for r in per_file for b in (r["buckets"] or [])})
            mxs = [r["mx"] for r in per_file if r["mx"] is not None]

            events = flagged.filter(good)
            payload = events.select(
                "seq", "op", "ts", *KEY_COLS,
                *[c for c in events.columns if c not in ("seq", "op", "ts", *KEY_COLS, "source_file", "source_pos", "payload_json", "txn_id", "_bad", "_late")],
            )
            summary = {"n_events": n_events, "n_late": n_late}
            # Fold strategy (see laketable.merge_events + operators/ordering):
            # "salted" = explicit two-phase salted fold for extreme hot keys;
            # "prefold" = map-side partial LWW fold (shuffle O(keys));
            # "bucket" (default) = fold inside the single bucket shuffle.
            if self.salt_buckets and self.salt_buckets > 1:
                folded = lww_fold_salted(
                    payload, key_cols=KEY_COLS,
                    salt_buckets=self.salt_buckets, keep_deletes=True,
                )
                version = self.table.merge_events(
                    folded, KEY_COLS, seq_col="seq", op_col="op",
                    batch_id=batch_id, extra_summary=summary,
                    pre_folded=True, touched=touched,
                )
            else:
                version = self.table.merge_events(
                    payload, KEY_COLS, seq_col="seq", op_col="op",
                    batch_id=batch_id, extra_summary=summary,
                    fold_mode=self.fold_mode, touched=touched,
                )
            metrics["version"] = version
            if ddl_cols and self.table.exists():
                # table was created by THIS batch's merge — apply the
                # deferred DDL now (additive, so order vs data is benign)
                self.table.evolve(ddl_cols)
            if version is not None:
                committed_at = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
                write_lineage_rows(
                    self.spark,
                    [
                        {
                            "batch_id": int(batch_id),
                            "snapshot_id": int(version),
                            "source_file": r["source_file"],
                            "min_pos": r["min_pos"],
                            "max_pos": r["max_pos"],
                            "min_seq": r["min_seq"],
                            "max_seq": r["max_seq"],
                            "n_events": int(r["total"]) - int(r["n_bad"] or 0) - int(r["n_late"] or 0) - int(r["n_ddl"] or 0) - int(r["n_marker"] or 0),
                            "n_late": int(n_late),
                            "committed_at": committed_at,
                        }
                        for r in per_file
                        if int(r["total"]) - int(r["n_bad"] or 0) - int(r["n_late"] or 0) - int(r["n_ddl"] or 0) - int(r["n_marker"] or 0) > 0
                    ],
                    self.table_path,
                )
                if mxs:
                    self._store_watermark(int(max(mxs)))
                self._maybe_expire(metrics)
                self._maybe_refresh_mv(metrics)
        finally:
            flagged.unpersist()
        return metrics

    def _collect_ddl(self, flagged) -> dict:
        """Gather the batch's DDL statements (op='ddl', statement in
        ``text``) in seq order and parse them into one add-columns map.
        Driver-side collect is bounded by the number of DDL events in the
        batch — schema changes, not data. Unsupported/destructive DDL
        raises (the statement lands in the error with the batch id)."""
        from ..sinks.laketable import parse_ddl_add_columns

        rows = (
            flagged.filter(self._is_ddl & ~F.col("_bad"))
            .select("seq", "text")
            .collect()
        )
        add: dict = {}
        for r in sorted(rows, key=lambda r: int(r["seq"])):
            if r["text"]:
                add.update(parse_ddl_add_columns(r["text"]))
        return add

    def _apply_batch_fused(self, flagged, batch_id: int, metrics: dict) -> dict:
        """Merge-on-read micro-batch with ONE Spark job: the delta-file
        write. Batch metrics, lineage offset ranges, the touched-bucket
        set, and the watermark all ride that job via ``observe()`` (a
        CollectMetrics node in the same physical plan), so the per-batch
        fixed cost is one job + one manifest commit — the shape that
        bounds a thousand-batch stream. Multi-file batches pay one extra
        tiny aggregation for exact per-source-file lineage; the DLQ write
        runs only when bad rows exist."""
        from pyspark.sql import Observation

        good = self._good

        obs = Observation()
        pre_obs = flagged
        flagged = flagged.observe(obs, *self._obs_aggs)
        # evaluated by append_events AFTER its write job populates obs —
        # the touched-bucket set costs nothing extra. Fallback: a
        # driver-local batch (a LocalRelation fed straight to apply_batch
        # — tests, backfill scripts; stream sources never produce one)
        # can be constant-folded so the CollectMetrics node never emits,
        # leaving the observation EMPTY (obs.get then throws); recompute
        # the same aggs with one explicit job in that case only.
        obs_state: dict = {}

        def _obs_row():
            if "row" not in obs_state:
                try:
                    obs_state["row"] = obs.get
                except Exception:
                    obs_state["row"] = pre_obs.agg(*self._obs_aggs).collect()[0]
            return obs_state["row"]

        touched_fn = lambda: [int(b) for b in (_obs_row()["buckets"] or [])]  # noqa: E731
        events = flagged.filter(good)
        if self.from_json_payload:
            payload = events.select(*self._payload_cols)
        else:
            payload = events.select(
                "seq", "op", "ts", *KEY_COLS,
                *[c for c in events.columns if c not in ("seq", "op", "ts", *KEY_COLS, "source_file", "source_pos", "payload_json", "txn_id", "_bad", "_late")],
            )
        if self.salt_buckets and self.salt_buckets > 1:
            payload = lww_fold_salted(
                payload, key_cols=KEY_COLS,
                salt_buckets=self.salt_buckets, keep_deletes=True,
            )
            version = self.table.append_events(
                payload, KEY_COLS, seq_col="seq", op_col="op",
                batch_id=batch_id, pre_folded=True, touched=touched_fn,
            )
        else:
            # raw delta append: no batch-local fold — the read-side LWW
            # fold / compaction reconciles duplicates, so the write is a
            # single narrow stage (no shuffle at all per micro-batch)
            version = self.table.append_events(
                payload, KEY_COLS, seq_col="seq", op_col="op",
                batch_id=batch_id, fold_mode="raw", touched=touched_fn,
            )
        # append_events always ran its write job (the replay short-circuit
        # was pre-checked in apply_batch), so the observation is populated
        # — or the LocalRelation fallback above recomputes it.
        row = _obs_row()
        n_dlq = int(row["n_bad"] or 0)
        n_late = int(row["n_late"] or 0)
        n_ddl = int(row["n_ddl"] or 0)
        n_marker = int(row["n_marker"] or 0)
        n_events = int(row["total"] or 0) - n_dlq - n_late - n_ddl - n_marker
        metrics.update(
            n_events=n_events, n_late=n_late, n_dlq=n_dlq, n_ddl=n_ddl,
            version=version,
        )
        if n_ddl and self.table.exists():
            # metadata-only evolve AFTER the append (additive columns:
            # this batch's delta files null-fill through the schema reader)
            ddl_cols = self._collect_ddl(flagged)
            if ddl_cols:
                self.table.evolve(ddl_cols)
        if n_dlq:
            (
                flagged.filter(F.col("_bad"))
                .select(
                    F.lit(batch_id).cast("long").alias("batch_id"),
                    "payload_json",
                    "source_file",
                    "source_pos",
                    F.lit("unparseable-or-missing-key").alias("reason"),
                )
                .coalesce(1)
                .write.mode("append")
                .parquet(fsio_join(self.table_path, "_dlq"))
            )
        if version is None:
            return metrics
        committed_at = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        files = sorted(row["files"] or [])
        if len(files) == 1:
            lineage = [{
                "batch_id": int(batch_id), "snapshot_id": int(version),
                "source_file": files[0],
                "min_pos": int(row["min_pos"]), "max_pos": int(row["max_pos"]),
                "min_seq": int(row["min_seq"]), "max_seq": int(row["max_seq"]),
                "n_events": n_events, "n_late": n_late,
                "committed_at": committed_at,
            }]
        else:
            # multi-file batch (e.g. full-backlog availableNow drain):
            # per-source-file ranges need one extra aggregation
            lineage = [
                {
                    "batch_id": int(batch_id), "snapshot_id": int(version),
                    "source_file": r["source_file"],
                    "min_pos": r["min_pos"], "max_pos": r["max_pos"],
                    "min_seq": r["min_seq"], "max_seq": r["max_seq"],
                    "n_events": int(r["n_events"]), "n_late": n_late,
                    "committed_at": committed_at,
                }
                for r in events.groupBy("source_file").agg(
                    F.count("*").alias("n_events"),
                    F.min("source_pos").alias("min_pos"),
                    F.max("source_pos").alias("max_pos"),
                    F.min("seq").alias("min_seq"),
                    F.max("seq").alias("max_seq"),
                ).collect()
            ]
        write_lineage_rows(self.spark, lineage, self.table_path)
        if row["mx"] is not None:
            self._store_watermark(int(row["mx"]))
        if self.compact_every:
            # amortized MOR-debt repayment: rewrite the unfolded buckets
            # every compact_every batches (single-writer loop, no race)
            self._since_compact += 1
            if self._since_compact >= self.compact_every:
                mor = (self.table._manifest() or {}).get("mor_buckets", [])
                if mor:
                    self.table.compact_buckets([int(b) for b in mor])
                    metrics["compacted"] = len(mor)
                self._since_compact = 0
        self._maybe_expire(metrics)
        self._maybe_refresh_mv(metrics)
        return metrics

    def _flag_batch(self, batch_df: DataFrame) -> DataFrame:
        """Parse + flag one micro-batch: payload parse (when not baked
        into the streaming plan), ``_bad``, and the engine-watermark
        ``_late`` flag. Shared by the normal apply path and the
        defensive index heal so both see the SAME frame shape."""
        if "_late" in batch_df.columns:
            # fully pre-flagged by the streaming plan (start() bakes parse,
            # _bad, and a constant-false _late into the stream when no
            # engine watermark is configured) — zero per-batch plan nodes
            return batch_df
        if "_bad" in batch_df.columns:
            bad_flagged = batch_df  # parse+_bad pre-built by the streaming plan
        else:
            if self.from_json_payload:
                # pre-built expression trees (see __init__) — same plan
                # as normalize_json(batch_df, keep_cols=[...]) without
                # rebuilding ~25 Column objects per micro-batch
                parsed = batch_df.select(*self._parse_cols).select(*self._norm_cols)
                bad_cond = self._bad_cond
            else:
                parsed = batch_df
                bad_cond = F.lit(False)
            bad_flagged = parsed.withColumn("_bad", bad_cond)

        late_cond = F.lit(False)
        if self.watermark_delay_s is not None:
            prev_max = self._load_watermark()
            if prev_max is not None:
                cutoff = F.timestamp_seconds(F.lit(prev_max - self.watermark_delay_s))
                late_cond = F.col("ts") < cutoff
        return bad_flagged.withColumn("_late", ~F.col("_bad") & late_cond)

    def _near_dup_step(self, df: DataFrame, batch_id: int, metrics: dict) -> None:
        """Probe + extend the persisted LSH index with this batch's
        admitted INSERT conversations; land flagged pairs under
        ``{table}/_near_dups/batch=N`` (overwrite — replay-idempotent).

        The pair set is micro-batch-bounded (new docs × matched buckets),
        so collecting it to route through one deterministic write is the
        same bounded-driver-collect class as DDL statements. The index
        add itself is idempotent by batch id (LshIndex contract), so a
        replayed batch re-derives identical pairs and overwrites the same
        partition."""
        from ..operators.transcript import assemble_transcripts

        ev = df
        if "_bad" in ev.columns:
            ev = ev.filter(~F.col("_bad"))
        if "_late" in ev.columns:
            ev = ev.filter(~F.col("_late"))
        inserts = ev.filter(
            (F.col("op") == "I") & F.col("text").isNotNull()
        )
        docs = assemble_transcripts(
            inserts, tool_col="tool" if "tool" in ev.columns else None
        ).select("conv_id", "transcript")
        pairs = self._ndx.add_batch(docs, batch_id)
        rows = pairs.collect()
        metrics["n_near_dups"] = len(rows)
        if rows:
            (
                self.spark.createDataFrame(rows, pairs.schema)
                .withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(
                    fsio_join(self.table_path, "_near_dups", f"batch={batch_id}")
                )
            )
        if self.index_compact_every:
            self._since_index_compact += 1
            if self._since_index_compact >= self.index_compact_every:
                self._ndx.compact()
                self._since_index_compact = 0

    def _maybe_refresh_mv(self, metrics: dict) -> None:
        """Refresh the downstream aggregate view every
        ``mv_refresh_every`` committed batches (single-writer loop, like
        the inline compaction). Cursor = the view's last committed
        batch_id; a crash between table commit and view refresh is healed
        by the next refresh spanning the missed range (idempotent)."""
        if self._mv is None:
            return
        self._since_mv += 1
        if self._since_mv < self.mv_refresh_every:
            return
        self._since_mv = 0
        from nifi_spark.operators.mv import refresh_agg_mv

        from_v = self._mv.last_batch_id() or 0
        synced = refresh_agg_mv(
            self.table, self._mv, self.mv_key_cols, self._mv_agg_fn, int(from_v)
        )
        metrics["mv_synced_to"] = synced

    def _maybe_expire(self, metrics: dict) -> None:
        """Inline commit-log expiry every ``expire_every`` committed
        batches (keep the newest ``expire_keep_n`` snapshots + their base
        closure) — bounds manifest count on a long-lived stream without a
        separate maintenance process. No-op when ``expire_every`` is 0.

        The downstream view (``mv_path``) is expired on the same cadence:
        it commits one snapshot per refresh, so a thousand-batch stream
        would otherwise grow its manifest count unbounded even though the
        main table's is capped. Its cursor (``last_batch_id``) rides the
        HEAD manifest, which expiry always keeps."""
        if not self.expire_every:
            return
        self._since_expire += 1
        if self._since_expire >= self.expire_every:
            out = self.table.expire_snapshots(keep_n=self.expire_keep_n)
            if out["manifests_deleted"]:
                metrics["expired"] = out["manifests_deleted"]
            if self._mv is not None and self._mv.exists():
                mout = self._mv.expire_snapshots(keep_n=self.expire_keep_n)
                if mout["manifests_deleted"]:
                    metrics["mv_expired"] = mout["manifests_deleted"]
            self._since_expire = 0

    # ---------- streaming wiring ----------

    def start(
        self,
        feed_dir: str,
        max_files_per_trigger: int | None = None,
        available_now: bool = True,
        processing_time: str | None = None,
    ):
        """readStream over the feed dir; availableNow drains and stops
        (tests/bench), ``processing_time`` (e.g. ``"1 second"``) runs the
        NiFi steady-state shape: a long-lived timer-driven flow
        (≙ TimerDrivenSchedulingAgent.java:35)."""
        from ..schema import CHANGE_EVENTS_TXN

        feed_schema = CHANGE_EVENTS_TXN if self.txn_consistent else CHANGE_EVENTS
        reader = (
            self.spark.readStream.schema(feed_schema)
            .format("parquet")
        )
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.load(feed_dir)
        # Bake the batch-invariant plan prefix into the STREAM: parse +
        # bad-row flag (+ constant-false _late when no engine watermark is
        # configured — a file-state-dependent watermark cutoff must stay
        # per-batch in apply_batch). The incremental planner re-analyzes
        # this Scala-side; foreachBatch then adds zero (or one) plan nodes
        # per batch instead of rebuilding the whole chain through Py4J.
        if self.from_json_payload:
            stream = (
                stream.select(*self._parse_cols)
                .select(*self._norm_cols)
                .withColumn("_bad", self._bad_cond)
            )
        else:
            stream = stream.withColumn("_bad", F.lit(False))
        if self.txn_consistent and self.txn_via_state:
            # Commit-gated admission ahead of the sink: hold each
            # transaction's events in keyed state until its op='C' marker
            # arrives (markers are consumed here, never emitted), so
            # apply_batch only ever sees commit-complete data events.
            # (The default JVM pending-store gate runs inside apply_batch
            # instead — see _txn_gate.)
            from .stateful import stateful_txn_buffer

            stream = stateful_txn_buffer(
                stream,
                txn_col="txn_id",
                op_col="op",
                abandoned_ttl_ms=self.txn_abandoned_ttl_ms,
            )
        if self.watermark_delay_s is None:
            stream = stream.withColumn("_late", F.lit(False))

        writer = (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.apply_batch(df, bid)
            )
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    def run_to_completion(self, feed_dir: str, **kw) -> None:
        q = self.start(feed_dir, **kw)
        q.awaitTermination()


def _cli(argv: list[str] | None = None) -> None:
    """spark-submit entry point (north rule: `spark-submit --py-files`);
    launched via the repo-root ``run_cdc.py`` shim (a --py-files main script
    cannot use this module's relative imports). See run_cdc.py docstring
    for the full command line.
    """
    import argparse

    p = argparse.ArgumentParser(description="nifi_spark CDC apply pipeline")
    p.add_argument("--feed-dir", required=True, help="change-feed parquet directory")
    p.add_argument("--table", default=None, help="target lake table path")
    p.add_argument("--tables", default=None,
                   help="multi-table fan-out: name=path[,name=path...] — one "
                        "binlog stream routed by --table-col to N lake tables "
                        "(mutually exclusive with --table)")
    p.add_argument("--table-col", default="table_name",
                   help="routing column for --tables mode")
    p.add_argument("--parallel-tables", action="store_true",
                   help="apply per-table batches from a thread pool")
    p.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--salt-buckets", type=int, default=0)
    p.add_argument("--watermark-delay-s", type=int, default=None)
    p.add_argument("--from-json-payload", action="store_true")
    p.add_argument("--txn-consistent", action="store_true",
                   help="feed is transaction-delimited (txn_id + op='C' markers); "
                        "hold events until their transaction commits")
    p.add_argument("--txn-abandoned-ttl-ms", type=int, default=None)
    p.add_argument("--txn-via-state", action="store_true",
                   help="use the keyed stateful buffer instead of the default "
                        "JVM pending-store gate (enables abandoned-txn TTL)")
    p.add_argument("--bootstrap-from", default=None,
                   help="parquet path of a consistent snapshot image to load "
                        "before streaming (initial load -> incremental handoff)")
    p.add_argument("--bootstrap-seq", type=int, default=None,
                   help="log position the snapshot is consistent as of "
                        "(required with --bootstrap-from)")
    p.add_argument("--sink-mode", choices=["merge", "append"], default="merge",
                   help="copy-on-write merge per batch, or merge-on-read append + compaction cadence")
    p.add_argument("--compact-every", type=int, default=16,
                   help="append mode: fold MOR delta generations every N batches")
    p.add_argument("--expire-every", type=int, default=0,
                   help="run snapshot expiry every N committed batches (0 = off)")
    p.add_argument("--expire-keep-n", type=int, default=64,
                   help="snapshots kept (plus base closure) by inline expiry")
    p.add_argument("--txn-abandon-after-batches", type=int, default=None,
                   help="JVM gate: route a txn still open after N carried "
                        "batches to the DLQ (reason txn-abandoned)")
    p.add_argument("--mv-path", default=None,
                   help="maintain a live per-conversation stats view at this "
                        "path (changelog-driven partial recompute)")
    p.add_argument("--mv-refresh-every", type=int, default=1,
                   help="refresh the stats view every N committed batches")
    p.add_argument("--mv-agg", choices=("stats", "sft"), default="stats",
                   help="view aggregate: per-conversation stats (default) or "
                        "rendered SFT training samples (transcript text + "
                        "counters + train/val split)")
    p.add_argument("--quality-checks", default=None,
                   help="JSON list of operators/profile.check_constraints "
                        "specs evaluated per batch over the admitted rows, "
                        'e.g. \'[{"check":"complete","column":"text",'
                        '"min_fraction":1.0}]\'')
    p.add_argument("--quality-action", choices=("record", "halt"),
                   default="record",
                   help="on a failed check: record the verdict and proceed, "
                        "or halt the micro-batch before anything commits")
    p.add_argument("--near-dup-index", default=None,
                   help="path of the persisted LSH index: each batch's admitted "
                        "insert conversations probe+extend it; flagged pairs "
                        "land under {table}/_near_dups/batch=N")
    p.add_argument("--index-compact-every", type=int, default=0,
                   help="fold the per-batch LSH index partitions every N batches")
    p.add_argument("--near-dup-threshold", type=float, default=0.5)
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--available-now", action="store_true",
                   help="drain the feed and stop (batch replay); else run continuous")
    args = p.parse_args(argv)

    def _mv_agg_from_name(name: str):
        if name == "sft":
            from ..operators.mv import sft_sample_agg

            return sft_sample_agg()
        return None  # CdcPipeline defaults to transcript_stats_agg

    from ..session import get_spark

    spark = get_spark("nifi_spark_cdc")
    if bool(args.table) == bool(args.tables):
        p.error("pass exactly one of --table / --tables")
    if args.tables:
        from .multi import MultiTableCdcPipeline

        if args.bootstrap_from:
            p.error("--bootstrap-from is single-table only")
        tables = dict(kv.split("=", 1) for kv in args.tables.split(","))
        multi = MultiTableCdcPipeline(
            spark,
            tables,
            args.checkpoint,
            table_col=args.table_col,
            parallel=args.parallel_tables,
            n_buckets=args.n_buckets,
            salt_buckets=args.salt_buckets,
            watermark_delay_s=args.watermark_delay_s,
            from_json_payload=args.from_json_payload,
            sink_mode=args.sink_mode,
            compact_every=args.compact_every,
            txn_consistent=args.txn_consistent,
            txn_abandon_after_batches=args.txn_abandon_after_batches,
            expire_every=args.expire_every,
            expire_keep_n=args.expire_keep_n,
        )
        multi.run_to_completion(
            args.feed_dir,
            max_files_per_trigger=args.max_files_per_trigger,
            available_now=args.available_now,
        )
        return
    pipe = CdcPipeline(
        spark,
        table_path=args.table,
        checkpoint_dir=args.checkpoint,
        n_buckets=args.n_buckets,
        salt_buckets=args.salt_buckets,
        watermark_delay_s=args.watermark_delay_s,
        from_json_payload=args.from_json_payload,
        sink_mode=args.sink_mode,
        compact_every=args.compact_every,
        txn_consistent=args.txn_consistent,
        txn_abandoned_ttl_ms=args.txn_abandoned_ttl_ms,
        txn_via_state=args.txn_via_state,
        txn_abandon_after_batches=args.txn_abandon_after_batches,
        expire_every=args.expire_every,
        expire_keep_n=args.expire_keep_n,
        mv_path=args.mv_path,
        mv_refresh_every=args.mv_refresh_every,
        mv_agg_fn=_mv_agg_from_name(args.mv_agg),
        quality_checks=(
            json.loads(args.quality_checks) if args.quality_checks else None
        ),
        quality_action=args.quality_action,
        near_dup_index=args.near_dup_index,
        index_compact_every=args.index_compact_every,
        near_dup_threshold=args.near_dup_threshold,
    )
    if args.bootstrap_from:
        if args.bootstrap_seq is None:
            p.error("--bootstrap-from requires --bootstrap-seq")
        if not pipe.table.exists():
            pipe.bootstrap(
                spark.read.parquet(args.bootstrap_from), args.bootstrap_seq
            )
    pipe.run_to_completion(
        args.feed_dir,
        max_files_per_trigger=args.max_files_per_trigger,
        available_now=args.available_now,
    )


if __name__ == "__main__":
    _cli()
