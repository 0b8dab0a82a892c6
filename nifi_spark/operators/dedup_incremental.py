"""Incremental near-duplicate detection at ingest: a persisted LSH index.

Batch MinHash-LSH (operators/dedup_fuzzy) answers "which documents in THIS
corpus are near-dups of each other" — one self-join over the whole corpus.
An ingest pipeline asks a different question every micro-batch: "which of
these NEW documents near-duplicate anything ingested SO FAR?". Recomputing
the self-join per batch is O(corpus) per batch — at 10^10 documents that is
the whole job again each trigger. :class:`LshIndex` makes it O(batch):

- the index persists, per ingested document, its ``n_bands`` LSH band rows
  ``(doc_id, band, bhash)`` and its distinct hashed-shingle array (the
  exact-verify side) under ``path/bands/batch=N/`` and
  ``path/shingles/batch=N/`` — append-only, one partition directory per
  batch, idempotent by ``batch_id`` (a replayed batch detects its
  ``_SUCCESS`` marker, skips the write, and re-derives the same pairs);
- a batch probe joins the NEW band rows (small, broadcast) against the
  index scan on ``(band, bhash)``: the corpus is never re-shingled and
  never shuffled — per-batch cost is O(batch + matched buckets);
- candidates are verified by exact hashed-shingle Jaccard
  (dedup_fuzzy.verify_jaccard_pairs — identical arithmetic to the batch
  operator, so the union of per-batch pair outputs over any batch split
  EQUALS the one-shot ``minhash_dedup_pairs`` over the union of documents
  (the invariant tests/test_dedup_incremental.py pins), as long as no
  bucket outgrows ``max_bucket`` between the splits (the guard applies to
  the bucket size at probe time — streaming-LSH's standard semantics).

Reference parity: the reference's duplicate detection is key-equality with
a distributed map cache (nifi-standard-bundle .../DetectDuplicate.java:152-210
— put/check a hash in DistributedMapCacheClient); this is the same
check-against-history contract lifted to NEAR-duplicates, with the cache a
Spark-readable table instead of an external service.

Scale shape at 10^10 docs: band rows are ~n_bands × 40 B/doc and shingle
arrays ~8 B/shingle — both linear, partitioned by ingest batch; the probe
broadcasts only the new batch's band rows and bucket counts; compaction of
many small batch directories is the same maintenance story as the lake
table's (re-write old partitions wider — layout, not semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fsio import FsIO
from ..fsio import join as fsio_join
from .dedup_fuzzy import (
    _guard_internal,
    band_rows,
    md5_long,
    minhash_signature,
    shingles,
    verify_jaccard_pairs,
)


class LshIndex:
    """Persistent MinHash-LSH index for at-ingest near-dup detection.

    ``add_batch(docs, batch_id)`` returns the verified near-dup pairs
    ``(id_a, id_b, jaccard)`` in which at least one side belongs to the
    given batch (new-vs-old AND new-vs-new; old-vs-old pairs were emitted
    by the batch that made them old), then durably extends the index.
    Pair ids are ordered ``id_a < id_b``; jaccard is the exact distinct
    hashed-shingle ratio rounded to 6 — bit-identical to
    ``minhash_dedup_pairs``.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_hashes: int = 16,
        shingle_n: int = 3,
        n_bands: int = 4,
        threshold: float = 0.5,
        max_bucket: int | None = 64,
    ):
        if n_hashes % n_bands:
            raise ValueError(f"n_bands {n_bands} must divide n_hashes {n_hashes}")
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        self.n_hashes = n_hashes
        self.shingle_n = shingle_n
        self.n_bands = n_bands
        self.rows_per_band = n_hashes // n_bands
        self.threshold = threshold
        self.max_bucket = max_bucket
        self._io = FsIO(spark, path)
        self.bands_dir = fsio_join(path, "bands")
        self.sh_dir = fsio_join(path, "shingles")

    # -- state ------------------------------------------------------------

    def committed_batches(self) -> list[int]:
        """Batch ids whose index partitions are durably written."""
        out = []
        for name in self._io.list_names(self.bands_dir):
            if name.startswith("batch="):
                bid = int(name.split("=", 1)[1])
                if self._io.exists(
                    fsio_join(self.bands_dir, name, "_SUCCESS")
                ):
                    out.append(bid)
        return sorted(out)

    def _compacted_upto(self) -> int | None:
        """Compaction watermark: highest batch id folded into a merged
        partition (replays at or below it are refused — see compact())."""
        p = fsio_join(self.path, "_compacted_upto")
        if not self._io.exists(p):
            return None
        return int(self._io.read_text(p).strip())

    def _set_compacted_upto(self, upto: int) -> None:
        cur = self._compacted_upto()
        if cur is None or upto > cur:
            self._io.write_text(fsio_join(self.path, "_compacted_upto"), str(upto))

    def _read_part(self, base: str, upto: int) -> DataFrame:
        """Partition-discovered read of ``base`` filtered to batch <= upto
        (partition pruning keeps later/replayed batches out of the scan)."""
        return self.spark.read.parquet(base).filter(F.col("batch") <= upto)

    # -- ingest -----------------------------------------------------------

    def add_batch(
        self, docs: DataFrame, batch_id: int, return_pairs: bool = True
    ) -> DataFrame | None:
        """Index a batch; return its near-dup pairs vs everything so far.

        ``batch_id`` must be greater than every previously committed id
        (monotone ingest cursor — the streaming pipeline's micro-batch
        id) OR an already-committed id: that is the idempotent-retry /
        replay path — the write is skipped and the SAME pairs re-derive
        (the probe scans only batches <= batch_id, so a replay is blind
        to batches committed after it).
        Document ids must be new (an UPDATED document is a delete+insert
        at the dedup layer — re-ingesting an id would pair it with its
        own stale band rows); this is the caller's contract, same as
        DetectDuplicate's cache-key discipline.
        """
        upto = self._compacted_upto()
        if upto is not None and batch_id <= upto:
            # the target partition now holds the MERGED history, so a
            # "replay" of any covered id would probe the whole corpus as
            # if it were new and re-emit every historical pair — refuse,
            # like time travel past an expired snapshot
            raise ValueError(
                f"batch_id {batch_id} is at or below the compaction "
                f"watermark {upto}; compacted batches cannot be replayed"
            )
        done = self.committed_batches()
        if done and batch_id < done[-1] and batch_id not in done:
            raise ValueError(
                f"batch_id {batch_id} below committed cursor {done[-1]} "
                "and not a replay of a committed batch"
            )
        _guard_internal(docs, ["_sh", "sig", "band", "bhash", "batch"], "LshIndex")

        band_part = fsio_join(self.bands_dir, f"batch={batch_id}")
        sh_part = fsio_join(self.sh_dir, f"batch={batch_id}")
        if not self._io.exists(fsio_join(band_part, "_SUCCESS")):
            with_sig = minhash_signature(
                docs, self.text_col, self.n_hashes, self.shingle_n
            ).withColumn(
                "_sh",
                F.array_distinct(
                    F.transform(
                        shingles(F.col(self.text_col), self.shingle_n),
                        lambda s: md5_long(s),
                    )
                ),
            ).persist()  # two write actions below share one shingle+hash pass
            try:
                # shingles FIRST: the bands-side _SUCCESS is the batch's
                # commit marker (committed_batches + the skip above), so it
                # must land last — a crash between the writes then replays
                # both (overwrite mode), never leaving a committed batch
                # whose verify side is missing
                with_sig.select(self.id_col, "_sh").write.mode(
                    "overwrite"
                ).parquet(sh_part)
                band_rows(
                    with_sig, self.id_col, "sig", self.n_bands, self.rows_per_band
                ).write.mode("overwrite").parquet(band_part)
            finally:
                with_sig.unpersist()
        if not return_pairs:
            return None

        # ---- probe: new band rows vs the index scan (old ∪ this batch).
        # The new side is one micro-batch — broadcast it; the index scan
        # streams (never shuffled, never re-shingled).
        all_bands = self._read_part(self.bands_dir, batch_id)
        new_bands = self.spark.read.parquet(band_part)
        probe = F.broadcast(
            new_bands.select(
                F.col(self.id_col).alias("_nid"), "band", "bhash"
            )
        )
        hits = all_bands.join(probe, ["band", "bhash"]).filter(
            F.col(self.id_col) != F.col("_nid")
        )
        if self.max_bucket is not None:
            # probe-time quadratic-bomb guard: count the bucket over the
            # index scan restricted to probed keys, drop oversized ones
            sizes = (
                all_bands.join(
                    F.broadcast(new_bands.select("band", "bhash").distinct()),
                    ["band", "bhash"],
                )
                .groupBy("band", "bhash")
                .agg(F.count(F.lit(1)).alias("_bn"))
            )
            hits = hits.join(
                F.broadcast(sizes.filter(F.col("_bn") <= self.max_bucket)),
                ["band", "bhash"],
            )
        cand = (
            hits.select(
                F.least(F.col(self.id_col), F.col("_nid")).alias("id_a"),
                F.greatest(F.col(self.id_col), F.col("_nid")).alias("id_b"),
            )
            .filter(F.col("id_a") != F.col("id_b"))
            .distinct()
        )
        sh = self._read_part(self.sh_dir, batch_id).select(self.id_col, "_sh")
        return verify_jaccard_pairs(cand, sh, self.id_col, self.threshold)

    # -- maintenance --------------------------------------------------------

    def compact(self, upto: int | None = None, n_files: int = 8) -> int:
        """Merge the batch partitions <= ``upto`` into ONE partition.

        A thousand-batch ingest leaves a thousand small ``batch=N``
        directories per side — the probe still prunes correctly but pays
        file-listing and tiny-file overhead (the same merge-on-read debt
        LakeTable repays via ``compact_buckets``). Compaction rewrites the
        covered range as a single ``batch=<upto>`` partition of
        ``n_files`` files per side; probes and the union invariant are
        unchanged (every covered row keeps batch <= any later probe's
        cursor). Replay of batch ids AT or BELOW the compacted watermark
        becomes impossible (their partitions are merged away; the target
        id's partition now holds the whole covered history, so replaying
        it would re-probe every historical doc as new) — add_batch
        refuses them, the same trade ``expire_snapshots`` makes for time
        travel.

        Single-writer maintenance op. Crash-safe via a discovery-ignored
        ``_tmp_compact`` staging dir: the rewrite lands there first, and
        the rename of the staged partition into place is the COMMIT POINT
        — a crash between the old-partition delete and that rename is
        recovered by the next ``compact`` call (it finishes the move
        before doing anything else); once the rename has happened, the
        recovery path has nothing staged and touches nothing. Returns the
        number of batch partitions merged (0 = nothing to do).
        """
        for base in (self.bands_dir, self.sh_dir):
            tmp = fsio_join(base, "_tmp_compact")
            staged = [
                n for n in self._io.list_names(tmp) if n.startswith("batch=")
            ]
            if staged and self._io.exists(fsio_join(tmp, "_SUCCESS")):
                # prior compact crashed after staging but BEFORE the
                # commit-point rename: the marker records the covered ids
                # — delete them (idempotent whether the crash hit before
                # or mid-way through the original delete pass), then land
                # the staged partition. When nothing is staged the rename
                # already committed (the crash was before delete(tmp)) —
                # the covered list must NOT be replayed then, or it would
                # delete the live compacted partition itself.
                covered = [
                    int(x)
                    for x in self._io.read_text(
                        fsio_join(tmp, "_SUCCESS")
                    ).split(",")
                    if x
                ]
                for b in covered:
                    self._io.delete(fsio_join(base, f"batch={b}"))
                for name in staged:
                    self._io.rename_dir(fsio_join(tmp, name), fsio_join(base, name))
                if covered:
                    self._set_compacted_upto(max(covered))
            self._io.delete(tmp)

        done = self.committed_batches()
        upto = done[-1] if upto is None else upto
        merge = [b for b in done if b <= upto]
        if len(merge) < 2:
            return 0
        target = merge[-1]
        for base in (self.bands_dir, self.sh_dir):
            tmp = fsio_join(base, "_tmp_compact")
            part = fsio_join(tmp, f"batch={target}")
            (
                self.spark.read.parquet(base)
                .filter(F.col("batch") <= target)
                .drop("batch")
                .repartition(n_files)
                .write.mode("overwrite")
                .parquet(part)
            )
            self._io.write_text(
                fsio_join(tmp, "_SUCCESS"), ",".join(str(b) for b in merge)
            )
            for b in merge:
                self._io.delete(fsio_join(base, f"batch={b}"))
            self._io.rename_dir(part, fsio_join(base, f"batch={target}"))
            self._io.delete(tmp)
        self._set_compacted_upto(target)
        return len(merge)
