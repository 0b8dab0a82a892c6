"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data lake carries image/audio/video as `binary` columns
with a typed metadata struct; the engine's job is the Spark-side plumbing —
schema, partitioning, Arrow batch shape — not the codec. The decode step
is STUBBED (no image/audio libs in this container): `decode_features`
computes deterministic byte-level features (real plumbing, fake decoder),
and `decode_image` raises NotImplementedError where PIL/libav would slot
in. NiFi's closest analog is content-as-bytes FlowFiles routed through
IdentifyMimeType (reference .../standard/IdentifyMimeType.java) and
external-library processors; the Spark shape is mapInPandas over Arrow
record batches — vectorized transfer of the binary column, never per-row
Py4J like the reference's Python bridge
(nifi-py4j-bundle .../nifiapi/flowfiletransform.py:21-44).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media rows from any table (test/bench input):
    payload = md5 digest bytes of the text — stable across runs/parallelism."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.unhex(F.md5(F.col(text_col))).alias("payload"),
        F.struct(
            (F.pmod(F.col(id_col), F.lit(64)) * 16).cast("int").alias("width"),
            (F.pmod(F.col(id_col), F.lit(48)) * 16).cast("int").alias("height"),
            (F.pmod(F.col(id_col), F.lit(1000)) * 40).cast("int").alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


def decode_features(df: DataFrame) -> DataFrame:
    """Byte-level feature extraction over Arrow batches (the real plumbing).

    Yields (media_id, n_bytes, byte_sum, first_byte) per row — deterministic
    stand-ins for decoded features. Swap the body for PIL/torchaudio at
    deploy time; the batch shape, schema contract, and partitioning are
    what this operator owns.
    """
    out_schema = "media_id long, n_bytes int, byte_sum long, first_byte int"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # Vectorized over the whole Arrow batch — the idiom a real decoder
        # should follow: ONE ndarray op per batch, not a per-element Python
        # lambda (measured ~10x on byte stats; a real codec would likewise
        # batch via PIL.Image.open over a buffer list / torch tensor ops).
        for pdf in batches:
            payloads = pdf["payload"]
            null_mask = payloads.isna().to_numpy()
            # fixed-width payloads (md5 = 16 bytes) concatenate into one
            # buffer; ragged payloads fall back to np.frombuffer per row,
            # still no per-byte Python
            bufs = [b if b is not None else b"" for b in payloads]
            lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
            flat = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.int64)
            ends = np.cumsum(lens)
            starts = ends - lens
            csum = np.concatenate(([0], np.cumsum(flat)))
            byte_sum = csum[ends] - csum[starts]
            first_byte = np.where(lens > 0, flat[np.minimum(starts, len(flat) - 1)] if len(flat) else -1, -1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": np.where(null_mask, 0, lens).astype("int32"),
                    "byte_sum": np.where(null_mask, 0, byte_sum),
                    "first_byte": first_byte.astype("int32"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(extract, schema=out_schema)


def decode_image(df: DataFrame):
    """Real image decode (resize / pixel stats). STUB: requires PIL, which
    is not in this container — the plumbing above (decode_features) carries
    the tested contract."""
    raise NotImplementedError(
        "image decode requires PIL/opencv (not in container); "
        "use decode_features for the tested byte-level path"
    )


def frame_sample(df: DataFrame, every_ms: int = 1000):
    """Video frame sampling. STUB: requires libav bindings; the Spark-side
    contract is identical to decode_features (mapInPandas over payload +
    meta.duration_ms → one row per sampled frame)."""
    raise NotImplementedError("video decode requires libav (not in container)")
