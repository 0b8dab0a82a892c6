"""Transcript assembly: per-conversation SFT samples in one aggregate.

The engine's payload is multi-turn conversation / agent transcripts
keyed by (conv_id, turn_idx). Once the CDC apply has folded the change
feed into per-turn rows, the training pipeline consumes them one
SAMPLE per conversation: turns rendered in stable turn order with a
role template, plus the counters (turns, tool calls, tokens) and a
deterministic train/val split every SFT data loader wants up front.

≙ MergeRecord with a correlation attribute (reference
MergeContent.java:115-127) followed by UpdateRecord for the counters —
here it is ONE hash aggregate: collect_list of a packed struct
(map-side partials), array_sort + transform + array_join to render.
No window, no join, one exchange on conv_id. The split rides a 60-bit
md5 rank of the conv id (bit-identical in the DuckDB oracle), so the
whole conversation lands on one side of the split by construction —
the cross-turn leakage bug this shape exists to prevent.

Scale (10^10 turns): a hash aggregate with partial aggregation; a
conversation's turns must fit one reducer's group, which holds for
transcripts (turns/conv is bounded, thousands at most). For event-time
sessionization of un-keyed streams see
:func:`nifi_spark.operators.aggregate.sessionize`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nifi_spark.operators.dedup_fuzzy import md5_long
from nifi_spark.operators.text import tokens

_SCALE = 1 << 60  # md5_long's domain: first 15 hex chars = 60 bits


def assemble_transcripts(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str | None = "tool",
    sep: str = "\n",
    train_frac: float = 0.9,
    split_tag: str = "split",
) -> DataFrame:
    """One SFT sample per conversation, in ONE hash aggregate.

    Output: (conv_col, transcript, n_turns, n_tool_turns, total_tokens,
    split). ``transcript`` renders turns as ``role: text`` joined by
    ``sep`` in (turn_idx, role, text) order — the tiebreak makes the
    render deterministic even if turn_idx ever collides upstream.
    ``split`` is 'train' iff md5_rank(split_tag|conv) < train_frac of
    the 60-bit hash space — replay-stable and shuffle-free.
    """
    if not 0.0 < train_frac <= 1.0:
        raise ValueError(f"train_frac must be in (0, 1], got {train_frac}")
    packed = F.struct(
        F.col(turn_col).alias("i"),
        F.col(role_col).cast("string").alias("r"),
        F.col(text_col).cast("string").alias("t"),
    )
    rendered = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(packed)),
            lambda s: F.concat(s["r"], F.lit(": "), s["t"]),
        ),
        sep,
    )
    tool_turns = (
        F.sum(F.when(F.col(tool_col).isNotNull(), 1).otherwise(0))
        if tool_col
        else F.lit(0)
    )
    out = turns.groupBy(conv_col).agg(
        rendered.alias("transcript"),
        F.count("*").alias("n_turns"),
        tool_turns.cast("long").alias("n_tool_turns"),
        F.sum(F.size(tokens(F.col(text_col)))).alias("total_tokens"),
    )
    rank = md5_long(F.concat(F.lit(split_tag + "|"), F.col(conv_col).cast("string")))
    return out.withColumn(
        "split",
        F.when(rank < F.lit(int(train_frac * _SCALE)), "train").otherwise("val"),
    )
