"""Transcript operators: per-conversation SFT shaping over turn rows.

The engine's payload is multi-turn conversation / agent transcripts
keyed by (conv_id, turn_idx). Once the CDC apply has folded the change
feed into per-turn rows, the training pipeline consumes them through
four conversation-level stages, each here as a first-class operator:

- :func:`assemble_transcripts` — one rendered SAMPLE per conversation
  (turns in stable order, counters, deterministic train/val split).
- :func:`truncate_context` — context-window truncation: keep the
  longest SUFFIX of turns that fits a token budget (what a trainer
  does when a conversation exceeds the model's context).
- :func:`validate_turns` — role-protocol audit per conversation
  (first-role check, consecutive-same-role repeats, turn-index gaps)
  — the ValidateRecord counterpart at conversation granularity.
- :func:`preference_pairs` — DPO/RLHF pair assembly: for every
  (conversation, turn) with multiple candidate responses, emit the
  (chosen, rejected) pair by score with deterministic tiebreaks.
- :func:`sft_loss_spans` — per-turn character spans inside the
  rendered transcript (offset-compatible with the assembler's render)
  plus the trainable flag, for loss masking.
- :func:`best_of_n` — rejection sampling: per (conversation, turn)
  keep only the single highest-scoring candidate response, optionally
  gated on a minimum score (the filter stage upstream of
  :func:`preference_pairs`' pair stage).

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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nifi_spark.operators.dedup_fuzzy import _guard_internal, md5_long
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
    max_group_rows: int | None = None,
    max_group_bytes: int | None = None,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """One SFT sample per conversation, in ONE hash aggregate.

    Output: (conv_col, transcript, n_turns, n_tool_turns, total_tokens,
    split). ``transcript`` renders turns as ``role: text`` joined by
    ``sep`` in (turn_idx, role, text) order — the tiebreak makes the
    render deterministic even if turn_idx ever collides upstream.
    ``split`` is 'train' iff md5_rank(split_tag|conv) < train_frac of
    the 60-bit hash space — replay-stable and shuffle-free.

    With ``max_group_rows`` / ``max_group_bytes`` set, pathological
    conversations are routed out BEFORE their turns are collected (≙
    MergeContent max-entries/size, MergeContent.java:115-127) and the
    return becomes ``(samples, overflow)`` — see
    binning.split_oversized_groups for the overflow (DLQ) shape.
    """
    if not 0.0 < train_frac <= 1.0:
        raise ValueError(f"train_frac must be in (0, 1], got {train_frac}")
    overflow = None
    if max_group_rows is not None or max_group_bytes is not None:
        from .binning import split_oversized_groups

        turns, overflow = split_oversized_groups(
            turns, conv_col, text_col, max_group_rows, max_group_bytes
        )
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
    out = out.withColumn(
        "split",
        F.when(rank < F.lit(int(train_frac * _SCALE)), "train").otherwise("val"),
    )
    return out if overflow is None else (out, overflow)


def sft_loss_spans(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
    train_roles: tuple[str, ...] = ("assistant",),
) -> DataFrame:
    """Per-turn character spans inside the rendered transcript, for
    loss masking.

    An SFT loader trains only on the model-authored spans of the packed
    sample; this operator emits, for every turn, the ``[span_start,
    span_end)`` character offsets its ``role: text`` piece occupies in
    :func:`assemble_transcripts`'s render (same ``role: text`` template,
    same ``sep``, same (turn_idx, role, text) order — the two operators
    are offset-compatible by construction), plus ``trainable`` (role in
    ``train_roles``). Offsets are 0-based; ``span_end`` excludes the
    separator.

    Output: ``(conv_col, turn_col, role_col, span_start, span_end,
    trainable)``.

    Plan: one window per conversation — the exclusive prefix sum of
    rendered piece lengths — a single hash exchange on conv_id, same
    scale shape as the assembler's hash aggregate.
    """
    _guard_internal(
        turns, ["_piece_len", "span_start", "span_end", "trainable"],
        "sft_loss_spans",
    )
    piece_len = (
        F.length(F.col(role_col).cast("string"))
        + F.lit(2)
        + F.length(F.col(text_col).cast("string"))
    ).cast("long")
    w = (
        Window.partitionBy(conv_col)
        .orderBy(turn_col, role_col, text_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exclusive prefix of (piece + sep) lengths = this piece's offset
    start = F.sum(piece_len + F.lit(len(sep))).over(w) - (piece_len + F.lit(len(sep)))
    return turns.select(
        conv_col,
        turn_col,
        F.col(role_col).cast("string").alias(role_col),
        start.alias("span_start"),
        (start + piece_len).alias("span_end"),
        F.col(role_col).cast("string").isin(*train_roles).alias("trainable"),
    )


def truncate_context(
    turns: DataFrame,
    budget: int,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
    keep_all: bool = True,
) -> DataFrame:
    """Context-window truncation: keep the longest SUFFIX of each
    conversation whose total whitespace-token count fits ``budget``.

    The standard trainer-side rule when a conversation exceeds the
    model's context: drop the OLDEST turns, never the newest, and never
    split a turn. The most recent turn is always kept even if it alone
    exceeds the budget (the loader then hard-truncates tokens; this
    operator's contract is turn-granular).

    Output: ``(conv_col, turn_col, n_tokens, kept)`` — every input turn
    with its token count and the keep decision (``keep_all=False``
    returns only the kept rows, the pipeline shape; the total form is
    the audit/oracle shape).

    Plan: ONE window per conversation — the reverse running token sum
    ``sum(n_tokens) over (partition by conv order by turn desc)`` — so
    the whole operator is a single hash exchange on conv_id; groups are
    conversation-bounded (thousands of turns at most), no skew risk at
    10^10 turns. ≙ the truncation step NiFi flows push into scripts;
    no reference processor covers it (cited gap: MergeContent.java
    bins by size but cannot take a suffix in turn order).
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    _guard_internal(turns, ["n_tokens", "_rev_cum", "_rn", "kept"], "truncate_context")
    with_n = turns.select(
        conv_col,
        turn_col,
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(turn_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rev_cum = F.sum("n_tokens").over(w)
    rn = F.row_number().over(Window.partitionBy(conv_col).orderBy(F.col(turn_col).desc()))
    out = with_n.select(
        conv_col,
        turn_col,
        "n_tokens",
        ((rev_cum <= F.lit(budget)) | (rn == 1)).alias("kept"),
    )
    return out if keep_all else out.filter(F.col("kept")).drop("kept")


def validate_turns(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    allowed_first: tuple[str, ...] = ("system", "user"),
) -> DataFrame:
    """Role-protocol audit, one row per conversation.

    Checks the invariants an SFT loader assumes of a transcript:

    - ``starts_ok`` — the first turn's role is in ``allowed_first``
    - ``n_role_repeats`` — count of consecutive same-role turns (a
      well-formed chat alternates; repeats mark merge/ordering bugs)
    - ``n_gaps`` — count of non-contiguous turn_idx steps (missing or
      duplicated turns upstream)
    - ``valid`` — all of the above clean

    ≙ ValidateRecord (ValidateRecord.java routes row-level schema
    violations) lifted to conversation granularity, which the reference
    cannot express without a scripted processor.

    Plan: one hash exchange on conv_id shared by the lag window and the
    final per-conversation aggregate (same partitioning key, Catalyst
    reuses the exchange); no join, no second shuffle.
    """
    _guard_internal(
        turns, ["_prev_role", "_prev_turn", "_first_role"], "validate_turns"
    )
    # role tiebreak: duplicate turn indexes (an upstream bug this audit
    # exists to surface) must not make the lag/first picks run-dependent
    w = Window.partitionBy(conv_col).orderBy(turn_col, role_col)
    flagged = turns.select(
        conv_col,
        F.col(turn_col).cast("long").alias(turn_col),
        F.col(role_col).cast("string").alias(role_col),
    ).select(
        conv_col,
        turn_col,
        role_col,
        F.lag(role_col).over(w).alias("_prev_role"),
        F.lag(turn_col).over(w).alias("_prev_turn"),
        F.first(role_col).over(w).alias("_first_role"),
    )
    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    agg = flagged.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(
            F.when(F.col("_prev_role") == F.col(role_col), one).otherwise(zero)
        ).alias("n_role_repeats"),
        F.sum(
            F.when(
                F.col("_prev_turn").isNotNull()
                & (F.col(turn_col) != F.col("_prev_turn") + 1),
                one,
            ).otherwise(zero)
        ).alias("n_gaps"),
        F.first("_first_role").alias("_first_role"),
    )
    starts_ok = F.col("_first_role").isin(*allowed_first)
    return agg.select(
        conv_col,
        "n_turns",
        "n_role_repeats",
        "n_gaps",
        starts_ok.alias("starts_ok"),
        (
            starts_ok & (F.col("n_role_repeats") == 0) & (F.col("n_gaps") == 0)
        ).alias("valid"),
    )


def preference_pairs(
    cands: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    cand_col: str = "cand_id",
    text_col: str = "text",
    score_col: str = "score",
) -> DataFrame:
    """DPO/RLHF preference-pair assembly: for each (conversation, turn)
    holding >= 2 candidate responses, emit ONE (chosen, rejected) pair.

    chosen = highest ``score_col`` (ties -> smallest ``cand_col``);
    rejected = lowest score (ties -> largest ``cand_col``) — fully
    deterministic, so the pair set is replay-stable and value-checkable
    cross-engine. Groups with a single candidate are dropped (no pair).

    Output: ``(conv_col, turn_col, chosen_id, rejected_id, chosen_text,
    rejected_text, margin)`` with ``margin = chosen.score -
    rejected.score`` (0 margin pairs are kept — filtering is the
    caller's policy).

    Plan: both extreme picks ride the SAME hash exchange on
    (conv, turn): two row_number windows over opposite orderings, then
    a groupBy on the identical key folds the two flagged rows into one
    pair row — Catalyst reuses the single exchange for all three, so
    the operator is one shuffle at any corpus size. Candidate counts
    per turn are bounded (k response samples), so no skew. ≙ the
    best-of-k selection NiFi flows approximate with EnforceOrder +
    RouteOnAttribute per flowfile group; no reference processor pairs
    records within a group.
    """
    _guard_internal(cands, ["_rn_c", "_rn_r", "_n"], "preference_pairs")
    w = Window.partitionBy(conv_col, turn_col)
    flagged = cands.select(
        conv_col,
        turn_col,
        F.col(cand_col).alias(cand_col),
        F.col(text_col).cast("string").alias(text_col),
        F.col(score_col).alias(score_col),
        F.row_number()
        .over(w.orderBy(F.col(score_col).desc(), F.col(cand_col).asc()))
        .alias("_rn_c"),
        F.row_number()
        .over(w.orderBy(F.col(score_col).asc(), F.col(cand_col).desc()))
        .alias("_rn_r"),
        F.count(F.lit(1)).over(w).alias("_n"),
    ).filter(F.col("_n") >= 2)
    pick = lambda rn: F.max(  # noqa: E731 — one flagged row per group
        F.when(
            F.col(rn) == 1,
            F.struct(
                F.col(cand_col).alias("i"),
                F.col(text_col).alias("t"),
                F.col(score_col).alias("s"),
            ),
        )
    )
    return (
        flagged.groupBy(conv_col, turn_col)
        .agg(pick("_rn_c").alias("_c"), pick("_rn_r").alias("_r"))
        .select(
            conv_col,
            turn_col,
            F.col("_c.i").alias("chosen_id"),
            F.col("_r.i").alias("rejected_id"),
            F.col("_c.t").alias("chosen_text"),
            F.col("_r.t").alias("rejected_text"),
            (F.col("_c.s") - F.col("_r.s")).alias("margin"),
        )
    )


def best_of_n(
    cands: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    cand_col: str = "cand_id",
    text_col: str = "text",
    score_col: str = "score",
    min_score: float | None = None,
) -> DataFrame:
    """Rejection sampling / best-of-n selection: per (conversation,
    turn), keep ONLY the highest-scoring candidate response (ties ->
    smallest ``cand_col``), optionally requiring ``score >= min_score``.

    The standard RLHF-data filter stage: sample n responses, score with
    a reward model, train on the winner. Deterministic tiebreaks make
    the kept set replay-stable and value-checkable cross-engine.
    Complements :func:`preference_pairs` (which keeps a winner AND a
    loser): best-of-n is the SFT-style distillation shape, pairs the
    DPO shape.

    Output: ``(conv_col, turn_col, cand_col, text_col, score_col,
    n_cands)`` — one row per surviving group; ``n_cands`` counts ALL
    candidates in the group (pre-threshold), the audit column a
    sampling report needs.

    Plan: one row_number window and the group count share a single hash
    exchange on (conv, turn); the threshold is a residual filter on the
    winner row only. Candidate counts per turn are bounded (k sampled
    responses), so no skew at 10^10 turns.
    """
    _guard_internal(cands, ["_rn_b", "n_cands"], "best_of_n")
    w = Window.partitionBy(conv_col, turn_col)
    out = cands.select(
        conv_col,
        turn_col,
        cand_col,
        F.col(text_col).cast("string").alias(text_col),
        score_col,
        F.row_number()
        .over(w.orderBy(F.col(score_col).desc(), F.col(cand_col).asc()))
        .alias("_rn_b"),
        F.count(F.lit(1)).over(w).alias("n_cands"),
    ).filter(F.col("_rn_b") == 1).drop("_rn_b")
    if min_score is not None:
        out = out.filter(F.col(score_col) >= F.lit(min_score))
    return out
