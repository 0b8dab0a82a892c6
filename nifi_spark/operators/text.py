"""Text-analysis operators for training-data pipelines over `documents`.

Beyond the reference's operator set (tasked as first-class additions):
language ID, quality scoring, token counting, document fingerprinting.
All are pure column expressions — JVM-side, codegen'd, shuffle-free —
because at 100 TB a per-row Python pass over text is the bottleneck.

Every function is deterministic and exactly re-expressible in ANSI SQL
(the DuckDB oracle mirrors them term for term), so the driver's
value-hash gate applies to these too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Language marker tokens (tiny stopword sets — the n-gram-heuristic
# language-ID approach reduced to its deterministic core; real corpora
# would use character n-gram profiles, same plumbing).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
}

STOPWORDS_EN = ["the", "a", "of", "to", "and", "in", "is", "it"]

_WS = r"\s+"


def tokens(col: Column) -> Column:
    """Whitespace tokenization (the BPE-ish regex path uses split on
    punctuation boundaries; whitespace is the oracle-stable core)."""
    return F.split(F.trim(col), _WS)


def token_count(df: DataFrame, text_col: str = "text", out_col: str = "n_tokens") -> DataFrame:
    """Whitespace token count per document."""
    return df.withColumn(out_col, F.size(tokens(F.col(text_col))))


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))


def language_id(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Heuristic language ID: argmax of marker-token hits, 'und' if none.

    Ties break by language code order (deterministic). Non-Latin scripts
    (zh etc.) fall out as 'und' with this marker set — by design: the
    heuristic abstains rather than guesses.
    """
    toks = tokens(F.col(text_col))
    scored = F.array(
        *[
            F.struct(_marker_hits(toks, m).alias("hits"), F.lit(lang).alias("lang"))
            for lang, m in LANG_MARKERS.items()
        ]
    )
    best = F.array_max(F.filter(scored, lambda s: s["hits"] > 0))
    # array_max on struct orders by (hits, lang) — lexicographically larger
    # lang wins ties; invert lang for asc tie-break is overkill here, ties
    # are broken deterministically either way.
    return df.withColumn(out_col, F.coalesce(best["lang"], F.lit("und")))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality features + composite score.

    Columns: n_chars_q, n_tokens_q, mean_token_len, stopword_ratio,
    alpha_ratio, q_score ∈ [0,1]. The composite mirrors common pretraining
    filters (length band + stopword floor + alphabetic floor).
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    mean_tok = (n_chars - (n_tok - 1)) / n_tok  # chars net of single separators
    stop_ratio = n_stop / n_tok
    alpha_ratio = n_alpha / n_chars
    score = (
        F.when(n_tok < 5, F.lit(0.0)).otherwise(
            F.least(F.lit(1.0), n_tok / F.lit(64.0)) * 0.4
            + F.least(F.lit(1.0), stop_ratio * 4) * 0.3
            + alpha_ratio * 0.3
        )
    )
    return df.withColumns(
        {
            "n_tokens_q": n_tok,
            "mean_token_len": F.round(mean_tok, 4),
            "stopword_ratio": F.round(stop_ratio, 4),
            "alpha_ratio": F.round(alpha_ratio, 4),
            "q_score": F.round(score, 4),
        }
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", out_col: str = "fp", mod: int = 1_000_000_007
) -> DataFrame:
    """Polynomial rolling-hash fingerprint of the token stream.

    fp = fold(tokens, h -> (h*31 + len(token)*131 + first_char_code) % mod)
    — a deterministic content fingerprint usable for shift-stable grouping
    (unlike md5-of-text it survives token re-joining). Computed with
    F.aggregate (JVM fold over the token array, no Python).
    """
    toks = tokens(F.col(text_col))
    fp = F.aggregate(
        toks,
        F.lit(7).cast("long"),
        lambda acc, t: (acc * 31 + F.length(t) * 131 + F.ascii(t)) % mod,
    )
    return df.withColumn(out_col, fp)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 256,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into token-window chunks with overlap — the
    training-data chunking stage (context-window packing / RAG splitting).

    Windows of ``max_tokens`` whitespace tokens slide by
    ``max_tokens − overlap``; the final window may be shorter. Pure JVM:
    split → sequence of window starts → transform(slice + array_join) →
    posexplode — shuffle-free, one row per chunk. Output columns:
    ``{id_col}, chunk_idx, chunk_text, chunk_tokens``.

    Oracle-exact: every step is ANSI-expressible (DuckDB mirrors it with
    range + list slicing term for term).
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    step = max_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.array_join(F.slice(toks, s + 1, max_tokens), " ").alias("t"),
            F.least(F.lit(max_tokens), n - s).cast("int").alias("k"),
        ),
    )
    keep = [c for c in df.columns if c == id_col]
    return df.select(
        *keep, F.posexplode(chunks).alias("chunk_idx", "_c")
    ).select(
        *keep,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("_c.t").alias("chunk_text"),
        F.col("_c.k").alias("chunk_tokens"),
    )
