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


# GPT-2-style pretokenizer, lookahead-free so Java (Spark) and RE2
# (DuckDB oracle) agree exactly: contractions first, then
# optional-space + letter run / digit run / punctuation run. Both
# engines use leftmost-first alternation, so the token streams are
# identical by construction.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_tokens(col: Column) -> Column:
    """BPE-ish pretokenization: the GPT-2 pretokenizer split (without
    the trailing-whitespace lookahead RE2 lacks). Subword merging is a
    vocabulary lookup the trainer owns; the PRE-token count is what a
    data pipeline budgets with, and it tracks real BPE token counts
    within a small constant factor."""
    return F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_RE), 0)


def bpe_token_count(
    df: DataFrame, text_col: str = "text", out_col: str = "n_bpe_tokens"
) -> DataFrame:
    """BPE-ish pretoken count per document — the second half of the
    token-counting pair (whitespace :func:`token_count` is the
    oracle-stable core; this is the loader-budget estimate). Pure
    column expression, no shuffle."""
    return df.withColumn(out_col, F.size(bpe_tokens(F.col(text_col))))


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


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1
    repetition filters — the training-data analog of NiFi's content-quality
    routing).

    Columns: ``n_tokens_r``, ``dup_token_frac`` (1 − distinct/total tokens,
    shuffle-free array op), and ``top{n}_frac`` for each n in ``gram_ns`` —
    the fraction of tokens covered by the single most frequent n-gram
    (max-count × n / n_tokens).

    Scale shape: the n-gram leg is explode → count → per-doc max — two
    keyed shuffles over grams, the standard distributed word-count shape;
    grams never collect to one node. Documents shorter than n contribute
    no grams and get 0.0.
    """
    toks = tokens(F.col(text_col))
    base = (
        df.select(F.col(id_col), toks.alias("_tk"))
        .withColumn("n_tokens_r", F.size("_tk"))
        .withColumn(
            "dup_token_frac",
            F.round(F.lit(1.0) - F.size(F.array_distinct("_tk")) / F.size("_tk"), 4),
        )
    )
    # NB: the per-n lambda must take exactly ONE argument — a two-arg
    # signature (e.g. the `lambda i, n=n` closure idiom) makes F.transform
    # pass (element, index) and silently binds n to the array index.
    def _gram_at(n: int):
        return lambda i: F.struct(
            F.lit(n).alias("n"),
            F.array_join(F.slice(F.col("_tk"), i, n), " ").alias("gram"),
        )

    gram_arrays = []
    for n in gram_ns:
        starts = F.when(
            F.size("_tk") >= n, F.sequence(F.lit(1), F.size("_tk") - n + 1)
        ).otherwise(F.array().cast("array<int>"))
        gram_arrays.append(F.transform(starts, _gram_at(n)))
    # n_tokens_r deliberately does NOT ride the gram leg: a non-attribute
    # column selected next to an explode lands in the Project above the
    # Generate, where Catalyst re-evaluates its token-split per GRAM row.
    # It is functionally dependent on id_col and rejoins from `base` below.
    grams = base.select(
        id_col, F.explode(F.flatten(F.array(*gram_arrays))).alias("_g")
    ).select(id_col, F.col("_g.n").alias("n"), F.col("_g.gram").alias("gram"))
    top = (
        grams.groupBy(id_col, "n", "gram")
        .count()
        .groupBy(id_col)
        .pivot("n", list(gram_ns))
        .agg(F.max("count"))
    )
    out = base.select(id_col, "n_tokens_r", "dup_token_frac").join(
        top.select(
            id_col,
            *[F.col(str(n)).alias(f"_top{n}") for n in gram_ns],
        ),
        on=id_col,
        how="left",
    )
    for n in gram_ns:
        out = out.withColumn(
            f"top{n}_frac",
            F.round(
                F.coalesce(F.col(f"_top{n}") * n / F.col("n_tokens_r"), F.lit(0.0)), 4
            ),
        ).drop(f"_top{n}")
    return out


# PII patterns — alternation-free so Java (Spark) and RE2 (DuckDB oracle)
# regex engines agree on every match span; replacement order matters
# (emails contain dots and digits, so they redact before IP/phone).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+\d{1,2} \d{3}-\d{3}-\d{4}", "[PHONE]"),
]


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII spans and count them per document — the pretraining-
    pipeline scrub stage (and the engine analog of NiFi ReplaceText with
    sensitive-pattern dictionaries).

    Adds ``n_{kind}`` counts (matches BEFORE redaction) and
    ``{text_col}_redacted`` with every match replaced by its placeholder.
    Pure JVM regexp — one codegen'd projection, shuffle-free.
    """
    c = F.col(text_col)
    out = df
    for kind, pat, _ in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}", F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        )
    red = c
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl.replace("$", r"\$"))
    return out.withColumn(f"{text_col}_redacted", red)


def normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str = "norm_text"
) -> DataFrame:
    """Canonical text normalization: lowercase, strip everything but
    letters/digits/whitespace (unicode classes), collapse whitespace, trim.
    Adds ``{out_col}`` and ``{out_col}_hash`` (md5) for downstream exact
    dedup on the normalized form. One codegen'd projection.
    """
    c = F.lower(F.col(text_col))
    c = F.regexp_replace(c, r"[^\p{L}\p{N}\s]", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out_col, c).withColumn(f"{out_col}_hash", F.md5(c))


_URL_RE = r"https?://[^\s]+"
_URL_HOST_RE = r"^https?://([^/?#\s]+)"
_URL_PATH_RE = r"^https?://[^/?#\s]+([^?#\s]*)"


def extract_urls(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Extract every URL with parsed host and path — link-graph /
    URL-dedup feedstock. One row per (doc, url occurrence); JVM
    regexp_extract_all → posexplode, shuffle-free.
    """
    urls = F.regexp_extract_all(F.col(text_col), F.lit(_URL_RE), F.lit(0))
    return (
        df.select(F.col(id_col), F.posexplode(urls).alias("url_idx", "url"))
        .withColumn("host", F.regexp_extract("url", _URL_HOST_RE, 1))
        .withColumn("path", F.regexp_extract("url", _URL_PATH_RE, 1))
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_len: int = 2,
) -> DataFrame:
    """Top-k salient terms per document by tf·idf — keyword extraction /
    topic signals for a training-data pipeline (beyond the reference's
    operator set; its users run this downstream of ConvertRecord).

    Terms are lowercase alphabetic tokens of length ≥ ``min_len``; the
    salience score orders by ``tf / df`` (idf is monotone-decreasing in
    document frequency, so the ranking equals tf·idf's without a
    transcendental — tf/df of small ints is IEEE-exact and therefore
    bit-identical across engines, which keeps the oracle hash applicable).
    Ties break on the term itself.

    Output: ``id_col, term, tf, df, rank`` (1..k).

    Scale shape: explode tokens (O(total tokens), shuffle-free) → one
    hash agg per (doc, term) for tf → one hash agg per term for df
    (partial+final map-side combine) → keyed join on term → per-doc
    window top-k. No cross joins, no Python; the vocabulary agg is the
    widest shuffle and it's bounded by distinct terms, not tokens.
    """
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z]+"),
        lambda t: F.length(t) >= min_len,
    )
    exploded = df.select(F.col(id_col), F.explode(toks).alias("term"))
    tf = exploded.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, on="term").withColumn(
        "score", F.col("tf").cast("double") / F.col("df").cast("double")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "rank")
    )
