"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

All pure Column expressions (codegen'd, no UDFs): at 100 TB these run
inside the scan stage with zero extra shuffles (the only shuffle is
whatever aggregation the caller adds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import word_shingles

# tiny marker vocabularies for the deterministic n-gram language heuristic;
# ties break lexicographically by language code.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["agg", "vector", "window", "schnell"],
    "en": ["the", "a", "fast", "key"],
    "es": ["data", "stream", "grande"],
    "fr": ["line", "petit", "order"],
    "zh": ["big", "join", "merge"],
}

STOPWORDS = ["the", "a", "row", "scan", "table", "join", "data"]


def token_count(text: Column) -> Column:
    """Whitespace token count (single-space normalized input)."""
    return F.size(F.split(text, " "))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-ish proxy: word-piece count where words longer than 4 chars
    count ceil(len/4) pieces — a deterministic, SQL-portable stand-in for
    subword tokenizers (real BPE vocabularies are model assets, not
    engine code)."""
    words = F.split(text, " ")
    return F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"),
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token stats + quality score.

    quality = lexical diversity x stopword coverage, the standard cheap
    heuristic family (length/stopword ratios).
    Returns (id, n_tokens, n_unique, uniq_ratio, stop_hits, n_pieces, quality).
    """
    words = F.split(F.col(text_col), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    df2 = df.select(
        F.col(id_col),
        F.size(words).alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_unique"),
        F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w))).alias(
            "stop_hits"
        ),
        bpe_ish_token_count(F.col(text_col)).alias("n_pieces"),
    )
    return df2.select(
        id_col,
        "n_tokens",
        "n_unique",
        F.round(F.col("n_unique") / F.col("n_tokens"), 6).alias("uniq_ratio"),
        "stop_hits",
        "n_pieces",
        F.round(
            (F.col("n_unique") / F.col("n_tokens"))
            * (F.lit(1.0) - F.col("stop_hits") / F.col("n_tokens")),
            6,
        ).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic marker-token language heuristic.

    Scores each language by marker hit count over the token multiset;
    argmax with lexicographic tie-break. Pure expressions: the score
    array is built with `filter`+`size` per language, argmax via
    `array_position` on the max score.
    Returns (id, pred_lang, score).
    """
    words = F.split(F.col(text_col), " ")
    langs = sorted(LANG_MARKERS)
    score_cols = []
    for lang in langs:
        marr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        score_cols.append(
            F.size(F.filter(words, lambda w: F.array_contains(marr, w))).alias(
                f"score_{lang}"
            )
        )
    scored = df.select(F.col(id_col), F.col(text_col), *score_cols)
    scores = F.array(*[F.col(f"score_{lang}") for lang in langs])
    best = F.array_max(scores)
    # array_position returns the 1-based first index == lexicographically
    # smallest language because `langs` is sorted
    pred = F.element_at(
        F.array(*[F.lit(lang) for lang in langs]), F.array_position(scores, best).cast("int")
    )
    return scored.select(
        id_col, pred.alias("pred_lang"), best.cast("int").alias("score")
    )


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    keep: int = 4,
) -> DataFrame:
    """Document fingerprint: md5 over the `keep` lexicographically smallest
    shingle hashes (a winnowing-style min-k sketch; rolling-hash analog
    with a portable hash family). Returns (id, fingerprint)."""
    sh = word_shingles(F.col(text_col), shingle_n)
    hashes = F.array_sort(F.transform(sh, F.md5))
    sk = F.slice(hashes, 1, keep)
    return df.select(
        F.col(id_col), F.md5(F.concat_ws("|", sk)).alias("fingerprint")
    )


def quota_sample(
    df: DataFrame,
    group_col: str = "source",
    n_per_group: int = 30,
    id_col: str = "doc_id",
    salt: str = "quota",
) -> DataFrame:
    """Deterministic stratified quota sampling: keep at most
    `n_per_group` rows per group, chosen by a salted-hash order — the
    standard curation cap ("no domain dominates the training mix").

    The order key is md5(salt || id): uniform, reproducible, and
    engine-portable (Spark and DuckDB produce identical lowercase hex,
    so the driver oracle re-derives the exact same sample). One
    row_number window per group — at 100 TB the heavy groups are the
    point (that's what the cap is FOR), and rank-until-n is the
    cheapest formulation: Catalyst's WindowGroupLimit pushes the
    rank <= n cut below the shuffle, so each map task emits at most n
    rows per group it sees before the exchange.

    Changing `salt` re-draws the sample without touching the data —
    the knob a curation pipeline turns between mixture versions."""
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


def token_histogram(
    df: DataFrame,
    text_col: str = "text",
    group_col: str | None = "source",
    bucket_width: int = 8,
) -> DataFrame:
    """Token-length histogram per group: (group, bucket, n_docs) where
    bucket = floor(token_count / bucket_width) — the dataset-shape
    report every curation run starts from (truncation/padding budgets,
    outlier detection). Pure codegen expressions + one partial-agg
    shuffle on (group, bucket) — a tiny key space however large the
    corpus."""
    toks = F.size(F.split(F.col(text_col), " "))
    bucket = F.floor(toks / F.lit(bucket_width)).cast("int")
    keys = ([F.col(group_col)] if group_col else []) + [bucket.alias("bucket")]
    return (
        df.groupBy(*keys)
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )
