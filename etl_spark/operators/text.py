"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference operators (task north star): language ID, quality scoring,
token counting, document fingerprinting. All pure Column algebra — no
Python row path — so they run inside whole-stage codegen over any corpus
size. Hash primitives use ``md5`` (stable across engines, so the DuckDB
oracle can mirror every computation exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword profiles for the n-gram/stopword heuristic.
#: Deterministic and engine-portable; a production profile would be longer
#: but identical in shape.
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit"],
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "los", "de", "que", "y", "en"],
    "fr": ["le", "la", "les", "et", "en", "que", "une"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (the cheap, codegen-friendly baseline)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-profile language ID.

    Scores each language as the fraction of tokens found in its stopword
    profile; argmax wins, ties broken by language code ascending
    (deterministic). One pass, no shuffle, no UDF.
    """
    toks = tokens(text_col)
    n = F.greatest(F.size(toks), F.lit(1))
    scores = []
    for lang, words in sorted(LANG_PROFILES.items()):
        hits = F.size(F.filter(toks, lambda t: t.isin(*words)))  # noqa: B023
        scores.append((lang, (hits / n)))
    best_val = F.greatest(*[s for _, s in scores])
    pred = F.lit(None).cast("string")
    for lang, s in reversed(scores):  # earlier langs win ties → build backwards
        pred = F.when(s == best_val, F.lit(lang)).otherwise(pred)
    out = df.withColumn(out_col, pred)
    for lang, s in scores:
        out = out.withColumn(f"score_{lang}", s)
    return out


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality features + combined score.

    Features follow the usual pretraining-filter recipe (length,
    punctuation density, stopword ratio, mean word length); the combined
    score is a fixed linear blend — the point is the distributed shape
    (single codegen stage), not the exact weights.
    """
    c = F.col(text_col)
    toks = tokens(text_col)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    mean_word_len = n_chars / F.greatest(n_tokens, F.lit(1))
    punct = F.length(F.regexp_replace(c, r"[^.!?,;:]", ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*LANG_PROFILES["en"])))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + stop_ratio * 0.3
        + (F.lit(1.0) - punct_ratio) * 0.3
    )
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality", score)
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish estimate.

    The BPE estimate uses the industry-standard ~4 chars/token heuristic
    plus a subword count from a BPE-ish regex (letter runs, digit runs,
    punctuation singletons) — all JVM-side regexp work.
    """
    c = F.col(text_col)
    ws = F.size(tokens(text_col))
    # BPE-ish pieces: greedy letter runs (max 4 chars), digit runs (max 3),
    # and punctuation singletons - one regexp_extract_all, JVM-side.
    pieces = F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]{1,4}|[0-9]{1,3}|[^A-Za-z0-9\s]"), F.lit(0)))
    est = F.ceil(F.length(c) / F.lit(4.0)).cast("long")
    return (
        df.withColumn("n_ws_tokens", ws)
        .withColumn("n_bpe_pieces", pieces)
        .withColumn("n_tokens_est", est)
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: exact-dup hash + content hash over
    normalized text (case/whitespace folded).

    ``fp_exact`` = md5(text) — byte-exact duplicate key.
    ``fp_norm``  = md5(lower + whitespace-collapsed) — robust duplicate key.
    Both are pure projections; grouping on them is the exact-dedup operator.
    """
    c = F.col(text_col)
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return df.withColumn("fp_exact", F.md5(c)).withColumn("fp_norm", F.md5(norm))
