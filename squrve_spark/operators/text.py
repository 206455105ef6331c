"""Text analysis operators over a document corpus.

Everything here is pyspark.sql.functions built-ins (whole-stage codegen, no
Python in the executor hot path) so the same semantics are expressible as the
DuckDB oracle SQL in plans/pipeline.py. At 100 TB these are embarrassingly
parallel map-side projections — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from squrve_spark.catalog import spread

# Small multilingual stopword/marker lists for the heuristic operators.
STOPWORDS_EN = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "for"]

# language -> high-frequency marker words (n-gram-free heuristic languages ID;
# scores are marker hit counts over the token stream).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "que"],
    "es": ["el", "los", "las", "es", "una", "que", "por"],
}


def tokens_expr(text_col: str = "text") -> Column:
    """Whitespace tokenization of trimmed text (empty string -> ['']))."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tokens", tokens_expr(text_col))


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate (regex pieces of
    letters / digits / single punctuation, ~GPT-2 pretokenizer shape)."""
    df = spread(df)
    return df.select(
        "doc_id",
        F.size(tokens_expr(text_col)).alias("n_tokens"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
        ).alias("n_pieces"),
        F.length(F.col(text_col)).alias("n_chars_obs"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: length, mean token length, stopword ratio,
    punctuation ratio, all-caps ratio. Mirrors C4/Gopher-style filters."""
    # tokens materialized once: multiple metrics reference the array, and
    # Spark won't share the split() subtree between expressions
    staged = spread(df).withColumn("_toks", tokens_expr(text_col))
    toks = F.col("_toks")
    n_tok = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, n: acc + n
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"([^A-Za-z0-9_\s])"), 1))
    n_chars = F.length(F.col(text_col))
    return staged.select(
        "doc_id",
        n_chars.alias("n_chars_obs"),
        n_tok.alias("n_tokens"),
        F.round(tok_chars / n_tok, 4).cast("double").alias("avg_token_len"),
        F.round(n_stop / n_tok, 4).cast("double").alias("stopword_ratio"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).cast("double").alias("punct_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: score each language by marker hits over the
    token stream, argmax with deterministic tie-break (score desc, lang asc);
    'und' (undetermined) when nothing matches."""
    # stage: tokens -> per-lang score columns -> argmax. Each stage is a
    # materialized projection so score expressions are computed once, not
    # re-inlined into every CASE branch.
    staged = spread(df).withColumn(
        "_toks_low", F.transform(tokens_expr(text_col), lambda t: F.lower(t))
    )
    langs = sorted(LANG_MARKERS)
    for lang in langs:
        marr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        staged = staged.withColumn(
            f"_s_{lang}",
            F.size(F.filter(F.col("_toks_low"), lambda t: F.array_contains(marr, t))),
        )
    staged = staged.withColumn("_best", F.greatest(*[F.col(f"_s_{lang}") for lang in langs]))
    pred = F.lit("und")
    for lang in reversed(langs):  # build CASE so earliest lang wins ties
        pred = F.when(
            (F.col(f"_s_{lang}") == F.col("_best")) & (F.col("_best") > 0), F.lit(lang)
        ).otherwise(pred)
    return staged.select("doc_id", pred.alias("pred_lang"), F.col("_best").alias("marker_hits"))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical document fingerprint: md5 over lowercase,
    whitespace-collapsed text — the exact-dedup key at scale (128-bit, no
    birthday collisions at 10^12 docs)."""
    canon = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return spread(df).select(
        "doc_id",
        F.md5(canon).alias("fp_md5"),
        F.length(canon).alias("canon_len"),
    )


# --------------------------------------------------------------------------
# PII scrubbing — corpus hygiene before training. All patterns run as JVM
# regexp_replace chains inside one codegen stage: zero shuffles, zero Python,
# linear scan — the only shape that works on a 100 TB text column.
# Pattern order matters: credit cards before generic phone shapes (16-digit
# groups would otherwise half-match as phones), emails before bare domains.
# --------------------------------------------------------------------------

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("credit_card", r"\b(?:\d[ -]?){13,16}\b", "<CARD>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"(?:\+?\d{1,2}[ .-])?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def mask_pii(df: DataFrame, text_col: str = "text", out_col: str | None = None) -> DataFrame:
    """Replace PII spans with typed placeholder tokens (in place unless
    ``out_col`` names a new column)."""
    expr = F.col(text_col)
    for _, pattern, repl in PII_PATTERNS:
        expr = F.regexp_replace(expr, pattern, repl)
    return df.withColumn(out_col or text_col, expr)


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document count of each PII pattern class — the audit half of the
    scrub (run it before AND after mask_pii; the after-counts must be 0)."""
    return df.select(
        "doc_id",
        *[
            F.regexp_count(F.col(text_col), F.lit(p)).cast("bigint").alias(f"n_{name}")
            for name, p, _ in PII_PATTERNS
        ],
    )
