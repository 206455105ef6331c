"""Text analysis operators over a document corpus.

Everything here is pyspark.sql.functions built-ins (whole-stage codegen, no
Python in the executor hot path) so the same semantics are expressible as the
DuckDB oracle SQL in plans/pipeline.py. At 100 TB these are embarrassingly
parallel map-side projections — no shuffle at all.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from squrve_spark.catalog import memo_checkpoint, spread

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


_WS_ASCII = re.compile(r"\s+", re.ASCII)


def jvm_tokens(text: str) -> list[str]:
    """Exact Python port of ``tokens_expr`` (= split(trim(text), '\\s+')):
    Spark ``trim`` strips SPACES only, and Java ``\\s`` is ASCII-only —
    Python's default Unicode whitespace handling would split on NBSP etc.
    and silently diverge from the JVM tokenization (review finding, late
    r4). Empty text yields [''], matching the Column expression."""
    return _WS_ASCII.split((text or "").strip(" "))


def tokens_expr(text_col: str = "text") -> Column:
    """Whitespace tokenization of trimmed text (empty string -> ['']))."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def stopword_count_expr(toks):
    """Count of STOPWORDS_EN tokens in a token-array column — THE stopword
    expression; quality_score / all_signals / corpus_report must all use
    this one definition so their oracles can't drift apart."""
    stop_arr = F.array(*[F.lit(x) for x in STOPWORDS_EN])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))



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
    n_stop = stopword_count_expr(toks)
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


def canon_expr(text_col: str = "text") -> Column:
    """THE canonical text form for exact dedup: lowercase, whitespace
    collapsed. Single source of truth — `fingerprint`, `all_signals`,
    `dedup.exact_dedup_groups` and the PERSISTED store in
    `sinks.incremental_dedup_ingest` must all hash the same form, or stored
    fingerprints silently desynchronize from fresh ones."""
    return F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical document fingerprint: md5 over lowercase,
    whitespace-collapsed text — the exact-dedup key at scale (128-bit, no
    birthday collisions at 10^12 docs)."""
    canon = canon_expr(text_col)
    return spread(df).select(
        "doc_id",
        F.md5(canon).alias("fp_md5"),
        F.length(canon).alias("canon_len"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals, all JVM-side (codegen, no shuffle):

      * ``dup_line_frac``      — 1 - distinct/total over newline-split lines
      * ``dup_para_frac``      — same over blank-line-split paragraphs
      * ``symbol_word_ratio``  — '#'/'...' symbol count over word count
      * ``terminal_line_frac`` — fraction of lines ending in terminal
                                 punctuation (C4's line-quality rule)

    High duplicate-line/paragraph fractions flag boilerplate (nav bars,
    cookie banners, scraped templates); low terminal-punctuation fraction
    flags non-prose. The expensive top-n-gram repetition signal lives in
    ``top_ngram_frac`` (Arrow-batched, per-row Counter) — split out so the
    cheap JVM signals can run alone at full scan speed.
    """
    staged = spread(df).withColumn(
        "_lines", F.filter(F.split(F.col(text_col), r"\n"), lambda x: F.trim(x) != "")
    ).withColumn(
        "_paras", F.filter(F.split(F.col(text_col), r"\n\s*\n"), lambda x: F.trim(x) != "")
    )
    n_lines = F.size(F.col("_lines"))
    n_paras = F.size(F.col("_paras"))
    n_words = F.size(tokens_expr(text_col))
    n_sym = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"(#|\.\.\.)"), 1))
    n_terminal = F.size(
        F.filter(F.col("_lines"), lambda x: F.trim(x).rlike(r"[.!?\"']$"))
    )
    frac = lambda num, den: F.round(num / F.greatest(den, F.lit(1)), 4).cast("double")  # noqa: E731
    return staged.select(
        "doc_id",
        frac(n_lines - F.size(F.array_distinct(F.col("_lines"))), n_lines).alias(
            "dup_line_frac"
        ),
        frac(n_paras - F.size(F.array_distinct(F.col("_paras"))), n_paras).alias(
            "dup_para_frac"
        ),
        frac(n_sym, n_words).alias("symbol_word_ratio"),
        frac(n_terminal, n_lines).alias("terminal_line_frac"),
    )


def corpus_ngram_freq(
    df: DataFrame, n: int = 2, k: int = 100, text_col: str = "text"
) -> DataFrame:
    """Corpus-level top-k token n-gram frequency table — the vocabulary/
    collocation statistic an LM data pipeline reports per corpus snapshot.

    Plan shape: tokens -> n-gram array (JVM ``transform`` over an index
    ``sequence``, no Python) -> ``explode`` -> groupBy count. The groupBy
    partial-aggregates map-side, so the single shuffle carries one row per
    DISTINCT n-gram per task — bounded by vocabulary, not corpus. Top-k via
    count-desc sort + limit (TakeOrdered, no full sort at the driver).
    Ties break on the n-gram string so the selected set is deterministic.
    """
    toks = tokens_expr(text_col)
    staged = spread(df).select(toks.alias("_toks")).filter(F.size("_toks") >= n)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_toks") - n),
        lambda i: F.concat_ws(" ", *[F.element_at("_toks", i + j + 1) for j in range(n)]),
    )
    return (
        staged.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .orderBy(F.col("freq").desc(), "ngram")
        .limit(k)
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-token-window chunks with optional overlap
    — the context-length segmentation step before tokenization/embedding.

    Output: ``(id_col, chunk_id, chunk_text, n_chunk_tokens)``, one row per
    chunk; ``chunk_id`` is the 0-based window index, windows start every
    ``chunk_tokens - overlap`` tokens, the final window is short. An empty
    document yields one empty chunk (row-preserving: every input doc
    appears).

    Scale shape: MAP-ONLY — JVM ``sequence`` of window starts +
    ``posexplode`` + ``slice``; no Python, no shuffle, output rows ~
    n_tokens / step per doc.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    step = chunk_tokens - overlap
    toks = tokens_expr(text_col)
    staged = spread(df).select(F.col(id_col), toks.alias("_toks"))
    # windows start every `step`; the bound n - overlap - 1 stops once the
    # remaining tokens are fully covered by the previous window (a start at
    # >= n - overlap would yield a chunk that is pure overlap). Coverage:
    # if the last start s had s + chunk < n, then s + step <= n - overlap - 1
    # would also be a start — contradiction, so every token lands somewhere.
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("_toks") - overlap - 1, F.lit(0)),
        F.lit(step),
    )
    exploded = staged.select(
        id_col, "_toks", F.posexplode(starts).alias("chunk_id", "_start")
    )
    piece = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
    return exploded.select(
        id_col,
        F.col("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_chunk_tokens"),
    )


def top_ngram_frac(df: DataFrame, n: int = 2, text_col: str = "text") -> DataFrame:
    """Fraction of tokens covered by the single most frequent token n-gram
    (Gopher's top-n-gram character-fraction signal, token-based).

    A JVM expression for "mode of the n-gram multiset" is O(rows x grams^2)
    (aggregate over distinct x filter per distinct); a per-row Counter is
    O(grams). So this one signal runs as an Arrow-batched pandas iterator —
    still map-side, no shuffle, and only (doc_id, text) crosses the JVM/
    Python boundary.
    """
    import pandas as pd

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("top_ngram_frac", T.DoubleType()),
        ]
    )

    def kernel(batches):
        from collections import Counter

        for pdf in batches:
            out = []
            for doc_id, txt in zip(pdf["doc_id"], pdf[text_col]):
                toks = (txt or "").strip().split()
                grams = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
                if not grams:
                    out.append((doc_id, 0.0))
                    continue
                top = Counter(grams).most_common(1)[0][1]
                # overlapping occurrences ('a a a', n=2 -> 2*2/3) can push
                # the raw ratio past 1.0; clamp so downstream threshold
                # filters see a true fraction
                out.append((doc_id, min(1.0, round(top * n / len(toks), 4))))
            yield pd.DataFrame(out, columns=["doc_id", "top_ngram_frac"])

    return spread(df).select("doc_id", text_col).mapInPandas(kernel, schema)


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a bag of query terms
    (Robertson/Sparck-Jones formula, the lexical-search baseline every
    retrieval pipeline needs next to the embedding ANN path).

    Returns ``(id_col, bm25)`` for documents containing >= 1 query term,
    score rounded to 4 dp (engine-portable hash compare).

    Scale shape — all built-ins, three bounded joins, nothing
    corpus-x-corpus:
      * per-doc term frequencies: map-side array filter against the
        broadcast-literal query terms, then explode -> groupBy
        (id, term) — shuffle volume is only rows CONTAINING query terms;
      * corpus stats (N, avgdl): one scalar aggregate, broadcast cross
        join (1 row);
      * document frequencies: groupBy term over the tf table — bounded by
        |query_terms| rows, broadcast back.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = F.array(*[F.lit(t.lower()) for t in query_terms])
    toks = spread(df).select(
        F.col(id_col),
        F.transform(tokens_expr(text_col), lambda t: F.lower(t)).alias("_w"),
    )
    base = toks.select(
        id_col,
        F.size("_w").alias("dl"),
        F.explode(F.filter(F.col("_w"), lambda t: F.array_contains(terms, t))).alias("term"),
    )
    tf = base.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf"),
        F.first("dl").cast("double").alias("dl"),
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(F.size("_w")).alias("avgdl"),
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("dft"))
    idf = F.log(F.lit(1.0) + (F.col("n") - F.col("dft") + 0.5) / (F.col("dft") + 0.5))
    score = idf * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(score), 4).alias("bm25"))
    )


def bm25_per_query(
    df: DataFrame,
    queries: dict[int, list[str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Multi-query BM25: score every document against EVERY query's term
    bag in one corpus pass — ``(query_id, id_col, bm25)``, score rounded
    to 4 dp (the same Robertson/Sparck-Jones arithmetic as
    ``bm25_scores``; identical term bags yield identical scores, asserted
    in tests/test_sampling.py).

    Scale shape: the corpus is scanned ONCE whatever the query count
    (plan-asserted in tests/test_plan_shapes.py). The single scan
    tokenizes and map-side filters against the broadcast-literal UNION of
    all query terms, keeping only a SLIM (id, dl, matched-terms) frame —
    the text column never leaves the scan stage — which is checkpointed
    and fans out into the tf/df/corpus-stat tables (three derivations of
    one in-memory frame instead of three corpus scans). The tiny
    (query_id, term) table broadcast-joins onto tf at the end — shuffle
    volume stays "rows containing any query term", independent of
    |queries|. dft stays a per-TERM document count (a term shared by two
    queries is counted once, not twice)."""
    from squrve_spark.catalog import memo_checkpoint

    if not queries or any(not t for t in queries.values()):
        raise ValueError("queries must be a non-empty dict of non-empty term lists")
    union_terms = sorted({t.lower() for ts in queries.values() for t in ts})
    terms = F.array(*[F.lit(t) for t in union_terms])
    slim = memo_checkpoint(
        spread(df).select(
            F.col(id_col),
            F.size(tokens_expr(text_col)).cast("double").alias("dl"),
            F.filter(
                F.transform(tokens_expr(text_col), lambda t: F.lower(t)),
                lambda t: F.array_contains(terms, t),
            ).alias("_m"),
        )
    )
    base = slim.select(id_col, "dl", F.explode("_m").alias("term"))
    tf = base.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf"),
        F.first("dl").alias("dl"),
    )
    stats = slim.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("dft"))
    spark = df.sparkSession
    _qt_rows = sorted(
        (int(q), t.lower()) for q, ts in queries.items() for t in set(ts)
    )
    # same-object memo per content (r12): a fresh createDataFrame RDD id
    # destabilizes downstream plan_key memos — see mixture_sample
    from squrve_spark.catalog import memo_plan

    qt = memo_plan(
        spark,
        ("bm25-qt", tuple(_qt_rows)),
        lambda: spark.createDataFrame(_qt_rows, "query_id INT, term STRING"),
    )
    idf = F.log(F.lit(1.0) + (F.col("n") - F.col("dft") + 0.5) / (F.col("dft") + 0.5))
    score = idf * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(dft), "term")
        .join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum(score), 4).alias("bm25"))
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


def mask_pii_expr(col: Column) -> Column:
    """THE typed-mask redaction chain (ordered regexp_replace over
    PII_PATTERNS) as a column expression — single source of truth for the
    application ORDER the DuckDB oracles replay (doc_pii_redact,
    pipeline_curate_v4)."""
    for _, pattern, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pattern, repl)
    return col


def mask_pii(df: DataFrame, text_col: str = "text", out_col: str | None = None) -> DataFrame:
    """Replace PII spans with typed placeholder tokens (in place unless
    ``out_col`` names a new column)."""
    return df.withColumn(out_col or text_col, mask_pii_expr(F.col(text_col)))


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


def char_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Shannon character entropy (bits) — the cheap gibberish /
    low-diversity signal (near-0 for 'aaaa...', ~4+ for natural prose).

    Stays ENTIRELY in whole-stage codegen: chars = split(text, ''), counts
    via filter-size per distinct char (O(distinct x len) per doc — distinct
    is alphabet-bounded, so this beats shipping the corpus through an Arrow
    kernel), entropy folded with one ``aggregate``. Map-only, zero shuffle,
    zero Python. Rounded to 6dp for cross-engine hash stability.
    """
    chars = F.split(F.col(text_col), "")
    n = F.size(chars)
    distinct = F.array_distinct(chars)
    counts = F.transform(
        distinct, lambda c: F.size(F.filter(chars, lambda x: x == c))
    )
    # H = -sum( (k/n) * log2(k/n) )
    h = F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, k: acc
        - (k / n) * F.log2(k.cast("double") / n.cast("double")),
    )
    return spread(df).select(
        "doc_id",
        n.alias("n_chars_obs"),
        F.size(distinct).alias("n_distinct_chars"),
        F.round(F.when(n > 0, h).otherwise(F.lit(0.0)), 6).alias("char_entropy"),
    )


def lm_cross_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document cross-entropy (bits/token) under an add-one-smoothed
    bigram LM trained on the SAME corpus — the CCNet-style statistical
    quality signal (docs that look unlike the corpus score high).

    p(b|a) = (c(a,b) + 1) / (c(a) + V); score = avg over the doc's bigrams
    of -log2 p. All counts come from two corpus aggregations (bigram table
    bounded by vocab^2, unigram by vocab); the per-doc pass is an equi-join
    of the doc's bigrams onto the tables plus one groupBy — every shuffle
    is vocabulary- or corpus-row-bounded, nothing quadratic. V (distinct
    token count) is a scalar aggregate collected driver-side and folded in
    as a literal (avoids a nested-loop scalar broadcast in the plan).

    Docs with fewer than 2 tokens have no bigrams and are omitted (no
    defined cross-entropy). Rounded to 6dp for cross-engine stability.
    """
    toks = F.transform(tokens_expr(text_col), lambda t: F.lower(t))
    staged = spread(df.select(id_col, text_col)).select(
        id_col, toks.alias("_t")
    )
    staged = memo_checkpoint(staged)
    uni = staged.select(F.explode("_t").alias("w")).groupBy("w").agg(
        F.count("*").alias("cu")
    )
    uni = memo_checkpoint(uni)
    # scalar distinct-vocab size: a trained parameter of the corpus —
    # session-memoized per snapshot (r12, the train_unigrams contract)
    # so warm rebuilds skip the count job
    from squrve_spark.catalog import MEMO_CAP, plan_key

    spark = df.sparkSession
    _vc = spark.__dict__.setdefault("_squrve_xent_vocab_cache", {})
    _vk = plan_key(uni)
    v = _vc.get(_vk)
    if v is None:
        v = uni.count()
        while len(_vc) >= MEMO_CAP:
            _vc.pop(next(iter(_vc)))
        _vc[_vk] = v
    pairs = staged.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))).alias("a"),
                F.slice(F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))).alias("b"),
            )
        ).alias("p"),
    ).select(id_col, F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    bg = pairs.groupBy("a", "b").agg(F.count("*").alias("cb"))
    scored = (
        pairs.join(bg, ["a", "b"])
        .join(uni.withColumnRenamed("w", "a"), "a")
        .withColumn(
            "_nlp",
            -F.log2((F.col("cb") + 1) / (F.col("cu") + F.lit(v))),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg("_nlp"), 6).alias("lm_cross_entropy"),
    )


def all_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """ONE-SCAN combined signal extraction: every per-document text signal
    (token/length stats, quality ratios, canonical fingerprint, character
    entropy, marker language-ID) computed in a single projection pipeline
    over a single FileScan — zero joins, zero shuffles, zero Python.

    At 100 TB this is the shape that matters: five separate signal queries
    scan the corpus five times; composing their expressions into one stage
    scans once (plan-asserted in tests/test_plan_shapes.py). Semantics are
    the INDIVIDUAL operators' — equality against the joined single-op
    outputs is asserted in tests/test_oracle_parity.py's deferred oracle
    and tests/test_plans.py.
    """
    staged = (
        spread(df)
        .withColumn("_toks", tokens_expr(text_col))
        .withColumn(
            "_toks_low", F.transform(tokens_expr(text_col), lambda t: F.lower(t))
        )
        .withColumn("_chars", F.split(F.col(text_col), ""))
    )
    toks = F.col("_toks")
    n_tok = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, n: acc + n
    )
    n_stop = stopword_count_expr(toks)
    n_punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"([^A-Za-z0-9_\s])"), 1)
    )
    n_chars = F.length(F.col(text_col))
    canon = canon_expr(text_col)
    chars = F.col("_chars")
    n_ch = F.size(chars)
    distinct_ch = F.array_distinct(chars)
    counts = F.transform(
        distinct_ch, lambda c: F.size(F.filter(chars, lambda x: x == c))
    )
    entropy = F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, k: acc - (k / n_ch) * F.log2(k.cast("double") / n_ch.cast("double")),
    )
    langs = sorted(LANG_MARKERS)
    for lang in langs:
        marr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        staged = staged.withColumn(
            f"_s_{lang}",
            F.size(F.filter(F.col("_toks_low"), lambda t: F.array_contains(marr, t))),
        )
    staged = staged.withColumn(
        "_best", F.greatest(*[F.col(f"_s_{lang}") for lang in langs])
    )
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"_s_{lang}") == F.col("_best")) & (F.col("_best") > 0),
            F.lit(lang),
        ).otherwise(pred)
    return staged.select(
        "doc_id",
        n_chars.alias("n_chars_obs"),
        n_tok.alias("n_tokens"),
        F.round(tok_chars / n_tok, 4).cast("double").alias("avg_token_len"),
        F.round(n_stop / n_tok, 4).cast("double").alias("stopword_ratio"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4)
        .cast("double")
        .alias("punct_ratio"),
        F.md5(canon).alias("fp_md5"),
        F.round(F.when(n_ch > 0, entropy).otherwise(F.lit(0.0)), 6).alias(
            "char_entropy"
        ),
        pred.alias("pred_lang"),
    )


# ---------------------------------------------------------------------------
# Markup stripping (crawl ingestion: HTML -> trainable text)

_MARKUP_STEPS: list[tuple[str, str]] = [
    # script/style blocks go entirely (content is code, not prose)
    (r"(?is)<(script|style)[^>]*>.*?</\1\s*>", " "),
    (r"(?s)<!--.*?-->", " "),                      # comments
    (r"(?i)<br\s*/?>|</(p|div|li|h[1-6]|ul|ol|tr|table)\s*>", "\n"),  # block breaks
    # remaining tags must LOOK like tags (name or /name) — a bare '<'
    # in prose ("a < b") is not markup and survives
    (r"</?[A-Za-z][^>]*>", " "),
    # entity decode: &amp; strictly LAST, or the escaped literal
    # "&amp;lt;" would double-decode into a phantom "<"
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;|&apos;", "'"),
    (r"&amp;", "&"),
    (r"[ \t]+", " "),                              # collapse runs
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
]


def strip_markup_expr(col: Column) -> Column:
    """HTML/markup -> text as ONE ordered regexp_replace chain — pure
    whole-stage-codegen JVM (zero Python, zero shuffle), the same
    plan shape as `mask_pii`. Drops script/style bodies, turns block
    closers into newlines, strips remaining tags, decodes the common
    entities, and normalizes whitespace. A regex pass is the honest
    80% of crawl text extraction (full boilerplate removal needs DOM
    heuristics à la trafilatura — `repetition_stats`' dup-line signals
    cover the boilerplate side downstream)."""
    expr = col
    for pattern, repl in _MARKUP_STEPS:
        expr = F.regexp_replace(expr, pattern, repl)
    return F.regexp_replace(expr, r"^\s+|\s+$", "")


def strip_markup(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Markup-strip ``text_col`` (in place unless ``out_col`` is given)."""
    return df.withColumn(out_col or text_col, strip_markup_expr(F.col(text_col)))


def attach_html_payload(
    df: DataFrame, text_col: str = "text", out_col: str = "html"
) -> DataFrame:
    """Deterministic crawl-page synthesizer (r8): wrap each document's text
    in a REAL HTML page so the markup-ingestion path is exercised
    end-to-end — the same fixture-side attach pattern as
    `multimodal.attach_image_payload` / `attach_audio_payload`.

    The page carries everything `strip_markup_expr` claims to handle:
    script AND style bodies that must vanish wholesale, an HTML comment,
    block structure alternating by doc_id parity (list vs table — a
    cross-format check), and an entity footer including the
    ``&amp;lt;`` double-decode trap (must come out as the literal
    ``&lt;``, never a phantom ``<``).

    Pure engine-portable string concatenation (JVM codegen, map-only), so
    a DuckDB oracle rebuilds the byte-identical page with ``||``."""
    did = F.col("doc_id").cast("string")
    even = F.lit("<ul><li>alpha</li><li>beta</li></ul>")
    odd = F.lit("<table><tr><td>gamma</td></tr></table>")
    page = F.concat(
        F.lit('<!DOCTYPE html><html><head><title>Doc '), did,
        F.lit('</title><script type="text/javascript">var x = 1 < 2 && y > 0;'
              '</script><style>.main { color: #333; }</style></head>'
              '<body><!-- breadcrumb nav --><h1>Doc '), did,
        F.lit('</h1><div class="content"><p>'), F.col(text_col),
        F.lit("</p>"),
        F.when(F.col("doc_id") % 2 == 0, even).otherwise(odd),
        F.lit('</div><div id="footer">Tom &amp; Jerry &lt;tag&gt; '
              "&quot;q&quot; &#39;s&#39;&nbsp;end &amp;lt;literal</div>"
              "</body></html>"),
    )
    return df.withColumn(out_col, page)


def blocklist_signals(
    df: DataFrame,
    blocklist: list[str],
    text_col: str = "text",
    threshold: float = 0.08,
) -> DataFrame:
    """C4-style bad-words filtering signals (r8): per document, the count
    and ratio of tokens on a blocklist, plus the drop verdict at
    ``ratio > threshold`` (C4 drops on ANY hit; RefinedWeb-style ratio
    thresholds keep documents that merely quote a term — both readable
    from the output: ``n_flagged > 0`` vs ``dropped``).

    The list rides as an array LITERAL into one whole-stage-codegen
    filter+size projection — MAP-ONLY, zero shuffle, zero Python, the
    mask_pii plan shape. Ratio rounded to 4dp for cross-engine parity.

    Output: (doc_id, n_tokens, n_flagged, flag_ratio, dropped).
    """
    from squrve_spark.catalog import spread

    staged = spread(df).withColumn("_toks", tokens_expr(text_col))
    toks = F.col("_toks")
    lit_list = F.array(*[F.lit(w) for w in blocklist])
    n_flagged = F.size(F.filter(toks, lambda t: F.array_contains(lit_list, t)))
    ratio = F.round(n_flagged / F.size(toks), 4)
    return staged.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        n_flagged.cast("int").alias("n_flagged"),
        ratio.cast("double").alias("flag_ratio"),
        (ratio > threshold).alias("dropped"),
    )


def within_doc_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """WITHIN-document duplicate-token removal, keeping each token's FIRST
    occurrence in order (r8) — the intra-document complement of the
    corpus-level `segment_dedup`: repeated boilerplate INSIDE one page
    (nav text glued twice by a bad extractor, chorus lines, copy-paste
    stutter) deflates quality signals and wastes training tokens even when
    no other document shares it.

    Pure higher-order-function codegen — ``filter(toks, (t, i) ->
    array_position(toks, t) == i+1)`` — MAP-ONLY, zero shuffle, zero
    Python. Quadratic in DOCUMENT length (array_position scans per
    element), which is the right trade at corpus scale: docs are bounded,
    corpora are not, and no shuffle beats an O(n) per-doc kernel that
    costs an Arrow round-trip. DuckDB twin: ``list_filter(w, (x, i) ->
    list_position(w, x) = i)`` (1-based on both sides of that form).

    Output: (doc_id, n_tokens, n_unique, cleaned).
    """
    from squrve_spark.catalog import spread

    staged = spread(df).withColumn("_toks", tokens_expr(text_col))
    toks = F.col("_toks")
    first = F.filter(
        toks, lambda t, i: F.array_position(toks, t) == (i + F.lit(1)).cast("long")
    )
    return staged.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(first).cast("int").alias("n_unique"),
        F.array_join(first, " ").alias("cleaned"),
    )


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    delimiter: str = "\n",
    min_df: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate-segment removal (the C4 / RefinedWeb /
    CCNet "line dedup" step, generalized to a configurable delimiter):
    drop every segment whose trimmed form appears in >= ``min_df``
    distinct documents, reassemble the survivors in original order.

    Returns one row per input document: ``doc_id``, ``n_segments``,
    ``n_removed``, ``cleaned`` (the reassembled text; empty when every
    segment was boilerplate).

    Scale shape: the corpus is scanned ONCE — the slim exploded
    (doc_id, pos, seg) frame is memo-checkpointed (the `bm25_per_query`
    pattern; without it the hot-set, survivor, and per-doc-count branches
    each re-scan the parquet) and fans out into: distinct-doc-count
    aggregate keyed by segment (shuffle bounded by the distinct-segment
    count, NOT corpus rows once the partial aggregate collapses repeats
    map-side) -> left_anti join against the hot-segment set (small by
    construction at a high ``min_df``; AQE turns it into a broadcast join
    when it measures small) -> one groupBy(doc_id) to reassemble, with
    per-doc segment counts from the same frame. No Python, every shuffle
    keyed and combinable; zero FileScans after the memo (plan-asserted).
    """
    from squrve_spark.catalog import memo_checkpoint

    pat = re.escape(delimiter)
    segs = memo_checkpoint(
        spread(df).select(
            "doc_id",
            F.posexplode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), pat, -1)
            ).alias("pos", "seg"),
        )
    )
    key = F.trim(F.col("seg"))
    hot = (
        segs.where(key != "")
        .groupBy(key.alias("key"))
        .agg(F.count_distinct("doc_id").alias("df_docs"))
        .where(F.col("df_docs") >= F.lit(min_df))
        .select("key")
    )
    kept = segs.join(hot, key == hot["key"], "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.concat_ws(
            delimiter,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias("cleaned"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    stats = segs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_segments")
    )
    return stats.join(reassembled, "doc_id", "left").select(
        "doc_id",
        "n_segments",
        (
            F.col("n_segments") - F.coalesce(F.col("n_kept"), F.lit(0))
        ).cast("bigint").alias("n_removed"),
        F.coalesce(F.col("cleaned"), F.lit("")).alias("cleaned"),
    )


def ngram_repetition(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 3,
    dup_n: int = 5,
) -> DataFrame:
    """Gopher repetition-rule signals (Rae et al. 2021 §A1.1) — the
    N-GRAM half; the line/paragraph/symbol rules live in
    `repetition_stats` and `top_ngram_frac` covers the top-BIGRAM form:

      * ``top{top_n}_frac`` — fraction of tokens covered by the single
        most frequent token top_n-gram (clamped to 1.0, as in
        `top_ngram_frac`; Gopher drops docs where this exceeds ~0.16-0.18
        for n=2..4),
      * ``dup{dup_n}_char_frac`` — fraction of n-gram CHARACTERS that sit
        inside dup_n-grams occurring more than once (Gopher drops above
        ~0.10-0.15 for n=5..10; overlapping occurrences counted per
        occurrence, the standard reimplementation trade).

    Plan shape (r12, guide §2.4): MAP-ONLY. Both signals are doc-LOCAL
    aggregations, so the former explode -> groupBy(doc_id, n, gram) ->
    groupBy(doc_id) -> restore-join shape paid two exchanges of a
    token-linear gram frame (plus a join) for counts each document can
    compute by itself. Instead, per document, each gram size's counts
    come from ONE in-codegen pass over its SORTED gram array (equal
    grams are adjacent after array_sort, so frequencies are run
    lengths): `aggregate` folds (run length, max run, dup chars, total
    chars) in a single struct accumulator. Zero exchanges, zero joins,
    zero Python; short docs fall out naturally (empty gram array ->
    zero stats). Measured 2.2 -> 1.1 s at sf0.1, output bit-identical
    (the run-length counts are the same integers the groupBy produced;
    the fraction arithmetic is unchanged). Grams join on chr(30) so
    multi-space runs can't alias.

    Output: (doc_id, n_tokens, top{top_n}_frac, dup{dup_n}_char_frac),
    fractions rounded to 6dp (cross-engine parity grid).
    """
    if top_n == dup_n:
        # the two signals would share one gram set; keep the guard from
        # the exploded form (r9 review) — a single size belongs to
        # top_ngram_frac
        raise ValueError("top_n and dup_n must differ (got both "
                         f"{top_n}); use top_ngram_frac for a single size")
    sep = "\x1e"
    # slim (id, tokens) projection checkpointed per corpus snapshot: the
    # text scan + tokenize runs once per session (the bm25/segment_dedup
    # pattern); each pass re-runs the gram folds from it
    staged = memo_checkpoint(
        spread(df).select(
            "doc_id",
            F.filter(tokens_expr(text_col), lambda t: t != "").alias("w"),
        )
    )

    def grams_sql(n: int) -> str:
        return (
            f"CASE WHEN size(w) >= {n} THEN "
            f"transform(sequence(0, size(w) - {n}), "
            f"i -> array_join(slice(w, i + 1, {n}), '{sep}')) "
            "ELSE array() END"
        )

    def run_stats_sql(garr_sql: str) -> str:
        # fold over the sorted grams: 'rc' = current run length, 'mx' =
        # longest finished run, 'dup'/'tot' = chars in repeated / all
        # gram occurrences; the finish lambda closes the last run
        return f"""aggregate(
  array_sort({garr_sql}),
  named_struct('prev', CAST(NULL AS STRING), 'rc', 0L, 'mx', 0L,
               'dup', 0L, 'tot', 0L),
  (a, g) -> IF(a.prev IS NOT NULL AND g = a.prev,
     named_struct('prev', g, 'rc', a.rc + 1L, 'mx', a.mx,
                  'dup', a.dup, 'tot', a.tot),
     named_struct('prev', g, 'rc', 1L,
       'mx', greatest(a.mx, a.rc),
       'dup', a.dup + IF(a.prev IS NOT NULL AND a.rc >= 2L,
                         a.rc * length(a.prev), 0L),
       'tot', a.tot + IF(a.prev IS NOT NULL,
                         a.rc * length(a.prev), 0L))),
  a -> named_struct(
       'mx', greatest(a.mx, a.rc),
       'dup', a.dup + IF(a.prev IS NOT NULL AND a.rc >= 2L,
                         a.rc * length(a.prev), 0L),
       'tot', a.tot + IF(a.prev IS NOT NULL,
                         a.rc * length(a.prev), 0L)))"""

    st = staged.select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        F.expr(run_stats_sql(grams_sql(top_n))).alias("ts"),
        F.expr(run_stats_sql(grams_sql(dup_n))).alias("ds"),
    )
    top_frac = F.round(
        F.least(F.lit(1.0), F.col("ts.mx") * top_n / F.col("n_tokens")), 6
    )
    dup_frac = F.round(F.col("ds.dup") / F.col("ds.tot"), 6)
    return st.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.coalesce(F.when(F.col("ts.mx") > 0, top_frac), F.lit(0.0))
        .cast("double")
        .alias(f"top{top_n}_frac"),
        F.coalesce(F.when(F.col("ds.tot") > 0, dup_frac), F.lit(0.0))
        .cast("double")
        .alias(f"dup{dup_n}_char_frac"),
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
    — the MOSS local fingerprinting algorithm): hash every token k-gram,
    slide a w-gram window, keep each window's MINIMUM hash. The selected
    set is a position-robust sketch with the winnowing guarantee: any
    shared token run of length >= k+w-1 between two documents yields at
    least one shared fingerprint (property-tested).

    Engine portability (r9): gram hashes are the first 16 md5 hex chars
    kept AS STRINGS — fixed-width lowercase hex sorts lexicographically
    exactly like its uint64 value, so window minima, distinct sets, and
    the sorted fingerprint digest replay on any engine with no integer
    signedness traps at all.

    Plan shape: MAP-ONLY whole-stage codegen (transform/slice/array_min
    HOFs), zero shuffle, zero Python — O(grams x w) per document, linear
    in the corpus. Docs shorter than k tokens fingerprint to the empty
    set; docs with fewer than w grams winnow their single partial window
    (the min of all grams).

    Output: (doc_id, n_grams INT, n_fps INT, fp_md5, fps array<string>).
    """
    sep = "\x1e"
    staged = spread(df).select(
        "doc_id",
        F.filter(tokens_expr(text_col), lambda t: t != "").alias("_w"),
    )
    n_tok = F.size(F.col("_w"))
    gh = F.when(
        n_tok >= k,
        F.transform(
            F.sequence(F.lit(0), n_tok - k),
            lambda i: F.substring(
                F.md5(F.array_join(F.slice(F.col("_w"), i + 1, k), sep)), 1, 16
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = staged.select("doc_id", gh.alias("_gh"))
    n_grams = F.size(F.col("_gh"))
    fps = F.when(
        n_grams > 0,
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n_grams - w, F.lit(0))),
                    lambda i: F.array_min(F.slice(F.col("_gh"), i + 1, w)),
                )
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    # stage the fingerprint ARRAY once: size/md5/output each reference it,
    # and projection items share no subexpressions — unstaged, the whole
    # O(grams x w) chain would run three times per row (r9 review;
    # CollapseProject keeps the barrier because the expression is
    # non-cheap and multiply-referenced)
    staged2 = staged.select(
        "doc_id", n_grams.cast("int").alias("n_grams"), fps.alias("_fps")
    )
    return staged2.select(
        "doc_id",
        "n_grams",
        F.size(F.col("_fps")).cast("int").alias("n_fps"),
        F.md5(F.array_join(F.col("_fps"), ",")).alias("fp_md5"),
        F.col("_fps").alias("fps"),
    )


def cdc_chunks(
    df: DataFrame,
    k: int = 3,
    mod: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking over the token stream (the LBFS/rolling-
    boundary scheme, Muthitacharoen et al. 2001, applied to tokens): a
    chunk boundary falls AFTER token i exactly when the hash of the
    k-gram ending at i lands in the boundary class (h % mod == 0) — so
    boundaries move WITH the content, and an insertion near the start of
    a document re-chunks only its neighborhood instead of shifting every
    fixed-window chunk downstream (the failure mode of stride tiling
    that `doc_sliding_dup` pays 2x window count to soften). Expected
    chunk length ~= mod tokens; no min/max bounds (the original LBFS
    form) so the boundary rule stays STATELESS and the whole operator is
    one map-only codegen projection — zero shuffle, zero Python.

    Engine portability: the boundary class is the first 4 md5 hex chars
    of the chr(30)-joined gram as an integer, mod ``mod`` — replayable
    anywhere; chunk identity is md5 of the chunk's tokens.

    Docs shorter than k tokens are a single chunk. Output:
    (doc_id, n_tokens INT, n_chunks INT, chunk_md5s array<string>).
    """
    sep = "\x1e"
    staged = spread(df).select(
        "doc_id",
        F.filter(tokens_expr(text_col), lambda t: t != "").alias("_w"),
    )
    n = F.size(F.col("_w"))
    cond = (
        lambda i: F.conv(
            F.substring(
                F.md5(F.array_join(F.slice(F.col("_w"), i + 1, k), sep)), 1, 4
            ),
            16, 10,
        ).cast("int") % mod
        == 0
    )
    bounds = F.when(
        n >= k,
        F.transform(
            F.filter(F.sequence(F.lit(0), n - k), cond),
            lambda i: i + k - 1,
        ),
    ).otherwise(F.array().cast("array<int>"))
    staged = staged.select("doc_id", "_w", bounds.cast("array<int>").alias("_b"))
    n = F.size(F.col("_w"))
    starts = F.concat(
        F.array(F.lit(0)), F.transform(F.col("_b"), lambda b: b + 1)
    )
    ends = F.concat(F.col("_b"), F.array((n - 1).cast("int")))
    md5s = F.filter(
        F.zip_with(
            starts,
            ends,
            lambda s, e: F.when(
                e >= s,
                F.md5(F.array_join(F.slice(F.col("_w"), s + 1, e - s + 1), sep)),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    # same staging as winnow_fingerprints: the chunk-md5 chain is
    # referenced twice (size + output) — materialize it once (r9 review)
    staged2 = staged.select(
        "doc_id", n.cast("int").alias("n_tokens"), md5s.alias("_md5s")
    )
    return staged2.select(
        "doc_id",
        "n_tokens",
        F.size(F.col("_md5s")).cast("int").alias("n_chunks"),
        F.col("_md5s").alias("chunk_md5s"),
    )


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    top_k: int = 10,
) -> DataFrame:
    """Per-group vocabulary audit (r10): the Zipf/Heaps-style corpus health
    check a mixture pipeline runs per source before weighting it — token
    volume, type count, hapax count (singleton types: the long-tail mass),
    type-token ratio, and top-1 / top-``top_k`` term concentration (a
    boilerplate-heavy or template-generated source shows abnormally high
    head concentration and low TTR).

    Scale shape: ONE explode into a (group, token) partial-agg groupBy —
    shuffle bounded by distinct (group, type) pairs, not token volume —
    then a per-group LITERAL top-k window (plans WindowGroupLimit(Partial)
    below the exchange: each map task keeps its own top-k per group) and
    one group-level aggregate. All ratios are ROUND(int/int, 6) — exact
    cross-engine. Reference capability: corpus profiling, core
    data_manage.py's dataset statistics surface.
    """
    from pyspark.sql import Window as W

    toks = spread(df.select(group_col, text_col)).select(
        group_col, F.explode(tokens_expr(text_col)).alias("_t")
    )
    tf = (
        toks.select(group_col, F.lower(F.col("_t")).alias("t"))
        .groupBy(group_col, "t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tf = memo_checkpoint(tf)  # head-concentration and totals share the scan
    agg = tf.groupBy(group_col).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
    )
    w = W.partitionBy(group_col).orderBy(F.col("c").desc(), F.col("t"))
    top = (
        tf.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)  # literal -> WindowGroupLimit(Partial)
        .groupBy(group_col)
        .agg(
            F.sum("c").cast("long").alias("_topk"),
            F.max(F.when(F.col("rk") == 1, F.col("c"))).cast("long").alias("_top1"),
        )
    )
    return agg.join(top, group_col).select(
        group_col,
        "n_tokens",
        "n_types",
        "n_hapax",
        F.round(F.col("n_types") / F.col("n_tokens"), 6).cast("double").alias("ttr"),
        F.round(F.col("_top1") / F.col("n_tokens"), 6).cast("double").alias("top1_share"),
        F.round(F.col("_topk") / F.col("n_tokens"), 6).cast("double").alias("topk_share"),
    )


# ---------------------------------------------------------------------------
# C4 / Gopher / RefinedWeb published-recipe filters (r10)

def attach_line_payload(
    df: DataFrame, text_col: str = "text", out_col: str = "page"
) -> DataFrame:
    """Deterministic multi-LINE page synthesizer (r10): the fixture corpus is
    single-line vocabulary soup, so the line-level published filters (C4's
    terminal-punctuation rule, RefinedWeb's boilerplate line dedup) have
    nothing to bite on raw ``text``. This wraps each document's tokens into
    5-token lines with decorations varying by ``(doc_id + line_idx) % 12``
    (bare line / bullet / ellipsis / question / period) plus deterministic
    trap lines — ``lorem ipsum`` (doc_id%7), a ``{`` code line (doc_id%11),
    a ``javascript`` notice (doc_id%5) and a per-``source`` rights footer
    every doc of a source shares (the cross-doc boilerplate line) — the same
    fixture-side attach pattern as `attach_html_payload`.

    Pure engine-portable string/array expressions (JVM codegen, map-only);
    a DuckDB oracle rebuilds the byte-identical page with list_transform/
    list_slice (NB DuckDB list_slice is begin..end-inclusive, Spark slice is
    start+length — both clip at the array end)."""
    staged = spread(df).withColumn("_w", tokens_expr(text_col))
    w = F.col("_w")
    did = F.col("doc_id")
    n_lines = F.ceil(F.size(w) / F.lit(5)).cast("int")

    def _line(i):
        base = F.array_join(F.slice(w, i * 5 + 1, 5), " ")
        m = F.pmod(did + i, F.lit(12))
        return (
            F.when(m == 0, base)
            .when(m == 1, F.concat(F.lit("- "), base, F.lit(".")))
            .when(m == 2, F.concat(base, F.lit("...")))
            .when(m == 3, F.concat(base, F.lit("?")))
            .otherwise(F.concat(base, F.lit(".")))
        )

    lines = F.when(
        F.size(w) > 0, F.transform(F.sequence(F.lit(0), n_lines - 1), _line)
    ).otherwise(F.array().cast("array<string>"))
    extra = F.array(
        F.when(did % 7 == 0, F.lit("lorem ipsum dolor sit amet.")),
        F.when(did % 11 == 0, F.lit("function() { return 1; }")),
        F.when(did % 5 == 0, F.lit("please enable javascript to continue.")),
        F.concat(F.lit("all rights reserved by "), F.col("source"), F.lit(".")),
    )
    page = F.array_join(
        F.concat(lines, F.filter(extra, lambda x: x.isNotNull())), "\n"
    )
    return staged.withColumn(out_col, page).drop("_w")


def c4_line_keep_expr(line: Column) -> Column:
    """THE C4 line-keep predicate (terminal punctuation, >= 3 words, no
    'javascript') — one definition shared by `c4_line_filter` and the
    curate_v6 composite so their oracles cannot drift apart (the
    stopword_count_expr convention)."""
    return (
        line.rlike('[.!?"]$')
        & (F.size(F.split(F.trim(line), r"\s+")) >= 3)
        & ~F.lower(line).contains("javascript")
    )


def c4_line_filter(df: DataFrame, text_col: str = "page") -> DataFrame:
    """C4's cleaning rules (Raffel et al. 2020, the public recipe) over a
    multi-line text column, as per-document verdict signals:

    * a line is KEPT iff it ends in terminal punctuation (``. ! ? "``),
      has >= 3 words, and does not mention ``javascript`` (case-insens);
    * the PAGE is kept iff it has >= 5 kept lines, no ``lorem ipsum``,
      and no ``{``.

    (The dirty-word page rule is `blocklist_signals`; the three-sentence
    span dedup is `segment_dedup` — both already first-class.)

    Output: (doc_id, n_lines, n_kept, has_lorem, has_brace, kept,
    clean_chars, clean_md5) where clean_* describe the kept lines joined
    with newlines. MAP-ONLY: one whole-stage-codegen projection, zero
    shuffle, zero Python; every rule is an array HOF over one split().
    """
    staged = spread(df).withColumn("_ls", F.split(F.col(text_col), "\n"))
    ls = F.col("_ls")
    low = F.lower(F.col(text_col))
    kept_lines = F.filter(ls, c4_line_keep_expr)
    n_kept = F.size(kept_lines)
    has_lorem = low.contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{")
    clean = F.array_join(kept_lines, "\n")
    return staged.select(
        "doc_id",
        F.size(ls).cast("int").alias("n_lines"),
        n_kept.cast("int").alias("n_kept"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        ((n_kept >= 5) & ~has_lorem & ~has_brace).alias("kept"),
        F.length(clean).cast("int").alias("clean_chars"),
        F.md5(clean).alias("clean_md5"),
    )


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wl: float = 3.0,
    max_mean_wl: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    max_symbol_ratio: float = 0.1,
    required_stops: list[str] | None = None,
) -> DataFrame:
    """Gopher's document-level quality GATES (Rae et al. 2021 §A1.1) as
    explicit per-rule verdicts — `quality_score` emits the raw ratios;
    this emits the published keep/drop decisions a curation pipeline acts
    on: word count in [50, 100k], mean word length in [3, 10], >= 80% of
    words containing an alphabetic character, >= ``min_stop_hits``
    DISTINCT required stopwords present, symbol-to-word ratio (``#`` and
    ``...``) below 0.1.

    ``required_stops`` defaults to the engine-wide STOPWORDS_EN list
    (Gopher's own 8-word set {the,be,to,of,and,that,have,with} collapses
    to {the} on the fixture vocabulary, which would fail every document;
    the substitution is parameterized, not hard-coded). On the fixture the
    word-count and stopword gates bite both ways; mean-word-length, alpha
    and symbol gates pass everywhere (vocabulary-soup corpus) — asserted,
    not assumed, in tests.

    All ratios ROUND(int/int, 4) so the verdicts replay cross-engine.
    MAP-ONLY single projection, zero shuffle, zero Python.
    """
    stops = required_stops if required_stops is not None else list(STOPWORDS_EN)
    stop_arr = F.array(*[F.lit(s) for s in stops])
    staged = spread(df).withColumn("_w", tokens_expr(text_col))
    w = F.col("_w")
    n = F.size(w)
    tok_chars = F.aggregate(
        F.transform(w, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    mean_wl = F.round(tok_chars / n, 4)
    n_alpha = F.size(F.filter(w, lambda t: t.rlike("[A-Za-z]")))
    alpha_frac = F.round(n_alpha / n, 4)
    stop_hits = F.size(
        F.array_intersect(F.transform(w, lambda t: F.lower(t)), stop_arr)
    )
    n_sym = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"(#|\.\.\.)"), 1)
    )
    sym_ratio = F.round(n_sym / n, 4)
    r_wc = (n >= min_words) & (n <= max_words)
    r_mwl = (mean_wl >= min_mean_wl) & (mean_wl <= max_mean_wl)
    r_alpha = alpha_frac >= min_alpha_frac
    r_stop = stop_hits >= min_stop_hits
    r_sym = sym_ratio < max_symbol_ratio
    return staged.select(
        "doc_id",
        n.cast("int").alias("n_words"),
        mean_wl.cast("double").alias("mean_word_len"),
        alpha_frac.cast("double").alias("alpha_frac"),
        stop_hits.cast("int").alias("stop_hits"),
        sym_ratio.cast("double").alias("symbol_ratio"),
        r_wc.alias("r_wordcount"),
        r_mwl.alias("r_meanlen"),
        r_alpha.alias("r_alpha"),
        r_stop.alias("r_stopwords"),
        r_sym.alias("r_symbols"),
        (r_wc & r_mwl & r_alpha & r_stop & r_sym).alias("kept"),
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "page",
    min_docs: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """RefinedWeb-style cross-document LINE deduplication (boilerplate
    removal): a line occurring in >= ``min_docs`` DISTINCT documents is
    boilerplate (nav bars, rights footers, cookie notices) and is removed
    from every document.

    Scale shape: explode DISTINCT lines per doc -> one (line -> doc-count)
    partial-agg groupBy (shuffle bounded by distinct lines, with map-side
    combine) -> equi-join the boilerplate verdict back on the line hash ->
    one per-doc re-aggregate. The boilerplate set is NOT broadcast-hinted:
    on a crawl corpus it grows with the corpus (the r9-verdict hot-set
    lesson) — AQE picks broadcast when it is actually small. Lines travel
    as md5 hashes through the shuffle, never strings.

    Output: (doc_id, n_lines, n_boiler, clean_md5) — n_* count line
    INSTANCES (within-doc duplicates each count), clean_md5 fingerprints
    the surviving lines joined with newlines in original order.
    """
    staged = memo_checkpoint(
        spread(df)
        .select(F.col(id_col), F.split(F.col(text_col), "\n").alias("_ls"))
        .select(
            id_col,
            F.posexplode("_ls").alias("line_idx", "line"),
        )
        .withColumn("_lh", F.md5(F.col("line")))
    )
    boiler = (
        staged.groupBy("_lh")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("_lh", F.lit(True).alias("_boiler"))
    )
    marked = staged.join(boiler, "_lh", "left").withColumn(
        "_b", F.coalesce(F.col("_boiler"), F.lit(False))
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_lines"),
            F.sum(F.col("_b").cast("int")).cast("int").alias("n_boiler"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    ~F.col("_b"),
                                    F.struct(F.col("line_idx"), F.col("line")),
                                )
                            )
                        ),
                        lambda s: s.getField("line"),
                    ),
                    "\n",
                )
            ).alias("clean_md5"),
        )
    )
