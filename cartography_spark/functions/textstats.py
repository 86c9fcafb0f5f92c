"""Text analysis for a large-scale training-data pipeline.

Language-ID (stopword-marker heuristic), quality scoring (length /
punctuation / stopword ratios), token counting, and document
fingerprinting (min-hash of word shingles — a portable rolling-window
fingerprint).

Everything here is pure ``pyspark.sql.functions`` — no Python UDFs, so
the whole stage stays inside WholeStageCodegen and the expressions are
reproducible in ANSI SQL for the DuckDB oracle (md5 is the only hash
used in oracle-checked paths; it is byte-identical across engines).

Reference analog: the per-row normalization layer
(``cartography/util.py:332-357``) — the reference has no text-analytics
of its own; this module is the training-data extension mandated by the
build contract.

Scale: all narrow, embarrassingly parallel column expressions evaluated
in the scan stage; nothing here shuffles — except ``tfidf_top_terms``,
the one corpus-level scorer (TF-IDF needs corpus document frequencies
by definition), whose shuffle budget is documented on the function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword marker sets (public knowledge). Order of
# LANGS is the deterministic tie-break priority for langid.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in", "that", "it", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "con", "por", "que"),
    "fr": ("le", "la", "les", "est", "une", "des", "dans", "pour", "pas", "avec"),
    "zh": ("de", "shi", "le", "zai", "you", "wo", "ta", "men", "zhe", "bu"),
}
LANGS = tuple(LANG_MARKERS)

ENGLISH_STOPWORDS = LANG_MARKERS["en"] + ("was", "for", "on", "as", "are", "at", "be")

PUNCT_CLASS = "[.,!?;:]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens (single-space split — oracle-portable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish subword count: words + digit runs + punctuation marks, each
    long word costing ceil(len/4) units (the classic chars/4 rule)."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(c), "\\s+")
    word_units = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("long"),
    )
    punct = F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return (word_units + punct).alias("bpe_tokens")


def _count_in(toks: Column, vocab: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*vocab)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-scoring features: n_chars, n_tokens, avg_token_len,
    punct_ratio, stopword_ratio, quality_score (all rounded doubles so
    the DuckDB oracle hashes identically)."""
    toks = tokens(text_col)
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    punct = n_chars - F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    stop = _count_in(toks, ENGLISH_STOPWORDS)
    avg_tok = F.round((n_chars - (n_tokens - 1)) / n_tokens, 4)
    punct_ratio = F.round(punct / n_chars, 4)
    stop_ratio = F.round(stop / n_tokens, 4)
    # Heuristic quality: enough text, some stopwords, not punctuation soup.
    score = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * F.lit(0.5)
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * F.lit(0.4)
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * F.lit(0.1),
        4,
    )
    return (
        df.withColumn("n_chars_calc", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("avg_token_len", avg_tok.cast("double"))
        .withColumn("punct_ratio", punct_ratio.cast("double"))
        .withColumn("stopword_ratio", stop_ratio.cast("double"))
        .withColumn("quality_score", score.cast("double"))
    )


def langid(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-marker language ID with deterministic tie-break (LANGS
    declaration order). Append ``out_col`` plus per-language marker
    counts ``lid_<lang>``."""
    toks = tokens(text_col)
    out = df
    for lang in LANGS:
        out = out.withColumn(f"lid_{lang}", _count_in(toks, LANG_MARKERS[lang]).cast("long"))
    # argmax with first-wins tie-break in declaration order
    best = F.lit(LANGS[-1])
    best_score = F.col(f"lid_{LANGS[-1]}")
    for lang in reversed(LANGS[:-1]):
        c = F.col(f"lid_{lang}")
        best = F.when(c >= best_score, F.lit(lang)).otherwise(best)
        best_score = F.when(c >= best_score, c).otherwise(best_score)
    return out.withColumn(out_col, best)


def word_shingles(col: Column | str, n: int = 5) -> Column:
    """Word n-gram shingle strings (space-joined windows).

    The token array is let-bound via a 1-element-array transform (the
    same idiom as ``minhash_signature``): higher-order lambdas are
    interpreted with no CSE, so an inline ``tokens(col)`` would be
    re-split once per window position — O(len^2) per row, measured ~3x
    slower at sf0.1 corpus width."""
    return F.element_at(
        F.transform(
            F.array(tokens(col)),
            lambda toks: F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
                ),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ),
        1,
    )


def doc_fingerprint(col: Column | str, n: int = 5) -> Column:
    """Rolling-window document fingerprint: min md5 over word n-gram
    shingles. Two documents sharing any minimal window collide — the
    1-hash special case of MinHash, portable to the SQL oracle."""
    return F.array_min(F.transform(word_shingles(col, n), F.md5))


def kmin_fingerprints(col: Column | str, n: int = 5, k: int = 4) -> Column:
    """k smallest shingle hashes (bottom-k sketch) — a compact signature
    whose overlap estimates containment. Delegates to the ONE bottom-k
    builder (``operators.dedup.bottomk_sketch``, which dedups hashes
    internally — distinct-after-md5 equals distinct-before) so the repo
    has a single sketch convention."""
    from cartography_spark.operators.dedup import bottomk_sketch

    return bottomk_sketch(word_shingles(col, n), k)


# ---------------- PII scrubbing (C4-style cleanup) ----------------

# Patterns chosen to mean the SAME thing in Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround, ASCII classes only — so the
# driver oracle can replicate redaction byte-for-byte.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://\S+",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}
# Application order is part of the contract: emails first (a URL can
# contain '@' userinfo), then URLs, then bare IPs.
PII_ORDER: tuple[str, ...] = ("email", "url", "ipv4")


def redact_pii(
    col: Column | str,
    replacement: str = "<PII>",
    kinds: tuple[str, ...] = PII_ORDER,
) -> Column:
    """Redact emails / URLs / IPv4s from a string column — the C4-style
    pre-training scrub. A pure row-local chain of ``regexp_replace``
    (JVM, codegen'd): ZERO shuffle at any corpus size; patterns and
    application order are pinned in ``PII_PATTERNS``/``PII_ORDER`` and
    are valid, semantics-identical in both Java regex and RE2 so the
    DuckDB oracle reproduces the redacted bytes exactly."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in kinds:
        c = F.regexp_replace(c, PII_PATTERNS[kind], replacement)
    return c


def pii_counts(
    col: Column | str,
    kinds: tuple[str, ...] = PII_ORDER,
    replacement: str = "<PII>",
) -> list[Column]:
    """Per-kind match counts (``n_<kind>`` columns), counted on the
    SAME progressively-redacted text the scrub sees, so a URL's
    userinfo '@' is not double-counted as an email. Pass the SAME
    ``replacement`` as :func:`redact_pii` — the intermediate text (and
    therefore the counts) depends on it (e.g. an empty replacement can
    merge adjacent tokens into new matches)."""
    c = F.col(col) if isinstance(col, str) else col
    out = []
    for kind in kinds:
        out.append(F.regexp_count(c, F.lit(PII_PATTERNS[kind])).alias(f"n_{kind}"))
        c = F.regexp_replace(c, PII_PATTERNS[kind], replacement)
    return out


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the standard corpus
    relevance scorer (retrieval keywording / curation weighting over a
    training corpus). Returns ``(doc_id, term, score, term_rank)``
    with the smooth-idf formulation (sklearn's default):

        idf(t)   = ln((1 + N) / (1 + df(t))) + 1
        score    = tf(t, d) * idf(t)

    Ties break by term ascending (deterministic across engines and
    partitionings).

    Scale shape: ONE corpus-token shuffle total. ``tf`` groups on
    (doc, term) with map-side combine; ``df`` derives from the already
    distinct-per-doc ``tf`` frame (never re-reads the corpus); the idf
    table is vocabulary-sized (bounded — it does NOT grow with corpus
    row count, Heaps' law) and joins back onto ``tf`` as a broadcast,
    so scoring never re-shuffles the corpus. The final top-k window
    repartitions by doc — the second and last exchange.
    """
    n_docs = docs.count()  # 1-row driver aggregate
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .where(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    # tf is distinct per (doc, term), so df(t) = count rows per term.
    idf = tf.groupBy("term").agg(
        (F.log((F.lit(1.0 + n_docs)) / (F.lit(1.0) + F.count("*"))) + F.lit(1.0)).alias("idf")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(
        (F.col("tf") * F.col("idf")).desc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(idf), "term")
        .withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= k)
        .select(
            F.col(id_col),
            F.col("term"),
            F.round(F.col("tf") * F.col("idf"), 6).alias("score"),
            F.col("term_rank"),
        )
    )


def unigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lm_docs: DataFrame | None = None,
    alpha: float = 1.0,
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020
    score Common-Crawl text with a KenLM; the unigram form keeps the
    same contract engine-derivable): train unigram counts on
    ``lm_docs`` (default: the corpus itself), then score every doc —

        logprob(tok) = ln( (c(tok) + alpha) / (N + alpha*V) )
        avg_logprob  = mean over the doc's tokens
        ppl          = exp(-avg_logprob)

    with add-``alpha`` smoothing over the training vocabulary of size
    ``V`` (+1 virtual OOV type, so unseen tokens at score time get the
    same finite smoothed mass instead of -inf). Returns ``(id,
    n_tokens, avg_logprob, ppl)``; low ppl = fluent-under-the-LM, the
    curation ranking signal.

    Scale shape: counts are one token shuffle (map-side combined) into
    a vocabulary-sized dim, BROADCAST back onto the scoring token
    stream; the per-doc aggregate groups on the doc id. N and V ride as
    literals from two 1-row aggregates. Every per-token logprob is a
    deterministic double (exact integer counts into one ln); only the
    per-doc SUM is order-sensitive, absorbed by the caller's rounding.
    """
    train = docs if lm_docs is None else lm_docs
    toks_train = train.select(F.explode(tokens(text_col)).alias("tok"))
    counts = toks_train.groupBy("tok").agg(F.count("*").alias("c")).localCheckpoint()
    row = counts.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("n"), F.count("*").alias("v")
    ).collect()[0]
    n_total, vocab = int(row["n"]), int(row["v"]) + 1  # +1 OOV type
    denom = float(n_total) + alpha * vocab
    score_toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    )
    logprob = F.log((F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha)) / F.lit(denom))
    per_doc = (
        score_toks.join(F.broadcast(counts), "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(logprob).alias("__sum_lp"),
        )
    )
    avg = F.col("__sum_lp") / F.col("n_tokens")
    return per_doc.select(
        F.col(id_col),
        "n_tokens",
        avg.alias("avg_logprob"),
        F.exp(-avg).alias("ppl"),
    )
