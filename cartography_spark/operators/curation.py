"""Corpus-curation operators for training-data pipelines: repetition
metrics, benchmark decontamination, and stratified sampling.

These are the remaining curation stages a web-scale pretraining
pipeline runs between extraction and dedup (the reference's analog is
its per-module data shaping before MERGE — e.g.
``cartography/intel/aws/ec2/instances.py`` transform steps — but these
three are LLM-pipeline-specific and covered here as first-class
operators per the round brief):

- :func:`repetition_features` — Gopher-style per-document repetition
  signals (Rae et al. 2021, "Scaling Language Models", §A.1.1:
  duplicate-word fraction, duplicate n-gram fraction, most-frequent-
  word fraction). Entirely per-row JVM expressions — ZERO shuffle, so
  at 100 TB it is a pure map stage that rides the scan.
- :func:`decontaminate` — benchmark n-gram overlap removal (the
  GPT-3/PaLM eval-decontamination rule: drop any training doc sharing
  an n-gram with an eval benchmark). The benchmark side is tiny by
  definition, so the gram set broadcasts and the corpus side streams
  through a broadcast semi-join: no corpus shuffle, only the matched
  doc-id set (≪ corpus) shuffles for its distinct.
- :func:`stratified_sample` — deterministic per-stratum hash sampling
  (data-mixing / temperature-rebalancing between languages or
  sources). A pure filter on an md5 bucket of the id: no shuffle, no
  RNG state, reproducible across runs/executors/engines by
  construction (md5 is hex-identical in DuckDB, so the driver oracle
  hash-gates exact row membership).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cartography_spark.functions.textstats import tokens, word_shingles


def _dup_frac(arr: Column) -> Column:
    """Fraction of array elements that are repeats of an earlier
    element: 1 - distinct/total (total >= 1 for any non-null text since
    split('') = [''])."""
    return F.round(F.lit(1.0) - F.size(F.array_distinct(arr)) / F.size(arr), 4)


def _top_run_frac(arr: Column) -> Column:
    """max(element multiplicity) / len(arr), computed per-row with a
    single fold over the SORTED array (equal elements are adjacent, so
    the longest run IS the highest multiplicity). No explode, no
    shuffle — the groupBy(doc, word) formulation costs a corpus-sized
    exchange for a value a fold gets for free."""
    run1 = lambda acc, w: F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
    best = F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            run1(acc, w).alias("run"),
            F.greatest(acc["best"], run1(acc, w)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.round(best / F.size(arr), 4)


def repetition_features(
    df: DataFrame,
    text_col: str = "text",
    ngram: int = 5,
    top_word_max: float = 0.2,
    dup_ngram_max: float = 0.2,
) -> DataFrame:
    """Append per-document repetition signals + a ``repetitive`` flag.

    Columns added (all deterministic, 4-dp rounded for oracle hashing):
    ``n_tokens``, ``dup_word_frac`` (1 - distinct words / words),
    ``dup_ngram_frac`` (1 - distinct word n-grams / n-grams),
    ``top_word_frac`` (most frequent word's share), and ``repetitive``
    (true when either threshold trips — the Gopher-rule shape).

    Every column is a JVM expression over the row's own token array:
    the operator adds no exchange to whatever plan it is appended to.
    The ``top_word_frac`` fold deliberately avoids the textbook
    explode→groupBy(doc, word)→max formulation, which would shuffle
    every token of a 100 TB corpus to compute a per-row scalar.
    """
    toks = tokens(text_col)
    sh = word_shingles(text_col, ngram)
    out = (
        df.withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn("dup_word_frac", _dup_frac(toks).cast("double"))
        .withColumn("dup_ngram_frac", _dup_frac(sh).cast("double"))
        .withColumn("top_word_frac", _top_run_frac(toks).cast("double"))
    )
    return out.withColumn(
        "repetitive",
        (F.col("top_word_frac") > top_word_max)
        | (F.col("dup_ngram_frac") > dup_ngram_max),
    )


def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 10,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """The contaminated-id frame (ids of corpus docs sharing any word
    ``ngram``-gram with the benchmark; bounded by benchmark reach, not
    corpus size) — the shared core of :func:`decontaminate`, the
    curation-funnel query, and the ``cli curate`` flag join: ONE
    implementation of the gram join, not three divergent copies."""
    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(word_shingles(text_col, ngram))).alias("__gram")
        ).distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    corpus_grams = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, ngram))).alias("__gram"),
    )
    return corpus_grams.join(bench_grams, "__gram").select(id_col).distinct()


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 10,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Remove corpus documents sharing any word ``ngram``-gram with the
    benchmark set (eval-set decontamination).

    Returns the surviving corpus rows (original schema). The benchmark
    gram set is distinct-ed and (by default) BROADCAST: benchmarks are
    a few thousand documents against a 10^12-page corpus, so the
    corpus-side exploded grams stream through a broadcast hash
    semi-join with no exchange; only the contaminated id set (bounded
    by the benchmark's reach, not the corpus) shuffles for its
    distinct, and the final removal is a broadcast-able anti-join on
    ids. Set ``broadcast_benchmark=False`` if the benchmark gram set
    genuinely exceeds driver memory — the joins then fall back to
    shuffle joins keyed on the gram.

    Documents shorter than ``ngram`` words contribute their whole text
    as a single gram (same convention as
    :func:`~cartography_spark.functions.textstats.word_shingles`), so
    short-doc contamination degrades to exact-text match rather than
    silently passing.
    """
    contaminated = contaminated_ids(
        corpus, benchmark, id_col, text_col, ngram, broadcast_benchmark
    )
    return corpus.join(F.broadcast(contaminated), id_col, "left_anti")


def sample_bucket(id_col: Column | str, denom: int = 1000) -> Column:
    """Deterministic sampling bucket in [0, denom): the first 8 md5 hex
    digits of the stringified id as an integer, mod ``denom``. md5 (not
    xxhash64) so the DuckDB oracle reproduces membership bit-exactly;
    the per-row cost is one digest over a short key, paid only in this
    operator (dedup's hot paths keep their faster families)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
        % denom
    )


def sample_keep(
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 1.0,
    denom: int = 1000,
) -> Column:
    """The row-local keep-condition of :func:`stratified_sample`,
    exposed so the CLI funnel and streaming paths share the EXACT same
    membership expression (same map, same bucket, same denominator)."""
    if not 0 < denom:
        raise ValueError("denom must be positive")
    rate_map = F.create_map(*[F.lit(x) for kv in rates.items() for x in kv])
    rate = F.coalesce(
        F.element_at(rate_map, F.col(strata_col).cast("string")),
        F.lit(float(default_rate)),
    )
    return sample_bucket(id_col, denom) < rate * denom


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 1.0,
    denom: int = 1000,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its
    :func:`sample_bucket` falls below ``rate(stratum) * denom``.

    This is the data-mixing primitive (rebalance languages / sources /
    domains before training): a pure row-local filter — no shuffle, no
    RNG seed plumbing, and membership is a function of the id alone, so
    re-runs, retries, and different cluster sizes keep IDENTICAL
    samples (the property `df.sample()` cannot give across plans).
    Strata absent from ``rates`` keep ``default_rate``.
    """
    return df.where(sample_keep(strata_col, rates, id_col, default_rate, denom))


def split_assignment(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    out_col: str = "split",
    denom: int = 1_000_000,
) -> DataFrame:
    """Deterministic train/validation/test split: every row gets the
    label of the first split whose cumulative-fraction boundary its
    :func:`sample_bucket` falls under. ``fractions`` must sum to 1
    (±1e-9) — the splits are DISJOINT and COMPLETE by construction.

    Same guarantees as :func:`stratified_sample` and for the same
    reason (membership is a pure function of the id): re-runs, retries,
    and cluster sizes all produce the identical split, and eval rows
    can never leak into train across pipeline versions. Boundaries are
    pre-rounded INTEGER bucket thresholds, so there is no float
    comparison for an oracle to disagree with. Row-local — no shuffle.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = sample_bucket(id_col, denom)
    expr = None
    cum = 0.0
    for label, frac in fractions.items():
        cum += frac
        bound = int(round(cum * denom))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    # Float rounding could leave the last boundary a hair under denom;
    # pin completeness by folding the tail into the last label.
    expr = expr.otherwise(F.lit(label))
    return df.withColumn(out_col, expr)


def weighted_sample(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
    id_col: str,
    k: int,
    seed: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k rows per
    group with inclusion probability proportional to ``weight_col``
    (Efraimidis & Spirakis 2006, via the exponential race: each row
    draws key = -ln(u)/w with u a uniform md5 function of the id, and
    the k SMALLEST keys win — equivalent to their u^(1/w) top-k form
    but numerically better conditioned). Adds ``sample_rank`` (1..k).

    The quality-weighted data-mixing primitive ``stratified_sample``
    can't give: "take the best-ish 100k docs per language, biased by
    quality score, reproducibly". Weights must be > 0 (validated via a
    1-row aggregate); groups with fewer than k rows keep all rows.

    Determinism: u = (bucket(id) + 1) / 2^32 over the shared md5 idiom
    — a pure function of (seed, id), so membership survives re-runs,
    retries, and any parallelism, and the DuckDB twin re-derives every
    key. Distributed shape: the key is row-local; selection is one
    ``row_number`` over (group, key asc, id asc) — a single hash
    exchange on the group, exactly the agg_window_topk_o1 plan.
    """
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    bad = df.agg(
        F.coalesce(
            F.sum((F.col(weight_col).isNull() | (F.col(weight_col) <= 0)).cast("int")),
            F.lit(0),
        ).alias("n")
    ).collect()[0]["n"]
    if bad:
        raise ValueError(f"{bad} row(s) have NULL or non-positive {weight_col!r}")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    # u in (0, 1]: (h + 1) / 2^32 — never 0, so ln(u) is finite.
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**32))
    key = -F.log(u) / F.col(weight_col).cast("double")
    win = Window.partitionBy(*group_cols).orderBy(
        F.col("__ws_key").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__ws_key", key)
        .withColumn("sample_rank", F.row_number().over(win))
        .where(F.col("sample_rank") <= k)
        .drop("__ws_key")
    )


def mixture_plan(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    targets: dict[str, float],
) -> DataFrame:
    """Data-mixing planner: given per-stratum target shares (summing to
    1), compute the per-stratum sampling rates that realize the target
    mixture WITHOUT upsampling — scale the total corpus down to the
    largest T with ``share_i * T <= available_i`` for every stratum
    (T = min_i available_i / share_i; the scarcest stratum is kept
    whole), then ``rate_i = share_i * T / available_i``. Returns
    ``(stratum, n_rows, available, target_share, rate, planned)`` —
    feed ``rate`` per stratum into :func:`stratified_sample` to
    materialize the plan. Strata absent from ``targets`` get rate 0
    (excluded from the mix; their rows still report).

    All distributed: per-stratum sums, a broadcast literal target map,
    and a 1-row min cross-joined back — no collect. The arithmetic is
    (sum / literal) ratios of exact aggregates, identical on both
    engines into the final rounding.
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    total = sum(targets.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"target shares must sum to 1, got {total}")
    if any(v <= 0 for v in targets.values()):
        raise ValueError("target shares must be > 0")
    tmap = F.create_map(*[F.lit(x) for kv in targets.items() for x in kv])
    stats = (
        df.groupBy(F.col(strata_col).alias("stratum"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col(weight_col)).cast("double").alias("available"),
        )
        .withColumn(
            "target_share",
            F.coalesce(
                F.element_at(tmap, F.col("stratum").cast("string")), F.lit(0.0)
            ),
        )
    )
    t_max = stats.where(F.col("target_share") > 0).agg(
        F.coalesce(
            F.min(F.col("available") / F.col("target_share")), F.lit(0.0)
        ).alias("__t")
    )
    out = stats.crossJoin(F.broadcast(t_max))
    # A targeted stratum with zero available weight pins T to 0 (the
    # mix is infeasible without it — everything gets rate 0, loudly
    # visible in the plan, rather than a NaN from 0/0); a targeted
    # stratum ABSENT from the data doesn't constrain T at all (no row
    # to report), which the caller should treat the same way.
    feasible = (F.col("target_share") > 0) & (F.col("available") > 0)
    rate = F.when(
        feasible, F.col("target_share") * F.col("__t") / F.col("available")
    ).otherwise(F.lit(0.0))
    planned = F.when(feasible, F.col("target_share") * F.col("__t")).otherwise(
        F.lit(0.0)
    )
    return out.select(
        "stratum", "n_rows", "available", "target_share",
        rate.alias("rate"), planned.alias("planned"),
    )


def calibrate_scores(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    out_col: str = "pct_rank",
    ascending: bool = True,
) -> DataFrame:
    """Per-group percentile-rank calibration of a score column:
    ``percent_rank`` = (rank - 1) / (n - 1) within the group (0 for a
    singleton), ties sharing a rank — the cross-source normalization
    that makes quality thresholds comparable between heterogeneous
    sources (a "0.9" means top-decile IN ITS OWN source, whatever the
    raw score scale there). One window = one hash exchange on the
    group. Rank by an integer-valued score (e.g. token counts, exact
    fingerprint counts) for a bit-stable cross-engine contract; float
    scores calibrate fine but inherit the usual near-tie caveat.
    """
    from pyspark.sql.window import Window

    order = F.col(score_col).asc() if ascending else F.col(score_col).desc()
    win = Window.partitionBy(*group_cols).orderBy(order)
    return df.withColumn(out_col, F.percent_rank().over(win))


def domain_quality(
    docs: DataFrame,
    domain_col: str = "source",
    k: float = 20.0,
    text_col: str = "text",
) -> DataFrame:
    """Per-domain quality with empirical-Bayes shrinkage — the
    domain-level filter signal a crawl curator ranks hosts by (the
    C4/RefinedWeb-style "good domain" prior). A domain's raw mean
    quality is shrunk toward the corpus mean by its evidence:

        shrunk = (n * raw_mean + k * global_mean) / (n + k)

    so a 3-page domain with lucky scores cannot outrank a 10k-page
    domain of consistently good text (k = pseudo-count prior
    strength).

    Returns (``domain_col``, n_docs, raw_mean, shrunk_score), floats
    ROUND 6. Scale shape: per-doc scoring is scan-stage JVM work
    (functions/textstats.py); the domain agg is ONE partial-agg hash
    shuffle whose output is domain-cardinality; the global mean is a
    1-row aggregate cross-joined back (never collected). Reference
    analog: none — training-data family (SURVEY §2 "beyond the
    reference"), the domain-level companion of the per-doc Gopher
    gates above.
    """
    from cartography_spark.functions.textstats import quality_features

    scored = quality_features(docs, text_col)
    per_dom = scored.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs"),
        F.avg("quality_score").alias("__raw"),
    )
    glob = scored.agg(F.avg("quality_score").alias("__g"))
    return (
        per_dom.crossJoin(F.broadcast(glob))
        .select(
            F.col("domain").alias(domain_col),
            "n_docs",
            F.round("__raw", 6).alias("raw_mean"),
            F.round(
                (F.col("n_docs") * F.col("__raw") + F.lit(k) * F.col("__g"))
                / (F.col("n_docs") + F.lit(k)),
                6,
            ).alias("shrunk_score"),
        )
    )
