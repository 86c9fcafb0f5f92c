"""Distributed cardinality sketching: a deterministic HyperLogLog
(Flajolet et al. 2007) whose every step — hash, register index, rank,
estimator, small-range correction — is re-derivable in ANSI SQL, so
the driver's DuckDB oracle value-hashes the whole sketch pipeline.

Why hand-roll instead of ``approx_count_distinct``: Spark's built-in
HLL++ is the production choice when only Spark reads the answer, but
its hash/bias tables are engine-private — no cross-engine gate, no
mergeable register table a downstream (non-Spark) system can consume.
This sketch keeps the two properties a 100 TB corpus pipeline needs:

- **One shuffle, tiny state.** Registers are ``groupBy(group, bucket).
  max(rank)`` — a partial aggregation, so executors pre-combine to at
  most ``m = 2^p`` rows per group per partition before the exchange;
  the reduce side holds ``groups x m`` integers no matter how many
  billions of values stream through. The estimator is then a per-group
  fold over <= m rows.
- **Deterministic + mergeable.** The register value for a bucket is a
  pure ``max`` of per-value hashes (md5-derived, hex-identical in
  DuckDB — the shared idiom of ``curation.py``/``embedding.py``), so
  re-runs, retries, and unions of partial register tables all agree
  bit-for-bit. ``hll_registers`` exposes the raw registers for exactly
  that: persist per-day register tables, ``max``-merge across days,
  estimate once — the standard sketch-rollup pattern.

Estimator: raw = alpha_m * m^2 / sum(2^-M_j) with empty registers
contributing 2^0; small-range (linear counting) correction
``m * ln(m / V)`` when raw <= 2.5m and V > 0 empty registers remain.
The 32-bit-hash large-range correction is intentionally omitted — it
matters only within ~1% of 2^32 distinct values; at that scale raise
``p`` instead. The 2^-M_j terms are powers of two in [2^-(33-p), 1],
so their sum is EXACT in double regardless of summation order — the
only cross-engine float ops are the final ln/divide (absorbed by the
caller's rounding).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from cartography_spark.operators.embedding import _md5_pick


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_register_exprs(value_col: str, p: int = 8):
    """The (bucket, rank) column pair of the HLL register build for one
    value — shared by the batch :func:`hll_registers` and the streaming
    windowed-register aggregation so both sketch IDENTICAL registers."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    shift = 32 - p
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    rem = h % F.lit(2**shift).cast("long")
    # bin() drops leading zeros on both engines, so the leading-zero
    # count of the (32-p)-bit window is (32-p) - length(bin(rem)),
    # integer-exact — no log2/floor float hazard.
    rank = F.when(rem == 0, F.lit(shift + 1)).otherwise(
        F.lit(shift + 1) - F.length(F.bin(rem))
    )
    return F.shiftright(h, shift), rank


def hll_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """Per-group HLL register table: ``(group..., bucket, rank)`` with
    ``bucket`` the top ``p`` bits of the 32-bit md5-derived hash and
    ``rank`` the max over values of (leading zeros of the remaining
    ``32-p`` bits) + 1. Absent buckets mean rank 0. Register tables
    with the same ``p`` merge by ``max(rank)`` per (group, bucket)."""
    bucket, rank = hll_register_exprs(value_col, p)
    return (
        df.where(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            bucket.alias("bucket"),
            rank.alias("rank"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("rank"))
    )


def hll_estimate(
    regs: DataFrame,
    group_cols: Sequence[str],
    p: int = 8,
) -> DataFrame:
    """Fold a register table ``(group..., bucket, rank)`` (as produced
    by :func:`hll_registers`, possibly max-merged across partial
    tables) into ``(group..., approx_distinct)``. Shared by
    ``hll_distinct`` and the graph-side HyperBall propagation."""
    m = 2**p
    groups = list(group_cols)
    agg = regs.groupBy(*groups).agg(
        F.sum(F.pow(F.lit(0.5), F.col("rank"))).alias("__sum_nz"),
        F.count("*").alias("__nz"),
    )
    sum_inv = F.col("__sum_nz") + (F.lit(m) - F.col("__nz"))
    raw = F.lit(_alpha(m) * m * m) / sum_inv
    v = F.lit(m) - F.col("__nz")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0), F.lit(float(m)) * F.log(F.lit(m) / v)
    ).otherwise(raw)
    return agg.select(*groups, est.alias("approx_distinct"))


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``:
    ``(group..., approx_distinct)`` (double). Standard error is about
    ``1.04 / sqrt(2^p)`` (~6.5% at the default p=8; raise p for
    tighter). NULL values are ignored, matching COUNT(DISTINCT)."""
    return hll_estimate(hll_registers(df, group_cols, value_col, p), group_cols, p)


def count_min_counters(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 64,
    seed: str = "cm",
) -> DataFrame:
    """Count-Min sketch counter table (Cormode & Muthukrishnan 2005)
    for the frequency of ``value_col``: ``depth`` independent hash rows
    of ``width`` buckets each, ``(row, bucket, cnt)``. Counter tables
    with the same shape merge by SUM — the streaming/rollup property
    (per-day counter tables sum into per-month ones exactly).

    Scale shape: one explode to ``depth`` rows per input row, then a
    partially-aggregated ``groupBy(row, bucket).count`` — reduce-side
    state is ``depth * width`` integers no matter how many billions of
    rows stream through. Hashes are the shared md5 idiom (row index
    salted into the key), so counters are deterministic and
    re-derivable in SQL. Integer-exact end to end — no float anywhere.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}, {width}")
    rows = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("string").alias("__v"),
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row"),
    )
    bucket = _md5_pick(
        F.concat(F.lit(seed), F.col("row").cast("string"), F.lit("|"), F.col("__v")),
        F.lit(width).cast("long"),
    )
    return (
        rows.select("row", bucket.alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def count_min_estimate(
    counters: DataFrame,
    candidates: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 64,
    seed: str = "cm",
) -> DataFrame:
    """Point-query the Count-Min counters for every row of
    ``candidates``: ``(value, est)`` with ``est = min over rows of the
    value's bucket counter`` — an overestimate, never an underestimate
    (est >= true count always; the one-sided error is the sketch's
    contract and is test-pinned). ``depth``/``width``/``seed`` must
    match the build. Candidate lookups are a broadcast-sized dim
    exploded to ``depth`` probes and equi-joined to the counters."""
    cand = candidates.select(
        F.col(value_col).cast("string").alias("__v")
    ).distinct()
    probes = cand.select(
        "__v",
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row"),
    )
    bucket = _md5_pick(
        F.concat(F.lit(seed), F.col("row").cast("string"), F.lit("|"), F.col("__v")),
        F.lit(width).cast("long"),
    )
    probes = probes.select("__v", "row", bucket.alias("bucket"))
    return (
        probes.join(counters, ["row", "bucket"], "left")
        .groupBy(F.col("__v").alias(value_col))
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def bloom_bits(
    df: DataFrame,
    value_col: str,
    m_bits: int = 1 << 20,
    k: int = 3,
    seed: str = "bf",
) -> DataFrame:
    """Bloom-filter bit set for the values of ``value_col``: the
    DISTINCT bit indices ``md5(seed || i || '|' || value) % m_bits``
    over hash functions ``i in [0, k)`` — ``(bit)`` rows. Bit tables
    with the same (m_bits, k, seed) merge by UNION DISTINCT.

    The at-scale membership path: ``curation.decontaminate`` broadcasts
    the raw benchmark n-gram set, which stops working when the blocklist
    outgrows the broadcast budget; the bloom form ships ``<= m_bits``
    integers (at most a few MB for billions of members at ~10 bits per
    member) with a bounded, one-sided false-positive rate — exactly the
    "maybe contaminated -> route to the exact check" pre-filter.
    Deterministic md5 bits, so the whole filter is re-derivable in SQL.
    """
    if k < 1 or m_bits < 2:
        raise ValueError(f"need k >= 1 and m_bits >= 2, got {k}, {m_bits}")
    probes = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("string").alias("__v"),
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("__i"),
    )
    bit = _md5_pick(
        F.concat(F.lit(seed), F.col("__i").cast("string"), F.lit("|"), F.col("__v")),
        F.lit(m_bits).cast("long"),
    )
    return probes.select(bit.alias("bit")).distinct()


def bloom_maybe_contains(
    df: DataFrame,
    bits: DataFrame,
    value_col: str,
    m_bits: int = 1 << 20,
    k: int = 3,
    seed: str = "bf",
    out_col: str = "maybe_member",
) -> DataFrame:
    """Add ``out_col``: true iff ALL ``k`` bloom bits of the row's
    ``value_col`` are set in ``bits`` — never a false negative, false
    positives at the standard ``(1 - e^(-kn/m))^k`` rate. The bit table
    is broadcast (it is at most ``m_bits`` rows by construction); the
    per-row verdict is one broadcast LEFT join per probe + an all-bits
    count, grouped back on the ORIGINAL row via a generated row key so
    duplicate values keep their multiplicity."""
    # Transient per-row key: grouping the k probes back on the row's
    # COLUMNS would merge exact duplicate rows and their probe counts
    # (sum = n*k != k -> a false NEGATIVE for a duplicated member); the
    # key never leaves this function, so the output multiset stays
    # deterministic.
    keyed = df.withColumn("__rk", F.monotonically_increasing_id())
    probes = keyed.select(
        "__rk",
        F.col(value_col).alias("__v"),
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("__i"),
    )
    bit = _md5_pick(
        F.concat(
            F.lit(seed),
            F.col("__i").cast("string"),
            F.lit("|"),
            F.col("__v").cast("string"),
        ),
        F.lit(m_bits).cast("long"),
    )
    marked = probes.withColumn("__bit", bit).join(
        F.broadcast(bits.select(F.col("bit").alias("__bit"), F.lit(1).alias("__hit"))),
        "__bit",
        "left",
    )
    verdicts = marked.groupBy("__rk").agg(
        (F.sum(F.coalesce(F.col("__hit"), F.lit(0))) == F.lit(k)).alias(out_col)
    )
    return keyed.join(verdicts, "__rk").drop("__rk")


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 128,
) -> DataFrame:
    """Per-group KMV (bottom-k distinct-hash) sketch (Bar-Yossef et
    al. / Beyer et al.'s "distinct sampling"): ``(group..., h)`` rows —
    the ``k`` SMALLEST 32-bit md5 hashes of the group's distinct
    values. Unlike HLL registers this sketch supports SET ALGEBRA:
    bottom-k of a union is re-derivable from the members' sketches
    (union the hash rows, keep the k smallest), which is what powers
    pairwise overlap estimation. Merge = union + re-bottom-k.

    Scale shape: one distinct over (group, hash) — map-side combined —
    then one per-group window capped at k rows; group state never
    exceeds k hashes.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql.window import Window

    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    groups = list(group_cols)
    hashed = (
        df.where(F.col(value_col).isNotNull())
        .select(*groups, h.alias("h"))
        .distinct()
    )
    win = Window.partitionBy(*groups).orderBy("h")
    return (
        hashed.withColumn("__rn", F.row_number().over(win))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_jaccard_pairs(
    sketch: DataFrame,
    group_col: str,
    k: int = 128,
) -> DataFrame:
    """Pairwise Jaccard estimates between every two groups of a
    :func:`kmv_sketch` table: for pair (a < b), take the k smallest
    hashes of the UNION of the two sketches (valid — the union's
    bottom-k is a subset of the sketches' union) and report the
    fraction present in BOTH sketches: ``(group_a, group_b,
    jaccard_est)``. The standard coordinated-sample estimator; the
    cross-corpus overlap audit (which sources share content /
    vocabulary) at sketch cost instead of a full set join.

    The pair table is |groups|² rows of <= 2k hashes each — sketch-
    sized, never corpus-sized; everything after the sketch build is
    joins between k-row-per-group dims.
    """
    from pyspark.sql.window import Window

    g = sketch.select(F.col(group_col).alias("__g"), "h")
    a = g.select(F.col("__g").alias("group_a"), "h", F.lit(1).alias("in_a"))
    b = g.select(F.col("__g").alias("group_b"), "h", F.lit(1).alias("in_b"))
    pairs = (
        a.select("group_a")
        .distinct()
        .join(b.select("group_b").distinct())
        .where(F.col("group_a") < F.col("group_b"))
    )
    rows = pairs.join(a, "group_a").select(
        "group_a", "group_b", "h", "in_a", F.lit(0).alias("in_b")
    ).unionAll(
        pairs.join(b, "group_b").select(
            "group_a", "group_b", "h", F.lit(0).alias("in_a"), "in_b"
        )
    )
    merged = rows.groupBy("group_a", "group_b", "h").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    win = Window.partitionBy("group_a", "group_b").orderBy("h")
    bottom = merged.withColumn("__rn", F.row_number().over(win)).where(
        F.col("__rn") <= k
    )
    return bottom.groupBy("group_a", "group_b").agg(
        (F.sum(F.col("in_a") * F.col("in_b")) / F.count("*")).alias("jaccard_est")
    )
