"""Training-corpus generation for KG embeddings: deterministic
random-walk corpora (DeepWalk / node2vec-style, Perozzi et al. KDD'14)
and corrupted-triple negative sampling (TransE-style, Bordes et al.
NeurIPS'13).

A web-scale KG build feeds two standard downstream trainers: skip-gram
over node sequences (walk corpora) and margin-ranking over
(true, corrupted) triple pairs (negative samples). Both are
embarrassingly parallel *given determinism* — and determinism is the
hard part on a cluster, because naive RNG draws depend on partition
order. Here every "random" draw is a pure function of the walk/triple
identity via the md5 idiom shared with ``curation.py``/``packing.py``
(hex-identical in DuckDB, so the driver oracle re-derives every pick),
which also makes re-runs reproducible at any parallelism — the same
property the deterministic pages generator provides upstream
(reference analog: the reference seeds nothing and relies on Neo4j's
MERGE idempotency; a distributed trainer needs the stronger guarantee).

Scale shape:

- ``random_walks``: the adjacency list is staged ONCE with a
  per-source ``row_number`` index (the distributed alias-table build —
  one hash exchange on ``src``) and ``localCheckpoint``-ed; each step
  is then two equi-joins (walker -> out-degree on the current node,
  walker -> adjacency on ``(node, picked_index)``). Joining on the
  COMPOSITE ``(src, idx)`` key is what keeps hubs safe: a walker at a
  10^7-degree hub matches exactly one adjacency row, never fans out.
  Walkers that reach a dangling node simply drop out (inner join).
  Steps are fixed-count with per-step lineage truncation, like every
  iterative operator here.
- ``negative_samples``: the entity dictionary (id -> dense index) is a
  broadcast-sized dim by construction (distinct objects); corruption is
  a row-local md5 draw joined back on the dense index, then one
  anti-join against the true-triple set filters accidental positives
  (including identity corruptions). Cost: one broadcast join + one
  shuffled anti-join on the triple key — no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _md5_pick(key, denom):
    """Deterministic draw in [0, denom): first 8 md5 hex digits of
    ``key`` as an integer, mod ``denom`` — the shared cross-engine
    idiom (md5, not xxhash64, so DuckDB re-derives it hex-identically).
    """
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % denom


def random_walks(
    edges: DataFrame,
    walk_len: int,
    num_walks: int = 1,
    seed: str = "walk",
) -> DataFrame:
    """Deterministic random-walk corpus over directed ``edges(src,
    dst)``: ``num_walks`` walks of up to ``walk_len`` steps from EVERY
    node, step picks drawn as ``md5(seed || walk_id || ':' || step) %
    outdeg`` over the dst-sorted adjacency index. Returns
    ``(walk, step, id)`` — one row per visited position, step 0 the
    start node; a walk ends early at a dangling node.

    The draw depends only on ``(seed, walk identity, step)`` — never on
    partition order or a stateful RNG — so the corpus is bit-identical
    at any parallelism and re-derivable by the SQL oracle twin.
    """
    if walk_len < 0:
        raise ValueError(f"walk_len must be >= 0, got {walk_len}")
    if num_walks < 1:
        raise ValueError(f"num_walks must be >= 1, got {num_walks}")
    adj = (
        edges.select("src", "dst")
        .distinct()
        .withColumn(
            "idx",
            F.row_number().over(Window.partitionBy("src").orderBy("dst")) - 1,
        )
        .localCheckpoint()
    )
    outdeg = adj.groupBy("src").agg(F.count("*").alias("outdeg")).localCheckpoint()
    starts = (
        adj.select(F.col("src").alias("id"))
        .unionAll(adj.select(F.col("dst").alias("id")))
        .distinct()
    )
    state = (
        starts.select(
            "id",
            F.explode(
                F.array(*[F.lit(str(w)) for w in range(num_walks)])
            ).alias("__w"),
        )
        .select(
            F.concat(F.col("id"), F.lit("#"), F.col("__w")).alias("walk"),
            F.col("id").alias("cur"),
        )
        .localCheckpoint()
    )

    out = state.select("walk", F.lit(0).alias("step"), F.col("cur").alias("id"))
    for t in range(1, walk_len + 1):
        pick = _md5_pick(
            F.concat(F.lit(seed), F.col("walk"), F.lit(":"), F.lit(str(t))),
            F.col("outdeg"),
        )
        stepped = (
            state.join(outdeg, state["cur"] == outdeg["src"])
            .select("walk", "cur", pick.alias("__pick"))
            .join(
                adj,
                (F.col("cur") == adj["src"]) & (F.col("__pick") == adj["idx"]),
            )
            .select("walk", F.col("dst").alias("cur"))
            .localCheckpoint()
        )
        out = out.unionAll(
            stepped.select("walk", F.lit(t).alias("step"), F.col("cur").alias("id"))
        )
        state = stepped
    return out


def negative_samples(
    triples: DataFrame,
    k: int = 2,
    seed: str = "neg",
) -> DataFrame:
    """TransE-style corrupted negatives for ``triples(subj, pred,
    obj)``: for each true triple and each ``j in [0, k)``, replace the
    object with the entity at index ``md5(seed || subj|pred|obj|j) %
    |E|`` of the ent-sorted object dictionary, then drop corruptions
    that collide with ANY true triple (the standard "filtered" setting
    — identity corruptions fall out as a special case). Returns
    ``(subj, pred, neg_obj, j)``; fewer than ``k`` negatives survive
    for a triple exactly when draws collide with true triples.

    Every draw is a pure function of the triple identity, so the
    negative set is reproducible at any parallelism and re-derivable by
    the SQL oracle twin.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    t = triples.select("subj", "pred", "obj")
    # The global row_number IS a SinglePartition window (Spark warns) —
    # deliberately: it runs over the distinct-ENTITY dictionary, a
    # dim-sized frame (same budget class as a broadcast dim), never the
    # triple stream. A corpus-sized global sort would be the packing.py
    # prefix-scan shape instead.
    ents = (
        t.select(F.col("obj").alias("ent"))
        .distinct()
        .withColumn("__eidx", F.row_number().over(Window.orderBy("ent")) - 1)
        .localCheckpoint()
    )
    n_ents = ents.count()  # 1-row driver aggregate; dictionary is dim-sized
    drawn = t.select(
        "subj",
        "pred",
        "obj",
        F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("j"),
    ).withColumn(
        "__pick",
        _md5_pick(
            F.concat(
                F.lit(seed),
                F.col("subj"), F.lit("|"),
                F.col("pred"), F.lit("|"),
                F.col("obj"), F.lit("|"),
                F.col("j").cast("string"),
            ),
            F.lit(n_ents).cast("long"),
        ),
    )
    corrupted = drawn.join(
        F.broadcast(ents), drawn["__pick"] == ents["__eidx"]
    ).select("subj", "pred", F.col("ent").alias("neg_obj"), "j")
    return corrupted.join(
        t.select("subj", "pred", F.col("obj").alias("neg_obj")),
        ["subj", "pred", "neg_obj"],
        "left_anti",
    )


def skipgram_pairs(
    walks: DataFrame,
    window: int = 2,
) -> DataFrame:
    """Skip-gram training pairs from a walk corpus ``(walk, step, id)``
    (the output of :func:`random_walks`): every ordered (center,
    context) node pair within ``window`` steps on the same walk —
    ``(center, context, offset)`` with ``offset = context_step -
    center_step`` in ``[-window, window] \\ {0}``. This is the word2vec
    data layout DeepWalk trains on; downstream negative sampling comes
    from :func:`negative_samples`.

    Scale shape: one self-equi-join on the walk id with the bounded
    step-range predicate — fan-out per row is at most ``2*window``,
    never the walk length, and walks are short by construction, so the
    join key (walk) is near-unique: no hot keys. Exact, no floats.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    a = walks.select(
        F.col("walk").alias("__w"), F.col("step").alias("__s"), F.col("id").alias("center")
    )
    b = walks.select(
        F.col("walk").alias("__w"), F.col("step").alias("__t"), F.col("id").alias("context")
    )
    return (
        a.join(b, "__w")
        .where(
            (F.col("__t") != F.col("__s"))
            & (F.abs(F.col("__t") - F.col("__s")) <= window)
        )
        .select(
            "center",
            "context",
            (F.col("__t") - F.col("__s")).alias("offset"),
        )
    )


def node2vec_walks(
    edges: DataFrame,
    walk_len: int,
    p: float = 2.0,
    q: float = 0.5,
    num_walks: int = 1,
    seed: str = "n2v",
) -> DataFrame:
    """Second-order biased walks (node2vec, Grover & Leskovec KDD'16):
    from state (prev, cur), neighbor ``x`` of ``cur`` is drawn with
    weight 1/p if ``x == prev`` (return), 1 if the directed edge
    ``prev -> x`` exists (stay near), else 1/q (explore); the first
    step is uniform. Returns ``(walk, step, id)`` like
    :func:`random_walks`. Low q biases outward (DFS-ish, structural
    roles); low p biases homophily — the standard lever DeepWalk lacks.

    Determinism: the draw is the md5 uniform u = (h+1)/2^32 against the
    dst-sorted cumulative weight profile — a pure function of (seed,
    walk, step), parallelism-invariant and re-derivable in SQL. Choose
    p, q as powers of two (the defaults) and every cumulative sum is a
    dyadic rational: EXACT in double on both engines, so even the
    CDF comparisons carry no float-boundary risk.

    Scale shape per step: one adjacency join fans each walker out to
    deg(cur) candidate rows (second-order transitions need the weight
    PROFILE, not just one row — the inherent cost of exact node2vec;
    production walkers amortize it with per-(prev, cur) alias tables,
    cf. KnightKing), one edge-existence LEFT join on (prev, x), and two
    walk-partitioned windows that ride one hash exchange. State is
    truncated per step.
    """
    if walk_len < 0:
        raise ValueError(f"walk_len must be >= 0, got {walk_len}")
    if num_walks < 1:
        raise ValueError(f"num_walks must be >= 1, got {num_walks}")
    if p <= 0 or q <= 0:
        raise ValueError(f"p and q must be > 0, got {p}, {q}")
    e = edges.select("src", "dst").distinct().localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    state = (
        nodes.select(
            "id",
            F.explode(
                F.array(*[F.lit(str(w)) for w in range(num_walks)])
            ).alias("__w"),
        )
        .select(
            F.concat(F.col("id"), F.lit("#"), F.col("__w")).alias("walk"),
            F.lit(None).cast("string").alias("prev"),
            F.col("id").alias("cur"),
        )
        .localCheckpoint()
    )
    out = state.select("walk", F.lit(0).alias("step"), F.col("cur").alias("id"))
    ret_w, far_w = 1.0 / p, 1.0 / q
    for t in range(1, walk_len + 1):
        cand = state.join(e, state["cur"] == e["src"]).select(
            "walk", "prev", "cur", F.col("dst").alias("x")
        )
        dist1 = e.select(
            F.col("src").alias("__p"), F.col("dst").alias("__x"), F.lit(1).alias("__d1")
        )
        weighted = cand.join(
            dist1,
            (cand["prev"] == dist1["__p"]) & (cand["x"] == dist1["__x"]),
            "left",
        ).select(
            "walk",
            "cur",
            "x",
            F.when(F.col("prev").isNull(), F.lit(1.0))
            .when(F.col("x") == F.col("prev"), F.lit(ret_w))
            .when(F.col("__d1").isNotNull(), F.lit(1.0))
            .otherwise(F.lit(far_w))
            .alias("alpha"),
        )
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), F.col("walk"), F.lit(f":{t}"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        u = (h + F.lit(1)).cast("double") / F.lit(float(2**32))
        keyed = weighted.select(
            "walk",
            "cur",
            "x",
            F.sum("alpha").over(Window.partitionBy("walk")).alias("tot"),
            F.sum("alpha")
            .over(
                Window.partitionBy("walk")
                .orderBy("x")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .alias("cum"),
            u.alias("u"),
        )
        # The winner is the SMALLEST x whose cum clears the target — a
        # plain min over the filtered profile (same order the CDF was
        # built in), which partially aggregates map-side; a row_number
        # window here would re-sort the whole candidate fan-out.
        picked = (
            keyed.where(F.col("cum") > F.col("u") * F.col("tot"))
            .groupBy("walk")
            .agg(F.min(F.struct(F.col("x"), F.col("cur"))).alias("__s"))
            .select(
                "walk",
                F.col("__s.cur").alias("prev"),
                F.col("__s.x").alias("cur"),
            )
            .localCheckpoint()
        )
        out = out.unionAll(
            picked.select("walk", F.lit(t).alias("step"), F.col("cur").alias("id"))
        )
        state = picked
    return out
