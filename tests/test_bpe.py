"""BPE merge learning (operators/bpe.py). Model = the classic
sequential Sennrich recipe (dict-of-words get_stats + greedy in-word
merge), a genuinely different implementation of the same spec; parity
on hand corpora and a pseudo-random corpus, overlap greediness pins,
and partition invariance.
"""

from __future__ import annotations

import hashlib

from cartography_spark.operators.bpe import (
    bpe_merge_rules,
    bpe_segment,
    word_frequencies,
    _initial_symbols,
)


def model_bpe(texts, k):
    """Sequential BPE: returns [(rank, left, right, count, merged)]."""
    vocab = {}
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                vocab[w] = vocab.get(w, 0) + 1
    words = {w: [c for c in w] for w in vocab}
    rules = []
    for rank in range(1, k + 1):
        stats = {}
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + vocab[w]
        if not stats:
            break
        (l, r), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((rank, l, r, cnt, l + r))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return rules, words


def _run(spark, texts, k, partitions=None):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    if partitions:
        df = df.repartition(partitions)
    rows = bpe_merge_rules(df, k=k).collect()
    return sorted(
        (r["merge_rank"], r["left"], r["right"], r["pair_count"], r["merged"])
        for r in rows
    )


def test_hand_corpus_first_merges(spark):
    # 'low' x5, 'lower' x2: classic example — (l,o) count 7 wins round
    # 1; round 2 merges (lo,w) count 7.
    texts = ["low low low low low", "lower lower"]
    got = _run(spark, texts, k=2)
    assert got[0] == (1, "l", "o", 7, "lo")
    assert got[1] == (2, "lo", "w", 7, "low")
    assert got == sorted(model_bpe(texts, 2)[0])


def test_overlapping_run_merges_greedily_left(spark):
    # 'aaaa': pairs (a,a) x3 -> count 3; greedy-left merge yields
    # ['aa','aa'], so round 2 sees (aa,aa) x1.
    texts = ["aaaa"]
    got = _run(spark, texts, k=2)
    assert got[0] == (1, "a", "a", 3, "aa")
    assert got[1] == (2, "aa", "aa", 1, "aaaa")
    assert got == sorted(model_bpe(texts, 2)[0])


def test_tie_breaks_are_lexicographic(spark):
    # 'ab' and 'cd' both appear twice: (a,b) and (c,d) tie at 2;
    # (a,b) wins the pair-asc tie-break.
    texts = ["ab cd", "ab cd"]
    got = _run(spark, texts, k=1)
    assert got == [(1, "a", "b", 2, "ab")]


def test_exhausted_vocab_returns_fewer_rules(spark):
    # Single word 'ab' merges once; afterwards no pair remains, so
    # k=5 yields exactly 1 rule and the vocab survives untouched.
    got = _run(spark, ["ab"], k=5)
    assert got == [(1, "a", "b", 1, "ab")]


def _pseudo_texts(n=60):
    words = []
    for i in range(n):
        h = hashlib.md5(f"w{i}".encode()).hexdigest()
        words.append(h[: 3 + int(h[0], 16) % 5])
    return [" ".join(words[i::6]) for i in range(6)]


def test_model_parity_on_pseudo_random_corpus(spark):
    texts = _pseudo_texts()
    assert _run(spark, texts, k=6) == sorted(model_bpe(texts, 6)[0])


def test_partition_invariance(spark):
    texts = _pseudo_texts(36)
    assert _run(spark, texts, k=4, partitions=1) == _run(
        spark, texts, k=4, partitions=7
    )


def test_segment_replays_rules_to_same_vocab_state(spark):
    texts = _pseudo_texts(30)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rules = bpe_merge_rules(df, k=4)
    replayed = bpe_segment(_initial_symbols(word_frequencies(df)), rules)
    _, model_words = model_bpe(texts, 4)
    got = {r["word"]: list(r["syms"]) for r in replayed.collect()}
    assert got == model_words
