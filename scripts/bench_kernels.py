"""Kernel-family A/B microbench: times each hash/verify engine of the
dedup & blocking kernels on the same input and prints ONE JSON line —
the reproducible source of the engine-choice numbers quoted in
PLANS.md / STATUS.md (round 5: arrow MinHash ~2.4x xxhash64, arrow2
SimHash ~4x arrow, checkpoint barrier ~2x on simhash).

Usage: python scripts/bench_kernels.py [sf_dir] [reps]

Protocol: same as bench.py — noop-sink materialization (full execution,
no driver collect), interleaved best-of-k per engine so a host noise
burst cannot flatter one side, input pre-materialized and warmed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cartography_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from cartography_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs

    spark = get_spark(
        app_name="bench-kernels",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.write.format("noop").mode("overwrite").save()  # warm

    cases = {
        "minhash_xxhash64": lambda: minhash_lsh_pairs(
            docs, "doc_id", "text", shingle_n=3, num_hashes=32, bands=4,
            threshold=0.8, family="xxhash64", max_bucket=500,
        ),
        "minhash_arrow": lambda: minhash_lsh_pairs(
            docs, "doc_id", "text", shingle_n=3, num_hashes=32, bands=4,
            threshold=0.8, family="arrow", max_bucket=500,
        ),
        "simhash_expr": lambda: simhash_pairs(
            docs, "doc_id", "text", shingle_n=3, max_hamming=3, engine="expr",
        ),
        "simhash_arrow": lambda: simhash_pairs(
            docs, "doc_id", "text", shingle_n=3, max_hamming=3, engine="arrow",
        ),
        "simhash_arrow2": lambda: simhash_pairs(
            docs, "doc_id", "text", shingle_n=3, max_hamming=3, engine="arrow2",
        ),
    }

    best: dict[str, float] = {name: float("inf") for name in cases}
    rows: dict[str, int] = {}
    for _ in range(max(1, reps)):
        for name, mk in cases.items():  # interleaved: noise hits all sides
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            best[name] = min(best[name], time.time() - t0)
    for name, mk in cases.items():
        rows[name] = mk().count()

    out = {
        "metric": "kernel_family_best_sec",
        "sf_dir": sf_dir,
        "reps": reps,
        "best_sec": {k: round(v, 3) for k, v in best.items()},
        "pair_rows": rows,
        "speedup": {
            "minhash_arrow_vs_xxhash64": round(best["minhash_xxhash64"] / best["minhash_arrow"], 2),
            "simhash_arrow2_vs_arrow": round(best["simhash_arrow"] / best["simhash_arrow2"], 2),
            "simhash_arrow2_vs_expr": round(best["simhash_expr"] / best["simhash_arrow2"], 2),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
