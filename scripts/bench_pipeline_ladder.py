"""Pipeline-only scaling ladder (the north-rule job): re-measures the
pages_parquet -> arrow_extract -> jvm_triples -> spo_agg ladder without
the kernel runs, for quiet-window re-verification when the kernel's
settled 16-wide host regression (BASELINE.md §11 addenda) makes a full
``bench_scaling.py`` run wasteful. Prints one JSON line; does NOT touch
BENCH_scaling.json (append the output to the round's attempts record).

Usage: python scripts/bench_pipeline_ladder.py [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import PAGES_DIR, PREP, REPO, run_level  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("SPARK_GRAFT_SCALING_PAGES", "6000000")
    )
    prep = subprocess.run(
        [sys.executable, "-c", PREP.format(repo=REPO), str(n), PAGES_DIR],
        capture_output=True, text=True, cwd=REPO, timeout=1800,
    )
    if prep.returncode != 0:
        raise RuntimeError(f"prep failed:\n{prep.stderr[-2000:]}")

    # Pre-warm the OS page cache over the input parquet (610 MB vs
    # 125 GB RAM) so every level at every repeat reads from memory.
    # Attempt 5 showed the 4-core baseline speeding up 74->66 s across
    # repeats as the cache warmed, which skews the ratio-of-bests in
    # either direction depending on which level pays the cold reads; a
    # real cluster reads from distributed storage whose aggregate
    # bandwidth scales with the node count, so warm-cache walls are the
    # faithful single-host analog for measuring COMPUTE scaling.
    for dirpath, _, files in os.walk(PAGES_DIR):
        for fn in files:
            with open(os.path.join(dirpath, fn), "rb") as f:
                while f.read(1 << 22):
                    pass

    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))
    levels = (4, 8, 16, 32)
    runs: dict[int, list[dict]] = {c: [] for c in levels}
    for _ in range(repeats):
        for c in levels:
            runs[c].append(run_level(c, n))
    best = {c: min(rs, key=lambda r: r["wall_sec"]) for c, rs in runs.items()}
    eff = {
        "N4_to_16": round((best[16]["triples_per_sec"] / best[4]["triples_per_sec"]) / 4.0, 3),
        "N8_to_32": round((best[32]["triples_per_sec"] / best[8]["triples_per_sec"]) / 4.0, 3),
        "N8_to_16": round((best[16]["triples_per_sec"] / best[8]["triples_per_sec"]) / 2.0, 3),
    }
    print(json.dumps({
        "pipeline": {
            "job": "pages_parquet -> arrow_extract -> jvm_triples -> spo_agg",
            "input_pages": n,
            "levels": {str(c): best[c] for c in levels},
            "efficiency": eff,
            "scaling_efficiency": eff["N4_to_16"],
            "bar": 0.8,
            "pass": eff["N4_to_16"] >= 0.8,
        },
        "all_runs": {str(c): runs[c] for c in levels},
    }))


if __name__ == "__main__":
    main()
