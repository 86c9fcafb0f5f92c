"""Production-kernel scaling ladder: the ARROW MinHash signature engine.

Round 5 demoted the JVM xxhash64 signature fold from the production
path — `family="arrow"` (`operators/dedup.minhash_signatures_arrow`:
memoized md5 base hash + one numpy affine pass per doc over Arrow
batches) is what bench/production LSH blocking actually runs. The
original kernel ladder (`bench_scaling.KERNEL`) therefore measures a
non-production kernel; this runner measures the real one, with the
identical protocol: taskset-pinned subprocess per level, best-of-k
interleaved samples, plus the upper-vCPU-range 16-core probe.

Usage: python scripts/bench_kernel_ladder_arrow.py [samples]
Writes BENCH_kernel_arrow_ladder_r5.json and prints one JSON line.
"""

from __future__ import annotations

import json
import subprocess
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from bench_scaling import REPO  # noqa: E402

# 1M docs — 10x the JVM-kernel ladder's input. The arrow engine is ~5x
# the JVM kernel's throughput, so at 100k docs every level finishes in
# 2-4.5 s and the ladder measures fixed overheads (session jobs, Arrow
# batch setup, the staging shuffle), not scaling: the first run at
# MULT=20 read 0.399 "efficiency" with walls of 4.5/3.1/2.8/2.2 s.
# At 1M docs the 4-core wall is ~45 s — the same measurable band the
# other ladders use.
MULT = int(__import__("os").environ.get("SPARK_GRAFT_AKERNEL_MULT", "200"))

ARROW_KERNEL = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from cartography_spark.session import get_spark
from cartography_spark.operators.dedup import minhash_signatures_arrow

cores = int(sys.argv[1]); mult = int(sys.argv[2])
spark = get_spark(app_name=f"akernel-{{cores}}", cores=cores, shuffle_partitions=max(cores, 2))
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
def job(m, nh):
    big = docs.crossJoin(spark.range(m)).repartition(cores * 4)
    staged = minhash_signatures_arrow(big, "doc_id", "text", nh, shingle_n=3)
    return staged.select(F.md5(F.concat_ws(",", "__sig")).alias("h")).agg(F.min("h").alias("m"))
job(2, 8).collect()  # warmup (python workers + codegen)
t0 = time.time(); job(mult, 32).collect()
wall = time.time() - t0
n_docs = 5000 * mult
print(json.dumps({{"cores": cores, "docs": n_docs, "wall_sec": round(wall, 2),
                  "docs_per_sec": round(n_docs / wall, 1)}}))
"""


def run_pinned(cores: int, cpu_list: str) -> dict:
    out = subprocess.run(
        ["taskset", "-c", cpu_list, sys.executable, "-c",
         ARROW_KERNEL.format(repo=REPO), str(cores), str(MULT)],
        capture_output=True, text=True, cwd=REPO, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(f"arrow kernel cores={cores} failed:\n{out.stderr[-2000:]}")
    r = json.loads(out.stdout.strip().splitlines()[-1])
    r["cpus"] = cpu_list
    return r


def main() -> None:
    samples = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    levels = {4: "0-3", 8: "0-7", 16: "0-15", 32: "0-31"}
    runs: dict[int, list[dict]] = {c: [] for c in levels}
    upper16: list[dict] = []
    for _ in range(samples):
        for c, cpus in levels.items():
            r = run_pinned(c, cpus)
            runs[c].append(r)
            print(json.dumps(r), flush=True)
        r = run_pinned(16, "16-31")
        upper16.append(r)
        print(json.dumps(r), flush=True)
    best = {c: min(rs, key=lambda r: r["wall_sec"]) for c, rs in runs.items()}
    eff = {
        "N4_to_16": round((best[16]["docs_per_sec"] / best[4]["docs_per_sec"]) / 4.0, 3),
        "N8_to_32": round((best[32]["docs_per_sec"] / best[8]["docs_per_sec"]) / 4.0, 3),
        "N8_to_16": round((best[16]["docs_per_sec"] / best[8]["docs_per_sec"]) / 2.0, 3),
    }
    result = {
        "kernel": "arrow minhash signature engine (production LSH blocking path)",
        "num_hashes": 32,
        "levels": {str(c): best[c] for c in levels},
        "upper16_best": min(upper16, key=lambda r: r["wall_sec"]),
        "efficiency": eff,
        "scaling_efficiency": eff["N4_to_16"],
        "bar": 0.8,
        "pass": eff["N4_to_16"] >= 0.8,
        "all_runs": {str(c): runs[c] for c in levels},
        "all_upper16": upper16,
    }
    with open(REPO + "/BENCH_kernel_arrow_ladder_r5.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if not k.startswith("all_")}))


if __name__ == "__main__":
    main()
