"""Two-cluster-size evidence on a REAL multi-executor topology.

Runs the north-rule deployment shape literally: a Spark standalone
master plus ``N`` separate 4-core worker JVMs (each taskset-pinned to
its own CPU range, so "a worker" is a faithful stand-in for "a node"),
and the KG pipeline submitted via ``spark-submit --py-files
cartography_spark.zip``. Levels: 1 worker (N=4 cores) vs 4 workers
(4N=16 cores) — the same ladder BENCH_scaling.json's pinned local-mode
runs use, but with real executor processes, shuffle service paths, and
the packaged artifact.

Usage: python scripts/bench_cluster.py [n_pages]   (default 6_000_000;
pages must already be materialized by bench_scaling.py's prep, or this
script will materialize them).
Writes BENCH_cluster.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
PAGES_DIR = os.environ.get("SPARK_GRAFT_SCALING_DIR", "/tmp/spark_graft_scaling_pages")
MASTER = "spark://127.0.0.1:7077"

JOB = r"""
import json, sys, time
from pyspark.sql import Observation, SparkSession, functions as F
from cartography_spark.functions.textextract import extract_text
from cartography_spark.functions.triples import extract_triples_jvm

path, cores = sys.argv[1], int(sys.argv[2])
spark = SparkSession.builder.appName(f"cluster-bench-{cores}").getOrCreate()
spark.conf.set("spark.sql.shuffle.partitions", str(cores))
pages = spark.read.parquet(path)
text = extract_text(pages, "html", "text")
obs = Observation("t")
triples = extract_triples_jvm(text).observe(obs, F.count(F.lit(1)).alias("n"))
agg = triples.groupBy("subj", "pred", "obj").agg(F.count("*").alias("n"))
# warmup: python workers + codegen
extract_text(pages.limit(20000), "html", "text").write.format("noop").mode("overwrite").save()
t0 = time.time()
agg.write.format("noop").mode("overwrite").save()
wall = time.time() - t0
n = int(sys.argv[3])
print("RESULT " + json.dumps({
    "total_cores": cores, "pages": n, "triples": obs.get["n"],
    "wall_sec": round(wall, 2),
    "pages_per_sec": round(n / wall, 1),
    "triples_per_sec": round(obs.get["n"] / wall, 1),
}))
spark.stop()
"""


def _spark_class(cls: str, *args: str, taskset: str | None = None) -> subprocess.Popen:
    cmd = []
    if taskset:
        cmd += ["taskset", "-c", taskset]
    cmd += [os.path.join(SPARK_HOME, "bin", "spark-class"), cls, *args]
    env = dict(os.environ)
    env.setdefault("SPARK_NO_DAEMONIZE", "1")
    return subprocess.Popen(
        cmd, env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        preexec_fn=os.setsid,
    )


def _kill(p: subprocess.Popen) -> None:
    try:
        os.killpg(os.getpgid(p.pid), signal.SIGTERM)
    except ProcessLookupError:
        pass


def run_level(n_workers: int, n_pages: int, zip_path: str) -> dict:
    """Start master + n_workers pinned 4-core workers, submit the job."""
    # master pinned off the worker cores (28-29); driver pinned 24-27 —
    # unpinned driver/master JVMs float onto worker CPUs and cost ~10%.
    procs = [_spark_class("org.apache.spark.deploy.master.Master",
                          "--host", "127.0.0.1", "--port", "7077", "--webui-port", "0",
                          taskset="28-29")]
    time.sleep(5)
    for w in range(n_workers):
        lo, hi = w * 4, w * 4 + 3
        procs.append(
            _spark_class(
                "org.apache.spark.deploy.worker.Worker", MASTER,
                "--cores", "4", "--memory", "12g", "--port", "0", "--webui-port", "0",
                "--work-dir", f"/tmp/spark_worker_{w}",
                taskset=f"{lo}-{hi}",
            )
        )
    time.sleep(8)
    job_file = "/tmp/cluster_bench_job.py"
    with open(job_file, "w") as f:
        f.write(JOB)
    try:
        out = subprocess.run(
            [
                "taskset", "-c", "24-27",
                os.path.join(SPARK_HOME, "bin", "spark-submit"),
                "--master", MASTER,
                "--py-files", zip_path,
                "--conf", "spark.executor.cores=4",
                "--conf", "spark.executor.memory=10g",
                "--conf", "spark.executor.extraJavaOptions=-XX:+UseParallelGC",
                "--conf", f"spark.default.parallelism={n_workers * 4}",
                "--conf", "spark.sql.session.timeZone=UTC",
                job_file, PAGES_DIR, str(n_workers * 4), str(n_pages),
            ],
            capture_output=True, text=True, timeout=900,
            env=dict(os.environ, PYSPARK_PYTHON=sys.executable),
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not lines:
            raise RuntimeError(
                f"submit (workers={n_workers}) produced no RESULT:\n{out.stderr[-3000:]}"
            )
        r = json.loads(lines[-1][len("RESULT "):])
        r["workers"] = n_workers
        return r
    finally:
        for p in reversed(procs):
            _kill(p)
        time.sleep(3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    marker = os.path.join(PAGES_DIR, f"_N{n}")
    if not os.path.exists(marker):
        raise SystemExit(
            f"pages not materialized at {PAGES_DIR} for n={n}; "
            "run scripts/bench_scaling.py first"
        )
    zip_path = subprocess.check_output(
        [sys.executable, os.path.join(REPO, "scripts", "package.py")], text=True
    ).strip()
    repeats = int(os.environ.get("SPARK_GRAFT_CLUSTER_REPEATS", "2"))
    runs: dict[int, list[dict]] = {1: [], 4: []}
    for _ in range(repeats):
        for w in (1, 4):
            runs[w].append(run_level(w, n, zip_path))
    best = {w: min(rs, key=lambda r: r["wall_sec"]) for w, rs in runs.items()}
    eff = (best[4]["triples_per_sec"] / best[1]["triples_per_sec"]) / 4.0
    result = {
        "job": "spark-submit --py-files cartography_spark.zip: pages -> extract -> triples -> agg",
        "topology": "standalone master + taskset-pinned 4-core worker JVMs (1 worker = N, 4 workers = 4N)",
        "N": best[1],
        "4N": best[4],
        "scaling_efficiency": round(eff, 3),
        "bar": 0.8,
        "pass": eff >= 0.8,
        "all_runs": runs,
    }
    with open(os.path.join(REPO, "BENCH_cluster.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "all_runs"}))


if __name__ == "__main__":
    main()
