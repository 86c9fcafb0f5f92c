"""Kernel-only scaling ladder (north-rule evidence gap closer).

The round-5 full-ladder attempts both PASSED the pipeline 4->16 bar
same-round (0.84) but hit the documented 16-core host-contamination
tell on the kernel (walls 8.85/8.42 s vs the 6.15 s clean r3 sample,
identical code). This runner re-measures ONLY the kernel ladder so a
quiet window can be exploited in ~10 minutes instead of the full
35-45 min protocol, and additionally samples the 16-core level pinned
to the UPPER vCPU range (16-31) to test whether the tell is
core-range-specific host pressure (it is invisible to guest load).

Usage: python scripts/bench_kernel_ladder.py [samples]
Appends one attempt record to BENCH_scaling_r5_attempts.json-style
output on stdout; the caller merges it into the attempts file.
"""

from __future__ import annotations

import json
import subprocess
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from bench_scaling import KERNEL, REPO  # noqa: E402

MULT = 20  # 100k docs, same as every prior attempt


def run_kernel_pinned(cores: int, cpu_list: str) -> dict:
    out = subprocess.run(
        ["taskset", "-c", cpu_list, sys.executable, "-c",
         KERNEL.format(repo=REPO), str(cores), str(MULT)],
        capture_output=True, text=True, cwd=REPO, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(f"kernel cores={cores} failed:\n{out.stderr[-2000:]}")
    r = json.loads(out.stdout.strip().splitlines()[-1])
    r["cpus"] = cpu_list
    return r


def main() -> None:
    samples = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    levels = {4: "0-3", 8: "0-7", 16: "0-15", 32: "0-31"}
    runs: dict[int, list[dict]] = {c: [] for c in levels}
    upper16: list[dict] = []
    for i in range(samples):
        for c, cpus in levels.items():
            r = run_kernel_pinned(c, cpus)
            runs[c].append(r)
            print(json.dumps(r), flush=True)
        # core-range experiment: same 16-core job on the upper half
        r = run_kernel_pinned(16, "16-31")
        upper16.append(r)
        print(json.dumps(r), flush=True)
    best = {c: min(rs, key=lambda r: r["wall_sec"]) for c, rs in runs.items()}
    eff = {
        "N4_to_16": round((best[16]["docs_per_sec"] / best[4]["docs_per_sec"]) / 4.0, 3),
        "N8_to_32": round((best[32]["docs_per_sec"] / best[8]["docs_per_sec"]) / 4.0, 3),
        "N8_to_16": round((best[16]["docs_per_sec"] / best[8]["docs_per_sec"]) / 2.0, 3),
    }
    result = {
        "kernel_only": True,
        "levels": {str(c): best[c] for c in levels},
        "upper16_best": min(upper16, key=lambda r: r["wall_sec"]),
        "efficiency": eff,
        "scaling_efficiency": eff["N4_to_16"],
        "bar": 0.8,
        "pass": eff["N4_to_16"] >= 0.8,
        "all_runs": {str(c): runs[c] for c in levels},
        "all_upper16": upper16,
    }
    with open(REPO + "/BENCH_kernel_ladder_r5.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if not k.startswith("all_")}))


if __name__ == "__main__":
    main()
