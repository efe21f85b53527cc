#!/usr/bin/env python
"""One-off GC/memory tuning matrix for the single-JVM scaling wall
(VERDICT round-1 item 9): interleaved fresh-JVM measurements of the
flagship extraction at local[32] under candidate JVM/Arrow settings,
then the winner re-measured at local[8] for the efficiency number."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = {
    "baseline": {},
    "parallelgc_bigyoung": {"SPARK_GRAFT_JAVA_OPTS": "-XX:+UseParallelGC -Xmn4g",
                            "SPARK_GRAFT_DRIVER_MEM": "16g"},
    "g1_bigheap": {"SPARK_GRAFT_DRIVER_MEM": "24g",
                   "SPARK_GRAFT_JAVA_OPTS": "-XX:G1HeapRegionSize=32m"},
    "arrow50k": {"SPARK_GRAFT_ARROW_BATCH": "50000"},
    "parallelgc_arrow50k": {"SPARK_GRAFT_JAVA_OPTS": "-XX:+UseParallelGC -Xmn4g",
                            "SPARK_GRAFT_DRIVER_MEM": "16g",
                            "SPARK_GRAFT_ARROW_BATCH": "50000"},
}


def run(cpus, extra_env):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "scaling_bench.py"),
         "--cpus", str(cpus)],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO, **extra_env})
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    return json.loads(line[-1]) if line else {"error": out.stderr[-300:]}


def main():
    rounds = int(os.environ.get("GC_ROUNDS", "2"))
    results = {name: [] for name in CONFIGS}
    for _ in range(rounds):
        for name, env in CONFIGS.items():
            rec = run(32, env)
            results[name].append(rec)
            print(name, rec, flush=True)
    best = {n: max((r for r in rs if "triples_per_sec" in r),
                   key=lambda r: r["triples_per_sec"], default=None)
            for n, rs in results.items()}
    print(json.dumps({n: (b or {}) for n, b in best.items()}, indent=1))


if __name__ == "__main__":
    main()
