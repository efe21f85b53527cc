#!/usr/bin/env python
"""Executor-level scaling evidence — the closest sandbox stand-in for the
north rule's "N and 4N executors": Spark ``local-cluster`` mode spawns
SEPARATE executor JVMs (own heap, own GC, own Python workers), unlike
``local[n]`` threads that share one allocation arena. Same job, same
input: local-cluster[2,4] (N=2 executors) vs local-cluster[8,4]
(4N=8 executors).

Interleaved best-of-N in fresh driver JVMs (the co-tenant-noise protocol
of scaling_bench.py). Usage:
    python scripts/scaling_cluster.py              # run both, print JSON
    python scripts/scaling_cluster.py --execs 2    # one measurement
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_CONV = int(os.environ.get("SPARK_GRAFT_SCALE_CONV", "200000"))
CORES_PER_EXEC = 4
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure(execs: int) -> dict:
    from pyspark.sql import SparkSession

    from rdf_go_spark.operators.extraction import extract_triples
    from rdf_go_spark.sources.transcripts import (
        synth_entities, synth_transcripts,
    )

    total_cores = execs * CORES_PER_EXEC
    spark = (SparkSession.builder
             .master(f"local-cluster[{execs},{CORES_PER_EXEC},2048]")
             .appName(f"scaling_cluster_{execs}")
             .config("spark.executor.memory", "2g")
             .config("spark.sql.shuffle.partitions", str(total_cores * 2))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.autoBroadcastJoinThreshold",
                     str(64 * 1024 * 1024))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    entities = synth_entities(spark)
    # warm-up: codegen + executor-side python workers
    extract_triples(synth_transcripts(spark, 2000), entities).count()
    transcripts = synth_transcripts(spark, N_CONV,
                                    partitions=total_cores * 4)
    best, n = None, 0
    for _ in range(2):
        t0 = time.perf_counter()
        n = extract_triples(transcripts, entities).count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    spark.stop()
    return {"executors": execs, "cores_per_exec": CORES_PER_EXEC,
            "n_triples": n, "seconds": round(best, 2),
            "triples_per_sec": round(n / best, 1)}


def main() -> None:
    if "--execs" in sys.argv:
        execs = int(sys.argv[sys.argv.index("--execs") + 1])
        print(json.dumps(measure(execs)))
        return
    results = {2: [], 8: []}
    rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "3"))
    for _round in range(rounds):
        for execs in (2, 8):
            out = subprocess.run(
                [sys.executable, __file__, "--execs", str(execs)],
                capture_output=True, text=True, cwd=REPO,
                env={**os.environ, "PYTHONPATH": REPO})
            lines = [ln for ln in out.stdout.strip().splitlines()
                     if ln.startswith("{")]
            if not lines:
                print(f"execs={execs} FAILED: {out.stderr[-200:]}")
                continue
            rec = json.loads(lines[-1])
            results[execs].append(rec)
            print(rec, flush=True)
    raw = {e: [r["triples_per_sec"] for r in results[e]] for e in results}
    best = {e: max(raw[e]) for e in results if raw[e]}
    eff = round((best[8] / best[2]) / 4, 3) if 2 in best and 8 in best \
        else None
    print(json.dumps({"best": best, "efficiency": eff, "raw": raw}))


if __name__ == "__main__":
    main()
