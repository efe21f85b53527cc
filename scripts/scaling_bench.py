#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north_rule):
run the flagship KG extraction at N and 4N parallelism on the SAME input
and report throughput + scaling efficiency = (thr_4N / thr_N) / 4.

No real multi-executor cluster exists in this sandbox; local[8] vs
local[32] on one JVM is the sanctioned stand-in (BASELINE.md). The job is
sized (SPARK_GRAFT_SCALE_CONV conversations, default 200k ≈ 900k turns ≈
5.6M triples) so task work dominates fixed driver overhead.

Each measurement runs in a FRESH subprocess/JVM so the two configurations
don't share JIT/caches. Usage:
    python scripts/scaling_bench.py            # run both + write BENCH/
    python scripts/scaling_bench.py --cpus 8   # single measurement (JSON)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_CONV = int(os.environ.get("SPARK_GRAFT_SCALE_CONV", "200000"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure(cpus: int) -> dict:
    from rdf_go_spark.session import get_spark
    from rdf_go_spark.sources.transcripts import (
        synth_entities, synth_transcripts,
    )
    from rdf_go_spark.operators.extraction import extract_triples

    spark = get_spark(app_name=f"scaling_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 16))
    entities = synth_entities(spark)
    # warm-up compiles codegen + starts python workers so the measurement
    # sees steady-state task throughput, not JIT/startup
    extract_triples(synth_transcripts(spark, 2000), entities).count()
    transcripts = synth_transcripts(spark, N_CONV, partitions=max(cpus * 4, 16))
    best, n = None, 0
    for _ in range(2):
        t0 = time.perf_counter()
        n = extract_triples(transcripts, entities).count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    spark.stop()
    return {"cpus": cpus, "n_triples": n, "seconds": round(best, 2),
            "triples_per_sec": round(n / best, 1)}


def main() -> None:
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        print(json.dumps(measure(cpus)))
        return

    # interleaved best-of-3 per parallelism level: the sandbox VM has
    # bursty co-tenant noise (same job varies 2-3x run to run), so A/B/A/B
    # ordering decorrelates it
    results = {8: [], 32: []}
    rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "3"))
    for _round in range(rounds):
        for cpus in (8, 32):
            out = subprocess.run(
                [sys.executable, __file__, "--cpus", str(cpus)],
                capture_output=True, text=True, cwd=REPO,
                env={**os.environ, "PYTHONPATH": REPO})
            line = out.stdout.strip().splitlines()[-1]
            rec = json.loads(line)
            results[cpus].append(rec)
            print(rec)

    raw = {c: [r["triples_per_sec"] for r in results[c]] for c in results}
    best = {c: max(results[c], key=lambda r: r["triples_per_sec"])
            for c in results}
    results = best
    thr8 = results[8]["triples_per_sec"]
    thr32 = results[32]["triples_per_sec"]
    eff = round((thr32 / thr8) / 4, 3)
    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

North-rule criterion: throughput scaling efficiency >= 0.8 between N and
4N executors. Sandbox stand-in (BASELINE.md): same job, same input,
local[8] vs local[32], fresh JVM per measurement.

Job: full KG extraction (structural rules + broadcast entity linking +
window adjacency + mapInPandas payload parse) over {N_CONV:,} synthetic
conversations ({results[8]['n_triples']:,} triples).

| parallelism | wall (s) | triples/sec |
|---|---|---|
| local[8]  (N)  | {results[8]['seconds']} | {thr8:,.0f} |
| local[32] (4N) | {results[32]['seconds']} | {thr32:,.0f} |

**speedup 8→32 cores: {thr32 / thr8:.2f}x — scaling efficiency {eff}**
(target >= 0.8)

Raw per-round throughput (triples/s, interleaved 8/32, fresh JVM each —
the spread shows the co-tenant noise the best-of protocol exists for):

- local[8]:  {", ".join(f"{x:,.0f}" for x in raw[8])}
- local[32]: {", ".join(f"{x:,.0f}" for x in raw[32])}

Caveats: single-JVM local mode shares one driver, one GC, and one memory
bus across all task threads — a conservative lower bound on multi-executor
scaling, where shuffles cross machines but executors don't contend for a
socket.
"""
    # BENCH/BASELINE.md is hand-curated (interpretation, calibration,
    # data-scaling sections) — never clobber it; write a sidecar instead
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_path = os.path.join(REPO, "BENCH", "scaling_latest.md")
    with open(out_path, "w") as f:
        f.write(md)
    print(f"efficiency: {eff}")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
