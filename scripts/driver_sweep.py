#!/usr/bin/env python
"""Full dry-run of the driver correctness gate: every oracle-backed
query executed at sf0.01 and value-compared against its DuckDB twin
with the driver's multiset semantics (conftest.assert_frames_match).
~2-3 min on local[32]; run before closing a round.

Usage: python scripts/driver_sweep.py [sf_dir n_conv]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sys.path.insert(0, REPO)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb

    import __spark_entry__ as entry
    from rdf_go_spark.session import get_spark
    from tests.conftest import assert_frames_match

    spark = get_spark(app_name="driver_sweep")
    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    fails = []
    t_all = time.time()
    for name in sorted(oracles):
        t0 = time.time()
        try:
            assert_frames_match(qs[name](spark, sf_dir),
                                con.execute(oracles[name]).df())
            print(f"OK   {name} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as ex:                     # noqa: BLE001
            fails.append(name)
            print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:200]}",
                  flush=True)
    print(f"== {len(oracles) - len(fails)}/{len(oracles)} green "
          f"in {time.time() - t_all:.0f}s; fails={fails}", flush=True)
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
