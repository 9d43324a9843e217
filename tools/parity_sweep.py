"""Full-surface parity sweep at an ARBITRARY scale factor — the
round-9 hardening tool that caught the llm_bm25_score decimal-literal
bug (BASELINE.md round-9).

The driver certifies at sf0.01; value-range-driven divergences (floor
knife-edges, quantize-of-double grid misses, n-proportional stopping
rules) can hide below that scale. This sweep runs EVERY queries() key
against its oracle twin at the given sf_dir (default sf0.1 — 10x the
certification scale) with the strict local comparator.

Oracle selection (VERDICT r9 task #2): keys registered in
plans.ORACLE_BUILDERS get their oracle text BUILT for the target
sf_dir (the converged-iteration keys solve their stopping rule to
fixpoint in DuckDB and unroll to that depth; the cluster key swaps the
quadratic recursive reach-CTE for a fixpoint-depth label unroll).
Everything else uses the static oracle_sql() text. Result: 232/232
fully value-checked at ANY scale — no documented-exception map.

Fast mode (VERDICT r9 task #3): `--fast` dispatches
llm_minhash_neardup to its banded LSH twin by setting
llm.ALLPAIRS_MAX_DOCS = 0 — the two keys SHARE one oracle (banding is
oracle-proven lossless), so this changes the executed PLAN, never the
checked answer; the guarded exact path is already proven at
certification scale each round. Coverage stays 232 keys.

Usage: python tools/parity_sweep.py [--fast] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb

    from climateiq_pipelines_spark import get_spark
    from climateiq_pipelines_spark.parity import compare_frames
    from climateiq_pipelines_spark.plans import ORACLE_BUILDERS
    import __spark_entry__ as E

    args = [a for a in sys.argv[1:] if a != "--fast"]
    fast = "--fast" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    if fast:
        from climateiq_pipelines_spark.operators import llm

        llm.ALLPAIRS_MAX_DOCS = 0  # force the shared-oracle LSH plan
        print("FAST MODE: llm_minhash_neardup dispatches to the LSH twin",
              flush=True)
    spark = get_spark(app_name="parity-sweep", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries, oracles = E.queries(), E.oracle_sql()
    bad, built, t_all = [], [], time.perf_counter()
    for i, (key, fn) in enumerate(queries.items()):
        t0 = time.perf_counter()
        try:
            sp = fn(spark, sf_dir).toPandas()
            if key not in oracles:
                print(
                    f"[{i + 1}/{len(queries)}] {key}: rows-only"
                    f" ({len(sp)} rows)",
                    flush=True,
                )
                continue
            if key in ORACLE_BUILDERS:
                text = ORACLE_BUILDERS[key](sf_dir)
                built.append(key)
            else:
                text = oracles[key]
            du = con.execute(text).df()
            res = compare_frames(key, sp, du)
            if res.ok:
                tag = "OK" + (" (built oracle)" if key in built else "")
            else:
                tag = "MISMATCH"
                bad.append((key, res.reasons))
            print(
                f"[{i + 1}/{len(queries)}] {key}: {tag}"
                f" ({time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            bad.append((key, [f"EXC {type(exc).__name__}: {exc}"]))
            print(f"[{i + 1}/{len(queries)}] {key}: EXC {exc}", flush=True)
    print(
        f"TOTAL {time.perf_counter() - t_all:.0f}s;"
        f" unexpected mismatches={len(bad)}; built oracles={built};"
        f" fast={fast}",
        flush=True,
    )
    for k, r in bad:
        print("BAD:", k, r, flush=True)
    print(
        "SWEEP:", "ALL OK" if not bad else f"{len(bad)} UNEXPECTED FAILURES",
        flush=True,
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
