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
certification scale each round. The per-key line prints
"OK (LSH twin plan)" so the substitution is visible in archived logs
(ADVICE r10 #4). Coverage stays 232 keys.

Fast mode, digest keys (VERDICT r10 task #3): the three
full-projection keys whose strict per-cell comparator dominates sweep
wall (fn_math 16.3 s / proj_computed_columns 10.8 s / fn_date 9.0 s
at sf0.1 — sub-second engine plans buried under 600k x 13-cell Python
canonicalization) compare a 2-value digest aggregate computed INSIDE
each engine instead (climateiq_pipelines_spark/parity_digest.py; the
sink_compression_codecs construction with an exact IEEE float
decomposition).  Strict per-cell canonicalization still runs for them
at sf0.01 certification scale, in every non-fast sweep, and in
driver_sim; tests/test_parity_digest.py pins that the digest twins
fail alongside the strict comparator on single-cell mutations.

Usage: python tools/parity_sweep.py [--fast] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Fast-mode digest keys (VERDICT r10 task #3): full-projection keys
# whose strict-comparator cost dominates their sweep wall while the
# engine plan is sub-second.  Membership is a deliberate act — adding
# a key here removes its per-cell check from FAST sweeps only, so the
# key must be (a) in every driver window rotation as usual and (b)
# covered by the digest mutation pin in tests/test_parity_digest.py.
DIGEST_FAST_KEYS = {"fn_math", "proj_computed_columns", "fn_date"}


def main() -> int:
    from climateiq_pipelines_spark import get_spark, release_blocks
    from climateiq_pipelines_spark.parity import compare_frames
    from climateiq_pipelines_spark.plans import ORACLE_BUILDERS
    import __spark_entry__ as E

    args = [a for a in sys.argv[1:] if a != "--fast"]
    fast = "--fast" in sys.argv[1:]
    # Reject unknown flags up front (round-13 review: a typo like
    # --Fast silently became the sf_dir positional, booting a full
    # SparkSession before DuckDB failed on '--Fast/region.parquet').
    unknown = [a for a in args if a.startswith("-")]
    if unknown:
        sys.exit(f"unknown flag(s) {unknown}; usage: "
                 "parity_sweep.py [--fast] [sf_dir]")
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    if fast:
        from climateiq_pipelines_spark.operators import llm

        llm.ALLPAIRS_MAX_DOCS = 0  # force the shared-oracle LSH plan
        print("FAST MODE: llm_minhash_neardup dispatches to the LSH twin",
              flush=True)
    spark = get_spark(app_name="parity-sweep", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    # ONE view-builder (round-13 review: this hand-rolled a literal
    # 10-table list next to parity.duck_connect's registry-driven one —
    # an 11th fixture table would reach driver_sim/check_key but fail
    # here as a false 'Table does not exist' sweep EXC).
    from climateiq_pipelines_spark.parity import duck_connect

    con = duck_connect(sf_dir)
    queries, oracles = E.queries(), E.oracle_sql()
    bad, built, t_all = [], [], time.perf_counter()
    for i, (key, fn) in enumerate(queries.items()):
        t0 = time.perf_counter()
        try:
            if fast and key in DIGEST_FAST_KEYS:
                from climateiq_pipelines_spark import parity_digest as PD

                df = fn(spark, sf_dir)
                cols = PD.kinds_from_spark(df)
                sd = PD.spark_digest(spark, df)
                dd = PD.duck_digest(con, cols, oracles[key])
                if tuple(sd.iloc[0]) == tuple(dd.iloc[0]):
                    tag = "OK (digest twin)"
                else:
                    tag = "MISMATCH"
                    bad.append((key, [
                        f"digest spark={tuple(sd.iloc[0])}"
                        f" oracle={tuple(dd.iloc[0])}"
                        " — re-run without --fast to localize"
                    ]))
                print(
                    f"[{i + 1}/{len(queries)}] {key}: {tag}"
                    f" ({time.perf_counter() - t0:.1f}s)",
                    flush=True,
                )
                continue
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
                if fast and key == "llm_minhash_neardup":
                    tag += " (LSH twin plan)"  # ADVICE r10 #4 visibility
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
        finally:
            # Deterministic block reclaim between keys (round 12):
            # operators legitimately localCheckpoint relations they
            # return and cannot unpersist them before the caller
            # consumes the result; without harness-side reclaim the
            # blocks accumulate and sweep timings become
            # ORDER-DEPENDENT (see session.release_blocks docstring
            # for the measured incident).  Best-effort: a dead JVM
            # must not abort the sweep before its footer/summary.
            try:
                release_blocks(spark)
            except Exception as exc:  # noqa: BLE001
                print(f"# release_blocks failed after {key}: {exc}",
                      flush=True)
    # Self-describing evidence footer (VERDICT r11 task #2): the
    # archived log must identify its own sf_dir/mode without consulting
    # the commit message.  Shared line shape with driver_sim's header
    # (tools/evidence.py) so the contract cannot drift between tools.
    from tools.evidence import evidence_line

    print(evidence_line(
        "parity_sweep",
        sf_dir=sf_dir,
        fast=fast,
        n_keys=len(queries),
        built_oracles=built,
        wall_sec=round(time.perf_counter() - t_all, 1),
    ), flush=True)
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
