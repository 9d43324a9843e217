"""Standalone shuffle-layout determinism probe (VERDICT r13 task #2).

The per-round sf0.1 layout-determinism evidence (determinism_sf01_r*.out)
was produced by an UNCOMMITTED runner through round 13 — the claim was
covered in CI by tests/test_determinism.py at sf0.01, but the archived
standalone logs had no committed tool behind them.  This is that tool:
it reuses the test module's PROBE_KEYS and the parity canonicalizer,
runs each key under ``spark.sql.shuffle.partitions`` ∈ {2, 32, 200}
(runtime conf — AQE picks it up at plan time), and reports STABLE only
when all three canonical frames are bit-identical.

A plain double SUM fails this probe; the engine's fixed-point
accumulators, rounded-before-rank orderings, and layout-free iterative
loops are what make it pass — at 100 TB the shuffle layout is chosen by
AQE per run, so any layout-sensitive value is a nondeterministic answer.

Usage: python tools/determinism_probe.py [sf_dir]   (default sf0.1)
Exit 0 iff every key is stable across all three layouts.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PARTITIONS = (2, 32, 200)


def main() -> int:
    t0 = time.monotonic()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    from climateiq_pipelines_spark.parity import canon_frame
    from climateiq_pipelines_spark.plans import QUERIES, load_all
    from climateiq_pipelines_spark.session import release_blocks
    from tests.test_determinism import PROBE_KEYS
    from tools.evidence import evidence_line

    load_all()
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    unstable = []
    for key in PROBE_KEYS:
        baseline = None
        verdict = "STABLE"
        for n in PARTITIONS:
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            canon = canon_frame(QUERIES[key](spark, sf_dir).toPandas())
            release_blocks(spark)
            if baseline is None:
                baseline = (n, canon)
            elif canon != baseline[1]:
                verdict = f"UNSTABLE (n={n} differs from n={baseline[0]})"
                unstable.append(key)
                break
        print(f"{key}: {verdict}", flush=True)

    print(
        evidence_line(
            "determinism_probe",
            sf_dir=sf_dir,
            partitions=list(PARTITIONS),
            n_keys=len(PROBE_KEYS),
            wall_sec=round(time.monotonic() - t0, 1),
        )
    )
    if unstable:
        print(f"{len(unstable)} UNSTABLE KEYS: {sorted(unstable)}")
        return 1
    print(f"ALL {len(PROBE_KEYS)} KEYS STABLE x{len(PARTITIONS)} LAYOUTS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
