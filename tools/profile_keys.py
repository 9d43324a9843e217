"""Per-key profiling harness for the r16 optimization round (guide §1).

Times individual registered keys under the BENCH session configuration
(local[$SPARK_GRAFT_CPUS], shuffle=$SPARK_SHUFFLE_PARTITIONS default 8,
warm session) with three timed actions per key:

- ``topandas``: the bench's own action (min over --reps runs) — the
  number comparable to bench.py records.
- ``noop``: the noop-sink action (guide §1.4) — computation without the
  Arrow collect, isolating the sink cost.
- ``jobs``: Spark job count the key's topandas action launched (from the
  status tracker) — per-round driver actions and AQE stages show up here.

Optionally writes ``.explain("formatted")`` for each key to --plans-dir
(the r16 deliverable shape: plans/r16/<key>_{before,after}.txt).

Usage:
    python tools/profile_keys.py KEY [KEY...] [--reps 3] [--explain]
        [--plans-dir plans/r16] [--suffix before] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--plans-dir", default=os.path.join(REPO, "plans", "r16"))
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--json", default=None)
    ap.add_argument("--no-noop", action="store_true",
                    help="skip the noop-sink timing (keys whose result "
                    "frame re-stages temp files per action)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from climateiq_pipelines_spark import get_spark
    from climateiq_pipelines_spark.plans import QUERIES, load_all
    from climateiq_pipelines_spark.registry import load_table

    load_all()
    shuffle = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "8"))
    spark = get_spark(app_name="cps-profile", shuffle_partitions=shuffle)
    # Warm the JVM paths exactly like bench.py.
    load_table(spark, sf_dir, "nation").groupBy("n_regionkey").count().toPandas()

    tracker = spark.sparkContext.statusTracker()
    results: dict[str, dict] = {}
    for key in args.keys:
        fn = QUERIES.get(key)
        if fn is None:
            print(f"# {key}: NOT REGISTERED", file=sys.stderr)
            continue
        sc = spark.sparkContext
        rec: dict = {}

        sc.setJobDescription(f"profile:{key}:topandas")
        times = []
        build_times = []
        plan_times = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            # Force analysis + optimization + physical planning without
            # execution (AQE re-planning still happens at run time).
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            n = len(df.toPandas())
            t3 = time.perf_counter()
            build_times.append(round(t1 - t0, 4))
            plan_times.append(round(t2 - t1, 4))
            times.append(round(t3 - t0, 4))
        rec["rows"] = n
        rec["topandas"] = times
        rec["topandas_min"] = min(times)
        rec["build_min"] = min(build_times)
        rec["plan_min"] = min(plan_times)

        if not args.no_noop:
            sc.setJobDescription(f"profile:{key}:noop")
            nt = []
            for i in range(args.reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                nt.append(round(time.perf_counter() - t0, 4))
            rec["noop"] = nt
            rec["noop_min"] = min(nt)

        sc.setJobDescription(f"profile:{key}:jobcount")
        # Count jobs via the tracker delta around one run.
        before_ids = tracker.getJobIdsForGroup(None)
        nb = len(before_ids or [])
        fn(spark, sf_dir).toPandas()
        after_ids = tracker.getJobIdsForGroup(None)
        rec["jobs_per_run"] = len(after_ids or []) - nb

        if args.explain:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            path = os.path.join(args.plans_dir, f"{key}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            rec["plan"] = path

        sc.setJobDescription(None)
        results[key] = rec
        print(f"# {key}: topandas_min={rec['topandas_min']:.3f} "
              f"build_min={rec['build_min']:.3f} "
              f"plan_min={rec['plan_min']:.3f} "
              f"noop_min={rec.get('noop_min', float('nan')):.3f} "
              f"jobs={rec['jobs_per_run']} rows={rec['rows']}",
              file=sys.stderr)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "plan"}
                      for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
