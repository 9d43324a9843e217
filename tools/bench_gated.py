"""Load-gated bench launcher — the committed closing run's front door.

VERDICT r10 task #2: round 10 burned nine steal-polluted bench attempts
before landing one clean record run, with the gating done by hand
(watch `uptime`, launch when quiet).  This wrapper codifies that: poll
the 1-minute load average and only launch `bench.py` once it sits below
the threshold, retrying on a timer; every polling decision is recorded
and EMBEDDED in the output artifact so a reader can see exactly what
the host looked like around the committed number instead of trusting a
prose note.

The gate is PRE-LAUNCH only.  `load_1m_after` is self-inflicted (the
suite itself drives all local cores — the r10 record run ended at load
3.44 after starting at 0.09), so post-run load cannot distinguish steal
from honest work; what it CAN do is flag a storm that arrived
mid-suite, which is why both values stay in the artifact for the
reader.  bench.py itself is untouched — the external driver invokes it
directly and must never block on host weather.

Usage:
    python tools/bench_gated.py [--threshold 0.2] [--poll 30]
        [--max-wait 3600] [--out bench_rNN_record.json]

Exit 0 with the artifact written, or exit 1 if the host never went
quiet within --max-wait (nothing is written; attempts go to stderr so
the evidence of the refusal survives in the terminal log).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import tempfile
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def extract_summary(stdout: str) -> dict | None:
    """Last line of ``stdout`` that parses as the summary shape (a dict
    carrying "value").  ADVICE r11: the old scan broke on the FIRST line
    parsing as ANY JSON value, so a trailing bare number or 'null' line
    discarded a completed (possibly long-waited) run even though the
    real summary line existed earlier."""
    for line in reversed(stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
        except ValueError:
            continue
        if isinstance(parsed, dict) and "value" in parsed:
            return parsed
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=0.2,
                    help="max load_1m at which bench.py may launch")
    ap.add_argument("--threshold-5m", type=float, default=None,
                    help="also require load_5m at or below this value "
                    "(round-15 lesson: records 2-3 launched at "
                    "load_1m<0.3 during a LULL — 5m/15m averages were "
                    "2.8-5.0 and steal resumed mid-run, inflating the "
                    "wall 27-34%%.  Default: 4x the 1m threshold.)")
    ap.add_argument("--poll", type=float, default=30.0,
                    help="seconds between load polls while waiting")
    ap.add_argument("--max-wait", type=float, default=3600.0,
                    help="give up (exit 1) after this many seconds")
    ap.add_argument("--out", default=os.path.join(REPO, "bench_record.json"))
    args = ap.parse_args()
    thr5 = (args.threshold_5m if args.threshold_5m is not None
            else 4.0 * args.threshold)

    attempts: list[dict] = []
    waited = 0.0
    while True:
        load, load5, _ = (round(v, 2) for v in os.getloadavg())
        ok = load <= args.threshold and load5 <= thr5
        attempts.append({
            "load_1m": load,
            "load_5m": load5,
            "launched": ok,
            "waited_sec": round(waited, 1),
        })
        print(f"# load_1m={load} load_5m={load5} thresholds="
              f"{args.threshold}/{thr5} {'LAUNCH' if ok else 'wait'}",
              file=sys.stderr)
        if ok:
            break
        if waited >= args.max_wait:
            print(f"# host never went quiet within {args.max_wait}s; "
                  "refusing to commit a steal-polluted number",
                  file=sys.stderr)
            print(json.dumps(attempts, indent=1), file=sys.stderr)
            return 1
        time.sleep(args.poll)
        waited += args.poll

    t0 = time.time()
    # Private rendezvous path (round-13 review): the shared
    # BENCH_QUERIES.json could be overwritten by any other bench.py
    # invocation (the external driver calls it directly) between our
    # subprocess exiting and the read below — the gate would package
    # the OTHER run's per-query timings into the committed record.
    # TemporaryDirectory, not bare mkdtemp (round-13 ADVICE): the
    # rendezvous dir holds one small JSON and must not outlive the run
    # — every gated invocation would otherwise leak a /tmp dir.
    with tempfile.TemporaryDirectory(prefix="cps_bench_gate_") as gate_dir:
        detail_path = os.path.join(gate_dir, "detail.json")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            cwd=REPO, capture_output=True, text=True,
            env={**os.environ, "BENCH_DETAIL_PATH": detail_path},
        )
        sys.stderr.write(proc.stderr)
        if proc.returncode != 0:
            # keep bench.py's stdout too — it may hold the last progress
            # evidence of where a partial run died
            sys.stderr.write(proc.stdout)
            print(f"# bench.py failed rc={proc.returncode}", file=sys.stderr)
            return proc.returncode

        # bench.py prints exactly one JSON line on stdout; scan backwards
        # for the summary shape so stray trailing output after the JSON
        # can't crash the gate after a long wait-and-run (see
        # extract_summary).
        summary = extract_summary(proc.stdout)
        if summary is None:
            sys.stderr.write(proc.stdout)
            print("# bench.py exited 0 but printed no parseable JSON summary",
                  file=sys.stderr)
            return 1
        with open(detail_path) as f:
            detail = json.load(f)
    artifact = dict(detail)  # queries + summary fields
    artifact["gate"] = {
        "threshold": args.threshold,
        "poll_sec": args.poll,
        "attempts": attempts,
        "bench_wall_sec": round(time.time() - t0, 1),
    }
    # Same run, two views — a REAL check, not an assert (python -O
    # must not silently write a mismatched artifact after an hour-long
    # gated wait).
    if summary["value"] != artifact["value"]:
        print(
            f"# rendezvous mismatch: stdout summary {summary['value']} "
            f"!= detail file {artifact['value']} — refusing to write",
            file=sys.stderr,
        )
        return 1
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(json.dumps({k: artifact[k] for k in
                      ("metric", "value", "unit", "n_queries", "sf")}))
    print(f"# wrote {args.out} ({len(attempts)} gate attempt(s))",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
