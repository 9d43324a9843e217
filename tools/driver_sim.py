"""Driver simulation — the verification gate (.claude/skills/verify).

Builds a driver-like session (NOT the engine's factory, non-UTC timezone
to catch timestamp_ntz leaks), runs t1 smoke + every queries() key at
sf0.01 against its DuckDB oracle with the strict local comparator.

Usage: python tools/driver_sim.py [--window] [sf_dir]

--window restricts the sweep to the first 50 registration-order keys —
exactly the slice the external driver certifies (plans.ROTATION_WINDOW)
— for fast validation right after a rotation edit, before the full
232-key run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def evidence_header(
    tz: str,
    sf_dir: str,
    window_only: bool,
    n_keys: int,
    wall_sec: float,
    extra_conf: str = "",
    master: str = "local[8]",
) -> str:
    """One JSON line embedding the run's own configuration — the first
    stdout line of every sweep, so archived evidence logs are unique and
    self-describing (VERDICT r11 task #2: two r11 robustness logs were
    byte-identical to r8/r9 logs and git recorded them as renames).
    ``extra_conf`` is the string main() PARSED AND APPLIED, passed in
    rather than re-read from the environment at print time — the header
    must report the configuration that actually ran (round-12
    self-review)."""
    from tools.evidence import evidence_line

    return evidence_line(
        "driver_sim",
        tz=tz,
        extra_conf=extra_conf,
        master=master,
        sf_dir=sf_dir,
        window_only=window_only,
        n_keys=n_keys,
        wall_sec=round(wall_sec, 1),
    )


def main() -> int:
    t0 = time.monotonic()
    args = [a for a in sys.argv[1:] if a != "--window"]
    window_only = "--window" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    # Non-UTC by default to catch timestamp_ntz leaks; override with
    # DRIVER_SIM_TZ for the per-round second-timezone rotation (r9 ran
    # Asia/Kolkata, +05:30 — a half-hour offset catches a class of
    # rounding bugs whole-hour zones cannot).
    tz = os.environ.get("DRIVER_SIM_TZ", "America/New_York")
    # Cluster-size-independence axis (round 12): DRIVER_SIM_MASTER
    # varies the local parallelism level (e.g. local[2] / local[32]).
    # Core count changes spark.range/parallelize partition counts and
    # hence per-partition accumulation order — the local-mode proxy for
    # "a 1000-executor cluster computes the same answers".  Embedded in
    # the evidence header like every other applied knob.
    master = os.environ.get("DRIVER_SIM_MASTER", "local[8]")
    builder = (
        SparkSession.builder.master(master)
        .config("spark.sql.session.timeZone", tz)
        .config("spark.ui.enabled", "false")
    )
    # Engine-config robustness axis (VERDICT r10 task #7): e.g.
    # DRIVER_SIM_EXTRA_CONF="spark.sql.adaptive.enabled=false" or
    # "...codegen.wholeStage=false" runs the whole surface under an
    # adversarial engine configuration; comma-separated k=v pairs
    # (values must not contain commas).  A malformed pair ABORTS: a
    # typo that silently ran the default config would commit a
    # robustness log evidencing a property that was never tested.
    extra_conf = os.environ.get("DRIVER_SIM_EXTRA_CONF", "")
    for kv in filter(None, extra_conf.split(",")):
        k, eq, v = kv.partition("=")
        if not eq or not k.strip() or not v.strip():
            sys.exit(f"DRIVER_SIM_EXTRA_CONF: malformed pair {kv!r} "
                     "(expected key=value[,key=value...])")
        builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from climateiq_pipelines_spark.parity import compare_frames, duck_connect

    assert len(E.entry(spark).collect()) > 0, "t1 smoke failed"
    con = duck_connect(sf_dir)
    qs, oracles = E.queries(), E.oracle_sql()
    if window_only:
        # The driver artifact truncates at 50 entries; registration
        # order IS certification priority (plans._apply_rotation_window)
        # — keep insertion order, not sorted order, for the slice.
        qs = dict(list(qs.items())[:50])
        print(f"# --window: first {len(qs)} registration-order keys",
              file=sys.stderr)
    # At the sf0.01 certification scale the sim is FAITHFUL to the real
    # driver: static oracle_sql() strings only.  At any other sf_dir,
    # keys with an SF-parameterized builder (plans.ORACLE_BUILDERS) get
    # their oracle built for that scale (VERDICT r9 task #2) — the
    # ORACLE_SF_PINNED attribution below remains the fallback for
    # pinned keys WITHOUT a builder.
    from climateiq_pipelines_spark.plans import ORACLE_BUILDERS

    from climateiq_pipelines_spark.session import release_blocks

    at_cert_sf = os.path.basename(sf_dir.rstrip("/")) == "sf0.01"
    bad: list[str] = []
    for key, fn in sorted(qs.items()):
        try:
            pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
            bad.append(f"[FAIL] {key}: raised {exc}")
            continue
        finally:
            # Deterministic block reclaim between keys — operators
            # localCheckpoint relations they return; without this the
            # blocks accumulate for the session lifetime and per-key
            # timing becomes order-dependent (session.release_blocks).
            # Best-effort: if the JVM just died (a key OOMed), the
            # reclaim raises too — swallow it so the sweep still
            # reaches its header/FAILURES report (round-12 self-review:
            # an uncaught finally would lose the evidence the except
            # clause exists to preserve).
            try:
                release_blocks(spark)
            except Exception as exc:  # noqa: BLE001
                print(f"# release_blocks failed after {key}: {exc}",
                      file=sys.stderr)
        if key not in oracles:
            print(f"# {key}: rows-only ({len(pdf)} rows)", file=sys.stderr)
            continue
        if not at_cert_sf and key in ORACLE_BUILDERS:
            oracle_text = ORACLE_BUILDERS[key](sf_dir)
        else:
            oracle_text = oracles[key]
        res = compare_frames(key, pdf, con.execute(oracle_text).fetchdf())
        if not res.ok:
            from climateiq_pipelines_spark.plans import ORACLE_SF_PINNED

            pinned = ORACLE_SF_PINNED.get(key)
            if pinned is not None and os.path.basename(
                sf_dir.rstrip("/")
            ) != pinned:
                # ADVICE r7: attributable, not a generic hash mismatch —
                # this oracle's unroll constants were measured on `pinned`.
                bad.append(
                    f"[FAIL] {key}: oracle is PINNED to {pinned} "
                    f"(fixture-measured unroll count) but this sweep ran "
                    f"{sf_dir} — re-measure the stopping round and "
                    f"regenerate the oracle for this SF. Raw: {res}"
                )
            else:
                bad.append(str(res))
    # Self-describing evidence header (VERDICT r11 task #2): in round 11
    # git detected two committed robustness logs as RENAMES of r8/r9
    # logs because the content was the identical string "ALL 232 KEYS
    # OK" — the claim chain ran through commit messages instead of the
    # artifact.  The first stdout line now embeds the run's own config,
    # so every archived .out is unique and auditable on its face.
    print(evidence_header(tz, sf_dir, window_only, len(qs),
                          time.monotonic() - t0, extra_conf=extra_conf,
                          master=master))
    print("FAILURES:" if bad else f"ALL {len(qs)} KEYS OK")
    for b in bad:
        print(b)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
