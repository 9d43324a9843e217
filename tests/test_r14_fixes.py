"""Round-14 fix pins (VERDICT r13 tasks + ADVICE r13).

1. udtf_explode_sessions on a NULL-ts fixture: a NaT row is a singleton
   session with NULL duration on BOTH engines (ADVICE r13 — the engine
   side used to raise int(NaT - NaT) while the oracle yielded NULL).
2. events_top_paths on a NULL-component fixture: NULL paths are
   excluded BEFORE the rank window on both sides (ADVICE r13 — Spark
   sorts NULLs first on the ascending path key, DuckDB last, so a NULL
   path near the top-10 boundary diverged the ranks).
3. session.new_temp_dir creates AND registers in one call with the
   auditable cps_{tag}_ prefix, and no raw tempfile.mkdtemp call
   remains anywhere in the engine package outside session.py (round-13
   review batch B's recorded deferral).
4. sources/manifest_read.py carries no bare ``assert`` on the read
   path — the layout-contract guard is a plain raise that survives
   python -O (the r12 lakehouse_txn precedent).
"""

from __future__ import annotations

import ast
import datetime as dt
import glob
import itertools
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from climateiq_pipelines_spark.parity import compare_frames
from climateiq_pipelines_spark.plans import ORACLES, QUERIES

_PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "climateiq_pipelines_spark")
_counter = itertools.count()


def _write_events(base, rows):
    """rows: (user_id, ts_or_None_minutes, event_type_or_None, value)."""
    d = base / f"ev14_{next(_counter)}"
    d.mkdir()
    t0 = dt.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [
                        None if r[1] is None else t0 + dt.timedelta(minutes=r[1])
                        for r in rows
                    ],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


def _oracle_on(sf_dir: str, key: str):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet')"
        )
        return con.execute(ORACLES[key]).fetchdf()
    finally:
        con.close()


def test_explode_sessions_null_ts_parity(spark, tmp_path_factory):
    """A NULL-ts event is a SINGLETON session with NULL duration on both
    engines: the oracle's `ts - lag(ts) <= 30min` is not-true on either
    side of a NULL, and epoch_us(NULL) - epoch_us(NULL) is NULL.  The
    engine used to crash on int(NaT - NaT) here (ADVICE r13)."""
    rows = [
        (1, 0.0, "view", 1.25),
        (1, 5.0, "click", 2.5),
        (1, None, "view", 3.0),      # NaT mid-stream
        (1, 10.0, "purchase", 4.0),
        (2, None, "view", 7.0),      # user with ONLY a NaT event
        (3, 0.0, "view", 1.0),
        (3, 45.0, "click", 2.0),     # normal 30-min gap split
    ]
    d = _write_events(tmp_path_factory.mktemp("natsess"), rows)
    key = "udtf_explode_sessions"
    got = QUERIES[key](spark, d).toPandas()
    res = compare_frames(key, got, _oracle_on(d, key))
    assert res.ok, res.reasons
    # And the NaT sessions really are NULL-duration singletons.  Note
    # the NaT row sorts LAST on both engines (pandas na_position /
    # DuckDB NULLS LAST), so user 1's three timed events stay one
    # session and the NaT row is an appended singleton.
    by_user = got.set_index(["user_id", "session_seq"])
    nat_rows = got[got["duration_sec"].isna()]
    assert len(nat_rows) == 2
    assert (nat_rows["n_events"] == 1).all()
    assert len(by_user.loc[1]) == 2  # timed triple + NaT singleton
    assert by_user.loc[1].loc[1, "n_events"] == 3
    assert by_user.loc[1].loc[1, "duration_sec"] == 600


def test_top_paths_null_event_type_parity(spark, tmp_path_factory):
    """A NULL event_type inside a trigram window must NOT reach the rank
    stage: both sides drop NULL-component paths pre-aggregation, so the
    Spark-NULLS-first / DuckDB-NULLS-last ordering seam can't fire."""
    rows = [
        # user 1: v>c>p plus a NULL poisoning three windows
        (1, 0.0, "view", 1.0),
        (1, 1.0, "click", 1.0),
        (1, 2.0, "purchase", 1.0),
        (1, 3.0, None, 1.0),
        (1, 4.0, "view", 1.0),
        (1, 5.0, "click", 1.0),
        (1, 6.0, "purchase", 1.0),
        # user 2: all NULL types — contributes nothing
        (2, 0.0, None, 1.0),
        (2, 1.0, None, 1.0),
        (2, 2.0, None, 1.0),
    ]
    d = _write_events(tmp_path_factory.mktemp("nullpath"), rows)
    key = "events_top_paths"
    got = QUERIES[key](spark, d).toPandas()
    res = compare_frames(key, got, _oracle_on(d, key))
    assert res.ok, res.reasons
    assert got["path"].notna().all()
    assert set(got["path"]) == {"view>click>purchase"}
    assert got["n_occurrences"].tolist() == [2]


def test_new_temp_dir_registers_with_auditable_prefix():
    from climateiq_pipelines_spark import session as S

    d = S.new_temp_dir("r14probe")
    try:
        assert os.path.isdir(d)
        assert os.path.basename(d).startswith("cps_r14probe_")
        assert S.SESSION_TEMP_DIRS and S.SESSION_TEMP_DIRS[-1] == d
    finally:
        S.SESSION_TEMP_DIRS.remove(d)
        os.rmdir(d)


def test_no_raw_mkdtemp_outside_session():
    """new_temp_dir is the only sanctioned mkdtemp in the engine package
    — a raw two-step call site is one forgotten wrap from a /tmp leak."""
    offenders = []
    for path in glob.glob(os.path.join(_PKG, "**", "*.py"), recursive=True):
        if os.path.basename(path) == "session.py":
            continue
        src = open(path).read()
        if "mkdtemp" in src:
            # comments/docstrings are fine; real calls are not
            for node in ast.walk(ast.parse(src)):
                if (
                    isinstance(node, ast.Attribute)
                    and node.attr == "mkdtemp"
                ):
                    offenders.append(f"{path}:{node.lineno}")
    assert not offenders, offenders


def test_manifest_read_has_no_bare_asserts():
    """The layout-contract guard on the manifest READ path must survive
    python -O: plain raise, zero ast.Assert nodes in the module."""
    src = open(os.path.join(_PKG, "sources", "manifest_read.py")).read()
    asserts = [
        n.lineno for n in ast.walk(ast.parse(src))
        if isinstance(n, ast.Assert)
    ]
    assert not asserts, f"bare asserts at lines {asserts}"
    assert "layout contract broken" in src


def test_bench_gate_uses_self_cleaning_tempdir():
    """ADVICE r13: the gated bench's private rendezvous dir must not
    outlive the run — TemporaryDirectory, never bare mkdtemp."""
    tools = os.path.join(os.path.dirname(_PKG), "tools")
    src = open(os.path.join(tools, "bench_gated.py")).read()
    assert "TemporaryDirectory" in src
    assert "mkdtemp(" not in src
