"""Property-based checks for the round-6 operators (SURVEY §5.2 #3
discipline): pure-Python references on ARBITRARY generated inputs — a
third independent implementation beside the Spark plan and the DuckDB
oracle.

- The P6 codec properties are pure Python (no Spark): random geometry +
  raster bytes must round-trip through _decode_image exactly, and
  malformed payloads must fail loudly, never return garbage pixels.
- The Q20 dominance property writes tiny lineitem/part/supplier
  fixtures and replays the dominance rule (supplier ships > 0.5x a
  'small%' part's 1996 total) with plain dict arithmetic over the same
  fixed-point micro-units the engine uses.
"""

from __future__ import annotations

import collections
import itertools
import math

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from climateiq_pipelines_spark.operators.multimodal import _decode_image
from climateiq_pipelines_spark.plans import QUERIES

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_counter = itertools.count()


# ------------------------------------------------------------- P6 codec


@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=16),
    maxval=st.integers(min_value=1, max_value=255),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    sep=st.sampled_from([b"\n", b" ", b"\t", b"\n\n"]),
)
@settings(max_examples=200, deadline=None)
def test_p6_codec_roundtrip(w, h, maxval, seed, sep):
    """Any well-formed P6 payload — arbitrary geometry, maxval, header
    whitespace, and raster bytes (including bytes that look like
    header characters) — decodes to exactly its raster."""
    n = w * h * 3
    raster = bytes((seed * 2654435761 + i * 40503) % 256 for i in range(n))
    payload = b"P6" + sep + str(w).encode() + sep + str(h).encode() + sep + str(
        maxval
    ).encode() + b"\n" + raster
    d = _decode_image(payload)
    assert (d["width"], d["height"], d["maxval"]) == (w, h, maxval)
    assert d["px"].shape == (h, w, 3)
    assert d["px"].tobytes() == raster


@given(
    w=st.integers(min_value=1, max_value=8),
    h=st.integers(min_value=1, max_value=8),
    missing=st.integers(min_value=1, max_value=10),
)
@settings(max_examples=100, deadline=None)
def test_p6_codec_rejects_truncated_raster(w, h, missing):
    """A raster short of width*height*3 bytes must raise, never return
    a silently-misshapen pixel array."""
    n = w * h * 3
    cut = max(0, n - missing)
    payload = f"P6\n{w} {h}\n255\n".encode() + bytes(cut)
    try:
        _decode_image(payload)
    except ValueError:
        return
    raise AssertionError("truncated raster decoded without error")


def test_p6_codec_rejects_malformed_header():
    for bad in (b"P6", b"P6\n", b"P6\nx y\n255\n" + bytes(12)):
        try:
            _decode_image(bad)
        except ValueError:
            continue
        raise AssertionError(f"malformed header accepted: {bad!r}")


# --------------------------------------------------------- Q20 dominance

# (part_idx 0..2, supp_idx 0..2, qty 1..9, in_1996?) rows; part 0/1 are
# 'small …' named, part 2 is not.
lineitem_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=1, max_value=9),
        st.booleans(),
    ),
    min_size=1,
    max_size=20,
)

_P_NAMES = ["small ring", "small gizmo", "red widget"]


def _write_q20_fixture(base, rows):
    d = base / f"q20_{next(_counter)}"
    d.mkdir()
    s, i64, i32, f64 = pa.string(), pa.int64(), pa.int32(), pa.float64()
    ts = pa.timestamp("us")
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([0, 1, 2], i64),
                "p_name": pa.array(_P_NAMES, s),
                "p_brand": pa.array(["Brand#1"] * 3, s),
                "p_type": pa.array(["PROMO"] * 3, s),
                "p_size": pa.array([1, 2, 3], i32),
                "p_retailprice": pa.array([1.0, 2.0, 3.0], f64),
            }
        ),
        str(d / "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([0, 1, 2], i64),
                "s_name": pa.array([f"S{i}" for i in range(3)], s),
                "s_nationkey": pa.array([0, 1, 2], i32),
                "s_acctbal": pa.array([10.0, 20.0, 30.0], f64),
            }
        ),
        str(d / "supplier.parquet"),
    )
    import datetime as dt

    in96 = dt.datetime(1996, 6, 1)
    out96 = dt.datetime(1997, 6, 1)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(range(len(rows)), i64),
                "l_partkey": pa.array([r[0] for r in rows], i64),
                "l_suppkey": pa.array([r[1] for r in rows], i64),
                "l_linenumber": pa.array([1] * len(rows), i32),
                "l_quantity": pa.array([float(r[2]) for r in rows], f64),
                "l_extendedprice": pa.array([100.0] * len(rows), f64),
                "l_discount": pa.array([0.0] * len(rows), f64),
                "l_tax": pa.array([0.0] * len(rows), f64),
                "l_returnflag": pa.array(["N"] * len(rows), s),
                "l_linestatus": pa.array(["O"] * len(rows), s),
                "l_shipdate": pa.array(
                    [in96 if r[3] else out96 for r in rows], ts
                ),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    return str(d)


@given(rows=lineitem_rows)
@settings(**SETTINGS)
def test_q20_dominance_matches_reference(spark, tmp_path_factory, rows):
    """q20_potential_promotion on arbitrary tiny supply data must equal
    the dict-arithmetic reference: a supplier qualifies iff for SOME
    'small%'-named part its 1996 shipped quantity (micro-unit fixed
    point, like the engine) exceeds half the part's 1996 total."""
    base = tmp_path_factory.mktemp("q20prop")
    d = _write_q20_fixture(base, rows)

    per = collections.Counter()
    tot = collections.Counter()
    for part, supp, qty, in96 in rows:
        if part == 2 or not in96:  # not 'small%' / outside 1996
            continue
        micros = math.floor(qty * 1_000_000)
        per[(part, supp)] += micros
        tot[part] += micros
    expected = {
        f"S{supp}"
        for (part, supp), q in per.items()
        if q / 1e6 > 0.5 * (tot[part] / 1e6)
    }
    got = {
        r["s_name"]
        for r in QUERIES["q20_potential_promotion"](spark, d).collect()
    }
    assert got == expected, (rows, got, expected)
