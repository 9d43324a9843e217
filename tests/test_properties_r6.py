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


# ------------------------------------------------- Q11 stock threshold

# (partkey 0..3, supp_idx 0..2, price 1..999, discount tenths 0..3) rows;
# suppliers 0/2 belong to NATION_7, supplier 1 does not.
q11_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=1, max_value=999),
        st.integers(min_value=0, max_value=3),
    ),
    min_size=0,
    max_size=24,
)

_SUPP_NATION = [7, 3, 7]


def _write_q11_fixture(base, rows):
    d = base / f"q11_{next(_counter)}"
    d.mkdir()
    s, i64, i32, f64 = pa.string(), pa.int64(), pa.int32(), pa.float64()
    import datetime as dt

    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(25), i32),
                "n_name": pa.array([f"NATION_{i}" for i in range(25)], s),
                "n_regionkey": pa.array([i % 5 for i in range(25)], i32),
            }
        ),
        str(d / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([0, 1, 2], i64),
                "s_name": pa.array([f"S{i}" for i in range(3)], s),
                "s_nationkey": pa.array(_SUPP_NATION, i32),
                "s_acctbal": pa.array([10.0, 20.0, 30.0], f64),
            }
        ),
        str(d / "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(range(len(rows)), i64),
                "l_partkey": pa.array([r[0] for r in rows], i64),
                "l_suppkey": pa.array([r[1] for r in rows], i64),
                "l_linenumber": pa.array([1] * len(rows), i32),
                "l_quantity": pa.array([1.0] * len(rows), f64),
                "l_extendedprice": pa.array(
                    [float(r[2]) for r in rows], f64
                ),
                "l_discount": pa.array([r[3] / 10.0 for r in rows], f64),
                "l_tax": pa.array([0.0] * len(rows), f64),
                "l_returnflag": pa.array(["N"] * len(rows), s),
                "l_linestatus": pa.array(["O"] * len(rows), s),
                "l_shipdate": pa.array(
                    [dt.datetime(1996, 6, 1)] * len(rows),
                    pa.timestamp("us"),
                ),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    return str(d)


@given(rows=q11_rows)
@settings(**SETTINGS)
def test_q11_threshold_matches_reference(spark, tmp_path_factory, rows):
    """q11_important_stock on arbitrary tiny supply data must equal the
    dict-arithmetic reference: per-part int64 micro-sums of discounted
    revenue through NATION_7's suppliers, kept iff v*200 > grand total
    — the same fixed-point ops in plain Python (IEEE doubles, like the
    engine), including the empty-nation-slice → empty-result edge."""
    base = tmp_path_factory.mktemp("q11prop")
    d = _write_q11_fixture(base, rows)

    vals = collections.Counter()
    for part, supp, price, disc in rows:
        if _SUPP_NATION[supp] != 7:
            continue
        vals[part] += math.floor(float(price) * (1 - disc / 10.0) * 1_000_000)
    total = sum(vals.values())
    expected = {
        part: v / 1e6 for part, v in vals.items() if v * 200 > total
    }
    got = {
        r["l_partkey"]: r["part_value"]
        for r in QUERIES["q11_important_stock"](spark, d).collect()
    }
    assert got == expected, (rows, got, expected)


# ---------------------------------------------------- SemDeDup survivor

# n vectors of dim 4 over a coarse grid (collisions likely), labels 0..2.
semdedup_vecs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # label
        st.lists(
            st.sampled_from([-1.0, -0.5, 0.0, 0.5, 1.0]),
            min_size=4,
            max_size=4,
        ),
    ),
    min_size=1,
    max_size=16,
)


def _write_semdedup_fixture(base, vecs):
    d = base / f"sdd_{next(_counter)}"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [v for _, v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([l for l, _ in vecs], pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


@given(vecs=semdedup_vecs)
@settings(**SETTINGS)
def test_semdedup_matches_reference(spark, tmp_path_factory, vecs):
    """llm_semdedup on arbitrary tiny clustered vectors must equal the
    brute-force reference: v is dropped iff SOME earlier same-label u
    has int-fixed-point dot >= tau; dup count and max similarity match
    exactly (grid values make identical vectors — dot ties — likely)."""
    base = tmp_path_factory.mktemp("sddprop")
    d = _write_semdedup_fixture(base, vecs)

    def int_dot(a, b):
        return sum(
            math.floor(float(x) * float(y) * 1_000_000_000_000)
            for x, y in zip(a, b)
        )

    tau = 3 * 10**11
    expected = {}
    for j, (lj, vj) in enumerate(vecs):
        dots = [
            int_dot(vi, vj)
            for i, (li, vi) in enumerate(vecs[:j])
            if li == lj and int_dot(vi, vj) >= tau
        ]
        expected[j] = (
            lj,
            len(dots),
            int(max(dots)) // 10**6 if dots else 0,
            not dots,
        )
    got = {
        r["vec_id"]: (
            r["cluster_id"],
            r["n_earlier_dups"],
            r["max_sim_micros"],
            r["kept"],
        )
        for r in QUERIES["llm_semdedup"](spark, d).collect()
    }
    assert got == expected, (vecs, got, expected)


# ------------------------------------------------------ DSIR reference

# Tiny corpora over a 4-word vocab: duplicates, empty docs, double
# spaces, single tokens; first two docs are target (src0), rest raw.
dsir_docs = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", ""]),
        min_size=0,
        max_size=8,
    ),
    min_size=1,
    max_size=10,
)


def _write_dsir_fixture(base, docs):
    d = base / f"dsir_{next(_counter)}"
    d.mkdir()
    texts = [" ".join(words) for words in docs]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(
                    ["src0" if i < 2 else "src9" for i in range(len(texts))],
                    pa.string(),
                ),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@given(docs=dsir_docs)
@settings(**SETTINGS)
def test_dsir_matches_reference(spark, tmp_path_factory, docs):
    """llm_dsir_weights on arbitrary tiny corpora must equal the plain-
    Python reference: hashlib-md5 bucketed uni+bigrams, add-one ratios
    through the same (t+1)(R+B)/((r+1)(T+B)) float expression, floored
    micros, integer per-doc sums — including empty docs (absent from
    the output on both sides) and double-space token gaps."""
    import hashlib

    base = tmp_path_factory.mktemp("dsirprop")
    d = _write_dsir_fixture(base, docs)

    B = 64

    def bucket(g):
        h = hashlib.md5(g.encode()).hexdigest()
        return (16 * int(h[30], 16) + int(h[31], 16)) % B

    def grams_of(words):
        ws = [w for w in words if w != ""]
        return ws + [f"{a}_{b}" for a, b in zip(ws, ws[1:])]

    t_cnt, r_cnt = collections.Counter(), collections.Counter()
    doc_buckets = {}
    for i, words in enumerate(docs):
        bs = [bucket(g) for g in grams_of(words)]
        if i < 2:
            t_cnt.update(bs)
        else:
            r_cnt.update(bs)
            if bs:
                doc_buckets[i] = collections.Counter(bs)
    T, R = sum(t_cnt.values()), sum(r_cnt.values())
    micro = {
        b: math.floor(
            (float(t_cnt[b] + 1) * float(R + B))
            / (float(r_cnt[b] + 1) * float(T + B))
            * 1e6
        )
        for b in set(t_cnt) | set(r_cnt)
    }
    expected = {}
    for i, bs in doc_buckets.items():
        n = sum(bs.values())
        s = sum(cnt * micro[b] for b, cnt in bs.items())
        expected[i] = (n, s / 1e6, s > n * 1_000_000)
    got = {
        r["doc_id"]: (r["n_grams"], r["dsir_score"], r["selected"])
        for r in QUERIES["llm_dsir_weights"](spark, d).collect()
    }
    assert got == expected, (docs, got, expected)


# ---------------------------------------------------- top event paths

# (user 0..2, t 0..9, event_type a/b/c) tuples; duplicate timestamps
# force the event_id tie-break, tiny streams force count ties at the
# top-k cutoff.
paths_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=9),
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=1,
    max_size=20,
)


def _write_events_fixture(base, rows):
    import datetime as dt

    d = base / f"ev_{next(_counter)}"
    d.mkdir()
    t0 = dt.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [t0 + dt.timedelta(minutes=r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@given(rows=paths_events)
@settings(**SETTINGS)
def test_top_paths_matches_reference(spark, tmp_path_factory, rows):
    """events_top_paths on arbitrary tiny streams must equal the plain-
    Python reference: per-user (ts, event_id)-ordered trigrams, counted,
    top-10 under the (count desc, path asc) total order — including the
    duplicate-timestamp tie-break and count ties at the cutoff."""
    base = tmp_path_factory.mktemp("pathsprop")
    d = _write_events_fixture(base, rows)

    by_user = collections.defaultdict(list)
    for eid, (u, t, et) in enumerate(rows):
        by_user[u].append((t, eid, et))
    cnt = collections.Counter()
    for u, evs in by_user.items():
        seq = [et for _, _, et in sorted(evs)]
        for i in range(len(seq) - 2):
            cnt[">".join(seq[i : i + 3])] += 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expected = {
        path: (n, rk + 1) for rk, (path, n) in enumerate(ranked)
    }
    got = {
        r["path"]: (r["n_occurrences"], r["rank"])
        for r in QUERIES["events_top_paths"](spark, d).collect()
    }
    assert got == expected, (rows, got, expected)
