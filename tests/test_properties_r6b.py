"""Property-based checks for the round-6b operators (SURVEY §5.2 #3
discipline): pure-Python references on ARBITRARY generated inputs — a
third independent implementation beside the Spark plan and the DuckDB
oracle.

- The Morton/z-order property needs no Spark at all: the generated SQL
  expression (evaluated by DuckDB, the same text Spark runs modulo the
  div token) must equal a bit-twiddling Python reference on arbitrary
  coordinates, and consecutive-block locality must hold by construction.
- Gap-islands / Markov / chunk-dedup / unigram-logprob replay their
  definitions with plain dict/itertools arithmetic over tiny generated
  fixtures, exercising duplicate timestamps (event_id tie-break), empty
  documents, and single-event users that the driver fixtures never hit.
"""

from __future__ import annotations

import collections
import itertools

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from climateiq_pipelines_spark.operators.relational_ext import (
    _z_interleave_sql,
)
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


# --------------------------------------------------------- Morton code


def _morton_ref(x: int, y: int) -> int:
    z = 0
    for i in range(8):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


@given(
    x=st.integers(min_value=0, max_value=255),
    y=st.integers(min_value=0, max_value=255),
)
@settings(max_examples=200, deadline=None)
def test_z_interleave_sql_matches_bit_reference(x, y):
    """The generated z-order SQL (the exact text both engines evaluate,
    DuckDB token) equals the bit-twiddling reference on any (x, y)."""
    expr = _z_interleave_sql(str(x), str(y), "//")
    got = duckdb.sql(f"SELECT {expr}").fetchone()[0]
    assert got == _morton_ref(x, y), (x, y, got)


@given(x=st.integers(min_value=0, max_value=255))
@settings(max_examples=50, deadline=None)
def test_z_tiles_bound_both_dims(x):
    """Locality by construction: all 256 points of one x-row scatter
    across z-tiles whose 16x16 bound holds — i.e. for every y, the
    (x, y) point's tile, when decoded, stays within a 16-wide square
    around (x, y). Checked via the reference (the SQL equality above
    transfers it to the engines)."""
    for y in range(0, 256, 17):
        z = _morton_ref(x, y)
        tile = z >> 8
        # every point in this tile shares the high 4 bits of both dims:
        # decode tile -> x-high, y-high nibbles (deinterleave 8 bits)
        xh = yh = 0
        for i in range(4):
            xh |= ((tile >> (2 * i + 1)) & 1) << i
            yh |= ((tile >> (2 * i)) & 1) << i
        assert xh == x >> 4 and yh == y >> 4, (x, y, tile)


# -------------------------------------------------- events fixtures

events_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.integers(min_value=0, max_value=9),  # minute (dups force ties)
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


def _ordered_streams(rows):
    by_user = collections.defaultdict(list)
    for eid, (u, t, et) in enumerate(rows):
        by_user[u].append((t, eid, et))
    return {
        u: [et for _, _, et in sorted(evs)] for u, evs in by_user.items()
    }


@given(rows=events_rows)
@settings(**SETTINGS)
def test_gap_islands_matches_reference(spark, tmp_path_factory, rows):
    """win_gap_islands on arbitrary tiny streams must equal the
    itertools.groupby reference — including duplicate timestamps
    (event_id tie-break) and single-event islands."""
    base = tmp_path_factory.mktemp("islprop")
    d = _write_events_fixture(base, rows)

    expected = {}
    for u, stream in _ordered_streams(rows).items():
        runs = collections.defaultdict(list)
        for et, grp in itertools.groupby(stream):
            runs[et].append(len(list(grp)))
        for et, lens in runs.items():
            expected[(u, et)] = (len(lens), max(lens), sum(lens))
    got = {
        (r["user_id"], r["event_type"]): (
            r["n_islands"],
            r["longest_island"],
            r["n_events"],
        )
        for r in QUERIES["win_gap_islands"](spark, d).collect()
    }
    assert got == expected, (rows, got, expected)


@given(rows=events_rows)
@settings(**SETTINGS)
def test_markov_matches_reference(spark, tmp_path_factory, rows):
    """events_markov_transitions equals the Counter reference: per-user
    consecutive pairs, counts, and floor((n * 1e6) / row_total)."""
    base = tmp_path_factory.mktemp("mkvprop")
    d = _write_events_fixture(base, rows)

    cnt = collections.Counter()
    for stream in _ordered_streams(rows).values():
        cnt.update(zip(stream, stream[1:]))
    totals = collections.Counter()
    for (a, _), n in cnt.items():
        totals[a] += n
    expected = {
        (a, b): (n, (n * 1_000_000) // totals[a])
        for (a, b), n in cnt.items()
    }
    got = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["p_micro"])
        for r in QUERIES["events_markov_transitions"](spark, d).collect()
    }
    assert got == expected, (rows, got, expected)


# ------------------------------------------------ documents fixtures

docs_lists = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", ""]),
        min_size=0,
        max_size=25,
    ),
    min_size=1,
    max_size=8,
)


def _write_docs_fixture(base, docs):
    d = base / f"doc_{next(_counter)}"
    d.mkdir()
    texts = [" ".join(words) for words in docs]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["src0"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@given(docs=docs_lists)
@settings(**SETTINGS)
def test_chunk_dedup_matches_reference(spark, tmp_path_factory, docs):
    """llm_chunk_dedup equals the plain-Python reference: 10-word
    chunks over the filtered word list, boilerplate = chunk in >= 2
    distinct docs, kept fraction by integer floor division. Empty docs
    (no chunks) are absent from the output on both sides; duplicated
    docs degenerate to 100% boilerplate."""
    base = tmp_path_factory.mktemp("chunkprop")
    d = _write_docs_fixture(base, docs)

    chunks_by_doc = {}
    for i, words in enumerate(docs):
        ws = [w for w in words if w != ""]
        chunks_by_doc[i] = [
            " ".join(ws[j : j + 10]) for j in range(0, len(ws), 10)
        ]
    doc_count = collections.Counter()
    for i, cs in chunks_by_doc.items():
        doc_count.update(set(cs))
    boiler = {c for c, n in doc_count.items() if n >= 2}
    expected = {}
    for i, cs in chunks_by_doc.items():
        if not cs:
            continue
        nb = sum(1 for c in cs if c in boiler)
        expected[i] = (
            len(cs),
            nb,
            ((len(cs) - nb) * 1_000_000) // len(cs),
        )
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_boilerplate"], r["kept_micro"])
        for r in QUERIES["llm_chunk_dedup"](spark, d).collect()
    }
    assert got == expected, (docs, got, expected)


@given(docs=docs_lists)
@settings(**SETTINGS)
def test_unigram_logprob_matches_reference(spark, tmp_path_factory, docs):
    """llm_unigram_logprob equals the plain-Python reference: corpus
    token counts, per-token bits = floor(log2(cnt)) + 1 (bit_length),
    integer millibit mean, >= 9500 selection."""
    base = tmp_path_factory.mktemp("lmprop")
    d = _write_docs_fixture(base, docs)

    vocab = collections.Counter()
    toks = {}
    for i, words in enumerate(docs):
        ws = [w for w in words if w != ""]
        toks[i] = ws
        vocab.update(ws)
    expected = {}
    for i, ws in toks.items():
        if not ws:
            continue
        sum_bits = sum(vocab[w].bit_length() for w in ws)
        mean_mb = (sum_bits * 1000) // len(ws)
        expected[i] = (len(ws), sum_bits, mean_mb, mean_mb >= 9500)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["sum_bits"],
            r["mean_millibits"],
            r["selected"],
        )
        for r in QUERIES["llm_unigram_logprob"](spark, d).collect()
    }
    assert got == expected, (docs, got, expected)


# ------------------------------------------------------- pagerank

# (custkey, suppkey) purchase pairs; duplicates force the DISTINCT
# edge set, single-customer graphs force star shapes.
purchase_pairs = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=1, max_value=3),
    ),
    min_size=1,
    max_size=12,
)


def _write_purchase_fixture(base, pairs):
    import datetime as dt

    d = base / f"pr_{next(_counter)}"
    d.mkdir()
    n = len(pairs)
    ts = pa.timestamp("us")
    t0 = dt.datetime(1995, 1, 1)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(1, n + 1), pa.int64()),
                "o_custkey": pa.array([p[0] for p in pairs], pa.int64()),
                "o_orderstatus": pa.array(["O"] * n, pa.string()),
                "o_totalprice": pa.array([100.0] * n, pa.float64()),
                "o_orderdate": pa.array([t0] * n, ts),
                "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
            }
        ),
        str(d / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(range(1, n + 1), pa.int64()),
                "l_partkey": pa.array([1] * n, pa.int64()),
                "l_suppkey": pa.array([p[1] for p in pairs], pa.int64()),
                "l_linenumber": pa.array([1] * n, pa.int32()),
                "l_quantity": pa.array([1.0] * n, pa.float64()),
                "l_extendedprice": pa.array([100.0] * n, pa.float64()),
                "l_discount": pa.array([0.0] * n, pa.float64()),
                "l_tax": pa.array([0.0] * n, pa.float64()),
                "l_returnflag": pa.array(["N"] * n, pa.string()),
                "l_linestatus": pa.array(["O"] * n, pa.string()),
                "l_shipdate": pa.array([t0] * n, ts),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    return str(d)


@given(pairs=purchase_pairs)
@settings(**SETTINGS)
def test_pagerank_matches_reference(spark, tmp_path_factory, pairs):
    """graph_pagerank on arbitrary tiny purchase graphs equals the
    plain-Python power iteration: distinct symmetric edges, integer
    floor division per contribution, (sum * 85) // 100 + 150000 per
    round, 3 rounds."""
    base = tmp_path_factory.mktemp("prprop")
    d = _write_purchase_fixture(base, pairs)

    edges = {(c * 2, s * 2 + 1) for c, s in pairs}
    sym = list(edges) + [(v, u) for u, v in edges]
    deg = collections.Counter(u for u, _ in sym)
    r = {n: 1_000_000 for n in deg}
    for _ in range(3):
        s = collections.Counter()
        for u, v in sym:
            s[v] += r[u] // deg[u]
        r = {v: 150_000 + (s[v] * 85) // 100 for v in s}
    expected = {
        n: (n % 2 == 1, deg[n], rank) for n, rank in r.items()
    }
    got = {
        row["node_id"]: (
            row["is_supplier"],
            row["degree"],
            row["rank_micro"],
        )
        for row in QUERIES["graph_pagerank"](spark, d).collect()
    }
    assert got == expected, (pairs, got, expected)


@given(docs=docs_lists)
@settings(**SETTINGS)
def test_sliding_chunks_matches_reference(spark, tmp_path_factory, docs):
    """llm_sliding_chunks equals the plain-Python reference: stride-48
    width-64 windows over the filtered word list, ceil(n/48) chunks,
    md5 digests of the joined chunk text; empty docs emit nothing."""
    import hashlib

    base = tmp_path_factory.mktemp("slideprop")
    d = _write_docs_fixture(base, docs)

    expected = {}
    for i, words in enumerate(docs):
        ws = [w for w in words if w != ""]
        for j in range(0, -(-len(ws) // 48)):
            cw = ws[48 * j : 48 * j + 64]
            expected[(i, j)] = (
                len(cw),
                hashlib.md5(" ".join(cw).encode()).hexdigest(),
            )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_digest"])
        for r in QUERIES["llm_sliding_chunks"](spark, d).collect()
    }
    assert got == expected, (docs, got, expected)


# ------------------------------------------------------- WAV codec


def _wav_payload(n_ch, rate, raster, extra_chunk=False):
    import struct

    data_sz = len(raster)
    body = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, n_ch, rate, rate * 2 * n_ch, 2 * n_ch, 16
    )
    if extra_chunk:
        body += b"LIST" + struct.pack("<I", 4) + b"INFO"
    body += b"data" + struct.pack("<I", data_sz) + raster
    if data_sz & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


@given(
    n_ch=st.integers(min_value=1, max_value=4),
    n_frames=st.integers(min_value=1, max_value=64),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    extra=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_wav_codec_roundtrip(n_ch, n_frames, rate, seed, extra):
    """Any well-formed PCM16 WAV — arbitrary channel count, rate,
    raster bytes (including negative samples and bytes that look like
    chunk ids), and an unknown skippable chunk — decodes to exactly
    its sample matrix."""
    import numpy as np

    from climateiq_pipelines_spark.operators.multimodal import _decode_wav

    n = n_frames * n_ch * 2
    raster = bytes((seed * 2654435761 + i * 40503) % 256 for i in range(n))
    d = _decode_wav(_wav_payload(n_ch, rate, raster, extra))
    assert d["n_channels"] == n_ch and d["sample_rate"] == rate
    want = np.frombuffer(raster, "<i2").reshape(-1, n_ch)
    assert (d["samples"] == want).all()


def test_wav_codec_rejects_malformed():
    import struct

    import pytest as _pytest

    from climateiq_pipelines_spark.operators.multimodal import _decode_wav

    good = _wav_payload(1, 8000, b"\x01\x02\x03\x04")
    _decode_wav(good)  # sanity
    for bad in [
        b"RIFX" + good[4:],                      # bad magic
        good[:8] + b"WAVX" + good[12:],          # bad form type
        good[:-2],                               # truncated data chunk
        good[:12] + good[36:],                   # missing fmt
        good[:20] + struct.pack("<H", 3) + good[22:],   # float fmt
        good[:34] + struct.pack("<H", 8) + good[36:],   # 8-bit
    ]:
        with _pytest.raises(ValueError):
            _decode_wav(bad)


# ---------------------------------------------------- BPE iteration

bpe_docs = st.lists(
    st.lists(
        st.sampled_from(["aa", "aaa", "aab", "abab", "ba", "b", "abc"]),
        min_size=1,
        max_size=10,
    ),
    min_size=1,
    max_size=6,
)


def _bpe_reference(docs):
    """Plain-Python BPE iteration: pair stats -> argmax merge ->
    greedy left-to-right application -> iteration-2 top-10."""
    vocab = collections.Counter()
    for words in docs:
        vocab.update(w for w in words if w != "")
    p1 = collections.Counter()
    for w, wc in vocab.items():
        for x, y in zip(w, w[1:]):
            p1[(x, y)] += wc
    if not p1:
        return {}
    a, b = min(p1, key=lambda k: (-p1[k], k))
    p2 = collections.Counter()
    for w, wc in vocab.items():
        toks, i = [], 0
        for c in w:
            if toks and toks[-1] == a and c == b:
                toks[-1] = a + b
            else:
                toks.append(c)
        for x, y in zip(toks, toks[1:]):
            p2[(x, y)] += wc
    ranked = sorted(p2.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    return {
        f"{x}_{y}": (f"{a}_{b}", n, rk + 1)
        for rk, ((x, y), n) in enumerate(ranked)
    }


@given(docs=bpe_docs)
@settings(**SETTINGS)
def test_bpe_apply_merge_matches_reference(spark, tmp_path_factory, docs):
    """llm_bpe_apply_merge on arbitrary tiny corpora equals the
    plain-Python BPE iteration — including the greedy non-overlap
    rule on runs ('aaa' under (a,a) -> [aa, a]) and frequency ties
    broken by pair text."""
    base = tmp_path_factory.mktemp("bpeprop")
    d = _write_docs_fixture(base, docs)

    expected = _bpe_reference(docs)
    got = {
        r["pair"]: (r["applied_merge"], r["n_occurrences"], r["rank"])
        for r in QUERIES["llm_bpe_apply_merge"](spark, d).collect()
    }
    assert got == expected, (docs, got, expected)


# -------------------------------------------- interval-overlap join

ivl_orders = st.lists(
    st.integers(min_value=0, max_value=120),  # day offsets
    min_size=1,
    max_size=30,
)


def _write_orders_fixture(base, day_offsets):
    import datetime as dt

    d = base / f"ivl_{next(_counter)}"
    d.mkdir()
    n = len(day_offsets)
    ts = pa.timestamp("us")
    t0 = dt.datetime(1995, 1, 1)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n), pa.int64()),
                "o_custkey": pa.array([1] * n, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n, pa.string()),
                "o_totalprice": pa.array([100.0] * n, pa.float64()),
                "o_orderdate": pa.array(
                    [t0 + dt.timedelta(days=o) for o in day_offsets], ts
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
            }
        ),
        str(d / "orders.parquet"),
    )
    return str(d)


@given(days=ivl_orders)
@settings(**SETTINGS)
def test_interval_overlap_matches_bruteforce(
    spark, tmp_path_factory, days
):
    """join_interval_overlap (grid-bucketed) equals the brute-force
    O(|A|·|B|) reference on arbitrary tiny interval sets — the grid
    explode/equi-join/distinct pipeline must be exactly lossless,
    including touching endpoints and intervals spanning 2-3 month
    cells. Uses the engine's own A/B slicing rule (key % 97 == 0 /
    key % 89 == 1), so keys 0 and 1 always yield one interval each."""
    import datetime as dt

    base = tmp_path_factory.mktemp("ivlprop")
    d = _write_orders_fixture(base, days)

    t0 = dt.date(1995, 1, 1)
    a, b = [], []
    for k, off in enumerate(days):
        start = t0 + dt.timedelta(days=off)
        if k % 97 == 0:
            a.append((k, start, start + dt.timedelta(days=(k % 30) + 1)))
        if k % 89 == 1:
            b.append((k, start, start + dt.timedelta(days=(k % 45) + 1)))
    expected = {}
    for ak, as_, ae in a:
        for bk, bs, be in b:
            if as_ <= be and bs <= ae:
                expected[(ak, bk)] = (min(ae, be) - max(as_, bs)).days
    got = {
        (r["a_key"], r["b_key"]): r["overlap_days"]
        for r in QUERIES["join_interval_overlap"](spark, d).collect()
    }
    assert got == expected, (days, got, expected)


@given(days=ivl_orders)
@settings(**SETTINGS)
def test_windowed_topk_matches_reference(spark, tmp_path_factory, days):
    """events_windowed_topk equals the Counter reference on a
    single-day stream with duplicate timestamps — count ties at the
    k=3 cutoff must resolve by event_type text on both engines."""
    rows = [(0, o % 10, ["view", "click", "purchase"][o % 3]) for o in days]
    base = tmp_path_factory.mktemp("wtopkprop")
    d = _write_events_fixture(base, rows)
    daily = collections.Counter()
    for _, _, et in rows:
        daily[("2024-01-01", et)] += 1
    ranked = sorted(daily.items(), key=lambda kv: (-kv[1], kv[0][1]))[:3]
    expected = {
        (day, et): (n, rk + 1)
        for rk, ((day, et), n) in enumerate(ranked)
    }
    got = {
        (r["day"], r["event_type"]): (r["n_events"], r["rank"])
        for r in QUERIES["events_windowed_topk"](spark, d).collect()
    }
    assert got == expected, (rows, got, expected)
