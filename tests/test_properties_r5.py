"""Property-based checks for the round-5 operators (SURVEY §5.2 #3):
pure-Python references on ARBITRARY generated corpora — a third
independent implementation beside the Spark plan and the DuckDB oracle,
catching rules both SQL dialects could share a misconception about.

Each example writes a tiny fixture dir (documents/events parquet in the
registry schema) because the operators take (spark, sf_dir) — example
counts are low since each pays a parquet write + Spark job.
"""

from __future__ import annotations

import collections
import itertools

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from climateiq_pipelines_spark.plans import QUERIES

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_counter = itertools.count()

VOCAB = ["a", "b", "c", "d"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12),
    min_size=1,
    max_size=10,
)


def write_documents(base, token_lists):
    d = base / f"docs{next(_counter)}"
    d.mkdir()
    texts = [" ".join(toks) for toks in token_lists]
    s, i64 = pa.string(), pa.int64()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), i64),
                "text": pa.array(texts, s),
                "lang": pa.array(["en"] * len(texts), s),
                "source": pa.array(["srcX"] * len(texts), s),
                "n_chars": pa.array([len(t) for t in texts], i64),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.fixture(scope="module")
def base_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("props_r5")


@given(token_lists=docs_strategy)
@settings(**SETTINGS)
def test_repetition_filter_matches_python_reference(spark, base_dir, token_lists):
    """llm_repetition_filter vs collections.Counter: fractions, keep
    gate, and totality (every doc appears, including 1-token docs)."""
    sf = write_documents(base_dir, token_lists)
    got = {
        int(r["doc_id"]): r
        for r in QUERIES["llm_repetition_filter"](spark, sf).collect()
    }
    assert set(got) == set(range(len(token_lists)))
    for doc_id, toks in enumerate(token_lists):
        tc = collections.Counter(toks)
        n = len(toks)
        bigrams = [f"{toks[i]} {toks[i+1]}" for i in range(n - 1)]
        n2, d2 = len(bigrams), len(set(bigrams))
        dup_frac = 0.0 if n2 == 0 else round((n2 - d2) / n2, 6)
        keep = (n2 - d2) * 5 <= n2 and max(tc.values()) * 10 <= n * 3
        row = got[doc_id]
        assert row["n_tokens"] == n
        assert row["top_token_frac"] == round(max(tc.values()) / n, 6)
        assert row["dup_2gram_frac"] == dup_frac
        assert bool(row["keep"]) == keep


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user_id
        st.sampled_from(["view", "click", "purchase", "error"]),
        st.integers(min_value=0, max_value=100),  # minute offset
    ),
    min_size=1,
    max_size=30,
)


def write_events(base, evs):
    d = base / f"ev{next(_counter)}"
    d.mkdir()
    s, i64, f64 = pa.string(), pa.int64(), pa.float64()
    base_us = 1_700_000_000_000_000
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(evs)), i64),
                "ts": pa.array(
                    [base_us + m * 60_000_000 for _, _, m in evs], i64
                ).cast(pa.timestamp("us")),
                "user_id": pa.array([u for u, _, _ in evs], i64),
                "event_type": pa.array([t for _, t, _ in evs], s),
                "value": pa.array([1.0] * len(evs), f64),
                "props": pa.array(["{}"] * len(evs), s),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


def funnel_reference(evs):
    """First view; first click strictly after it; first purchase
    strictly after that — per user, then stage counts."""
    by_user = collections.defaultdict(list)
    for u, t, m in evs:
        by_user[u].append((m, t))
    n_view = n_click = n_purchase = 0
    for _, rows in by_user.items():
        t_view = min((m for m, t in rows if t == "view"), default=None)
        if t_view is None:
            continue
        n_view += 1
        t_click = min(
            (m for m, t in rows if t == "click" and m > t_view), default=None
        )
        if t_click is None:
            continue
        n_click += 1
        if any(t == "purchase" and m > t_click for m, t in rows):
            n_purchase += 1
    return n_view, n_click, n_purchase


@given(evs=events_strategy)
@settings(**SETTINGS)
def test_funnel_matches_python_reference(spark, base_dir, evs):
    sf = write_events(base_dir, evs)
    got = {
        r["stage"]: r["n_users"]
        for r in QUERIES["events_funnel_steps"](spark, sf).collect()
    }
    n_view, n_click, n_purchase = funnel_reference(evs)
    assert got["1_view"] == n_view
    assert got["2_click_after_view"] == n_click
    assert got["3_purchase_after_click"] == n_purchase
    # funnel monotonicity holds by construction — assert anyway so a
    # refactor breaking the strictly-after chaining trips here
    assert n_view >= n_click >= n_purchase


@given(evs=events_strategy)
@settings(**SETTINGS)
def test_retention_totals_match_python_reference(spark, base_dir, evs):
    """Cohort retention: every (user, active-day) lands in exactly one
    (cohort, week) cell; week 0 exists for every cohort; totals match a
    Python reference."""
    sf = write_events(base_dir, evs)
    pdf = QUERIES["events_cohort_retention"](spark, sf).toPandas()
    days = collections.defaultdict(set)
    base_us = 1_700_000_000_000_000
    for u, _, m in evs:
        # calendar epoch-day, matching CAST(ts AS DATE) on the ntz value
        days[u].add((base_us + m * 60_000_000) // 86_400_000_000)
    ref = collections.Counter()
    for u, ds in days.items():
        d0 = min(ds)
        for d in ds:
            ref[(d0, (d - d0) // 7)] += 1
    got = {
        (row.cohort_day, int(row.week_k)): int(row.n_users)
        for row in pdf.itertuples()
    }
    # compare by (week_k) totals keyed on cohort ORDER (cohort_day is a
    # date string; map via sorted order of distinct cohorts)
    cohort_map = dict(
        zip(sorted({c for c, _ in got}), sorted({d0 for d0, _ in ref}))
    )
    remapped = {(cohort_map[c], k): v for (c, k), v in got.items()}
    assert remapped == dict(ref)
    for d0 in {d0 for d0, _ in ref}:
        assert (d0, 0) in remapped  # cohort week 0 always present
