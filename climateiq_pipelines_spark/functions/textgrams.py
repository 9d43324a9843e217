"""Zero-shuffle word n-gram shingle generation (r16 optimization).

Three keys (llm_ngram_jaccard, llm_ngram_contamination,
llm_substring_span_dedup) generated shingles as posexplode +
lead(1..n-1) windows over (doc_id, pos) — a full exchange + per-doc
sort of the TOKEN-level relation, paid purely to look at adjacent
array elements (guide §2.4: remove shuffles outright). The shingle is
a local function of the word array, so it is computed here as a pure
MAP stage: one Generate per doc materializes the split array, a
transform-over-sequence builds the n-gram strings, a second Generate
explodes them. No exchange, no sort; the first shuffle a consumer
pays is its own (distinct / join), same as before minus one.

Equivalence with the window form (proved by a multiset diff == 0 at
sf0.1 and the unchanged oracles at all three SFs): shingle i =
concat_ws(' ', words[i..i+n-1]) for i in [0, len-n], exactly the rows
the lead form kept after its parts[-1]-not-null guard; concat_ws
treats empty-string tokens identically on both paths.

Two measured traps this construction avoids:

- The split() array is routed through a GENERATE boundary
  (``explode(array(split(...)))``) so it becomes a plan ATTRIBUTE.
  Referencing an *aliased* split() from inside the transform lambda
  risks CollapseProject inlining the split into every element
  reference — the O(words²) re-evaluation blowup the round-9 A/B
  measured at 9.6-20 s for the element_at formulation (recorded in
  llm_ngram_jaccard's docstring history).
- ``sequence(0, size - n)`` is guarded by ``size >= n``: Spark's
  sequence() defaults to step -1 when start > stop, which would emit
  bogus negative indices instead of an empty array (the
  llm_bloom_decontam gram builder carries the same guard).

Stage A/B at sf0.1 (noop sink, min-of-3, quiet): window 0.79 s vs
this form 0.44 s, 0.37 s with the widen_if_narrow pre-explode
repartition (the fixture's documents table is one parquet split, so
the map stage otherwise runs on one core — a 100 TB no-op, see
registry.widen_if_narrow).

Registers nothing (oracle builders import at decoration time — the
fixedpoint.py import-side-effect rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_shingles(
    df: DataFrame,
    n: int,
    *,
    cols: tuple[str, ...] = ("doc_id",),
    out: str = "s",
    with_pos: bool = False,
) -> DataFrame:
    """(cols..., [pos0,] out): word n-gram shingles of ``text`` as a
    zero-shuffle map stage. ``with_pos`` adds the 0-based word position
    of the shingle start (the posexplode ordinal of the old window
    form). Docs with fewer than n words emit no rows."""
    ws = df.select(
        *cols, F.explode(F.array(F.split("text", " "))).alias("ws")
    )
    arr = F.when(
        F.size("ws") >= n,
        F.expr(
            f"transform(sequence(0, size(ws) - {n}),"
            f" i -> concat_ws(' ', slice(ws, i + 1, {n})))"
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    if with_pos:
        return ws.select(*cols, F.posexplode(arr).alias("pos0", out))
    return ws.select(*cols, F.explode(arr).alias(out))


def word_shingle_sets(
    df: DataFrame,
    n: int,
    *,
    cols: tuple[str, ...] = ("doc_id",),
    out: str = "arr",
) -> DataFrame:
    """(cols..., out): the DISTINCT xxhash64'd word n-gram shingle SET
    of ``text`` as one array<long> row per document — the un-exploded
    twin of :func:`word_shingles` for set-similarity consumers (r17:
    llm_ngram_jaccard's PPJoin stage verifies candidates with
    array_intersect over these, so the set must exist as an array, not
    rows). Same zero-shuffle construction: the split array crosses a
    Generate boundary so CollapseProject cannot inline split() into the
    per-element lambda (the round-9 O(words²) trap), hashing happens
    inside the same single transform pass, and the ``size >= n`` guard
    covers sequence()'s step=-1 default. Docs with fewer than n words
    emit an empty array."""
    ws = df.select(
        *cols, F.explode(F.array(F.split("text", " "))).alias("ws")
    )
    arr = F.when(
        F.size("ws") >= n,
        F.expr(
            f"array_distinct(transform(sequence(0, size(ws) - {n}),"
            f" i -> xxhash64(concat_ws(' ', slice(ws, i + 1, {n})))))"
        ),
    ).otherwise(F.expr("array()").cast("array<bigint>"))
    return ws.select(*cols, arr.alias(out))
