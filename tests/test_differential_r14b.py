"""Round-14 second differential sweep: first-principles Python models
for operators whose ORACLES mirror their own algorithm (the SQL
re-implements the same diagonal/boundary construction, so oracle
parity cannot catch a shared algorithmic mistake): duplicated_spans
(definitional maximal-common-run scan, no k-grams), cdc_chunks
(definitional rolling-boundary walk), plus salted_agg vs direct
aggregation and top_k_per_group tie determinism."""

from __future__ import annotations

import hashlib
import random
from collections import defaultdict

from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.operators.sampling import cdc_chunks
from machine_downtime_monitor_on_aws_spark.operators.skew import salted_agg
from machine_downtime_monitor_on_aws_spark.operators.spans import (
    duplicated_spans,
)
from machine_downtime_monitor_on_aws_spark.operators.topk import (
    top_k_per_group,
)


def _model_spans(docs: dict[int, list[str]], k: int) -> set[tuple]:
    """Definitional: for every unordered doc pair and every alignment
    diagonal, scan for maximal runs of equal tokens; keep runs >= k.
    Never builds a k-gram - independent of the join formulation."""
    out = set()
    ids = sorted(docs)
    for i, a in enumerate(ids):
        ta = docs[a]
        for b in ids[i + 1 :]:
            tb = docs[b]
            for d in range(-(len(tb) - 1), len(ta)):
                lo, hi = max(0, d), min(len(ta), len(tb) + d)
                start = None
                for pa in range(lo, hi + 1):
                    match = pa < hi and ta[pa] == tb[pa - d]
                    if match and start is None:
                        start = pa
                    elif not match and start is not None:
                        if pa - start >= k:
                            out.add((a, b, start, start - d, pa - start))
                        start = None
    return out


def test_duplicated_spans_matches_first_principles_model(spark):
    rng = random.Random(99)
    vocab = [f"v{i}" for i in range(12)]  # tiny vocab: dense chance runs
    docs: dict[int, list[str]] = {}
    for i in range(14):
        docs[i] = [rng.choice(vocab) for _ in range(rng.randint(0, 35))]
    # planted verbatim copy (longer than k) at different offsets
    copy = [rng.choice(vocab) for _ in range(11)]
    docs[100] = ["x1", "x2"] + copy + ["x3"]
    docs[101] = copy + ["y1", "y2", "y3"]
    # periodic text: self-similar at MANY diagonals within one pair
    docs[102] = ["p", "q"] * 8
    docs[103] = ["q", "p"] * 7
    # identical docs (every diagonal-0 position matches)
    docs[104] = ["same"] * 9
    docs[105] = ["same"] * 9
    k = 4
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()],
        "doc_id long, body string",
    )
    got = {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens)
        for r in duplicated_spans(df, "doc_id", "body", k).collect()
    }
    assert got == _model_spans(docs, k)


def _model_cdc(tokens: list[str], mod: int) -> list[tuple]:
    """Definitional boundary walk: boundary AFTER token i when the
    24-bit md5 of 'tok next' divides evenly; last token never opens a
    chunk. Returns (chunk_idx, start_token, n_tokens, chunk_md5) -
    chunk_idx AND start_token are 1-based (the operator's documented
    convention, mirrored by its oracle)."""
    chunks: list[list[str]] = [[]]
    starts = [0]
    for i, t in enumerate(tokens):
        chunks[-1].append(t)
        if i + 1 < len(tokens):
            h = int(
                hashlib.md5(f"{t} {tokens[i + 1]}".encode()).hexdigest()[:6],
                16,
            )
            if h % mod == 0:
                chunks.append([])
                starts.append(i + 1)
    return [
        (
            ci + 1,
            starts[ci] + 1,
            len(c),
            hashlib.md5(" ".join(c).encode()).hexdigest(),
        )
        for ci, c in enumerate(chunks)
        if c
    ]


def test_cdc_chunks_match_first_principles_model(spark):
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(40)]
    docs = {
        i: [rng.choice(vocab) for _ in range(rng.randint(1, 80))]
        for i in range(25)
    }
    docs[98] = ["solo"]  # single token: one chunk, no boundary probe
    docs[99] = []  # empty: no chunks
    mod = 8
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()],
        "doc_id long, text string",
    )
    got = defaultdict(list)
    for r in cdc_chunks(df, "doc_id", "text", boundary_mod=mod).collect():
        got[r.doc_id].append(
            (r.chunk_idx, r.start_token, r.n_tokens, r.chunk_md5)
        )
    want = {
        i: sorted(_model_cdc(t, mod)) for i, t in docs.items() if t
    }
    assert {i: sorted(v) for i, v in got.items()} == want


def test_salted_agg_matches_direct_aggregation(spark):
    """Two-stage salted aggregation == plain groupBy for every
    supported fn, on a skewed key distribution with NULL values
    (count skips them; an all-NULL group yields NULL min/max and
    count 0 on both paths)."""
    rng = random.Random(5)
    rows = []
    for i in range(4000):
        key = "hot" if rng.random() < 0.7 else f"k{rng.randint(0, 20)}"
        val = None if rng.random() < 0.1 else rng.randint(-100, 100)
        rows.append((key, val))
    rows += [("allnull", None)] * 5
    df = spark.createDataFrame(rows, "k string, v int")
    aggs = {
        "s": ("v", "sum"),
        "c": ("v", "count"),
        "lo": ("v", "min"),
        "hi": ("v", "max"),
    }
    got = {
        r.k: (r.s, r.c, r.lo, r.hi)
        for r in salted_agg(df, ["k"], aggs, num_salts=7).collect()
    }
    want = {
        r.k: (r.s, r.c, r.lo, r.hi)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("c"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert got == want
    assert got["allnull"] == (None, 0, None, None)


def test_top_k_per_group_ties_and_small_groups(spark):
    """With a full deterministic tiebreak the cut is exact: ties on
    the primary order resolve by id, groups smaller than k return
    whole, ranks are 1..min(k, group size)."""
    rows = [
        ("g1", 1, 10), ("g1", 2, 10), ("g1", 3, 10), ("g1", 4, 9),
        ("g2", 5, 1),
    ]
    df = spark.createDataFrame(rows, "g string, id long, score int")
    out = top_k_per_group(
        df, ["g"], [F.col("score").desc(), F.col("id").asc()], 2
    ).collect()
    got = {(r.g, r.rnk): r.id for r in out}
    assert got == {("g1", 1): 1, ("g1", 2): 2, ("g2", 1): 5}
