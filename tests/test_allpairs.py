"""operators/allpairs.py - prefix-filtered exact Jaccard join:
losslessness vs a brute-force Python model on adversarial corpora,
candidate pruning actually prunes, and the size-filter boundary."""

from __future__ import annotations

import itertools
import random

import pytest

from machine_downtime_monitor_on_aws_spark.operators.allpairs import (
    allpairs_candidates,
    allpairs_jaccard_join,
)


def _shingle_set(text: str, n: int = 2) -> set:
    toks = text.split()
    if len(toks) < n:
        return {text.strip()}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _brute(rows, t, n=2):
    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        sa, sb = _shingle_set(ta, n), _shingle_set(tb, n)
        inter = len(sa & sb)
        jac = float(inter) / float(len(sa) + len(sb) - inter)
        if jac >= t:
            out[(min(ia, ib), max(ia, ib))] = jac
    return out


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_lossless_vs_bruteforce_random_corpus(spark, threshold):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(40):
        base = [rng.choice(vocab) for _ in range(rng.randint(2, 10))]
        rows.append((i, " ".join(base)))
        if rng.random() < 0.4:  # planted near-dups: one-token edits
            mut = list(base)
            mut[rng.randrange(len(mut))] = rng.choice(vocab)
            rows.append((100 + i, " ".join(mut)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in allpairs_jaccard_join(df, "doc_id", "text", threshold, 2).collect()
    }
    assert got == _brute(rows, threshold, 2)  # keys AND exact doubles


def test_candidates_prune_vs_all_pairs(spark):
    # 30 docs over disjoint vocab halves: cross-half pairs share no
    # shingle and must never become candidates.
    rows = [(i, f"a{i % 3} a{(i + 1) % 3} a{i % 3}") for i in range(15)] + [
        (100 + i, f"b{i % 3} b{(i + 1) % 3} b{i % 3}") for i in range(15)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cands = allpairs_candidates(df, "doc_id", "text", 0.5, 2).collect()
    n = len(rows)
    assert 0 < len(cands) < n * (n - 1) / 2
    assert all(
        (r.doc_a < 100) == (r.doc_b < 100) for r in cands
    ), "cross-vocabulary candidate should be impossible"


def test_size_filter_keeps_boundary_pair(spark):
    # |a|=2, |b|=4 shingle sets with overlap 2 -> J = 2/4 = 0.5
    # exactly at threshold; min >= t*max holds with equality - the
    # float-safe filter must keep it.
    rows = [(0, "x y z"), (1, "x y z p q")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = allpairs_jaccard_join(df, "doc_id", "text", 0.5, 2).collect()
    assert len(got) == 1 and got[0].jaccard == 0.5


def test_threshold_validation(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        allpairs_candidates(df, "doc_id", "text", 0.0)
