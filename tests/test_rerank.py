"""operators/rerank.py - cross-encoder re-rank seam."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.operators.rerank import (
    crossencoder_rerank,
    lexical_interaction_scores,
)


def _model_score(q: str, d: str) -> int:
    """Independent model of the default scorer."""
    dt = d.split()
    s = 0
    for t in set(q.split()):
        if t in dt:
            s += int(np.floor(1e9 / (1.0 + dt.index(t))))
    return s


def test_default_scorer_matches_model():
    qs = pd.Series(["a b c", "x y", "", "a a a", "q"])
    ds = pd.Series(["c z a", "no hits here", "whatever", "b a", "q q q"])
    got = lexical_interaction_scores(qs, ds)
    want = [_model_score(q, d) for q, d in zip(qs, ds)]
    assert list(got) == want
    # position sensitivity: earlier mention scores strictly higher
    early, late = lexical_interaction_scores(
        pd.Series(["t", "t"]), pd.Series(["t x x", "x x t"])
    )
    assert early > late


def test_rerank_per_query_topm_and_ties(spark):
    rows = [
        # qid 1: doc 10 scores higher (term earlier); 11/12 tie -> id asc
        (1, 10, "alpha", "alpha x y"),
        (1, 11, "alpha", "x alpha y"),
        (1, 12, "alpha", "x alpha z"),
        (1, 13, "alpha", "none here"),
        # qid 2: independent ranking
        (2, 10, "zeta", "zeta first"),
        (2, 20, "zeta", "x zeta"),
    ]
    df = spark.createDataFrame(
        rows, "qid long, doc_id long, query string, text string"
    )
    out = crossencoder_rerank(df, "qid", "doc_id", "query", "text", 2)
    got = {
        (r.qid, r.rnk): (r.doc_id, r.ce_score) for r in out.collect()
    }
    assert got[(1, 1)][0] == 10 and got[(1, 2)][0] == 11  # tie -> id asc
    assert got[(2, 1)][0] == 10 and got[(2, 2)][0] == 20
    assert len(got) == 4  # top-2 per query, text columns dropped
    assert set(out.columns) == {"qid", "doc_id", "ce_score", "rnk"}


def test_rerank_custom_scorer_seam(spark):
    """The model-swap contract: any (queries, docs) -> int64 callable
    drops in; here a length-difference scorer replaces the lexical
    one and the ordering follows it."""

    def by_len(qs: pd.Series, ds: pd.Series) -> np.ndarray:
        return np.array(
            [-abs(len(q) - len(d)) for q, d in zip(qs, ds)], dtype=np.int64
        )

    rows = [(0, 1, "12345", "12345"), (0, 2, "12345", "123456789")]
    df = spark.createDataFrame(
        rows, "qid long, doc_id long, query string, text string"
    )
    out = crossencoder_rerank(
        df, "qid", "doc_id", "query", "text", 2, scorer=by_len
    ).collect()
    best = min(out, key=lambda r: r.rnk)
    assert best.doc_id == 1  # exact length match wins


def test_rerank_actually_permutes_bm25_order(spark):
    """Guard against a degenerate scorer: on the sf0.01 corpus the
    cross-encoder order must differ from the BM25 order somewhere in
    the top-10 (position-weighting vs tf-weighting disagree)."""
    from machine_downtime_monitor_on_aws_spark.plans import catalog

    from conftest import SF_ORACLE

    out = catalog.REGISTRY["crossencoder_rerank_top10"].fn(
        spark, SF_ORACLE
    ).collect()
    assert len(out) == 10
    assert any(r.bm25_rnk != r.rnk for r in out)
    # every reranked doc came from the stage-1 top-20 sliver
    assert all(1 <= r.bm25_rnk <= 20 for r in out)


def test_rerank_arrow_batch_contract(spark):
    """The scorer receives pandas Series batches (never scalars; the
    assert runs worker-side and would fail the job) and its int64
    output lands un-rounded in ce_score."""

    def probe(qs: pd.Series, ds: pd.Series) -> np.ndarray:
        assert isinstance(qs, pd.Series) and isinstance(ds, pd.Series)
        return np.full(len(qs), 7, dtype=np.int64)

    df = spark.createDataFrame(
        [(0, i, "q", "d") for i in range(5)],
        "qid long, doc_id long, query string, text string",
    )
    out = crossencoder_rerank(
        df, "qid", "doc_id", "query", "text", 5, scorer=probe
    )
    rows = out.collect()
    assert len(rows) == 5
    assert all(abs(r.ce_score - 7 / 1e9) < 1e-18 for r in rows)
