"""operators/nbayes.py - multinomial NB with the log-free
mantissa/exponent product fold, pinned bit-equal to a pure-Python
reference model."""

import pytest
from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.operators.nbayes import (
    RESCALE_AT,
    RESCALE_BY,
    nb_classify,
    nb_train,
    product_fold,
)


def _py_nb(rows):
    """(label_stats, token_counts, V, N) plus per-doc predictions,
    replaying exactly the operator's arithmetic: add-one rational
    likelihoods, left fold with 1e-150/1e150 rescales, argmax by
    (rescales asc, mantissa desc, label asc)."""
    from collections import Counter

    toks = {i: t.split() if t.strip() else [] for i, (t, _l) in enumerate(rows)}
    labels = sorted({l for _t, l in rows})
    n_docs = Counter(l for _t, l in rows)
    tc = Counter()
    lt = Counter()
    vocab = set()
    for i, (_t, l) in enumerate(rows):
        for w in toks[i]:
            tc[(l, w)] += 1
            lt[l] += 1
            vocab.add(w)
    V, N = len(vocab), len(rows)
    preds = {}
    for i, (_t, _l) in enumerate(rows):
        scored = []
        for l in labels:
            m, e = float(n_docs[l]) / float(N), 0
            for w in toks[i]:
                p = float(tc.get((l, w), 0) + 1) / float(lt.get(l, 0) + V)
                nxt = m * p
                if nxt < RESCALE_AT:
                    m, e = nxt * RESCALE_BY, e + 1
                else:
                    m = nxt
            scored.append((e, -m, l, m))
        e, _negm, l, m = min(scored)
        preds[i] = (l, m, e)
    return preds


def test_nb_matches_python_model_bit_exact(spark):
    rows = [
        ("red red blue", "colors"),
        ("red green", "colors"),
        ("dog cat dog", "animals"),
        ("cat cat bird dog", "animals"),
        ("red dog", "mixed"),
        ("", "mixed"),  # empty doc: score is the prior alone
    ]
    df = spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(rows)],
        "doc_id long, text string, label string",
    )
    ls, tc, v, n = nb_train(df, "label", "text")
    assert v == 6 and n == 6
    got = {
        r.doc_id: (r.pred_label, r.score_m, r.score_e)
        for r in nb_classify(df, "doc_id", "text", ls, tc, v, n).collect()
    }
    assert got == _py_nb(rows)


def test_nb_long_doc_rescales(spark):
    """A long document drives the raw product far below 1e-150: the
    fold must rescale (score_e > 0) and still match the Python
    reference bit-for-bit - the underflow regime is the whole point
    of the mantissa/exponent scheme."""
    long_text = " ".join(["alpha beta gamma delta"] * 80)  # 320 tokens
    # per-token likelihood ~0.25 => raw product ~4^-320 ~ 1e-193,
    # far below the 1e-150 rescale floor
    rows = [(long_text, "a"), ("alpha beta", "b")]
    df = spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(rows)],
        "doc_id long, text string, label string",
    )
    ls, tc, v, n = nb_train(df, "label", "text")
    got = {
        r.doc_id: (r.pred_label, r.score_m, r.score_e)
        for r in nb_classify(df, "doc_id", "text", ls, tc, v, n).collect()
    }
    ref = _py_nb(rows)
    assert got == ref
    assert got[0][2] > 0  # the long doc actually rescaled


def test_product_fold_rescale_boundary(spark):
    """The rescale comparison is strict (<): a product landing
    exactly on 1e-150 keeps the mantissa; one ulp below rescales."""
    df = spark.createDataFrame([(1,)], "i long")
    out = df.select(
        product_fold(F.lit([1e-150]), F.lit(1.0)).alias("a"),
        product_fold(F.lit([0.5, 1e-150]), F.lit(1.0)).alias("b"),
    ).collect()[0]
    assert (out.a.m, out.a.e) == (1e-150, 0)
    assert (out.b.m, out.b.e) == (0.5 * 1e-150 * 1e150, 1)


def test_signed_product_fold_overflow_and_underflow(spark):
    from pyspark.sql import functions as F

    from machine_downtime_monitor_on_aws_spark.operators.nbayes import (
        signed_product_fold,
    )

    df = spark.createDataFrame([(1,)], "i long")
    out = df.select(
        signed_product_fold(F.lit([1e100, 1e100]), F.lit(1.0)).alias("up"),
        signed_product_fold(F.lit([1e-100, 1e-100]), F.lit(1.0)).alias("dn"),
        signed_product_fold(F.array().cast("array<double>"), F.lit(1.0)).alias(
            "empty"
        ),
    ).collect()[0]
    assert (out.up.m, out.up.e) == (1e200 * 1e-150, 1)
    assert (out.dn.m, out.dn.e) == (1e-200 * 1e150, -1)
    assert (out.empty.m, out.empty.e) == (1.0, 0)


def test_dsir_weights_match_python_model(spark):
    """dsir_importance_weights pinned bit-equal to a pure-Python
    replay, including the overflow regime: a strongly target-like
    long document must rescale UP (weight_e > 0) and a raw-like one
    DOWN, and target docs outrank raw docs by (e, m)."""
    from pyspark.sql import functions as F

    from machine_downtime_monitor_on_aws_spark.operators.nbayes import (
        RESCALE_AT,
        RESCALE_BY,
    )
    from machine_downtime_monitor_on_aws_spark.operators.sampling import (
        dsir_importance_weights,
    )

    rows = [
        (0, " ".join(["alpha"] * 200), "target"),
        (1, " ".join(["beta"] * 200), "raw"),
        (2, "alpha beta", "raw"),
        (3, "", "raw"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r.doc_id: (r.is_target, r.weight_m, r.weight_e)
        for r in dsir_importance_weights(
            df, F.col("source") == F.lit("target")
        ).collect()
    }

    # python replay
    toks = {i: (t.split() if t.strip() else []) for i, (_, t, _s) in
            enumerate([(r[0], r[1], r[2]) for r in rows])}
    tgt = [w for i, (_d, _t, s) in enumerate(rows) if s == "target"
           for w in toks[i]]
    raw = [w for i, (_d, _t, s) in enumerate(rows) if s != "target"
           for w in toks[i]]
    vocab = set(tgt) | set(raw)
    V, TT, TS = len(vocab), len(tgt), len(raw)
    from collections import Counter

    ct, cs = Counter(tgt), Counter(raw)
    ref = {}
    for i, (_d, _t, s) in enumerate(rows):
        m, e = 1.0, 0
        for w in toks[i]:
            r = (float(ct.get(w, 0) + 1) / float(TT + V)) / (
                float(cs.get(w, 0) + 1) / float(TS + V)
            )
            nxt = m * r
            if nxt < RESCALE_AT:
                m, e = nxt * RESCALE_BY, e - 1
            elif nxt > RESCALE_BY:
                m, e = nxt * RESCALE_AT, e + 1
            else:
                m = nxt
        ref[i] = (s == "target", m, e)
    assert got == ref
    assert got[0][2] > 0   # target-like long doc rescaled up
    assert got[1][2] < 0   # raw-like long doc rescaled down
    assert got[3] == (False, 1.0, 0)  # empty doc: neutral weight
