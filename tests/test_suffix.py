"""operators/suffix.py - suffix-ordering ExactSubstr dedup vs an
independent Python model of Lee et al. 2022's semantics.

The model computes ground truth the expensive definitional way
(enumerate every anchor-gram occurrence corpus-wide), never via
suffix ordering, so agreement checks the ALGORITHM (bucketed sort +
adjacent LCP), not the implementation against itself.
"""

from __future__ import annotations

import random
from collections import defaultdict

from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.operators.suffix import (
    exactsubstr_coverage,
    exactsubstr_removed,
    suffix_rows,
    token_lcp,
)


def _model(docs: list[tuple[int, str]], a: int, e: int):
    """Definitional ground truth: dup_starts / covered_tokens /
    max_repeat_tokens per doc, via corpus-wide gram enumeration."""
    toks = {i: t.split() for i, t in docs}
    grams = defaultdict(list)  # gram -> [(doc, pos)]
    for i, t in toks.items():
        for p in range(len(t) - a + 1):
            grams[tuple(t[p : p + a])].append((i, p))

    def ext(i, p):
        return toks[i][p + a : p + a + e]

    out = {}
    dup = defaultdict(list)  # doc -> [pos]
    best = defaultdict(int)  # doc -> max repeat
    for g, occ in grams.items():
        if len(occ) < 2:
            continue
        for i, p in occ:
            dup[i].append(p)
            # max extension against EVERY other occurrence (the
            # definitional max; the operator reaches it via
            # sorted-adjacency, a property this test verifies)
            for j, q in occ:
                if (j, q) == (i, p):
                    continue
                x, y = ext(i, p), ext(j, q)
                lcp = 0
                while lcp < min(len(x), len(y)) and x[lcp] == y[lcp]:
                    lcp += 1
                best[i] = max(best[i], a + lcp)
    for i, ps in dup.items():
        ps.sort()
        covered = 0
        lo = hi = None
        for p in ps:
            if lo is None or p > hi:
                if lo is not None:
                    covered += hi - lo
                lo, hi = p, p + a
            else:
                hi = p + a
        covered += hi - lo
        out[i] = (len(ps), covered, best[i])
    return out


def _run(spark, docs, a, e):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = exactsubstr_coverage(df, "doc_id", "text", a, e).collect()
    return {
        r.doc_id: (r.dup_starts, r.covered_tokens, r.max_repeat_tokens)
        for r in rows
    }


def test_exactsubstr_matches_model_randomized(spark):
    """Randomized corpus with planted verbatim copies, overlapping
    self-repeats, and near-anchor-length repeats (the fixed-k
    pass's documented blind spot at k > anchor)."""
    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(24):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))))
    # verbatim cross-doc copy longer than anchor+ext cap
    long_copy = " ".join(rng.choice(vocab) for _ in range(20))
    docs.append((100, long_copy + " tailA tailB"))
    docs.append((101, "headX headY " + long_copy))
    # exactly-anchor-length repeat (LCP extension 0)
    exact_a = " ".join(f"u{i}" for i in range(4))
    docs.append((102, exact_a + " zz1 zz2"))
    docs.append((103, "yy1 " + exact_a))
    # overlapping self-repeat within one doc ("a a a a ...")
    docs.append((104, " ".join(["rep"] * 9)))
    # tokens containing ASCII control chars < 0x20 (survive whitespace
    # tokenization): under the retired space-join ordering the string
    # sort interleaves d < d\x01 < "d\x01 y" < "d x", splitting the
    # LCP-1 pair (105, 106) and under-reporting max_repeat_tokens 4
    # instead of 5; the array ordering keeps exact token-sequence
    # order (r14 ADVICE)
    docs.append((105, "k1 k2 k3 k4 d"))
    docs.append((106, "k1 k2 k3 k4 d x"))
    docs.append((107, "k1 k2 k3 k4 d\x01"))
    docs.append((108, "k1 k2 k3 k4 d\x01 y"))
    a, e = 4, 6
    assert _run(spark, docs, a, e) == _model(docs, a, e)


def test_exactsubstr_caps_and_short_docs(spark):
    """Repeat length saturates at anchor+ext while coverage stays
    exact; docs shorter than the anchor emit nothing; a corpus with
    no duplicated anchor returns empty."""
    copy = " ".join(f"c{i}" for i in range(12))
    docs = [(1, copy), (2, copy), (3, "too short"), (4, "all distinct words here now")]
    a, e = 4, 3
    got = _run(spark, docs, a, e)
    assert got == _model(docs, a, e)
    # both full-copy docs: every anchor start is dup, coverage = all
    # 12 tokens, and the report caps at a+e=7 despite the 12-repeat
    assert got[1] == (9, 12, 7)
    assert got[2] == (9, 12, 7)
    assert 3 not in got and 4 not in got

    none_dup = [(1, "p q r s t"), (2, "v w x y z")]
    assert _run(spark, none_dup, 4, 3) == {}


def test_token_lcp_edges(spark):
    df = spark.createDataFrame(
        [
            (["a", "b", "c"], ["a", "b", "d"], 2),
            (["a"], ["a", "b"], 1),  # prefix: min length
            ([], ["a"], 0),
            ([], [], 0),
            (["x"], ["y"], 0),
        ],
        "a array<string>, b array<string>, want long",
    )
    bad = df.filter(token_lcp(F.col("a"), F.col("b")) != F.col("want"))
    assert bad.count() == 0


def test_suffix_rows_shape(spark):
    df = spark.createDataFrame([(7, "a b c d")], "doc_id long, text string")
    rows = sorted(
        (r.pos, r.bucket is not None, list(r.ext))
        for r in suffix_rows(df, "doc_id", "text", 2, 3).collect()
    )
    assert rows == [
        (0, True, ["c", "d"]),
        (1, True, ["d"]),
        (2, True, []),
    ]


def _removal_model(docs: list[tuple[int, str]], a: int):
    """Definitional removal ground truth: a position is cut iff it
    lies in [p, p+a) of ANY anchor start p whose gram occurs >= 2
    times corpus-wide - every occurrence cut, matching the
    per-position duplicated test (and the released Lee et al. 2022
    implementation)."""
    toks = {i: t.split() for i, t in docs}
    grams = defaultdict(list)
    for i, t in toks.items():
        for p in range(len(t) - a + 1):
            grams[tuple(t[p : p + a])].append((i, p))
    cut = defaultdict(set)
    for occ in grams.values():
        if len(occ) < 2:
            continue
        for i, p in occ:
            cut[i].update(range(p, p + a))
    out = {}
    for i, t in toks.items():
        rm = cut.get(i, set())
        kept = [w for j, w in enumerate(t) if j not in rm]
        out[i] = (len(t), len(t) - len(kept), " ".join(kept))
    return out


def test_exactsubstr_removed_matches_model_randomized(spark):
    """Terminal removal stage vs the definitional model: planted
    cross-doc copies (every copy cut), overlapping self-repeats, a
    fully-duplicated doc (dedup_text becomes ''), untouched and
    too-short docs passing through with n_removed = 0."""
    rng = random.Random(4321)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(24):
        docs.append(
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
        )
    long_copy = " ".join(rng.choice(vocab) for _ in range(20))
    docs.append((100, long_copy + " tailA tailB"))
    docs.append((101, "headX headY " + long_copy))
    docs.append((102, long_copy))  # fully duplicated -> empty text
    docs.append((103, " ".join(["rep"] * 9)))  # self-overlap
    docs.append((104, "short doc"))
    a = 4
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.dedup_text)
        for r in exactsubstr_removed(df, "doc_id", "text", a).collect()
    }
    want = _removal_model(docs, a)
    assert got == want
    assert got[102][2] == ""  # all copies cut, including the "first"
    assert got[104] == (2, 0, "short doc")


def test_exactsubstr_removed_coverage_invariant(spark):
    """n_removed equals exactsubstr_coverage's covered_tokens for
    every doc (0 where coverage reports nothing): the two operators
    derive the SAME duplicated-interval union, one reporting it, one
    cutting it."""
    rng = random.Random(77)
    vocab = [f"v{i}" for i in range(12)]  # small vocab: many repeats
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(30)
    ]
    a = 4
    df = spark.createDataFrame(docs, "doc_id long, text string")
    removed = {
        r.doc_id: r.n_removed
        for r in exactsubstr_removed(df, "doc_id", "text", a).collect()
    }
    cov = {
        r.doc_id: r.covered_tokens
        for r in exactsubstr_coverage(df, "doc_id", "text", a, 4).collect()
    }
    assert set(removed) == {i for i, _ in docs}
    for i in removed:
        assert removed[i] == cov.get(i, 0), i
    assert any(v > 0 for v in removed.values())  # non-trivial corpus


def test_exactsubstr_removed_plan_shape(spark):
    """No single-partition stage anywhere (bucketed count, per-doc
    windows, doc_id join), and the dominant shuffle keys on the
    anchor digest - the coverage pass's discipline carried through
    the removal."""
    import contextlib
    import io

    df = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(4)],
        "doc_id long, text string",
    )
    out = exactsubstr_removed(df, "doc_id", "text", 4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(bucket" in plan, plan


def test_exactsubstr_plan_no_global_sort(spark):
    """The suffix sort is bucketed: the plan partitions windows by
    the anchor digest - no single-partition global Sort/Window (the
    repo-wide designed-out pattern)."""
    import contextlib
    import io

    df = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(4)],
        "doc_id long, text string",
    )
    out = exactsubstr_coverage(df, "doc_id", "text", 4, 4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "SinglePartition" not in plan, plan
