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


# ---- persisted shingle index / incremental exact probe

def _inc_corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_exact_matches_full_rerun(spark):
    """The probe must equal allpairs_jaccard_join over
    (history ∪ batch) restricted to batch-touching pairs - keys AND
    exact jaccard doubles - and the history side must consume the
    bucketed layout with no exchange of its own."""
    from machine_downtime_monitor_on_aws_spark.operators.allpairs import (
        allpairs_jaccard_join,
        incremental_exact_jaccard,
        shingle_postings,
        write_shingle_index,
    )

    hist_rows = [
        (i, f"historical doc {i} with common tail words here") for i in range(20)
    ] + [(50 + i, "a duplicated body shared across history x") for i in range(3)]
    new_rows = (
        [(100, "a duplicated body shared across history x")]
        + [(101, "a brand new duplicated body q"), (102, "a brand new duplicated body q")]
        + [(110 + i, f"fresh unique content number {i} now") for i in range(4)]
    )
    hist, new = _inc_corpus(spark, hist_rows), _inc_corpus(spark, new_rows)
    try:
        write_shingle_index(
            shingle_postings(hist, "doc_id", "text", 3, parallelism=4),
            "shx_test", num_buckets=8, shingle_n=3,
        )
        inc = incremental_exact_jaccard(
            spark, new, "doc_id", "text", "shx_test", 0.5, 3
        )
        got = {(r.doc_a, r.doc_b): r.jaccard for r in inc.collect()}
        new_ids = {r[0] for r in new_rows}
        full = allpairs_jaccard_join(
            hist.unionByName(new), "doc_id", "text", 0.5, 3
        )
        want = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in full.collect()
            if r.doc_a in new_ids or r.doc_b in new_ids
        }
        assert got == want and want

        import contextlib, io

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                incremental_exact_jaccard(
                    spark, new, "doc_id", "text", "shx_test", 0.5, 3
                ).explain("formatted")
            plan = buf.getvalue()
            assert "Bucketed: true" in plan
            assert "disabled by query planner" not in plan
            # every shingle exchange is BATCH-sized (the probe leg +
            # the two self-join legs over the checkpointed batch
            # postings - localCheckpoint erases partitioning info, so
            # they don't dedupe into a ReusedExchange); history rides
            # the bucketed scan with no exchange, and the
            # replay-shield dropDuplicates never shuffles its own
            # (shingle, doc_id) partitioning
            ex = [
                ln for ln in plan.splitlines()
                if "Arguments: hashpartitioning(shingle" in ln
            ]
            assert 1 <= len(ex) <= 3, ex
            assert not any("doc_id" in ln for ln in ex)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS shx_test")


def test_incremental_exact_replay_and_overlap_safety(spark):
    """A replayed append (verbatim duplicate posting rows) must not
    corrupt intersection counts, and a doc present in BOTH index and
    batch must neither self-pair nor double-pair."""
    from machine_downtime_monitor_on_aws_spark.operators.allpairs import (
        append_to_shingle_index,
        incremental_exact_jaccard,
        shingle_postings,
        write_shingle_index,
    )

    hist = _inc_corpus(spark, [(1, "p q r s t u"), (2, "z y x w v u")])
    new = _inc_corpus(spark, [(2, "z y x w v u"), (3, "p q r s t u")])
    try:
        po = shingle_postings(hist, "doc_id", "text", 2, parallelism=2)
        write_shingle_index(po, "shx_replay", num_buckets=4, shingle_n=2)
        base = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in incremental_exact_jaccard(
                spark, new, "doc_id", "text", "shx_replay", 0.5, 2
            ).collect()
        }
        # doc 2 overlaps index∩batch: must not self-pair; (1,3) is
        # history-x-batch exact dup; (2,3) batch-internal disjoint
        assert (2, 2) not in base
        assert base[(1, 3)] == 1.0
        # replay the SAME postings (append-then-crash rerun)
        append_to_shingle_index(po, "shx_replay", num_buckets=4, shingle_n=2)
        again = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in incremental_exact_jaccard(
                spark, new, "doc_id", "text", "shx_replay", 0.5, 2
            ).collect()
        }
        assert again == base  # counts shielded by the (shingle, doc) dedupe
        # param drift fails loudly
        import pytest as _pt

        with _pt.raises(Exception, match="shingle_n"):
            incremental_exact_jaccard(
                spark, new, "doc_id", "text", "shx_replay", 0.5, 4
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS shx_replay")


def test_incremental_exact_skew_valve_only_lowers(spark):
    """max_shingle_df excludes boilerplate shingles from counting:
    measured jaccard can only drop, so the pair set under a cap is a
    subset of the exact one."""
    from machine_downtime_monitor_on_aws_spark.operators.allpairs import (
        incremental_exact_jaccard,
        shingle_postings,
        write_shingle_index,
    )

    # 'c c' boilerplate shingle in every history doc
    hist = _inc_corpus(
        spark, [(i, f"a{i} c c c b{i}") for i in range(6)]
    )
    new = _inc_corpus(spark, [(100, "a1 c c c b1")])
    try:
        write_shingle_index(
            shingle_postings(hist, "doc_id", "text", 2, parallelism=2),
            "shx_skew", num_buckets=4, shingle_n=2,
        )
        exact = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in incremental_exact_jaccard(
                spark, new, "doc_id", "text", "shx_skew", 0.3, 2
            ).collect()
        }
        capped = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in incremental_exact_jaccard(
                spark, new, "doc_id", "text", "shx_skew", 0.3, 2,
                max_shingle_df=2,
            ).collect()
        }
        assert set(capped) <= set(exact) and exact
        assert all(capped[k] <= exact[k] for k in capped)
        assert (1, 100) in exact  # the true near-dup survives exact mode
    finally:
        spark.sql("DROP TABLE IF EXISTS shx_skew")


def test_shingle_index_purge_compact_recover(spark):
    """Lifecycle maintenance: purge removes exactly the targeted
    docs' postings (idempotent, layout-preserving - probes keep their
    exactness after it), compaction folds crash re-appends, and an
    interrupted swap heals."""
    from machine_downtime_monitor_on_aws_spark.operators.allpairs import (
        append_to_shingle_index,
        compact_shingle_index,
        incremental_exact_jaccard,
        purge_from_shingle_index,
        recover_shingle_index,
        shingle_postings,
        write_shingle_index,
    )

    hist = _inc_corpus(
        spark,
        [(1, "p q r s t u"), (2, "z y x w v u"), (3, "p q r s t u")],
    )
    new = _inc_corpus(spark, [(100, "p q r s t u")])
    t = "shx_maint"
    try:
        po = shingle_postings(hist, "doc_id", "text", 2, parallelism=2)
        write_shingle_index(po, t, num_buckets=4, shingle_n=2)
        probe = lambda: {  # noqa: E731
            (r.doc_a, r.doc_b): r.jaccard
            for r in incremental_exact_jaccard(
                spark, new, "doc_id", "text", t, 0.5, 2
            ).collect()
        }
        assert set(probe()) == {(1, 100), (3, 100)}

        # purge doc 1: exactly its pairs disappear, survivors intact
        ids = spark.createDataFrame([(1,)], "doc_id long")
        assert purge_from_shingle_index(spark, t, ids) == 1
        assert set(probe()) == {(3, 100)}
        assert purge_from_shingle_index(spark, t, ids) == 0  # idempotent
        # layout survived the rewrite: stamped param still enforced
        with pytest.raises(Exception, match="shingle_n"):
            incremental_exact_jaccard(spark, new, "doc_id", "text", t, 0.5, 4)

        # crash re-append then compaction: probe results never change
        po3 = shingle_postings(
            hist.filter("doc_id = 3"), "doc_id", "text", 2, parallelism=2
        )
        append_to_shingle_index(po3, t, num_buckets=4, shingle_n=2)  # replay
        before = probe()
        compact_shingle_index(spark, t)
        assert probe() == before
        n_rows = spark.table(t).count()
        assert (
            spark.table(t).dropDuplicates(["shingle", "doc_id"]).count() == n_rows
        )  # compaction folded the verbatim re-append

        # interrupted swap: live name missing, side copy present
        spark.sql(f"ALTER TABLE {t} RENAME TO {t}__old")
        assert recover_shingle_index(spark, t) is True
        assert probe() == before
        assert recover_shingle_index(spark, t) is False  # no-op when live
    finally:
        for side in (t, f"{t}__old", f"{t}__compacting"):
            spark.sql(f"DROP TABLE IF EXISTS {side}")
