"""Dedup operator tests: LSH bucket-cap behavior under degenerate
(boilerplate-duplicate) corpora — the 100 TB pathology from r1's
verdict: an uncapped bucket holds O(B^2) pairs in one row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.operators.dedup import (
    candidate_pairs,
    minhash_lsh_buckets,
)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, body string")


def test_degenerate_bucket_capped_star(spark):
    """1000 identical docs land in one bucket per band. With the cap,
    the job must not build a half-million-struct row: each oversized
    bucket emits O(B) star pairs keeping all docs in one component."""
    n = 1000
    docs = _corpus(
        spark,
        [(i, "the same boilerplate text repeated for every document") for i in range(n)],
    )
    buckets = minhash_lsh_buckets(docs, "doc_id", "body", parallelism=8)
    pairs = candidate_pairs(buckets, max_bucket_size=64)
    rows = pairs.collect()
    # star shape: every doc pairs with the min-id representative once
    assert len(rows) == n - 1
    assert all(r.doc_a == 0 and r.doc_b != 0 for r in rows)
    # connected component covers the whole corpus
    members = {r.doc_b for r in rows} | {0}
    assert members == set(range(n))


def test_cap_no_effect_below_threshold(spark):
    """For corpora whose buckets stay under the cap, capped and
    uncapped results are identical (the oracle-checked path)."""
    docs = _corpus(
        spark,
        [(i, f"unique document number {i} with shared tail words here") for i in range(40)]
        + [(100 + i, "a duplicated body shared by a handful of docs") for i in range(5)],
    )
    buckets = minhash_lsh_buckets(docs, "doc_id", "body", parallelism=4)
    capped = {tuple(r) for r in candidate_pairs(buckets, max_bucket_size=256).collect()}
    uncapped = {tuple(r) for r in candidate_pairs(buckets, max_bucket_size=1 << 30).collect()}
    assert capped == uncapped
    assert capped  # non-trivial


def test_candidate_pairs_exact_matches_distinct_formulation(spark):
    """candidate_pairs_exact (payload-carrying band join +
    first-matching-band filter, NO pair-set shuffle) must produce
    exactly the DISTINCT-of-bucket-join pair set - including pairs
    that collide in several bands (the case the first-match filter
    exists for) - with each pair emitted exactly once."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        candidate_pairs_exact,
        minhash_band_arrays,
    )

    docs = _corpus(
        spark,
        [(i, f"unique document number {i} with shared tail words here") for i in range(40)]
        + [(100 + i, "a duplicated body shared by a handful of docs") for i in range(5)],
    )
    buckets = minhash_lsh_buckets(docs, "doc_id", "body", parallelism=4)
    ba = minhash_band_arrays(docs, "doc_id", "body", parallelism=4)
    expected = {
        tuple(r) for r in candidate_pairs(buckets, max_bucket_size=None).collect()
    }
    got_rows = candidate_pairs_exact(ba, 4).collect()
    got = {tuple(r) for r in got_rows}
    assert got == expected and expected
    # exactly once per pair: identical duplicates collide in ALL 4
    # bands, so without the first-match filter they'd appear 4x
    assert len(got_rows) == len(got)


def test_incremental_neardup_matches_full_rerun(spark):
    """Incremental dedup (new batch vs persisted band index + itself)
    must produce exactly the pairs a full candidate_pairs_exact rerun
    over (history ∪ batch) yields, restricted to pairs touching the
    batch - and the history side of the probe join must come from the
    bucketed layout with no exchange of its own."""
    import re

    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        candidate_pairs_exact,
        incremental_candidate_pairs,
        minhash_band_arrays,
        write_minhash_index,
    )

    hist_docs = _corpus(
        spark,
        [(i, f"historical document {i} with common tail words") for i in range(30)]
        + [(50 + i, "a duplicated body shared across history") for i in range(3)],
    )
    new_docs = _corpus(
        spark,
        [(100, "a duplicated body shared across history")]       # dup of history
        + [(101, "a brand new duplicated body"), (102, "a brand new duplicated body")]  # dup within batch
        + [(110 + i, f"fresh unique content number {i} here now") for i in range(5)],
    )
    try:
        ba_hist = minhash_band_arrays(hist_docs, "doc_id", "body", parallelism=4)
        write_minhash_index(ba_hist, "mh_index_test", num_buckets=8)
        ba_new = minhash_band_arrays(new_docs, "doc_id", "body", parallelism=4)

        inc = incremental_candidate_pairs(spark, ba_new, "mh_index_test", 4)
        got = {frozenset(t) for t in (tuple(r) for r in inc.collect())}
        assert len(got) == inc.count()  # exactly-once per unordered pair

        full_ba = minhash_band_arrays(
            hist_docs.unionByName(new_docs), "doc_id", "body", parallelism=4
        )
        new_ids = {r.doc_id for r in new_docs.select("doc_id").collect()}
        expected = {
            frozenset(t)
            for t in (tuple(r) for r in candidate_pairs_exact(full_ba, 4).collect())
            if t[0] in new_ids or t[1] in new_ids
        }
        assert got == expected and expected
        # history never moves: with broadcast off (tiny test data would
        # otherwise broadcast), the probe join must consume the bucketed
        # layout - history-side scan reports Bucketed and takes no
        # Exchange of its own
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            import contextlib, io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                incremental_candidate_pairs(
                    spark, ba_new, "mh_index_test", 4
                ).explain("formatted")
            plan = buf.getvalue()
            assert "Bucketed: true" in plan
            assert "disabled by query planner" not in plan
            # pin the history side's zero-exchange contract directly:
            # exactly ONE band_key exchange may exist (the PROBE side
            # of the history join - batch-sized by design), and the
            # replay-shield dropDuplicates must ride the bucketing,
            # never its own hashpartitioning(band_key, doc_a) shuffle
            band_key_exchanges = [
                ln
                for ln in plan.splitlines()
                if "Arguments: hashpartitioning(band_key" in ln
            ]
            assert len(band_key_exchanges) == 1, band_key_exchanges
            assert not any("doc_a" in ln for ln in band_key_exchanges)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS mh_index_test")


def test_incremental_neardup_batch_index_overlap(spark):
    """Replay safety: a doc present in BOTH the persisted index and
    the batch (append-then-crash rerun, overlapping batches) must not
    pair with itself, appear from both legs, or emit both
    orientations - the history side is anti-joined against the
    batch's ids, so each unordered pair survives exactly once with
    doc_a < doc_b."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        incremental_candidate_pairs,
        minhash_band_arrays,
        write_minhash_index,
    )

    hist = _corpus(
        spark,
        [(1, "a shared duplicated body of text here"), (2, "something unrelated entirely")],
    )
    # doc 1 replayed in the batch; doc 3 is a fresh dup of it
    batch = _corpus(
        spark,
        [(1, "a shared duplicated body of text here"),
         (3, "a shared duplicated body of text here")],
    )
    try:
        write_minhash_index(
            minhash_band_arrays(hist, "doc_id", "body"), "mh_overlap_test", 8
        )
        rows = incremental_candidate_pairs(
            spark, minhash_band_arrays(batch, "doc_id", "body"),
            "mh_overlap_test", 4,
        ).collect()
        pairs = [(r.doc_a, r.doc_b) for r in rows]
        assert pairs == [(1, 3)]  # exactly once, ordered, no self-pair
    finally:
        spark.sql("DROP TABLE IF EXISTS mh_overlap_test")


def test_simhash64_matches_python_model(spark):
    """The flat explode/vote simhash64 must equal the definitional
    model: bit b set iff sum over tokens of (+1 if xxhash64(token)
    bit b else -1) > 0. Token hashes are fetched from Spark itself
    (xxhash64 has no stdlib twin), the fold runs in Python. Also pins
    the empty-doc -> all-zero fingerprint contract."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import simhash64

    docs = _corpus(
        spark,
        [
            (1, "alpha beta gamma alpha"),
            (2, "one two three four five six"),
            (3, ""),           # empty -> fingerprint 0
            (4, "alpha"),      # single token -> fingerprint == its hash
        ],
    )
    from pyspark.sql import functions as F2

    tok_hash = {
        (r.doc_id, r.pos): r.h
        for r in docs.select(
            "doc_id",
            F2.posexplode(
                F2.split(F2.trim(F2.col("body")), r"\s+")
            ).alias("pos", "t"),
        )
        .filter(F2.col("t") != "")
        .withColumn("h", F2.xxhash64("t"))
        .collect()
    }
    expected = {}
    for doc in (1, 2, 3, 4):
        hashes = [h for (d, _), h in tok_hash.items() if d == doc]
        fp = 0
        for b in range(64):
            votes = sum(1 if (h >> b) & 1 else -1 for h in hashes)
            if votes > 0:
                fp |= 1 << b
        if fp >= 1 << 63:
            fp -= 1 << 64  # to signed long
        expected[doc] = fp
    got = {r.doc_id: r.simhash for r in simhash64(docs, "doc_id", "body").collect()}
    assert got == expected
    assert got[3] == 0


def test_minhash_shuffle_drops_fallback_text(spark):
    """Docs with >= shingle_n tokens must carry NULL fallback text
    through the exchange (the shuffle moves tokens, not bodies)."""
    docs = _corpus(
        spark,
        [(1, "one two three four five six seven"), (2, "short doc")],
    )
    buckets = minhash_lsh_buckets(docs, "doc_id", "body", shingle_n=5)
    # both docs produce bucket rows (short doc via whole-text fallback)
    ids = {r.doc_id for r in buckets.select("doc_id").distinct().collect()}
    assert ids == {1, 2}


def test_connected_components_chain(spark):
    """A-B, B-C, plus an isolated pair D-E: min-label propagation must
    collapse the 3-chain into one component (transitivity that raw
    LSH pairs don't give you)."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (10, 11)], "doc_a int, doc_b int"
    )
    cc = {r.doc_id: r.component for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_drop_neardup_docs_keeps_canonical(spark):
    """Dedup'd corpus keeps min-id per cluster + all unclustered docs."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        connected_components,
        drop_neardup_docs,
    )

    docs = spark.createDataFrame(
        [(i, f"body {i}") for i in range(1, 7)], "doc_id int, body string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "doc_a int, doc_b int")
    cc = connected_components(pairs)
    kept = sorted(
        r.doc_id for r in drop_neardup_docs(docs, cc, "doc_id").collect()
    )
    assert kept == [1, 4, 6]


def test_pack_sequences_boundaries(spark):
    """Pack cuts at cumulative boundaries; an oversized doc spills into
    its own pack; single bucket keeps the stream ordered by id."""
    from machine_downtime_monitor_on_aws_spark.operators.sampling import (
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 2000), (4, 100)], "doc_id int, n_tokens int"
    )
    out = pack_sequences(docs, "doc_id", "n_tokens", 512, 1).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].pack_id == 0            # cum 300, starts at 0
    assert by_id[2].pack_id == 0            # starts at 300 < 512
    assert by_id[3].pack_id == 1            # starts at 600
    assert by_id[4].pack_id == 5            # starts at 2600
    assert all(r.bucket == 0 for r in out)


def test_chunk_documents_boundaries(spark):
    """Overlap semantics: 10 tokens, chunk 4, overlap 1 (stride 3) ->
    chunks at 1-4, 4-7, 7-10; short doc -> one whole chunk."""
    from machine_downtime_monitor_on_aws_spark.operators.sampling import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2, "a b")],
        "doc_id int, body string",
    )
    out = chunk_documents(docs, "doc_id", "body", 4, 1).collect()
    got = {(r.doc_id, r.chunk_id): r.chunk_text for r in out}
    assert got[(1, 1)] == "t1 t2 t3 t4"
    assert got[(1, 2)] == "t4 t5 t6 t7"
    assert got[(1, 3)] == "t7 t8 t9 t10"
    assert (1, 4) not in got
    assert got[(2, 1)] == "a b"


def test_uncapped_selfjoin_mode_degenerate_corpus(spark):
    """max_bucket_size=None (oracle-paired exact mode) on a 500-doc
    identical-boilerplate corpus: completes via the distributed
    self-join and emits exactly C(500,2) distinct pairs."""
    docs = _corpus(
        spark,
        [(i, "the same boilerplate text repeated for every document") for i in range(500)],
    )
    buckets = minhash_lsh_buckets(docs, "doc_id", "body", parallelism=8)
    n = candidate_pairs(buckets, max_bucket_size=None).count()
    assert n == 500 * 499 // 2


def test_minhash_index_param_metadata(spark):
    """r4 advice: the persisted index records its signature params;
    a probe/append declaring drifted num_perms or shingle_n (which
    would produce incomparable band hashes and silently find zero
    cross-history dups) must fail loudly. Undeclared params and
    matching params pass."""
    import pytest as _pytest

    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        append_to_minhash_index,
        incremental_candidate_pairs,
        minhash_band_arrays,
        read_minhash_index_params,
        write_minhash_index,
    )

    docs = _corpus(spark, [(i, f"document body number {i} here") for i in range(10)])
    ba = minhash_band_arrays(docs, "doc_id", "body", num_perms=8, num_bands=4, shingle_n=5)
    try:
        write_minhash_index(
            ba, "mh_meta_test", num_buckets=4, num_perms=8, num_bands=4, shingle_n=5
        )
        assert read_minhash_index_params(spark, "mh_meta_test") == {
            "num_perms": 8,
            "num_bands": 4,
            "shingle_n": 5,
        }
        # matching + undeclared params: fine
        incremental_candidate_pairs(spark, ba, "mh_meta_test", 4).count()
        incremental_candidate_pairs(spark, ba, "mh_meta_test", 4, num_perms=8).count()
        # drifted num_perms: loud
        with _pytest.raises(ValueError, match="num_perms"):
            incremental_candidate_pairs(spark, ba, "mh_meta_test", 4, num_perms=16)
        # drifted num_bands (positional arg, always validated): loud
        with _pytest.raises(ValueError, match="num_bands"):
            incremental_candidate_pairs(spark, ba, "mh_meta_test", 8)
        # drifted append: loud, and nothing written
        with _pytest.raises(ValueError, match="shingle_n"):
            append_to_minhash_index(ba, "mh_meta_test", 4, shingle_n=3)
    finally:
        spark.sql("DROP TABLE IF EXISTS mh_meta_test")


def test_connected_components_size_hint_large(spark):
    """size_hint='large' (skip the driver probe, straight to
    distributed propagation) must yield the same components as the
    auto path - and reject unknown hints."""
    import pytest as _pytest

    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)],
        "doc_a long, doc_b long",
    )
    auto = {tuple(r) for r in connected_components(pairs).collect()}
    dist = {
        tuple(r)
        for r in connected_components(pairs, size_hint="large").collect()
    }
    assert auto == dist and dist
    with _pytest.raises(ValueError, match="size_hint"):
        connected_components(pairs, size_hint="huge")


def test_skew_resilience_boilerplate_fixture(spark):
    """r4 verdict #3: adversarial skew fixture - one boilerplate
    string at ~8% frequency (the 100 TB pathology: scraped footers,
    license headers). Assertions:

    - candidate_pairs' max_bucket_size star-fallback bounds the pair
      count to O(B) per oversized bucket (vs O(B^2) uncapped);
    - simhash_neardup_pairs inherits the same bound;
    - connected_components digests the resulting giant near-clique
      into ONE component holding every boilerplate doc;
    - the capped expansion never self-joins the skewed bucket: the
      pair rows are produced by in-row combinatorics after a groupBy,
      so no join in the plan carries the O(B^2) blowup.
    """
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        candidate_pairs,
        connected_components,
        minhash_lsh_buckets,
        simhash_neardup_pairs,
    )

    n_boiler, n_unique = 200, 2300
    boiler_ids = set(range(n_boiler))
    docs = _corpus(
        spark,
        [(i, "all rights reserved standard footer text appended to every page")
         for i in range(n_boiler)]
        + [(1000 + i, f"genuinely distinct article body number {i} talking about "
                      f"topic {i % 97} in its own words") for i in range(n_unique)],
    )

    buckets = minhash_lsh_buckets(docs, "doc_id", "body", parallelism=8)
    pairs = candidate_pairs(buckets, max_bucket_size=64).collect()
    boiler_pairs = [
        p for p in pairs if p.doc_a in boiler_ids and p.doc_b in boiler_ids
    ]
    # star fallback: <= (B-1) pairs per band for the boilerplate
    # bucket (4 bands max -> 4*(B-1)), nowhere near B*(B-1)/2 = 19900
    assert len(boiler_pairs) <= 4 * (n_boiler - 1)
    assert len(boiler_pairs) >= n_boiler - 1  # still fully connectable

    comp = connected_components(
        spark.createDataFrame(pairs, "doc_a long, doc_b long")
    ).collect()
    labels = {r.doc_id: r.component for r in comp}
    assert len({labels[i] for i in boiler_ids}) == 1  # one giant component

    sim_pairs = simhash_neardup_pairs(
        docs, "doc_id", "body", max_bucket_size=64, parallelism=8
    ).collect()
    sim_boiler = [
        p for p in sim_pairs if p.doc_a in boiler_ids and p.doc_b in boiler_ids
    ]
    assert len(sim_boiler) <= 4 * (n_boiler - 1)
    sim_comp = connected_components(
        spark.createDataFrame(
            [(p.doc_a, p.doc_b) for p in sim_pairs], "doc_a long, doc_b long"
        )
    ).collect()
    sim_labels = {r.doc_id: r.component for r in sim_comp}
    assert len({sim_labels[i] for i in boiler_ids if i in sim_labels}) <= 1

    # distributed path survives the same near-clique (size_hint
    # forces the iterative propagation even at test scale)
    dist = connected_components(
        spark.createDataFrame(pairs, "doc_a long, doc_b long"),
        size_hint="large",
    ).collect()
    assert {r.doc_id: r.component for r in dist} == labels


def test_band_arrays_from_signatures_equals_text_path(spark):
    """Bands derived from a signature frame must equal the text-path
    minhash_band_arrays output row-for-row - the reuse that lets the
    estimator QA hash each shingle K times once."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        band_arrays_from_signatures,
        minhash_band_arrays,
        minhash_signatures,
    )

    docs = _corpus(
        spark,
        [(i, f"some document body number {i} with shared tail words") for i in range(20)]
        + [(100, ""), (101, "tiny")],  # short-doc fallback path too
    )
    via_text = {
        r["doc_id"]: tuple(r["__bands"])
        for r in minhash_band_arrays(docs, "doc_id", "body", 8, 4, 5).collect()
    }
    sig = minhash_signatures(docs, "doc_id", "body", 8, 5)
    via_sig = {
        r["doc_id"]: tuple(r["__bands"])
        for r in band_arrays_from_signatures(sig, 4, 8).collect()
    }
    assert via_text == via_sig and len(via_text) == 22

    import pytest as _pytest

    with _pytest.raises(ValueError, match="divisible"):
        band_arrays_from_signatures(sig, 3, 8)


def test_append_bootstraps_fresh_index_table(spark):
    """append_to_minhash_index against a NOT-yet-existing table is the
    bootstrap path (mode='append' saveAsTable creates it) - the
    metadata guard must validate nothing rather than crash."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        append_to_minhash_index,
        incremental_candidate_pairs,
        minhash_band_arrays,
    )

    docs = _corpus(spark, [(i, f"bootstrap doc number {i} body") for i in range(6)])
    ba = minhash_band_arrays(docs, "doc_id", "body")
    try:
        append_to_minhash_index(ba, "mh_bootstrap_test", 4, num_perms=8)
        # table now exists and is probeable
        n = incremental_candidate_pairs(spark, ba, "mh_bootstrap_test", 4).count()
        assert n >= 0
    finally:
        spark.sql("DROP TABLE IF EXISTS mh_bootstrap_test")


def _probe_plan(spark, ba_new, table, num_bands=4):
    """Formatted plan of the incremental probe with broadcast off -
    the harness for the single-exchange contract asserts."""
    import contextlib
    import io

    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        incremental_candidate_pairs,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            incremental_candidate_pairs(spark, ba_new, table, num_bands).explain(
                "formatted"
            )
        return buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _assert_single_exchange(plan):
    assert "Bucketed: true" in plan
    assert "disabled by query planner" not in plan
    ex = [
        ln
        for ln in plan.splitlines()
        if "Arguments: hashpartitioning(band_key" in ln
    ]
    assert len(ex) == 1 and not any("doc_a" in ln for ln in ex), ex


def test_minhash_index_compaction_preserves_probe_contract(spark):
    """r5 verdict item #3: sustained appends grow the index by
    ~num_buckets files per epoch forever; compaction must fold them
    back, drop verbatim crash-replay duplicate rows, and PRESERVE
    (a) the bucket spec (probe stays single-exchange - asserted on
    the plan), (b) the stamped signature params, (c) the probe's
    exact results."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        append_to_minhash_index,
        compact_minhash_index,
        compact_minhash_index_if_needed,
        incremental_candidate_pairs,
        minhash_band_arrays,
        minhash_index_stats,
        read_minhash_index_params,
        write_minhash_index,
    )

    table = "mh_compact_test"
    hist = _corpus(
        spark,
        [(i, f"historical doc {i} with shared tail words") for i in range(20)]
        + [(50, "a duplicated body shared across history")],
    )
    more = _corpus(
        spark, [(60 + i, f"second wave doc {i} body text") for i in range(10)]
    )
    probe_docs = _corpus(spark, [(100, "a duplicated body shared across history")])
    try:
        ba = minhash_band_arrays(hist, "doc_id", "body", parallelism=4)
        write_minhash_index(ba, table, 8, num_perms=8, num_bands=4, shingle_n=5)
        ba_more = minhash_band_arrays(more, "doc_id", "body", parallelism=4)
        append_to_minhash_index(ba_more, table, 8, num_perms=8)
        # crash-replay: the SAME batch re-appended verbatim
        append_to_minhash_index(ba_more, table, 8, num_perms=8)

        stats0 = minhash_index_stats(spark, table)
        assert stats0["num_buckets"] == 8 and stats0["n_files"] > 8
        params0 = read_minhash_index_params(spark, table)
        ba_probe = minhash_band_arrays(probe_docs, "doc_id", "body", parallelism=4)
        before = sorted(
            tuple(r)
            for r in incremental_candidate_pairs(spark, ba_probe, table, 4).collect()
        )
        n_rows_before_distinct = spark.table(table).distinct().count()

        compact_minhash_index(spark, table)

        stats1 = minhash_index_stats(spark, table)
        assert stats1["num_buckets"] == 8  # bucket spec survived
        assert stats1["n_files"] == 8  # one file per bucket
        assert read_minhash_index_params(spark, table) == params0
        # verbatim duplicates gone, nothing else lost
        assert spark.table(table).count() == n_rows_before_distinct
        after = sorted(
            tuple(r)
            for r in incremental_candidate_pairs(spark, ba_probe, table, 4).collect()
        )
        assert after == before and before
        _assert_single_exchange(_probe_plan(spark, ba_probe, table))

        # the gate: freshly compacted index is under any sane bound
        assert not compact_minhash_index_if_needed(spark, table, 8)
        # drive it over the bound again and let the gate fire
        for _ in range(9):
            append_to_minhash_index(ba_more, table, 8, num_perms=8)
        assert compact_minhash_index_if_needed(spark, table, 8)
        assert minhash_index_stats(spark, table)["n_files"] == 8
    finally:
        for t in (table, f"{table}__compacting", f"{table}__old"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_minhash_index_compaction_crash_recovery(spark):
    """A crash between the swap's two renames leaves the live name
    missing; recover_minhash_index must restore from whichever side
    name survives (preferring the complete compacted copy)."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        minhash_band_arrays,
        recover_minhash_index,
        write_minhash_index,
    )

    table = "mh_recover_test"
    docs = _corpus(spark, [(i, f"recovery doc {i} body words") for i in range(6)])
    ba = minhash_band_arrays(docs, "doc_id", "body", parallelism=2)
    try:
        for side in ("__old", "__compacting"):
            write_minhash_index(ba, table, 4, num_perms=8)
            spark.sql(f"ALTER TABLE {table} RENAME TO {table}{side}")
            assert not spark.catalog.tableExists(table)
            assert recover_minhash_index(spark, table)
            assert spark.catalog.tableExists(table)
            assert spark.table(table).select("doc_id").distinct().count() == 6
            assert not recover_minhash_index(spark, table)  # healthy: no-op
            spark.sql(f"DROP TABLE {table}")
    finally:
        for t in (table, f"{table}__compacting", f"{table}__old"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_incremental_probe_capped_star_bounds_skew(spark):
    """r5 verdict item #6 (operator leg): with max_bucket_size set,
    an oversized HISTORY band bucket pairs each batch doc only
    against the bucket's min-id representative - per-trigger output
    O(batch), not O(index-bucket) - while connected-component dedup
    is unchanged, and the capped plan still takes exactly one
    band_key exchange (the window rides the bucketed layout)."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        connected_components,
        incremental_candidate_pairs,
        minhash_band_arrays,
        write_minhash_index,
    )

    table = "mh_capped_probe_test"
    boiler = "all rights reserved standard footer text appended to every page"
    n_hist = 40
    hist = _corpus(
        spark,
        [(i, boiler) for i in range(n_hist)]
        + [(500 + i, f"distinct history article {i} body words") for i in range(20)],
    )
    batch = _corpus(
        spark,
        [(1000, boiler), (1001, boiler),
         (1002, "a genuinely new unique document body")],
    )
    try:
        write_minhash_index(
            minhash_band_arrays(hist, "doc_id", "body", parallelism=4),
            table, 8, num_perms=8, num_bands=4,
        )
        ba = minhash_band_arrays(batch, "doc_id", "body", parallelism=4)

        uncapped = incremental_candidate_pairs(spark, ba, table, 4).collect()
        # every history boilerplate doc pairs with both batch docs
        assert len(uncapped) == 2 * n_hist + 1  # + internal (1000,1001)

        capped_df = incremental_candidate_pairs(
            spark, ba, table, 4, max_bucket_size=8
        )
        capped = {tuple(r) for r in capped_df.collect()}
        # star: batch boilerplate docs pair ONLY with rep doc 0
        assert capped == {(0, 1000), (0, 1001), (1000, 1001)}

        # CC equivalence: both pair sets put all boilerplate docs that
        # touch the batch in one component with the rep
        comp = connected_components(
            spark.createDataFrame(sorted(capped), "doc_a long, doc_b long")
        ).collect()
        assert len({r.component for r in comp}) == 1

        # plan: the cap's window adds NO exchange - still exactly one
        # band_key exchange (the probe side), history never moves
        import contextlib
        import io

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                incremental_candidate_pairs(
                    spark, ba, table, 4, max_bucket_size=8
                ).explain("formatted")
            _assert_single_exchange(buf.getvalue())
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_winnowing_guarantee_and_cap(spark):
    """Winnowing's core guarantee (SIGMOD'03): any shared token run
    of length >= w+k-1 (= 7 at k=4,w=4) yields at least one shared
    fingerprint, even when the surrounding documents are entirely
    different - the partial-overlap case whole-doc MinHash dilutes.
    Docs with disjoint vocab share nothing; the ubiquity cap drops
    boilerplate fingerprints before the self-join."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    lifted = "the quick brown fox jumps over lazy"  # 7 tokens
    docs = _corpus(
        spark,
        [
            (1, f"alpha bravo charlie {lifted} delta echo foxtrot"),
            (2, f"uno dos tres cuatro {lifted} cinco seis siete ocho"),
            (3, "completely disjoint vocabulary here nothing shared at all"),
            (4, ""),  # empty doc: whole-text fallback, no crash
        ],
    )
    fp = winnow_fingerprints(docs, "doc_id", "body")
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[1] & by_doc[2]  # the guarantee
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])

    pairs = {(r.doc_a, r.doc_b): r.n_shared
             for r in winnow_overlap_pairs(fp, min_shared=1).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs

    # ubiquity cap: the same boilerplate in 60 docs > cap 50 -> its
    # fingerprints carry no pairs (they are dropped pre-join)
    boiler = _corpus(
        spark,
        [(100 + i, "all rights reserved footer text appended here today ok")
         for i in range(60)],
    )
    bfp = winnow_fingerprints(boiler, "doc_id", "body")
    assert winnow_overlap_pairs(bfp, min_shared=1).count() == 0
    # raising the cap restores them - the filter, not the data
    assert winnow_overlap_pairs(
        bfp, min_shared=1, max_docs_per_fingerprint=100
    ).count() == 60 * 59 // 2


def test_update_components_rejects_label_id_collision(spark):
    """r6 verdict item (What's wrong #2): update_components documents
    "ids unique across the corpus" but used to trust it. A batch-new
    node whose id equals an existing component LABEL (possible only
    when the id space collided or the labels table wasn't produced by
    connected_components) must fail loudly instead of silently
    merging unrelated clusters."""
    import pytest

    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        update_components,
    )

    # corrupt labels: component label 1 with NO (1, 1) min-member row,
    # so id 1 arriving in a batch looks "new" while also naming the
    # {2, 3} super-node
    labels = spark.createDataFrame(
        [(2, 1), (3, 1)], "doc_id long, component long"
    )
    new_pairs = spark.createDataFrame(
        [(1, 9)], "doc_a long, doc_b long"
    )
    with pytest.raises(ValueError, match="not unique"):
        update_components(labels, new_pairs)
    # opting out preserves the old trust-the-caller behavior
    out = update_components(labels, new_pairs, validate_ids=False)
    assert out.count() > 0


def test_duplicated_spans_maximal_stitching(spark):
    """A 20-token verbatim copy embedded at different offsets in two
    docs must come back as EXACTLY ONE maximal span row with both
    start offsets and the full length - not 13 window-sized
    fragments; a doc below k tokens emits nothing."""
    from machine_downtime_monitor_on_aws_spark.operators.spans import (
        duplicated_spans,
    )

    shared = " ".join(f"copy{i}" for i in range(20))
    docs = _corpus(
        spark,
        [
            (1, "alpha beta gamma " + shared + " tail one here"),
            (2, "x y z w q r " + shared + " other ending words"),
            (3, "entirely unrelated text with no overlap at all whatsoever"),
            (4, "short doc"),  # < k tokens: no windows
        ],
    )
    rows = duplicated_spans(docs, "doc_id", "body", k=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.span_tokens == 20
    assert r.start_a == 3 and r.start_b == 6


def test_duplicated_spans_multiple_alignments_and_cap(spark):
    """The same shared text at TWO alignments yields two span rows
    (one per diagonal); the max_gram_occurrences valve drops
    boilerplate grams entirely (0 spans when every gram is capped
    out), and a permissive cap equals the exact result."""
    from machine_downtime_monitor_on_aws_spark.operators.spans import (
        duplicated_spans,
    )

    block = " ".join(f"blk{i}" for i in range(10))
    docs = _corpus(
        spark,
        [
            # doc 1 contains the block twice; doc 2 once -> two
            # diagonals, two maximal spans
            (1, block + " middle filler words " + block),
            (2, "lead in " + block + " out"),
        ],
    )
    exact = duplicated_spans(docs, "doc_id", "body", k=8)
    got = sorted((r.start_a, r.start_b, r.span_tokens) for r in exact.collect())
    assert got == [(0, 2, 10), (13, 2, 10)]
    capped_out = duplicated_spans(
        docs, "doc_id", "body", k=8, max_gram_occurrences=1
    )
    assert capped_out.count() == 0
    permissive = duplicated_spans(
        docs, "doc_id", "body", k=8, max_gram_occurrences=100
    )
    assert sorted(
        (r.start_a, r.start_b, r.span_tokens) for r in permissive.collect()
    ) == got


def test_remove_duplicated_spans_policy(spark):
    """Earliest copy wins: the shared block survives in the lowest
    doc_id and is cut from every later one (chains included); a doc
    that IS entirely a copy collapses to the empty string;
    overlapping removal ranges merge before cutting; untouched docs
    pass through byte-identical with n_removed = 0."""
    from machine_downtime_monitor_on_aws_spark.operators.spans import (
        duplicated_spans,
        remove_duplicated_spans,
    )

    block = " ".join(f"blk{i}" for i in range(12))
    docs = _corpus(
        spark,
        [
            (1, "intro words here then " + block + " tail one"),
            (2, "other lead " + block + " different tail"),   # later copy
            (3, block),                                        # doc IS the block
            (4, "totally unrelated and untouched content right here ok"),
        ],
    )
    spans = duplicated_spans(docs, "doc_id", "body", k=8)
    out = {
        r.doc_id: r
        for r in remove_duplicated_spans(docs, spans, "doc_id", "body", 8).collect()
    }
    assert out[1].n_removed == 0 and "blk0" in out[1].dedup_text
    assert out[2].n_removed == 12 and "blk" not in out[2].dedup_text
    assert out[2].dedup_text == "other lead different tail"
    assert out[3].n_removed == 12 and out[3].dedup_text == ""
    assert out[4].n_removed == 0
    assert out[4].dedup_text == "totally unrelated and untouched content right here ok"


def test_incremental_duplicated_spans_matches_full_rerun(spark):
    """Incremental span detection (new batch vs persisted k-gram
    window index + itself) must produce exactly the spans a full
    duplicated_spans rerun over (history ∪ batch) yields, restricted
    to pairs touching the batch; the k-drift guard fails loudly; the
    history side of the probe consumes the bucketed layout with no
    exchange of its own."""
    import re

    import pytest as _pytest

    from machine_downtime_monitor_on_aws_spark.operators.spans import (
        append_to_kgram_index,
        duplicated_spans,
        incremental_duplicated_spans,
        write_kgram_index,
    )

    block = " ".join(f"sh{i}" for i in range(15))
    hist = _corpus(
        spark,
        [(i, f"history doc {i} " + " ".join(f"w{i}x{j}" for j in range(10)))
         for i in range(10)]
        + [(50, "lead in " + block + " trailing words here")],
    )
    batch = _corpus(
        spark,
        [(100, "fresh start " + block + " new ending"),      # vs history 50
         (101, "one two " + block),                            # vs 50 AND 100
         (110, "totally novel content with nothing shared at all here ok")],
    )
    table = "kgram_idx_test"
    try:
        write_kgram_index(hist, table, k=8, text_col="body", num_buckets=8)
        inc = incremental_duplicated_spans(
            spark, batch, table, 8, text_col="body"
        )
        got = {tuple(r) for r in inc.collect()}

        full = duplicated_spans(
            hist.unionByName(batch), "doc_id", "body", 8
        )
        batch_ids = {100, 101, 110}
        want = {
            tuple(r)
            for r in full.collect()
            if r.doc_a in batch_ids or r.doc_b in batch_ids
        }
        assert got == want and want
        # both orientations occurred: history id < batch id (50 vs
        # 100) and batch-internal (100 vs 101)
        pairs = {(a, b) for a, b, *_ in got}
        assert (50, 100) in pairs and (100, 101) in pairs

        # k drift fails loudly
        with _pytest.raises(ValueError, match="kgram_k"):
            incremental_duplicated_spans(spark, batch, table, 9, text_col="body")

        # append then probe: the appended docs are now history
        append_to_kgram_index(batch, table, 8, text_col="body", num_buckets=8)
        probe = _corpus(spark, [(200, "xx " + block + " yy")])
        rows = incremental_duplicated_spans(
            spark, probe, table, 8, text_col="body"
        ).collect()
        assert {r.doc_b for r in rows} == {200}
        assert {r.doc_a for r in rows} == {50, 100, 101}

        # history never moves: with broadcast off, the probe must
        # consume the bucketed layout (history scan takes no Exchange)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                incremental_duplicated_spans(
                    spark, probe, table, 8, text_col="body"
                ).explain("formatted")
            plan = buf.getvalue()
            assert "Bucketed: true" in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_snapshot_diff_branches(spark):
    """added/removed/changed classified exactly; unchanged dropped;
    ids unique across the delta."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        snapshot_diff,
    )

    a = spark.createDataFrame(
        [(1, "same"), (2, "old text"), (3, "going away")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(1, "same"), (2, "new text"), (4, "brand new")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.change for r in snapshot_diff(a, b, "doc_id", "text").collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_incremental_spans_replay_shield_and_kgram_maintenance(spark):
    """r9: duplicate history window rows (a crashed append replay)
    must NOT fragment maximal spans - the probe dedupes its match
    sliver before stitching. Also pins the kgram index maintenance
    trio: purge removes a doc (probes see only survivors, layout +
    stamped k preserved, idempotent) and compaction folds duplicate
    rows back out."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        minhash_index_stats,
        read_minhash_index_params,
    )
    from machine_downtime_monitor_on_aws_spark.operators.spans import (
        append_to_kgram_index,
        compact_kgram_index,
        incremental_duplicated_spans,
        purge_from_kgram_index,
        write_kgram_index,
    )

    block = " ".join(f"sh{i}" for i in range(15))
    hist = _corpus(
        spark,
        [(50, "lead in " + block + " trailing words here"),
         (51, "other " + block + " differs")],
    )
    table = "kgram_replay_test"
    try:
        write_kgram_index(hist, table, k=8, text_col="body", num_buckets=4)
        # simulate the crash window: the SAME batch appends twice
        dup = _corpus(spark, [(60, "xx " + block + " yy")])
        append_to_kgram_index(dup, table, 8, text_col="body", num_buckets=4)
        append_to_kgram_index(dup, table, 8, text_col="body", num_buckets=4)
        probe = _corpus(spark, [(100, "fresh " + block + " end")])
        rows = incremental_duplicated_spans(
            spark, probe, table, 8, text_col="body"
        ).collect()
        by_pair = {}
        for r in rows:
            by_pair.setdefault((r.doc_a, r.doc_b), []).append(r.span_tokens)
        # vs the DUPLICATED doc 60: exactly ONE maximal 15-token span,
        # not row_number-fragmented pieces
        assert by_pair[(60, 100)] == [15], by_pair
        assert by_pair[(50, 100)] == [15] and by_pair[(51, 100)] == [15]

        # compaction folds the duplicate rows back out, params survive
        n_before = spark.table(table).count()
        compact_kgram_index(spark, table)
        n_after = spark.table(table).count()
        assert n_after < n_before
        assert read_minhash_index_params(spark, table)["kgram_k"] == 8
        assert minhash_index_stats(spark, table)["num_buckets"] == 4

        # purge doc 60: probes see only survivors; idempotent
        ids = spark.createDataFrame([(60,)], "doc_id long")
        assert purge_from_kgram_index(spark, table, ids) == 1
        assert purge_from_kgram_index(spark, table, ids) == 0
        rows2 = incremental_duplicated_spans(
            spark, probe, table, 8, text_col="body"
        ).collect()
        assert {r.doc_a for r in rows2} == {50, 51}
        assert read_minhash_index_params(spark, table)["kgram_k"] == 8
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_drop_exact_dups_keeps_min_id_representative(spark):
    """drop_exact_dups (COVERAGE.md U2 evidence): one surviving row
    per distinct text, the min-id one; unique texts untouched; other
    columns ride along unchanged."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        drop_exact_dups,
    )

    rows = [
        (3, "aaa", "x"), (1, "aaa", "y"), (2, "aaa", "z"),
        (5, "bbb", "p"), (4, "ccc", "q"), (6, "bbb", "r"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, extra string")
    got = sorted(
        (r.doc_id, r.text, r.extra)
        for r in drop_exact_dups(df, "doc_id", "text").collect()
    )
    assert got == [(1, "aaa", "y"), (4, "ccc", "q"), (5, "bbb", "p")]


def test_minhash_signature_selectexpr_matches_column_reference(spark):
    """r18: the JVM-parsed selectExpr signature builder must be
    bit-identical to the Column-object formulation it replaced
    (same shingle CASE, same array_min(transform(md5)) tree)."""
    from machine_downtime_monitor_on_aws_spark.functions.text import tokens
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        _minhash_signature_frame,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta"),
        (2, "short doc"),
        (3, ""),
        (4, "alpha beta gamma delta epsilon zeta eta theta iota"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    num_perms, shingle_n = 8, 5

    # reference: the pre-r18 Column-object construction, verbatim
    toked = df.select(
        F.col("doc_id"),
        tokens(F.col("text")).alias("__toks"),
        F.trim(F.col("text")).alias("__t0"),
    ).select(
        "doc_id",
        "__toks",
        F.when(F.size("__toks") < F.lit(shingle_n), F.col("__t0")).alias("__t"),
    )
    n_sh = F.size("__toks") - F.lit(shingle_n - 1)
    sh = F.when(
        n_sh >= 1,
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.array_join(F.slice(F.col("__toks"), i, shingle_n), " "),
        ),
    ).otherwise(F.array(F.col("__t")))
    shingled = toked.select("doc_id", sh.alias("__sh"))

    def perm_min(k):
        prefix = f"{k}:"
        return F.array_min(
            F.transform(F.col("__sh"), lambda s: F.md5(F.concat(F.lit(prefix), s)))
        )

    ref = shingled.select(
        "doc_id", *[perm_min(k).alias(f"m{k}") for k in range(num_perms)]
    )
    got = _minhash_signature_frame(df, "doc_id", "text", num_perms, shingle_n, None)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_candidate_pairs_exact_skips_barrier_on_checkpoint_input(spark):
    """The streaming dedup path hands candidate_pairs_exact an
    already-checkpointed band table every micro-batch; a second
    internal barrier there was pure cost plus one leaked pinned RDD
    per epoch (r17 ADVICE #1)."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        candidate_pairs_exact,
        minhash_band_arrays,
    )
    from machine_downtime_monitor_on_aws_spark.streaming.store import (
        _tracked_local_checkpoint,
        release_checkpoint,
    )

    df = spark.createDataFrame(
        [(i, f"tok{i} a b c d e f g h") for i in range(6)],
        "doc_id long, text string",
    )
    ba = minhash_band_arrays(df, "doc_id", "text")

    # non-checkpoint input: internal lazy barrier, id rides the result
    out = candidate_pairs_exact(ba, 4)
    assert len(getattr(out, "_spark_graft_ckpt_ids", ())) == 1
    out.count()
    release_checkpoint(out)

    # checkpointed input: NO extra barrier; the input's own id rides
    ck = _tracked_local_checkpoint(minhash_band_arrays(df, "doc_id", "text"))
    out2 = candidate_pairs_exact(ck, 4)
    assert tuple(out2._spark_graft_ckpt_ids) == tuple(ck._spark_graft_ckpt_ids)
    out2.count()
    release_checkpoint(ck)


def test_incremental_candidate_pairs_rides_ckpt_ids(spark):
    """r17 ADVICE #1: unionByName drops python attrs; the streaming
    caller must still be able to free the self-join leg's barrier."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        DEFAULT_NUM_BANDS,
        incremental_candidate_pairs,
        minhash_band_arrays,
        write_minhash_index,
    )
    from machine_downtime_monitor_on_aws_spark.streaming.store import (
        release_checkpoint,
    )

    df = spark.createDataFrame(
        [(i, f"w{i} a b c d e f g h i j") for i in range(10)],
        "doc_id long, text string",
    )
    table = "t_icp_ids"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        write_minhash_index(
            minhash_band_arrays(df.filter("doc_id % 2 = 0"), "doc_id", "text"),
            table,
            num_perms=8,
            num_bands=DEFAULT_NUM_BANDS,
            shingle_n=5,
        )
        batch = minhash_band_arrays(
            df.filter("doc_id % 2 = 1"), "doc_id", "text"
        )
        pairs = incremental_candidate_pairs(
            spark, batch, table, DEFAULT_NUM_BANDS
        )
        # the vs_self leg's lazy barrier id must ride the union
        assert len(getattr(pairs, "_spark_graft_ckpt_ids", ())) == 1
        pairs.count()
        release_checkpoint(pairs)
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in pairs._spark_graft_ckpt_ids:
            assert jmap.get(rid) is None
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_simhash_md5_packed_votes_match_unpacked_reference(spark):
    """r18 (verdict #5): the 32-packed-long vote aggregation must be
    bit-identical to the 64-column ±1-vote formulation it replaced
    (sign(sum(bit*2-1)) == 2*sum(bit) > count, all integers)."""
    from machine_downtime_monitor_on_aws_spark.functions.text import tokens
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        _HEX,
        simhash_md5,
    )

    rows = [
        (1, "alpha beta gamma delta alpha beta"),
        (2, "one two"),
        (3, ""),
        (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (5, "alpha alpha alpha"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # reference: the pre-r18 64-column ±1 vote pipeline, verbatim
    tok_rows = df.select(
        "doc_id", F.explode_outer(tokens(F.col("text"))).alias("__t")
    )
    hashed = tok_rows.selectExpr(
        "doc_id",
        "CAST(conv(substring(md5(__t), 1, 8), 16, 10) AS BIGINT) AS __hi",
        "CAST(conv(substring(md5(__t), 9, 8), 16, 10) AS BIGINT) AS __lo",
    )

    def vote(b):
        j, k = b // 4, b % 4
        src = "__hi" if j < 8 else "__lo"
        shift = 4 * (7 - (j % 8)) + k
        return f"(shiftright({src}, {shift}) & 1) * 2 - 1 AS __v{b}"

    voted = hashed.selectExpr("doc_id", *[vote(b) for b in range(64)])
    sums = voted.groupBy("doc_id").agg(
        *[F.expr(f"coalesce(sum(__v{b}), 0)").alias(f"__s{b}") for b in range(64)]
    )
    chars = []
    for j in range(16):
        val = " + ".join(
            f"(CASE WHEN __s{4 * j + k} > 0 THEN {2 ** k} ELSE 0 END)"
            for k in range(4)
        )
        chars.append(f"substring('{_HEX}', 1 + ({val}), 1)")
    ref = sums.selectExpr("doc_id", f"concat({', '.join(chars)}) AS simhash")

    got = simhash_md5(df, "doc_id", "text")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
