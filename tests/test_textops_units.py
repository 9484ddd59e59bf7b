"""Unit pins for text-op transforms whose catalog fixtures cannot
exercise every rule (the synthetic corpus is digit- and
punctuation-free, so the PII regex stage of redacted_documents never
fires there - the oracle still hash-checks the masking stage; THIS
file feeds the regex stage real PII)."""

from __future__ import annotations


def test_redaction_regex_stage_fires_on_real_pii(spark, tmp_path):
    """URLs, emails, and long digit runs must be replaced with typed
    placeholders (in that order) and counted; blocklist terms mask
    at token level; clean text passes through unchanged."""
    import os

    from machine_downtime_monitor_on_aws_spark.plans.textops import (
        redacted_documents,
    )

    rows = [
        (1, "contact me at jane.doe+spam@example.org today", "en", "web", 44),
        (2, "see https://example.com/path?q=1 and card 1234567890", "en", "web", 52),
        (3, "the customer called the supplier twice", "en", "web", 38),
        (4, "perfectly clean text with nothing to scrub", "en", "web", 42),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.parquet(os.path.join(sf, "documents.parquet"))

    got = {r.doc_id: r for r in redacted_documents(spark, sf).collect()}
    assert got[1].redacted_text == "contact me at <EMAIL> today"
    assert got[1].n_redactions == 1
    assert got[2].redacted_text == "see <URL> and card <NUM>"
    assert got[2].n_redactions == 2
    assert got[3].redacted_text == "the <ENTITY> called the <ENTITY> twice"
    assert got[3].n_redactions == 2
    assert got[4].redacted_text == rows[3][1] and got[4].n_redactions == 0


def test_cdc_chunks_resynchronize_after_insertion(spark):
    """The content-defined property: prepending one token shifts
    every FIXED window, but CDC boundaries re-synchronize at the
    first content boundary, so the shifted document shares all
    downstream chunk hashes with the original. Identical docs chunk
    identically; empty and single-token docs don't crash."""
    import random

    from machine_downtime_monitor_on_aws_spark.operators.sampling import (
        cdc_chunks,
    )

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(200)]
    body = " ".join(rng.choice(vocab) for _ in range(120))
    rows = [
        (1, body),
        (2, "inserted " + body),  # one-token prefix edit
        (3, body),                # exact duplicate of 1
        (4, "solo"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ch = cdc_chunks(df, "doc_id", "text", boundary_mod=8)
    by_doc = {}
    for r in ch.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.chunk_md5)
    assert len(by_doc[1]) >= 3  # fixture sanity: multiple chunks
    assert by_doc[1] == by_doc[3]  # identical docs -> identical chunks
    shared = by_doc[1] & by_doc[2]
    # every chunk after the first boundary re-synchronizes: only the
    # head chunk differs
    assert len(shared) >= len(by_doc[1]) - 1 and shared
    assert len(by_doc[4]) == 1  # single-token doc -> one chunk
    assert 5 not in by_doc  # empty doc -> no chunks


def test_bpe_train_and_segment_greedy_semantics(spark):
    """BPE merges apply greedily left-to-right without crossing
    symbol boundaries; training picks (count desc, pair asc); the
    segmenter reproduces the trained symbol sequences."""
    from machine_downtime_monitor_on_aws_spark.operators.bpe import (
        bpe_segment,
        bpe_train_merges,
    )

    docs = [(0, "aaaa aaaa ab"), (1, "aaaa ab ab")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = bpe_train_merges(df, "text", 2)
    # 'a a' appears 3x per 'aaaa' (adjacent enumeration) -> clear top;
    # after the merge the symbol strings are 'aa aa </w>' etc.
    assert merges[0]["pair"] == "a a" and merges[0]["merged"] == "aa"
    # second merge operates on POST-merge symbols (greedy left-to-right
    # collapsed 'a a a a' -> 'aa aa', so 'a a' is gone)
    assert merges[1]["pair"] != "a a"

    seg = bpe_segment(df, "text", merges)
    out = {r.doc_id: list(r.bpe_symbols) for r in seg.collect()}
    # every 'aaaa' word became two 'aa' symbols - a run merges FULLY
    # (the sentinel-replace formulation dropped every other pair)
    first = out[0][0]
    assert first.split(" ") == ["aa", "aa", "</w>"], out
    syms = first.split(" ")
    assert ("a", "a") not in list(zip(syms, syms[1:]))

    # cross-boundary safety: a pair whose left symbol is the SUFFIX of
    # a merged symbol must not match (sentinel padding)
    from machine_downtime_monitor_on_aws_spark.operators.bpe import (
        apply_merge,
    )
    from pyspark.sql import functions as F

    row = spark.range(1).select(F.lit("al l o </w>").alias("sym"))
    got = row.select(apply_merge(F.col("sym"), "l l", "ll").alias("r")).collect()
    assert got[0].r == "al l o </w>"  # 'l l' inside 'al l' never merges


def test_bpe_requires_positive_merges(spark):
    import pytest

    from machine_downtime_monitor_on_aws_spark.operators.bpe import (
        bpe_train_merges,
    )

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train_merges(df, "text", 0)


def test_temperature_sample_lifts_small_sources(spark):
    """alpha=0.5 temperature sampling: a source 100x larger than
    another gets a much LOWER keep rate (sqrt flattening), the small
    source's rate clamps at 100%, and membership is the
    deterministic md5 threshold (re-run identical)."""
    from machine_downtime_monitor_on_aws_spark.operators.sampling import (
        temperature_sample,
    )

    rows = [(i, "big") for i in range(1000)] + [
        (1000 + i, "small") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = temperature_sample(df, "doc_id", "grp", budget_frac=0.5)
    thr = {
        r.grp: r.keep_threshold
        for r in out.select("grp", "keep_threshold").distinct().collect()
    }
    # shares: sqrt(1000):sqrt(10) ~ 10:1 over a 505-doc budget ->
    # small source wants ~46 docs from its 10 -> clamped to 100%
    assert thr["small"] == 10_000
    assert 0 < thr["big"] < 10_000
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in temperature_sample(
        df, "doc_id", "grp", budget_frac=0.5).collect())
    assert a == b and a


def test_kmv_distinct_estimate_fallback_and_accuracy(spark):
    from machine_downtime_monitor_on_aws_spark.operators.sampling import (
        kmv_distinct_estimate,
    )
    from pyspark.sql import functions as F

    # fewer distinct values than k: exact fallback
    small = spark.createDataFrame(
        [(i % 5,) for i in range(50)], "v long"
    )
    r = kmv_distinct_estimate(small, "v", k=16).collect()[0]
    assert (r.n_hashed, r.kmv_estimate) == (5, 5.0)
    # 2000 distinct values, k=64: estimate within ~3 std errors
    # (se ~ n/sqrt(k-2) ~ 254)
    big = spark.createDataFrame([(i,) for i in range(2000)], "v long")
    r = kmv_distinct_estimate(big, "v", k=64).collect()[0]
    assert r.n_hashed == 64
    assert abs(r.kmv_estimate - 2000) < 800, r.kmv_estimate
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        kmv_distinct_estimate(big, "v", k=1)


def test_largest_remainder_allocation_properties(spark):
    """Hamilton apportionment: allocations sum to the budget exactly,
    each is floor(quota) or floor+1, leftovers go to the largest
    remainders with group-asc ties, zero-weight groups get zero, and
    budget=0 / degenerate single-group cases hold."""
    import pytest as _pt

    from machine_downtime_monitor_on_aws_spark.operators.sampling import (
        largest_remainder_allocation,
    )

    w = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 3), ("d", 0)], "g string, w long"
    )
    got = {
        r.group: (r.quota, r.alloc_floor, r.allocation)
        for r in largest_remainder_allocation(w, "g", "w", 10).collect()
    }
    assert sum(v[2] for v in got.values()) == 10
    for q, fl, al in got.values():
        assert al in (fl, fl + 1)
    # quotas: a=50/11=4.54.., b=c=30/11=2.72.., d=0 -> floors 4,2,2,0
    # leftover 2 -> remainders .72 (b, c) beat .54 (a); b before c is
    # irrelevant here (both get one), but a must NOT get an extra
    assert got["a"][2] == 4 and got["b"][2] == 3 and got["c"][2] == 3
    assert got["d"] == (0.0, 0, 0)

    solo = largest_remainder_allocation(
        spark.createDataFrame([("x", 7)], "g string, w long"), "g", "w", 5
    ).collect()
    assert solo[0].allocation == 5
    zero = largest_remainder_allocation(w, "g", "w", 0).collect()
    assert all(r.allocation == 0 for r in zero)
    with _pt.raises(ValueError, match="budget"):
        largest_remainder_allocation(w, "g", "w", -1)
    # zero/null weight-total guard (r8 advice): 0/0 quotas would be
    # NaN -> null allocations; fail loudly on all-zero, all-null, and
    # empty frames alike
    allz = spark.createDataFrame([("a", 0), ("b", 0)], "g string, w long")
    with _pt.raises(ValueError, match="weight total"):
        largest_remainder_allocation(allz, "g", "w", 10)
    with _pt.raises(ValueError, match="weight total"):
        largest_remainder_allocation(allz.filter("w > 0"), "g", "w", 10)


def test_leakage_safe_splits_are_cluster_atomic(spark):
    """By construction no near-dup candidate pair may straddle the
    split - verify against the actual pair set at sf0.001, and that
    both split values occur (non-vacuous)."""
    from machine_downtime_monitor_on_aws_spark.plans.catalog import REGISTRY

    sf = "/root/testdata/sf0.001"
    splits = {
        r.doc_id: r.split
        for r in REGISTRY["leakage_safe_splits"].fn(spark, sf).collect()
    }
    assert set(splits.values()) == {"train", "test"}
    pairs = REGISTRY["neardup_candidate_pairs"].fn(spark, sf).collect()
    assert pairs  # non-vacuous: the corpus has near-dups
    for r in pairs:
        assert splits[r.doc_a] == splits[r.doc_b], (r.doc_a, r.doc_b)


def test_bpe_catalog_encode_serves_from_persisted_store(
    spark, tmp_path, monkeypatch
):
    """r8 verdict next-round #2, the BPE catalog path: first
    bpe_compression_stats invocation trains + persists the merge
    store (layout='bpe'); warm invocations load it (trainer poisoned
    to prove no retraining) and reproduce bit-identically."""
    import glob
    import tempfile

    from machine_downtime_monitor_on_aws_spark.plans import catalog

    monkeypatch.setattr(tempfile, "tempdir", str(tmp_path))
    fn = catalog.REGISTRY["bpe_compression_stats"].fn
    sf = "/root/testdata/sf0.001"
    rows1 = {r.doc_id: tuple(r) for r in fn(spark, sf).collect()}
    stores = glob.glob(str(tmp_path / "spark_graft_bpe_merges_*"))
    assert len(stores) == 1, stores
    import machine_downtime_monitor_on_aws_spark.operators.bpe as bpe

    def _boom(*a, **k):
        raise AssertionError("warm path retrained instead of loading")

    monkeypatch.setattr(bpe, "bpe_train_merges", _boom)
    rows2 = {r.doc_id: tuple(r) for r in fn(spark, sf).collect()}
    assert rows2 == rows1 and rows1


def test_bigram_lm_serves_from_persisted_counts_store(
    spark, tmp_path, monkeypatch
):
    """bigram_lm_doc_scores and ccnet_perplexity_buckets share ONE
    persisted LM-counts store: the first call trains + persists,
    subsequent calls (and the downstream bucketing query) load the
    digest-verified tables - proven by poisoning the trainer after
    the first call - and reproduce bit-identically. A tampered
    digest record fails loudly."""
    import glob
    import json
    import os
    import tempfile

    from machine_downtime_monitor_on_aws_spark.plans import catalog, textops

    monkeypatch.setattr(tempfile, "tempdir", str(tmp_path))
    sf = "/root/testdata/sf0.001"
    # pinned on the builder directly since the r16 swap retired its
    # catalog row (scoring stays oracle-checked via ccnet's oracle)
    fn_lm = textops.bigram_lm_doc_scores
    fn_cc = catalog.REGISTRY["ccnet_perplexity_buckets"].fn
    rows1 = sorted(tuple(r) for r in fn_lm(spark, sf).collect())
    stores = glob.glob(str(tmp_path / "spark_graft_bigram_lm_*"))
    assert len(stores) == 1, stores

    def _boom(*a, **k):
        raise AssertionError("warm path retrained instead of loading")

    monkeypatch.setattr(textops, "_train_bigram_counts", _boom)
    rows2 = sorted(tuple(r) for r in fn_lm(spark, sf).collect())
    assert rows2 == rows1 and rows1
    # the downstream bucketing query rides the SAME store
    cc = fn_cc(spark, sf).collect()
    assert cc
    assert len(glob.glob(str(tmp_path / "spark_graft_bigram_lm_*"))) == 1
    # tamper: corrupt the recorded digest without touching the tables
    rec = os.path.join(stores[0], "params.json")
    crc = os.path.join(stores[0], ".params.json.crc")
    if os.path.exists(crc):
        os.remove(crc)  # Hadoop checksum sidecar guards first otherwise
    p = json.load(open(rec))
    p["bc_digest"] = "0:0"
    json.dump(p, open(rec, "w"))
    import pytest as _pt

    with _pt.raises(ValueError, match="digest mismatch"):
        fn_lm(spark, sf).collect()


def test_counts_digest_partition_order_independent(spark):
    """The store digest must pin CONTENT, not layout: decimal-summed
    xxhash64 is invariant under repartitioning/row order, and any
    changed row changes it."""
    from machine_downtime_monitor_on_aws_spark.plans.textops import (
        _counts_digest,
    )

    df = spark.createDataFrame(
        [("a b", 3), ("b c", 1), ("c d", 7)], "bigram string, c long"
    )
    from pyspark.sql import functions as F

    d1 = _counts_digest(df, ["bigram", "c"])
    assert d1 == _counts_digest(df.repartition(7), ["bigram", "c"])
    assert d1 == _counts_digest(df.orderBy(F.col("c").desc()), ["bigram", "c"])
    tampered = spark.createDataFrame(
        [("a b", 3), ("b c", 2), ("c d", 7)], "bigram string, c long"
    )
    assert d1 != _counts_digest(tampered, ["bigram", "c"])
    empty = spark.createDataFrame([], "bigram string, c long")
    assert _counts_digest(empty, ["bigram", "c"]) == "0:0"


def test_parquet_or_empty_guard(spark, tmp_path):
    """Warm-path feed reads: a path with committed files reads
    normally; a missing/emptied path returns a typed empty frame
    instead of an unable-to-infer-schema error."""
    from machine_downtime_monitor_on_aws_spark.plans.textops import (
        _parquet_or_empty,
    )

    p = str(tmp_path / "feed")
    out = _parquet_or_empty(spark, p, "doc_a long, doc_b long")
    assert out.count() == 0 and out.columns == ["doc_a", "doc_b"]
    spark.createDataFrame([(1, 2)], "doc_a long, doc_b long").write.parquet(p)
    assert _parquet_or_empty(spark, p, "doc_a long, doc_b long").count() == 1


def test_incremental_clusters_serve_from_history_store(
    spark, tmp_path, monkeypatch
):
    """neardup_clusters_incremental reads the persisted (pairs feed,
    historical labels) store after the first build - proven by
    poisoning the pair pipeline after the build - and reproduces the
    full-CC labels bit-identically."""
    import glob
    import tempfile

    from machine_downtime_monitor_on_aws_spark.plans import catalog, textops

    monkeypatch.setattr(tempfile, "tempdir", str(tmp_path))
    sf = "/root/testdata/sf0.001"
    fn = catalog.REGISTRY["neardup_clusters_incremental"].fn
    rows1 = sorted(tuple(r) for r in fn(spark, sf).collect())
    stores = glob.glob(str(tmp_path / "spark_graft_mh_hist_*"))
    assert len(stores) == 1, stores

    def _boom(*a, **k):
        raise AssertionError("warm path re-derived the pair graph")

    monkeypatch.setattr(textops, "_minhash_pairs", _boom)
    rows2 = sorted(tuple(r) for r in fn(spark, sf).collect())
    assert rows2 == rows1 and rows1
    # feed consumers ride the SAME store (pairs + labels_full):
    # rollups/audits work with the pair pipeline poisoned, and no
    # second store appears (duplicate_cluster_sizes called on the
    # builder directly since the r17 swap retired its catalog row)
    for consumer in (
        textops.duplicate_cluster_sizes,
        catalog.REGISTRY["split_leakage_pairs"].fn,
        catalog.REGISTRY["neardup_keep_best_quality"].fn,
    ):
        assert consumer(spark, sf).count() >= 0
    assert len(glob.glob(str(tmp_path / "spark_graft_mh_hist_*"))) == 1


def test_bpe_train_early_stop_and_empty_corpus(spark):
    """Early-stop edges through the word-frequency path: a blank
    corpus yields an empty frequency table (zero merges); a corpus
    whose only word is one char trains exactly one merge
    ('x </w>' -> 'x</w>') and then runs out of pairs."""
    from machine_downtime_monitor_on_aws_spark.operators.bpe import (
        bpe_train_merges,
    )
    from machine_downtime_monitor_on_aws_spark.operators.wordpiece import (
        wordpiece_train_merges,
    )

    blank = spark.createDataFrame(
        [(0, ""), (1, "   ")], "doc_id long, text string"
    )
    assert bpe_train_merges(blank, "text", 3) == []
    assert wordpiece_train_merges(blank, "text", 3) == []

    one = spark.createDataFrame([(0, "x x")], "doc_id long, text string")
    got = bpe_train_merges(one, "text", 5)
    assert got == [
        {"iteration": 1, "pair": "x </w>", "merged": "x</w>", "pair_count": 2}
    ]
    # WordPiece symbolizes a 1-char word to a single bare symbol:
    # no pairs at all, zero merges
    assert wordpiece_train_merges(one, "text", 5) == []
