"""operators/wordpiece.py - likelihood-scored merges pinned bit-equal
to a pure-Python replay, the score-vs-frequency divergence from BPE,
and symbolization/merged-name conventions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.operators.wordpiece import (
    merged_name,
    wordpiece_segment,
    wordpiece_train_merges,
    wp_symbolized_words,
)


def _py_wordpiece(texts, n_merges):
    """Exact replay of the operator's arithmetic: occurrence counts,
    score = double(c_ab) / (double(c_a) * double(c_b)), argmax by
    (score desc, pair asc), greedy left-to-right merge application."""
    words = []
    for t in texts:
        for w in t.split():
            words.append([w[0]] + [f"##{c}" for c in w[1:]])
    out = []
    for it in range(1, n_merges + 1):
        sc, pc = {}, {}
        for syms in words:
            for s in syms:
                sc[s] = sc.get(s, 0) + 1
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + 1
        if not pc:
            break
        scored = {
            p: float(c) / (float(sc[p[0]]) * float(sc[p[1]]))
            for p, c in pc.items()
        }
        best = min(scored, key=lambda p: (-scored[p], f"{p[0]} {p[1]}"))
        pair = f"{best[0]} {best[1]}"
        merged = merged_name(pair)
        out.append(
            {
                "iteration": it,
                "pair": pair,
                "merged": merged,
                "pair_count": pc[best],
                "left_count": sc[best[0]],
                "right_count": sc[best[1]],
                "score": scored[best],
            }
        )
        nxt = []
        for syms in words:
            res = []
            for s in syms:
                if res and res[-1] == best[0] and s == best[1]:
                    res[-1] = merged
                else:
                    res.append(s)
            nxt.append(res)
        words = nxt
    return out, words


TEXTS = [
    "unhappy unhappy undo redo redo redo",
    "happy happy sun fun fun run",
    "do so do",
]


def test_train_matches_python_model_bit_exact(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = wordpiece_train_merges(df, "text", 4)
    want, _ = _py_wordpiece(TEXTS, 4)
    assert got == want  # ints exact AND the score doubles bit-equal


def test_score_diverges_from_frequency_argmax(spark):
    """The defining WordPiece property: a rare-but-exclusive pair
    (q ##z below: both symbols occur ONLY together, score 1/c) beats
    the most frequent pair made of promiscuous symbols."""
    texts = ["qz", "ab ab ab ab ab ba ba ba ab a b"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    m = wordpiece_train_merges(df, "text", 1)[0]
    assert m["pair"] == "q ##z" and m["merged"] == "qz"
    assert m["pair_count"] == 1  # NOT the frequency argmax ('a ##b' x6)
    assert m["score"] == 1.0


def test_symbolization_and_merged_names(spark):
    df = spark.createDataFrame([(0, "abc x")], "doc_id long, text string")
    syms = {r.sym for r in wp_symbolized_words(df, "text").collect()}
    assert syms == {"a ##b ##c", "x"}
    assert merged_name("a ##b") == "ab"
    assert merged_name("##b ##c") == "##bc"


def test_segment_replays_training_state(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = wordpiece_train_merges(df, "text", 3)
    seg = wordpiece_segment(df, "text", merges)
    got = [
        s
        for r in seg.orderBy("doc_id").collect()
        for s in [x.split(" ") for x in r.wp_symbols]
    ]
    _, want = _py_wordpiece(TEXTS, 3)
    assert got == want


def test_requires_positive_merges(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_merges"):
        wordpiece_train_merges(df, "text", 0)


def test_doubled_corpus_doubles_counts_same_merges(spark):
    """The word-frequency-table weighting, pinned directly: training
    on corpus+corpus must choose the SAME merges with exactly doubled
    pair/left/right counts (scores halve: 2c/(2a*2b) = c/(2ab)) for
    WordPiece, and doubled pair_count for BPE."""
    from machine_downtime_monitor_on_aws_spark.operators.bpe import (
        bpe_train_merges,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    both = df.unionByName(
        df.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    )
    wp1 = wordpiece_train_merges(df, "text", 3)
    wp2 = wordpiece_train_merges(both, "text", 3)
    for a, b in zip(wp1, wp2, strict=True):
        assert (a["pair"], a["merged"]) == (b["pair"], b["merged"])
        for k in ("pair_count", "left_count", "right_count"):
            assert b[k] == 2 * a[k]
        assert b["score"] == a["score"] / 2.0
    bp1 = bpe_train_merges(df, "text", 3)
    bp2 = bpe_train_merges(both, "text", 3)
    for a, b in zip(bp1, bp2, strict=True):
        assert (a["pair"], a["merged"]) == (b["pair"], b["merged"])
        assert b["pair_count"] == 2 * a["pair_count"]


def _py_greedy(w, vocab, unk="[UNK]"):
    maxp = max(len(v[2:]) if v.startswith("##") else len(v) for v in vocab)
    pos, pieces = 0, []
    while pos < len(w):
        best = None
        for L in range(min(maxp, len(w) - pos), 0, -1):
            cand = ("##" if pos > 0 else "") + w[pos : pos + L]
            if cand in vocab:
                best = L
                break
        if best is None:
            return [unk], True
        pieces.append(("##" if pos > 0 else "") + w[pos : pos + best])
        pos += best
    return pieces, False


def test_encode_matches_python_greedy_incl_unk(spark):
    from machine_downtime_monitor_on_aws_spark.operators.wordpiece import (
        wordpiece_encode_words,
    )

    vocab = ["a", "b", "c", "##b", "##c", "ab", "##bc", "x"]
    words = ["abc", "abcbc", "x", "q", "axq", "ab", "bcb"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r.w: (list(r.pieces), r.is_unk)
        for r in wordpiece_encode_words(df, "w", vocab, 8).collect()
    }
    assert got == {w: _py_greedy(w, vocab) for w in words}
    # the fixture is non-vacuous on BOTH paths: some UNK, some merged
    assert got["q"] == (["[UNK]"], True)
    assert got["abc"] == (["ab", "##c"], False)


def test_encode_zero_length_word_is_unk(spark):
    """A length-0 word must surface as [UNK]/is_unk, not as an empty
    piece list indistinguishable from a successful encoding (r8
    advice: done fires at step 1 with pieces=[], and the exhausted
    check 0<0 misses it)."""
    from machine_downtime_monitor_on_aws_spark.operators.wordpiece import (
        wordpiece_encode_words,
    )

    df = spark.createDataFrame([("",), ("a",)], "w string")
    got = {
        r.w: (list(r.pieces), r.is_unk)
        for r in wordpiece_encode_words(df, "w", ["a"], 4).collect()
    }
    assert got[""] == (["[UNK]"], True)
    assert got["a"] == (["a"], False)


def test_encode_diverges_from_merge_replay(spark):
    """The defining longest-match property: with 'abc' in the vocab
    but NO 'ab' merge path taken during training replay, the greedy
    encoder takes the longest piece in one bite."""
    from machine_downtime_monitor_on_aws_spark.operators.wordpiece import (
        wordpiece_encode_words,
    )

    vocab = ["a", "b", "c", "##b", "##c", "##bc", "abc"]
    df = spark.createDataFrame([("abc",)], "w string")
    got = wordpiece_encode_words(df, "w", vocab, 8).collect()[0]
    # merge replay from ['a','##b','##c'] could only reach
    # ['a','##bc']; longest-match jumps straight to the full word
    assert list(got.pieces) == ["abc"]


def test_encode_corpus_has_zero_unk_by_coverage(spark):
    """Training-corpus encode: the vocab contains every base symbol
    by construction, so UNK is impossible on the training corpus
    itself - pinned here because the catalog query can't exercise
    the UNK branch (the unit fixture above does)."""
    from machine_downtime_monitor_on_aws_spark.plans.catalog import REGISTRY

    df = REGISTRY["wordpiece_doc_encoding"].fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert sum(r.n_unk_words for r in rows) == 0
    # merges actually compress: fewer pieces than characters somewhere
    assert any(r.n_pieces < r.n_words * 4 and r.n_words > 0 for r in rows)


def test_encode_validates_steps(spark):
    import pytest as _pt

    from machine_downtime_monitor_on_aws_spark.operators.wordpiece import (
        wordpiece_encode_words,
    )

    df = spark.createDataFrame([("x",)], "w string")
    with _pt.raises(ValueError, match="n_steps"):
        wordpiece_encode_words(df, "w", ["x"], 0)


def test_merge_store_roundtrip_and_guards(spark, tmp_path):
    """save/load for BOTH tokenizer layouts: bit-equal roundtrip
    (incl. score doubles), layout pin, self-digest tamper, missing
    store."""
    import json

    from machine_downtime_monitor_on_aws_spark.operators.bpe import (
        bpe_train_merges,
        load_merges,
        merges_digest,
        save_merges,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    wp = wordpiece_train_merges(df, "text", 3)
    bp = bpe_train_merges(df, "text", 3)

    wpp = str(tmp_path / "wp")
    bpp = str(tmp_path / "bp")
    save_merges(spark, wpp, wp, "wordpiece")
    save_merges(spark, bpp, bp, "bpe")

    got_wp, params = load_merges(spark, wpp, expect_layout="wordpiece")
    assert got_wp == wp  # ints AND score doubles bit-equal
    assert params["merges_md5"] == merges_digest(wp)
    got_bp, _ = load_merges(
        spark, bpp, expect_layout="bpe", expect_digest=merges_digest(bp)
    )
    assert got_bp == bp

    # applying a loaded model segments identically
    seg_a = wordpiece_segment(df, "text", wp).orderBy("doc_id").collect()
    seg_b = wordpiece_segment(df, "text", got_wp).orderBy("doc_id").collect()
    assert [list(r.wp_symbols) for r in seg_a] == [
        list(r.wp_symbols) for r in seg_b
    ]

    with pytest.raises(ValueError, match="layout"):
        load_merges(spark, wpp, expect_layout="bpe")
    with pytest.raises(ValueError, match="no committed"):
        load_merges(spark, str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="expects"):
        load_merges(spark, wpp, expect_digest="0" * 32)
    # tamper: rewrite params with a wrong digest THROUGH fsio (a raw
    # pathlib edit would trip the local ChecksumFileSystem's .crc
    # sidecar before our digest check ever runs)
    from machine_downtime_monitor_on_aws_spark import fsio

    tampered = json.loads((tmp_path / "wp" / "params.json").read_text())
    tampered["merges_md5"] = "f" * 32
    fsio.write_text(spark, f"{wpp}/params.json", json.dumps(tampered))
    with pytest.raises(ValueError, match="digest"):
        load_merges(spark, wpp)
    with pytest.raises(ValueError, match="layout"):
        save_merges(spark, str(tmp_path / "x"), wp, "sentencepiece")


def test_encode_exhausted_steps_is_unk_and_default_derives(spark):
    """An explicit n_steps too small for a word must surface as UNK,
    never silently truncated pieces; the None default derives the
    max word length and encodes fully."""
    from machine_downtime_monitor_on_aws_spark.operators.wordpiece import (
        wordpiece_encode_words,
    )

    vocab = ["a", "##b", "##c", "##d"]
    df = spark.createDataFrame([("abcd",), ("ab",)], "w string")
    tight = {
        r.w: (list(r.pieces), r.is_unk)
        for r in wordpiece_encode_words(df, "w", vocab, 2).collect()
    }
    assert tight["ab"] == (["a", "##b"], False)        # fits in 2 steps
    assert tight["abcd"] == (["[UNK]"], True)          # exhausted -> UNK
    auto = {
        r.w: (list(r.pieces), r.is_unk)
        for r in wordpiece_encode_words(df, "w", vocab).collect()
    }
    assert auto["abcd"] == (["a", "##b", "##c", "##d"], False)


def test_catalog_encode_serves_from_persisted_store(spark, tmp_path, monkeypatch):
    """r8 verdict next-round #2, the catalog path itself: the first
    wordpiece_doc_encoding invocation trains and persists the merge
    store; later invocations LOAD it (no retraining) and the digest
    guard fires on a tampered store instead of silently
    mis-tokenizing. Pinned at sf0.001 with the store redirected to a
    scratch tempdir."""
    import glob
    import json
    import tempfile

    import pytest as _pt

    from machine_downtime_monitor_on_aws_spark.plans import catalog

    monkeypatch.setattr(tempfile, "tempdir", str(tmp_path))
    fn = catalog.REGISTRY["wordpiece_doc_encoding"].fn
    sf = "/root/testdata/sf0.001"
    rows1 = {r.doc_id: tuple(r) for r in fn(spark, sf).collect()}
    stores = glob.glob(str(tmp_path / "spark_graft_wp_merges_*"))
    assert len(stores) == 1, stores
    # warm path loads (store untouched) and reproduces bit-identically
    rows2 = {r.doc_id: tuple(r) for r in fn(spark, sf).collect()}
    assert rows1 == rows2 and rows1
    # training must NOT rerun on the warm path: poison the trainer
    import machine_downtime_monitor_on_aws_spark.operators.wordpiece as wp

    def _boom(*a, **k):
        raise AssertionError("warm path retrained instead of loading")

    monkeypatch.setattr(wp, "wordpiece_train_merges", _boom)
    rows3 = {r.doc_id: tuple(r) for r in fn(spark, sf).collect()}
    assert rows3 == rows1
    # tampered digest fails loudly (drop the local-FS .crc sidecar so
    # the read reaches the digest check, not Hadoop's checksum layer)
    import os

    pj = f"{stores[0]}/params.json"
    params = json.load(open(pj))
    params["merges_md5"] = "0" * 32
    open(pj, "w").write(json.dumps(params, sort_keys=True))
    crc = f"{stores[0]}/.params.json.crc"
    if os.path.exists(crc):
        os.remove(crc)
    with _pt.raises(ValueError, match="digest"):
        fn(spark, sf)


def test_train_matches_python_model_random_corpora(spark):
    """The fixed-corpus bit-exact pin, widened over random
    tiny-alphabet corpora (dense symbol collisions, score ties,
    repeated words) - counts AND IEEE score doubles must match the
    occurrence-counting model exactly through the word-frequency
    trainer."""
    import random

    for seed in (11, 222, 3333):
        rng = random.Random(seed)
        texts = [
            " ".join(
                "".join(rng.choice("ab") for _ in range(rng.randint(1, 5)))
                for _ in range(rng.randint(1, 7))
            )
            for _ in range(10)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        got = wordpiece_train_merges(df, "text", 4)
        want, _ = _py_wordpiece(texts, 4)
        assert got == want, f"seed {seed}"
