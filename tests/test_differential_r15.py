"""Round-15 differential sweep: randomized first-principles Python
models for the round's new operators - signq (threshold fit, bit
packing, Hamming, shortlist-then-rerank vs definitional brute force),
Kneser-Ney trigram scoring (counts + interpolation re-derived from
scratch), and shard assignment (md5 arithmetic + permutation law).
The catalog oracles re-express each algorithm relationally; these
models re-derive the DEFINITIONS, so a shared algorithmic mistake in
operator+oracle cannot hide."""

from __future__ import annotations

import hashlib
import random
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.operators.kneser_ney import (
    D as KN_D,
)
from machine_downtime_monitor_on_aws_spark.operators.kneser_ney import (
    kn_trigram_doc_scores,
)
from machine_downtime_monitor_on_aws_spark.operators.shards import (
    assign_training_shards,
)
from machine_downtime_monitor_on_aws_spark.operators.signq import (
    signq_fit_thresholds,
    signq_topk_rerank,
)


def test_signq_randomized_rerank_vs_brute_force(spark):
    """Random corpora, full-corpus shortlist: the packed-code path's
    final ranking must equal a definitional Python brute force
    (exact squared L2, ties to smaller id) - bit packing and Hamming
    cannot corrupt the re-rank when nothing is dropped. Three seeds,
    mixed scales/offsets so thresholds are non-trivial."""
    for seed in (7, 23, 51):
        rng = random.Random(seed)
        dim = rng.choice([8, 16, 64])
        n = rng.randint(10, 24)
        rows = [
            [rng.uniform(-5, 5) * (1 + (j % 3)) for j in range(dim)]
            for _ in range(n)
        ]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(rows)],
            "vec_id long, vec array<double>",
        )
        thr = signq_fit_thresholds(df, dim)
        k = 4
        q = df.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("qid"), F.col("vec").alias("qv")
        )
        got = {
            (r["qid"], r["rnk"]): r["neighbor_id"]
            for r in signq_topk_rerank(q, df, thr, k, n).collect()
        }
        for qid in range(3):
            dists = sorted(
                (sum((a - b) ** 2 for a, b in zip(rows[qid], rows[i])), i)
                for i in range(n)
                if i != qid
            )
            for rnk, (_, nid) in enumerate(dists[:k], start=1):
                assert got[(qid, rnk)] == nid, (seed, qid, rnk)


def _kn_model(docs: dict[int, list[str]]):
    """Interpolated-KN from the definitions, same IEEE step order."""
    tri = [
        (i, t[j], t[j + 1], t[j + 2])
        for i, t in docs.items()
        for j in range(len(t) - 2)
    ]
    c3 = Counter((a, b, c) for _, a, b, c in tri)
    c2 = Counter((a, b) for _, a, b, _ in tri)
    nf, nfol2 = defaultdict(set), defaultdict(set)
    tt = set((a, b, c) for _, a, b, c in tri)
    for _, a, b, c in tri:
        nf[(a, b)].add(c)
    for a, b, c in tt:
        nfol2[b].add(c)
    n1mid = Counter((b, c) for a, b, c in tt)
    nctx = Counter(b for a, b, c in tt)
    bt = set((b, c) for a, b, c in tt)
    n1uni = Counter(c for b, c in bt)
    out = {}
    for i in docs:
        ps = []
        for d_, a, b, c in tri:
            if d_ != i:
                continue
            p1 = float(n1uni[c]) / float(len(bt))
            p2 = (float(n1mid[(b, c)]) - KN_D) / float(nctx[b]) + KN_D * float(
                len(nfol2[b])
            ) / float(nctx[b]) * p1
            ps.append(
                (float(c3[(a, b, c)]) - KN_D) / float(c2[(a, b)])
                + KN_D * float(len(nf[(a, b)])) / float(c2[(a, b)]) * p2
            )
        if ps:
            qsum = sum(int((p * 1e9 + 0.5) // 1) for p in ps)
            out[i] = (len(ps), float(qsum) / 1e9 / float(len(ps)), min(ps))
    return out


def test_kn_randomized_vs_model(spark):
    """Random small-vocab corpora (dense trigram repeats) score
    bit-identically to the definitional Python model - two seeds,
    with degenerate docs (empty, 1- and 2-token) mixed in."""
    for seed in (3, 17):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(6)]
        docs = {
            i: [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
            for i in range(12)
        }
        df = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in docs.items() if t],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (
                r["n_trigrams"],
                r["mean_kn_prob"],
                r["min_kn_prob"],
            )
            for r in kn_trigram_doc_scores(
                df, F.split(F.col("text"), " ")
            ).collect()
        }
        assert got == _kn_model(docs), seed


def test_shards_randomized_permutation_law(spark):
    """Random key sets: the manifest is a permutation (every key
    exactly once; per-shard positions contiguous from 1), the md5
    arithmetic matches hashlib, and merging the per-shard orders by
    (order_key, key) reconstructs one total order with no collisions
    lost - across shard counts that divide the 10000-bucket range
    unevenly vs evenly."""
    rng = random.Random(41)
    keys = rng.sample(range(100000), 80)
    df = spark.createDataFrame([(k,) for k in keys], "seq_id long")
    for n_shards in (2, 5, 8):
        rows = assign_training_shards(df, ["seq_id"], n_shards).collect()
        assert sorted(r["seq_id"] for r in rows) == sorted(keys)
        per = defaultdict(list)
        for r in rows:
            h = hashlib.md5(f"shard:{r['seq_id']}".encode()).hexdigest()
            assert r["shard"] == int(h[:6], 16) % 10000 % n_shards
            assert (
                r["order_key"]
                == hashlib.md5(f"order:{r['seq_id']}".encode()).hexdigest()
            )
            per[r["shard"]].append(r)
        for members in per.values():
            members.sort(key=lambda r: r["position"])
            assert [m["position"] for m in members] == list(
                range(1, len(members) + 1)
            )
            ks = [(m["order_key"], m["seq_id"]) for m in members]
            assert ks == sorted(ks)


def test_decontam_gram_partition_law_randomized(spark):
    """The streaming loop's correctness rests on one algebraic law:
    splitting the benchmark into arbitrary ordered batches partitions
    its gram set (each gram lands in exactly the first batch
    contributing it), so summed per-doc deltas equal the batch
    overlap against the accumulated benchmark. Random corpora, random
    batch splits - checked with the loop's own pure building blocks
    (benchmark_gram_deltas) against a definitional Python model, no
    stream machinery."""
    from machine_downtime_monitor_on_aws_spark.streaming.decontam import (
        benchmark_gram_deltas,
    )

    n = 3
    for seed in (5, 29):
        rng = random.Random(seed)
        vocab = [f"t{i}" for i in range(8)]
        corpus = {
            i: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 15)))
            for i in range(10)
        }
        bench = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12)))
            for _ in range(9)
        ]
        cuts = sorted(rng.sample(range(1, len(bench)), 2))
        batches = [
            bench[: cuts[0]],
            bench[cuts[0] : cuts[1]],
            bench[cuts[1] :],
        ]

        def grams(text):
            toks = text.split(" ")
            if len(toks) < n:
                return {" ".join(toks)}
            return {
                " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
            }

        # Spark side: fold batches through benchmark_gram_deltas with
        # an accumulating seen set (what the loop's left-anti does)
        seen = spark.createDataFrame([], "g string")
        spark_epochs = []
        for batch in batches:
            bdf = spark.createDataFrame(
                [(t,) for t in batch], "text string"
            )
            new = benchmark_gram_deltas(bdf, seen, n)
            got = {r["g"] for r in new.collect()}
            spark_epochs.append(got)
            seen = seen.union(new.select("g")).distinct()

        # model: first-batch attribution partitions the gram union
        model_seen: set = set()
        for ep, batch in enumerate(batches):
            bg = set().union(*(grams(t) for t in batch)) if batch else set()
            expect = bg - model_seen
            assert spark_epochs[ep] == expect, (seed, ep)
            model_seen |= expect
        assert (
            set().union(*spark_epochs) == model_seen
        )  # partition covers the union
        assert sum(len(e) for e in spark_epochs) == len(model_seen)  # disjoint

        # delta-sum law: per-doc overlap sums across epochs to the
        # batch overlap against the full benchmark
        for doc_id, text in corpus.items():
            dg = grams(text)
            assert sum(len(dg & e) for e in spark_epochs) == len(
                dg & model_seen
            ), (seed, doc_id)
