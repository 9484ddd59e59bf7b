"""Differential property tests: random inputs, pure-Python models.

The reference ships no property/randomized tests (SURVEY.md SS5);
these harden the semantics the goldens pin. One Spark job per case
batch (hypothesis drives the generator seed; each example is a whole
batch of records so Spark startup cost amortizes).
"""

from __future__ import annotations

import base64
import json
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from machine_downtime_monitor_on_aws_spark.config import MachineConfig, MessageFormat
from machine_downtime_monitor_on_aws_spark.operators.classify import (
    classify_messages,
    machine_config_df,
    reportable_messages,
)
from machine_downtime_monitor_on_aws_spark.operators.normalize import normalize_stream
from machine_downtime_monitor_on_aws_spark.operators.rollover import rollover_total
from machine_downtime_monitor_on_aws_spark.operators.sessionize import sessionize

FMT = MessageFormat(timestamp_format="yyyy-MM-dd HH:mm:ss")


def _spark():
    # pytest fixture injection doesn't mix with @given: reuse the
    # process-wide session (same one the conftest fixture creates)
    from machine_downtime_monitor_on_aws_spark.session import get_spark

    return get_spark("tests")

MACHINES = ["plant/a/m1", "plant/a/m2", "plant/b/m3"]
TAGS = ["state", "count", "other"]
VALUES = ["run", "stop", "idle", "7", "true", "junk"]

CONFIGS = [
    MachineConfig(
        id="plant/a/m1",
        status_tag="state",
        production_count_tag="count",
        status_up_values="run, true",
        status_down_values="stop",
        status_idle_values="idle",
    ),
    MachineConfig(id="plant/a/m2", status_tag="state", status_up_values="run"),
    # m3 unconfigured
]


def model_classify(machine: str, tag: str, value: str):
    """Pure-Python twin of J1/P3/P4/P5 (machine-data-parser.ts:70-97,
    index.ts:61-76)."""
    cfg = {c.id: c for c in CONFIGS}.get(machine)
    if cfg is None:
        return None
    if cfg.production_count_tag and tag == cfg.production_count_tag:
        return ("PRODUCTION_COUNT", value)
    if cfg.status_tag and tag == cfg.status_tag:
        v = value.strip()
        if v in cfg.up_values:
            return ("STATUS", "UP")
        if v in cfg.down_values:
            return ("STATUS", "DOWN")
        if v in cfg.idle_values:
            return ("STATUS", "IDLE")
        return None  # unmapped status -> dropped
    return None


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_classify_matches_model(seed):
    spark = _spark()
    rng = random.Random(seed)
    records = []
    expected = []
    for i in range(60):
        machine = rng.choice(MACHINES)
        tag = rng.choice(TAGS)
        value = rng.choice(VALUES)
        msg = {
            "name": f"{machine}/{tag}",
            "quality": "GOOD",
            "timestamp": "2024-06-01 10:00:00",
            "value": value,
        }
        records.append(
            (str(i), base64.b64encode(json.dumps({"messages": [msg]}).encode()).decode())
        )
        m = model_classify(machine, tag, value)
        if m is not None:
            expected.append((machine, m[0], m[1] if m[0] == "STATUS" else value))

    df = spark.createDataFrame(records, "record_id string, data string")
    messages = normalize_stream(df, [FMT])
    classified = classify_messages(messages, machine_config_df(spark, CONFIGS))
    rep = reportable_messages(classified).collect()
    got = sorted(
        (r.machine_id, r.msg_type, r.status if r.msg_type == "STATUS" else r.value)
        for r in rep
    )
    assert got == sorted(expected)


def model_rollover(counts: list[int]) -> int:
    """MachineDetail.tsx:104-118 verbatim logic."""
    total, run_max = 0, None
    for c in counts:
        if run_max is None or c >= run_max:
            run_max = c
        else:  # decrease -> bank the session max, restart
            total += run_max
            run_max = c
    return total + (run_max or 0)


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_rollover_matches_model(seed):
    spark = _spark()
    rng = random.Random(seed)
    seqs = {
        f"m{k}": [rng.randint(0, 50) for _ in range(rng.randint(1, 40))]
        for k in range(5)
    }
    rows = [
        (m, i, c) for m, counts in seqs.items() for i, c in enumerate(counts)
    ]
    df = spark.createDataFrame(rows, "id string, seq long, cnt long")
    got = {
        r.id: r.total_production
        for r in rollover_total(df, ["id"], ["seq"], "cnt").collect()
    }
    assert got == {m: model_rollover(c) for m, c in seqs.items()}


def model_sessions(epochs: list[int], gap: int) -> list[int]:
    sid, out = 0, []
    for i, e in enumerate(epochs):
        if i > 0 and e - epochs[i - 1] > gap:
            sid += 1
        out.append(sid)
    return out


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_sessionize_matches_model(seed):
    spark = _spark()
    rng = random.Random(seed)
    epochs = sorted(rng.randint(0, 100_000) for _ in range(rng.randint(2, 60)))
    rows = [("u", i, e) for i, e in enumerate(epochs)]
    df = spark.createDataFrame(rows, "k string, seq long, ep long").selectExpr(
        "k", "seq", "timestamp_seconds(ep) AS ts"
    )
    out = sessionize(df, ["k"], "ts", 600, order_cols=["ts", "seq"])
    got = [r.session_id for r in out.orderBy("seq").collect()]
    assert got == model_sessions(epochs, 600)





@settings(max_examples=6, deadline=None)
@given(st.integers(0, 10**6))
def test_candidate_pairs_exact_matches_brute_force(seed):
    """candidate_pairs_exact (payload-carrying band join +
    first-matching-band filter) vs the pure-Python brute-force model:
    a pair qualifies iff it shares ANY band value, and must appear
    EXACTLY once. Random band vectors hit multi-band collisions and
    no-collision cases that the fixed corpora in test_dedup don't."""
    import random

    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        candidate_pairs_exact,
    )

    rng = random.Random(seed)
    n_docs = rng.randint(2, 30)
    num_bands = rng.choice([2, 4])
    # small value alphabet -> dense collisions, incl. multi-band
    rows = [
        (i, [f"h{rng.randint(0, 5)}" for _ in range(num_bands)])
        for i in range(n_docs)
    ]
    expected = set()
    for i, (a, ba) in enumerate(rows):
        for b, bb in rows[i + 1:]:
            if any(x == y for x, y in zip(ba, bb)):
                expected.add((a, b))
    spark = _spark()
    ba_df = spark.createDataFrame(rows, "doc_id long, __bands array<string>")
    got_rows = candidate_pairs_exact(ba_df, num_bands).collect()
    got = {(r.doc_a, r.doc_b) for r in got_rows}
    assert got == expected
    assert len(got_rows) == len(got)  # exactly-once


@settings(max_examples=12, deadline=None)
@given(st.integers(0, 10_000))
def test_connected_components_matches_union_find(seed):
    """connected_components vs a pure-Python union-find on random
    graphs (including chains/cliques/isolated pairs)."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        connected_components,
    )

    rng = random.Random(seed)
    n = rng.randint(2, 40)
    m = rng.randint(1, 60)
    edges = [
        tuple(sorted(rng.sample(range(n), 2))) for _ in range(m)
    ]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {x for e in edges for x in e}
    expected = {x: find(x) for x in touched}

    spark = _spark()
    pairs = spark.createDataFrame(edges, "doc_a int, doc_b int")
    # both strategies: driver-side union-find (default for sliver
    # graphs) AND the distributed propagation (forced via threshold=0)
    got_driver = {
        r.doc_id: r.component for r in connected_components(pairs).collect()
    }
    got_dist = {
        r.doc_id: r.component
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert got_driver == expected
    assert got_dist == expected


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 10_000))
def test_pack_sequences_matches_python_model(seed):
    """pack_sequences vs a pure-Python per-bucket cumsum model."""
    from machine_downtime_monitor_on_aws_spark.operators.sampling import (
        pack_sequences,
    )

    rng = random.Random(seed)
    n = rng.randint(1, 60)
    max_tokens = rng.choice([64, 128, 512])
    buckets = rng.choice([1, 2, 8])
    rows = [(i, rng.randint(1, 200)) for i in range(n)]

    spark = _spark()
    df = spark.createDataFrame(rows, "doc_id int, n_tokens int")
    out = pack_sequences(df, "doc_id", "n_tokens", max_tokens, buckets).collect()

    got_bucket = {r.doc_id: r.bucket for r in out}
    # model: group by the engine-reported bucket (bucket hashing is
    # oracle-verified elsewhere), order by id, cumsum -> pack
    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for doc_id, toks in rows:
        by_bucket.setdefault(got_bucket[doc_id], []).append((doc_id, toks))
    expected = {}
    for b, docs in by_bucket.items():
        cum = 0
        for doc_id, toks in sorted(docs):
            expected[doc_id] = (cum + toks, (cum) // max_tokens)
            cum += toks
    for r in out:
        assert (r.cum_tokens, r.pack_id) == expected[r.doc_id], r


@settings(max_examples=6, deadline=None)
@given(st.integers(0, 10_000))
def test_deterministic_sample_partition_independent(seed):
    """The kept set must be identical under different partition
    layouts (the property df.sample does NOT have)."""
    from machine_downtime_monitor_on_aws_spark.operators.sampling import (
        deterministic_sample,
    )

    rng = random.Random(seed)
    ids = rng.sample(range(100_000), 300)
    spark = _spark()
    df1 = spark.createDataFrame([(i,) for i in ids], "doc_id int")
    df2 = df1.repartition(17)
    df3 = df1.coalesce(1)
    kept = [
        {r.doc_id for r in deterministic_sample(d, "doc_id", 35).collect()}
        for d in (df1, df2, df3)
    ]
    assert kept[0] == kept[1] == kept[2]
    assert 0 < len(kept[0]) < 300


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 10_000))
def test_minhash_signatures_match_python_model(seed):
    """minhash_signatures vs the definitional pure-Python model:
    element k = min over word-5-gram shingles of md5('k:' || s)
    (docs shorter than one shingle fall back to the trimmed whole
    text). The estimator QA and banding both stand on this frame."""
    import hashlib

    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        minhash_signatures,
    )

    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = []
    for i in range(rng.randint(1, 12)):
        n_tok = rng.randint(0, 12)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n_tok))))

    def model_sig(text, num_perms=8, n=5):
        toks = text.split()
        if len(toks) >= n:
            sh = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        else:
            sh = [text.strip()]
        return tuple(
            min(hashlib.md5(f"{k}:{s}".encode()).hexdigest() for s in sh)
            for k in range(num_perms)
        )

    expected = {i: model_sig(t) for i, t in docs}
    spark = _spark()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: tuple(r["__sig"])
        for r in minhash_signatures(df, "doc_id", "text").collect()
    }
    assert got == expected


@settings(max_examples=12, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_update_components_matches_full_cc(seed):
    """Incremental CC maintenance (update_components) must equal a
    full connected_components rerun over (historical ∪ new) pairs for
    ANY random graph and ANY epoch split - the exactness claim the
    oracle-paired neardup_clusters_incremental stands on. The model
    is a pure-Python union-find with min-id labels."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        connected_components,
        update_components,
    )

    rng = random.Random(seed)
    n_nodes = rng.randint(2, 30)
    nodes = rng.sample(range(1000), n_nodes)
    n_edges = rng.randint(0, 40)
    edges = []
    for _ in range(n_edges):
        a, b = rng.sample(nodes, 2)
        edges.append((min(a, b), max(a, b)))
    cut = rng.randint(0, len(edges))
    hist, new = edges[:cut], edges[cut:]
    if not hist or not new:
        return  # degenerate split: nothing incremental to test

    # pure-Python union-find model over ALL edges
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {x: find(x) for x in parent}

    spark = _spark()
    hist_df = spark.createDataFrame(hist, "doc_a long, doc_b long")
    new_df = spark.createDataFrame(new, "doc_a long, doc_b long")
    labels = connected_components(hist_df)
    merged = update_components(labels, new_df)
    got = {r.doc_id: r.component for r in merged.collect()}
    assert got == expected
    # idempotence: folding the same epoch again changes nothing
    again = update_components(merged, new_df)
    assert {r.doc_id: r.component for r in again.collect()} == expected


def _md5_24bit(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:6], 16)


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_winnow_fingerprints_match_python_model(seed):
    """winnow_fingerprints vs the definitional model: min 24-bit
    md5 gram hash per sliding window of w consecutive k-grams,
    distinct per doc; docs shorter than one k-gram hash the trimmed
    whole text; shorter than w grams yield one whole-doc window."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        winnow_fingerprints,
    )

    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15))))
        for i in range(rng.randint(1, 10))
    ]

    def model(text, k=4, w=4):
        toks = text.split()
        grams = (
            [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
            if len(toks) >= k
            else [text.strip()]
        )
        hs = [_md5_24bit(g) for g in grams]
        if len(hs) >= w:
            return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}
        return {min(hs)}

    expected = {i: model(t) for i, t in docs}
    spark = _spark()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, "doc_id", "text").collect():
        got.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_cdc_chunks_match_python_model(seed):
    """cdc_chunks vs the definitional model: a boundary after token i
    when the 24-bit md5 of the bigram (t_i ' ' t_{i+1}) divides the
    modulus; chunks are the spans between boundaries, keyed by the
    md5 of their space-joined tokens."""
    import hashlib

    from machine_downtime_monitor_on_aws_spark.operators.sampling import (
        cdc_chunks,
    )

    rng = random.Random(seed)
    vocab = [f"v{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
        for i in range(rng.randint(1, 10))
    ]

    def model(text, mod=4):
        toks = text.split()
        if not toks:
            return []
        bpos = [
            i + 1
            for i in range(len(toks) - 1)
            if _md5_24bit(toks[i] + " " + toks[i + 1]) % mod == 0
        ]
        starts = [1] + [p + 1 for p in bpos]
        ends = bpos + [len(toks)]
        out = []
        for idx, (s, e) in enumerate(zip(starts, ends), start=1):
            chunk = toks[s - 1 : e]
            out.append(
                (idx, s, len(chunk),
                 hashlib.md5(" ".join(chunk).encode()).hexdigest())
            )
        return out

    expected = {i: model(t) for i, t in docs}
    spark = _spark()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in cdc_chunks(df, "doc_id", "text", boundary_mod=4).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start_token, r.n_tokens, r.chunk_md5)
        )
    got = {k: sorted(v) for k, v in got.items()}
    expected = {k: sorted(v) for k, v in expected.items() if v}
    assert got == expected


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    parts=st.integers(min_value=1, max_value=9),
)
def test_lloyd_partition_invariant_vs_model(seed, parts):
    """Property (r7): k-means training is bit-identical to the
    sequential Python model for ANY data/partitioning - the quantized
    integer re-center and struct-min argmin make every iteration
    associative and tie-stable, which is what the kmeans_assignments
    oracle relies on."""
    import math
    import random

    from machine_downtime_monitor_on_aws_spark.operators.kmeans import (
        first_k_init,
        lloyd_iterations,
    )

    spark = _spark()
    rng = random.Random(seed)
    dim, k, iters = 4, 3, 2
    n = rng.randint(12, 40)
    rows = [(i, [rng.uniform(-2, 2) for _ in range(dim)]) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, vec array<double>"
    ).repartition(parts)
    init = first_k_init(df, k)
    got = lloyd_iterations(df, init, dim, iters)

    cents = {kk: list(v) for kk, v in init.items()}
    Q = 1e9
    for _ in range(iters):
        buckets = {}
        for _i, v in rows:
            best = min(
                cents.items(),
                key=lambda kv: (
                    sum((a - b) * (a - b) for a, b in zip(v, kv[1])),
                    kv[0],
                ),
            )
            buckets.setdefault(best[0], []).append(v)
        new = {}
        for key, old in cents.items():
            vs = buckets.get(key)
            if not vs:
                new[key] = old
                continue
            new[key] = [
                float(sum(int(math.floor(v[p] * Q + 0.5)) for v in vs))
                / Q
                / float(len(vs))
                for p in range(dim)
            ]
        cents = new
    assert got == cents


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=8),
        min_size=2,
        max_size=18,
    ),
    st.sampled_from([0.25, 0.4, 0.5, 0.75, 0.9]),
)
@settings(max_examples=8, deadline=None)
def test_allpairs_join_is_lossless_and_exact(token_lists, threshold):
    """Prefix-filtered exact Jaccard == brute force on random corpora:
    the candidate generation may only over-admit (verification prunes
    it), never drop a qualifying pair - keys AND jaccard doubles."""
    import itertools

    from machine_downtime_monitor_on_aws_spark.operators.allpairs import (
        allpairs_jaccard_join,
    )

    spark = _spark()
    rows = [(i, " ".join(f"t{t}" for t in toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in allpairs_jaccard_join(df, "doc_id", "text", threshold, 2).collect()
    }

    def sset(text):
        toks = text.split()
        if len(toks) < 2:
            return {text.strip()}
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        sa, sb = sset(ta), sset(tb)
        inter = len(sa & sb)
        jac = float(inter) / float(len(sa) + len(sb) - inter)
        if jac >= threshold:
            want[(ia, ib)] = jac
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.integers(0, 10**6))
def test_incremental_spans_match_full_rerun_random(seed):
    """Property (r9): for random corpora with planted shared blocks
    and a random batch split, incremental_duplicated_spans over the
    persisted k-gram index == full duplicated_spans over
    (history ∪ batch) restricted to batch-touching pairs."""
    from machine_downtime_monitor_on_aws_spark.operators.spans import (
        duplicated_spans,
        incremental_duplicated_spans,
        write_kgram_index,
    )

    spark = _spark()
    rng = random.Random(seed)
    k = 6
    blocks = [
        " ".join(f"b{b}w{i}" for i in range(rng.randint(k, k + 8)))
        for b in range(3)
    ]
    docs = []
    for d in range(14):
        parts = [f"d{d}u{j}" for j in range(rng.randint(0, 4))]
        for b in range(3):
            if rng.random() < 0.4:
                parts.append(blocks[b])
        rng.shuffle(parts)
        docs.append((d, " ".join(parts)))
    batch_ids = {d for d, _ in docs if rng.random() < 0.4}
    if not batch_ids:
        batch_ids = {docs[0][0]}
    df = spark.createDataFrame(docs, "doc_id long, text string")
    hist = df.filter(~F_col_isin(df, batch_ids))
    batch = df.filter(F_col_isin(df, batch_ids))
    table = f"kgram_prop_{seed % 97}"
    try:
        write_kgram_index(hist, table, k=k, num_buckets=4)
        got = {
            tuple(r)
            for r in incremental_duplicated_spans(
                spark, batch, table, k
            ).collect()
        }
        want = {
            tuple(r)
            for r in duplicated_spans(df, "doc_id", "text", k).collect()
            if r.doc_a in batch_ids or r.doc_b in batch_ids
        }
        assert got == want
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def F_col_isin(df, ids):
    from pyspark.sql import functions as F

    return F.col("doc_id").isin(*[int(i) for i in ids])


@settings(max_examples=5, deadline=None)
@given(st.integers(0, 10**6))
def test_epoch_feed_purge_complement_random(seed):
    """Property (r9): _purge_epoch_feed removes EXACTLY the rows
    naming a purged id, untouched epoch partitions keep their files
    byte-for-byte, and emptied epochs disappear from the layout."""
    import glob
    import hashlib
    import os
    import shutil
    import tempfile

    from machine_downtime_monitor_on_aws_spark.streaming.dedup import (
        _purge_epoch_feed,
    )

    spark = _spark()
    rng = random.Random(seed)
    rows = []
    for e in range(4):
        for _ in range(rng.randint(0, 6)):
            a, b = sorted(rng.sample(range(12), 2))
            rows.append((a, b, f"ep-{e}"))
    if not rows:
        rows = [(0, 1, "ep-0")]
    purged = set(rng.sample(range(12), rng.randint(1, 3)))
    root = tempfile.mkdtemp(prefix="feedpurge_")
    path = os.path.join(root, "pairs")
    try:
        spark.createDataFrame(
            rows, "doc_a long, doc_b long, __epoch_id string"
        ).write.partitionBy("__epoch_id").parquet(path)

        def digests():
            out = {}
            for p in glob.glob(f"{path}/__epoch_id=*/*.parquet"):
                out[p] = hashlib.md5(open(p, "rb").read()).hexdigest()
            return out

        before = digests()
        ids = spark.createDataFrame([(i,) for i in sorted(purged)], "doc_id long")
        n = _purge_epoch_feed(spark, path, ids, ("doc_a", "doc_b"))
        survivors = sorted(
            (r["doc_a"], r["doc_b"], r["__epoch_id"])
            for r in spark.read.parquet(path).collect()
        ) if glob.glob(f"{path}/__epoch_id=*") else []
        want = sorted(
            (a, b, e) for a, b, e in rows if a not in purged and b not in purged
        )
        assert survivors == want  # multiset: duplicates preserved
        assert n == len(rows) - len(want)
        # untouched epochs (no purged id anywhere) byte-identical
        hit_epochs = {
            e for a, b, e in rows if a in purged or b in purged
        }
        after = digests()
        for p, d in before.items():
            ep = p.split("__epoch_id=")[1].split("/")[0]
            if ep not in hit_epochs:
                assert after.get(p) == d, f"untouched {p} rewritten"
        # emptied epochs are gone from the directory layout
        surviving_eps = {e for _, _, e in want}
        on_disk = {
            os.path.basename(d).split("=", 1)[1]
            for d in glob.glob(f"{path}/__epoch_id=*")
        }
        assert on_disk == surviving_eps or (not want and not on_disk)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _py_bpe_occurrences(texts: list[str], n_merges: int) -> list[dict]:
    """Pure-Python occurrence-counting BPE: symbol lists per word
    OCCURRENCE (chars + '</w>'), adjacent-pair counts with
    multiplicity, argmax (count desc, 'left right' string asc),
    greedy left-to-right non-overlapping merge application. The
    trainer counts over the word-frequency table; this model proves
    that weighting is invisible in the output."""
    words = []
    for t in texts:
        for w in t.split():
            words.append(list(w) + ["</w>"])
    out = []
    for it in range(1, n_merges + 1):
        counts: dict[str, int] = {}
        for s in words:
            for a, b in zip(s, s[1:]):
                counts[f"{a} {b}"] = counts.get(f"{a} {b}", 0) + 1
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        left, right = pair.split(" ", 1)
        merged = left + right
        out.append(
            {
                "iteration": it,
                "pair": pair,
                "merged": merged,
                "pair_count": counts[pair],
            }
        )
        nxt = []
        for s in words:
            o, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    o.append(merged)
                    i += 2
                else:
                    o.append(s[i])
                    i += 1
            nxt.append(o)
        words = nxt
    return out


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_bpe_train_matches_occurrence_model(seed):
    """Random tiny-alphabet corpora (dense pair collisions, merge
    cascades, repeated words) vs the occurrence model: merges, tie
    breaks, and counts must match exactly."""
    from machine_downtime_monitor_on_aws_spark.operators.bpe import (
        bpe_train_merges,
    )

    spark = _spark()
    rng = random.Random(seed)
    texts = [
        " ".join(
            "".join(rng.choice("ab") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 8))
        )
        for _ in range(12)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_train_merges(df, "text", 4)
    assert got == _py_bpe_occurrences(texts, 4)


def model_rle_runs(seq: list[tuple[int, str]]) -> list[tuple[int, str, int]]:
    """create-quicksight.ts:12-49 semantics per key: change points
    (first row or value differs from predecessor), duration = next
    change point's epoch - this one, open final run dropped."""
    cps = [
        (ep, v)
        for i, (ep, v) in enumerate(seq)
        if i == 0 or v != seq[i - 1][1]
    ]
    return [
        (cps[i][0], cps[i][1], cps[i + 1][0] - cps[i][0])
        for i in range(len(cps) - 1)
    ]


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_rle_runs_match_model(seed):
    """Randomized streams (few distinct values -> long and 1-row runs,
    strictly increasing epochs per key) against a direct Python model
    of the reference's Athena RLE."""
    from machine_downtime_monitor_on_aws_spark.operators.rle import (
        run_durations,
    )

    spark = _spark()
    rng = random.Random(seed)
    streams: dict[str, list[tuple[int, str]]] = {}
    for k in range(6):
        ep, seq = 0, []
        for _ in range(rng.randint(1, 50)):
            ep += rng.randint(1, 900)
            seq.append((ep, rng.choice(["UP", "DOWN", "IDLE"])))
        streams[f"m{k}"] = seq
    rows = [
        (m, i, ep, v)
        for m, seq in streams.items()
        for i, (ep, v) in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "id string, seq long, ep long, status string"
    ).selectExpr("id", "seq", "timestamp_seconds(ep) AS ts", "status")
    out = run_durations(df, ["id"], ["ts", "seq"], "status", "ts")
    got: dict[str, list[tuple[int, str, int]]] = {}
    for r in out.orderBy("id", "ts").collect():
        got.setdefault(r.id, []).append(
            (int(r.ts.timestamp()), r.status, int(r.duration_seconds))
        )
    want = {m: model_rle_runs(seq) for m, seq in streams.items()}
    assert got == {m: v for m, v in want.items() if v}


def model_minute_rollup(
    readings: list[tuple[int, int, str]],
) -> dict[int, str]:
    """machine-detail.ts:31-45 per minute: latest reading wins unless
    any DOWN occurred in the minute. readings = (epoch, seq, status);
    latest = max by (epoch, seq) - the reference's stable sort keeps
    input order among equal timestamps."""
    by_minute: dict[int, list[tuple[int, int, str]]] = {}
    for ep, i, s in readings:
        by_minute.setdefault(ep // 60, []).append((ep, i, s))
    out = {}
    for m, rs in by_minute.items():
        if any(s == "DOWN" for _, _, s in rs):
            out[m] = "DOWN"
        else:
            out[m] = max(rs)[2]
    return out


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_minute_rollup_matches_model(seed):
    """Randomized readings with duplicate timestamps (tie-broken by a
    sequence column) against the DOWN-dominant latest-status model."""
    from machine_downtime_monitor_on_aws_spark.operators.minute_rollup import (
        minute_status_rollup,
    )

    spark = _spark()
    rng = random.Random(seed)
    per_id: dict[str, list[tuple[int, int, str]]] = {}
    for k in range(4):
        readings = []
        for i in range(rng.randint(1, 60)):
            # duplicate epochs on purpose: seq breaks the tie
            ep = rng.randint(0, 600)
            readings.append((ep, i, rng.choice(["UP", "DOWN", "IDLE"])))
        per_id[f"m{k}"] = readings
    rows = [
        (m, i, ep, s) for m, rs in per_id.items() for ep, i, s in rs
    ]
    df = spark.createDataFrame(
        rows, "id string, seq long, ep long, status string"
    ).selectExpr("id", "seq", "timestamp_seconds(ep) AS ts", "status")
    out = minute_status_rollup(df, order_col="seq")
    got = {
        (r.id, int(r.minute_start.timestamp()) // 60): r.status
        for r in out.collect()
    }
    want = {
        (m, minute): s
        for m, rs in per_id.items()
        for minute, s in model_minute_rollup(rs).items()
    }
    assert got == want


def model_asof_backward(lefts, rights, strict):
    """Per key: latest right value with rts < lts (strict) or <=
    (non-strict); among equal rts the greatest tiebreak wins (the
    window orders by (ts, side, tiebreak) and last-in-frame wins)."""
    out = {}
    for lts, lid in lefts:
        cand = [
            (rts, rid, v)
            for rts, rid, v in rights
            if (rts < lts if strict else rts <= lts)
        ]
        out[lid] = max(cand)[2] if cand else None
    return out


@settings(max_examples=4, deadline=None)
@given(st.integers(min_value=0, max_value=10**6), st.booleans())
def test_asof_join_backward_matches_model(seed, strict):
    """Randomized as-of joins with DELIBERATE timestamp collisions
    (left-left, right-right, and left-right at the same instant) pin
    the strict/non-strict tie semantics and the tiebreak order."""
    from machine_downtime_monitor_on_aws_spark.operators.asof import (
        asof_join_backward,
    )

    spark = _spark()
    rng = random.Random(seed)
    keys = [f"k{i}" for i in range(4)]
    lrows, rrows, lid = [], [], 0
    per_key = {}
    for k in keys:
        lefts, rights = [], []
        for _ in range(rng.randint(1, 15)):
            lefts.append((rng.randint(0, 40), lid))
            lid += 1
        for rid in range(rng.randint(0, 15)):
            rights.append((rng.randint(0, 40), rid, float(rng.randint(0, 99))))
        per_key[k] = (lefts, rights)
        lrows += [(k, ts, i) for ts, i in lefts]
        rrows += [(k, ts, rid, v) for ts, rid, v in rights]
    left = spark.createDataFrame(
        lrows, "k string, ep long, lid long"
    ).selectExpr("k", "timestamp_seconds(ep) AS ts", "lid")
    right = spark.createDataFrame(
        rrows, "k string, ep long, rid long, val double"
    ).selectExpr("k", "timestamp_seconds(ep) AS ts", "rid", "val")
    out = asof_join_backward(
        left, right, ["k"], "ts", ["val"], strict=strict, tiebreak_col="rid"
    )
    got = {r.lid: r.asof_val for r in out.collect()}
    want = {}
    for k, (lefts, rights) in per_key.items():
        want.update(model_asof_backward(lefts, rights, strict))
    assert got == want


def model_range_join(probes, builds, w):
    """All (probe_id, build_epoch) pairs with |b - p| <= w, same key."""
    out = []
    for k, pe, pid in probes:
        for bk, be in builds:
            if bk == k and abs(be - pe) <= w:
                out.append((pid, be))
    return sorted(out)


@settings(max_examples=4, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_range_join_matches_model(seed):
    """Randomized interval joins, INCLUDING negative (pre-1970)
    epochs: the bucket quantization must be floor-consistent on both
    sides or boundary pairs silently vanish."""
    from machine_downtime_monitor_on_aws_spark.operators.range_join import (
        range_join_window,
    )

    spark = _spark()
    rng = random.Random(seed)
    W = 10
    keys = ["a", "b"]
    probes = [
        (rng.choice(keys), rng.randint(-120, 120), i) for i in range(40)
    ]
    builds = [(rng.choice(keys), rng.randint(-120, 120)) for _ in range(40)]
    p = spark.createDataFrame(
        probes, "k string, ep long, pid long"
    ).selectExpr("k", "timestamp_seconds(ep) AS ts", "pid")
    b = spark.createDataFrame(
        builds, "k string, ep long"
    ).selectExpr("k", "timestamp_seconds(ep) AS bts")
    out = range_join_window(p, b, ["k"], "ts", "bts", W)
    got = sorted((r.pid, r.matched_epoch) for r in out.collect())
    assert got == model_range_join(probes, builds, W)


@settings(max_examples=4, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_latest_and_changed_rows_match_model(seed):
    """latest_by_key is an order-insensitive argmax by (ts, seq);
    changed_rows emits exactly new keys and null-safe value changes -
    a prior row holding NULL must not re-emit an unchanged NULL, and
    a transition TO NULL must emit."""
    from machine_downtime_monitor_on_aws_spark.operators.latest import (
        changed_rows,
        latest_by_key,
    )

    spark = _spark()
    rng = random.Random(seed)
    vals = ["UP", "DOWN", "IDLE", None]
    rows = [
        (f"m{rng.randrange(6)}", i, rng.randint(0, 20), rng.choice(vals))
        for i in range(rng.randint(5, 60))
    ]
    rng.shuffle(rows)  # order-insensitivity: input order is arbitrary
    df = spark.createDataFrame(
        rows, "id string, seq long, ep long, status string"
    ).selectExpr("id", "seq", "timestamp_seconds(ep) AS ts", "status")

    latest = latest_by_key(df, ["id"], "ts", ["status"], order_col="seq")
    got_latest = {r.id: r.status for r in latest.collect()}
    want_latest = {}
    for m, i, ep, s in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        want_latest[m] = s
    assert got_latest == want_latest

    prior_rows = [
        (f"m{k}", rng.choice(vals)) for k in range(4)  # m4/m5 are new
    ]
    prior = spark.createDataFrame(prior_rows, "id string, status string")
    got_changed = {
        r.id: r.status
        for r in changed_rows(latest, prior, ["id"], "status").collect()
    }
    prior_map = dict(prior_rows)
    want_changed = {
        m: s
        for m, s in want_latest.items()
        if m not in prior_map or prior_map[m] != s
    }
    assert got_changed == want_changed
