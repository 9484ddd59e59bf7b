"""Full-batch perceptron over hashed bag-of-words features - the
TRAINED linear text classifier beside operators/nbayes.py's
counts-based one (the fastText-linear-model role: learn which tokens
predict a label, distributively).

Why a perceptron and not logistic regression: the whole computation
is INTEGER arithmetic - token counts are integers, weights start at 0
and every update adds an integer gradient, margins are integer dot
products - so training is bit-exact across engines and partitionings
with no quantization scheme at all, and a DuckDB oracle replays the
entire unrolled training loop (the kmeans_assignments discipline).
Logistic regression's sigmoid needs exp(), a libm call with no
cross-engine ulp guarantee, which would break the repo's exactness
contract; the perceptron is the classically-equivalent linear
separator that never leaves +,*,compare.

The variant is full-batch (gradient = sum of y*x over ALL currently
misclassified examples, margin <= 0 counts as misclassified) rather
than the sequential one-example-at-a-time original: the sequential
walk is inherently serial, while the batch step is one
map-side-combining aggregation per iteration - the distributed
shape. Convergence honesty: the batch rule provably separates
separable data (each update has positive inner product with any
separator), and tests/test_perceptron.py pins a disjoint-vocabulary
fixture converging to zero misclassified in one step; on
NON-separable data the unit-step batch update oscillates rather
than settles (measured on the synthetic corpus: the en-vs-rest task
alternates between two weight states) - callers pick a fixed
n_iters and treat the output as the exact deterministic result of
that many steps, which is what the oracle replays.

Feature hashing (md5 24-bit -> dim buckets, the sketch-operator hash
family) keeps the weight vector a fixed ``dim`` integers however
large the vocabulary, so weights ride the plan as a literal array
and only dim values cross to the driver per iteration (the kmeans
centroid-collect pattern; never a corpus-sized collect).

Scale shape per iteration: one keyed aggregation over feature rows
computes per-doc margins (skinny (doc, bucket, x) rows), one keyed
join tags the misclassified docs, one map-side-combining aggregation
sums the gradient to dim rows. Overflow headroom: |w_b| after T
iterations is bounded by T * total_token_count; margins by
max_doc_len * max|w| - at 100 TB (~1e13 tokens) that can exceed
int64 after few iterations, so callers at that scale shard training
to a corpus sample (the standard practice) or rescale; the bound is
documented, not hidden.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sketch import _md5_24bit


def hashed_token_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int,
    salt: str = "pcep",
    bias: bool = False,
) -> DataFrame:
    """(id, bucket, x): integer token counts feature-hashed into
    ``dim`` buckets. With ``bias=True`` every document additionally
    gets the constant feature (bucket = ``dim``, x = 1) - the
    intercept a bag-of-counts linear model needs to represent any
    threshold (all counts are non-negative, so without it w.x can
    never separate "total above K" tasks); weight vectors are then
    ``dim + 1`` long. Documents with no tokens produce no token
    rows (the bias row still appears when enabled) - downstream
    joins left-join and treat a missing margin as 0 (both
    :func:`perceptron_predict` and the oracle do)."""
    from ..functions.text import tokens

    if not (0 < dim <= 1 << 24):
        raise ValueError(f"dim must be in 1..2^24, got {dim}")
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    feats = (
        tok.select("id", (_md5_24bit(F.col("tok"), salt) % dim).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    if bias:
        feats = feats.unionByName(
            df.select(
                F.col(id_col).alias("id"),
                F.lit(dim).cast("long").alias("bucket"),
                F.lit(1).cast("long").alias("x"),
            )
        )
    return feats


def _w_lit(weights: list[int]) -> Column:
    return F.lit(weights).cast("array<long>")


def _scores(feats: DataFrame, labels: DataFrame, weights: list[int]) -> DataFrame:
    """(id, y, score): integer score w . x per document, 0 for
    documents with no feature rows."""
    m = feats.groupBy("id").agg(
        F.sum(
            F.col("x") * F.element_at(_w_lit(weights), F.col("bucket").cast("int") + 1)
        ).alias("wx")
    )
    return labels.join(m, "id", "left").select(
        "id", "y", F.coalesce(F.col("wx"), F.lit(0).cast("long")).alias("score")
    )


def perceptron_train(
    feats: DataFrame,
    labels: DataFrame,
    dim: int,
    n_iters: int,
) -> list[int]:
    """Train ``n_iters`` full-batch steps from w = 0. ``labels`` is
    (id, y) with y in {+1, -1}. Returns the final weight vector as
    ``dim`` Python ints (driver-held, like k-means centroids - the
    model is dim values, never corpus-sized). Pass
    ``dim + 1`` when the features carry the bias bucket.

    Iteration: margin_t(doc) = y * (w_t . x); every doc with
    margin <= 0 (ties count - the classical update rule, and w_0 = 0
    makes every first-round margin exactly 0) contributes y*x to the
    gradient; w_{t+1} = w_t + gradient. All integer adds/multiplies:
    re-runs and repartitionings are bit-identical, and the DuckDB
    oracle unrolls the same chain CTE-for-CTE."""
    w = [0] * dim
    for _ in range(n_iters):
        mar = _scores(feats, labels, w)
        mis = mar.filter(F.col("y") * F.col("score") <= 0).select("id", "y")
        grad = (
            feats.join(mis, "id")
            .groupBy("bucket")
            .agg(F.sum(F.col("y") * F.col("x")).alias("g"))
            .collect()
        )
        for row in grad:
            w[row.bucket] += row.g
    return w


def perceptron_predict(
    feats: DataFrame, labels: DataFrame, weights: list[int]
) -> DataFrame:
    """(id, y, score, margin, pred): score = w . x (0 when the doc
    has no feature rows), margin = y * score, pred = the predicted
    class as score > 0 (score 0 - e.g. an empty doc with no bias
    feature - lands in the negative class, mirrored by the oracle's
    COALESCE)."""
    return _scores(feats, labels, weights).select(
        "id",
        "y",
        "score",
        (F.col("y") * F.col("score")).alias("margin"),
        (F.col("score") > 0).alias("pred"),
    )


def weights_digest(weights: list[int]) -> str:
    """md5 over the canonical int rendering - the model is dim+1
    Python ints, so the digest is exact (no float-hex dance)."""
    import hashlib

    return hashlib.md5(
        ",".join(str(int(w)) for w in weights).encode("utf-8")
    ).hexdigest()


def save_weights(spark, path: str, weights: list[int], meta: dict) -> None:
    """Persist a trained weight vector (the perceptron sibling of the
    k-means centroid store). The whole model is dim+1 INTEGERS, so it
    lives in ONE atomic JSON control file - ints round-trip JSON
    exactly, and the rename-based publish means there is no
    torn-commit window at all (the multi-file stores' params-last
    discipline collapses to a single write). Overwrite-safe: the old
    record is un-committed first so the atomic publish (which never
    clobbers) can land."""
    import json as _json

    from .. import fsio

    if not weights:
        raise ValueError("weights must be non-empty")
    fsio.mkdirs(spark, path)
    fsio.delete(spark, f"{path}/params.json", recursive=False)
    fsio.write_text_atomic(
        spark,
        f"{path}/params.json",
        _json.dumps(
            {
                "layout": "perceptron_weights",
                "dim": len(weights),
                "weights": [int(w) for w in weights],
                "weights_md5": weights_digest(weights),
                **meta,
            },
            sort_keys=True,
        ),
    )


def load_weights(
    spark, path: str, expect_digest: str | None = None
) -> tuple[list[int], dict]:
    """(weights, stamped params). The digest re-verifies against the
    loaded ints - a tampered/torn store fails loudly instead of
    scoring against a drifted model; ``expect_digest`` pins the exact
    model a caller was built against."""
    import json as _json

    from .. import fsio

    rec = f"{path}/params.json"
    if not fsio.exists(spark, rec):
        raise ValueError(f"no committed perceptron store at {path}")
    try:
        params = _json.loads(fsio.read_text(spark, rec))
    except ValueError as e:
        raise ValueError(
            f"unreadable perceptron store record at {rec}: {e}"
        ) from e
    w = [int(x) for x in params["weights"]]
    got = weights_digest(w)
    if got != params.get("weights_md5"):
        raise ValueError(
            f"perceptron store digest mismatch at {path}: "
            f"recorded {params.get('weights_md5')}, loaded {got}"
        )
    if expect_digest is not None and got != expect_digest:
        raise ValueError(
            f"perceptron store at {path} is not the pinned model: "
            f"expected {expect_digest}, got {got}"
        )
    return w, params
