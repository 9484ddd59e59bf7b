"""Multinomial Naive Bayes text classification - the counts-based
domain/source classifier role a training-data pipeline fills with
fastText-style models (CCNet's domain filter, The Pile's source
attribution): train per-label token statistics on a labeled corpus,
then attribute unlabeled text to the most probable label.

Determinism / oracle story (the repo's bit-exactness contract): NB
scoring is classically done in log space, but libm ``log`` differs
across engines, so the score here never leaves rational arithmetic.
Each per-token likelihood is one double division of integer counts
(add-one smoothing: ``(c + 1) / (n_tokens_label + V)``), and the
per-document product runs as an explicit left fold over token
POSITIONS with a mantissa/exponent accumulator: multiply, and when
the mantissa drops below ``RESCALE_AT`` multiply it back up by
``RESCALE_BY`` and count the rescale. Every operation is a
correctly-rounded IEEE multiply/compare, so DuckDB's
``list_reduce`` replays the fold bit-for-bit and the argmax
(fewest rescales, then largest mantissa, then label asc) is exact
on both engines. The mantissa can never denormalize: likelihoods
are >= 1/(n_tokens + V), so one multiply moves it at most ~15
orders of magnitude below the 1e-150 rescale floor - far above the
~1e-308 denormal cliff where IEEE multiplication starts losing
bits.

Scale shape: training is two map-side-combining count aggregations
over (label, token) rows. Scoring fans each token row out to the L
labels via a BROADCAST of the L-row label table, joins the
(label, token) count table (broadcast below
``spark.sql.autoBroadcastJoinThreshold``, keyed shuffle above), and
regroups per (doc, label) - one exchange of token-sized skinny
rows, the BM25-postings shape. The final per-doc argmax is a
``min(struct)`` over N*L rows (a SortAggregate - struct buffers are
outside HashAggregate's mutable-primitive support - but the sorted
set is L rows per doc, not the token fan-out)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

# Rescale the running product when the mantissa drops below this;
# both constants are exact powers of ten whose double multiplies
# round identically everywhere.
RESCALE_AT = 1e-150
RESCALE_BY = 1e150


def product_fold(probs: Column, init_m: Column) -> Column:
    """The mantissa/exponent product: fold ``probs`` (array<double>,
    each in (0, 1]) left-to-right starting from mantissa ``init_m``,
    returning struct(m, e) with the true product equal to
    ``m * RESCALE_AT**e``. Exactly mirrorable by a DuckDB
    ``list_reduce`` with the same CASE body."""
    init = F.struct(init_m.alias("m"), F.lit(0).cast("int").alias("e"))

    def step(acc: Column, x: Column) -> Column:
        nxt = acc["m"] * x
        return F.when(
            nxt < F.lit(RESCALE_AT),
            F.struct(
                (nxt * F.lit(RESCALE_BY)).alias("m"),
                (acc["e"] + F.lit(1)).cast("int").alias("e"),
            ),
        ).otherwise(F.struct(nxt.alias("m"), acc["e"].alias("e")))

    return F.aggregate(probs, init, step)


def signed_product_fold(ratios: Column, init_m: Column) -> Column:
    """:func:`product_fold`'s two-sided sibling for factors that can
    exceed 1 (likelihood RATIOS - the DSIR importance weight): the
    running product rescales down past ``RESCALE_BY`` and up past
    ``RESCALE_AT``, and the signed exponent makes the true value
    ``m * RESCALE_BY**e``. Ordering across rows is (e desc, m desc).
    Factors are assumed within ~1e-15..1e15 of 1 (count ratios are),
    so one multiply can never jump past a rescale band into
    infinity or denormal territory."""
    init = F.struct(init_m.alias("m"), F.lit(0).cast("int").alias("e"))

    def step(acc: Column, x: Column) -> Column:
        nxt = acc["m"] * x
        return (
            F.when(
                nxt < F.lit(RESCALE_AT),
                F.struct(
                    (nxt * F.lit(RESCALE_BY)).alias("m"),
                    (acc["e"] - F.lit(1)).cast("int").alias("e"),
                ),
            )
            .when(
                nxt > F.lit(RESCALE_BY),
                F.struct(
                    (nxt * F.lit(RESCALE_AT)).alias("m"),
                    (acc["e"] + F.lit(1)).cast("int").alias("e"),
                ),
            )
            .otherwise(F.struct(nxt.alias("m"), acc["e"].alias("e")))
        )

    return F.aggregate(ratios, init, step)


def nb_train(
    docs: DataFrame, label_col: str, text_col: str
) -> tuple[DataFrame, DataFrame, int, int]:
    """Train statistics: (label_stats(label, n_docs, n_tokens),
    token_counts(label, tok, c), vocab_size, n_docs_total). The two
    scalars cross to the driver (model metadata, the kmeans/BPE
    discipline); the count tables stay distributed."""
    tok_rows = docs.select(
        F.col(label_col).alias("label"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    token_counts = tok_rows.groupBy("label", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    label_tok = tok_rows.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    label_docs = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    label_stats = label_docs.join(label_tok, "label", "left").select(
        "label", "n_docs", F.coalesce("n_tokens", F.lit(0)).alias("n_tokens")
    )
    vocab_size = int(
        tok_rows.agg(F.countDistinct("tok").alias("v")).collect()[0].v
    )
    n_docs_total = docs.count()
    return label_stats, token_counts, vocab_size, n_docs_total


def nb_classify(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    label_stats: DataFrame,
    token_counts: DataFrame,
    vocab_size: int,
    n_docs_total: int,
) -> DataFrame:
    """Attribute every document to its most probable label:
    (doc_id, pred_label, score_m, score_e) where the winning
    posterior-proportional score is ``score_m * RESCALE_AT**score_e``
    (prior times the product of per-token add-one likelihoods).
    Argmax ties break deterministically: fewest rescales, largest
    mantissa, then label ascending."""
    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    fanned = toked.crossJoin(
        F.broadcast(label_stats.select("label", "n_tokens"))
    ).join(token_counts, ["label", "tok"], "left")
    p = (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double") / (
        F.col("n_tokens") + F.lit(vocab_size)
    ).cast("double")
    arrs = (
        fanned.withColumn("p", p)
        .groupBy("doc_id", "label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "p"))),
                lambda s: s["p"],
            ).alias("ps")
        )
    )
    prior = F.col("n_docs").cast("double") / F.lit(n_docs_total).cast("double")
    base = docs.select(F.col(id_col).alias("doc_id")).crossJoin(
        F.broadcast(label_stats.select("label", prior.alias("prior")))
    )
    folded = base.join(arrs, ["doc_id", "label"], "left").select(
        "doc_id",
        "label",
        product_fold(
            F.coalesce(F.col("ps"), F.array().cast("array<double>")),
            F.col("prior"),
        ).alias("s"),
    )
    best = folded.groupBy("doc_id").agg(
        F.min(
            F.struct(
                F.col("s")["e"].alias("e"),
                (-F.col("s")["m"]).alias("negm"),
                F.col("label").alias("label"),
                F.col("s")["m"].alias("m"),
            )
        ).alias("b")
    )
    return best.select(
        "doc_id",
        F.col("b")["label"].alias("pred_label"),
        F.col("b")["m"].alias("score_m"),
        F.col("b")["e"].cast("int").alias("score_e"),
    )
