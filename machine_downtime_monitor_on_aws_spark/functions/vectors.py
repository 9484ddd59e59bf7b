"""Vector column expressions for embedding similarity.

All dot products / norms are left-to-right folds over
``array<double>`` - verified bit-identical between Spark's
``aggregate(zip_with(...))`` and DuckDB's
``list_sum(list_transform(list_zip(...)))``, which is what lets
similarity queries carry exact oracles.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def hyperplanes(num_planes: int, dim: int) -> list[list[int]]:
    """Deterministic +/-1 hyperplanes for sign-LSH, derived from md5 in
    *Python* at plan-build time - both the Spark plan and the oracle
    SQL embed the same literals, so bucketing is engine-identical."""
    planes = []
    for p in range(num_planes):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"{p}:{j}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) < 8 else -1)
        planes.append(row)
    return planes


def sign_bucket(vec: Column, planes: list[list[int]]) -> Column:
    """LSH bucket id: one bit per hyperplane (sign of the projection),
    rendered as a bit-string so it stays engine-portable."""
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(float(c)) for c in plane])) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)
