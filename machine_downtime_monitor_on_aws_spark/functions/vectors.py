"""Vector column expressions for embedding similarity.

All dot products / norms are left-to-right folds over
``array<double>`` - verified bit-identical between Spark's
``aggregate(zip_with(...))`` and DuckDB's
``list_sum(list_transform(list_zip(...)))``, which is what lets
similarity queries carry exact oracles.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _qident(name: str) -> str:
    """Backtick-quote a column name for interpolation into ``F.expr``
    strings (escaping embedded backticks - an unescaped one is at best
    a parse error and at worst expression injection)."""
    return "`" + name.replace("`", "``") + "`"


def _check_dim(dim: int) -> None:
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")


def validate_vec_dim(df: DataFrame, vec_col: str, dim: int) -> None:
    """Eagerly assert every vector in ``vec_col`` has exactly ``dim``
    elements. The unrolled expression paths below index ``a[i]`` for
    i < dim, which under ANSI mode (default in Spark 4) throws
    INVALID_ARRAY_INDEX on shorter vectors and silently *truncates*
    the product on longer ones - run this in debug/ingest paths before
    trusting a declared dim. One cheap aggregate, no data movement."""
    bad = df.filter(F.size(F.col(vec_col)) != dim).limit(1).count()
    if bad:
        raise ValueError(f"{vec_col}: found vectors whose length != dim={dim}")


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Left-fold dot product.

    With ``dim`` known at plan-build time AND both operands given as
    column *names*, the fold is unrolled into a flat
    ``(((0.0 + a[0]*b[0]) + a[1]*b[1]) + ...)`` chain: bit-identical
    addition order (SQL ``+`` is left-associative), but a plain
    codegen-able expression instead of an interpreted higher-order
    ``aggregate``. The chain is built as ONE ``F.expr`` string parsed
    JVM-side - building it from Column objects would cost hundreds of
    py4j round-trips per query construction, which dominates at this
    expression size.

    Contract: ``dim`` must equal the exact array length of BOTH
    operands. Under ANSI mode a shorter vector throws
    INVALID_ARRAY_INDEX; a longer one is silently truncated. Use
    :func:`validate_vec_dim` to check a column eagerly.
    """
    if dim is not None and isinstance(a, str) and isinstance(b, str):
        _check_dim(dim)
        qa, qb = _qident(a), _qident(b)
        terms = " + ".join(f"{qa}[{i}]*{qb}[{i}]" for i in range(dim))
        return F.expr(f"0.0D + {terms}")
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str, dim: int | None = None) -> Column:
    """L2 norm; same unrolling + exact-``dim`` contract as :func:`dot`."""
    if dim is not None and isinstance(a, str):
        _check_dim(dim)
        qa = _qident(a)
        terms = " + ".join(f"{qa}[{i}]*{qa}[{i}]" for i in range(dim))
        return F.expr(f"sqrt(0.0D + {terms})")
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


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


def sign_bucket(vec: Column | str, planes: list[list[int]]) -> Column:
    """LSH bucket id: one bit per hyperplane (sign of the projection),
    rendered as a bit-string so it stays engine-portable.

    With a column *name*, each projection unrolls into a single
    ``F.expr`` chain (coefficients are +/-1.0 literals; ``x*1.0`` and
    ``x*-1.0`` are exact, so the sign matches the oracle's
    fold bit-for-bit)."""
    if isinstance(vec, str):
        qv = _qident(vec)
        bits = []
        for plane in planes:
            terms = " + ".join(
                f"{float(c)}D*{qv}[{j}]" for j, c in enumerate(plane)
            )
            bits.append(
                F.when(F.expr(f"0.0D + {terms}") >= 0, F.lit("1")).otherwise(
                    F.lit("0")
                )
            )
        return F.concat(*bits)
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(float(c)) for c in plane])) >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)
