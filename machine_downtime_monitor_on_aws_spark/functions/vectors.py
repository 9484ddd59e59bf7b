"""Vector column expressions for embedding similarity.

All dot products / norms are left-to-right folds over
``array<double>`` - verified bit-identical between Spark's
``aggregate(zip_with(...))`` and DuckDB's
``list_sum(list_transform(list_zip(...)))``, which is what lets
similarity queries carry exact oracles.
"""

from __future__ import annotations

import hashlib
import math
import re

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
    """Left-fold dot product: ``aggregate(zip_with(a, b, *), 0.0, +)``.

    Why the higher-order fold and not a flat unrolled
    ``0.0 + a[0]*b[0] + a[1]*b[1] + ...`` chain: at dim=64 the
    unrolled chain codegens into a single ~10 KB-bytecode Java
    expression that exceeds the JVM's 8 KB JIT limit
    (DontCompileHugeMethods), so the whole stage runs in the bytecode
    interpreter. Measured on 1M 64-dim rows, local[32]: unrolled
    3.6 s, fold 0.75 s - and re-enabling huge-method JIT
    (-XX:-DontCompileHugeMethods) still leaves the unrolled chain at
    2.9 s. The fold's tight lambda JITs fine and is ~5x faster, at
    any dim, with no per-dim codegen blowup.

    Fold order is left-to-right in both shapes, so results are
    bit-identical to each other and to DuckDB's
    ``list_sum(list_transform(list_zip(...)))`` - oracle exactness is
    unchanged.

    When ``dim`` is given, a length mismatch FAILS LOUDLY: zip_with
    pads unequal arrays with NULL, so without the guard a wrong-dim
    vector would yield a silent NULL similarity (sorting last in
    every top-k - a malformed embedding batch would simply vanish
    from search results). The guard is two O(1) size() checks per
    row feeding an IF; the raise_error branch never codegens into
    the hot path. With column *names*, the expression is built as
    ONE ``F.expr`` string parsed JVM-side (a python-lambda
    ``F.aggregate`` costs several py4j round-trips per call).
    """
    if dim is not None:
        _check_dim(dim)
    if isinstance(a, str) and isinstance(b, str):
        qa, qb = _qident(a), _qident(b)
        fold = (
            f"aggregate(zip_with({qa}, {qb}, (x, y) -> x * y), "
            "0.0D, (acc, x) -> acc + x)"
        )
        if dim is not None:
            return F.expr(
                f"IF(size({qa}) = {dim} AND size({qb}) = {dim}, {fold}, "
                f"CAST(raise_error('dot: vector length != dim={dim}') AS DOUBLE))"
            )
        return F.expr(fold)
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    fold_col = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if dim is not None:
        err = F.expr(f"CAST(raise_error('dot: vector length != dim={dim}') AS DOUBLE)")
        return F.when((F.size(a) == dim) & (F.size(b) == dim), fold_col).otherwise(err)
    return fold_col


def l2_norm(a: Column | str, dim: int | None = None) -> Column:
    """L2 norm; same left-fold shape, loud dim guard, and rationale
    as :func:`dot`."""
    if dim is not None:
        _check_dim(dim)
    if isinstance(a, str):
        qa = _qident(a)
        fold = (
            f"sqrt(aggregate(transform({qa}, x -> x * x), "
            "0.0D, (acc, x) -> acc + x))"
        )
        if dim is not None:
            return F.expr(
                f"IF(size({qa}) = {dim}, {fold}, "
                f"CAST(raise_error('l2_norm: vector length != dim={dim}') AS DOUBLE))"
            )
        return F.expr(fold)
    fold_col = F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    if dim is not None:
        err = F.expr(
            f"CAST(raise_error('l2_norm: vector length != dim={dim}') AS DOUBLE)"
        )
        return F.when(F.size(a) == dim, fold_col).otherwise(err)
    return fold_col


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def lit_double_array(vals: list[float]) -> Column:
    """``array<double>`` literal built as ONE SQL expression string
    parsed JVM-side (r17): ``F.lit(list)`` walks every element
    through py4j collection converters (~2 ms/element of driver
    time - a 64-dim literal costs ~150 ms, and quantizer/codebook
    paths build several per query), where one ``F.expr`` parse is
    ~1 ms regardless of length. ``repr(float)`` is the shortest
    round-trip decimal and Spark parses ``...D`` literals with
    Java's Double.parseDouble, so values are BIT-IDENTICAL to the
    F.lit form (pinned in tests incl. -0.0, subnormals, DBL_MAX).
    Non-finite values have no SQL literal; empty arrays type as
    array<string> under ``F.expr`` - both fall back to F.lit."""
    vals = [float(x) for x in vals]
    if vals and all(math.isfinite(x) for x in vals):
        return F.expr("array(" + ", ".join(repr(x) + "D" for x in vals) + ")")
    return F.lit(vals)


def lit_long_array(vals: list[int]) -> Column:
    """``array<bigint>`` literal as ONE JVM-parsed SQL string - same
    py4j rationale as :func:`lit_double_array`; int literals are
    exact in both shapes."""
    vals = [int(x) for x in vals]
    if vals and all(-(2**63) <= x < 2**63 for x in vals):
        return F.expr("array(" + ", ".join(f"{x}L" for x in vals) + ")")
    return F.lit(vals)


# the fast string-literal path only engages for strings the SQL
# parser cannot possibly reinterpret: printable ASCII with the quote
# and the escape character themselves excluded - anything else
# (control chars, non-ASCII, quotes, backslashes) falls back to
# F.lit, which is slow but escaping-proof
_LIT_SAFE_ASCII = re.compile(r"[ -&(-\[\]-~]*\Z")


def lit_string_array(vals: list[str]) -> Column:
    """``array<string>`` literal as ONE JVM-parsed SQL string when
    every element is plain printable ASCII without ``'`` or ``\\``
    (the unigram/wordpiece vocab case - F.lit of a few-hundred-piece
    vocab costs ~0.5-2 s of py4j per call, and the EM loop rebuilds
    it per iteration); any other content falls back to F.lit rather
    than trusting hand-rolled SQL escaping. Bit-identity of the fast
    path is pinned in tests against adversarial near-misses."""
    vals = [str(x) for x in vals]
    if vals and all(_LIT_SAFE_ASCII.match(v) for v in vals):
        return F.expr("array(" + ", ".join("'" + v + "'" for v in vals) + ")")
    return F.lit(vals)


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

    Each projection is a left-fold ``aggregate(zip_with(vec, plane,
    *))`` against an array *literal* of +/-1.0 coefficients
    (``x*1.0`` / ``x*-1.0`` are exact, and float multiplication is
    commutative bit-for-bit, so the sign matches the oracle's fold
    exactly). Fold, not an unrolled term chain, for the JIT reason
    documented on :func:`dot`. With a column *name* the whole bucket
    expression is ONE ``F.expr`` string - one py4j round-trip per
    plane set, not per coefficient."""
    if not planes:
        # fail fast Python-side: an empty plane set would otherwise
        # build `concat()` SQL that dies at analysis with an opaque
        # engine error (matching _check_dim's style)
        raise ValueError("sign_bucket: planes must be non-empty")
    if isinstance(vec, str):
        qv = _qident(vec)
        bits = []
        for plane in planes:
            arr = "array(" + ", ".join(f"{float(c)}D" for c in plane) + ")"
            proj = (
                f"aggregate(zip_with({qv}, {arr}, (x, c) -> x * c), "
                "0.0D, (acc, x) -> acc + x)"
            )
            bits.append(f"CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END")
        body = "concat(" + ", ".join(bits) + ")"
        dim = len(planes[0]) if planes else 0
        # same loud dim guard as dot/l2_norm: a wrong-length vector
        # would otherwise fold against NULL pads and silently land in
        # an arbitrary bucket
        return F.expr(
            f"IF(size({qv}) = {dim}, {body}, "
            f"CAST(raise_error('sign_bucket: vector length != {dim}') AS STRING))"
        )
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(float(c)) for c in plane])) >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def sq_l2(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance, same left-fold shape (and DuckDB parity:
    ``list_sum(list_transform(list_zip(a, b), x ->
    (x[1]-x[2])*(x[1]-x[2])))``) as :func:`dot` - the subspace /
    reconstruction distance product quantization scores with."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
