"""Vector math on plain ``array<double>`` columns — no UDFs, no VectorUDT.

The reference implements cosine similarity and L2 norm as Scala UDFs over
``ml.linalg.Vector`` (``spark/Helpers.scala:82-92``; ``Vectors.scala:33``).
An idiomatic PySpark build keeps embeddings as ``array<double>`` and
expresses both as Catalyst higher-order functions, which:

* stay JVM-side (no Python serde on a 100 TB scan),
* survive whole-stage codegen,
* need no VectorUDT round-trip at the Python/JVM boundary.

``pyspark.ml.functions.vector_to_array`` is the single conversion point
at the Word2Vec model boundary (plans/vectors.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def array_dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length array<numeric> columns."""
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def array_norm(a: Column | str) -> Column:
    """L2 norm of an array<numeric> column (Helpers.scala:82-92 UDF port)."""
    sq = F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x * x)
    return F.sqrt(sq)


def array_unit(a: Column | str) -> Column:
    """a / ||a||, with the zero vector mapping to all-zeros (so a
    downstream dot product yields similarity 0 — the same guard
    ``array_cosine`` applies).

    Normalizing ONCE per row turns a pairwise cosine into a single dot
    product: a candidate-pair verify over P pairs does P folds instead
    of 3P (dot + both norms) — the norms move to the O(n) row side.
    """
    a = _c(a)
    n = array_norm(a)
    return F.when(n == 0.0, F.transform(a, lambda x: x * 0.0)).otherwise(
        F.transform(a, lambda x: x / n)
    )


def array_cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either norm is 0.

    Exact semantics of the reference UDF ``Helpers.cosineSimilarity``
    (spark/Helpers.scala:82-92): dot(a,b) / (||a|| * ||b||), guarded.
    """
    a, b = _c(a), _c(b)
    denom = array_norm(a) * array_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(array_dot(a, b) / denom)


def array_dot_sql(a: str, b: str) -> str:
    """:func:`array_dot` as a staged SQL fragment (round 10 expression
    staging, the harmonic_sql precedent: each Python-lambda HOF build
    costs ~25 ms of py4j round trips; the f-string parses JVM-side in
    one).  ``0.0D`` keeps the fold DOUBLE — a bare 0.0 would parse as
    DECIMAL.

    Arguments here and in the sibling ``*_sql`` helpers are
    interpolated VERBATIM — they must be pre-validated SQL expressions
    or plain identifiers (ADVICE r10).  A column name that needs
    quoting must be passed already backtick-quoted, as the selectExpr
    call sites do; nothing is escaped on this side."""
    return (
        f"aggregate(zip_with({a}, {b}, (_x, _y) -> _x * _y),"
        " 0.0D, (_acc, _x) -> _acc + _x)"
    )


def array_norm_sql(a: str) -> str:
    """:func:`array_norm` as a staged SQL fragment."""
    return f"sqrt(aggregate({a}, 0.0D, (_acc, _x) -> _acc + _x * _x))"


def array_cosine_sql(a: str, b: str) -> str:
    """:func:`array_cosine` as a staged SQL fragment — identical
    expression shape (the denominator is duplicated into the guard
    exactly as the Column form duplicates its subtree)."""
    denom = f"({array_norm_sql(a)} * {array_norm_sql(b)})"
    return (
        f"CASE WHEN {denom} = 0.0D THEN 0.0D"
        f" ELSE {array_dot_sql(a, b)} / {denom} END"
    )
