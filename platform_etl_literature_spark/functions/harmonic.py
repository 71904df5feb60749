"""Harmonic-sum scoring primitives — the reference's core scoring fold.

The reference defines three Scala variants of the same idea
(``Processing.scala:14-26`` ``harmonicFn``/``maxHarmonicFn``;
``spark/Helpers.scala:98-103`` desc-sorted ``harmonicFn``):

    harmonic(v) = sum_i v_i / i^2          (i = 1-based position)

re-expressed here as pure Catalyst higher-order functions
(``aggregate`` + ``zip_with`` + ``sequence`` + ``pow``) so the fold runs
JVM-side inside whole-stage codegen — no UDF, no Python round-trip.

At scale this matters: the harmonic fold runs once per aggregated group
(per publication / per target-disease pair), so it sits directly on the
post-shuffle hot path of every scoring query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def harmonic_sql(arr: str) -> str:
    """:func:`harmonic_value` as a staged SQL fragment over an array
    SQL expression (round 10 expression staging): the two
    Python-lambda HOF builds cost ~50 ms of py4j round trips per call
    site, the f-string parses JVM-side in one.  Identical expression:
    zip_with positional divide + aggregate fold, empty-array
    short-circuit to 0.0 (``0.0D`` keeps every literal DOUBLE — a bare
    0.0 would parse as DECIMAL)."""
    idx = (
        f"zip_with({arr}, sequence(1, greatest(size({arr}), 1)),"
        " (_v, _i) -> _v / pow(CAST(_i AS DOUBLE), 2.0D))"
    )
    return (
        f"CASE WHEN size({arr}) = 0 THEN 0.0D"
        f" ELSE aggregate({idx}, 0.0D, (_acc, _x) -> _acc + _x) END"
    )


def harmonic_value(values: Column | str) -> Column:
    """Positional harmonic sum over an array column, as-ordered.

    Port of ``Processing.harmonicFn`` (Processing.scala:21-26):
    ``sum(values[i] / (i+1)^2)`` with ``i`` 0-based.  A ``str``
    argument is treated as an array SQL expression and staged as one
    parse-once string (round 10)."""
    if isinstance(values, str):
        return F.expr(harmonic_sql(values))
    indexed = F.zip_with(
        values,
        F.sequence(F.lit(1), F.greatest(F.size(values), F.lit(1))),
        lambda v, i: v / F.pow(i.cast("double"), F.lit(2.0)),
    )
    # empty arrays: sequence(1, 0) would run backwards and zip_with pads
    # with nulls, so short-circuit to 0.0
    return F.when(F.size(values) == 0, F.lit(0.0)).otherwise(
        F.aggregate(indexed, F.lit(0.0), lambda acc, x: acc + x)
    )


def harmonic_sorted(values: Column | str) -> Column:
    """Harmonic sum after sorting descending — order-insensitive variant.

    Port of ``Helpers.harmonicFn`` (spark/Helpers.scala:98-103): the
    largest value gets weight 1, the next 1/4, then 1/9 …  This is the
    variant used for evidence scores (Evidence.scala:95-97).  A ``str``
    argument is staged as one parse-once SQL string (round 10)."""
    if isinstance(values, str):
        return F.expr(harmonic_sql(f"sort_array({values}, false)"))
    return harmonic_value(F.sort_array(values, asc=False))


def max_harmonic(n: Column | str) -> Column:
    """Maximum achievable harmonic sum for n items: sum(1/i^2), i=1..n.

    Port of ``Processing.maxHarmonicFn`` (Processing.scala:14-19).
    Dead code in the reference; kept because it is the natural
    normalizer for ``harmonic_sorted`` scores.
    """
    n = F.col(n) if isinstance(n, str) else n
    seq = F.sequence(F.lit(1), F.greatest(n.cast("int"), F.lit(1)))
    return F.aggregate(
        seq,
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.pow(i.cast("double"), F.lit(2.0)),
    )
