"""Privacy operators for training-data curation: redaction,
deterministic pseudonymization, generalization, and a k-anonymity
audit.

All map-side Catalyst expressions except the k-anonymity group count
(one window/aggregation over the quasi-identifier key).  Everything is
engine-portable for the DuckDB oracle: RE2-safe regexes (no
lookaround), sha256 hex, exact integer band arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def redact_digits(col: Column | str, mask: str = "*") -> Column:
    """Replace every digit with ``mask`` — the structure of the value
    (lengths, separators) survives, the identifier does not."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "[0-9]", mask)


def pseudonymize(col: Column | str, pepper: str) -> Column:
    """Deterministic pseudonym: sha256(pepper || value) hex.  The same
    identity maps to the same pseudonym in every table it appears in
    (so joins still work after de-identification), and without the
    pepper the mapping is not invertible by dictionary attack on the
    raw value space."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(F.concat(F.lit(pepper), c), 256)


def generalize_band(col: Column | str, width: int) -> Column:
    """Generalize a numeric value to the lower edge of its
    ``width``-sized band (k-anonymity-style coarsening)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.floor(c / width) * width).cast("long")


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Annotate each row with the size of its quasi-identifier
    equivalence class and whether it meets ``k``-anonymity.  Rows in
    small classes are the re-identification risk — at release time
    they get suppressed or further generalized.

    One window count over the quasi-identifier key; the shuffle carries
    the deduplicated class sizes after map-side partial aggregation is
    not applicable to windows, so at 100 TB prefer the two-step
    groupBy + broadcast-join variant when the class count is small —
    this window form keeps every row (the audit's point)."""
    w = Window.partitionBy(*quasi_cols)
    n = F.count(F.lit(1)).over(w)
    return df.withColumn("n_in_class", n).withColumn(
        "k_anon", (F.col("n_in_class") >= k).cast("int")
    )
