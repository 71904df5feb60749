"""Corpus versioning: upsert merge and snapshot diff.

The reference pipeline recomputes everything from each monthly EPMC
drop; an incremental corpus instead needs (a) MERGE semantics — apply
an update batch over the standing corpus — and (b) change detection
between two corpus versions to bound downstream recomputation (only
re-embed / re-dedup what changed).

Scale shapes:

* ``upsert``: the standing corpus anti-joins the (much smaller) update
  batch on the key and the batch unions on top — one hash join keyed
  by the corpus key (broadcastable when the batch is small), never a
  row-wise comparison of full rows.
* ``snapshot_diff``: one full-outer join on the key; change detection
  compares an md5 over the tracked columns computed MAP-SIDE on each
  leg, so the join carries (key, 16-byte digest) only — at 100 TB the
  wide columns never shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def upsert(base: DataFrame, updates: DataFrame, key_cols: list[str]) -> DataFrame:
    """MERGE: rows from ``updates`` replace same-key rows in ``base``;
    unmatched update rows insert.  Schemas must match by name.

    ``updates`` must hold one row per key (enforce upstream with
    dropDuplicates/dedup); base rows not updated pass through
    unchanged.
    """
    kept = base.join(updates.select(*key_cols), key_cols, "left_anti")
    return kept.unionByName(updates)


def _row_digest(cols: list[str]) -> Column:
    # concat_ws drops NULLs silently, which would alias (NULL, 'x') with
    # ('x', NULL) — encode NULL explicitly per column first.
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols
    ]
    return F.md5(F.concat_ws("\x01", *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Classify every key across two corpus versions:
    ``inserted`` (new only), ``deleted`` (old only), ``changed``
    (both, tracked columns differ), ``unchanged``.

    Returns (key_cols..., change_type).  Each side reduces to
    (key, digest) map-side before the single full-outer join.
    """
    o = old.select(*key_cols, _row_digest(compare_cols).alias("_dig_old"))
    n = new.select(*key_cols, _row_digest(compare_cols).alias("_dig_new"))
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_dig_old").isNull(), F.lit("inserted"))
        .when(F.col("_dig_new").isNull(), F.lit("deleted"))
        .when(F.col("_dig_old") != F.col("_dig_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*key_cols, change.alias("change_type"))
