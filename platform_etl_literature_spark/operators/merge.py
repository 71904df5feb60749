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


def scd2_init(
    df: DataFrame, compare_cols: list[str], version: int
) -> DataFrame:
    """Open an SCD-type-2 history from an initial snapshot: every row
    becomes current (valid_from=version, valid_to=NULL) with its
    tracked-column digest precomputed — the digest is what every later
    :func:`scd2_apply` compares, so the wide columns are hashed exactly
    once per version, map-side."""
    return df.select(
        "*",
        _row_digest(compare_cols).alias("_dig"),
        F.lit(version).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )


def scd2_apply(
    hist: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    version: int,
) -> DataFrame:
    """Apply an update batch to an SCD2 history table: changed keys
    close their current row (valid_to=version) and open a new one,
    unchanged matches pass through untouched (no spurious versions),
    new keys insert, and closed history rows are immutable.

    Scale shape: closed rows never join (filter on valid_to, pushed to
    the scan); the single join is current-rows vs the (much smaller,
    broadcastable) update batch on the key, comparing 16-byte digests
    computed map-side — the standard warehouse SCD2 merge expressed as
    one equijoin + unions, never a row-wise full-row comparison.

    ``updates`` is deduplicated per key HERE (deterministic min-struct
    winner over the non-key columns — the same rule the streaming
    wrapper applies) rather than trusted: a duplicate-key batch passed
    through unchecked would open multiple current rows for one key and
    corrupt the at-most-one-current-row invariant for every later
    apply.  One extra aggregation on the (small, batch-sized) update
    side.  Returns the same schema as :func:`scd2_init`.
    """
    closed = hist.filter(F.col("valid_to").isNotNull())
    cur = hist.filter(F.col("valid_to").isNull())
    other = [c for c in updates.columns if c not in key_cols]
    deduped = (
        updates.groupBy(*key_cols)
        .agg(F.min(F.struct(*other)).alias("_w"))
        .select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in other])
    )
    upd = deduped.select(
        "*", _row_digest(compare_cols).alias("_dig_new")
    )
    j = cur.join(
        upd.select(*key_cols, "_dig_new"), key_cols, "left_outer"
    )
    # current rows: unchanged (no match or same digest) stay open;
    # changed matches close at `version`
    changed = F.col("_dig_new").isNotNull() & (
        F.col("_dig_new") != F.col("_dig")
    )
    carried = j.withColumn(
        "valid_to",
        F.when(changed, F.lit(version).cast("long")).otherwise(
            F.col("valid_to")
        ),
    ).drop("_dig_new")
    # new versions: update rows whose key is new OR whose digest changed
    cur_keys = cur.select(*key_cols, F.col("_dig").alias("_dig_cur"))
    opened = (
        upd.join(cur_keys, key_cols, "left_outer")
        .filter(
            F.col("_dig_cur").isNull() | (F.col("_dig_new") != F.col("_dig_cur"))
        )
        .drop("_dig_cur")
        .withColumnRenamed("_dig_new", "_dig")
        .withColumn("valid_from", F.lit(version).cast("long"))
        .withColumn("valid_to", F.lit(None).cast("long"))
    )
    return closed.unionByName(carried).unionByName(
        opened.select(*closed.columns)
    )


def scd2_as_of(hist: DataFrame, version: int) -> DataFrame:
    """Time-travel read: reconstruct the snapshot that was current AT
    ``version`` from an SCD2 history — rows whose validity interval
    covers it (valid_from ≤ v < valid_to, open intervals current).

    Pure filter + column drop: both predicates push down to the
    history scan (at scale, min/max footer stats on valid_from /
    valid_to skip whole files of closed history), no shuffle at all —
    reading yesterday's corpus costs a scan of the covering rows, not
    a reverse replay of the change log.
    """
    snap = hist.filter(
        (F.col("valid_from") <= F.lit(version))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(version)))
    )
    return snap.drop("_dig", "valid_from", "valid_to")


def scd2_temporal_join(
    facts: DataFrame,
    hist: DataFrame,
    on: str | list[str],
    version_col: str,
    suffix: str = "_dim",
) -> DataFrame:
    """Point-in-time dimension join — the classic warehouse pattern:
    each fact row (stamped with the version current when it happened)
    is enriched with the SCD2 dimension attributes valid AT that
    version (``valid_from <= v < valid_to``, open intervals current;
    NULLs when the key did not exist yet / never existed).

    Scale shape: NOT the naive equi+interval theta join (a fact key
    against a long history generates fact × versions candidates
    before the residual filter prunes them).  Validity intervals
    partition the version axis per key, so "the interval covering v"
    IS "the latest valid_from at-or-before v" — the backward as-of
    join (operators.asof.asof_join: union + ONE exchange +
    last(ignorenulls) carry, O(1) state per key, no join operator in
    the plan).  A closed interval that ended at or before v (a
    deleted key) is nulled out after the carry.

    The history's ``valid_from`` arrives as ``valid_from{suffix}``
    (the as-of right-timestamp rule); all other dimension columns
    keep their names unless they collide with a fact column.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right = hist.drop("_dig")
    from platform_etl_literature_spark.operators.asof import asof_join

    out = asof_join(
        facts,
        right,
        on=keys,
        left_ts=version_col,
        right_ts="valid_from",
        suffix=suffix,
    )
    fact_names = set(facts.columns)
    carried = [
        (c + suffix if (c == "valid_from" or c in fact_names) else c)
        for c in right.columns
        if c not in keys
    ]
    vt = "valid_to" + suffix if "valid_to" in fact_names else "valid_to"
    # evaluate the invalid flag ONCE before the null-out loop: nulling
    # valid_to itself mid-loop would flip the condition for the
    # columns that follow it
    out = out.withColumn(
        "_stale",
        F.col(vt).isNotNull() & (F.col(vt) <= F.col(version_col)),
    )
    for c in carried:
        out = out.withColumn(
            c, F.when(F.col("_stale"), F.lit(None)).otherwise(F.col(c))
        )
    return out.drop("_stale")
