"""Data-layout optimization: Z-order clustering for min/max file skipping.

At 100 TB the cheapest scan is the one never issued: columnar readers
prune files (and row groups) whose footer min/max excludes the filter
range, but single-column sort only tightens ONE column's ranges.
Interleaving the bits of several columns' range-bins (a Z-order /
Morton curve — the technique behind Delta Lake's OPTIMIZE ZORDER BY)
makes every indexed column's per-file range narrow at once, so
predicates on ANY of them skip most files.

Everything here is integer-exact and engine-portable:

* range bins: ``(col - min) * 2^bits  div  (max - min + 1)`` — integer
  arithmetic end to end, so a SQL oracle reproduces the exact z-values;
* column mins/maxs come from ONE single-row aggregate broadcast back
  (the same in-plan single-row-stats shape as retrieval.bm25_scores) —
  no driver round trip;
* the bit interleave is a GENERATED expression, so it is assembled as
  one SQL string and parsed JVM-side (the expression-staging policy,
  DESIGN.md) — O(1) py4j round-trips at any bit width.

``optimize_layout`` is the write-side action: range-repartition by
z-value + sort within partitions, so each output file covers one tight
z-range — the locality the file-stats test measures directly from the
written parquet footers.
"""

from __future__ import annotations

from platform_etl_literature_spark.localdf import local_df
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave_sql(bin_names: list[str], bits: int) -> str:
    """One SQL expression interleaving the bits of the given bin
    columns, highest-priority column in the highest bit of each group."""
    n = len(bin_names)
    terms = []
    for b in range(bits - 1, -1, -1):
        for i, name in enumerate(bin_names):
            shift = b * n + (n - 1 - i)
            terms.append(f"shiftleft((shiftright({name}, {b}) & 1), {shift})")
    return " + ".join(terms)


def zorder_bins(
    df: DataFrame, cols: list[str], bits: int = 8
) -> DataFrame:
    """Add ``_bin_<col>`` range-bin columns (integer, [0, 2^bits)) and
    the interleaved ``_z`` Morton value.

    Column ranges are taken from the data via a single-row min/max
    aggregate broadcast back — fully in-plan.  Input columns must be
    integral (the bins are exact integer arithmetic; floats would make
    the z-value engine-dependent).
    """
    if not cols:
        raise ValueError("zorder_bins needs at least one column")
    integral = {"byte", "tinyint", "short", "smallint", "int", "integer", "long", "bigint"}
    for c in cols:
        dt = dict(df.dtypes).get(c)
        if dt is None:
            raise ValueError(f"zorder_bins: no such column {c!r}")
        if dt not in integral:
            raise ValueError(
                f"zorder_bins: column {c!r} is {dt}; only integral columns are "
                "supported (a float would be silently truncated by the BIGINT "
                "cast, making the bins engine-dependent)"
            )
    stats = df.agg(
        *[F.min(c).cast("long").alias(f"_mn_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"_mx_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    width = 1 << bits
    bin_names = []
    for c in cols:
        bname = f"_bin_{c}"
        bin_names.append(bname)
        out = out.withColumn(
            bname,
            F.expr(
                f"(CAST({c} AS BIGINT) - _mn_{c}) * {width} "
                f"div (_mx_{c} - _mn_{c} + 1)"
            ),
        )
    out = out.withColumn("_z", F.expr(_interleave_sql(bin_names, bits)))
    return out.drop(*[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols])


def _hilbert_sql(xb: str, yb: str, bits: int) -> str:
    """One SQL expression for the Hilbert d-index of 2-D bin columns —
    the ``aggregate`` HOF folding the classic xy→d loop (Hilbert 1891;
    the iterative quadrant-rotate formulation) over the bit levels
    MSB-first.  A fold keeps the expression O(bits) — a textual unroll
    would blow up exponentially because each level's (x, y) feed the
    next twice.  Pure integer arithmetic (the quadrant digit
    ``(3·rx) XOR ry`` is computed as ``3rx + ry − 2·rx·ry`` to avoid
    engine-specific XOR syntax), so a DuckDB ``list_reduce`` replays
    the identical fold bit-for-bit.  The reflection complements
    against the FULL width (2^bits − 1): bits at or above the current
    level are never read again, so full-width and level-width
    complements yield the same d (bijectivity + unit-step adjacency
    are pytest-pinned against the python reference)."""
    m = (1 << bits) - 1
    return f"""aggregate(
  sequence({bits - 1}, 0, -1),
  named_struct('x', CAST({xb} AS BIGINT), 'y', CAST({yb} AS BIGINT),
               'd', CAST(0 AS BIGINT)),
  (a, lv) -> named_struct(
    'x', CASE WHEN (shiftright(a.y, lv) & 1) = 0
              THEN (CASE WHEN (shiftright(a.x, lv) & 1) = 1
                         THEN {m} - a.y ELSE a.y END)
              ELSE a.x END,
    'y', CASE WHEN (shiftright(a.y, lv) & 1) = 0
              THEN (CASE WHEN (shiftright(a.x, lv) & 1) = 1
                         THEN {m} - a.x ELSE a.x END)
              ELSE a.y END,
    'd', a.d + shiftleft(CAST(1 AS BIGINT), 2 * lv) * (
          3 * (shiftright(a.x, lv) & 1) + (shiftright(a.y, lv) & 1)
          - 2 * (shiftright(a.x, lv) & 1) * (shiftright(a.y, lv) & 1))),
  a -> a.d)"""


def hilbert_duckdb_ctes(
    src: str, xb: str, yb: str, bits: int, carry: list[str]
) -> tuple[str, str]:
    """The DuckDB replay of :func:`_hilbert_sql` as UNROLLED chained
    CTEs (``h1..h<bits>`` folding (hx, hy, hd) one bit level per
    stage), NOT as a ``list_reduce`` lambda.  The lambda formulation is
    arithmetic-identical and passes on small inputs, but DuckDB
    1.0.0's vectorized list_reduce returns WRONG accumulators once the
    input chunk is large enough (measured: correct on <= 16 rows,
    16/64 cells wrong on a 64-row grid, value-dependent) — an
    engine-hazard documented in DESIGN.md; per-stage scalar CTEs stay
    on the ordinary expression path both engines execute exactly.

    Returns ``(ctes_sql, final_name)``: append ``ctes_sql`` after a
    ``WITH`` chain containing ``src`` (which must expose ``carry``
    columns plus ``{xb}``/``{yb}``); read ``hd`` from ``final_name``.
    Kept next to the Spark expression so the two bodies are reviewed
    together — they must stay arithmetic-identical."""
    m = (1 << bits) - 1
    cols = ", ".join(carry)
    parts = [
        f"h0 AS (SELECT {cols}, CAST({xb} AS BIGINT) AS hx, "
        f"CAST({yb} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM {src})"
    ]
    for k in range(1, bits + 1):
        lv = bits - k
        rx = f"((hx >> {lv}) & 1)"
        ry = f"((hy >> {lv}) & 1)"
        parts.append(
            f"""h{k} AS (SELECT {cols},
  CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {m} - hy ELSE hy END)
       ELSE hx END AS hx,
  CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {m} - hx ELSE hx END)
       ELSE hy END AS hy,
  hd + ((CAST(1 AS BIGINT) << (2 * {lv})) * (3 * {rx} + {ry} - 2 * {rx} * {ry})) AS hd
FROM h{k - 1})"""
        )
    return ",\n".join(parts), f"h{bits}"


def hilbert_bins(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Add ``_bin_<col>`` range bins (same exact integer arithmetic as
    :func:`zorder_bins`) and the Hilbert d-index ``_h`` for exactly
    TWO columns.  Hilbert ordering dominates Morton for file skipping
    because consecutive d-values are ALWAYS grid neighbors (no Morton
    "seams" where the curve jumps across the key space), so equal-size
    file cuts cover tighter rectangles — ``zonemap_skip_stats(curve=
    'hilbert')`` measures that claim instead of asserting it."""
    if len(cols) != 2:
        raise ValueError(
            "hilbert_bins indexes exactly 2 columns (the 2-D curve); "
            f"got {cols!r}"
        )
    binned = zorder_bins(df, cols, bits=bits).drop("_z")
    return binned.withColumn(
        "_h", F.expr(_hilbert_sql(f"_bin_{cols[0]}", f"_bin_{cols[1]}", bits))
    )


def optimize_layout(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 8,
    curve: str = "zorder",
) -> DataFrame:
    """Cluster rows for multi-column file skipping: bin the given
    columns, range-repartition on the curve value into ``n_files``
    partitions and sort within each — every output file then covers one
    tight curve range, i.e. a small hyper-rectangle of ALL indexed
    columns.  Write the result with any sink; the parquet footers carry
    the narrowed min/max stats that make readers skip.

    ``curve='hilbert'`` (2 columns only) orders by the Hilbert d-index
    instead of the Morton value — consecutive d-values are always grid
    neighbors, so equal-size file cuts cover tighter rectangles (the
    measured hilbert_skip vs zonemap_skip delta)."""
    if curve == "zorder":
        z = zorder_bins(df, cols, bits=bits)
        key = "_z"
    elif curve == "hilbert":
        z = hilbert_bins(df, cols, bits=bits).withColumnRenamed("_h", "_z")
        key = "_z"
    else:
        raise ValueError(f"unknown curve {curve!r} (zorder|hilbert)")
    return (
        z.repartitionByRange(n_files, F.col(key))
        .sortWithinPartitions(key)
        .drop(key, *[f"_bin_{c}" for c in cols])
    )


def zonemap_skip_stats(
    df: DataFrame,
    zcols: list[str],
    natural_col: str,
    n_files: int = 64,
    bits: int = 8,
    band: tuple[int, int] = (45, 55),
    curve: str = "zorder",
    bins: str = "equiwidth",
) -> DataFrame:
    """Zone-map skipping accountability — the layout family's analog of
    ANN recall: MEASURE how many simulated files a range predicate must
    scan under the Z-order layout versus the natural (ingest-order)
    layout, instead of asserting that clustering "should" help.

    File assignment is simulated with the same integer arithmetic the
    layout itself uses (equi-width buckets of ``_z`` for the z-order
    layout, of ``natural_col`` for the natural one — the
    repartitionByRange model), so the whole harness is exact and
    SQL-replayable.  One predicate per z-column: the middle
    ``band[0]..band[1]`` percent range of that column.  A file must be
    scanned iff its zone map overlaps: NOT (max < lo OR min > hi) —
    byte-for-byte the pruning rule a parquet reader applies to footer
    stats.

    Returns one row per (layout, pred_col): (layout, pred_col,
    n_files_total, n_scanned, scan_pct).  Everything after the corpus
    projection is file-count-sized: two grouped aggregations of
    ``n_files`` zone-map rows and a handful of scalar combines.
    """
    if not zcols:
        raise ValueError("zonemap_skip_stats needs at least one z column")
    if bins not in ("equiwidth", "equidepth"):
        raise ValueError(f"unknown bins {bins!r} (equiwidth|equidepth)")
    # Guide §2.5 (unsplittable input): the harness corpus often arrives
    # as one single-row-group parquet file, so an EXPENSIVE bin fold
    # (the Hilbert quadrant-rotate aggregate, the equidepth threshold
    # probe) and the checkpoint below would run as ONE task on a
    # many-core box (measured: 1.3 s single-task checkpoint stage in
    # hilbert_skip).  Project to the needed columns, then fan out to the
    # session's parallelism — but only for the expensive folds: a
    # keyless repartition pays a local sort of its input
    # (sortBeforeRepartition), which measured a net LOSS under the
    # cheap Morton interleave (zonemap_skip 1.00 -> 1.66 s) and a win
    # for hilbert/equidepth (5.87 -> 3.73 s skewed).  Conditional on
    # observed scan parallelism, so an already-parallel large scan
    # never pays a gratuitous shuffle.
    df = df.select(*dict.fromkeys([natural_col, *zcols]))
    if bins == "equidepth" or curve == "hilbert":
        from platform_etl_literature_spark.localdf import fan_out

        df = fan_out(df)  # memoized probe (round 11); same condition
    if bins == "equidepth":
        if curve != "zorder":
            raise ValueError("equidepth bins are wired for curve='zorder'")
        z = equidepth_bins(df, zcols, bits=bits)
        curve = "zorder-eqdepth"  # the layout label in the output
    elif curve == "zorder":
        z = zorder_bins(df, zcols, bits=bits)
    elif curve == "hilbert":
        z = hilbert_bins(df, zcols, bits=bits).withColumnRenamed("_h", "_z")
    else:
        raise ValueError(f"unknown curve {curve!r} (zorder|hilbert)")
    # the harness reads the keyed projection from MANY aggregate
    # subtrees (the stats row, both layouts' zone maps, every
    # predicate leg): materialize the slim (natural, zcols, _z) frame
    # once so the bin pipeline — which for equidepth/hilbert includes
    # threshold builds or the HOF fold — doesn't re-execute per leg
    # (measured: zonemap_skip_skewed 7.9 s → this checkpoint is the
    # fix; the frame is diagnostics-sized columns over the corpus,
    # the price every accountability pass pays once)
    slim_cols = list(dict.fromkeys([natural_col, *zcols]))  # dedup, keep order
    z = z.select(*slim_cols, "_z").localCheckpoint(eager=True)
    # Round 10: the corpus stats are ONE row over the just-materialized
    # checkpoint — collect it and substitute the values as constants
    # instead of crossJoin(broadcast(stats)).  The in-plan form rebuilt
    # the identical one-row broadcast once per predicate leg (4 extra
    # broadcast-subquery jobs measured in hilbert_skip); the literal
    # form is one metadata-sized collect, and every div/threshold
    # expression below constant-folds.  The SQL fragments keep the
    # arithmetic in Spark (literal-for-column substitution only), so
    # values are unchanged.
    srow = z.agg(
        F.min("_z").alias("_mnz"),
        F.max("_z").alias("_mxz"),
        F.min(F.col(natural_col).cast("long")).alias("_mnn"),
        F.max(F.col(natural_col).cast("long")).alias("_mxn"),
        *[F.min(F.col(c).cast("long")).alias(f"_mn_{c}") for c in zcols],
        *[F.max(F.col(c).cast("long")).alias(f"_mx_{c}") for c in zcols],
    ).collect()[0]
    if srow["_mnz"] is None:  # empty input: no files, zero rows out
        mnz = mxz = mnn = mxn = 0
    else:
        mnz, mxz, mnn, mxn = (
            srow["_mnz"], srow["_mxz"], srow["_mnn"], srow["_mxn"]
        )
    fz = F.expr(f"(_z - {mnz}L) * {n_files} div ({mxz}L - {mnz}L + 1)")
    fn = F.expr(
        f"(CAST({natural_col} AS BIGINT) - {mnn}L) * {n_files}"
        f" div ({mxn}L - {mnn}L + 1)"
    )
    proj = z.select(
        fz.alias("_fz"),
        fn.alias("_fn"),
        *[F.col(c).cast("long").alias(c) for c in zcols],
    )
    lo, hi = band
    out = None
    for layout, fcol in ((curve, "_fz"), ("natural", "_fn")):
        zone = proj.groupBy(F.col(fcol).alias("_file")).agg(
            *[F.min(c).alias(f"_fmn_{c}") for c in zcols],
            *[F.max(c).alias(f"_fmx_{c}") for c in zcols],
        )
        # ONE aggregation per layout carrying every predicate column's
        # overlap count (round 11): the per-column form re-aggregated
        # the SAME zone table once per zcol — with two zcols the warm
        # hilbert_skip profile showed FOUR ~16 MB zone-map passes where
        # two suffice (exchange reuse did not unify the per-column
        # legs).  Identical integers: each count_if is unchanged and
        # count(1) never depended on the predicate column; the per-
        # column rows are exploded back out of the one-row aggregate.
        aggs = [F.count(F.lit(1)).alias("n_files_total")]
        for c in zcols:
            mn_c = 0 if srow[f"_mn_{c}"] is None else srow[f"_mn_{c}"]
            mx_c = 0 if srow[f"_mx_{c}"] is None else srow[f"_mx_{c}"]
            plo = f"({mn_c}L + ({mx_c}L - {mn_c}L) * {lo} div 100)"
            phi = f"({mn_c}L + ({mx_c}L - {mn_c}L) * {hi} div 100)"
            aggs.append(
                F.count_if(
                    ~F.expr(f"(_fmx_{c} < {plo}) OR (_fmn_{c} > {phi})")
                ).alias(f"_ns_{c}")
            )
        scanned = (
            zone.agg(*aggs)
            .select(
                F.lit(layout).alias("layout"),
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c).alias("pred_col"),
                                F.col(f"_ns_{c}").alias("n_scanned"),
                            )
                            for c in zcols
                        ]
                    )
                ).alias("_e"),
                "n_files_total",
            )
            .select(
                "layout",
                F.col("_e.pred_col").alias("pred_col"),
                "n_files_total",
                F.col("_e.n_scanned").alias("n_scanned"),
                F.round(
                    F.col("_e.n_scanned")
                    / F.col("n_files_total").cast("double")
                    * 100,
                    2,
                ).alias("scan_pct"),
            )
        )
        out = scanned if out is None else out.unionByName(scanned)
    return out


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    id_col: str = "file_id",
    size_col: str = "size_bytes",
    order_by: list | None = None,
) -> DataFrame:
    """Small-file compaction planner: assign every file to a rewrite
    group holding ~``target_bytes`` — the maintenance pass a 100 TB
    table needs continuously (streaming sinks and fine-grained
    partitioning strew kilobyte files; readers want fewer,
    target-sized ones).

    The plan is CONTIGUOUS PACKING over a deterministic total order
    (default: size desc, id): a file starting at cumulative offset
    ``cum - size`` lands in group ``(cum - size) div target_bytes``.
    Groups are target-sized (+ at most one straddling file); a file
    already >= target_bytes simply spans its own group(s) and can be
    skipped by the caller via n_files = 1.  ``order_by`` overrides the
    packing order (a list of Columns over ``files``'s columns) —
    :func:`execute_compaction` passes each file's min cluster value so
    groups pack CONTIGUOUS cluster ranges and zone-map skipping
    survives the rewrite.

    The prefix sum is NOT a single-partition window: it rides
    :func:`ranking.ordered_global_index` (range exchange, in-partition
    sums, broadcast per-partition offsets), so planning a billion-file
    manifest is itself distributed.  Returns per-file
    (id, size, grp, grp_offset) — aggregate by ``grp`` for the rewrite
    manifest.
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    from platform_etl_literature_spark.operators.ranking import (
        ordered_global_index,
    )

    f = files.select(
        F.col(id_col).alias("file_id"),
        F.col(size_col).cast("long").alias("size_bytes"),
    )
    ranked = ordered_global_index(
        f if order_by is None else files.select(
            F.col(id_col).alias("file_id"),
            F.col(size_col).cast("long").alias("size_bytes"),
            *[c for c in files.columns if c not in (id_col, size_col)],
        ),
        order_by
        if order_by is not None
        else [F.col("size_bytes").desc(), F.col("file_id").asc()],
        running_sum_col="size_bytes",
        running_sum_out="_cum",
    )
    return ranked.select(
        "file_id",
        "size_bytes",
        F.expr(f"(_cum - size_bytes) div {target_bytes}").alias("grp"),
        (F.col("_cum") - F.col("size_bytes")).alias("grp_offset"),
    )


def _hadoop_fs(spark, path: str):
    """(jvm, Path, FileSystem) for any supported scheme — the same
    Hadoop-API shape streaming/scd2.py uses for its manifests."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


def execute_compaction(
    spark,
    src_dir: str,
    dest_dir: str,
    target_bytes: int,
    cluster_col: str | None = None,
) -> dict:
    """Execute a small-file compaction: rewrite ``src_dir``'s parquet
    files into ``dest_dir`` with ONE file per :func:`compaction_plan`
    group — the action twin of the planner row (the scrub_dup_passages
    precedent: a stats query alone is not maintenance).

    * **One distributed rewrite job.**  Rows are tagged with their
      plan group by joining the (file-count-sized, broadcast) plan on
      the scan's ``_metadata.file_path``, hash-repartitioned so each
      group lands wholly in one task, and written with
      ``partitionBy(_grp)`` — exactly one file per group directory,
      never a per-group driver loop.
    * **Clustering survives.**  With ``cluster_col`` set, the packing
      order is each file's min cluster value (computed by a
      column-pruned aggregate scan, not a footer walk), so groups pack
      CONTIGUOUS cluster ranges and the rewritten footers stay narrow
      — zone-map skipping keeps working (pinned by the layout test).
      Without it, packing is the planner's default (size desc, id).
    * **_SUCCESS-gated and idempotent.**  Spark's commit protocol
      stages the write and drops ``_SUCCESS`` last; a dest that
      already committed is returned as ``skipped`` untouched, and a
      partial attempt (no marker) is safely overwritten on re-run.

    Driver state is bounded by the FILE MANIFEST (one listing RPC +
    one slim row per input file), never by row data — the catalog-
    sized cost every table-maintenance pass already pays.
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    _, dsucc, dfs = _hadoop_fs(spark, f"{dest_dir}/_SUCCESS")
    if dfs.exists(dsucc):
        done = spark.read.parquet(dest_dir)
        return {
            "skipped": True,
            "n_rows": done.count(),
            "n_groups": done.select("_grp").distinct().count(),
        }

    _, spath, sfs = _hadoop_fs(spark, src_dir)
    listing = [
        (st.getPath().getName(), int(st.getLen()))
        for st in sfs.listStatus(spath)
        if st.getPath().getName().endswith(".parquet")
    ]
    if not listing:
        raise ValueError(f"no parquet files under {src_dir}")
    files = local_df(spark, listing, "file_id string, size_bytes long")

    rows = spark.read.parquet(src_dir).withColumn(
        "_fname", F.regexp_extract(F.col("_metadata.file_path"), r"([^/]+)$", 1)
    )
    order_by = None
    if cluster_col is not None:
        fmin = rows.groupBy(F.col("_fname").alias("file_id")).agg(
            F.min(cluster_col).alias("_fmin")
        )
        files = files.join(F.broadcast(fmin), "file_id")
        order_by = [F.col("_fmin").asc(), F.col("file_id").asc()]
    plan = compaction_plan(files, target_bytes, order_by=order_by)

    n_groups = plan.agg(
        (F.max("grp") + 1).cast("int").alias("n")
    ).collect()[0]["n"]
    tagged = rows.join(
        F.broadcast(plan.select(F.col("file_id").alias("_fname"), F.col("grp").alias("_grp"))),
        "_fname",
    ).drop("_fname")
    out = tagged.repartition(n_groups, "_grp")
    if cluster_col is not None:
        out = out.sortWithinPartitions(cluster_col)
    out.write.mode("overwrite").partitionBy("_grp").parquet(dest_dir)
    return {
        "skipped": False,
        "n_input_files": len(listing),
        "n_groups": int(n_groups),
        "n_rows": spark.read.parquet(dest_dir).count(),
    }


def bloom_index_skip_stats(
    df: DataFrame,
    probe_col: str,
    natural_col: str,
    n_files: int = 64,
    m_bits: int = 4096,
    k: int = 3,
    probe_mod: int = 47,
) -> DataFrame:
    """File-skipping accountability for EQUALITY predicates — the
    point-lookup twin of :func:`zonemap_skip_stats`.  Zone maps skip
    RANGE predicates but are useless for point lookups on a
    high-cardinality column scattered across files (every file's
    [min, max] covers every probe); a per-file BLOOM index skips
    exactly the files whose filter misses — the technique behind
    parquet's bloom_filter column option and Iceberg/Delta file-level
    bloom indexes.  This MEASURES that claim instead of asserting it.

    Simulation (all integer/md5-exact, the zonemap rule): files are
    equi-width buckets of ``natural_col``; per file, the zone map is
    (min, max) of ``probe_col`` and the bloom index is the file's set
    of Kirsch-Mitzenmacher bit positions (``dedup.bloom_positions_sql``
    — the replayable double-hash the decontamination family already
    pins) over its DISTINCT probe values.  Probes are the data-derived
    deterministic set ``probe_col % probe_mod == 0``.  One row per
    index kind:

      (kind, n_probes, n_files_total, n_scanned, scan_pct)

    * ``exact``  — files truly containing the probe (ground truth);
    * ``bloom``  — files whose index passes all k positions: always
      ⊇ exact (no false negatives — a theorem, pytest-pinned), the
      surplus is the realized false-positive cost of m_bits/k;
    * ``zonemap`` — files whose [min, max] covers the probe: ~100 %
      on a scattered column, the number that motivates the index.

    Scale shape: after the corpus projection everything is sized by
    files × probes (zone/bloom joins are position-keyed equijoins; the
    probe set broadcasts); per-file bloom state is ≤ distinct-values×k
    positions, a function of the INDEX, not the corpus.
    """
    from platform_etl_literature_spark.operators.dedup import (
        bloom_positions_sql,
    )

    if n_files < 1 or m_bits < 64 or k < 1:
        raise ValueError("need n_files >= 1, m_bits >= 64, k >= 1")
    stats = df.agg(
        F.min(F.col(natural_col).cast("long")).alias("_mnn"),
        F.max(F.col(natural_col).cast("long")).alias("_mxn"),
    )
    proj = (
        df.crossJoin(F.broadcast(stats))
        .select(
            F.expr(
                f"(CAST({natural_col} AS BIGINT) - _mnn) * {n_files}"
                " div (_mxn - _mnn + 1)"
            ).alias("_file"),
            F.col(probe_col).cast("long").alias("_v"),
        )
    )
    probes = (
        proj.select("_v")
        .distinct()
        .filter(F.col("_v") % probe_mod == 0)
        .select(F.col("_v").alias("_pv"))
    )
    n_probe_row = probes.agg(F.count(F.lit(1)).alias("n_probes"))

    zone = proj.groupBy("_file").agg(
        F.min("_v").alias("_mn"), F.max("_v").alias("_mx")
    )
    exact_pairs = (
        proj.join(F.broadcast(probes), proj["_v"] == probes["_pv"])
        .select("_file", "_pv")
        .distinct()
    )
    z_pairs = zone.join(
        F.broadcast(probes),
        (F.col("_mn") <= F.col("_pv")) & (F.col("_pv") <= F.col("_mx")),
    ).select("_file", "_pv")

    pos = bloom_positions_sql("CAST(_v AS STRING)", m_bits, k)
    fpos = (
        proj.select("_file", "_v")
        .distinct()
        .selectExpr("_file", f"explode(array({', '.join(pos)})) AS _p")
        .distinct()
    )
    ppos = F.broadcast(
        probes.selectExpr(
            "_pv",
            "posexplode(array("
            + ", ".join(bloom_positions_sql("CAST(_pv AS STRING)", m_bits, k))
            + ")) AS (_i, _p)",
        )
    )
    b_pairs = (
        fpos.join(ppos, "_p")
        .groupBy("_file", "_pv")
        .agg(F.count_distinct("_i").alias("_nhit"))
        .filter(F.col("_nhit") == k)
        .select("_file", "_pv")
    )

    out = None
    for kind, pairs in (
        ("exact", exact_pairs),
        ("bloom", b_pairs),
        ("zonemap", z_pairs),
    ):
        row = (
            pairs.agg(F.count(F.lit(1)).alias("n_scanned"))
            .crossJoin(F.broadcast(n_probe_row))
            .select(
                F.lit(kind).alias("kind"),
                "n_probes",
                F.lit(n_files).cast("long").alias("n_files_total"),
                "n_scanned",
                F.round(
                    F.col("n_scanned")
                    / (F.col("n_probes") * F.lit(n_files)).cast("double")
                    * 100,
                    2,
                ).alias("scan_pct"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def equidepth_thresholds(df: DataFrame, col: str, n_bins: int) -> DataFrame:
    """Exact nearest-rank equi-depth bin thresholds for an integral
    column: (j, t_j) for j = 1..n_bins−1, where t_j is the value at
    ascending rank ceil(j·n / n_bins) — i.e. the smallest v whose
    cumulative row count reaches the rank.  Computed from the
    per-distinct-value cumulative counts over the DISTRIBUTED rank
    (ranking.ordered_global_index — range exchange + broadcast
    offsets, no single-partition sort), so the threshold build scales
    with distinct values, not rows.  Pure integer/rank arithmetic —
    an oracle replays every threshold exactly (no percentile_approx,
    whose sketch internals are engine-specific)."""
    from platform_etl_literature_spark.operators.ranking import (
        ordered_global_index,
    )

    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    vals = df.select(F.col(col).cast("long").alias("_v")).where(
        F.col(col).isNotNull()
    )
    cnt = vals.groupBy("_v").agg(F.count(F.lit(1)).alias("_c"))
    cum = ordered_global_index(
        cnt,
        [F.col("_v").asc()],
        running_sum_col="_c",
        running_sum_out="_cum",
    )
    n_row = vals.agg(F.count(F.lit(1)).alias("_n"))
    # closed-form rank→row assignment: value row (prev, cum] is the
    # threshold for exactly the ranks rk_j = ceil(j·n/B) it covers,
    # i.e. j ∈ [prev·B div n + 1, cum·B div n] clamped to [1, B−1] —
    # ceil(j·n/B) ≤ c ⟺ j·n ≤ c·B for integers, so the bounds are
    # exact integer divisions.  A first cut cross-joined every
    # distinct value with every rank (distinct × (B−1) intermediate —
    # 380M rows on a unique-per-row sf0.1 column); this emits exactly
    # B−1 rows total with no join at all.
    B = n_bins
    return (
        cum.crossJoin(F.broadcast(n_row))
        .withColumn("_prev", F.col("_cum") - F.col("_c"))
        .withColumn(
            "_jlo",
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(f"_prev * {B} div _n") + 1,
            ),
        )
        .withColumn(
            "_jhi",
            F.least(
                F.lit(B - 1).cast("long"), F.expr(f"_cum * {B} div _n")
            ),
        )
        .where(F.col("_jlo") <= F.col("_jhi"))
        .select(
            F.explode(F.sequence("_jlo", "_jhi")).alias("j"),
            F.col("_v").alias("t"),
        )
    )


def binning_balance_stats(df: DataFrame, col: str, bits: int = 6) -> DataFrame:
    """Bin-balance accountability — WHY a skewed column needs
    equi-depth bins before Z-order/Hilbert interleaving: equi-width
    range bins ((v−min)·B div range, what ``zorder_bins`` uses)
    collapse under a skewed distribution (most rows land in a few
    bins, so most "files" cover the same dense value range and
    skipping dies), while exact nearest-rank equi-depth bins hold
    max-bin occupancy at ~n/B by construction.  This MEASURES the
    collapse instead of asserting it: one row per method —

      (method, n_bins_total, n_bins_nonempty, max_bin_rows, imbalance)

    with ``imbalance = max_bin_rows · B / n`` (perfectly balanced =
    1.0).  Everything is rank/integer arithmetic over the per-value
    count frame (rows touch the plan once, in the groupBy(v) count),
    so the oracle replays both histograms value-for-value.
    """
    B = 1 << bits
    vals = df.select(F.col(col).cast("long").alias("_v")).where(
        F.col(col).isNotNull()
    )
    cnt = vals.groupBy("_v").agg(F.count(F.lit(1)).alias("_c"))
    stats = vals.agg(
        F.min("_v").alias("_mn"),
        F.max("_v").alias("_mx"),
        F.count(F.lit(1)).alias("_n"),
    )
    ew_bins = (
        cnt.crossJoin(F.broadcast(stats))
        .select(
            F.expr(f"(_v - _mn) * {B} div (_mx - _mn + 1)").alias("_b"),
            "_c",
        )
        .groupBy("_b")
        .agg(F.sum("_c").alias("_rows"))
    )
    th = equidepth_thresholds(df, col, B)
    ed_bins = (
        cnt.join(F.broadcast(th), cnt["_v"] > th["t"], "left")
        .groupBy("_v", "_c")
        .agg(F.count(th["t"]).alias("_b"))
        .groupBy("_b")
        .agg(F.sum("_c").alias("_rows"))
    )
    out = None
    for method, bins in (("equiwidth", ew_bins), ("equidepth", ed_bins)):
        row = (
            bins.agg(
                F.count(F.lit(1)).alias("n_bins_nonempty"),
                F.max("_rows").alias("max_bin_rows"),
            )
            .crossJoin(F.broadcast(stats.select("_n")))
            .select(
                F.lit(method).alias("method"),
                F.lit(B).cast("long").alias("n_bins_total"),
                "n_bins_nonempty",
                "max_bin_rows",
                F.round(
                    F.col("max_bin_rows") * B / F.col("_n").cast("double"), 2
                ).alias("imbalance"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def equidepth_bins(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Equi-depth twin of :func:`zorder_bins`: ``_bin_<col>`` =
    NUMBER OF EXACT NEAREST-RANK THRESHOLDS STRICTLY BELOW the value
    (:func:`equidepth_thresholds`), plus the interleaved ``_z``.
    On a skewed column the equi-width bins collapse
    (:func:`binning_balance_stats` measures it) and zone-map skipping
    dies with them; quantile bins keep every bin ~n/B rows so the
    curve's file cuts stay informative — ``zonemap_skip_stats(bins=
    'equidepth')`` measures that consequence.

    Plan shape per column: the threshold build (distinct-value
    cumulative counts over the range-exchange global index) collapses
    to a ONE-ROW (B−1)-element array that broadcasts into the row
    projection; the bin is then ``size(filter(thresholds, t -> v >
    t))`` — B−1 integer comparisons inside whole-stage codegen, NO
    row-side join at all (the first cut mapped values through a
    per-column shuffle join and measured 3× slower on a
    unique-per-row column).  All comparisons are integer."""
    if not cols:
        raise ValueError("equidepth_bins needs at least one column")
    B = 1 << bits
    out = df
    bin_names = []
    for c in cols:
        th_arr = equidepth_thresholds(df, c, B).agg(
            F.sort_array(F.collect_list("t")).alias("_ths")
        )
        bname = f"_bin_{c}"
        bin_names.append(bname)
        v = F.col(c).cast("long")
        out = (
            out.crossJoin(F.broadcast(th_arr))
            .withColumn(
                bname,
                F.size(F.filter(F.col("_ths"), lambda t: v > t)),
            )
            .drop("_ths")
        )
    return out.withColumn("_z", F.expr(_interleave_sql(bin_names, bits)))
