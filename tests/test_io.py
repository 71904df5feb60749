"""IO layer tests: multi-format read/write, partitionBy, schema
override (Helpers.scala:108-126, 208-235 capabilities)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from platform_etl_literature_spark.sources import (
    IOResource,
    IOResourceConfig,
    read_from,
    write_to,
)


def test_roundtrip_formats(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("part"),
        (F.col("id") * 1.5).alias("v"),
    )
    confs = {
        "p": IOResourceConfig("parquet", str(tmp_path / "p")),
        "j": IOResourceConfig("json", str(tmp_path / "j")),
        "c": IOResourceConfig(
            "csv", str(tmp_path / "c"), options={"header": "true"}
        ),
        # beyond the reference's json/parquet/csv: the config-driven
        # layer passes any built-in format through unchanged
        "o": IOResourceConfig("orc", str(tmp_path / "o")),
    }
    write_to({k: IOResource(df, c) for k, c in confs.items()})
    confs["c"].options["inferSchema"] = "true"
    back = read_from(spark, confs)
    for k in confs:
        assert back[k].data.count() == 100, k
    assert dict(back["p"].data.dtypes)["v"] == "double"


def test_partitioned_write_enables_pruning(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("bucket")
    )
    cfg = IOResourceConfig("parquet", str(tmp_path / "pt"), partition_by=["bucket"])
    write_to({"t": IOResource(df, cfg)})
    # hive-style layout on disk
    parts = sorted(p.name for p in (tmp_path / "pt").iterdir() if p.is_dir())
    assert parts == ["bucket=0", "bucket=1", "bucket=2", "bucket=3"]
    back = spark.read.parquet(str(tmp_path / "pt")).filter(F.col("bucket") == "2")
    assert back.count() == 250
    # partition filter must prune, not scan+filter
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan


def test_explicit_schema_skips_inference(spark, tmp_path):
    p = tmp_path / "s.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    cfg = IOResourceConfig(
        "csv", str(p), options={"header": "true"}, schema=schema
    )
    out = read_from(spark, {"s": cfg})["s"].data
    assert out.schema == schema
    assert out.count() == 2


def test_bucketed_write_through_io_layer(spark, tmp_path):
    """Config-driven bucketed writes produce tables whose joins on the
    bucket key need no Exchange (the co-located-join layout)."""
    spark.sql("DROP TABLE IF EXISTS io_b1")
    spark.sql("DROP TABLE IF EXISTS io_b2")
    a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("va"))
    b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") % 5).alias("vb"))
    write_to(
        {
            "io_b1": IOResource(
                a,
                IOResourceConfig(
                    "parquet", str(tmp_path / "b1"), bucket_by=["k"],
                    n_buckets=4, sort_by=["k"], table="io_b1",
                ),
            ),
            "io_b2": IOResource(
                b,
                IOResourceConfig(
                    "parquet", str(tmp_path / "b2"), bucket_by=["k"],
                    n_buckets=4, sort_by=["k"], table="io_b2",
                ),
            ),
        }
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("io_b1").join(spark.table("io_b2"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS io_b1")
        spark.sql("DROP TABLE IF EXISTS io_b2")


def test_bucketed_write_requires_explicit_table(spark, tmp_path):
    """Bucketed writes must name their catalog table explicitly — an
    implicit resource-name default silently overwrites across configs."""
    import pytest

    df = spark.range(10).select(F.col("id").alias("k"))
    cfg = IOResourceConfig(
        "parquet", str(tmp_path / "bx"), bucket_by=["k"], n_buckets=2
    )
    with pytest.raises(ValueError, match="explicit"):
        write_to({"bx": IOResource(df, cfg)})


def test_json_corrupt_record_capture(spark, tmp_path):
    """Malformed corpus lines must not kill the read: PERMISSIVE mode
    (Spark default, what the reference's inferred-schema JSON read gets)
    nulls the bad row; with an explicit schema the raw line is captured
    in a _corrupt_record column for a failed-rows sink."""
    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"pmid": "1", "text": "good row"}\n'
        "{not valid json at all\n"
        '{"pmid": "3", "text": "another good row"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("pmid", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    cfg = IOResourceConfig(
        "json",
        str(p),
        options={"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        schema=schema,
    )
    df = read_from(spark, {"c": cfg})["c"].data.cache()
    assert df.count() == 3
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert "not valid json" in bad.collect()[0]["_corrupt_record"]
    df.unpersist()


def test_orc_and_text_round_trip_through_io_layer(spark, tmp_path):
    """The reader/writer is format-generic (spark.read/write.format(cfg)):
    ORC and line-text — formats the reference never shipped but Spark
    supports natively — must round-trip through the same config
    surface with zero special-casing."""
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], ["doc_id", "text"]
    )
    orc_cfg = IOResourceConfig("orc", str(tmp_path / "orc_out"))
    write_to({"d": IOResource(df, orc_cfg)})
    back = read_from(spark, {"d": orc_cfg})["d"].data
    assert {(r["doc_id"], r["text"]) for r in back.collect()} == {
        (1, "alpha"), (2, "beta")
    }

    txt_cfg = IOResourceConfig("text", str(tmp_path / "txt_out"))
    write_to({"t": IOResource(df.select(F.col("text").alias("value")), txt_cfg)})
    lines = read_from(spark, {"t": txt_cfg})["t"].data
    assert {r["value"] for r in lines.collect()} == {"alpha", "beta"}


def test_optimize_layout_tightens_file_stats(spark, sf_dir, tmp_path):
    """Z-order layout must physically narrow parquet footer min/max on
    BOTH clustered columns: the summed per-file (partkey-range x
    suppkey-range) area — what min/max skipping prunes against — drops
    several-fold vs a hash-shuffled layout of the same data."""
    import glob

    import pyarrow.parquet as pq

    from platform_etl_literature_spark.operators.layout import optimize_layout

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    base, opt = str(tmp_path / "base"), str(tmp_path / "opt")
    li.repartition(8).write.parquet(base)
    optimize_layout(li, ["l_partkey", "l_suppkey"], n_files=8).write.parquet(opt)

    def summed_area(path: str) -> int:
        total = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins: dict[str, int] = {}
            maxs: dict[str, int] = {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    st = col.statistics
                    name = col.path_in_schema
                    mins[name] = min(mins.get(name, st.min), st.min)
                    maxs[name] = max(maxs.get(name, st.max), st.max)
            if mins:
                total += (maxs["l_partkey"] - mins["l_partkey"] + 1) * (
                    maxs["l_suppkey"] - mins["l_suppkey"] + 1
                )
        return total

    a_base, a_opt = summed_area(base), summed_area(opt)
    assert a_opt * 3 < a_base, (a_base, a_opt)

    # hilbert variant: same action path, same physical narrowing —
    # footer area must also drop several-fold vs the hash layout (and
    # stay in the z-order ballpark; exact ordering between the two
    # curves is the measured hilbert_skip/zonemap_skip story)
    hop = str(tmp_path / "hop")
    optimize_layout(
        li, ["l_partkey", "l_suppkey"], n_files=8, curve="hilbert"
    ).write.parquet(hop)
    a_h = summed_area(hop)
    assert a_h * 3 < a_base, (a_base, a_h)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="zorder|hilbert"):
        optimize_layout(li, ["l_partkey", "l_suppkey"], 8, curve="peano")


def test_execute_compaction_invariants_and_zonemap(spark, sf_dir, tmp_path):
    """execute_compaction's contract: rows preserved value-for-value,
    exactly one output file per plan group, _SUCCESS-gated idempotent
    re-run, and — with cluster_col — contiguous packing that keeps
    the rewritten parquet footers narrow (zone-map skipping
    survives)."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from platform_etl_literature_spark.operators.layout import (
        execute_compaction,
        optimize_layout,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    # a clustered small-file layout: 16 files range-partitioned on
    # l_partkey (single column -> the z value IS the partkey bin)
    optimize_layout(li, ["l_partkey"], n_files=16).write.parquet(src)
    n_src_files = len(glob.glob(f"{src}/*.parquet"))
    assert n_src_files > 4
    target = sum(
        pq.ParquetFile(f).metadata.serialized_size + __import__("os").path.getsize(f)
        for f in glob.glob(f"{src}/*.parquet")
    ) // 4  # pack ~4 groups

    stats = execute_compaction(
        spark, src, dest, target_bytes=target, cluster_col="l_partkey"
    )
    assert stats["skipped"] is False
    assert stats["n_input_files"] == n_src_files

    # rows preserved value-for-value (count + keyed checksum)
    def fingerprint(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_orderkey") * 7 + F.col("l_partkey") * 3
                  + F.col("l_suppkey")).alias("ck"),
        ).collect()[0]

    back = spark.read.parquet(dest).select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    assert tuple(fingerprint(back)) == tuple(fingerprint(li))

    # exactly one file per plan group
    out_files = glob.glob(f"{dest}/_grp=*/*.parquet")
    grp_dirs = glob.glob(f"{dest}/_grp=*")
    assert len(out_files) == stats["n_groups"] == len(grp_dirs)
    assert len(out_files) < n_src_files

    # zone-map skipping survives: per-file l_partkey ranges do not
    # interleave (contiguous cluster packing), so a point predicate
    # still prunes all but ~one file
    ranges = []
    for f in out_files:
        md = pq.ParquetFile(f).metadata
        mn, mx = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == "l_partkey":
                    st = col.statistics
                    mn = st.min if mn is None else min(mn, st.min)
                    mx = st.max if mx is None else max(mx, st.max)
        ranges.append((mn, mx))
    ranges.sort()
    for (amn, amx), (bmn, bmx) in zip(ranges, ranges[1:]):
        # contiguous groups may share a boundary file's edge value but
        # must not interleave
        assert amx <= bmn + 1, ranges

    # idempotent: the committed dest is not rewritten
    import os

    mtimes = {f: os.path.getmtime(f) for f in out_files}
    again = execute_compaction(
        spark, src, dest, target_bytes=target, cluster_col="l_partkey"
    )
    assert again["skipped"] is True
    assert again["n_groups"] == stats["n_groups"]
    assert {f: os.path.getmtime(f) for f in out_files} == mtimes
