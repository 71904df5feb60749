"""Schema-adaptive time-column reader: the engine must produce the
same TIMESTAMP values whatever physical encoding the harness writer
chose for events.ts (int64 epoch-ns, timestamp[us] NTZ, or tz-aware
timestamp) — the round-2 drift class."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import TimestampType

from platform_etl_literature_spark.sources.events import read_events

US = [1_700_000_000_000_000, 1_700_000_123_456_789]  # epoch micros


def _write(tmp_path, name, arr):
    d = tmp_path / name
    d.mkdir()
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": arr,
            "user_id": pa.array([10, 20], pa.int64()),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "encoding",
    ["ns_long", "us_ntz", "us_tz"],
)
def test_every_encoding_normalizes_to_identical_timestamps(
    spark, tmp_path, encoding
):
    if encoding == "ns_long":
        arr = pa.array([u * 1000 for u in US], pa.int64())
    elif encoding == "us_ntz":
        arr = pa.array(US, pa.timestamp("us"))
    else:
        arr = pa.array(US, pa.timestamp("us", tz="UTC"))
    sf_dir = _write(tmp_path, encoding, arr)
    df = read_events(spark, sf_dir)
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    import pyspark.sql.functions as F

    got = sorted(
        r["us"] for r in df.select(F.unix_micros("ts").alias("us")).collect()
    )
    assert got == US


def test_nanos_encoding_detected_from_footer(spark, tmp_path):
    """TIMESTAMP(NANOS) parquet: the footer — not exception-text
    matching — must trigger the nanos-as-long conf, and the values
    must normalize to the same instants as every other encoding."""
    from platform_etl_literature_spark.sources.events import _footer_has_nanos

    d = tmp_path / "ns_ts"
    d.mkdir()
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([u * 1000 for u in US], pa.timestamp("ns")),
            "user_id": pa.array([10, 20], pa.int64()),
        }
    )
    # parquet 2.6 logical types keep NANOS (1.0/2.4 coerce to micros)
    pq.write_table(t, str(d / "events.parquet"), version="2.6")
    assert _footer_has_nanos(str(d / "events.parquet")) is True
    assert _footer_has_nanos(str(d)) is True  # directory walk

    df = read_events(spark, str(d))
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    import pyspark.sql.functions as F

    got = sorted(
        r["us"] for r in df.select(F.unix_micros("ts").alias("us")).collect()
    )
    assert got == US


def test_micros_encoding_reports_no_nanos(tmp_path):
    from platform_etl_literature_spark.sources.events import _footer_has_nanos

    d = tmp_path / "us_plain"
    d.mkdir()
    t = pa.table({"ts": pa.array(US, pa.timestamp("us"))})
    pq.write_table(t, str(d / "events.parquet"))
    assert _footer_has_nanos(str(d)) is False
