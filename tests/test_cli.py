"""CLI end-to-end: fixture inputs written in the reference's actual
source formats (EPMC json, gzipped csv lookup, entity parquet) → `all`
steps → outputs on disk."""

from __future__ import annotations

import json

import pytest

from platform_etl_literature_spark import main as cli
from tests import fixtures


@pytest.fixture(scope="module")
def input_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_inputs")
    fixtures.epmc_df(spark).write.mode("overwrite").json(str(d / "epmc"))
    (
        fixtures.epmcids_df(spark)
        .write.mode("overwrite")
        .option("header", True)
        .option("compression", "gzip")
        .csv(str(d / "epmcids"))
    )
    fixtures.targets_df(spark).write.mode("overwrite").parquet(str(d / "targets"))
    fixtures.diseases_df(spark).write.mode("overwrite").parquet(str(d / "diseases"))
    fixtures.drugs_df(spark).write.mode("overwrite").parquet(str(d / "drugs"))
    return d


def test_cli_all_steps(spark, input_dir, tmp_path):
    out = tmp_path / "out"
    cfg = {
        "inputs": {
            "epmc": {"format": "json", "path": str(input_dir / "epmc")},
            "epmcids": {
                "format": "csv",
                "path": str(input_dir / "epmcids"),
                "options": {"header": "true", "inferSchema": "true"},
            },
            "targets": {"format": "parquet", "path": str(input_dir / "targets")},
            "diseases": {"format": "parquet", "path": str(input_dir / "diseases")},
            "drugs": {"format": "parquet", "path": str(input_dir / "drugs")},
        },
        "output": {"dir": str(out), "format": "parquet"},
        "word2vec": {"vector_size": 8, "num_partitions": 1, "seed": 7},
        "evidence": {"threshold": -2.0},
    }
    cfg_file = tmp_path / "conf.json"
    cfg_file.write_text(json.dumps(cfg))

    cli.main(["all", "--config", str(cfg_file)])

    matches = spark.read.parquet(str(out / "matches"))
    assert matches.count() > 0
    assert {"pmid", "label", "keywordId", "isMapped"} <= set(matches.columns)
    vectors = spark.read.parquet(str(out / "vectors"))
    assert {r["category"] for r in vectors.collect()} == {"target", "disease", "drug"}
    evidence = spark.read.parquet(str(out / "evidence"))
    ev = evidence.collect()
    assert len(ev) == 1
    assert ev[0]["targetFromSourceId"].startswith("ENSG")
    # literature index + failed outputs also landed
    assert spark.read.parquet(str(out / "literatureIndex")).count() > 0
    assert spark.read.parquet(str(out / "failedMatches")).count() == 1


def test_cli_curate_step(spark, tmp_path):
    """The curate step writes surviving documents plus a verdict report;
    survivors = kept-verdict ∩ exact-dedup winners."""
    import json

    from platform_etl_literature_spark.main import main as cli_main

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs of a it", "en"),
            (2, "the quick brown fox jumps over the lazy dog and runs of a it", "en"),
            (3, "der hund und die katze und der hund und die katze ist da", "de"),
        ],
        ["doc_id", "text", "lang"],
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "out")
    cfg = {
        "inputs": {"documents": {"format": "parquet", "path": src}},
        "output": {"format": "parquet", "dir": out},
        "curate": {"quality_min": 0.1},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    cli_main(["curate", "--config", str(cfg_path)])

    report = {r["doc_id"]: r for r in spark.read.parquet(f"{out}/curation_report").collect()}
    curated = sorted(r["doc_id"] for r in spark.read.parquet(f"{out}/curated").collect())
    assert set(report) == {1, 2, 3}
    assert report[3]["lang_pred"] == "de" and report[3]["kept"] == 0
    # doc 2 is an exact dup of doc 1: verdict kept, row suppressed
    assert report[2]["kept"] == 1
    assert curated == [1]


def test_cli_score_step(spark, tmp_path):
    """The score step writes one quality row per document (classifier
    prob/keep + entropy), and with ref_lang set also the cross-corpus
    LM perplexity — with English scoring lower ppl than German under
    the English-reference model here."""
    import json

    from platform_etl_literature_spark.main import main as cli_main

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over a lazy dog and runs off", "en"),
            (2, "a lazy dog jumps over the quick brown fox and runs off", "en"),
            (3, "der hund und die katze und der hund und die katze", "de"),
        ],
        ["doc_id", "text", "lang"],
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "out")
    cfg = {
        "inputs": {"documents": {"format": "parquet", "path": src}},
        "output": {"format": "parquet", "dir": out},
        "score": {"ref_lang": "en"},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    cli_main(["score", "--config", str(cfg_path)])

    rows = {r["doc_id"]: r for r in spark.read.parquet(f"{out}/scores").collect()}
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert 0.0 <= r["prob"] <= 1.0 and r["entropy"] > 0
        assert r["ppl"] is not None
    assert max(rows[1]["ppl"], rows[2]["ppl"]) < rows[3]["ppl"]


def test_cli_cluster_step(spark, tmp_path):
    """The cluster step writes near-dup clusters and survivor rows;
    with score_col, each cluster keeps its best-scored document."""
    import json

    from platform_etl_literature_spark.main import main as cli_main

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon", 10),
            (2, "alpha beta gamma delta epsilon", 99),  # near-dup of 1, better score
            (3, "one two three four five six", 5),
        ],
        ["doc_id", "text", "quality"],
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "out")
    cfg = {
        "inputs": {"documents": {"format": "parquet", "path": src}},
        "output": {"format": "parquet", "dir": out},
        "cluster": {"score_col": "quality"},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    cli_main(["cluster", "--config", str(cfg_path)])

    clusters = {
        r["component"]: r["member_ids"]
        for r in spark.read.parquet(f"{out}/clusters").collect()
    }
    assert clusters == {1: [1, 2]}
    surv = {
        r["doc_id"]: (r["component"], r["is_survivor"])
        for r in spark.read.parquet(f"{out}/survivors").collect()
    }
    # quality-aware: doc 2 (score 99) survives its cluster, not min-id 1
    assert surv == {1: (1, False), 2: (1, True), 3: (3, True)}


def test_cli_scrub_step(spark, tmp_path):
    """The scrub step rewrites each document keeping only first
    corpus-wide occurrences of its passages."""
    import json

    from platform_etl_literature_spark.main import main as cli_main

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "c d a b x")], ["doc_id", "text"]
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "out")
    cfg = {
        "inputs": {"documents": {"format": "parquet", "path": src}},
        "output": {"format": "parquet", "dir": out},
        "scrub": {"window": 2},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    cli_main(["scrub", "--config", str(cfg_path)])

    got = {
        r["doc_id"]: (r["text_scrubbed"], r["n_passages"], r["n_kept"])
        for r in spark.read.parquet(f"{out}/scrubbed").collect()
    }
    assert got == {1: ("a b c d", 2, 2), 2: ("x", 3, 1)}


def test_cli_search_step(spark, tmp_path):
    """The search step writes the top-k BM25 hits for the configured
    terms, best score first."""
    import json

    from platform_etl_literature_spark.main import main as cli_main

    docs = spark.createDataFrame(
        [
            (1, "cat cat dog"),
            (2, "cat dog bird"),
            (3, "dog bird fish"),
        ],
        ["doc_id", "text"],
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "out")
    cfg = {
        "inputs": {"documents": {"format": "parquet", "path": src}},
        "output": {"format": "parquet", "dir": out},
        "search": {"terms": ["cat"], "k": 2},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    cli_main(["search", "--config", str(cfg_path)])

    hits = sorted(
        spark.read.parquet(f"{out}/search").collect(),
        key=lambda r: -r["score"],
    )
    assert [r["doc_id"] for r in hits] == [1, 2]
    assert hits[0]["score"] > hits[1]["score"]


def test_cli_split_step(spark, tmp_path):
    """The split step assigns every document to a split, keeps
    near-dup clusters together, and honors custom weights."""
    import json

    from platform_etl_literature_spark.main import main as cli_main

    # docs 1/2 are near-identical -> same MinHash cluster -> same split
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
            (3, "one two three four five six"),
            (4, "seven eight nine ten eleven twelve"),
        ],
        ["doc_id", "text"],
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "out")
    cfg = {
        "inputs": {"documents": {"format": "parquet", "path": src}},
        "output": {"format": "parquet", "dir": out},
        "split": {"weights": {"train": 90, "test": 10}},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    cli_main(["split", "--config", str(cfg_path)])

    rows = {r["doc_id"]: r for r in spark.read.parquet(f"{out}/split").collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1]["component"] == rows[2]["component"]
    assert rows[1]["split"] == rows[2]["split"]
    assert {r["split"] for r in rows.values()} <= {"train", "test"}


def test_cli_dq_step(spark, tmp_path):
    """The dq step writes the verification report (including a
    referential check against a second input) and, in
    fail_on_violation mode, raises AFTER writing when a check fails."""
    import json

    from platform_etl_literature_spark.main import main as cli_main

    docs = spark.createDataFrame(
        [(1, "alpha", 10), (2, "beta", 20), (2, None, 99)],
        ["doc_id", "text", "ref_id"],
    )
    dim = spark.createDataFrame([(10,), (20,)], ["k"])
    src, dsrc = str(tmp_path / "docs.parquet"), str(tmp_path / "dim.parquet")
    docs.write.parquet(src)
    dim.write.parquet(dsrc)
    out = str(tmp_path / "out")
    cfg = {
        "inputs": {
            "documents": {"format": "parquet", "path": src},
            "dims": {"format": "parquet", "path": dsrc},
        },
        "output": {"format": "parquet", "dir": out},
        "dq": {
            "table": "documents",
            "checks": [
                {"check": "completeness", "column": "text", "min_ratio": 1.0},
                {"check": "uniqueness", "column": "doc_id", "min_ratio": 1.0},
            ],
            "referential": [
                {"column": "ref_id", "dim_table": "dims", "dim_column": "k"}
            ],
            "fail_on_violation": True,
        },
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    with pytest.raises(SystemExit, match="DQ violations"):
        cli_main(["dq", "--config", str(cfg_path)])

    got = {
        (r["check"], r["target"]): r["passed"]
        for r in spark.read.parquet(f"{out}/dq_report").collect()
    }
    assert got == {
        ("completeness", "text"): False,
        ("uniqueness", "doc_id"): False,
        ("referential", "ref_id"): False,
    }


def test_cli_dq_null_metric_trips_the_gate(spark, tmp_path):
    """A degenerate table (zero rows) makes ratio metrics 0/0 = NULL;
    `passed` is then NULL, and the fail_on_violation gate must treat
    unknown as FAILED — a NULL-dropping filter would let an empty
    table sail through CI vacuously."""
    import json

    from platform_etl_literature_spark.main import main as cli_main

    empty = spark.createDataFrame([], "doc_id long, text string")
    src = str(tmp_path / "docs.parquet")
    empty.write.parquet(src)
    out = str(tmp_path / "out")
    cfg = {
        "inputs": {"documents": {"format": "parquet", "path": src}},
        "output": {"format": "parquet", "dir": out},
        "dq": {
            "table": "documents",
            "checks": [
                {"check": "completeness", "column": "text", "min_ratio": 1.0},
            ],
            "fail_on_violation": True,
        },
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    with pytest.raises(SystemExit, match="DQ violations"):
        cli_main(["dq", "--config", str(cfg_path)])
    rows = spark.read.parquet(f"{out}/dq_report").collect()
    assert any(r["passed"] is None for r in rows), rows


def test_cli_layout_step(spark, tmp_path, sf_dir):
    """The layout step writes a curve-clustered copy (footer ranges
    narrow several-fold vs the hash layout — the optimize_layout bar)
    and executes compaction into one file per plan group,
    _SUCCESS-gated idempotent."""
    import glob
    import json

    import pyarrow.parquet as pq

    from platform_etl_literature_spark.main import main as cli_main

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    src = str(tmp_path / "orders_src")
    # many small files -> something for compaction to do
    orders.repartition(16).write.parquet(src)
    out = str(tmp_path / "out")
    dest = str(tmp_path / "compacted")
    cfg = {
        "inputs": {"orders": {"format": "parquet", "path": src}},
        "output": {"format": "parquet", "dir": out},
        "layout": {
            "table": "orders",
            "cluster": {
                "cols": ["o_custkey", "o_orderkey"],
                "curve": "hilbert",
                "n_files": 8,
            },
            "compact": {
                "src_dir": src,
                "dest_dir": dest,
                "target_bytes": 1 << 20,
                "cluster_col": "o_orderkey",
            },
        },
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    cli_main(["layout", "--config", str(cfg_path)])

    clustered = spark.read.parquet(f"{out}/layout_out")
    assert clustered.count() == orders.count()
    # per-file o_custkey span sums far below the hash layout's
    def span_sum(path):
        tot = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mn = min(
                md.row_group(g).column(1).statistics.min
                for g in range(md.num_row_groups)
            )
            mx = max(
                md.row_group(g).column(1).statistics.max
                for g in range(md.num_row_groups)
            )
            tot += mx - mn + 1
        return tot

    def n_files(path):
        return len(glob.glob(f"{path}/*.parquet"))

    # average per-file custkey span under the curve layout must be a
    # fraction of the hash layout's (every hash file spans ~the full
    # key range; curve files cover tight rectangles)
    avg_src = span_sum(src) / n_files(src)
    avg_opt = span_sum(f"{out}/layout_out") / n_files(f"{out}/layout_out")
    assert avg_opt * 2 < avg_src, (avg_src, avg_opt)

    compacted = spark.read.parquet(dest)
    assert compacted.count() == orders.count()
    # idempotent: second run skips (dest _SUCCESS present), same rows
    cli_main(["layout", "--config", str(cfg_path)])
    assert spark.read.parquet(dest).count() == orders.count()
