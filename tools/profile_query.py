"""Per-stage profile of suite queries: run each named query through
the noop sink in a session with the UI REST API on (localhost only),
then print every job/stage that ran for it — wall, executor task
time, shuffle read/write bytes, input bytes, and the stage name — so
optimization targets are picked from measured stage walls instead of
plan guesses (guide §1.1: empirical loop).

Usage: python tools/profile_query.py [--sf DIR] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from platform_etl_literature_spark.session import build_session
from platform_etl_literature_spark.suite import SUITE


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    names = args
    spark = build_session(
        "profile-query", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    for name in names:
        spark.catalog.clearCache()
        jobs_before = {j["jobId"] for j in _get(f"{base}/jobs")}
        sc.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = SUITE[name].fn(spark, sf_dir)
        t_build = time.time() - t0
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_run = time.time() - t0
        sc.setJobDescription(None)

        jobs = [
            j for j in _get(f"{base}/jobs") if j["jobId"] not in jobs_before
        ]
        print(f"\n=== {name}: build {t_build:.2f}s, run {t_run:.2f}s, "
              f"{len(jobs)} jobs ===")
        stage_ids = sorted(
            {s for j in jobs for s in j.get("stageIds", [])}
        )
        rows = []
        for sid in stage_ids:
            try:
                ss = _get(f"{base}/stages/{sid}")
            except Exception:
                continue
            for s in ss:
                if s["status"] == "SKIPPED":
                    continue
                wall = 0.0
                if s.get("firstTaskLaunchedTime") and s.get(
                    "completionTime"
                ):
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    try:
                        a = datetime.strptime(
                            s["firstTaskLaunchedTime"], fmt
                        )
                        bt = datetime.strptime(s["completionTime"], fmt)
                        wall = (bt - a).total_seconds()
                    except ValueError:
                        pass
                rows.append(
                    (
                        wall,
                        s["stageId"],
                        s["numCompleteTasks"],
                        s.get("executorRunTime", 0) / 1000.0,
                        s.get("inputBytes", 0) // 1024,
                        s.get("shuffleReadBytes", 0) // 1024,
                        s.get("shuffleWriteBytes", 0) // 1024,
                        s["name"].split("\n")[0][:70],
                    )
                )
        rows.sort(reverse=True)
        print(
            f"{'wall_s':>7} {'stage':>5} {'tasks':>5} {'cpu_s':>7} "
            f"{'in_kb':>8} {'sh_r_kb':>8} {'sh_w_kb':>8}  name"
        )
        for wall, sid, nt, cpu, inb, srb, swb, nm in rows[:14]:
            print(
                f"{wall:7.2f} {sid:5d} {nt:5d} {cpu:7.2f} "
                f"{inb:8d} {srb:8d} {swb:8d}  {nm}"
            )


if __name__ == "__main__":
    main()
