"""Warm-rep stage profile: run each named suite query N-1 warmup reps
through the noop sink, then profile the LAST rep's jobs/stages via the
UI REST API — the steady-state structure bench.py's min-of-4 actually
measures (tools/profile_query.py profiles the COLD first rep, which
mixes in plan compilation, codegen and artifact loads).

Usage: python tools/profile_warm.py [--sf DIR] [--reps N] query [...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from platform_etl_literature_spark.session import build_session
from platform_etl_literature_spark.suite import SUITE


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    while args and args[0].startswith("--"):
        if args[0] == "--sf":
            sf_dir = args[1]
        elif args[0] == "--reps":
            reps = int(args[1])
        args = args[2:]
    names = args
    spark = build_session(
        "profile-warm", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    for name in names:
        spark.catalog.clearCache()
        walls = []
        for rep in range(reps):
            if rep == reps - 1:
                jobs_before = {j["jobId"] for j in _get(f"{base}/jobs")}
            sc.setJobDescription(f"profile:{name}:rep{rep}")
            t0 = time.time()
            df = SUITE[name].fn(spark, sf_dir)
            t_build = time.time() - t0
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t_run = time.time() - t0
            walls.append((t_build, t_run))
        sc.setJobDescription(None)

        jobs = [
            j for j in _get(f"{base}/jobs") if j["jobId"] not in jobs_before
        ]
        wl = " ".join(f"{b:.2f}+{r:.2f}" for b, r in walls)
        print(
            f"\n=== {name}: reps(build+run) {wl} | last rep "
            f"{len(jobs)} jobs ==="
        )
        stage_ids = sorted({s for j in jobs for s in j.get("stageIds", [])})
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
                if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    try:
                        a = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
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
        for wall, sid, nt, cpu, inb, srb, swb, nm in rows[:16]:
            print(
                f"{wall:7.2f} {sid:5d} {nt:5d} {cpu:7.2f} "
                f"{inb:8d} {srb:8d} {swb:8d}  {nm}"
            )


if __name__ == "__main__":
    main()
