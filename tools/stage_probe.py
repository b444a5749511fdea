#!/usr/bin/env python
"""Per-stage breakdown of a registered query via the Spark UI REST API.

Answers "where does the wall-clock go" for the multi-join star queries:
for each stage of the last-run job set, prints task time, shuffle write
bytes, shuffle read bytes, and input bytes — enough to attribute the
Spark-vs-DuckDB residual either to real work (scan/build/probe) or to
exchange materialization (shuffle write+read between join stages).

Measurement tooling only (like scale_probe.py); run exclusively.

Usage: python tools/stage_probe.py <query> [sf_dir] [--aqe]
"""

from __future__ import annotations

import json
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> None:
    from vault_8_hive_spark.queries import all_queries
    from vault_8_hive_spark.session import get_spark

    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
        else "/root/testdata/sf0.1"
    aqe = "--aqe" in sys.argv

    import os

    os.environ["SPARK_GRAFT_UI"] = "1"  # REST API needed — see session.py
    spark = get_spark(app_name=f"stage-probe-{name}")
    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    if not aqe:
        spark.conf.set("spark.sql.shuffle.partitions", "8")

    q = all_queries()[name]
    q.fn(spark, sf_dir).toPandas()  # warm (footer caches, codegen, JIT)

    base = spark.sparkContext.uiWebUrl + "/api/v1"
    app = rest(base, "/applications")[0]["id"]
    before = {s["stageId"] for s in rest(base, f"/applications/{app}/stages")}

    import time

    df = q.fn(spark, sf_dir)  # fresh build (benchlib methodology)
    t0 = time.perf_counter()
    df.toPandas()
    wall = time.perf_counter() - t0

    stages = [
        s for s in rest(base, f"/applications/{app}/stages")
        if s["stageId"] not in before and s["status"] == "COMPLETE"
    ]
    stages.sort(key=lambda s: s["stageId"])
    rows = []
    for s in stages:
        rows.append({
            "stage": s["stageId"],
            "tasks": s["numCompleteTasks"],
            "task_time_s": round(s["executorRunTime"] / 1000, 3),
            "input_mb": round(s["inputBytes"] / 1e6, 1),
            "sh_write_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
            "sh_read_mb": round(s["shuffleReadBytes"] / 1e6, 1),
            "desc": s["description"][:60] if s.get("description") else s["name"][:60],
        })
    print(json.dumps({
        "query": name, "sf_dir": sf_dir, "aqe": aqe,
        "wall_s": round(wall, 3),
        "total_task_time_s": round(sum(r["task_time_s"] for r in rows), 3),
        "total_shuffle_write_mb": round(sum(r["sh_write_mb"] for r in rows), 1),
        "stages": rows,
    }, indent=1))


if __name__ == "__main__":
    main()
